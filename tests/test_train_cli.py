"""Train-CLI failure detection / elastic recovery (SURVEY §5: the reference
has none — a crash loses up to 2000 steps and needs a manual restart,
main.py:130-134). Pins: normal run checkpoints, injected faults restore from
the latest checkpoint and continue, preemption exits with a synchronous
checkpoint."""
import glob
import os
import threading

import numpy as np
import pytest
from PIL import Image

from control_gic_tpu.cli import train as train_cli
from control_gic_tpu.train import Trainer
from control_gic_tpu.utils.checkpoint import latest_step

TINY_YAML = """
ratios: [0.1, 0.4]
model:
  n_embed: 32
  embed_dim: 4
  z_channels: 4
  ch: 32
  ch_mult: [1, 1, 2, 2, 2]
  num_res_blocks: 1
  attn_resolutions: [8]
  resolution: 64
train:
  learning_rate: 5.0e-5
"""


@pytest.fixture(scope="module")
def train_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("train_imgs")
    rng = np.random.default_rng(0)
    for i in range(8):
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"{i}.png")
    return str(d)


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "tiny.yaml"
    p.write_text(TINY_YAML)
    return str(p)


def _args(train_dir, tiny_cfg, tmp_path, steps, extra=()):
    return ["--config", tiny_cfg, "--train-dir", train_dir,
            "--steps", str(steps), "--batch-size", "8",
            "--image-size", "64", "--ckpt-dir", str(tmp_path / "ckpt"),
            "--log-dir", str(tmp_path / "logs"),
            "--log-every", "1", "--ckpt-every", "2", *extra]


def _wrap_train_step(monkeypatch, wrapper):
    """Trainer jits train_step as an instance attribute in __init__; wrap it
    post-construction on every instance the CLI builds (restarts rebuild)."""
    orig_init = Trainer.__init__

    def patched_init(self, *a, **k):
        orig_init(self, *a, **k)
        inner = self.train_step
        self.train_step = lambda state, x: wrapper(inner, state, x)

    monkeypatch.setattr(Trainer, "__init__", patched_init)


def test_restart_recovers_from_fault(train_dir, tiny_cfg, tmp_path,
                                     monkeypatch):
    """An injected fault mid-run must trigger an in-process restart from the
    latest checkpoint, and the run must still reach --steps."""
    calls = {"n": 0}

    def flaky(inner, state, x):
        calls["n"] += 1
        if calls["n"] == 4:  # after the step-2 checkpoint exists
            raise train_cli.TrainFault("injected fault")
        return inner(state, x)

    _wrap_train_step(monkeypatch, flaky)
    train_cli.main(_args(train_dir, tiny_cfg, tmp_path, steps=5))
    assert latest_step(str(tmp_path / "ckpt")) == 5
    # restarted from step 2: steps 0..4 + final state.step=5 means the
    # post-fault attempt re-ran steps 2..4; total calls > steps
    assert calls["n"] > 5
    logs = glob.glob(str(tmp_path / "logs" / "*.jsonl"))
    assert logs and os.path.getsize(logs[0]) > 0


def test_nonfinite_metrics_raise_train_fault(train_dir, tiny_cfg, tmp_path,
                                             monkeypatch):
    """Non-finite losses are detected at log steps and raised as faults;
    with --max-restarts 0 the fault propagates."""
    def poisoned(inner, state, x):
        state, metrics = inner(state, x)
        metrics = dict(metrics)
        metrics["train/aeloss"] = np.float32("nan")
        return state, metrics

    _wrap_train_step(monkeypatch, poisoned)
    with pytest.raises(train_cli.TrainFault, match="non-finite"):
        train_cli.main(_args(train_dir, tiny_cfg, tmp_path, steps=3,
                             extra=("--max-restarts", "0")))


def test_preemption_checkpoints_and_exits(train_dir, tiny_cfg, tmp_path,
                                          monkeypatch):
    """Once the preemption flag is set, the loop finishes the in-flight
    step, writes a synchronous checkpoint, and returns — long before
    --steps."""
    ev = threading.Event()
    monkeypatch.setattr(train_cli, "_install_preemption_handler", lambda: ev)

    def step_then_preempt(inner, state, x):
        out = inner(state, x)
        ev.set()
        return out

    _wrap_train_step(monkeypatch, step_then_preempt)
    train_cli.main(_args(train_dir, tiny_cfg, tmp_path, steps=500))
    saved = latest_step(str(tmp_path / "ckpt"))
    assert saved is not None and saved <= 2
