"""Config loader + logging-schedule tests (no jax compute)."""
import os

from control_gic_tpu.config import load_config
from control_gic_tpu.utils.logging import log_schedule_hit

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_load_train_yaml():
    cfg = load_config(os.path.join(ROOT, "configs", "train.yaml"))
    assert cfg.model.n_embed == 1024
    assert cfg.model.ch_mult == (1, 2, 2, 4, 4)
    assert cfg.train.learning_rate == 5e-5
    assert cfg.train.b1 == 0.5
    assert cfg.train.loss.g_weight == 0.1
    assert cfg.ratios == (0.1, 0.4)
    assert cfg.trainer["max_steps"] == 165000


def test_load_inference_yaml():
    cfg = load_config(os.path.join(ROOT, "configs", "inference.yaml"))
    assert cfg.model.dtype == "bfloat16"
    assert cfg.ckpt_path == "./ckpt/model.ckpt"


def test_log_schedule():
    hits = [s for s in range(5000) if log_schedule_hit(s)]
    assert hits[:11] == [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024]
    assert 2048 in hits and 3072 in hits and 4096 in hits
    assert 1500 not in hits
