"""Training observability: scalar metric logging + periodic image grids.

Mirrors the reference's wandb + ImageLogger setup (main.py:21-111) without
assuming network access: scalars go to JSONL (and wandb when importable and
configured), image grids (inputs / reconstructions / partition map) go to
PNG files on the reference's log schedule — every power of two up to 1024,
then every 1024 steps (main.py:91-99).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


def log_schedule_hit(step: int, period: int = 1024) -> bool:
    if step < period:
        return step > 0 and (step & (step - 1)) == 0   # powers of two
    return step % period == 0


class MetricLogger:
    def __init__(self, out_dir: str, use_wandb: bool = False,
                 wandb_project: Optional[str] = None):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                wandb.init(project=wandb_project or "control_gic_tpu")
                self._wandb = wandb
            except Exception:
                pass

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time(),
               **{k: float(v) for k, v in metrics.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        self._f.close()


class ImageLogger:
    """Save input/recon/partition-map grids on the log schedule."""

    def __init__(self, out_dir: str, max_images: int = 4):
        self.dir = os.path.join(out_dir, "images")
        os.makedirs(self.dir, exist_ok=True)
        self.max_images = max_images

    def maybe_log(self, step: int, inputs: np.ndarray, recons: np.ndarray,
                  grain_indices: Optional[np.ndarray] = None) -> bool:
        if not log_schedule_hit(step):
            return False
        self.log(step, inputs, recons, grain_indices)
        return True

    def log(self, step: int, inputs: np.ndarray, recons: np.ndarray,
            grain_indices: Optional[np.ndarray] = None) -> None:
        from PIL import Image
        from .draw import draw_partition_map

        n = min(self.max_images, inputs.shape[0])
        rows = [np.concatenate(list(inputs[:n]), axis=1),
                np.concatenate(list(np.clip(recons[:n], -1, 1)), axis=1)]
        if grain_indices is not None:
            pm = draw_partition_map(np.asarray(inputs[:n]),
                                    np.asarray(grain_indices[:n]))
            rows.append(np.concatenate(list(pm), axis=1))
        grid = np.concatenate(rows, axis=0)        # stacked rows
        grid = ((np.clip(grid, -1, 1) + 1) * 127.5).astype(np.uint8)
        Image.fromarray(grid).save(
            os.path.join(self.dir, f"step_{step:08d}.png"))
