"""Data pipeline tests: conventions, shapes, prefetcher."""
import numpy as np
import pytest
from PIL import Image

from control_gic_tpu.data import (EvalImageDataset, ImageFolderDataset,
                                  prefetch_batches)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i, size in enumerate([(100, 80), (64, 64), (130, 200)]):
        arr = rng.integers(0, 255, size=(size[1], size[0], 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"{i}.png")
    sub = d / "nested"
    sub.mkdir()
    Image.fromarray(np.zeros((48, 48, 3), np.uint8)).save(sub / "x.jpg")
    return str(d)


def test_train_dataset_convention(image_dir):
    ds = ImageFolderDataset(image_dir, image_size=32)
    assert len(ds) == 4          # recursive glob
    x = ds[0]
    assert x.shape == (32, 32, 3)
    assert x.dtype == np.float32
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_eval_dataset_convention(image_dir):
    ds = EvalImageDataset(image_dir)
    for i in range(len(ds)):
        x = ds[i]
        assert x.shape[0] % 16 == 0 and x.shape[1] % 16 == 0
        assert 0.0 <= x.min() and x.max() <= 1.0
    # range slicing
    assert len(EvalImageDataset(image_dir, images_range=(1, 3))) == 2


def test_prefetch_batches(image_dir):
    ds = ImageFolderDataset(image_dir, image_size=32)
    batches = list(prefetch_batches(ds, 2, shuffle=True, seed=1, epochs=2))
    assert len(batches) == 4     # 4 imgs / batch 2 x 2 epochs
    for b in batches:
        assert b.shape == (2, 32, 32, 3)


def test_prefetch_resume_continues_stream(image_dir):
    """start_step=N reproduces exactly the tail of the fresh stream — the
    Lightning-resume data-fidelity semantics (reference main.py:130-134)."""
    ds = ImageFolderDataset(image_dir, image_size=32)
    full = list(prefetch_batches(ds, 2, shuffle=True, seed=7, epochs=3))
    assert len(full) == 6
    for start in (1, 2, 3, 5):
        tail = list(prefetch_batches(ds, 2, shuffle=True, seed=7, epochs=3,
                                     start_step=start))
        assert len(tail) == len(full) - start
        for a, b in zip(tail, full[start:]):
            np.testing.assert_array_equal(a, b)
    # different epochs genuinely reshuffle (not the same order every epoch)
    e0 = np.concatenate(full[:2]).reshape(2 * 2, -1)
    e1 = np.concatenate(full[2:4]).reshape(2 * 2, -1)
    assert not np.array_equal(e0, e1)
