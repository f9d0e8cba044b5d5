"""Data pipeline tests: synthetic source, split, loader, device-side
corruption (parity with dataset_code.py semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from vgd_tpu.core.config import DataConfig
from vgd_tpu.data.celeba import (ArrayDataset, Loader, make_image_datasets,
                                 split_dataset, synthetic_faces)
from vgd_tpu.data.corrupt import (add_gaussian_noise, add_occlusion_rectangle,
                                  corrupt)


def test_synthetic_faces_deterministic():
    a = synthetic_faces(4, (32, 32), seed=7)
    b = synthetic_faces(4, (32, 32), seed=7)
    assert a.dtype == np.uint8 and a.shape == (4, 32, 32, 3)
    np.testing.assert_array_equal(a, b)


def test_split_and_loader_shapes():
    ds = ArrayDataset(synthetic_faces(100, (16, 16)))
    tr, va = split_dataset(ds, 0.9, seed=42)
    assert len(tr) == 90 and len(va) == 10
    loader = Loader(ds, tr, batch_size=32, shuffle=True, seed=0)
    batches = list(loader.epoch())
    assert len(batches) == 2  # drop-last
    for b, n in batches:
        assert b.shape == (32, 16, 16, 3) and b.dtype == np.uint8 and n == 32
    # val loader pads the final partial batch and reports valid count
    val = Loader(ds, va, batch_size=8, shuffle=False, drop_last=False)
    batches = list(val.epoch())
    assert batches[-1][0].shape[0] == 8 and batches[-1][1] == 2


def test_make_image_datasets_synthetic_fallback():
    cfg = DataConfig(path=None, image_size=(16, 16), batch_size=4,
                     dataset_size=40)
    tr, va, shape = make_image_datasets(cfg)
    assert shape == (16, 16, 3)
    assert tr.num_examples == 36 and va.num_examples == 4


def test_gaussian_noise_ranges():
    key = jax.random.key(0)
    img = jnp.zeros((4, 16, 16, 3))
    noisy = add_gaussian_noise(key, img, noise_max_std=0.5)
    assert noisy.shape == img.shape
    assert float(jnp.max(noisy)) <= 1.0 and float(jnp.min(noisy)) >= -1.0
    # per-sample std differs (dataset_code.py:36 draws std per image)
    stds = jnp.std(noisy, axis=(1, 2, 3))
    assert float(jnp.std(stds)) > 0.0


def test_occlusion_rectangle_geometry():
    key = jax.random.key(1)
    img = jnp.zeros((8, 64, 64, 3))
    out = add_occlusion_rectangle(key, img)
    changed = np.asarray(jnp.any(out != 0.0, axis=-1))  # (B, H, W)
    for i in range(8):
        ys, xs = np.nonzero(changed[i])
        assert len(ys) > 0, "rectangle must exist"
        h = ys.max() - ys.min() + 1
        w = xs.max() - xs.min() + 1
        # side length 1%..25% of 64 => [1, 16]
        assert 1 <= h <= 16 and 1 <= w <= 16
        # inside the central 25-75% band (dataset_code.py:51-52)
        assert ys.min() >= 16 and ys.max() <= 48
        assert xs.min() >= 16 and xs.max() <= 48
        # rectangle is dense (a filled rect, not scattered noise)
        assert len(ys) == h * w * 1.0 or len(ys) >= 0.9 * h * w


def test_corrupt_jit_compatible():
    key = jax.random.key(2)
    img = jnp.zeros((2, 64, 64, 3))
    fn = jax.jit(lambda k, x: corrupt(k, x, 0.25, occlusion=True))
    out = fn(key, img)
    assert out.shape == img.shape
