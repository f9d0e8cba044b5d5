"""Native (C++) batch-gather tests: build, correctness, fallback."""
import numpy as np

from vgd_tpu.data import native


def test_build_and_gather():
    assert native.build(), "g++ build of the gather library failed"
    assert native.available()
    data = np.random.default_rng(0).integers(0, 255, (100, 8, 8, 3),
                                             dtype=np.uint8)
    idx = np.array([5, 0, 99, 42, 17], np.int64)
    out = native.gather_batch(data, idx, n_threads=4)
    np.testing.assert_array_equal(out, data[idx])


def test_gather_fused_f32():
    data = np.random.default_rng(0).integers(0, 255, (50, 4, 4, 3),
                                             dtype=np.uint8)
    idx = np.arange(50, dtype=np.int64)[::-1].copy()
    out = native.gather_batch_signed_f32(data, idx, n_threads=2)
    np.testing.assert_allclose(out, data[idx].astype(np.float32) / 127.5 - 1,
                               atol=1e-6)


def test_gather_single_thread_fallback():
    data = np.random.default_rng(1).integers(0, 255, (10, 2, 2, 1),
                                             dtype=np.uint8)
    idx = np.array([3, 1], np.int64)
    out = native.gather_batch(data, idx, n_threads=1)  # numpy path
    np.testing.assert_array_equal(out, data[idx])
