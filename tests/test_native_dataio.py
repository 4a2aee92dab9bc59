"""Native C++ data-pipeline library vs the numpy fallback: IDX parsing
(plain + gzip) and multithreaded batch gather must be bit-identical."""
import numpy as np
import pytest

from snnimageclassification_tpu.data import native_loader
from tests.test_data import _write_idx  # reuse the IDX writer helper

requires_native = pytest.mark.skipif(
    not native_loader.native_available(), reason="native dataio not built"
)


def test_native_builds():
    """The toolchain is present in dev/CI images; the library must build."""
    assert native_loader.load_native() is not None


@requires_native
@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("dtype", [np.uint8, np.int32])
def test_read_idx_native_matches_numpy(tmp_path, gz, dtype):
    arr = (np.arange(3 * 5 * 7) % 250).astype(dtype).reshape(3, 5, 7)
    p = tmp_path / ("x.idx" + (".gz" if gz else ""))
    _write_idx(p, arr, gz=gz)
    got = native_loader.read_idx_native(p)
    np.testing.assert_array_equal(got, arr)
    assert got.dtype == arr.dtype


@requires_native
def test_read_idx_native_bad_file(tmp_path):
    p = tmp_path / "bad.idx"
    p.write_bytes(b"\x01\x02\x08\x01" + b"\x00" * 8)
    with pytest.raises(ValueError):
        native_loader.read_idx_native(p)


@requires_native
def test_gather_rows_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.random((1000, 784)).astype(np.float32)
    idx = rng.permutation(1000)[:333]
    got = native_loader.gather_rows(src, idx)
    np.testing.assert_array_equal(got, src[idx])


@requires_native
def test_gather_rows_large_parallel_path():
    rng = np.random.default_rng(1)
    src = rng.random((5000, 64)).astype(np.float32)
    idx = rng.integers(0, 5000, size=4096)
    got = native_loader.gather_rows(src, idx)
    np.testing.assert_array_equal(got, src[idx])


def test_gather_rows_fallback_non_f32():
    src = np.arange(20).reshape(10, 2)  # int64: native path declines
    idx = np.array([3, 1, 7])
    np.testing.assert_array_equal(native_loader.gather_rows(src, idx), src[idx])


@requires_native
def test_dataset_read_idx_uses_native(tmp_path):
    """data.datasets.read_idx routes through the native parser."""
    from snnimageclassification_tpu.data.datasets import read_idx

    arr = np.arange(28 * 28, dtype=np.uint8).reshape(1, 28, 28)
    p = tmp_path / "train-images-idx3-ubyte"
    _write_idx(p, arr)
    np.testing.assert_array_equal(read_idx(p), arr)
