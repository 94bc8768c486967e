"""Native C++ NIfTI decode core: build, parity with the Python path."""

import gzip
import os

import numpy as np
import pytest

from multimodal_tta_tpu.data import _native, nifti


@pytest.fixture(scope="module")
def lib_available():
    ok = _native.available()
    if not ok:
        pytest.skip("native library unavailable (no compiler?)")
    return ok


class TestGunzip:
    def test_roundtrip(self, lib_available):
        payload = os.urandom(100_000)
        gz = gzip.compress(payload)
        out = _native.gunzip(gz, len(payload))
        assert out == payload

    def test_size_hint_too_small_grows(self, lib_available):
        payload = b"x" * 50_000
        gz = gzip.compress(payload)
        out = _native.gunzip(gz, 10)
        assert out == payload

    def test_garbage_returns_none(self, lib_available):
        assert _native.gunzip(b"not gzip data", 100) is None


class TestCastReorient:
    @pytest.mark.parametrize("dtype,code", [(np.uint8, 2), (np.int16, 4), (np.float32, 16), (np.float64, 64)])
    def test_transpose_parity(self, lib_available, dtype, code):
        rng = np.random.RandomState(0)
        arr = (rng.rand(5, 6, 7) * 100).astype(dtype)  # (X,Y,Z)
        raw = np.asfortranarray(arr).tobytes(order="F")
        out = _native.cast_reorient_f32(raw, code, arr.shape, [False, False, False], 1.0, 0.0)
        want = arr.astype(np.float32).transpose(2, 1, 0)
        assert np.allclose(out, want)

    def test_flips(self, lib_available):
        arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        raw = np.asfortranarray(arr).tobytes(order="F")
        out = _native.cast_reorient_f32(raw, 16, arr.shape, [True, False, True], 1.0, 0.0)
        want = arr[::-1, :, ::-1].astype(np.float32).transpose(2, 1, 0)
        assert np.allclose(out, want)

    def test_scaling(self, lib_available):
        arr = np.ones((2, 2, 2), np.int16) * 10
        raw = np.asfortranarray(arr).tobytes(order="F")
        out = _native.cast_reorient_f32(raw, 4, arr.shape, [False] * 3, 2.0, 5.0)
        assert np.allclose(out, 25.0)


class TestFusedLoader:
    def test_matches_python_path(self, lib_available, tmp_path):
        rng = np.random.RandomState(1)
        arr = (rng.rand(6, 7, 8) * 200 - 100).astype(np.float32)
        affine = np.diag([1.0, 1.0, 3.0, 1.0])
        p = str(tmp_path / "a.nii.gz")
        nifti.save(arr, affine, p)

        fast = nifti.load_canonical_dhw(p)
        slow = np.ascontiguousarray(nifti.load_canonical(p).transpose(2, 1, 0))
        assert fast.dtype == np.float32
        assert np.allclose(fast, slow)

    def test_matches_python_path_flipped(self, lib_available, tmp_path):
        rng = np.random.RandomState(2)
        arr = (rng.rand(5, 5, 5) * 10).astype(np.float32)
        affine = np.diag([-2.0, 1.0, -1.0, 1.0])  # x and z flipped
        p = str(tmp_path / "b.nii.gz")
        nifti.save(arr, affine, p)
        fast = nifti.load_canonical_dhw(p)
        slow = np.ascontiguousarray(nifti.load_canonical(p).transpose(2, 1, 0))
        assert np.allclose(fast, slow)

    def test_uncompressed(self, lib_available, tmp_path):
        arr = np.arange(60, dtype=np.int16).reshape(3, 4, 5)
        p = str(tmp_path / "c.nii")
        nifti.save(arr, np.eye(4), p)
        fast = nifti.load_canonical_dhw(p)
        assert np.allclose(fast, arr.astype(np.float32).transpose(2, 1, 0))

    def test_permuted_affine_falls_back(self, tmp_path):
        """Orientation with a permutation uses the Python path but still
        returns the correct canonical (Z,Y,X) volume."""
        arr = np.random.RandomState(3).rand(4, 5, 6).astype(np.float32)
        affine = np.zeros((4, 4))
        affine[2, 0] = 1.0
        affine[0, 1] = 1.0
        affine[1, 2] = 1.0
        affine[3, 3] = 1.0
        p = str(tmp_path / "d.nii.gz")
        nifti.save(arr, affine, p)
        fast = nifti.load_canonical_dhw(p)
        slow = np.ascontiguousarray(nifti.load_canonical(p).transpose(2, 1, 0))
        assert np.allclose(fast, slow)
