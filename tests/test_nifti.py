import numpy as np
import pytest

from multimodal_tta_tpu.data import nifti


def _random_img(shape=(5, 6, 7), seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    return (rng.rand(*shape) * 100).astype(dtype)


class TestRoundTrip:
    @pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
    def test_save_load(self, tmp_path, ext):
        arr = _random_img()
        affine = np.diag([1.0, 1.0, 3.0, 1.0])
        affine[:3, 3] = [10.0, -5.0, 2.0]
        p = str(tmp_path / f"x{ext}")
        nifti.save(arr, affine, p)
        img = nifti.load(p)
        assert img.shape == arr.shape
        assert np.allclose(np.asarray(img.dataobj), arr)
        assert np.allclose(img.affine, affine, atol=1e-5)

    def test_uint8_mask(self, tmp_path):
        mask = (_random_img(seed=1) > 50).astype(np.uint8)
        p = str(tmp_path / "m.nii.gz")
        nifti.save(mask, np.eye(4), p)
        img = nifti.load(p)
        assert img.dataobj.dtype == np.uint8
        assert np.array_equal(np.asarray(img.dataobj), mask)

    def test_deterministic_gzip_output(self, tmp_path):
        arr = _random_img(seed=2)
        p1, p2 = str(tmp_path / "a.nii.gz"), str(tmp_path / "b.nii.gz")
        nifti.save(arr, np.eye(4), p1)
        nifti.save(arr, np.eye(4), p2)
        assert open(p1, "rb").read() == open(p2, "rb").read()

    def test_fortran_order_on_disk(self, tmp_path):
        # x must be the fastest-varying axis in the file
        arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        p = str(tmp_path / "f.nii")
        nifti.save(arr, np.eye(4), p)
        raw = open(p, "rb").read()
        data = np.frombuffer(raw[352:], dtype=np.float32)
        assert data[0] == arr[0, 0, 0]
        assert data[1] == arr[1, 0, 0]


class TestOrientation:
    def test_identity_affine_unchanged(self):
        arr = _random_img(seed=3)
        out, aff = nifti.apply_orientation_to_canonical(arr, np.eye(4))
        assert np.array_equal(out, arr)
        assert np.allclose(aff, np.eye(4))

    def test_lps_flips_xy(self):
        arr = _random_img(seed=4)
        affine = np.diag([-1.0, -1.0, 1.0, 1.0])
        out, aff = nifti.apply_orientation_to_canonical(arr, affine)
        assert np.array_equal(out, arr[::-1, ::-1, :])
        # new affine must be RAS+ (positive diagonal)
        assert aff[0, 0] > 0 and aff[1, 1] > 0 and aff[2, 2] > 0

    def test_axis_permutation(self):
        arr = _random_img(shape=(4, 5, 6), seed=5)
        # input axes are (z, x, y): affine column0->S, column1->R, column2->A
        affine = np.zeros((4, 4))
        affine[2, 0] = 1.0  # input axis 0 -> z
        affine[0, 1] = 1.0  # input axis 1 -> x
        affine[1, 2] = 1.0  # input axis 2 -> y
        affine[3, 3] = 1.0
        out, aff = nifti.apply_orientation_to_canonical(arr, affine)
        assert out.shape == (5, 6, 4)
        assert np.array_equal(out, np.transpose(arr, (1, 2, 0)))

    def test_physical_points_preserved(self):
        rng = np.random.RandomState(6)
        arr = _random_img(shape=(4, 5, 6), seed=7)
        # random axis-aligned orientation: permutation + flips + spacing + origin
        perm = rng.permutation(3)
        signs = rng.choice([-1.0, 1.0], 3)
        spacing = rng.uniform(0.5, 3.0, 3)
        affine = np.zeros((4, 4))
        for in_ax in range(3):
            affine[perm[in_ax], in_ax] = signs[in_ax] * spacing[in_ax]
        affine[:3, 3] = rng.uniform(-10, 10, 3)
        affine[3, 3] = 1.0

        out, new_aff = nifti.apply_orientation_to_canonical(arr, affine)

        # pick a voxel in the old frame, locate its value in the new frame via
        # physical coordinates: new_idx = inv(new_aff) @ old_aff @ old_idx
        old_idx = np.array([2, 3, 4, 1.0])
        phys = affine @ old_idx
        new_idx = np.linalg.solve(new_aff, phys)
        ni = np.round(new_idx[:3]).astype(int)
        assert out[ni[0], ni[1], ni[2]] == arr[2, 3, 4]

    def test_canonical_loader(self, tmp_path):
        arr = _random_img(seed=8)
        affine = np.diag([-2.0, 1.0, 1.0, 1.0])  # x flipped
        p = str(tmp_path / "c.nii.gz")
        nifti.save(arr, affine, p)
        data = nifti.load_canonical(p)
        assert data.dtype == np.float32
        assert np.allclose(data, arr[::-1, :, :])


class TestHeaderFeatures:
    def test_scl_slope_applied(self, tmp_path):
        import struct

        arr = np.ones((2, 2, 2), np.int16) * 10
        p = str(tmp_path / "s.nii")
        nifti.save(arr, np.eye(4), p)
        raw = bytearray(open(p, "rb").read())
        struct.pack_into("<2f", raw, 112, 2.0, 5.0)  # slope=2, inter=5
        open(p, "wb").write(bytes(raw))
        img = nifti.load(p)
        data = img.get_fdata(np.float32)
        assert np.allclose(data, 25.0)

    def test_scl_slope_zero_ignores_scaling(self, tmp_path):
        """NIfTI-1 spec (nifti1.h, scl_slope): 'If the scl_slope field is
        zero, no scaling is done' — the intercept is ignored too (nibabel
        get_slope_inter returns (None, None))."""
        import struct

        arr = np.ones((2, 2, 2), np.int16) * 10
        p = str(tmp_path / "s0.nii")
        nifti.save(arr, np.eye(4), p)
        raw = bytearray(open(p, "rb").read())
        struct.pack_into("<2f", raw, 112, 0.0, 5.0)  # slope=0, inter=5
        open(p, "wb").write(bytes(raw))
        data = nifti.load(p).get_fdata(np.float32)
        assert np.allclose(data, 10.0)  # NOT 15: inter ignored when slope==0

    def test_scl_slope_nan_ignores_scaling(self, tmp_path):
        import struct

        arr = np.ones((2, 2, 2), np.int16) * 7
        p = str(tmp_path / "snan.nii")
        nifti.save(arr, np.eye(4), p)
        raw = bytearray(open(p, "rb").read())
        struct.pack_into("<2f", raw, 112, float("nan"), 5.0)
        open(p, "wb").write(bytes(raw))
        data = nifti.load(p).get_fdata(np.float32)
        assert np.allclose(data, 7.0)

    def test_scl_inter_nonfinite_treated_as_zero(self, tmp_path):
        import struct

        arr = np.ones((2, 2, 2), np.int16) * 3
        p = str(tmp_path / "snin.nii")
        nifti.save(arr, np.eye(4), p)
        raw = bytearray(open(p, "rb").read())
        struct.pack_into("<2f", raw, 112, 2.0, float("nan"))
        open(p, "wb").write(bytes(raw))
        data = nifti.load(p).get_fdata(np.float32)
        assert np.allclose(data, 6.0)

    def test_big_endian(self, tmp_path):
        # craft a big-endian header by byteswapping a little-endian file
        arr = _random_img(shape=(3, 3, 3), seed=9)
        p = str(tmp_path / "be.nii")
        nifti.save(arr, np.eye(4), p)
        img = nifti.load(p)
        assert np.allclose(np.asarray(img.dataobj), arr)

    def test_bad_magic_raises(self, tmp_path):
        p = str(tmp_path / "junk.nii")
        open(p, "wb").write(b"\x00" * 400)
        with pytest.raises(ValueError):
            nifti.load(p)


class TestEdgeCases:
    def test_4d_volume_roundtrip(self, tmp_path):
        arr = _random_img(shape=(4, 5, 6), seed=20)[..., None].repeat(3, axis=-1)  # (X,Y,Z,T)
        p = str(tmp_path / "4d.nii.gz")
        nifti.save(arr, np.eye(4), p)
        img = nifti.load(p)
        assert img.shape == (4, 5, 6, 3)
        assert np.allclose(np.asarray(img.dataobj), arr)

    def test_canonical_4d_reorients_spatial_only(self, tmp_path):
        arr = _random_img(shape=(4, 5, 6), seed=21)[..., None].repeat(2, axis=-1)
        affine = np.diag([-1.0, 1.0, 1.0, 1.0])
        p = str(tmp_path / "4dflip.nii.gz")
        nifti.save(arr, affine, p)
        img = nifti.as_closest_canonical(nifti.load(p))
        got = np.asarray(img.dataobj)
        assert got.shape == (4, 5, 6, 2)
        assert np.allclose(got, arr[::-1, :, :, :])

    def test_decoded_cache_hits_and_bounds(self, tmp_path):
        from multimodal_tta_tpu.data.nifti import DecodedCache

        p = str(tmp_path / "c.nii.gz")
        nifti.save(_random_img(seed=22), np.eye(4), p)
        cache = nifti.DecodedCache(max_bytes=10 << 20)
        a = cache.get_or_load(p)
        b = cache.get_or_load(p)
        assert a is b  # second access is a cache hit
        assert cache.hits == 1 and cache.misses == 1

        tiny = nifti.DecodedCache(max_bytes=10)  # too small to store anything
        x = tiny.get_or_load(p)
        y = tiny.get_or_load(p)
        assert x is not y  # nothing cached under the byte bound
        assert tiny.misses == 2


class TestRoundtripFuzz:
    """Property-style fuzz: random dtype/shape/affine volumes survive
    write -> read with identical array bytes and affine (VERDICT.md item 8)."""

    def test_roundtrip_fuzz(self, tmp_path):
        rng = np.random.RandomState(1234)
        dtypes = [np.uint8, np.int16, np.int32, np.float32, np.float64]
        for trial in range(20):
            ndim = int(rng.choice([3, 3, 3, 4]))  # mostly 3D, some 4D
            shape = tuple(int(rng.randint(1, 9)) for _ in range(ndim))
            dt = dtypes[trial % len(dtypes)]
            if np.issubdtype(dt, np.integer):
                info = np.iinfo(dt)
                arr = rng.randint(max(info.min, -1000), min(info.max, 1000) + 1,
                                  size=shape).astype(dt)
            else:
                arr = (rng.randn(*shape) * 100).astype(dt)
            # random affine: rotation-ish linear part + offset
            lin = rng.randn(3, 3) + np.eye(3) * 3.0
            aff = np.eye(4)
            aff[:3, :3] = lin
            aff[:3, 3] = rng.randn(3) * 50
            p = str(tmp_path / f"f{trial}.nii{'.gz' if trial % 2 else ''}")
            nifti.save(arr, aff, p)
            img = nifti.load(p)
            got = np.asarray(img.dataobj)
            assert got.dtype == arr.dtype, (trial, got.dtype, arr.dtype)
            assert got.shape == arr.shape
            np.testing.assert_array_equal(got, arr)
            # sform is stored as float32 rows
            np.testing.assert_allclose(img.affine, aff, rtol=1e-6, atol=1e-4)
            # scaling defaults (slope=1, inter=0) leave values untouched
            np.testing.assert_allclose(
                img.get_fdata(np.float64), arr.astype(np.float64)
            )


class TestDiskDecodedCache:
    def test_roundtrip_and_hit(self, tmp_path):
        from multimodal_tta_tpu.data.nifti import DiskDecodedCache, load_canonical_dhw

        arr = _random_img(shape=(6, 5, 4), seed=31)
        src = str(tmp_path / "v.nii.gz")
        nifti.save(arr, np.diag([1.0, 1.0, 3.0, 1.0]), src)
        cache = DiskDecodedCache(str(tmp_path / "cache"))

        first = cache.get_or_load(src)
        np.testing.assert_array_equal(first, load_canonical_dhw(src))
        files = [f for f in (tmp_path / "cache").iterdir() if f.suffix == ".npy"]
        assert len(files) == 1 and not any("tmp" in f.name for f in (tmp_path / "cache").iterdir())

        second = cache.get_or_load(src)
        np.testing.assert_array_equal(second, first)

    def test_stale_entry_busts_on_rewrite(self, tmp_path):
        import time as _time

        from multimodal_tta_tpu.data.nifti import DiskDecodedCache

        src = str(tmp_path / "v.nii.gz")
        cache = DiskDecodedCache(str(tmp_path / "cache"))
        a = _random_img(shape=(4, 4, 4), seed=1)
        nifti.save(a, np.eye(4), src)
        got_a = cache.get_or_load(src)
        _time.sleep(0.01)
        b = _random_img(shape=(4, 4, 4), seed=2)
        nifti.save(b, np.eye(4), src)  # same path, new content
        got_b = cache.get_or_load(src)
        assert not np.allclose(got_a, got_b)
        np.testing.assert_array_equal(got_b, b.transpose(2, 1, 0))

    def test_native_fast_path_scl_slope_zero(self, tmp_path):
        """load_canonical_dhw (the fused native path) must honor the same
        slope==0 -> no-scaling rule as get_fdata."""
        import struct

        from multimodal_tta_tpu.data.nifti import load_canonical_dhw

        arr = np.ones((3, 3, 3), np.int16) * 10
        p = str(tmp_path / "s0n.nii")
        nifti.save(arr, np.eye(4), p)
        raw = bytearray(open(p, "rb").read())
        struct.pack_into("<2f", raw, 112, 0.0, 5.0)  # slope=0, inter=5
        open(p, "wb").write(bytes(raw))
        out = load_canonical_dhw(p)
        assert np.allclose(out, 10.0)  # NOT 15
