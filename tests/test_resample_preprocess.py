"""Resampler + preprocessing pipeline tests (scipy oracle for interpolation)."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest
from scipy import ndimage

from multimodal_tta_tpu.data import nifti
from multimodal_tta_tpu.ops.resample import (
    Grid,
    bbox_mm_to_index_roi,
    crop_image,
    pad_image,
    resample_to_reference,
    resample_to_spacing,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_grid(spacing=(1.0, 1.0, 1.0), origin=(0.0, 0.0, 0.0), size=(8, 8, 8), direction=None):
    return Grid(
        origin=np.asarray(origin, float),
        spacing=np.asarray(spacing, float),
        direction=np.eye(3) if direction is None else np.asarray(direction, float),
        size=tuple(size),
    )


class TestGrid:
    def test_ras_roundtrip(self):
        aff = np.diag([1.0, 1.0, 3.0, 1.0])
        aff[:3, 3] = [5.0, -7.0, 2.0]
        g = Grid.from_ras_affine(aff, (10, 10, 10))
        assert np.allclose(g.to_ras_affine(), aff)
        assert np.allclose(g.spacing, [1, 1, 3])

    def test_lps_conversion(self):
        # RAS affine identity -> LPS origin flips x,y
        aff = np.eye(4)
        aff[:3, 3] = [1.0, 2.0, 3.0]
        g = Grid.from_ras_affine(aff, (4, 4, 4))
        assert np.allclose(g.origin, [-1.0, -2.0, 3.0])

    def test_index_physical_roundtrip(self):
        g = make_grid(spacing=(2.0, 1.0, 3.0), origin=(1.0, -2.0, 5.0))
        idx = np.array([[1.0, 2.0, 3.0]])
        p = g.index_to_physical(idx)
        back = g.physical_to_continuous_index(p)
        assert np.allclose(back, idx)


class TestResampleToSpacing:
    def test_downsample_size(self):
        data = np.random.RandomState(0).rand(8, 8, 8).astype(np.float32)
        g = make_grid(spacing=(1, 1, 1), size=(8, 8, 8))
        out, og = resample_to_spacing(data, g, (2, 2, 2), use_jax=False)
        assert out.shape == (4, 4, 4)
        assert np.allclose(og.spacing, [2, 2, 2])

    def test_identity_spacing_preserves(self):
        data = np.random.RandomState(1).rand(6, 6, 6).astype(np.float32)
        g = make_grid()
        g = Grid(origin=g.origin, spacing=g.spacing, direction=g.direction, size=(6, 6, 6))
        out, og = resample_to_spacing(data, g, (1, 1, 1), use_jax=False)
        assert np.allclose(out, data, atol=1e-5)

    def test_linear_matches_scipy_zoom_grid(self):
        """Compare against scipy.ndimage.map_coordinates on the same index map."""
        data = np.random.RandomState(2).rand(9, 9, 9).astype(np.float32)
        g = make_grid(size=(9, 9, 9))
        out, og = resample_to_spacing(data, g, (1.5, 1.5, 1.5), use_jax=False)
        # index map: new index i -> old index 1.5*i
        idx = np.meshgrid(*(np.arange(s) for s in out.shape), indexing="ij")
        coords = np.stack([c * 1.5 for c in idx])
        want = ndimage.map_coordinates(data, coords, order=1, mode="nearest")
        # interior (no boundary handling differences)
        inner = tuple(slice(0, 5) for _ in range(3))
        assert np.allclose(out[inner], want[inner], atol=1e-4)

    def test_jax_matches_numpy(self):
        data = np.random.RandomState(3).rand(7, 8, 9).astype(np.float32)
        g = make_grid(size=(7, 8, 9), spacing=(1.0, 2.0, 1.0))
        a, _ = resample_to_spacing(data, g, (1.4, 1.0, 2.0), use_jax=False)
        b, _ = resample_to_spacing(data, g, (1.4, 1.0, 2.0), use_jax=True)
        assert np.allclose(a, b, atol=1e-4)


class TestResampleToReference:
    def test_shifted_grid(self):
        data = np.zeros((8, 8, 8), np.float32)
        data[4, 4, 4] = 1.0
        g = make_grid(size=(8, 8, 8))
        ref = make_grid(origin=(1.0, 0.0, 0.0), size=(8, 8, 8))  # shifted +1mm in x
        out, _ = resample_to_reference(data, g, ref, use_jax=False)
        # ref voxel (3,4,4) is at physical (4,4,4) -> value 1
        assert out[3, 4, 4] == pytest.approx(1.0, abs=1e-5)

    def test_nearest_preserves_binary(self):
        rng = np.random.RandomState(4)
        mask = (rng.rand(8, 8, 8) > 0.5).astype(np.float32)
        g = make_grid(size=(8, 8, 8))
        ref = make_grid(origin=(0.25, 0.0, 0.0), size=(8, 8, 8))
        out, _ = resample_to_reference(mask, g, ref, method="nearest", use_jax=False)
        assert set(np.unique(out)) <= {0.0, 1.0}

    def test_out_of_fov_default(self):
        data = np.ones((4, 4, 4), np.float32)
        g = make_grid(size=(4, 4, 4))
        ref = make_grid(origin=(100.0, 0.0, 0.0), size=(4, 4, 4))
        out, _ = resample_to_reference(data, g, ref, default_value=-7.0, use_jax=False)
        assert np.allclose(out, -7.0)


class TestBBoxRoi:
    def test_axis_aligned(self):
        g = make_grid(spacing=(2.0, 2.0, 2.0), origin=(0, 0, 0), size=(20, 20, 20))
        start, size, dbg = bbox_mm_to_index_roi(g, 2.0, 6.0, 0.0, 4.0, 2.0, 10.0)
        assert start == [1, 0, 1]
        assert size == [3, 3, 5]  # ceil(3)-floor(1)+1 etc.

    def test_flip_robust(self):
        # direction flipped in x: physical x decreases with index
        g = make_grid(
            spacing=(1.0, 1.0, 1.0),
            origin=(10.0, 0.0, 0.0),
            size=(11, 11, 11),
            direction=np.diag([-1.0, 1.0, 1.0]),
        )
        start, size, _ = bbox_mm_to_index_roi(g, 2.0, 5.0, 1.0, 2.0, 1.0, 2.0)
        # x physical [2,5] -> index [5,8]
        assert start[0] == 5 and size[0] == 4


class TestPadCrop:
    def test_pad_moves_origin(self):
        data = np.ones((4, 4, 4), np.float32)
        g = make_grid(spacing=(2.0, 1.0, 1.0))
        out, og = pad_image(data, g, [1, 0, 0], [0, 0, 0], -5.0)
        assert out.shape == (5, 4, 4)
        assert out[0, 0, 0] == -5.0
        assert np.allclose(og.origin, [-2.0, 0.0, 0.0])
        # voxel that was at index 0 is now at index 1 but same physical place
        assert np.allclose(og.index_to_physical(np.array([[1, 0, 0]])), [[0, 0, 0]])

    def test_crop_moves_origin(self):
        data = np.arange(64, dtype=np.float32).reshape(4, 4, 4)
        g = make_grid()
        out, og = crop_image(data, g, [1, 2, 0], [2, 2, 4])
        assert out.shape == (2, 2, 4)
        assert np.allclose(og.origin, [1.0, 2.0, 0.0])
        assert out[0, 0, 0] == data[1, 2, 0]


class TestPreprocessEndToEnd:
    def _make_raw(self, root):
        """Synthetic raw HECKTOR tree: CT/PT/GT with differing grids."""
        os.makedirs(root, exist_ok=True)
        rng = np.random.RandomState(0)
        rows_b, rows_i = [], []
        for pid in ["CHUS001", "CHUM002"]:
            ct = (rng.rand(24, 24, 12).astype(np.float32) * 2000) - 1000
            aff_ct = np.diag([2.0, 2.0, 3.0, 1.0])  # RAS
            nifti.save(ct, aff_ct, os.path.join(root, f"{pid}_ct.nii.gz"))
            # PET on a coarser grid
            pt = np.abs(rng.rand(12, 12, 12)).astype(np.float32) * 10
            aff_pt = np.diag([4.0, 4.0, 3.0, 1.0])
            nifti.save(pt, aff_pt, os.path.join(root, f"{pid}_pt.nii.gz"))
            gt = np.zeros((24, 24, 12), np.uint8)
            gt[8:14, 8:14, 4:8] = 1
            nifti.save(gt, aff_ct, os.path.join(root, f"{pid}_gtvt.nii.gz"))
            # bbox in ITK LPS phys coords; CT RAS x span [0,46] -> LPS x [-46,0]
            rows_b.append(
                {"PatientID": pid, "x1": -40.0, "x2": -8.0, "y1": -40.0, "y2": -8.0, "z1": 6.0, "z2": 30.0}
            )
            rows_i.append({"PatientID": pid, "CenterID": 1})
        pd.DataFrame(rows_b).to_csv(os.path.join(root, "bbox.csv"), index=False)
        pd.DataFrame(rows_i).to_csv(os.path.join(root, "info.csv"), index=False)

    def test_full_pipeline(self, tmp_path):
        raw = str(tmp_path / "raw")
        out = str(tmp_path / "proc")
        self._make_raw(raw)
        cfg = {
            "bbox_csv": os.path.join(raw, "bbox.csv"),
            "info_csv": os.path.join(raw, "info.csv"),
            "nii_root": raw,
            "out_root": out,
            "out_manifest_csv": os.path.join(out, "manifest.csv"),
            "target_spacing": [1.0, 1.0, 3.0],
            "output_size": [48, 48, 12],
            "enable_split": True,
            "seed": 2026,
            "val_per_center": 0,
            "source_centers": ["CHUM"],
            "target_centers": ["CHUS"],
        }
        import yaml

        cfg_path = str(tmp_path / "cfg.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
        env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "scripts", "prepare_hecktor21.py"),
             "--config", cfg_path, "--mode", "full"],
            capture_output=True, text=True, env=env, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]

        mf = pd.read_csv(os.path.join(out, "manifest.csv"))
        assert len(mf) == 2
        assert (mf["status"] == "ok").all()
        assert set(mf["split"]) == {"train", "test"}

        # processed volumes have the exact target shape + spacing
        img = nifti.load(mf.iloc[0]["ct_proc"])
        assert img.shape == (48, 48, 12)
        zooms = np.sqrt((img.affine[:3, :3] ** 2).sum(axis=0))
        assert np.allclose(zooms, [1.0, 1.0, 3.0], atol=1e-4)

        # mask stays binary through nearest resampling
        gt = nifti.load(mf.iloc[0]["gtvt_proc"])
        assert set(np.unique(np.asarray(gt.dataobj))) <= {0, 1}
        # tumor survived the crop
        assert np.asarray(gt.dataobj).sum() > 0

    def test_split_only_mode(self, tmp_path):
        raw = str(tmp_path / "raw")
        out = str(tmp_path / "proc")
        self._make_raw(raw)
        cfg = {
            "bbox_csv": os.path.join(raw, "bbox.csv"),
            "info_csv": os.path.join(raw, "info.csv"),
            "nii_root": raw,
            "out_root": out,
            "out_manifest_csv": os.path.join(out, "manifest.csv"),
            "enable_split": True,
            "source_centers": ["CHUM"],
            "target_centers": ["CHUS"],
            "val_per_center": 0,
        }
        import yaml

        cfg_path = str(tmp_path / "cfg.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
        env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "scripts", "prepare_hecktor21.py"),
             "--config", cfg_path, "--mode", "split_only"],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        mf = pd.read_csv(os.path.join(out, "manifest.csv"))
        assert len(mf) == 2
        assert "ct_proc" in mf.columns


class TestPrepareBrats:
    def test_full_pipeline(self, tmp_path):
        import yaml

        raw = tmp_path / "raw"
        rng = np.random.RandomState(0)
        affine = np.diag([1.2, 1.2, 1.2, 1.0])
        for case in ["BraTS-GLI-0001", "BraTS-GLI-0002"]:
            d = raw / case
            d.mkdir(parents=True)
            for m in ["t1n", "t1c", "t2w", "t2f"]:
                nifti.save(rng.rand(20, 24, 20).astype(np.float32), affine, str(d / f"{case}-{m}.nii.gz"))
            seg = rng.randint(0, 4, size=(20, 24, 20)).astype(np.uint8)
            nifti.save(seg, affine, str(d / f"{case}-seg.nii.gz"))

        cfg = {
            "raw_root": str(raw),
            "out_root": str(tmp_path / "proc"),
            "target_spacing": [1.0, 1.0, 1.0],
            "output_size": [24, 28, 24],
            "split_seed": 1,
            "split_ratios": [1.0, 0.0, 0.0],
        }
        cfg_path = str(tmp_path / "cfg.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
        env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "scripts", "prepare_brats.py"), "--config", cfg_path],
            capture_output=True, text=True, env=env, timeout=900,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]

        mf = pd.read_csv(os.path.join(cfg["out_root"], "processed.csv"))
        assert len(mf) == 8  # 2 cases x 4 modalities
        assert (mf["status"] == "ok").all()
        assert set(mf["modality"]) == {"t1n", "t1c", "t2w", "t2f"}

        img = nifti.load(mf.iloc[0]["img_path"])
        assert img.shape == (24, 28, 24)
        seg = nifti.load(mf.iloc[0]["label_path"])
        assert np.asarray(seg.dataobj).max() <= 3

        # the produced manifest must load through the BraTS dataset
        from multimodal_tta_tpu.data.brats import BratsMultiSourceNiftiDataset, SourceSpec, DEFAULT_REGION_MAPS

        ds = BratsMultiSourceNiftiDataset(
            sources=[SourceSpec(
                name="test", csv_path=os.path.join(cfg["out_root"], "processed.csv"),
                profile="gli", root_dir=None,
                include_splits={"train": ["train"], "val": [], "test": []},
                region_map=DEFAULT_REGION_MAPS["gli"],
            )],
            split="train",
            expected_shape=(24, 28, 24),
        )
        s = ds[0]
        assert s["image"].shape == (24, 28, 24, 4)
        assert s["label"].shape == (24, 28, 24, 3)


class TestAssignSplits:
    """Golden-split regression: the np.RandomState consumption order in
    assign_splits is a bit-exactness contract with the reference pipeline
    (SURVEY §7.3 hard-part 6) — these goldens pin it so the implementation
    can be restructured freely without drifting the splits."""

    @staticmethod
    def _splits():
        sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))
        try:
            from prepare_hecktor21 import assign_splits
        finally:
            sys.path.pop(0)
        return assign_splits

    @staticmethod
    def _frame():
        ids = [
            f"{c}{i:03d}"
            for c in ["CHGJ", "CHUS", "CHUM", "CHUP", "CHMR", "XXXX"]
            for i in range(7)
        ]
        return pd.DataFrame({"patient_id": ids, "center_code": [i[:4] for i in ids]})

    def test_golden_seed_2026(self):
        assign_splits = self._splits()
        out = assign_splits(
            self._frame(), True, ["CHGJ", "CHUS", "CHUM"], ["CHUP", "CHMR"], 2, 2026, "ignore"
        )
        val = [r.patient_id for r in out.itertuples() if r.split == "val"]
        assert val == ["CHGJ004", "CHGJ005", "CHUS005", "CHUS006", "CHUM000", "CHUM002"]
        assert (out[out.center_code.isin(["CHUP", "CHMR"])]["split"] == "test").all()
        assert (out[out.center_code.isin(["CHUP", "CHMR"])]["domain"] == "target").all()
        assert (out[out.center_code == "XXXX"]["split"] == "ignore").all()
        n_train = (out["split"] == "train").sum()
        assert n_train == 3 * 7 - 6

    def test_golden_other_policy_source(self):
        assign_splits = self._splits()
        out = assign_splits(self._frame(), True, ["CHGJ"], ["CHUS"], 3, 7, "source")
        val = [(r.patient_id, r.split) for r in out.itertuples() if r.split == "val"]
        assert val == [
            ("CHGJ000", "val"), ("CHGJ002", "val"), ("CHGJ005", "val"),
            ("CHUM001", "val"), ("CHUM002", "val"), ("CHUM005", "val"),
            ("CHUP001", "val"), ("CHUP004", "val"), ("CHUP005", "val"),
            ("CHMR003", "val"), ("CHMR004", "val"), ("CHMR005", "val"),
            ("XXXX001", "val"), ("XXXX002", "val"), ("XXXX004", "val"),
        ]

    def test_split_disabled(self):
        assign_splits = self._splits()
        out = assign_splits(self._frame(), False, [], [], 0, 0, "ignore")
        assert (out["domain"] == "all").all() and (out["split"] == "train").all()

    def test_val_capped_at_center_size(self):
        assign_splits = self._splits()
        df = pd.DataFrame({"patient_id": ["CHGJ000", "CHGJ001"], "center_code": ["CHGJ", "CHGJ"]})
        out = assign_splits(df, True, ["CHGJ"], [], 5, 0, "ignore")
        assert (out["split"] == "val").all()


class TestPreprocessWorkers:
    """--workers N: thread-pooled per-case pipeline, bit-identical output."""

    def _run(self, tmp_path, tag, workers):
        raw = str(tmp_path / f"raw_{tag}")
        out = str(tmp_path / f"proc_{tag}")
        TestPreprocessEndToEnd._make_raw(self, raw)
        # one missing-file row: the error-capture contract must survive the pool
        os.remove(os.path.join(raw, "CHUM002_pt.nii.gz"))
        cfg = {
            "bbox_csv": os.path.join(raw, "bbox.csv"),
            "info_csv": os.path.join(raw, "info.csv"),
            "nii_root": raw,
            "out_root": out,
            "out_manifest_csv": os.path.join(out, "manifest.csv"),
            "target_spacing": [1.0, 1.0, 3.0],
            "output_size": [48, 48, 12],
            "enable_split": True,
            "seed": 2026,
            "val_per_center": 0,
            "source_centers": ["CHUM"],
            "target_centers": ["CHUS"],
        }
        import yaml

        cfg_path = str(tmp_path / f"cfg_{tag}.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
        env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "scripts", "prepare_hecktor21.py"),
             "--config", cfg_path, "--mode", "full", "--workers", str(workers)],
            capture_output=True, text=True, env=env, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return pd.read_csv(os.path.join(out, "manifest.csv"))

    def test_pool_output_bit_identical_to_serial(self, tmp_path):
        m1 = self._run(tmp_path, "w1", workers=1)
        m2 = self._run(tmp_path, "w2", workers=2)
        # same rows in the same order, same statuses (incl. the captured
        # missing-file row), same provenance columns
        assert list(m1["patient_id"]) == list(m2["patient_id"])
        assert list(m1["status"]) == list(m2["status"])
        assert "missing_file" in set(m1["status"])
        drop = [c for c in m1.columns if c.endswith(("_raw", "_proc"))]
        pd.testing.assert_frame_equal(
            m1.drop(columns=drop), m2.drop(columns=drop)
        )
        # processed volumes are bit-identical
        ok1 = m1[m1["status"] == "ok"].reset_index(drop=True)
        ok2 = m2[m2["status"] == "ok"].reset_index(drop=True)
        for col in ("ct_proc", "pt_proc", "gtvt_proc"):
            for a, b in zip(ok1[col], ok2[col]):
                va = np.asarray(nifti.load(a).dataobj)
                vb = np.asarray(nifti.load(b).dataobj)
                np.testing.assert_array_equal(va, vb)


class TestPrepareBratsWorkers:
    def test_pool_matches_serial(self, tmp_path):
        """--workers 2: same manifest (splits pinned by serial RNG order),
        bit-identical volumes."""
        import yaml

        raw = tmp_path / "raw"
        rng = np.random.RandomState(0)
        affine = np.diag([1.2, 1.2, 1.2, 1.0])
        for case in ["BraTS-GLI-0001", "BraTS-GLI-0002", "BraTS-GLI-0003"]:
            d = raw / case
            d.mkdir(parents=True)
            for m in ["t1n", "t1c", "t2w", "t2f"]:
                nifti.save(rng.rand(20, 24, 20).astype(np.float32), affine,
                           str(d / f"{case}-{m}.nii.gz"))
            seg = rng.randint(0, 4, size=(20, 24, 20)).astype(np.uint8)
            nifti.save(seg, affine, str(d / f"{case}-seg.nii.gz"))

        manifests = {}
        for tag, workers in (("w1", 1), ("w2", 2)):
            cfg = {
                "raw_root": str(raw),
                "out_root": str(tmp_path / f"proc_{tag}"),
                "target_spacing": [1.0, 1.0, 1.0],
                "output_size": [24, 28, 24],
                "split_seed": 1,
                "split_ratios": [0.5, 0.25, 0.25],
            }
            cfg_path = str(tmp_path / f"cfg_{tag}.yaml")
            with open(cfg_path, "w") as f:
                yaml.safe_dump(cfg, f)
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
            env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
            env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(REPO_ROOT, "scripts", "prepare_brats.py"),
                 "--config", cfg_path, "--workers", str(workers)],
                capture_output=True, text=True, env=env, timeout=900,
            )
            assert proc.returncode == 0, proc.stderr[-2000:]
            manifests[tag] = pd.read_csv(
                os.path.join(cfg["out_root"], "processed.csv")
            )
        m1, m2 = manifests["w1"], manifests["w2"]
        assert list(m1["subject_id"]) == list(m2["subject_id"])
        assert list(m1["split"]) == list(m2["split"])  # RNG order pinned
        assert list(m1["status"]) == list(m2["status"])
        for a, b in zip(m1["img_path"], m2["img_path"]):
            np.testing.assert_array_equal(
                np.asarray(nifti.load(a).dataobj), np.asarray(nifti.load(b).dataobj)
            )
