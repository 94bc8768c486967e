import numpy as np
import pandas as pd
import pytest

from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.data.hecktor21 import (
    Hecktor21Builder,
    Hecktor21Dataset,
    sample_val_indices_per_center,
    to_binary_mask,
)
from multimodal_tta_tpu.data.brats import (
    BratsMultiNiftiBuilder,
    build_region_masks_from_raw,
    DEFAULT_REGION_MAPS,
)
from multimodal_tta_tpu.data.loader import HostLoader
from multimodal_tta_tpu.data.transforms import get_seg_transforms

from fixtures import make_hecktor_fixture, make_brats_fixture


# ---------------------------------------------------------------------------
# split parity
# ---------------------------------------------------------------------------
def _reference_val_sampling(df_non_target, center_code_col, val_per_center, seed):
    """Literal transcription of the reference algorithm
    (reference: src/datasets/hecktor21.py:66-89) used as the parity oracle."""
    if val_per_center <= 0 or len(df_non_target) == 0:
        return np.array([], dtype=np.int64)
    rng = np.random.RandomState(seed)
    out = []
    centers = sorted(df_non_target[center_code_col].astype(str).str.upper().unique().tolist())
    for c in centers:
        d = df_non_target[df_non_target[center_code_col].astype(str).str.upper() == c]
        idxs = d.index.to_numpy()
        if idxs.size == 0:
            continue
        k = min(val_per_center, int(idxs.size))
        out.extend(rng.choice(idxs, size=k, replace=False).tolist())
    return np.array(out, dtype=np.int64)


class TestSplitParity:
    def test_val_sampling_bit_exact(self):
        rng = np.random.RandomState(0)
        centers = ["CHUS", "CHUM", "CHGJ", "CHMR"]
        df = pd.DataFrame(
            {
                "patient_id": [f"p{i}" for i in range(40)],
                "center_code": [centers[rng.randint(4)] for _ in range(40)],
            }
        )
        for seed in (2026, 7, 123):
            got = sample_val_indices_per_center(df, "center_code", 3, seed)
            want = _reference_val_sampling(df, "center_code", 3, seed)
            assert np.array_equal(got, want)

    def test_split_partition(self, tmp_path):
        manifest = make_hecktor_fixture(str(tmp_path))
        kw = dict(
            manifest_csv=manifest,
            target_center="CHUS",
            val_per_center=1,
            split_seed=2026,
            expected_shape=(12, 12, 6),
        )
        train = Hecktor21Dataset(split="train", **kw)
        val = Hecktor21Dataset(split="val", **kw)
        test = Hecktor21Dataset(split="test", **kw)
        assert len(test) == 4  # all CHUS
        assert len(val) == 2  # 1 per non-target center (CHUM, CHGJ)
        assert len(train) == 4 + 3 - 2
        # disjoint
        ids = lambda ds: {r["patient_id"] for r in ds._rows}
        assert not (ids(train) & ids(val))
        assert not (ids(train) & ids(test))
        assert all(pid.startswith("CHUS") for pid in ids(test))

    def test_multi_target_split(self, tmp_path):
        """Comma-separated target_center holds several centers out at once
        (the streaming-TTA multi-domain protocol); sources shrink to the
        rest."""
        manifest = make_hecktor_fixture(str(tmp_path / "multi"))
        kw = dict(
            manifest_csv=manifest,
            target_center="CHUS,CHUM",
            val_per_center=1,
            split_seed=2026,
            expected_shape=(12, 12, 6),
        )
        train = Hecktor21Dataset(split="train", **kw)
        test = Hecktor21Dataset(split="test", **kw)
        ids = lambda ds: {r["patient_id"] for r in ds._rows}
        assert all(pid[:4] in ("CHUS", "CHUM") for pid in ids(test))
        assert len(test) == 4 + 4
        assert all(pid.startswith("CHGJ") for pid in ids(train))


class TestBinaryMask:
    def test_01(self):
        y = np.array([0, 1, 1, 0], np.float32)
        assert np.array_equal(to_binary_mask(y), [0, 1, 1, 0])

    def test_0255(self):
        y = np.array([0, 255, 0], np.int32)
        assert np.array_equal(to_binary_mask(y), [0, 1, 0])

    def test_nonzero(self):
        y = np.array([0, 7, 3], np.int32)
        assert np.array_equal(to_binary_mask(y), [0, 1, 1])


class TestHecktorDataset:
    def test_getitem_shapes(self, tmp_path):
        manifest = make_hecktor_fixture(str(tmp_path))
        ds = Hecktor21Dataset(
            manifest_csv=manifest,
            split="test",
            target_center="CHUS",
            expected_shape=(12, 12, 6),
        )
        s = ds[0]
        assert s["image"].shape == (6, 12, 12, 2)  # [D,H,W,C] with D=Z
        assert s["label"].shape == (6, 12, 12, 1)
        assert s["domain"] == "CHUS"
        assert set(np.unique(s["label"])) <= {0.0, 1.0}

    def test_shape_mismatch_raises(self, tmp_path):
        manifest = make_hecktor_fixture(str(tmp_path))
        ds = Hecktor21Dataset(
            manifest_csv=manifest,
            split="test",
            target_center="CHUS",
            expected_shape=(10, 10, 6),
        )
        with pytest.raises(ValueError, match="Shape mismatch"):
            _ = ds[0]

    def test_builder_end_to_end(self, tmp_path):
        manifest = make_hecktor_fixture(str(tmp_path))
        cfg = ConfigNode(
            {
                "task": {"seed": 42},
                "dataset": {
                    "manifest_csv": manifest,
                    "expected_shape": [12, 12, 6],
                    "target_center": "CHUS",
                    "val_per_center": 1,
                    "split_seed": 2026,
                    "modality_order": ["ct", "pt"],
                },
                "training": {
                    "batch_size": 2,
                    "eval_batch_size": 2,
                    "num_workers": 2,
                    "data": {
                        "transforms": {
                            "normalize": True,
                            "geom_aug": False,
                            "intensity_aug": False,
                            "image_size": [6, 12, 12],
                            "intensity_policy": {
                                "enabled": True,
                                "channel_names": ["ct", "pt"],
                                "channels": {
                                    "ct": {"clip": [-1000, 1000], "zscore": {"masked": True, "mask_gt": -900}},
                                    "pt": {"clip": [0, 15], "zscore": {"masked": True, "mask_gt": 0.0}},
                                },
                            },
                        }
                    },
                },
            }
        )
        builder = Hecktor21Builder(cfg)
        loader = builder.get_loader("test")
        batch = next(iter(loader))
        assert batch["image"].shape == (2, 6, 12, 12, 2)
        assert batch["label"].shape == (2, 6, 12, 12, 1)
        assert isinstance(batch["domain"], list)
        # host normalization applied (policy mode): CT roughly zero-mean
        assert abs(float(batch["image"][..., 0].mean())) < 1.0


class TestBratsDataset:
    def test_region_maps(self):
        y = np.array([[0, 1], [2, 3]], np.int64)[None]  # [1,2,2]
        m = build_region_masks_from_raw(y, DEFAULT_REGION_MAPS["gli"])
        assert m.shape == (1, 2, 2, 3)
        # ET = {3}
        assert np.array_equal(m[..., 0], [[[0, 0], [0, 1]]])
        # TC = {1,3}
        assert np.array_equal(m[..., 1], [[[0, 1], [0, 1]]])
        # WT = {1,2,3}
        assert np.array_equal(m[..., 2], [[[0, 1], [1, 1]]])

    def test_ped_taxonomy(self):
        y = np.array([[1, 2], [3, 4]], np.int64)[None]
        m = build_region_masks_from_raw(y, DEFAULT_REGION_MAPS["ped"])
        assert np.array_equal(m[..., 0], [[[1, 0], [0, 0]]])  # ET={1}
        assert np.array_equal(m[..., 1], [[[1, 1], [1, 0]]])  # TC={1,2,3}
        assert np.array_equal(m[..., 2], [[[1, 1], [1, 1]]])  # WT={1..4}

    def test_builder_multi_source(self, tmp_path):
        csvs = make_brats_fixture(str(tmp_path))
        cfg = ConfigNode(
            {
                "task": {"seed": 42},
                "dataset": {
                    "expected_shape": [10, 12, 10],
                    "sources": [
                        {
                            "name": "glipre",
                            "profile": "gli",
                            "csv_path": csvs["glipre"],
                            "include_splits": {"train": ["train"], "val": ["test"], "test": []},
                        },
                        {
                            "name": "ssa",
                            "profile": "ssa",
                            "csv_path": csvs["ssa"],
                            "include_splits": {"train": [], "val": [], "test": ["train", "val", "test"]},
                        },
                        {
                            "name": "ped",
                            "profile": "ped",
                            "csv_path": csvs["ped"],
                            "include_splits": {"train": [], "val": [], "test": ["train", "val", "test"]},
                        },
                    ],
                },
                "training": {
                    "batch_size": 2,
                    "num_workers": 0,
                    "data": {
                        "transforms": {
                            "normalize": False,
                            "geom_aug": False,
                            "intensity_aug": False,
                            "image_size": [10, 12, 10],
                        }
                    },
                },
            }
        )
        b = BratsMultiNiftiBuilder(cfg)
        train = b.get_dataset("train")
        test = b.get_dataset("test")
        assert len(train) == 3  # glipre train only
        assert len(test) == 4  # ssa(2) + ped(2)
        s = train[0]
        assert s["image"].shape == (10, 12, 10, 4)
        assert s["label"].shape == (10, 12, 10, 3)
        doms = {test[i]["domain"] for i in range(len(test))}
        assert doms == {"ssa", "ped"}

    def test_disabled_split_returns_none(self, tmp_path):
        csvs = make_brats_fixture(str(tmp_path), sources={"glipre": {"profile": "gli", "cases": {"train": 2}}})
        cfg = ConfigNode(
            {
                "task": {"seed": 1},
                "dataset": {
                    "sources": [
                        {
                            "name": "glipre",
                            "profile": "gli",
                            "csv_path": csvs["glipre"],
                            "include_splits": {"train": ["train"], "val": [], "test": []},
                        }
                    ]
                },
                "training": {"data": {"transforms": {"normalize": False, "geom_aug": False, "intensity_aug": False}}},
            }
        )
        b = BratsMultiNiftiBuilder(cfg)
        assert b.build_dataset("val") is None


class TestLoader:
    class _ToyDS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"x": np.full((2, 2), i, np.float32), "name": f"s{i}"}

    def test_batching_and_len(self):
        dl = HostLoader(self._ToyDS(10), batch_size=3, shuffle=False, num_workers=0)
        assert len(dl) == 4
        batches = list(dl)
        assert batches[0]["x"].shape == (3, 2, 2)
        assert batches[-1]["x"].shape == (1, 2, 2)
        assert batches[0]["name"] == ["s0", "s1", "s2"]

    def test_drop_last(self):
        dl = HostLoader(self._ToyDS(10), batch_size=3, drop_last=True, num_workers=0)
        assert len(dl) == 3
        assert len(list(dl)) == 3

    def test_shuffle_reproducible_per_epoch(self):
        dl1 = HostLoader(self._ToyDS(16), batch_size=4, shuffle=True, seed=5, num_workers=0)
        dl2 = HostLoader(self._ToyDS(16), batch_size=4, shuffle=True, seed=5, num_workers=0)
        e1a = [b["x"][:, 0, 0].tolist() for b in dl1]
        e2a = [b["x"][:, 0, 0].tolist() for b in dl2]
        assert e1a == e2a
        e1b = [b["x"][:, 0, 0].tolist() for b in dl1]  # epoch 1 differs
        assert e1a != e1b

    def test_threaded_matches_serial(self):
        dl0 = HostLoader(self._ToyDS(9), batch_size=2, num_workers=0)
        dl4 = HostLoader(self._ToyDS(9), batch_size=2, num_workers=4)
        a = [b["x"].tolist() for b in dl0]
        b = [b["x"].tolist() for b in dl4]
        assert a == b

    def test_worker_exception_propagates(self):
        class Bad(self._ToyDS):
            def __getitem__(self, i):
                raise RuntimeError("boom")

        dl = HostLoader(Bad(4), batch_size=2, num_workers=2)
        with pytest.raises(RuntimeError, match="boom"):
            list(dl)

    def test_loader_survives_transient_worker_crash(self):
        """A crash poisons only the epoch it happens in: the same loader
        instance iterates cleanly afterwards (worker pool + queue are
        per-__iter__, so no broken state leaks across epochs)."""

        class FlakyOnce(self._ToyDS):
            def __init__(self, n):
                super().__init__(n)
                self.crashed = False

            def __getitem__(self, i):
                if not self.crashed and i == 1:
                    self.crashed = True
                    raise OSError("transient decode failure")
                return super().__getitem__(i)

        ds = FlakyOnce(6)
        dl = HostLoader(ds, batch_size=2, num_workers=2)
        with pytest.raises(OSError, match="transient"):
            list(dl)
        batches = [b["x"].tolist() for b in dl]  # next epoch: clean run
        assert len(batches) == 3

    def test_consumer_break_does_not_deadlock(self):
        """Abandoning iteration mid-epoch (e.g. early stop) must not hang on
        the bounded prefetch queue; the producer thread is signalled to stop
        and the loader can be iterated again."""
        dl = HostLoader(self._ToyDS(64), batch_size=2, num_workers=2, prefetch_batches=1)
        it = iter(dl)
        next(it)
        del it  # abandon mid-epoch with a full queue
        assert len([b for b in dl]) == 32  # fresh epoch still works


class TestTransformsHost:
    def test_strict_shape_check(self):
        t = get_seg_transforms(ndim=3, split="test", normalize=False, image_size=[4, 4, 4])
        img = np.zeros((4, 4, 4, 2), np.float32)
        lbl = np.zeros((4, 4, 4, 1), np.float32)
        t(img, lbl)  # ok
        with pytest.raises(ValueError, match="spatial mismatch"):
            t(np.zeros((5, 4, 4, 2), np.float32), lbl)

    def test_raw_label_dtype(self):
        t = get_seg_transforms(ndim=3, split="test", normalize=False, expected_label_channels=0)
        img = np.zeros((4, 4, 4, 1), np.float32)
        lbl = np.ones((4, 4, 4), np.float32) * 2
        _, out = t(img, lbl)
        assert out.dtype == np.int64 and out.shape == (4, 4, 4)

    def test_region_label_float(self):
        t = get_seg_transforms(ndim=3, split="test", normalize=False, expected_label_channels=3)
        img = np.zeros((4, 4, 4, 1), np.float32)
        lbl = np.ones((4, 4, 4, 3), np.uint8)
        _, out = t(img, lbl)
        assert out.dtype == np.float32 and out.shape == (4, 4, 4, 3)

    def test_region_channel_mismatch_raises(self):
        t = get_seg_transforms(ndim=3, split="test", normalize=False, expected_label_channels=3)
        with pytest.raises(ValueError, match="region channels"):
            t(np.zeros((4, 4, 4, 1), np.float32), np.ones((4, 4, 4, 2), np.float32))

    def test_geom_aug_rotates_image_and_label_together(self):
        t = get_seg_transforms(
            ndim=3, split="train", normalize=False, geom_aug=True, intensity_aug=False,
            expected_label_channels=1,
        )
        t.rot_prob = 1.0
        rng = np.random.Generator(np.random.Philox(key=[0, 0]))
        img = np.random.RandomState(0).rand(4, 6, 8, 1).astype(np.float32)
        lbl = (img > 0.5).astype(np.float32)
        out_i, out_l = t(img, lbl)
        assert np.array_equal(out_l, (out_i > 0.5).astype(np.float32))

    def test_eval_split_disables_aug(self):
        t = get_seg_transforms(ndim=3, split="val", normalize=False, geom_aug=True, intensity_aug=True)
        assert not t.geom_aug and not t.intensity_aug


class TestStructuredFixtures:
    def test_brats_structured_lesions_learnable(self, tmp_path):
        """n_lesions mode: nested-shell tumors with per-modality contrast —
        labels follow the profile taxonomy and regions are non-empty."""
        csvs = make_brats_fixture(
            str(tmp_path),
            shape=(24, 24, 16),
            sources={"glipre": {"profile": "gli", "cases": {"train": 2}}},
            n_lesions=(1, 2),
            radius_range=(5.0, 8.0),
            seed=3,
        )
        import pandas as pd
        from multimodal_tta_tpu.data import nifti

        df = pd.read_csv(csvs["glipre"])
        lab = nifti.load(df.iloc[0]["label_path"]).get_fdata()
        vals = set(np.unique(lab).astype(int))
        assert vals <= {0, 1, 2, 3} and len(vals) > 2  # nested shells present
        # the enhancing shell (id 3) lights up in t1c: contrast over noise
        t1c = df[df["modality"] == "t1c"].iloc[0]
        img = nifti.load(t1c["img_path"]).get_fdata()
        et = lab == 3
        assert et.any()
        assert img[et].mean() > img[~(lab > 0)].mean() + 1.0

    def test_hecktor_fixture_volumes_are_float32_on_disk(self, tmp_path):
        """Regression: uint8-mask * python-float promoted CT/PET to float64,
        silently doubling every fixture volume on disk (2x decode work in
        the e2e bench vs the production float32 dtype) and hitting a
        deflate worst case (~60x slower gzip-9 on zero-interleaved
        doubles). The generator must write the production dtype."""
        from multimodal_tta_tpu.data import nifti

        manifest = make_hecktor_fixture(
            str(tmp_path / "f32"),
            centers={"CHUP": 1},
            shape=(16, 16, 8),
            seed=7,
            domain_shift={"CHUP": {"ct_gain": 1.2, "bias_field": 0.3,
                                   "pt_gamma": 1.5, "noise": 50.0}},
        )
        import pandas as pd

        row = pd.read_csv(manifest).iloc[0]
        for col in ("ct_proc", "pt_proc"):
            img = nifti.load(row[col])
            assert img.dataobj.dtype == np.float32, (col, img.dataobj.dtype)

    def test_hecktor_domain_shift_changes_target_center_only(self, tmp_path):
        from multimodal_tta_tpu.data import nifti

        kw = dict(
            centers={"CHUS": 2, "CHUP": 2},
            shape=(16, 16, 8),
            seed=5,
            domain_shift={"CHUP": {"bias_field": 0.4, "ct_gain": 1.2, "noise": 50.0}},
        )
        m = make_hecktor_fixture(str(tmp_path / "a"), **kw)
        import pandas as pd

        df = pd.read_csv(m)
        ct_src = nifti.load(df[df.center_code == "CHUS"].iloc[0]["ct_proc"]).get_fdata()
        ct_tgt = nifti.load(df[df.center_code == "CHUP"].iloc[0]["ct_proc"]).get_fdata()
        # the shifted center has visibly different intensity statistics
        assert abs(float(np.std(ct_tgt)) - float(np.std(ct_src))) > 10.0
