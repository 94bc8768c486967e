"""Prediction export: geometry recovery, evaluator-exact masks, CLI."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from fixtures import make_hecktor_fixture

from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.core.train_state import TrainState
from multimodal_tta_tpu.data import nifti
from multimodal_tta_tpu.data.hecktor21 import Hecktor21Dataset
from multimodal_tta_tpu.data.loader import HostLoader
from multimodal_tta_tpu.evaluation.export import PredictionExporter
from multimodal_tta_tpu.evaluation.seg_eval import SegmentationEvaluationStrategy
from multimodal_tta_tpu.models import UNet3D


class TestCanonicalGeometryPeek:
    def test_peek_matches_full_decode(self, tmp_path):
        """Header-only geometry equals the affine/shape of a full canonical
        decode, including axis permutation + flips."""
        rng = np.random.default_rng(0)
        aff = np.array(
            [[0, 0, -2.0, 10], [1.5, 0, 0, -5], [0, -3.0, 0, 7], [0, 0, 0, 1]]
        )
        arr = rng.normal(size=(9, 7, 5)).astype(np.float32)
        p = str(tmp_path / "x.nii.gz")
        nifti.save(arr, aff, p)

        img = nifti.as_closest_canonical(nifti.load(p))
        peek_aff, peek_shape = nifti.peek_canonical_geometry(p)
        assert peek_shape == img.shape[:3]
        np.testing.assert_allclose(peek_aff, img.affine)

    def test_identity_affine_passthrough(self, tmp_path):
        aff = np.diag([1.0, 1.0, 3.0, 1.0])
        p = str(tmp_path / "y.nii.gz")
        nifti.save(np.zeros((4, 5, 6), np.float32), aff, p)
        peek_aff, peek_shape = nifti.peek_canonical_geometry(p)
        assert peek_shape == (4, 5, 6)
        np.testing.assert_allclose(peek_aff, aff)


def make_dataset(tmp_path, shape=(16, 16, 16)):
    manifest = make_hecktor_fixture(str(tmp_path / "data"), shape=shape)
    return Hecktor21Dataset(
        manifest,
        "test",
        target_center="CHUS",
        val_per_center=1,
        expected_shape=shape,
    )


def make_state(in_ch=2, n_cls=1, seed=0):
    m = UNet3D(
        in_channels=in_ch,
        num_classes=n_cls,
        channels=(4, 8, 16, 32, 64),
        strides=(2, 2, 2, 2),
        num_res_units=1,
        norm="INSTANCE",
    )
    x = jnp.zeros((1, 16, 16, 16, in_ch))
    variables = m.init(jax.random.PRNGKey(seed), x, train=True)
    return TrainState.create(
        apply_fn=m.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=optax.identity(),
    )


def eval_cfg():
    return ConfigNode(
        {
            "task": {"seed": 0, "eval_strategy": "seg_eval"},
            "training": {"criterion": {"sigmoid": True, "softmax": False}},
            "evaluation": {"seg": {"region_order": ["gtvt"], "threshold": 0.5}},
        }
    )


class TestSourceGeometry:
    def test_hecktor_source_geometry(self, tmp_path):
        ds = make_dataset(tmp_path)
        aff, shape_xyz = ds.source_geometry(0)
        assert shape_xyz == (16, 16, 16)
        np.testing.assert_allclose(aff, np.diag([1.0, 1.0, 3.0, 1.0]))


class TestExporter:
    def test_export_matches_evaluator_and_source_grid(self, tmp_path):
        """Exported masks are exactly the evaluator's thresholded preds,
        written back in (X,Y,Z) with the source affine."""
        ds = make_dataset(tmp_path)
        loader = HostLoader(ds, batch_size=2, num_workers=0)
        state = make_state()
        strategy = SegmentationEvaluationStrategy(eval_cfg())
        out_dir = str(tmp_path / "preds")

        exporter = PredictionExporter(strategy, out_dir)
        rows = exporter.run(state, loader, mesh=None)

        assert len(rows) == len(ds)
        assert os.path.exists(os.path.join(out_dir, "predictions.csv"))
        assert all(r["status"] == "ok" for r in rows)

        # oracle: the strategy's own forward on the first case
        sample = ds[0]
        image = jnp.asarray(sample["image"])[None]
        _, prob = jax.jit(strategy._probs_fn(state))(image)
        want_dhw = (np.asarray(prob)[0, ..., 0] >= 0.5).astype(np.uint8)

        img = nifti.load(os.path.join(out_dir, f"{sample['case_id']}_pred.nii.gz"))
        got_xyz = np.asarray(img.dataobj)
        assert got_xyz.dtype == np.uint8
        assert got_xyz.shape == (16, 16, 16)
        np.testing.assert_allclose(img.affine, np.diag([1.0, 1.0, 3.0, 1.0]))
        np.testing.assert_array_equal(got_xyz, np.transpose(want_dhw, (2, 1, 0)))

    def test_save_prob_and_manifest_columns(self, tmp_path):
        ds = make_dataset(tmp_path)
        loader = HostLoader(ds, batch_size=4, num_workers=0)
        state = make_state()
        strategy = SegmentationEvaluationStrategy(eval_cfg())
        out_dir = str(tmp_path / "preds_p")

        rows = PredictionExporter(strategy, out_dir, save_prob=True).run(
            state, loader, mesh=None
        )
        r0 = rows[0]
        assert "voxels_gtvt" in r0 and "prob_file" in r0
        img = nifti.load(os.path.join(out_dir, r0["prob_file"]))
        prob = np.asarray(img.dataobj)
        assert prob.dtype == np.float32
        assert prob.shape == (16, 16, 16)
        assert float(prob.min()) >= 0.0 and float(prob.max()) <= 1.0

    def test_no_geometry_falls_back_to_identity(self, tmp_path):
        """A dataset without source_geometry still exports (status notes the
        identity-affine fallback) — the manifest-status error-capture
        pattern, not a crash."""

        class ArrayDataset:
            def __len__(self):
                return 2

            def __getitem__(self, i):
                rng = np.random.RandomState(i)
                return {
                    "image": rng.normal(size=(16, 16, 16, 2)).astype(np.float32),
                    "label": np.zeros((16, 16, 16, 1), np.float32),
                    "case_id": f"case{i}",
                    "domain": "SYN",
                    "index": i,
                }

        loader = HostLoader(ArrayDataset(), batch_size=2, num_workers=0)
        state = make_state()
        strategy = SegmentationEvaluationStrategy(eval_cfg())
        rows = PredictionExporter(strategy, str(tmp_path / "p")).run(
            state, loader, mesh=None
        )
        assert len(rows) == 2
        assert all(r["status"].startswith("no_geometry") for r in rows)

    def test_export_on_mesh_with_padding(self, tmp_path):
        """Export over the 8-device mesh: odd case counts pad up to the data
        axis and the padded rows are not written."""
        from multimodal_tta_tpu.parallel.mesh import make_mesh

        ds = make_dataset(tmp_path)  # CHUS target -> 4 test cases
        loader = HostLoader(ds, batch_size=3, num_workers=0)
        state = make_state()
        strategy = SegmentationEvaluationStrategy(eval_cfg())
        mesh = make_mesh(data=8)
        out_dir = str(tmp_path / "mesh_preds")
        with mesh:
            rows = PredictionExporter(strategy, out_dir).run(state, loader, mesh=mesh)
        assert len(rows) == len(ds)
        written = [f for f in os.listdir(out_dir) if f.endswith("_pred.nii.gz")]
        assert len(written) == len(ds)


class TestUncertaintyExport:
    def _flip_cfg(self):
        cfg = eval_cfg()
        cfg.evaluation.flip_tta = ConfigNode({"enable": True, "axes": [2, 3]})
        return cfg

    def test_uncert_volume_and_triage_column(self, tmp_path):
        ds = make_dataset(tmp_path)
        loader = HostLoader(ds, batch_size=2, num_workers=0)
        state = make_state()
        strategy = SegmentationEvaluationStrategy(self._flip_cfg())
        out_dir = str(tmp_path / "preds_u")

        rows = PredictionExporter(
            strategy, out_dir, save_uncertainty=True
        ).run(state, loader, mesh=None)
        r0 = rows[0]
        assert "uncert_file" in r0 and "mean_uncert_in_pred" in r0
        img = nifti.load(os.path.join(out_dir, r0["uncert_file"]))
        unc = np.asarray(img.dataobj)
        assert unc.dtype == np.float32 and unc.shape == (16, 16, 16)
        assert float(unc.min()) >= 0.0
        # an untrained conv net is not flip-equivariant: disagreement > 0
        assert float(unc.max()) > 1e-6

    def test_uncertainty_requires_flip_ensemble(self, tmp_path):
        ds = make_dataset(tmp_path)
        loader = HostLoader(ds, batch_size=2, num_workers=0)
        state = make_state()
        strategy = SegmentationEvaluationStrategy(eval_cfg())  # flip OFF
        with pytest.raises(ValueError, match="flip_tta"):
            PredictionExporter(
                strategy, str(tmp_path / "x"), save_uncertainty=True
            ).run(state, loader, mesh=None)
