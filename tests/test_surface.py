"""HD95/ASD parity tests against a scipy oracle implementing the MONAI
formulas (binary_erosion surface extraction + distance_transform_edt +
np.percentile), which is what the reference executes through MONAI."""

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from multimodal_tta_tpu.ops.surface import (
    batched_surface_metrics,
    extract_surface,
    squared_edt,
    surface_metrics_single,
)


# ---------------------------------------------------------------------------
# oracle (MONAI semantics)
# ---------------------------------------------------------------------------
def oracle_surface(mask):
    struct = ndimage.generate_binary_structure(3, 1)  # 6-connected cross
    eroded = ndimage.binary_erosion(mask, structure=struct, border_value=0)
    return mask & ~eroded


def oracle_metrics(pred, gt, spacing, percentile=95.0, symmetric_asd=False):
    pred = pred.astype(bool)
    gt = gt.astype(bool)
    sp = oracle_surface(pred)
    sg = oracle_surface(gt)
    if sp.sum() == 0 or sg.sum() == 0:
        return np.inf, np.inf
    # distance field to the surfaces via EDT of the complement
    d_to_gt = ndimage.distance_transform_edt(~sg, sampling=spacing)
    d_to_pred = ndimage.distance_transform_edt(~sp, sampling=spacing)
    d1 = d_to_gt[sp]  # pred->gt
    d2 = d_to_pred[sg]  # gt->pred
    hd = max(np.percentile(d1, percentile), np.percentile(d2, percentile))
    if symmetric_asd:
        asd = np.concatenate([d1, d2]).mean()
    else:
        asd = d1.mean()
    return float(hd), float(asd)


def oracle_nsd(pred, gt, spacing, tol):
    """Normalized surface Dice at tolerance (Nikolov et al. 2018 / MONAI
    compute_surface_dice): pooled fraction of surface voxels within tol of
    the other surface. One empty surface -> 0; both empty -> nan."""
    pred = pred.astype(bool)
    gt = gt.astype(bool)
    sp = oracle_surface(pred)
    sg = oracle_surface(gt)
    n = sp.sum() + sg.sum()
    if n == 0:
        return float("nan")
    hits = 0
    if sg.sum():
        d_to_gt = ndimage.distance_transform_edt(~sg, sampling=spacing)
        hits += int((d_to_gt[sp] <= tol).sum())
    if sp.sum():
        d_to_pred = ndimage.distance_transform_edt(~sp, sampling=spacing)
        hits += int((d_to_pred[sg] <= tol).sum())
    return hits / n


def ball(shape, center, r):
    grids = np.meshgrid(*(np.arange(s) for s in shape), indexing="ij")
    d2 = sum((g - c) ** 2 for g, c in zip(grids, center))
    return (d2 <= r * r).astype(np.float32)


class TestSurfaceExtraction:
    def test_matches_scipy(self):
        rng = np.random.RandomState(0)
        m = (rng.rand(10, 12, 9) > 0.6).astype(np.float32)
        got = np.asarray(extract_surface(jnp.asarray(m)))
        want = oracle_surface(m.astype(bool))
        assert np.array_equal(got.astype(bool), want)

    def test_border_voxels_are_surface(self):
        m = np.ones((4, 4, 4), np.float32)
        got = np.asarray(extract_surface(jnp.asarray(m)))
        want = oracle_surface(m.astype(bool))
        assert np.array_equal(got.astype(bool), want)
        assert got[0, 0, 0]  # corners are surface


class TestEDT:
    def test_single_point_isotropic(self):
        pts = np.zeros((8, 8, 8), np.float32)
        pts[3, 4, 2] = 1
        d2 = np.asarray(squared_edt(jnp.asarray(pts), (1.0, 1.0, 1.0)))
        ii, jj, kk = np.meshgrid(*(np.arange(8),) * 3, indexing="ij")
        want = (ii - 3) ** 2 + (jj - 4) ** 2 + (kk - 2) ** 2
        assert np.allclose(d2, want, atol=1e-4)

    def test_matches_scipy_random(self):
        rng = np.random.RandomState(1)
        pts = (rng.rand(9, 11, 7) > 0.9).astype(np.float32)
        if pts.sum() == 0:
            pts[2, 3, 4] = 1
        spacing = (3.0, 1.0, 1.25)
        d = np.sqrt(np.asarray(squared_edt(jnp.asarray(pts), spacing)))
        want = ndimage.distance_transform_edt(pts == 0, sampling=spacing)
        assert np.allclose(d, want, atol=1e-3)

    def test_empty_is_inf(self):
        d2 = np.asarray(squared_edt(jnp.zeros((4, 4, 4)), (1, 1, 1)))
        assert np.all(np.isinf(d2))


class TestSurfaceMetrics:
    @pytest.mark.parametrize("spacing", [(1.0, 1.0, 1.0), (3.0, 1.0, 1.0)])
    def test_parity_balls(self, spacing):
        shape = (16, 16, 16)
        pred = ball(shape, (8, 8, 8), 5)
        gt = ball(shape, (9, 7, 8), 4)
        hd, asd = surface_metrics_single(jnp.asarray(pred), jnp.asarray(gt), spacing)
        hd_o, asd_o = oracle_metrics(pred, gt, spacing)
        assert float(hd) == pytest.approx(hd_o, abs=1e-3)
        assert float(asd) == pytest.approx(asd_o, abs=1e-3)

    def test_parity_random_blobs(self):
        rng = np.random.RandomState(2)
        for seed in range(3):
            a = ndimage.binary_dilation(rng.rand(12, 14, 10) > 0.97, iterations=2)
            b = ndimage.binary_dilation(rng.rand(12, 14, 10) > 0.97, iterations=2)
            if a.sum() == 0 or b.sum() == 0:
                continue
            hd, asd = surface_metrics_single(
                jnp.asarray(a.astype(np.float32)), jnp.asarray(b.astype(np.float32)), (1, 1, 1)
            )
            hd_o, asd_o = oracle_metrics(a, b, (1, 1, 1))
            assert float(hd) == pytest.approx(hd_o, abs=1e-3)
            assert float(asd) == pytest.approx(asd_o, abs=1e-3)

    def test_symmetric_asd(self):
        pred = ball((12, 12, 12), (6, 6, 6), 4)
        gt = ball((12, 12, 12), (5, 6, 7), 3)
        _, asd = surface_metrics_single(
            jnp.asarray(pred), jnp.asarray(gt), (1, 1, 1), symmetric_asd=True
        )
        _, asd_o = oracle_metrics(pred, gt, (1, 1, 1), symmetric_asd=True)
        assert float(asd) == pytest.approx(asd_o, abs=1e-3)

    def test_identical_masks_zero(self):
        m = ball((10, 10, 10), (5, 5, 5), 3)
        hd, asd = surface_metrics_single(jnp.asarray(m), jnp.asarray(m), (1, 1, 1))
        assert float(hd) == pytest.approx(0.0, abs=1e-5)
        assert float(asd) == pytest.approx(0.0, abs=1e-5)

    def test_empty_pred_inf(self):
        gt = ball((8, 8, 8), (4, 4, 4), 2)
        hd, asd = surface_metrics_single(jnp.zeros((8, 8, 8)), jnp.asarray(gt), (1, 1, 1))
        assert np.isinf(float(hd))

    def test_batched(self):
        shape = (12, 12, 12)
        pred = np.stack(
            [np.stack([ball(shape, (6, 6, 6), 4), ball(shape, (5, 5, 5), 3)], axis=-1)], axis=0
        )
        gt = np.stack(
            [np.stack([ball(shape, (7, 6, 6), 4), ball(shape, (5, 6, 5), 3)], axis=-1)], axis=0
        )
        hd, asd = batched_surface_metrics(
            jnp.asarray(pred), jnp.asarray(gt), spacing=(1, 1, 1)
        )
        assert hd.shape == (1, 2) and asd.shape == (1, 2)
        for r in range(2):
            hd_o, asd_o = oracle_metrics(pred[0, ..., r], gt[0, ..., r], (1, 1, 1))
            assert float(hd[0, r]) == pytest.approx(hd_o, abs=1e-3)
            assert float(asd[0, r]) == pytest.approx(asd_o, abs=1e-3)


class TestNSD:
    @pytest.mark.parametrize("spacing,tol", [((1.0, 1.0, 1.0), 1.0),
                                             ((1.0, 1.0, 1.0), 2.5),
                                             ((3.0, 1.0, 1.0), 3.0)])
    def test_parity_balls(self, spacing, tol):
        shape = (16, 16, 16)
        pred = ball(shape, (8, 8, 8), 5)
        gt = ball(shape, (9, 7, 8), 4)
        _, _, nsd = surface_metrics_single(
            jnp.asarray(pred), jnp.asarray(gt), spacing, nsd_tol=tol
        )
        want = oracle_nsd(pred, gt, spacing, tol)
        assert float(nsd) == pytest.approx(want, abs=1e-4)

    def test_parity_random_blobs(self):
        rng = np.random.RandomState(7)
        for _ in range(3):
            a = ndimage.binary_dilation(rng.rand(12, 14, 10) > 0.97, iterations=2)
            b = ndimage.binary_dilation(rng.rand(12, 14, 10) > 0.97, iterations=2)
            if a.sum() == 0 or b.sum() == 0:
                continue
            _, _, nsd = surface_metrics_single(
                jnp.asarray(a.astype(np.float32)),
                jnp.asarray(b.astype(np.float32)),
                (1, 1, 1),
                nsd_tol=1.5,
            )
            want = oracle_nsd(a, b, (1, 1, 1), 1.5)
            assert float(nsd) == pytest.approx(want, abs=1e-4)

    def test_identical_masks_one(self):
        m = ball((10, 10, 10), (5, 5, 5), 3)
        _, _, nsd = surface_metrics_single(
            jnp.asarray(m), jnp.asarray(m), (1, 1, 1), nsd_tol=0.5
        )
        assert float(nsd) == pytest.approx(1.0, abs=1e-6)

    def test_one_empty_is_zero_both_empty_inf(self):
        gt = ball((8, 8, 8), (4, 4, 4), 2)
        z = jnp.zeros((8, 8, 8))
        _, _, nsd = surface_metrics_single(z, jnp.asarray(gt), (1, 1, 1), nsd_tol=1.0)
        assert float(nsd) == pytest.approx(0.0, abs=1e-6)
        _, _, nsd2 = surface_metrics_single(z, z, (1, 1, 1), nsd_tol=1.0)
        assert np.isinf(float(nsd2))

    def test_batched_per_region_tolerance(self):
        shape = (12, 12, 12)
        pred = np.stack(
            [np.stack([ball(shape, (6, 6, 6), 4), ball(shape, (5, 5, 5), 3)], axis=-1)],
            axis=0,
        )
        gt = np.stack(
            [np.stack([ball(shape, (7, 6, 6), 4), ball(shape, (5, 6, 5), 3)], axis=-1)],
            axis=0,
        )
        tols = [1.0, 2.0]
        hd, asd, nsd = batched_surface_metrics(
            jnp.asarray(pred), jnp.asarray(gt), spacing=(1, 1, 1), nsd_tol=tols
        )
        assert nsd.shape == (1, 2)
        for r in range(2):
            want = oracle_nsd(pred[0, ..., r], gt[0, ..., r], (1, 1, 1), tols[r])
            assert float(nsd[0, r]) == pytest.approx(want, abs=1e-4)
            # HD/ASD unchanged by the nsd computation
            hd_o, asd_o = oracle_metrics(pred[0, ..., r], gt[0, ..., r], (1, 1, 1))
            assert float(hd[0, r]) == pytest.approx(hd_o, abs=1e-3)
            assert float(asd[0, r]) == pytest.approx(asd_o, abs=1e-3)

    def test_seg_eval_reports_nsd(self):
        """Full seg_eval pass with nsd_tol set: parity keys + the
        empty-pred penalty (NSD -> 0, not the diagonal)."""
        from multimodal_tta_tpu.conf import ConfigNode
        from multimodal_tta_tpu.core.train_state import TrainState
        from multimodal_tta_tpu.evaluation import SegmentationEvaluationStrategy
        import optax

        shape = (12, 12, 12)
        gt = ball(shape, (6, 6, 6), 3)[None, ..., None]
        pred_ball = ball(shape, (7, 6, 6), 3)[None, ..., None]
        logits = np.where(pred_ball > 0, 5.0, -5.0).astype(np.float32)

        class FixedModel:
            def apply(self, variables, x, train=False):
                return jnp.asarray(logits)

        state = TrainState.create(
            apply_fn=FixedModel().apply, params={"w": jnp.zeros(1)}, tx=optax.identity()
        )
        cfg = ConfigNode(
            {
                "evaluation": {
                    "seg": {"region_order": ["gtvt"], "threshold": 0.5, "spacing": [1, 1, 1]},
                    "surface": {"enable": True, "nsd_tol": 1.0},
                },
                "training": {"criterion": {"sigmoid": True}},
            }
        )
        strat = SegmentationEvaluationStrategy(cfg)
        batch = {"image": gt.astype(np.float32), "label": gt.astype(np.float32), "domain": ["d1"]}
        metrics = strat.evaluate_epoch(state, [batch], mesh=None)
        want = oracle_nsd(pred_ball[0, ..., 0], gt[0, ..., 0], (1, 1, 1), 1.0)
        assert metrics["gtvt_nsd"] == pytest.approx(want, abs=1e-4)
        assert metrics["avg_nsd"] == pytest.approx(want, abs=1e-4)
        assert metrics["dom/d1/avg_nsd"] == pytest.approx(want, abs=1e-4)

        # empty prediction against non-empty GT -> worst-case 0
        class EmptyModel:
            def apply(self, variables, x, train=False):
                return jnp.full(logits.shape, -5.0)

        state2 = TrainState.create(
            apply_fn=EmptyModel().apply, params={"w": jnp.zeros(1)}, tx=optax.identity()
        )
        strat2 = SegmentationEvaluationStrategy(cfg)
        m2 = strat2.evaluate_epoch(state2, [batch], mesh=None)
        assert m2["gtvt_nsd"] == pytest.approx(0.0, abs=1e-6)

    def test_nsd_tol_list_length_mismatch_raises(self):
        from multimodal_tta_tpu.conf import ConfigNode
        from multimodal_tta_tpu.evaluation import SegmentationEvaluationStrategy

        cfg = ConfigNode(
            {
                "evaluation": {
                    "seg": {"region_order": ["a", "b"], "threshold": 0.5},
                    "surface": {"enable": True, "nsd_tol": [1.0]},
                }
            }
        )
        with pytest.raises(ValueError, match="nsd_tol"):
            SegmentationEvaluationStrategy(cfg)


class TestEvalIntegration:
    def test_seg_eval_with_surface(self):
        """Full seg_eval pass with surface metrics enabled, incl. the
        empty-pred penalty (= volume diagonal)."""
        from multimodal_tta_tpu.conf import ConfigNode
        from multimodal_tta_tpu.core.train_state import TrainState
        from multimodal_tta_tpu.evaluation import SegmentationEvaluationStrategy
        import optax

        shape = (12, 12, 12)
        gt = ball(shape, (6, 6, 6), 3)[None, ..., None]  # [1,D,H,W,1]

        # "model" returns fixed logits: predict a shifted ball
        pred_ball = ball(shape, (7, 6, 6), 3)[None, ..., None]
        logits = np.where(pred_ball > 0, 5.0, -5.0).astype(np.float32)

        class FixedModel:
            def apply(self, variables, x, train=False):
                return jnp.asarray(logits)

        state = TrainState.create(
            apply_fn=FixedModel().apply, params={"w": jnp.zeros(1)}, tx=optax.identity()
        )

        cfg = ConfigNode(
            {
                "evaluation": {
                    "seg": {"region_order": ["gtvt"], "threshold": 0.5, "spacing": [1, 1, 1]},
                    "surface": {"enable": True},
                    "loss": {"report_loss": False},
                },
                "training": {"criterion": {"sigmoid": True}},
            }
        )
        strat = SegmentationEvaluationStrategy(cfg)

        batch = {"image": gt.astype(np.float32), "label": gt.astype(np.float32), "domain": ["d1"]}
        metrics = strat.evaluate_epoch(state, [batch], mesh=None)
        assert "gtvt_hd95" in metrics and "avg_hd95" in metrics
        assert "gtvt_asd" in metrics and "dom/d1/avg_asd" in metrics
        hd_o, asd_o = oracle_metrics(pred_ball[0, ..., 0], gt[0, ..., 0], (1, 1, 1))
        assert metrics["gtvt_hd95"] == pytest.approx(hd_o, abs=1e-3)
        assert metrics["gtvt_asd"] == pytest.approx(asd_o, abs=1e-3)

    def test_empty_pred_penalty_diagonal(self):
        from multimodal_tta_tpu.conf import ConfigNode
        from multimodal_tta_tpu.core.train_state import TrainState
        from multimodal_tta_tpu.evaluation import SegmentationEvaluationStrategy, seg_eval
        import optax

        shape = (12, 12, 12)
        gt = ball(shape, (6, 6, 6), 3)[None, ..., None]
        logits = np.full((1,) + shape + (1,), -5.0, np.float32)  # predict nothing

        class FixedModel:
            def apply(self, variables, x, train=False):
                return jnp.asarray(logits)

        state = TrainState.create(
            apply_fn=FixedModel().apply, params={"w": jnp.zeros(1)}, tx=optax.identity()
        )
        cfg = ConfigNode(
            {
                "evaluation": {
                    "seg": {"region_order": ["gtvt"], "threshold": 0.5, "spacing": [1, 1, 1]},
                    "surface": {"enable": True},
                },
                "training": {"criterion": {"sigmoid": True}},
            }
        )
        strat = SegmentationEvaluationStrategy(cfg)
        batch = {"image": gt.astype(np.float32), "label": gt.astype(np.float32), "domain": ["x"]}
        metrics = strat.evaluate_epoch(state, [batch], mesh=None)
        diag = seg_eval.diag_mm_from_shape(12, 12, 12, (1, 1, 1))
        assert metrics["gtvt_hd95"] == pytest.approx(diag, abs=1e-4)
        assert metrics["gtvt_asd"] == pytest.approx(diag, abs=1e-4)


class TestSlidingWindowEval:
    def test_seg_eval_sliding_window_matches_whole(self):
        """With roi == volume size, SW eval equals whole-volume eval."""
        import optax
        import jax.numpy as jnp
        from multimodal_tta_tpu.conf import ConfigNode
        from multimodal_tta_tpu.core.train_state import TrainState
        from multimodal_tta_tpu.evaluation import SegmentationEvaluationStrategy
        from multimodal_tta_tpu.models import UNet3D
        import jax

        m = UNet3D(in_channels=1, num_classes=1, channels=(2, 4, 8, 16, 32),
                   strides=(2, 2, 2, 2), num_res_units=1)
        x = np.random.RandomState(0).randn(2, 16, 16, 16, 1).astype(np.float32)
        gt = (np.random.RandomState(1).rand(2, 16, 16, 16, 1) > 0.5).astype(np.float32)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        state = TrainState.create(apply_fn=m.apply, params=v["params"], tx=optax.identity())

        base_cfg = {
            "evaluation": {"seg": {"region_order": ["gtvt"], "threshold": 0.5}},
            "training": {"criterion": {"sigmoid": True}},
        }
        whole = SegmentationEvaluationStrategy(ConfigNode(base_cfg))
        sw_cfg = dict(base_cfg)
        sw_cfg["evaluation"] = {
            **base_cfg["evaluation"],
            "sliding_window": {"enable": True, "roi_size": [16, 16, 16], "overlap": 0.5},
        }
        sw = SegmentationEvaluationStrategy(ConfigNode(sw_cfg))

        batch = {"image": x, "label": gt, "domain": ["a", "b"]}
        m1 = whole.evaluate_epoch(state, [batch], mesh=None)
        m2 = sw.evaluate_epoch(state, [batch], mesh=None)
        assert m1["gtvt_dc"] == pytest.approx(m2["gtvt_dc"], abs=1e-4)

    def test_seg_eval_sliding_window_smaller_roi_runs(self):
        import optax
        import jax
        import jax.numpy as jnp
        from multimodal_tta_tpu.conf import ConfigNode
        from multimodal_tta_tpu.core.train_state import TrainState
        from multimodal_tta_tpu.evaluation import SegmentationEvaluationStrategy
        from multimodal_tta_tpu.models import UNet3D

        m = UNet3D(in_channels=1, num_classes=1, channels=(2, 4, 8, 16, 32),
                   strides=(2, 2, 2, 2), num_res_units=1)
        x = np.random.RandomState(2).randn(1, 32, 32, 32, 1).astype(np.float32)
        gt = (np.random.RandomState(3).rand(1, 32, 32, 32, 1) > 0.5).astype(np.float32)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)))
        state = TrainState.create(apply_fn=m.apply, params=v["params"], tx=optax.identity())

        cfg = ConfigNode({
            "evaluation": {
                "seg": {"region_order": ["gtvt"], "threshold": 0.5},
                "sliding_window": {"enable": True, "roi_size": [16, 16, 16], "overlap": 0.25},
            },
            "training": {"criterion": {"sigmoid": True}},
        })
        strat = SegmentationEvaluationStrategy(cfg)
        metrics = strat.evaluate_epoch(state, [{"image": x, "label": gt, "domain": ["d"]}], mesh=None)
        assert 0.0 <= metrics["gtvt_dc"] <= 1.0
