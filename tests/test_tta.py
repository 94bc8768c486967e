"""TTA engine tests: entropy decreases, only norm params change, modes work."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.core.train_state import TrainState
from multimodal_tta_tpu.models import UNet3D
from multimodal_tta_tpu.registry import get_tta_method
from multimodal_tta_tpu.tta import TTAEngine, TentAdapter, norm_param_mask

import optax


def make_state(norm="INSTANCE", in_ch=2, n_cls=1, seed=0):
    m = UNet3D(
        in_channels=in_ch,
        num_classes=n_cls,
        channels=(4, 8, 16, 32, 64),
        strides=(2, 2, 2, 2),
        num_res_units=1,
        norm=norm,
    )
    x = jnp.zeros((1, 16, 16, 16, in_ch))
    variables = m.init(jax.random.PRNGKey(seed), x, train=True)
    return TrainState.create(
        apply_fn=m.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=optax.identity(),
    )


def tent_cfg(**kw):
    base = {
        "method": "tent",
        "steps": 2,
        "lr": 1e-2,
        "optimizer": "sgd",
        "momentum": 0.9,
        "update": "norm",
        "episodic": True,
        "modality_dropout": {"enabled": False, "prob": 0.25},
    }
    base.update(kw)
    return ConfigNode(base)


def full_cfg(tta=None, sigmoid=True):
    return ConfigNode(
        {
            "task": {"seed": 0, "eval_strategy": "seg_eval"},
            "training": {"criterion": {"sigmoid": sigmoid, "softmax": not sigmoid}},
            "evaluation": {"seg": {"region_order": ["gtvt"], "threshold": 0.5}},
            "tta": (tta or tent_cfg()).to_container(),
        }
    )


class TestNormMask:
    def test_mask_selects_norm_params(self):
        state = make_state()
        mask = norm_param_mask(state.params)
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        norm_true = [jax.tree_util.keystr(p) for p, v in flat if v]
        norm_false = [jax.tree_util.keystr(p) for p, v in flat if not v]
        assert norm_true, "no norm params found"
        assert all("'n'" in p or "norm" in p for p in norm_true)
        assert all("conv" in p or "head" in p or "up" in p or "proj" in p for p in norm_false)

    def test_mask_is_structural_not_name_based(self):
        """Norm layers under arbitrary module names still classify as norm;
        weight-carrying modules named 'norm-ish' do not (VERDICT weak #7)."""
        import flax.linen as nn

        class Oddly(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Dense(8, name="normal_layer")(x)  # 'norm'-ish name, NOT a norm
                x = nn.LayerNorm(name="zz")(x)  # norm under a non-norm name
                x = nn.Dense(4, name="d2")(x)
                x = nn.GroupNorm(num_groups=None, group_size=1, name="blockA")(x)
                return x

        params = Oddly().init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 6)))["params"]
        mask = norm_param_mask(params)
        flat = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_flatten_with_path(mask)[0]}
        assert flat["['zz']['scale']"] and flat["['zz']['bias']"]
        assert flat["['blockA']['scale']"] and flat["['blockA']['bias']"]
        assert not flat["['normal_layer']['kernel']"]
        assert not flat["['normal_layer']['bias']"]
        assert not flat["['d2']['kernel']"]


class TestTentAdapter:
    def test_registered(self):
        assert get_tta_method("tent") is TentAdapter

    def test_entropy_decreases_and_only_norm_changes(self):
        state = make_state()
        cfg = full_cfg()
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)

        x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 16, 2), jnp.float32)

        # measure entropy before
        from multimodal_tta_tpu.ops.losses import entropy_loss

        logits0 = state.apply_fn({"params": state.params}, x, train=False)
        ent0 = float(entropy_loss(logits0))

        new_state = adapt_fn(state, x, 2)
        logits1 = new_state.apply_fn({"params": new_state.params}, x, train=False)
        ent1 = float(entropy_loss(logits1))
        assert ent1 < ent0, f"entropy did not decrease: {ent0} -> {ent1}"

        # only norm params changed
        mask = norm_param_mask(state.params)
        changed, unchanged_ok = 0, True
        for (p0, pm, p1) in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(mask),
            jax.tree_util.tree_leaves(new_state.params),
        ):
            same = np.allclose(np.asarray(p0), np.asarray(p1))
            if pm:
                if not same:
                    changed += 1
            else:
                unchanged_ok &= same
        assert changed > 0, "no norm params changed"
        assert unchanged_ok, "non-norm params changed under update=norm"

    def test_episodic_resets(self):
        state = make_state()
        cfg = full_cfg()
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        x1 = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 16, 2), jnp.float32)
        s1 = adapt_fn(state, x1, 2)
        s2 = adapt_fn(s1, x1, 2)  # episodic: ignores s1, restarts from source
        for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
            assert np.allclose(np.asarray(a), np.asarray(b))

    def test_continual_accumulates(self):
        state = make_state()
        cfg = full_cfg(tent_cfg(episodic=False))
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 16, 2), jnp.float32)
        s1 = adapt_fn(state, x, 2)
        s2 = adapt_fn(s1, x, 2)
        diff = sum(
            float(jnp.sum(jnp.abs(a - b)))
            for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params))
        )
        assert diff > 0, "continual adaptation did not move further"

    def test_update_all(self):
        state = make_state()
        cfg = full_cfg(tent_cfg(update="all", steps=1))
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(3).randn(1, 16, 16, 16, 2), jnp.float32)
        s1 = adapt_fn(state, x, 1)
        n_changed = sum(
            0 if np.allclose(np.asarray(a), np.asarray(b)) else 1
            for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(s1.params))
        )
        assert n_changed > 10  # most params move

    def test_modality_dropout_path(self):
        state = make_state()
        cfg = full_cfg(tent_cfg(modality_dropout={"enabled": True, "prob": 0.5}))
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(4).randn(2, 16, 16, 16, 2), jnp.float32)
        s1 = adapt_fn(state, x, 2)
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(s1.params))

    def test_batchnorm_stats_update(self):
        state = make_state(norm="BATCH")
        assert state.batch_stats
        cfg = full_cfg()
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(5).randn(2, 16, 16, 16, 2) * 3 + 1, jnp.float32)
        s1 = adapt_fn(state, x, 2)
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(state.batch_stats),
                jax.tree_util.tree_leaves(s1.batch_stats),
            )
        )
        assert moved, "batch statistics were not recomputed from the test batch"


class TestTTAEngineMesh:
    def test_engine_none_passthrough(self):
        from multimodal_tta_tpu.parallel.mesh import make_mesh

        state = make_state()
        cfg = full_cfg(ConfigNode({"method": "none"}))
        engine = TTAEngine(cfg, mesh=None)
        assert engine.adapter is None

    def test_tent_on_8dev_mesh(self):
        """Full multi-chip path: batch sharded over the data axis, jitted
        scanned adaptation, XLA-inserted gradient allreduce."""
        from multimodal_tta_tpu.parallel.mesh import make_mesh, shard_batch

        mesh = make_mesh()  # 8 CPU devices from conftest
        assert mesh.devices.size == 8
        state = make_state()
        cfg = full_cfg()
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=mesh)
        adapt_fn = adapter.make_adapt_fn(state)
        x_np = np.random.RandomState(6).randn(8, 16, 16, 16, 2).astype(np.float32)
        sharded = shard_batch({"image": x_np}, mesh)
        s1 = adapt_fn(state, sharded["image"], 8)
        assert adapter.last_entropy is not None and np.isfinite(adapter.last_entropy)

        # same data single-device should produce (nearly) identical params:
        adapter1 = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn1 = adapter1.make_adapt_fn(state)
        s2 = adapt_fn1(state, jnp.asarray(x_np), 8)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestNormAdapter:
    def test_batchnorm_stats_recomputed(self):
        from multimodal_tta_tpu.registry import get_tta_method
        from multimodal_tta_tpu.tta import NormAdapter

        assert get_tta_method("norm") is NormAdapter
        state = make_state(norm="BATCH")
        cfg = full_cfg(ConfigNode({"method": "norm", "episodic": True}))
        adapter = NormAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(11).randn(2, 16, 16, 16, 2) * 4 + 2, jnp.float32)
        s1 = adapt_fn(state, x, 2)
        # params untouched
        for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(s1.params)):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        # stats moved
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(state.batch_stats),
                jax.tree_util.tree_leaves(s1.batch_stats),
            )
        )
        assert moved

    def test_instance_norm_noop(self):
        from multimodal_tta_tpu.tta import NormAdapter

        state = make_state(norm="INSTANCE")
        cfg = full_cfg(ConfigNode({"method": "norm"}))
        adapter = NormAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        s1 = adapt_fn(state, jnp.zeros((1, 16, 16, 16, 2)), 1)
        assert s1 is state


class TestContinualStream:
    def test_state_carries_across_shifting_domains(self):
        """Continual TTA over a stream of shifting domains (BASELINE config
        #5): the adapted state must evolve across the stream and per-domain
        metrics must be reported for every domain seen."""
        import optax
        from multimodal_tta_tpu.evaluation import SegmentationEvaluationStrategy
        from multimodal_tta_tpu.tta import TentAdapter

        state = make_state()
        cfg = full_cfg(tent_cfg(episodic=False, steps=1, lr=1e-3))
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)

        strat = SegmentationEvaluationStrategy(
            ConfigNode(
                {
                    "evaluation": {"seg": {"region_order": ["gtvt"], "threshold": 0.5}},
                    "training": {"criterion": {"sigmoid": True}},
                }
            )
        )

        rng = np.random.RandomState(0)
        # stream: domain A (shifted +2), then domain B (scaled x3)
        stream = []
        for dom, tf in [("A", lambda x: x + 2), ("A", lambda x: x + 2), ("B", lambda x: x * 3), ("B", lambda x: x * 3)]:
            x = tf(rng.randn(2, 16, 16, 16, 2)).astype(np.float32)
            y = (rng.rand(2, 16, 16, 16, 1) > 0.7).astype(np.float32)
            stream.append({"image": x, "label": y, "domain": [dom, dom]})

        metrics = strat.evaluate_epoch(state, stream, mesh=None, adapt_fn=adapt_fn, carry_state=True)
        assert "dom/A/avg_dc" in metrics and "dom/B/avg_dc" in metrics
        assert np.isfinite(metrics["avg_dc"])
        # the entropy trace should be finite and the adapter must have run
        assert adapter.last_entropy is not None


class TestConsistencyLoss:
    def test_entropy_plus_consistency_runs_and_reduces_loss(self):
        state = make_state()
        cfg = full_cfg(tent_cfg(loss="entropy+consistency", steps=2, lr=1e-2))
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(20).randn(2, 16, 16, 16, 2), jnp.float32)
        s1 = adapt_fn(state, x, 2)
        assert adapter.last_entropy is not None and np.isfinite(adapter.last_entropy)
        # params changed (norm only)
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(s1.params))
        )
        assert moved

    def test_unknown_loss_mode_raises(self):
        cfg = full_cfg(tent_cfg(loss="banana"))
        with pytest.raises(ValueError, match="unknown loss mode"):
            TentAdapter(cfg.tta, config=cfg, mesh=None)


class TestWindowedAdaptation:
    def test_windowed_tta_entropy_decreases_memory_light(self):
        """Adaptation on random ROIs instead of whole volumes (bounded-memory
        companion of sliding-window inference)."""
        state = make_state()
        cfg = full_cfg(
            tent_cfg(
                steps=3, lr=1e-2,
                window={"enabled": True, "roi_size": [16, 16, 16], "windows_per_step": 4},
            )
        )
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        # larger-than-roi volumes
        x = jnp.asarray(np.random.RandomState(30).randn(2, 32, 32, 32, 2), jnp.float32)
        from multimodal_tta_tpu.ops.losses import entropy_loss

        logits0 = state.apply_fn({"params": state.params}, x, train=False)
        ent0 = float(entropy_loss(logits0))
        s1 = adapt_fn(state, x, 2)
        logits1 = s1.apply_fn({"params": s1.params}, x, train=False)
        ent1 = float(entropy_loss(logits1))
        assert ent1 < ent0, f"windowed TTA did not reduce entropy: {ent0} -> {ent1}"
        # only norm params moved
        mask = norm_param_mask(state.params)
        for p0, pm, p1 in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(mask),
            jax.tree_util.tree_leaves(s1.params),
        ):
            if not pm:
                assert np.allclose(np.asarray(p0), np.asarray(p1))


class TestInlinePredict:
    """predict=inline — the official online Tent protocol: predictions come
    from the final adaptation step's own forward (Wang et al. ICLR 2021
    forward_and_adapt returns pre-update outputs; the adapted state carries
    to the next batch)."""

    def test_steps1_episodic_pred_equals_source_forward(self):
        """With one step, inline predictions use the pre-update params, so
        they must EXACTLY equal the plain source-model predictions."""
        state = make_state()
        cfg = full_cfg(tent_cfg(steps=1))
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        ap = adapter.make_adapt_predict_fn(state, threshold=0.5, predict_mode="inline")
        x = jnp.asarray(np.random.RandomState(7).randn(2, 16, 16, 16, 2), jnp.float32)
        _, pred = ap(state, x, 2)
        logits = state.apply_fn({"params": state.params}, x, train=False)
        expect = (jax.nn.sigmoid(logits) >= 0.5).astype(jnp.uint8)
        assert np.array_equal(np.asarray(pred), np.asarray(expect))

    def test_adapted_state_identical_to_post_mode(self):
        """inline changes WHERE predictions come from, not the adaptation
        math: the adapted params must match predict=post (up to fusion-order
        ulps — the final step compiles unrolled instead of scanned)."""
        x = jnp.asarray(np.random.RandomState(8).randn(2, 16, 16, 16, 2), jnp.float32)
        states = {}
        for mode in ("post", "inline"):
            state = make_state()
            cfg = full_cfg(tent_cfg(steps=2, episodic=False))
            adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
            ap = adapter.make_adapt_predict_fn(state, threshold=0.5, predict_mode=mode)
            s, _ = ap(state, x, 2)
            states[mode] = s
        for a, b in zip(
            jax.tree_util.tree_leaves(states["post"].params),
            jax.tree_util.tree_leaves(states["inline"].params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9)

    def test_continual_inline_stream_reduces_entropy(self):
        """Streaming serving: state carries across batches, and the recorded
        final-step entropy trends down over the stream."""
        from multimodal_tta_tpu.ops.losses import entropy_loss

        state = make_state()
        cfg = full_cfg(tent_cfg(steps=1, episodic=False, lr=1e-2))
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        ap = adapter.make_adapt_predict_fn(state, threshold=0.5, predict_mode="inline")
        rng = np.random.RandomState(9)
        cur = state
        ents = []
        for _ in range(6):
            x = jnp.asarray(rng.randn(2, 16, 16, 16, 2), jnp.float32)
            cur, pred = ap(cur, x, 2)
            ents.append(adapter.last_entropy)
            assert pred.dtype == jnp.uint8
        assert ents[-1] < ents[0], f"entropy did not trend down: {ents}"
        # the stream actually moved the norm params away from source
        mask = norm_param_mask(state.params)
        moved = any(
            pm and not np.allclose(np.asarray(p0), np.asarray(p1))
            for p0, pm, p1 in zip(
                jax.tree_util.tree_leaves(state.params),
                jax.tree_util.tree_leaves(mask),
                jax.tree_util.tree_leaves(cur.params),
            )
        )
        assert moved

    def test_inline_serves_clean_predictions_under_modality_dropout(self):
        """The inline prediction forward must see the CLEAN batch: with
        modality dropout enabled, steps=1 inline predictions still equal the
        plain source forward (dropout applies only to preceding steps)."""
        state = make_state()
        cfg = full_cfg(
            tent_cfg(steps=1, modality_dropout={"enabled": True, "prob": 1.0})
        )
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        ap = adapter.make_adapt_predict_fn(state, threshold=0.5, predict_mode="inline")
        x = jnp.asarray(np.random.RandomState(21).randn(2, 16, 16, 16, 2), jnp.float32)
        _, pred = ap(state, x, 2)
        logits = state.apply_fn({"params": state.params}, x, train=False)
        expect = (jax.nn.sigmoid(logits) >= 0.5).astype(jnp.uint8)
        assert np.array_equal(np.asarray(pred), np.asarray(expect))

    def test_inline_rejects_windowed(self):
        state = make_state()
        cfg = full_cfg(
            tent_cfg(window={"enabled": True, "roi_size": [8, 8, 8], "windows_per_step": 2})
        )
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        with pytest.raises(ValueError, match="window"):
            adapter.make_adapt_predict_fn(state, threshold=0.5, predict_mode="inline")

    def test_config_key_selects_mode(self):
        cfg = full_cfg(tent_cfg(predict="inline"))
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        assert adapter.predict_mode == "inline"
        with pytest.raises(ValueError, match="predict"):
            TentAdapter(ConfigNode({"method": "tent", "predict": "nope"}), config=cfg)

    def test_inline_continual_on_8dev_mesh(self):
        """Pod-scale streaming serving (BASELINE config #5 shape): batch
        sharded over the data axis, continual inline predictions, gradient
        allreduce inserted by SPMD — predictions match single-device."""
        from multimodal_tta_tpu.parallel.mesh import make_mesh, shard_batch

        mesh = make_mesh()
        state = make_state()
        cfg = full_cfg(tent_cfg(steps=2, episodic=False))
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=mesh)
        ap = adapter.make_adapt_predict_fn(state, threshold=0.5, predict_mode="inline")
        adapter1 = TentAdapter(cfg.tta, config=cfg, mesh=None)
        ap1 = adapter1.make_adapt_predict_fn(state, threshold=0.5, predict_mode="inline")

        rng = np.random.RandomState(12)
        cur_m, cur_1 = state, state
        for _ in range(3):  # stream: state carries on both paths
            x_np = rng.randn(8, 16, 16, 16, 2).astype(np.float32)
            sharded = shard_batch({"image": x_np}, mesh)
            cur_m, pred_m = ap(cur_m, sharded["image"], 8)
            cur_1, pred_1 = ap1(cur_1, jnp.asarray(x_np), 8)
            assert np.asarray(pred_m).mean() == pytest.approx(
                np.asarray(pred_1).mean(), abs=1e-3
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(cur_m.params), jax.tree_util.tree_leaves(cur_1.params)
        ):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestEntropyFocus:
    def test_uncertain_focus_concentrates_objective(self):
        """Self-normalized entropy ignores the confident-background dilution:
        with 1M confident voxels and 100 uncertain ones, the focused value
        tracks the uncertain voxels' entropy while the plain mean vanishes."""
        from multimodal_tta_tpu.ops.losses import entropy_loss

        logits = np.full((1, 100, 100, 100, 1), 12.0, np.float32)  # saturated
        logits.reshape(-1)[:100] = 0.1  # a few uncertain voxels (H ~ ln2)
        logits = jnp.asarray(logits)
        plain = float(entropy_loss(logits, sigmoid=True))
        focused = float(entropy_loss(logits, sigmoid=True, focus="uncertain"))
        assert plain < 1e-3
        # the uncertain voxels carry most of the weight (they would need to
        # be ~ln2 for full dominance; the background's residual H still
        # contributes at this extreme 1e-4 uncertain fraction)
        assert focused > 300 * plain

    def test_uncertain_focus_gradient_orders_larger(self):
        from multimodal_tta_tpu.ops.losses import entropy_loss

        logits = np.full((1, 32, 32, 32, 1), 10.0, np.float32)
        logits.reshape(-1)[:50] = 0.2
        logits = jnp.asarray(logits)
        g_all = jax.grad(lambda l: entropy_loss(l, sigmoid=True))(logits)
        g_unc = jax.grad(lambda l: entropy_loss(l, sigmoid=True, focus="uncertain"))(logits)
        assert float(jnp.abs(g_unc).max()) > 100 * float(jnp.abs(g_all).max())

    def test_adapter_with_uncertain_focus_reduces_entropy(self):
        state = make_state()
        cfg = full_cfg(tent_cfg(steps=2, lr=1e-2, entropy_focus="uncertain"))
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(3).randn(2, 16, 16, 16, 2), jnp.float32)
        from multimodal_tta_tpu.ops.losses import entropy_loss

        logits0 = state.apply_fn({"params": state.params}, x, train=False)
        e0 = float(entropy_loss(logits0, sigmoid=True, focus="uncertain"))
        s1 = adapt_fn(state, x, 2)
        logits1 = s1.apply_fn({"params": s1.params}, x, train=False)
        e1 = float(entropy_loss(logits1, sigmoid=True, focus="uncertain"))
        assert e1 < e0

    def test_bad_focus_rejected(self):
        from multimodal_tta_tpu.ops.losses import entropy_loss

        with pytest.raises(ValueError, match="focus"):
            entropy_loss(jnp.zeros((1, 2, 2, 2, 1)), sigmoid=True, focus="nope")
        cfg = full_cfg()
        with pytest.raises(ValueError, match="entropy_focus"):
            TentAdapter(tent_cfg(entropy_focus="nope"), config=cfg)


class TestUpdatePathRegex:
    def test_regex_restricts_adapted_set_and_freezes_rest(self):
        state = make_state()
        cfg = full_cfg(tent_cfg(steps=1, lr=1e-2, update_path_regex="^(dec|up|bottleneck)"))
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        mask = adapter._param_mask(state.params)
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        kept = [jax.tree_util.keystr(p) for p, v in flat if v]
        assert kept and all(
            "dec" in p or "up" in p or "bottleneck" in p for p in kept
        )
        # adaptation leaves encoder norms untouched
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(5).randn(2, 16, 16, 16, 2), jnp.float32)
        s1 = adapt_fn(state, x, 2)
        for (path, p0), p1 in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_leaves(s1.params),
        ):
            key = jax.tree_util.keystr(path)
            if "enc" in key:
                assert np.allclose(np.asarray(p0), np.asarray(p1)), key

    def test_tail_scope_truncates_backward_at_compile_time(self):
        """Layer-scoped Tent speed property (BASELINE.md ladder): with the
        adapted set restricted to the last decoder level, reverse-mode AD
        needs nothing upstream of it — the compiled adapt step must contain
        strictly fewer convolutions than the full-norm step (the encoder /
        deep-decoder gradient convolutions are dead code). This is the
        compile-level fact behind the measured 44.5 -> 61.7 vol/s/chip."""

        def conv_count(regex):
            state = make_state()
            kw = {"update_path_regex": regex} if regex else {}
            cfg = full_cfg(tent_cfg(steps=1, lr=1e-2, **kw))
            adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
            adapter.make_adapt_fn(state)
            x = jnp.zeros((2, 16, 16, 16, 2), jnp.float32)
            args = (
                state.params, state.batch_stats, adapter._opt_state0,
                x, jax.random.PRNGKey(0), jnp.int32(2), jnp.float32(jnp.nan),
            )
            txt = adapter._adapt_step.lower(*args).compile().as_text()
            return txt.count(" convolution(")

        full = conv_count(None)
        tail = conv_count("^(dec0|up0)")
        assert full > 0
        assert tail < full, (
            f"tail-scoped adapt compiled to {tail} convolutions vs {full} "
            f"full-scope — backward truncation regressed"
        )

    def test_non_matching_regex_raises(self):
        state = make_state()
        cfg = full_cfg(tent_cfg(update_path_regex="nothing_matches_this"))
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        with pytest.raises(ValueError, match="no adapted parameters"):
            adapter._param_mask(state.params)


class TestSoftmaxPredict:
    def test_softmax_mode_predicts_argmax_not_sigmoid_threshold(self):
        """Multi-class criterion: the fused predict must be the channel
        argmax — per-channel sigmoid thresholding of softmax logits lets a
        voxel claim several mutually-exclusive classes at once."""
        state = make_state(n_cls=3)
        cfg = full_cfg(tent_cfg(steps=1), sigmoid=False)
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        assert adapter.sigmoid_mode is False
        for mode in ("inline", "post"):
            ap = adapter.make_adapt_predict_fn(state, threshold=0.5, predict_mode=mode)
            x = jnp.asarray(np.random.RandomState(31).randn(2, 16, 16, 16, 2), jnp.float32)
            _, pred = ap(state, x, 2)
            p = np.asarray(pred)
            assert p.shape[-1] == 1  # class-id map, not per-class binaries
            assert p.max() <= 2 and p.dtype == np.uint8
            if mode == "inline":
                # steps=1 episodic inline == argmax of the source forward
                logits = state.apply_fn({"params": state.params}, x, train=False)
                expect = np.argmax(np.asarray(logits), axis=-1)[..., None]
                assert np.array_equal(p, expect)


class TestEarlyStop:
    """In-scan entropy early stop (tta.early_stop): the inner adaptation
    freezes once the step entropy dips below ratio * first-step entropy —
    the in-batch half of the over-adaptation collapse defense (the stream
    watchdog is the between-batch half)."""

    def _run(self, early_stop, steps=24, lr=2.0, ratio=0.5):
        state = make_state()
        tta = tent_cfg(steps=steps, lr=lr, momentum=0.0)
        if early_stop:
            tta["early_stop"] = {"enabled": True, "entropy_floor_ratio": ratio}
        cfg = full_cfg(tta=tta)
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 16, 2), jnp.float32)
        adapt_fn(state, x, 2)
        return np.asarray(adapter._last_ents)

    def test_freezes_at_floor_and_trace_flattens(self):
        ents = self._run(early_stop=True)
        e0 = ents[0]
        below = np.where(ents < 0.5 * e0)[0]
        assert below.size > 0, "regime not aggressive enough to trigger the stop"
        k = below[0]
        # frozen tail: entropy is evaluated at unchanged params => constant
        np.testing.assert_allclose(ents[k:], ents[k], rtol=1e-6)

    def test_unguarded_minimizes_further(self):
        guarded = self._run(early_stop=True)
        free = self._run(early_stop=False)
        assert free[-1] < guarded[-1], (free[-1], guarded[-1])

    def test_gentle_regime_unaffected(self):
        guarded = self._run(early_stop=True, steps=2, lr=1e-3)
        free = self._run(early_stop=False, steps=2, lr=1e-3)
        np.testing.assert_allclose(guarded, free, rtol=1e-6)

    def test_absolute_floor_freezes_from_first_step(self):
        state = make_state()
        tta = tent_cfg(steps=8, lr=1e-2)
        tta["early_stop"] = {"enabled": True, "entropy_floor_ratio": 0.3}
        cfg = full_cfg(tta=tta)
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 16, 2), jnp.float32)
        out = adapt_fn(state, x, 2, ent_floor=1e6)  # floor above any entropy
        for a, b in zip(
            jax.tree_util.tree_leaves(out.params), jax.tree_util.tree_leaves(state.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestStochasticRestore:
    """CoTTA-style stochastic restore (tta.restore): after each update every
    adapted element snaps back to its SOURCE value with probability p —
    the per-element anti-forgetting leak (the stream watchdog's re-anchor is
    the batch-granular counterpart)."""

    def _adapt(self, restore=None, episodic=True, steps=4, lr=0.5, batches=1):
        state = make_state()
        tta = tent_cfg(steps=steps, lr=lr, momentum=0.0, episodic=episodic)
        if restore is not None:
            tta["restore"] = {"enabled": True, "prob": restore}
        cfg = full_cfg(tta=tta)
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        rng = np.random.RandomState(0)
        out = state
        for _ in range(batches):
            x = jnp.asarray(rng.randn(2, 16, 16, 16, 2), jnp.float32)
            out = adapt_fn(out, x, 2)
        return state, out

    @staticmethod
    def _dist(a, b):
        return float(
            sum(
                float(jnp.sum(jnp.abs(x - y)))
                for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
            )
        )

    def test_prob_one_pins_to_source(self):
        src, out = self._adapt(restore=1.0)
        assert self._dist(src.params, out.params) == 0.0

    def test_prob_zero_matches_disabled(self):
        # the restore key splits off BEFORE (k_md, k_obj) so the disabled
        # path's PRNG stream is untouched; with plain entropy loss the
        # objective consumes no randomness, so prob=0 must be bit-identical
        # to restore disabled
        _, off = self._adapt(restore=None)
        _, zero = self._adapt(restore=0.0)
        assert self._dist(off.params, zero.params) == 0.0

    def test_partial_restore_bounds_drift(self):
        src, free = self._adapt(restore=None)
        _, leaked = self._adapt(restore=0.7)
        d_free = self._dist(src.params, free.params)
        d_leak = self._dist(src.params, leaked.params)
        assert d_free > 0.0
        assert d_leak < d_free, (d_leak, d_free)

    def test_continual_anchor_is_source_not_carried_state(self):
        # over several continual batches with prob=1 every step ends at the
        # source weights — the anchor is the original source model, not the
        # previous batch's carried state
        src, out = self._adapt(restore=1.0, episodic=False, batches=3)
        assert self._dist(src.params, out.params) == 0.0


class TestReliabilityGating:
    """EATA-style per-sample entropy filter (tta.reliability): samples whose
    self-normalized entropy exceeds margin_ratio * H_max are excluded from
    the adaptation objective; the rest weighted exp(margin - e)."""

    def test_weights_exclude_uncertain_and_boost_confident(self):
        from multimodal_tta_tpu.tta.tent import reliability_weights

        uncertain = np.zeros((4, 4, 4, 1), np.float32)          # p=0.5 -> e = ln2
        confident = np.full((4, 4, 4, 1), 10.0, np.float32)     # e ~ 5e-4
        logits = jnp.asarray(np.stack([uncertain, confident]))
        w = np.asarray(reliability_weights(logits, sigmoid=True, margin_ratio=0.4))
        assert w[0] == 0.0
        assert w[1] > 1.0  # exp(margin - e) with e << margin

    def test_weights_softmax_cap_is_log_c(self):
        from multimodal_tta_tpu.tta.tent import reliability_weights

        c = 5
        uniform = np.zeros((4, 4, 4, c), np.float32)            # e = ln C
        peaked = np.zeros((4, 4, 4, c), np.float32)
        peaked[..., 0] = 12.0                                    # e ~ 0
        logits = jnp.asarray(np.stack([uniform, peaked]))
        w = np.asarray(reliability_weights(logits, sigmoid=False, margin_ratio=0.4))
        assert w[0] == 0.0 and w[1] > 1.0

    def test_margin_zero_gates_all_updates_off(self):
        state = make_state()
        tta = tent_cfg(steps=4, lr=0.5, momentum=0.0)
        tta["reliability"] = {"enabled": True, "margin_ratio": 0.0}
        cfg = full_cfg(tta=tta)
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 16, 2), jnp.float32)
        out = adapt_fn(state, x, 2)
        for a, b in zip(
            jax.tree_util.tree_leaves(out.params), jax.tree_util.tree_leaves(state.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_generous_margin_matches_unfiltered_direction(self):
        # with a margin far above any sample's entropy no sample is excluded;
        # the exp(margin - e) weights rescale the objective but adaptation
        # still moves the params
        state = make_state()
        tta = tent_cfg(steps=2, lr=1e-2)
        tta["reliability"] = {"enabled": True, "margin_ratio": 10.0}
        cfg = full_cfg(tta=tta)
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 16, 2), jnp.float32)
        out = adapt_fn(state, x, 2)
        moved = sum(
            float(jnp.sum(jnp.abs(a - b)))
            for a, b in zip(
                jax.tree_util.tree_leaves(out.params),
                jax.tree_util.tree_leaves(state.params),
            )
        )
        assert moved > 0.0


class TestCotta:
    """CoTTA-style EMA-teacher adaptation (tta/cotta.py, method "cotta"):
    student CE against aug-averaged stop-grad teacher pseudo-labels, teacher
    EMA after each update, serve=teacher|student."""

    def _adapter(self, state, *, sigmoid=True, **kw):
        cfg_tta = tent_cfg(method="cotta", episodic=False, **kw)
        cfg = full_cfg(tta=cfg_tta, sigmoid=sigmoid)
        from multimodal_tta_tpu.tta import CottaAdapter

        return CottaAdapter(cfg.tta, config=cfg, mesh=None)

    @staticmethod
    def _dist(a, b):
        return float(
            sum(
                float(jnp.sum(jnp.abs(x - y)))
                for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
            )
        )

    def test_registered(self):
        from multimodal_tta_tpu.tta import CottaAdapter

        assert get_tta_method("cotta") is CottaAdapter

    def test_adapts_norm_params_only(self):
        # n_views=2: the aug-view asymmetry is the adaptation force (see
        # test_views1_clean_is_a_fixed_point)
        state = make_state()
        adapter = self._adapter(state, steps=2, lr=1e-2, n_views=2)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 16, 2), jnp.float32)
        out = adapt_fn(state, x, 2)
        mask = norm_param_mask(state.params)
        moved = unmoved = 0.0
        for m, a, b in zip(
            jax.tree_util.tree_leaves(mask),
            jax.tree_util.tree_leaves(out.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            d = float(jnp.sum(jnp.abs(a - b)))
            if m:
                moved += d
            else:
                unmoved += d
        assert moved > 1e-4
        assert unmoved == 0.0

    def test_views1_clean_is_a_fixed_point(self):
        """n_views=1, no dropout: student and teacher see the same input and
        dCE/dlogit = sigmoid(l) - p vanishes at student == teacher, so from
        source init the update is ~zero (float-rounding jitter only) even at
        a large lr. Measured on the stream fixture: every such config served
        no-adapt Dice — the adapter warns about it."""
        state = make_state()
        free = self._adapter(state, steps=4, lr=0.5, n_views=1)
        out = free.make_adapt_fn(state)(
            state, jnp.asarray(np.random.RandomState(8).randn(2, 16, 16, 16, 2), jnp.float32), 2
        )
        drift = self._dist(state.params, out.params)
        assert drift < 1e-3, drift  # vs O(1) movement when views>=2 at this lr

    def test_affine_only_views_are_inert_under_instance_norm(self):
        """InstanceNorm removes a per-volume affine jitter, so views built
        from scale/shift ALONE (aug_flip=false, aug_noise=0) agree with the
        clean view and adaptation stalls — exactly the measured stream-
        fixture failure. The default flip+noise views break the symmetry."""
        state = make_state(norm="INSTANCE")
        x = jnp.asarray(np.random.RandomState(3).randn(2, 16, 16, 16, 2), jnp.float32)
        affine = self._adapter(
            state, steps=2, lr=1e-2, n_views=2, aug_flip=False, aug_noise=0.0
        )
        drift_affine = self._dist(
            state.params, affine.make_adapt_fn(state)(state, x, 2).params
        )
        full = self._adapter(state, steps=2, lr=1e-2, n_views=2)
        drift_full = self._dist(
            state.params, full.make_adapt_fn(state)(state, x, 2).params
        )
        # not exactly zero — the stem conv mixes channels before the first
        # norm, so a per-channel jitter isn't perfectly cancelled — but two
        # orders below the flip+noise drive
        assert drift_affine < 1e-3, drift_affine
        assert drift_full > 10.0 * max(drift_affine, 1e-6), (drift_full, drift_affine)

    def test_teacher_ema_one_keeps_teacher_at_source(self):
        """ema=1.0: the teacher never moves, so serve=teacher predictions
        equal the SOURCE model's predictions regardless of adaptation."""
        state = make_state()
        adapter = self._adapter(state, steps=3, lr=0.5, ema=1.0, n_views=1)
        ap = adapter.make_adapt_predict_fn(state, threshold=0.5, predict_mode="post")
        x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 16, 2), jnp.float32)
        _, pred = ap(state, x, 2)
        src_logits = state.apply_fn({"params": state.params}, x, train=False)
        src_pred = (jax.nn.sigmoid(src_logits) >= 0.5).astype(jnp.uint8)
        np.testing.assert_array_equal(np.asarray(pred), np.asarray(src_pred))
        assert self._dist(adapter._teacher, adapter.trainable_subtree(state.params)) == 0.0

    def test_teacher_ema_zero_tracks_student(self):
        state = make_state()
        adapter = self._adapter(state, steps=2, lr=0.1, ema=0.0, n_views=1)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 16, 2), jnp.float32)
        out = adapt_fn(state, x, 2)
        assert self._dist(adapter._teacher, adapter.trainable_subtree(out.params)) == 0.0

    def test_teacher_carries_continual_and_resets_on_reanchor(self):
        state = make_state()
        adapter = self._adapter(state, steps=2, lr=0.1, ema=0.5, n_views=1)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(3).randn(2, 16, 16, 16, 2), jnp.float32)
        adapt_fn(state, x, 2)
        src_t = adapter.trainable_subtree(state.params)
        assert self._dist(adapter._teacher, src_t) > 0.0
        adapter.reset_optimizer()
        assert self._dist(adapter._teacher, src_t) == 0.0

    def test_softmax_mode_pseudo_ce(self):
        state = make_state(n_cls=3)
        adapter = self._adapter(state, sigmoid=False, steps=2, lr=1e-2, n_views=2)
        ap = adapter.make_adapt_predict_fn(state, threshold=0.5, predict_mode="inline")
        x = jnp.asarray(np.random.RandomState(4).randn(2, 16, 16, 16, 2), jnp.float32)
        out, pred = ap(state, x, 2)
        assert pred.shape == (2, 16, 16, 16, 1)
        assert int(jnp.max(pred)) <= 2
        assert adapter.last_entropy is not None

    def test_serve_switch_picks_the_right_model(self):
        """Poison the carried teacher subtree: serve=teacher must reflect the
        poisoned teacher, serve=student (lr=0, student pinned at source) must
        keep serving the source prediction. Tests the serve plumbing without
        relying on training dynamics (the CE objective pulls the student
        TOWARD the teacher, so divergence-based checks can't discriminate)."""
        state = make_state()
        x = jnp.asarray(np.random.RandomState(5).randn(2, 16, 16, 16, 2), jnp.float32)
        src_logits = state.apply_fn({"params": state.params}, x, train=False)
        src_pred = np.asarray((jax.nn.sigmoid(src_logits) >= 0.5).astype(jnp.uint8))
        preds = {}
        for serve in ("teacher", "student"):
            adapter = self._adapter(
                state, steps=1, lr=0.0, momentum=0.0, ema=1.0, n_views=1, serve=serve
            )
            ap = adapter.make_adapt_predict_fn(state, threshold=0.5, predict_mode="post")
            adapter._teacher = jax.tree_util.tree_map(
                lambda t: -5.0 * t + 3.0, adapter._teacher
            )
            _, pred = ap(state, x, 2)
            preds[serve] = np.asarray(pred)
        np.testing.assert_array_equal(preds["student"], src_pred)
        assert (preds["teacher"] != src_pred).any()

    def test_restore_composes(self):
        state = make_state()
        adapter = self._adapter(state, steps=3, lr=0.5, n_views=1)
        free_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(6).randn(2, 16, 16, 16, 2), jnp.float32)
        free = free_fn(state, x, 2)
        pinned_adapter = self._adapter(
            state, steps=3, lr=0.5, n_views=1, restore={"enabled": True, "prob": 1.0}
        )
        pinned = pinned_adapter.make_adapt_fn(state)(state, x, 2)
        assert self._dist(state.params, free.params) > 0.0
        assert self._dist(state.params, pinned.params) == 0.0

    def test_incompatible_knobs_raise(self):
        state = make_state()
        with pytest.raises(ValueError, match="window"):
            self._adapter(state, window={"enabled": True})
        with pytest.raises(ValueError, match="early_stop"):
            self._adapter(state, early_stop={"enabled": True})
        with pytest.raises(ValueError, match="reliability"):
            self._adapter(state, reliability={"enabled": True})
        with pytest.raises(ValueError, match="serve"):
            self._adapter(state, serve="oracle")

    def test_stream_controller_accepts_cotta(self):
        from multimodal_tta_tpu.tta import StreamTTAController

        state = make_state()
        adapter = self._adapter(state, steps=1, lr=1e-2, n_views=1)
        ctl = StreamTTAController(
            adapter, state, threshold=0.5, policy="continual", guard=True,
            entropy_floor_ratio=0.2,
        )
        x = np.random.RandomState(7).randn(2, 16, 16, 16, 2).astype(np.float32)
        pred, info = ctl.step(x, 2, domain="A")
        assert pred.shape == (2, 16, 16, 16, 1)
        assert info["entropy_final"] is not None  # watchdog signal flows


class TestSar:
    """SAR sharpness-aware adaptation (tta/sar.py, method "sar"): reliable
    filter, SAM two-gradient step, in-scan recovery reset to source."""

    def _adapter(self, state, *, sigmoid=True, **kw):
        cfg_tta = tent_cfg(method="sar", episodic=False, **kw)
        cfg = full_cfg(tta=cfg_tta, sigmoid=sigmoid)
        from multimodal_tta_tpu.tta import SarAdapter

        return SarAdapter(cfg.tta, config=cfg, mesh=None)

    @staticmethod
    def _dist(a, b):
        return float(
            sum(
                float(jnp.sum(jnp.abs(x - y)))
                for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
            )
        )

    def test_registered(self):
        from multimodal_tta_tpu.tta import SarAdapter

        assert get_tta_method("sar") is SarAdapter

    def test_adapts_norm_params_only(self):
        state = make_state()
        adapter = self._adapter(state, steps=2, lr=1e-2, entropy_focus="uncertain",
                                margin_ratio=1.0)  # random-init predictions are
        # maximally uncertain; the reliable filter would (correctly) skip them
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 16, 2), jnp.float32)
        out = adapt_fn(state, x, 2)
        mask = norm_param_mask(state.params)
        moved = unmoved = 0.0
        for m, a, b in zip(
            jax.tree_util.tree_leaves(mask),
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(out.params),
        ):
            d = float(jnp.sum(jnp.abs(a - b)))
            if m:
                moved += d
            else:
                unmoved += d
        assert moved > 1e-5
        assert unmoved == 0.0

    def test_margin_zero_filters_everything(self):
        """margin_ratio=0: every sample fails the reliable filter, the
        objective is identically zero, and no parameter moves."""
        state = make_state()
        adapter = self._adapter(state, steps=3, lr=0.5, margin_ratio=0.0,
                                reset_floor_ratio=0.0)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 16, 2), jnp.float32)
        out = adapt_fn(state, x, 2)
        assert self._dist(state.params, out.params) == 0.0

    def test_recovery_reset_pins_params_at_source(self):
        """reset_floor_ratio=1.0: the EMA entropy is always below H_max, so
        every step's update is immediately snapped back to source — the
        recovery scheme in its always-on limit."""
        state = make_state()
        free = self._adapter(state, steps=3, lr=0.5, entropy_focus="uncertain",
                             margin_ratio=1.0, reset_floor_ratio=0.0)
        pinned = self._adapter(state, steps=3, lr=0.5, entropy_focus="uncertain",
                               margin_ratio=1.0, reset_floor_ratio=1.0)
        x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 16, 2), jnp.float32)
        drift_free = self._dist(state.params, free.make_adapt_fn(state)(state, x, 2).params)
        drift_pinned = self._dist(state.params, pinned.make_adapt_fn(state)(state, x, 2).params)
        assert drift_free > 1e-5
        assert drift_pinned == 0.0

    def test_em_carries_across_batches_in_continual(self):
        state = make_state()
        adapter = self._adapter(state, steps=2, lr=1e-3, entropy_focus="uncertain",
                                reset_floor_ratio=0.0)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(3).randn(2, 16, 16, 16, 2), jnp.float32)
        st = adapt_fn(state, x, 2)
        em1 = float(adapter._em)
        assert not np.isnan(em1)  # EMA live after batch 1
        adapt_fn(st, x, 2)
        em2 = float(adapter._em)
        assert not np.isnan(em2)
        adapter.reset_optimizer()
        assert np.isnan(float(adapter._em))  # re-anchor clears the EMA

    def test_adapt_predict_inline(self):
        state = make_state()
        adapter = self._adapter(state, steps=2, lr=1e-2, predict="inline",
                                entropy_focus="uncertain")
        fn = adapter.make_adapt_predict_fn(state, threshold=0.5)
        x = jnp.asarray(np.random.RandomState(4).randn(2, 16, 16, 16, 2), jnp.float32)
        st, pred = fn(state, x, 2)
        assert pred.shape == (2, 16, 16, 16, 1)
        assert pred.dtype == jnp.uint8
        assert adapter.last_entropy is not None

    def test_incompatible_knobs_raise(self):
        state = make_state()
        with pytest.raises(ValueError, match="window"):
            self._adapter(state, window={"enabled": True})
        with pytest.raises(ValueError, match="early_stop"):
            self._adapter(state, early_stop={"enabled": True})
        with pytest.raises(ValueError, match="reliab"):
            self._adapter(state, reliability={"enabled": True})
        with pytest.raises(ValueError, match="restore"):
            self._adapter(state, restore={"enabled": True})
        with pytest.raises(ValueError, match="rho"):
            self._adapter(state, rho=0.0)

    def test_sync_over_mesh_false_rejected(self):
        state = make_state()
        with pytest.raises(ValueError, match="sync_over_mesh"):
            self._adapter(state, sync_over_mesh=False)

    def test_stream_controller_accepts_sar(self):
        from multimodal_tta_tpu.tta import StreamTTAController

        state = make_state()
        adapter = self._adapter(state, steps=1, lr=1e-2)
        ctl = StreamTTAController(
            adapter, state, threshold=0.5, policy="continual", guard=True,
            entropy_floor_ratio=0.2,
        )
        x = np.random.RandomState(7).randn(2, 16, 16, 16, 2).astype(np.float32)
        pred, info = ctl.step(x, 2, domain="A")
        assert pred.shape == (2, 16, 16, 16, 1)
        assert info["entropy_final"] is not None


class TestFisherAnchor:
    """EATA Fisher anti-forgetting (tta.fisher): diagonal-Fisher quadratic
    anchor toward the SOURCE trainable subtree, estimated from entropy
    gradients of the source model over the first served batches."""

    def _adapt(self, fisher=None, episodic=False, steps=4, lr=0.5, batches=2, method="tent"):
        state = make_state()
        tta = tent_cfg(method=method, steps=steps, lr=lr, momentum=0.0, episodic=episodic)
        if fisher is not None:
            tta["fisher"] = dict(fisher, enabled=True)
        cfg = full_cfg(tta=tta)
        adapter = get_tta_method(method)(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        rng = np.random.RandomState(0)
        out = state
        for _ in range(batches):
            x = jnp.asarray(rng.randn(2, 16, 16, 16, 2), jnp.float32)
            out = adapt_fn(out, x, 2)
        return state, out, adapter

    @staticmethod
    def _dist(a, b):
        return float(
            sum(
                float(jnp.sum(jnp.abs(x - y)))
                for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
            )
        )

    def test_lambda_zero_matches_disabled(self):
        # lambda=0 makes the proximal map the identity up to float
        # reassociation (s + (t-s)/1), so the trajectory matches plain Tent
        # to rounding
        _, off, _ = self._adapt(fisher=None)
        _, zero, _ = self._adapt(fisher={"lambda": 0.0})
        assert self._dist(off.params, zero.params) < 1e-4

    def test_anchor_bounds_drift_monotonically(self):
        src, free, _ = self._adapt(fisher=None)
        _, soft, _ = self._adapt(fisher={"lambda": 10.0})
        _, hard, _ = self._adapt(fisher={"lambda": 1e4})
        d_free = self._dist(src.params, free.params)
        d_soft = self._dist(src.params, soft.params)
        d_hard = self._dist(src.params, hard.params)
        assert d_free > 0.0
        assert d_hard < d_soft < d_free, (d_hard, d_soft, d_free)

    def test_estimation_window_freezes(self):
        _, _, adapter = self._adapt(fisher={"batches": 2}, batches=4)
        assert adapter._fisher_n == 2
        assert adapter._fisher_cached is not None
        # frozen: the cached normalized tree is returned as-is
        assert adapter._fisher_arg() is adapter._fisher_cached

    def test_fisher_normalized_to_mean_one(self):
        _, _, adapter = self._adapt(fisher={"batches": 1}, batches=1)
        leaves = jax.tree_util.tree_leaves(adapter._fisher_arg())
        total = sum(float(jnp.sum(l)) for l in leaves)
        count = sum(l.size for l in leaves)
        np.testing.assert_allclose(total / count, 1.0, rtol=1e-5)

    def test_reported_entropy_is_clean_objective(self):
        # the stream watchdog keys on LOW entropy; the anchor must not leak
        # into the reported trace (with lambda=1e8 a folded-in penalty would
        # be astronomically large or inf — the proximal form keeps the trace
        # at the entropy scale, ~ln 2 for sigmoid outputs)
        _, _, anchored_ad = self._adapt(fisher={"lambda": 1e8}, batches=1)
        e_anch = anchored_ad.last_entropy
        assert np.isfinite(e_anch) and 0.0 < e_anch < 1.0

    def test_anchor_is_source_not_carried_state(self):
        # continual stream with an overwhelming anchor: the end state stays
        # pinned near SOURCE even after several batches of drift pressure
        src, out, _ = self._adapt(fisher={"lambda": 1e6}, batches=3)
        src2, free, _ = self._adapt(fisher=None, batches=3)
        assert self._dist(src.params, out.params) < 0.01 * self._dist(src2.params, free.params)


class TestEata:
    """Method "eata" (tta/eata.py): reliability gate + Fisher anchor on by
    default over the Tent engine."""

    def test_registered_with_both_mechanisms_defaulted(self):
        from multimodal_tta_tpu.tta import EataAdapter

        assert get_tta_method("eata") is EataAdapter
        cfg = full_cfg(tta=tent_cfg(method="eata", episodic=False))
        adapter = EataAdapter(cfg.tta, config=cfg, mesh=None)
        assert adapter.rel_enabled and adapter.fisher_enabled

    def test_explicit_overrides_respected(self):
        from multimodal_tta_tpu.tta import EataAdapter

        tta = tent_cfg(method="eata", episodic=False)
        tta["fisher"] = {"enabled": False}
        cfg = full_cfg(tta=tta)
        adapter = EataAdapter(cfg.tta, config=cfg, mesh=None)
        assert adapter.rel_enabled and not adapter.fisher_enabled

    def test_both_disabled_raises(self):
        from multimodal_tta_tpu.tta import EataAdapter

        tta = tent_cfg(method="eata", episodic=False)
        tta["fisher"] = {"enabled": False}
        tta["reliability"] = {"enabled": False}
        cfg = full_cfg(tta=tta)
        with pytest.raises(ValueError, match="plain Tent"):
            EataAdapter(cfg.tta, config=cfg, mesh=None)

    def test_adapts_and_reduces_entropy(self):
        state = make_state()
        tta = tent_cfg(method="eata", episodic=False, steps=4, lr=1e-2)
        # random-noise fixtures sit near max entropy: the default 0.4 margin
        # gates every sample (the documented behavior) — open the gate so
        # this test exercises the update path
        tta["reliability"] = {"enabled": True, "margin_ratio": 10.0}
        cfg = full_cfg(tta=tta)
        adapter = get_tta_method("eata")(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(3).randn(2, 16, 16, 16, 2), jnp.float32)
        out = adapt_fn(state, x, 2)
        ents = np.asarray(adapter._last_ents)
        assert np.isfinite(ents).all()
        moved = sum(
            float(jnp.sum(jnp.abs(a - b)))
            for a, b in zip(
                jax.tree_util.tree_leaves(out.params),
                jax.tree_util.tree_leaves(state.params),
            )
        )
        assert moved > 0.0

    def test_cotta_and_sar_reject_fisher(self):
        from multimodal_tta_tpu.tta import CottaAdapter, SarAdapter

        for cls, name in ((CottaAdapter, "cotta"), (SarAdapter, "sar")):
            tta = tent_cfg(method=name, episodic=False)
            tta["fisher"] = {"enabled": True}
            cfg = full_cfg(tta=tta)
            with pytest.raises(ValueError, match="fisher"):
                cls(cfg.tta, config=cfg, mesh=None)

    def test_stream_controller_accepts_eata(self):
        from multimodal_tta_tpu.tta import StreamTTAController

        state = make_state()
        tta = tent_cfg(method="eata", episodic=False, steps=1, lr=1e-2)
        cfg = full_cfg(tta=tta)
        adapter = get_tta_method("eata")(cfg.tta, config=cfg, mesh=None)
        ctl = StreamTTAController(
            adapter, state, threshold=0.5, policy="continual", guard=True,
            entropy_floor_ratio=0.2,
        )
        x = np.random.RandomState(7).randn(2, 16, 16, 16, 2).astype(np.float32)
        pred, info = ctl.step(x, 2, domain="A")
        assert pred.shape == (2, 16, 16, 16, 1)
        assert info["entropy_final"] is not None


class TestMemo:
    """MEMO marginal-entropy adaptation (tta/memo.py, method "memo"):
    entropy of the view-averaged marginal prediction, gradients through
    every view, serve=clean|marginal."""

    def _adapter(self, state, *, sigmoid=True, **kw):
        cfg_tta = tent_cfg(method="memo", **kw)  # tent_cfg defaults steps=2, lr=1e-2
        cfg = full_cfg(tta=cfg_tta, sigmoid=sigmoid)
        from multimodal_tta_tpu.tta import MemoAdapter

        return MemoAdapter(cfg.tta, config=cfg, mesh=None)

    @staticmethod
    def _dist(a, b):
        return float(
            sum(
                float(jnp.sum(jnp.abs(x - y)))
                for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
            )
        )

    def test_registered(self):
        from multimodal_tta_tpu.tta import MemoAdapter

        assert get_tta_method("memo") is MemoAdapter

    def test_marginal_entropy_decreases_and_only_norm_changes(self):
        state = make_state()
        adapter = self._adapter(state, steps=4, lr=1e-2, n_views=2)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 16, 2), jnp.float32)
        out = adapt_fn(state, x, 2)
        ents = np.asarray(adapter._last_ents)
        assert ents.shape == (4,)
        assert ents[-1] < ents[0], ents
        mask = norm_param_mask(state.params)
        moved = unmoved = 0.0
        for m, a, b in zip(
            jax.tree_util.tree_leaves(mask),
            jax.tree_util.tree_leaves(out.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            d = float(jnp.sum(jnp.abs(a - b)))
            if m:
                moved += d
            else:
                unmoved += d
        assert moved > 1e-4
        assert unmoved == 0.0

    def test_views1_objective_matches_tent(self):
        """With one (clean) view the marginal IS the prediction, so the
        first-step objective must equal Tent's entropy on the same batch
        (up to the prob-space clipping epsilon)."""
        state = make_state()
        x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 16, 2), jnp.float32)
        memo = self._adapter(state, steps=1, n_views=1, entropy_focus="uncertain")
        memo.make_adapt_fn(state)(state, x, 2)
        tent = TentAdapter(
            full_cfg(tta=tent_cfg(steps=1, entropy_focus="uncertain")).tta,
            config=full_cfg(),
            mesh=None,
        )
        tent.make_adapt_fn(state)(state, x, 2)
        np.testing.assert_allclose(
            float(memo._last_ents[0]), float(tent._last_ents[0]), atol=1e-4
        )

    def test_degenerate_views_make_serve_modes_agree(self):
        """With augmentation switched off every view equals the clean view,
        so the marginal equals the clean prediction and serve=marginal must
        produce the same inline predictions as serve=clean."""
        state = make_state()
        x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 16, 2), jnp.float32)
        preds = {}
        for serve in ("clean", "marginal"):
            adapter = self._adapter(
                state,
                steps=2,
                n_views=3,
                aug_scale=0.0,
                aug_shift=0.0,
                aug_noise=0.0,
                aug_flip=False,
                serve=serve,
            )
            ap = adapter.make_adapt_predict_fn(state, threshold=0.5, predict_mode="inline")
            _, pred = ap(state, x, 2)
            preds[serve] = np.asarray(pred)
        np.testing.assert_array_equal(preds["clean"], preds["marginal"])

    def test_flip_ensemble_changes_served_marginal(self):
        """With real augmented views the marginal is a flip/jitter ensemble:
        it must differ from the clean-view prediction somewhere on a batch
        near the decision boundary (lr=0 pins the params, isolating serve)."""
        state = make_state()
        x = jnp.asarray(0.05 * np.random.RandomState(3).randn(2, 16, 16, 16, 2), jnp.float32)
        probs = {}
        for serve in ("clean", "marginal"):
            adapter = self._adapter(
                state, steps=1, lr=0.0, momentum=0.0, n_views=4, serve=serve
            )
            ap = adapter.make_adapt_predict_fn(state, threshold=0.5, predict_mode="inline")
            _, pred = ap(state, x, 2)
            probs[serve] = np.asarray(pred)
        assert (probs["clean"] != probs["marginal"]).any()

    def test_post_mode_with_marginal_ensemble(self):
        state = make_state()
        adapter = self._adapter(state, steps=1, n_views=2, serve="marginal")
        ap = adapter.make_adapt_predict_fn(state, threshold=0.5, predict_mode="post")
        x = jnp.asarray(np.random.RandomState(4).randn(2, 16, 16, 16, 2), jnp.float32)
        _, pred = ap(state, x, 2)
        assert pred.shape == (2, 16, 16, 16, 1)
        assert pred.dtype == jnp.uint8

    def test_softmax_mode(self):
        state = make_state(n_cls=3)
        adapter = self._adapter(state, sigmoid=False, steps=2, n_views=2)
        ap = adapter.make_adapt_predict_fn(state, threshold=0.5, predict_mode="inline")
        x = jnp.asarray(np.random.RandomState(5).randn(2, 16, 16, 16, 2), jnp.float32)
        out, pred = ap(state, x, 2)
        assert pred.shape == (2, 16, 16, 16, 1)
        assert int(jnp.max(pred)) <= 2
        assert adapter.last_entropy is not None

    def test_restore_composes(self):
        state = make_state()
        x = jnp.asarray(np.random.RandomState(6).randn(2, 16, 16, 16, 2), jnp.float32)
        free = self._adapter(state, steps=3, lr=0.5, n_views=2)
        free_out = free.make_adapt_fn(state)(state, x, 2)
        pinned = self._adapter(
            state, steps=3, lr=0.5, n_views=2, restore={"enabled": True, "prob": 1.0}
        )
        pinned_out = pinned.make_adapt_fn(state)(state, x, 2)
        assert self._dist(state.params, free_out.params) > 0.0
        assert self._dist(state.params, pinned_out.params) == 0.0

    def test_linearized_grads_match_direct_autodiff(self):
        """The per-view accumulated gradient must equal direct jax.grad of
        the marginal-entropy objective (the linearization is exact:
        dH(p_bar)/dtheta = sum_v <stop_grad(dH/dp)/V, dp_v/dtheta>). The
        naive direct form needs 20.7G at whole-volume batch 8 (measured,
        BASELINE.md) — here it is affordable on a tiny model and serves as
        the oracle."""
        from multimodal_tta_tpu.ops.augment import rand_intensity_scale_shift
        from multimodal_tta_tpu.ops.flip_tta import flip_combos

        state = make_state()  # INSTANCE norm: no batch_stats path
        x = jnp.asarray(np.random.RandomState(7).randn(2, 16, 16, 16, 2), jnp.float32)
        adapter = self._adapter(
            state, steps=1, lr=1.0, momentum=0.0, n_views=3,
            entropy_focus="uncertain",
        )
        rng0 = adapter._rng  # captured BEFORE adapt_fn consumes it
        adapt_fn = adapter.make_adapt_fn(state)
        out = adapt_fn(state, x, 2)

        # replicate the adapter's key schedule (steps=1, no restore/dropout)
        key = jax.random.split(rng0)[1]
        k_step = jax.random.split(key, 1)[0]
        _, k_views = jax.random.split(k_step)
        view_keys = jax.random.split(k_views, 2)

        mask = norm_param_mask(state.params)
        trainable0, frozen = adapter._partition(state.params, mask)
        combos = flip_combos((1, 2, 3))[1:]

        def direct_loss(trainable):
            params = adapter._combine(trainable, frozen)

            def fwd(xx):
                return state.apply_fn({"params": params}, xx, train=False)

            p = jax.nn.sigmoid(fwd(x))
            for i, k in enumerate(view_keys):
                k_int, k_noise = jax.random.split(k)
                xv = rand_intensity_scale_shift(k_int, x, scale=0.1, shift=0.1, prob=1.0)
                xv = xv + 0.05 * jax.random.normal(k_noise, xv.shape, xv.dtype)
                combo = combos[i % len(combos)]
                p = p + jnp.flip(jax.nn.sigmoid(fwd(jnp.flip(xv, axis=combo))), axis=combo)
            p = p / 3.0
            pc = jnp.clip(p, 1e-6, 1.0 - 1e-6)
            h = -(pc * jnp.log(pc) + (1.0 - pc) * jnp.log1p(-pc))
            w = jax.lax.stop_gradient(h)
            ax = tuple(range(1, h.ndim))
            per = jnp.sum(h * w, axis=ax) / jnp.maximum(jnp.sum(w, axis=ax), 1e-12)
            return jnp.mean(per)

        g_direct = jax.grad(direct_loss)(trainable0)
        # sgd(momentum=0) first step: delta = -lr * grad, lr = 1.0
        adapted_t = adapter.trainable_subtree(out.params)
        for g, a, t0 in zip(
            jax.tree_util.tree_leaves(g_direct),
            jax.tree_util.tree_leaves(adapted_t),
            jax.tree_util.tree_leaves(trainable0),
        ):
            np.testing.assert_allclose(
                np.asarray(a - t0), -np.asarray(g), rtol=1e-4, atol=1e-6
            )

    def test_incompatible_knobs_raise(self):
        state = make_state()
        with pytest.raises(ValueError, match="window"):
            self._adapter(state, window={"enabled": True})
        with pytest.raises(ValueError, match="early_stop"):
            self._adapter(state, early_stop={"enabled": True})
        with pytest.raises(ValueError, match="reliability"):
            self._adapter(state, reliability={"enabled": True})
        with pytest.raises(ValueError, match="fisher"):
            self._adapter(state, fisher={"enabled": True})
        with pytest.raises(ValueError, match="serve"):
            self._adapter(state, serve="oracle")

    def test_stream_controller_accepts_memo(self):
        from multimodal_tta_tpu.tta import StreamTTAController

        state = make_state()
        adapter = self._adapter(state, steps=1, n_views=2, episodic=False)
        ctl = StreamTTAController(
            adapter, state, threshold=0.5, policy="continual", guard=True,
            entropy_floor_ratio=0.2,
        )
        x = np.random.RandomState(8).randn(2, 16, 16, 16, 2).astype(np.float32)
        pred, info = ctl.step(x, 2, domain="A")
        assert pred.shape == (2, 16, 16, 16, 1)
        assert info["entropy_final"] is not None

    def test_memo_on_8dev_mesh_matches_single_device(self):
        """SPMD path: batch sharded over the data axis, the marginal's view
        forwards and the backward through them run under the mesh shardings;
        numerics match the single-device adaptation."""
        from multimodal_tta_tpu.parallel.mesh import make_mesh, shard_batch

        mesh = make_mesh()
        assert mesh.devices.size == 8
        state = make_state()
        x_np = np.random.RandomState(9).randn(8, 16, 16, 16, 2).astype(np.float32)

        cfg_tta = tent_cfg(method="memo", n_views=2)
        cfg = full_cfg(tta=cfg_tta)
        from multimodal_tta_tpu.tta import MemoAdapter

        sharded = shard_batch({"image": x_np}, mesh)
        s_mesh = MemoAdapter(cfg.tta, config=cfg, mesh=mesh).make_adapt_fn(state)(
            state, sharded["image"], 8
        )
        s_one = MemoAdapter(cfg.tta, config=cfg, mesh=None).make_adapt_fn(state)(
            state, jnp.asarray(x_np), 8
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(s_mesh.params),
            jax.tree_util.tree_leaves(s_one.params),
        ):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestSarScales:
    """Round-5 regression: SAR's reliable filter and recovery monitor score
    on the SELF-NORMALIZED entropy scale regardless of the objective's
    ``entropy_focus`` (tta/sar.py loss_of). Scoring by the objective's own
    entropy made SAR exactly inert in dense segmentation: the plain
    volume-mean objective (~1e-3 on converged models) sat permanently below
    the 0.2*H_max recovery floor (perpetual source resets), and the focused
    objective (~0.38) sat above the 0.4*H_max filter margin (every sample
    excluded)."""

    def test_recovery_floor_on_self_normalized_scale(self):
        import jax.numpy as jnp

        from multimodal_tta_tpu.ops.losses import entropy_loss
        from multimodal_tta_tpu.tta import SarAdapter

        state = make_state()
        # make predictions confident-but-heterogeneous (the converged-model
        # regime): plain mean entropy << self-normalized entropy
        params = jax.device_get(state.params)
        params["head"]["bias"] = params["head"]["bias"] + 4.0
        state = state.replace(params=jax.tree_util.tree_map(jnp.asarray, params))

        x = jnp.asarray(np.random.RandomState(7).randn(2, 16, 16, 16, 2), jnp.float32)
        logits = state.apply_fn({"params": state.params}, x, train=False)
        h_max = float(jnp.log(2.0))
        plain = float(entropy_loss(logits, sigmoid=True, focus="all")) / h_max
        sn = float(entropy_loss(logits, sigmoid=True, focus="uncertain")) / h_max
        # precondition: the two scales are actually separated here
        assert sn - plain > 0.02, (plain, sn)

        floor = (plain + sn) / 2.0
        cfg_tta = tent_cfg(method="sar", episodic=False, steps=2, lr=1e-2,
                           entropy_focus="all", margin_ratio=1.0,
                           reset_floor_ratio=floor)
        cfg = full_cfg(tta=cfg_tta, sigmoid=True)
        adapter = SarAdapter(cfg.tta, config=cfg, mesh=None)
        out = adapter.make_adapt_fn(state)(state, x, 2)
        moved = sum(
            float(jnp.sum(jnp.abs(a - b)))
            for a, b in zip(jax.tree_util.tree_leaves(state.params),
                            jax.tree_util.tree_leaves(out.params))
        )
        # old (objective-scale) monitor: plain < floor -> every step snapped
        # back to source -> moved == 0. Fixed monitor: sn > floor -> free.
        assert moved > 1e-6

    def test_filter_margin_on_self_normalized_scale(self):
        """A margin BETWEEN the plain and self-normalized scales must
        exclude samples (score > margin) even when the objective is plain —
        i.e. the filter decision follows the self-normalized score, not the
        objective value."""
        import jax.numpy as jnp

        from multimodal_tta_tpu.ops.losses import entropy_loss
        from multimodal_tta_tpu.tta import SarAdapter

        state = make_state()
        params = jax.device_get(state.params)
        params["head"]["bias"] = params["head"]["bias"] + 4.0
        state = state.replace(params=jax.tree_util.tree_map(jnp.asarray, params))
        x = jnp.asarray(np.random.RandomState(8).randn(2, 16, 16, 16, 2), jnp.float32)
        logits = state.apply_fn({"params": state.params}, x, train=False)
        h_max = float(jnp.log(2.0))
        plain = float(entropy_loss(logits, sigmoid=True, focus="all")) / h_max
        sn = float(entropy_loss(logits, sigmoid=True, focus="uncertain")) / h_max
        assert sn - plain > 0.02

        margin = (plain + sn) / 2.0
        cfg_tta = tent_cfg(method="sar", episodic=False, steps=2, lr=0.5,
                           entropy_focus="all", margin_ratio=margin,
                           reset_floor_ratio=0.0)
        cfg = full_cfg(tta=cfg_tta, sigmoid=True)
        adapter = SarAdapter(cfg.tta, config=cfg, mesh=None)
        out = adapter.make_adapt_fn(state)(state, x, 2)
        moved = sum(
            float(jnp.sum(jnp.abs(a - b)))
            for a, b in zip(jax.tree_util.tree_leaves(state.params),
                            jax.tree_util.tree_leaves(out.params))
        )
        # both samples score sn > margin -> filtered out -> zero objective
        # (under objective-scale scoring, plain < margin would have passed)
        assert moved == 0.0
