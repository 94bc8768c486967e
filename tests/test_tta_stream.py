"""StreamTTAController: reset policies + entropy collapse guard
(BASELINE config #5 — streaming continual TTA over ordered domain shifts)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.core.train_state import TrainState
from multimodal_tta_tpu.models import UNet3D
from multimodal_tta_tpu.tta import StreamTTAController, TentAdapter

import optax


def _state():
    model = UNet3D(
        in_channels=1,
        num_classes=1,
        channels=(4, 8),
        strides=(2,),
        num_res_units=1,
        norm="INSTANCE",
    )
    x0 = jnp.zeros((1, 8, 8, 8, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=True)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=optax.identity(),
    )


def _adapter(state, steps=1, lr=1e-3, momentum=0.9):
    cfg = ConfigNode(
        {
            "task": {"seed": 0},
            "training": {"criterion": {"sigmoid": True}},
            "tta": {
                "method": "tent",
                "steps": steps,
                "lr": lr,
                "optimizer": "sgd",
                "momentum": momentum,
                "update": "norm",
                "episodic": False,
                "entropy_focus": "all",
            },
        }
    )
    return TentAdapter(cfg.tta, config=cfg, mesh=None)


def _batch(seed=0, b=2):
    return np.random.RandomState(seed).randn(b, 8, 8, 8, 1).astype(np.float32)


def _params_equal(a, b) -> bool:
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(fa, fb))


class TestPolicies:
    def test_rejects_episodic_adapter(self):
        state = _state()
        cfg = ConfigNode(
            {"training": {"criterion": {"sigmoid": True}},
             "tta": {"method": "tent", "episodic": True}}
        )
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        with pytest.raises(ValueError, match="episodic"):
            StreamTTAController(adapter, state, threshold=0.5, policy="episodic")

    def test_unknown_policy_raises(self):
        state = _state()
        with pytest.raises(ValueError, match="policy"):
            StreamTTAController(_adapter(state), state, threshold=0.5, policy="bogus")

    def test_episodic_policy_always_adapts_from_source(self):
        state = _state()
        ctrl = StreamTTAController(_adapter(state), state, threshold=0.5, policy="episodic")
        ctrl.step(_batch(0), 2)
        after_first = ctrl.state.params
        # episodic: second batch adapts from SOURCE again, so identical input
        # yields identical adapted params (a continual run would differ)
        ctrl.step(_batch(0), 2)
        assert _params_equal(after_first, ctrl.state.params)

    def test_continual_carries_state(self):
        state = _state()
        ctrl = StreamTTAController(_adapter(state), state, threshold=0.5, policy="continual")
        ctrl.step(_batch(0), 2)
        after_first = ctrl.state.params
        ctrl.step(_batch(0), 2)
        assert not _params_equal(after_first, ctrl.state.params)
        assert ctrl.n_reanchors == 0

    def test_reset_on_domain_change(self):
        state = _state()
        ctrl = StreamTTAController(
            _adapter(state), state, threshold=0.5, policy="reset_on_domain_change"
        )
        ctrl.step(_batch(0), 2, domain="A")
        ctrl.step(_batch(1), 2, domain="A")
        assert ctrl.n_reanchors == 0
        drifted = ctrl.state.params
        assert not _params_equal(drifted, state.params)
        _, info = ctrl.step(_batch(2), 2, domain="B")
        assert ctrl.n_reanchors == 1
        assert "A -> B" in ctrl.reanchor_log[0][1]
        # the boundary batch adapted from SOURCE, not from the domain-A state
        expected_ctrl = StreamTTAController(
            _adapter(state), state, threshold=0.5, policy="continual"
        )
        expected_ctrl.step(_batch(2), 2)
        assert _params_equal(ctrl.state.params, expected_ctrl.state.params)


class TestCollapseGuard:
    def test_watchdog_reanchors_on_entropy_collapse(self):
        state = _state()
        # aggressive setting: many steps, big lr — the measured collapse regime
        adapter = _adapter(state, steps=24, lr=0.5)
        ctrl = StreamTTAController(
            adapter, state, threshold=0.5, policy="continual",
            guard=True, entropy_floor_ratio=0.5,
        )
        reanchored = False
        for i in range(6):
            _, info = ctrl.step(_batch(i), 2)
            if info["reanchored"]:
                reanchored = True
                assert "watchdog" in info["reason"]
                # after the re-anchor the carried state is the source again
                assert _params_equal(ctrl.state.params, state.params)
                break
        assert reanchored, "entropy watchdog never fired in the collapse regime"

    def test_no_reanchor_in_gentle_regime(self):
        state = _state()
        adapter = _adapter(state, steps=1, lr=1e-4)
        ctrl = StreamTTAController(
            adapter, state, threshold=0.5, policy="continual",
            guard=True, entropy_floor_ratio=0.2,
        )
        for i in range(4):
            _, info = ctrl.step(_batch(i), 2)
            assert not info["reanchored"]
        assert ctrl.n_reanchors == 0

    def test_periodic_reanchor(self):
        state = _state()
        ctrl = StreamTTAController(
            _adapter(state), state, threshold=0.5, policy="continual",
            periodic_reanchor_every=2,
        )
        for i in range(6):
            ctrl.step(_batch(i), 2)
        assert ctrl.n_reanchors == 3

    def test_from_config(self):
        state = _state()
        cfg = ConfigNode(
            {
                "tta": {
                    "predict": "inline",
                    "stream": {
                        "policy": "reset_on_domain_change",
                        "guard": True,
                        "entropy_floor_ratio": 0.3,
                        "periodic_reanchor_every": 7,
                    },
                }
            }
        )
        ctrl = StreamTTAController.from_config(_adapter(state), state, cfg, threshold=0.4)
        assert ctrl.policy == "reset_on_domain_change"
        assert ctrl.guard and ctrl.floor_ratio == 0.3 and ctrl.period == 7


class TestStreamAnchoredEarlyStop:
    def test_absolute_floor_arrests_stream_collapse(self):
        """In continual mode each batch's own first-step entropy collapses
        along the stream, so the adapter's batch-relative early-stop anchor
        never fires (measured on the TPU harness) — the controller passes a
        STREAM-anchored absolute floor instead, which must keep the carried
        state's entropy pinned near the floor instead of collapsing."""
        state = _state()

        def run(early_stop):
            adapter = _adapter(state, steps=24, lr=2.0)
            if early_stop:
                adapter.early_stop = True
                adapter.early_stop_ratio = 0.5
            ctrl = StreamTTAController(adapter, state, threshold=0.5, policy="continual")
            infos = [ctrl.step(_batch(i), 2)[1] for i in range(4)]
            return infos

        free = run(False)
        braked = run(True)
        e0 = braked[0]["entropy_first"]
        assert free[-1]["entropy_final"] < 0.2 * e0, "regime not collapsing"
        # the brake holds the carried state near the floor across the stream
        assert braked[-1]["entropy_first"] >= 0.4 * e0, (
            braked[-1], e0,
        )
        assert braked[-1]["entropy_final"] > free[-1]["entropy_final"]


class TestStreamOverMesh:
    """Pod-scale streaming (BASELINE measurement plan #5 stretch): the
    controller serving an ordered stream on a data-sharded device mesh. The
    adapted trajectory must match the single-device controller — same
    watchdog decisions, same predictions — with the batch entering sharded
    over the mesh data axis (gradient/statistic all-reduce over ICI in the
    adapt scan) and odd batches padded to the axis size."""

    def _run(self, mesh, n_batches=3, policy="continual", guard=True, b=2):
        from multimodal_tta_tpu.conf import ConfigNode
        from multimodal_tta_tpu.tta import TentAdapter

        state = _state()
        cfg = ConfigNode(
            {
                "task": {"seed": 0},
                "training": {"criterion": {"sigmoid": True}},
                "tta": {
                    "method": "tent",
                    "steps": 2,
                    "lr": 1e-2,
                    "optimizer": "sgd",
                    "momentum": 0.9,
                    "update": "norm",
                    "episodic": False,
                    "entropy_focus": "all",
                },
            }
        )
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=mesh)
        ctrl = StreamTTAController(
            adapter, state, threshold=0.5, policy=policy, guard=guard,
            entropy_floor_ratio=0.2,
        )
        preds, infos = [], []
        for i in range(n_batches):
            domain = "A" if i < n_batches // 2 else "B"
            pred, info = ctrl.step(_batch(seed=i, b=b), b, domain=domain)
            preds.append(np.asarray(pred)[:b])
            infos.append(info)
        return preds, infos, ctrl

    def test_mesh_stream_matches_single_device(self):
        from multimodal_tta_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()  # 8-device data mesh (CPU-simulated)
        p_mesh, i_mesh, c_mesh = self._run(mesh)
        p_one, i_one, c_one = self._run(None)
        assert c_mesh.n_reanchors == c_one.n_reanchors
        for a, b_, ia, ib in zip(p_mesh, p_one, i_mesh, i_one):
            np.testing.assert_array_equal(a, b_)
            np.testing.assert_allclose(
                ia["entropy_final"], ib["entropy_final"], atol=1e-5
            )

    def test_mesh_stream_data_space_axes(self):
        """The serving mesh can also shard space (data=4, space=2) — the
        stream still runs and matches the pure-data layout."""
        from multimodal_tta_tpu.parallel.mesh import make_mesh

        p_ds, _, _ = self._run(make_mesh(data=4, space=2), b=4)
        p_d, _, _ = self._run(make_mesh(), b=4)
        for a, b_ in zip(p_ds, p_d):
            np.testing.assert_array_equal(a, b_)

    def test_mesh_pads_odd_batches(self):
        """Batch 3 on an 8-way data axis: the controller pads to 8 and
        n_valid masks the padding out of the objective."""
        from multimodal_tta_tpu.parallel.mesh import make_mesh

        p, infos, _ = self._run(make_mesh(), n_batches=2, b=3)
        assert all(x.shape[0] == 3 for x in p)
        assert all(np.isfinite(i["entropy_final"]) for i in infos)


class TestEntropyGatedServing:
    """tta.stream.gate: forward-only fast path until entropy crosses the
    gate, same-batch escalation, re-probe after re-anchor. The host-level
    mode switch is what actually skips the backward (the in-scan early-stop
    gate is masking only — its scan length is static)."""

    def _gate_ctrl(self, state, **kw):
        return StreamTTAController(
            _adapter(state), state, threshold=0.5, policy="continual",
            gate=True, **kw,
        )

    def _forward_entropy(self, state, x):
        # gate entropy == objective entropy for the focus="all" test adapter
        fp = _adapter(state).make_forward_predict_fn(state, threshold=0.5)
        return fp(state, jnp.asarray(x), x.shape[0])[2]

    def test_forward_mode_never_touches_state(self):
        state = _state()
        ctrl = self._gate_ctrl(state, gate_threshold=1e9)  # unreachable gate
        for i in range(3):
            _, info = ctrl.step(_batch(i), 2)
            assert info["mode"] == "forward"
        assert ctrl.n_forward_batches == 3 and ctrl.n_adapt_batches == 0
        assert _params_equal(ctrl.state.params, state.params)
        assert ctrl.escalation_log == []

    def test_forward_pred_matches_plain_inference(self):
        state = _state()
        ctrl = self._gate_ctrl(state, gate_threshold=1e9)
        x = _batch(0)
        pred, _ = ctrl.step(x, 2)
        logits = state.apply_fn({"params": state.params}, jnp.asarray(x), train=False)
        expected = (jax.nn.sigmoid(logits) >= 0.5).astype(np.uint8)
        np.testing.assert_array_equal(np.asarray(pred), np.asarray(expected))

    def test_gate_entropy_matches_adapt_trace_first_step(self):
        """The fast path's OBJECTIVE entropy is the SAME objective the adapt
        step reports as its pre-update entropy — floors transfer."""
        state = _state()
        x = _batch(0)
        fp = _adapter(state).make_forward_predict_fn(state, threshold=0.5)
        _, ent_obj, _ = fp(state, jnp.asarray(x), x.shape[0])
        ctrl = StreamTTAController(
            _adapter(state), state, threshold=0.5, policy="continual"
        )
        _, info = ctrl.step(x, 2)
        np.testing.assert_allclose(ent_obj, info["entropy_first"], atol=1e-5)

    def test_gate_watches_plain_mean_not_focused_objective(self):
        """The drift detector is the PLAIN volume-mean entropy even when the
        adaptation objective is focused: with focus=uncertain the two
        entropies differ (self-normalized vs mass-scaled — the measured
        3.9x-vs-0.88x asymmetry, BASELINE.md gate section), the controller
        thresholds the gate one, and the watchdog anchor uses the objective
        one."""
        state = _state()
        x = _batch(0)
        cfg = ConfigNode(
            {
                "task": {"seed": 0},
                "training": {"criterion": {"sigmoid": True}},
                "tta": {"method": "tent", "steps": 1, "lr": 1e-3,
                        "optimizer": "sgd", "momentum": 0.9, "update": "norm",
                        "episodic": False, "entropy_focus": "uncertain"},
            }
        )
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        fp = adapter.make_forward_predict_fn(state, threshold=0.5)
        _, ent_obj, ent_gate = fp(state, jnp.asarray(x), x.shape[0])
        # self-normalized objective is a per-uncertain-voxel average (large);
        # the gate mean is diluted by confident voxels (small)
        assert ent_obj != pytest.approx(ent_gate)
        assert ent_gate < ent_obj
        ctrl = StreamTTAController(
            adapter, state, threshold=0.5, policy="continual", gate=True,
            gate_threshold=1e9,
        )
        _, info = ctrl.step(x, 2)
        assert info["gate_entropy"] == pytest.approx(ent_gate, abs=1e-6)
        assert info["entropy_first"] == pytest.approx(ent_obj, abs=1e-6)
        assert ctrl._gate_ref == pytest.approx(ent_gate, abs=1e-6)
        assert ctrl._e0 == pytest.approx(ent_obj, abs=1e-6)

    def test_escalates_on_drift_and_adapts_same_batch(self):
        state = _state()
        a, b = _batch(0), _batch(1)
        ea = self._forward_entropy(state, a)
        eb = self._forward_entropy(state, b)
        lo, hi = (a, b) if ea < eb else (b, a)
        mid = 0.5 * (min(ea, eb) + max(ea, eb))
        ctrl = self._gate_ctrl(state, gate_threshold=mid)
        _, info = ctrl.step(lo, 2)
        assert info["mode"] == "forward"
        assert _params_equal(ctrl.state.params, state.params)
        _, info = ctrl.step(hi, 2)
        # trigger batch is re-served through the adaptation path
        assert info["mode"] == "adapt"
        assert not _params_equal(ctrl.state.params, state.params)
        assert len(ctrl.escalation_log) == 1
        batch_idx, ent, thresh = ctrl.escalation_log[0]
        assert batch_idx == 1 and ent > thresh
        # and the stream stays in adapt mode afterwards
        _, info = ctrl.step(lo, 2)
        assert info["mode"] == "adapt"
        assert ctrl.n_forward_batches == 1 and ctrl.n_adapt_batches == 2

    def test_ratio_mode_calibrates_on_first_batch(self):
        state = _state()
        x = _batch(0)
        ctrl = self._gate_ctrl(state, gate_ratio=1.5)
        _, info = ctrl.step(x, 2)
        # first batch defines the reference and cannot itself escalate
        assert info["mode"] == "forward"
        assert ctrl._gate_ref == pytest.approx(info["gate_entropy"])

    def test_reanchor_returns_to_forward_mode(self):
        state = _state()
        ctrl = StreamTTAController(
            _adapter(state), state, threshold=0.5, policy="continual",
            gate=True, gate_threshold=-1.0,  # every batch escalates
            periodic_reanchor_every=2,
        )
        _, i0 = ctrl.step(_batch(0), 2)
        assert i0["mode"] == "adapt" and ctrl.mode == "adapt"
        _, i1 = ctrl.step(_batch(1), 2)
        assert i1["reanchored"]  # periodic fires on the 2nd adapted batch
        assert ctrl.mode == "forward"  # re-probe at source
        # still-shifted stream re-escalates on the next batch
        _, i2 = ctrl.step(_batch(2), 2)
        assert i2["mode"] == "adapt"

    def test_from_config_gate_keys(self):
        state = _state()
        cfg = ConfigNode(
            {
                "tta": {
                    "predict": "inline",
                    "stream": {
                        "policy": "continual",
                        "gate": {"enabled": True, "ratio": 2.0, "threshold": 0.25},
                    },
                }
            }
        )
        ctrl = StreamTTAController.from_config(_adapter(state), state, cfg, threshold=0.4)
        assert ctrl.gate and ctrl.gate_ratio == 2.0 and ctrl.gate_threshold == 0.25

    def test_from_config_gate_reprobe_alias(self):
        """`gate.reprobe_every` is a documented alias of
        `periodic_reanchor_every` (the re-anchor is what drops the gate back
        to forward mode); both set to different values is an error."""
        import pytest

        state = _state()

        def cfg(stream):
            return ConfigNode({"tta": {"predict": "inline", "stream": stream}})

        ctrl = StreamTTAController.from_config(
            _adapter(state), state,
            cfg({"gate": {"enabled": True, "reprobe_every": 5}}), threshold=0.4,
        )
        assert ctrl.period == 5
        ctrl = StreamTTAController.from_config(
            _adapter(state), state,
            cfg({"periodic_reanchor_every": 3,
                 "gate": {"enabled": True, "reprobe_every": 3}}), threshold=0.4,
        )
        assert ctrl.period == 3
        with pytest.raises(ValueError, match="alias"):
            StreamTTAController.from_config(
                _adapter(state), state,
                cfg({"periodic_reanchor_every": 3,
                     "gate": {"enabled": True, "reprobe_every": 5}}), threshold=0.4,
            )
        # reprobe_every with the gate OFF would silently enable periodic
        # re-anchoring on a supposedly-plain stream — config error
        with pytest.raises(ValueError, match="gate.enabled"):
            StreamTTAController.from_config(
                _adapter(state), state,
                cfg({"gate": {"enabled": False, "reprobe_every": 5}}), threshold=0.4,
            )

    def test_evaluate_stream_reports_gate_economics(self):
        from multimodal_tta_tpu.tta.stream import evaluate_stream

        state = _state()
        ctrl = self._gate_ctrl(state, gate_threshold=1e9)
        label = np.zeros((2, 8, 8, 8, 1), np.float32)
        label[:, 2:4, 2:4, 2:4] = 1.0
        stream = [("A", {"image": _batch(i), "label": label}) for i in range(2)]
        m = evaluate_stream(ctrl, stream)
        assert m["policy"].endswith("+gate")
        assert m["gate/forward_batches"] == 2 and m["gate/adapt_batches"] == 0
        assert m["positions"][0]["mode"] == "forward"

    def test_gate_on_mesh_matches_single_device(self):
        from multimodal_tta_tpu.parallel.mesh import make_mesh

        state = _state()
        x = _batch(0)
        ent_1 = self._forward_entropy(state, x)
        adapter = _adapter(state)
        adapter.mesh = make_mesh()
        fp = adapter.make_forward_predict_fn(state, threshold=0.5)
        import jax.numpy as _jnp

        pad = _jnp.pad(_jnp.asarray(x), ((0, 6), (0, 0), (0, 0), (0, 0), (0, 0)))
        pred8, _, ent_8 = fp(state, pad, 2)
        np.testing.assert_allclose(ent_8, ent_1, atol=1e-5)
