"""Checkpoint serialization.

Two formats behind one (path, state, extra) API:

- **msgpack** (default, single-host): flax msgpack bytes (fast,
  dependency-free, restores onto a template state so shardings/structure
  survive). Gathers to host 0 — right for v5e-8 single-host runs.
- **orbax** (sharded, multi-host-safe): each process writes ONLY its
  addressable shards (OCDBT ``ocdbt.process_N`` files) — nothing gathers to
  host 0, so pod-scale states that exceed one host's RAM still checkpoint;
  restore places shards per the template state's shardings.

Both have a JSON sidecar for host metadata (epoch, best metrics, scheduler
state) and atomic commit semantics (tmp + rename for msgpack; orbax's own
finalization protocol) so preemption mid-save never corrupts the latest
checkpoint — TPU preemption is routine (SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np
from flax import serialization


def _state_payload(state) -> Dict[str, Any]:
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    # EMA shadow params ride along only when the run tracks them, keeping
    # non-EMA checkpoints byte-compatible with earlier rounds
    if getattr(state, "ema_params", None) is not None:
        payload["ema_params"] = state.ema_params
    return payload


def save_checkpoint(path: str, state, extra: Dict[str, Any] = None) -> None:
    """path is extension-less; writes path.msgpack + path.json atomically."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    payload = jax.device_get(_state_payload(state))
    blob = serialization.to_bytes(payload)
    tmp = path + ".msgpack.tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path + ".msgpack")
    _write_sidecar(path, dict(extra or {}, _format="msgpack"))


def _json_default(o):
    if isinstance(o, (np.floating, np.integer)):
        return o.item()
    if isinstance(o, np.ndarray):
        return o.tolist()
    return str(o)


def load_checkpoint(path: str, template_state) -> Tuple[Any, Dict[str, Any]]:
    """Restore a TrainState from ``path`` using ``template_state`` for
    structure; returns (state, extra_metadata). Auto-detects format; when
    BOTH an .orbax directory and a .msgpack exist at the same path (a run
    switched checkpoint_format without cleaning the save dir), the sidecar's
    recorded ``_format`` decides (newer mtime for pre-format sidecars) —
    both formats share the one .json sidecar, so restoring the wrong payload
    would pair stale params with the fresh run's epoch/best metadata."""
    orbax_dir = path + ".orbax"
    msgpack_path = path + ".msgpack"
    has_orbax = os.path.isdir(orbax_dir)
    if has_orbax and os.path.exists(msgpack_path):
        # the sidecar records which format wrote it (deterministic; mtimes
        # are unreliable after tar/scp/object-store copies) — fall back to
        # newer-mtime only for pre-format sidecars
        declared = _read_sidecar(path).get("_format")
        if declared in ("msgpack", "orbax"):
            has_orbax = declared == "orbax"
        elif os.path.getmtime(msgpack_path) > os.path.getmtime(orbax_dir):
            has_orbax = False
        from ..utils.logger import get_logger

        get_logger().warning(
            f"[checkpoint] both {orbax_dir} and {msgpack_path} exist; "
            f"restoring the {'orbax' if has_orbax else 'msgpack'} payload "
            f"({'sidecar-declared' if declared else 'newer mtime'})"
        )
    if has_orbax:
        return load_checkpoint_sharded(path, template_state)
    with open(path + ".msgpack", "rb") as f:
        blob = f.read()
    template = jax.device_get(_state_payload(template_state))
    # EMA presence may differ between the checkpoint and the resuming run
    # (training.ema toggled between runs): probe the raw payload's keys and
    # adapt rather than failing the exact-keys structural restore.
    raw_keys = set(serialization.msgpack_restore(blob).keys())
    blob_has_ema = "ema_params" in raw_keys
    if blob_has_ema and "ema_params" not in template:
        template["ema_params"] = jax.device_get(template_state.params)
    if not blob_has_ema and "ema_params" in template:
        template.pop("ema_params")
    restored = serialization.from_bytes(template, blob)
    state = template_state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    if blob_has_ema:
        state = state.replace(ema_params=restored["ema_params"])
    elif getattr(template_state, "ema_params", None) is not None:
        # resuming WITH ema from a pre-ema checkpoint: warm-start the shadow
        # at the restored params (the standard EMA init)
        from ..utils.logger import get_logger

        get_logger().info(
            "[checkpoint] no ema_params in checkpoint; warm-starting the EMA "
            "shadow from the restored params"
        )
        # distinct host copies: sharing the np buffers with params could
        # alias the two device buffers at the next donated step
        state = state.replace(
            ema_params=jax.tree_util.tree_map(np.copy, restored["params"])
        )
    return state, _read_sidecar(path)


def load_params_only(
    path: str, params_template, batch_stats_template, *, use_ema: bool = False
) -> Tuple[Any, Any]:
    """Restore ONLY (params, batch_stats) from a msgpack checkpoint — no
    opt_state template needed, so the loading run's optimizer config is free
    to differ from the saving run's (the frozen-teacher case, core/distill.py:
    the teacher trained with adam, the student run needs just its weights).

    ``use_ema=True`` returns the checkpoint's EMA shadow as the params
    (hard-fails when absent — same contract as resolve_serving_params).
    Orbax-format checkpoints are not supported here: their structural
    restore needs the full template; re-save the teacher as msgpack
    (core/checkpoint.save_checkpoint) for distillation."""
    if os.path.isdir(path + ".orbax") and not os.path.exists(path + ".msgpack"):
        raise ValueError(
            f"[checkpoint] {path} is orbax-format; params-only loading needs "
            "the msgpack format — load it with the original training config "
            "and re-save via save_checkpoint()"
        )
    with open(path + ".msgpack", "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    key = "params"
    if use_ema:
        if "ema_params" not in raw:
            raise ValueError(
                f"[checkpoint] use_ema requested but {path} carries no "
                "ema_params — the teacher was trained without training.ema"
            )
        key = "ema_params"
    params = serialization.from_state_dict(
        jax.device_get(params_template), raw[key]
    )
    batch_stats = serialization.from_state_dict(
        jax.device_get(batch_stats_template), raw.get("batch_stats", {})
    )
    return params, batch_stats


def resolve_serving_params(state, use_ema: bool):
    """Swap the EMA shadow in as the serving/adaptation params
    (``training.use_ema_params`` in adapt.py / predict.py). Hard-fails when
    requested on a checkpoint without a shadow — silently serving the raw
    params when EMA metrics selected the checkpoint would be the silent
    config-ignore failure mode."""
    if not use_ema:
        return state
    if getattr(state, "ema_params", None) is None:
        raise ValueError(
            "[checkpoint] training.use_ema_params=true but the checkpoint "
            "carries no ema_params — train with training.ema.enabled=true"
        )
    return state.replace(params=state.ema_params)


def _read_sidecar(path: str) -> Dict[str, Any]:
    meta_path = path + ".json"
    if os.path.exists(meta_path):
        with open(meta_path, "r", encoding="utf-8") as f:
            return json.load(f)
    return {}


def _write_sidecar(path: str, extra: Dict[str, Any]) -> None:
    meta = dict(extra or {})
    tmp = path + ".json.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f, default=_json_default)
    os.replace(tmp, path + ".json")


# ----------------------------------------------------------------------------
# Sharded (multi-host-safe) format
# ----------------------------------------------------------------------------

def _as_jax_leaves(tree):
    """Orbax saves jax.Arrays shard-wise; lift plain scalars/np arrays."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: x if isinstance(x, jax.Array) else jnp.asarray(x), tree
    )


def save_checkpoint_sharded(path: str, state, extra: Dict[str, Any] = None) -> None:
    """Multi-host-safe save: every process writes only its ADDRESSABLE shards
    into ``path.orbax/`` (OCDBT: one ``ocdbt.process_N`` per host) — no
    gather to host 0, unlike the msgpack format. The JSON sidecar is written
    by process 0 only. Collective: all processes must call this."""
    import orbax.checkpoint as ocp

    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    payload = _as_jax_leaves(_state_payload(state))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path) + ".orbax", payload, force=True)
    ckptr.wait_until_finished()
    ckptr.close()
    if jax.process_index() == 0:
        _write_sidecar(path, dict(extra or {}, _format="orbax"))


def load_checkpoint_sharded(path: str, template_state) -> Tuple[Any, Dict[str, Any]]:
    """Restore from the sharded format. Each leaf is restored with the
    TEMPLATE state's sharding (shards land directly on their devices; a
    checkpoint written on one mesh can restore onto another of the same
    global shapes). Collective: all processes must call this."""
    import orbax.checkpoint as ocp

    template = _as_jax_leaves(_state_payload(template_state))

    def abstract(x):
        sharding = getattr(x, "sharding", None)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path) + ".orbax", jax.tree_util.tree_map(abstract, template)
    )
    ckptr.close()
    state = template_state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    # EMA rides along when the template tracks it (toggling training.ema
    # between an orbax save and the resume is unsupported — the structural
    # restore needs matching trees; use the msgpack format for that)
    if "ema_params" in restored:
        state = state.replace(ema_params=restored["ema_params"])
    return state, _read_sidecar(path)
