"""Checkpoint serialization.

TrainState pytrees are serialized with flax msgpack (fast, dependency-free,
restores onto a template state so shardings/structure survive), with a JSON
sidecar for host metadata (epoch, best metrics, scheduler state). Write is
atomic (tmp + rename) so preemption mid-save never corrupts the latest
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
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(path: str, state, extra: Dict[str, Any] = None) -> None:
    """path is extension-less; writes path.msgpack + path.json atomically."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    payload = jax.device_get(_state_payload(state))
    blob = serialization.to_bytes(payload)
    tmp = path + ".msgpack.tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path + ".msgpack")

    meta = dict(extra or {})
    tmp = path + ".json.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f, default=_json_default)
    os.replace(tmp, path + ".json")


def _json_default(o):
    if isinstance(o, (np.floating, np.integer)):
        return o.item()
    if isinstance(o, np.ndarray):
        return o.tolist()
    return str(o)


def load_checkpoint(path: str, template_state) -> Tuple[Any, Dict[str, Any]]:
    """Restore a TrainState from ``path`` using ``template_state`` for
    structure; returns (state, extra_metadata)."""
    with open(path + ".msgpack", "rb") as f:
        blob = f.read()
    template = jax.device_get(_state_payload(template_state))
    restored = serialization.from_bytes(template, blob)
    state = template_state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    extra: Dict[str, Any] = {}
    meta_path = path + ".json"
    if os.path.exists(meta_path):
        with open(meta_path, "r", encoding="utf-8") as f:
            extra = json.load(f)
    return state, extra
