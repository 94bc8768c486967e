"""AOT serving artifacts: the jitted serving step as a portable program.

``jax.export`` lowers a jitted function to versioned StableHLO with
backwards-compatibility guarantees, serializes it to bytes, and replays it
on any machine with a matching XLA backend — the deployment runtime needs
jax (for the runtime only), but none of this framework's model code, flax,
optax, or checkpoint machinery. The reference framework has no analogue:
its "deployment" is a live torch process re-running Python per batch
(reference: src/evaluation/seg_eval.py:239-399).

Two artifact modes:

- **forward** (`export_forward_serving`): ``probs = call(image)``. The
  checkpoint's parameters are baked into the program as constants — one
  file is the whole deployment.
- **adapt** (`export_adapt_serving`): the fused Tent adapt+segment step
  (tta/tent.py:_build_adapt_step) exported as a PURE function over FLAT
  argument lists::

      (*state_leaves, image, rng, n_valid, ent_floor)
          -> (*state_leaves', entropies, prediction)

  The runtime threads ``state_leaves`` batch to batch (continual serving)
  or re-feeds the initial leaves (episodic — the step also re-inits its
  optimizer internally in episodic mode). Flattening is the point: pytree
  structures (flax FrozenDict, optax ScaleByAdamState, ...) exist only at
  export time; the artifact consumes and returns positional arrays, so the
  deployment loop is framework-free. The initial state leaves ship inside
  the artifact as an npz section.

Artifact file layout (single file)::

    magic "MTTASRV1" | u32 header_len | header JSON (utf-8)
    | u64 prog_len | serialized jax.export bytes
    | u64 state_len | npz of initial state leaves (adapt mode; 0 otherwise)

Multi-platform: artifacts are lowered for ``platforms`` (default
``("tpu", "cpu")``) at export time — no TPU is needed to produce a
TPU-servable artifact, and the same file smoke-tests on a CPU host.
"""

from __future__ import annotations

import io
import json
import struct
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

MAGIC = b"MTTASRV1"
FORMAT_VERSION = 1


def _sds(shape, dtype) -> jax.ShapeDtypeStruct:
    return jax.ShapeDtypeStruct(tuple(int(s) for s in shape), jnp.dtype(dtype))


def _leaf_spec(x) -> jax.ShapeDtypeStruct:
    return jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))


def _spec_meta(s: jax.ShapeDtypeStruct) -> dict:
    return {"shape": list(s.shape), "dtype": str(np.dtype(s.dtype))}


# ---------------------------------------------------------------------------
# exporters
# ---------------------------------------------------------------------------
def export_forward_serving(
    probs_fn,
    image_shape: Sequence[int],
    image_dtype=jnp.float32,
    *,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> Tuple[Any, dict]:
    """Export ``probs_fn(image) -> probabilities`` (params baked in).

    ``probs_fn`` is any traceable closure over the trained state — e.g.
    ``lambda img: strategy._probs_fn(state)(img)[1]`` — so flip-TTA or
    normalization folded into it is exported too.
    """
    spec = _sds(image_shape, image_dtype)
    exported = jax_export.export(jax.jit(probs_fn), platforms=tuple(platforms))(spec)
    meta = {
        "format_version": FORMAT_VERSION,
        "mode": "forward",
        "platforms": list(exported.platforms),
        "n_state": 0,
        "args": [{"name": "image", **_spec_meta(spec)}],
        "jax_version": jax.__version__,
    }
    return exported, meta


def export_adapt_serving(
    adapter,
    source_state,
    image_shape: Sequence[int],
    image_dtype=jnp.float32,
    *,
    threshold: float,
    predict_mode: Optional[str] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> Tuple[Any, dict, List[np.ndarray]]:
    """Export the fused adapt+segment step of a ``TentAdapter``.

    Returns (Exported, meta, initial_state_leaves). The exported signature
    is flat (see module docstring); outputs are the updated state leaves in
    the same order, then the per-step entropy trace [steps] and the uint8
    prediction batch.
    """
    if getattr(adapter, "fisher_enabled", False):
        raise ValueError(
            "[serving] EATA's Fisher anchor accumulates its weights host-side "
            "across batches (tta/tent.py:_maybe_accumulate_fisher) — that "
            "stateful estimation cannot live inside a pure exported program. "
            "Export with tta.fisher.enabled=false (the gate and all in-step "
            "defenses export fine)."
        )
    if getattr(adapter, "mesh", None) is not None:
        raise ValueError(
            "[serving] export is the single-chip serving artifact; build the "
            "adapter with mesh=None (per-chip deployment replicates the "
            "artifact, it does not shard it)."
        )

    mode = (predict_mode or adapter.predict_mode).lower()
    if not hasattr(adapter, "serving_export_spec"):
        raise ValueError(
            f"[serving] {type(adapter).__name__} does not implement the "
            "serving_export_spec protocol (tent/cotta/sar/eata do)"
        )
    call, state0 = adapter.serving_export_spec(source_state, float(threshold), mode)
    state_leaves, state_tree = jax.tree_util.tree_flatten(state0)
    n_state = len(state_leaves)

    image_spec = _sds(image_shape, image_dtype)
    rng_spec = _leaf_spec(jax.random.PRNGKey(0))
    n_valid_spec = _sds((), jnp.int32)
    floor_spec = _sds((), jnp.float32)

    def flat_fn(*args):
        st = jax.tree_util.tree_unflatten(state_tree, args[:n_state])
        image, rng, n_valid, ent_floor = args[n_state:]
        st_out, ents, pred = call(st, image, rng, n_valid, ent_floor)
        out_leaves, out_tree = jax.tree_util.tree_flatten(st_out)
        if out_tree != state_tree:  # the step preserves every carried structure
            raise AssertionError("adapt step changed the state tree structure")
        return tuple(out_leaves) + (ents, pred)

    specs = tuple(_leaf_spec(l) for l in state_leaves) + (
        image_spec,
        rng_spec,
        n_valid_spec,
        floor_spec,
    )
    exported = jax_export.export(jax.jit(flat_fn), platforms=tuple(platforms))(*specs)

    meta = {
        "format_version": FORMAT_VERSION,
        "mode": "adapt",
        "platforms": list(exported.platforms),
        "n_state": n_state,
        "predict_mode": mode,
        "threshold": float(threshold),
        "steps": int(adapter.steps),
        "episodic": bool(adapter.episodic),
        "args": [
            *({"name": f"state_{i}", **_spec_meta(s)} for i, s in enumerate(specs[:n_state])),
            {"name": "image", **_spec_meta(image_spec)},
            {"name": "rng", **_spec_meta(rng_spec)},
            {"name": "n_valid", **_spec_meta(n_valid_spec)},
            {"name": "ent_floor", **_spec_meta(floor_spec)},
        ],
        "outputs": "state_leaves (n_state) + entropies[steps] + pred uint8",
        "jax_version": jax.__version__,
    }
    return exported, meta, [np.asarray(l) for l in state_leaves]


# ---------------------------------------------------------------------------
# artifact file IO
# ---------------------------------------------------------------------------
def save_artifact(
    path: str,
    exported,
    meta: dict,
    state_leaves: Optional[Sequence[np.ndarray]] = None,
) -> None:
    prog = exported.serialize()
    state_blob = b""
    if state_leaves:
        buf = io.BytesIO()
        np.savez(buf, **{f"leaf_{i:06d}": np.asarray(l) for i, l in enumerate(state_leaves)})
        state_blob = buf.getvalue()
    header = json.dumps(meta, sort_keys=True).encode("utf-8")
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(struct.pack("<Q", len(prog)))
        f.write(prog)
        f.write(struct.pack("<Q", len(state_blob)))
        f.write(state_blob)


class ServingArtifact:
    """A loaded artifact: ``call(*flat_args)`` plus metadata.

    For adapt-mode artifacts the serving loop is::

        art = load_artifact(path)
        state = art.initial_state()              # list of np arrays
        for image in stream:
            rng = np.asarray(jax.random.PRNGKey(step_no))
            *state, ents, pred = art.call(*state, image, rng,
                                          np.int32(B), np.float32(np.nan))
    """

    def __init__(self, exported, meta: dict, state_blob: bytes):
        self._exported = exported
        self.meta = meta
        self._state_blob = state_blob

    @property
    def platforms(self) -> Tuple[str, ...]:
        return tuple(self._exported.platforms)

    @property
    def n_state(self) -> int:
        return int(self.meta.get("n_state", 0))

    def initial_state(self) -> List[np.ndarray]:
        if not self._state_blob:
            return []
        with np.load(io.BytesIO(self._state_blob)) as z:
            return [z[k] for k in sorted(z.files)]

    def call(self, *args):
        return self._exported.call(*args)


def load_artifact(path: str) -> ServingArtifact:
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"[serving] {path}: not a serving artifact (magic {magic!r})")
        (hlen,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(hlen).decode("utf-8"))
        (plen,) = struct.unpack("<Q", f.read(8))
        prog = f.read(plen)
        (slen,) = struct.unpack("<Q", f.read(8))
        state_blob = f.read(slen) if slen else b""
    exported = jax_export.deserialize(prog)
    return ServingArtifact(exported, meta, state_blob)
