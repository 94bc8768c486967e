"""Pipeline parallelism over the mesh ``stage`` axis (GPipe-style).

The reference has no model parallelism of any kind (its only multi-device
path is torch DataParallel, reference src/core/experiment_manager.py:95-96).
This module completes the framework's parallelism matrix (dp × sp × tp × pp):
the repeated-block trunk of a transformer is split into S contiguous layer
groups, one per device along the ``stage`` mesh axis, and microbatches flow
through the stages in the classic (n_micro + S - 1)-tick schedule.

TPU-first design — the whole pipeline is ONE jitted SPMD program:
  - ``shard_map`` over the mesh gives each device its stage's stacked layer
    parameters (leading layer axis sharded over ``stage``); per-stage layers
    run under ``lax.scan`` so the program size is O(1) in depth.
  - The inter-stage hop is ``lax.ppermute`` to the next stage — with
    ``stage`` as the LAST mesh axis (parallel/mesh.py make_mesh) those are
    nearest-neighbor ICI transfers.
  - The tick loop is itself a ``lax.scan`` with static bounds: no Python
    control flow, one compilation, and XLA overlaps each tick's ppermute
    with the next tick's compute where the schedule allows.
  - Bubble fraction is the usual (S-1)/(n_micro + S - 1): callers pick
    n_micro >= S (more microbatches, smaller bubble, same math).
  - TRAINING: the schedule is differentiable — ``lax.scan``'s transpose is
    the reverse-tick scan and ``ppermute``'s transpose is the backward hop,
    so jax.grad through ``pipeline_apply`` IS the GPipe backward (microbatch
    grad accumulation happens inside the scan transpose; ``remat=True``
    gives GPipe's stash-inputs/recompute-intermediates activation policy).
    ``pipeline_value_and_grad`` / ``make_pipeline_train_step`` package this
    with stage-sharded optimizer state; sequential-parity of loss AND grads
    is asserted in tests/test_pipeline.py and the driver dryrun.

Composability: the data/space axes stay available inside the shard_map (the
microbatch dim is sharded over ``data``), so dp×pp meshes work unchanged.
Numerics match the sequential model bit-for-bit in f32 tests
(tests/test_pipeline.py) because stages apply the same layers in the same
order — the schedule only changes WHEN each layer runs.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS, STAGE_AXIS


def stack_layer_params(params: Dict[str, Any], prefix: str, n_layers: int):
    """Stack per-layer param subtrees ``{prefix}0 .. {prefix}{n-1}`` into one
    tree with a leading layer axis — the layout the pipeline shards over
    ``stage`` (and ``lax.scan`` consumes within a stage)."""
    layers = []
    for i in range(n_layers):
        key = f"{prefix}{i}"
        if key not in params:
            raise KeyError(f"layer params {key!r} not found")
        layers.append(params[key])
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def pipeline_apply(
    mesh,
    layer_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params,
    x: jnp.ndarray,
    *,
    n_micro: int,
    data_axis: Optional[str] = DATA_AXIS,
    remat: bool = False,
):
    """Run ``layer_fn`` over all stacked layers, pipelined over the mesh
    ``stage`` axis.

    mesh: a Mesh carrying a ``stage`` axis (make_mesh(stage=S)).
    layer_fn(layer_params, x) -> y: applies ONE layer (shape-preserving).
    stacked_params: tree with leading layer axis L (stack_layer_params);
        L must divide by the stage count S.
    x: [batch, ...] activations; batch must divide by n_micro (and the
        microbatch by the mesh data extent when a data axis is present).
    n_micro: number of microbatches (>= S for a useful bubble fraction).
    remat: rematerialize each layer in the backward (GPipe's activation
        policy — stash only the layer INPUTS per tick, re-run the forward
        inside the transposed scan; bounds the activation memory of
        training at ~1/L of full stash for the cost of one extra forward).

    Returns y with x's shape: identical math to applying layers 0..L-1
    sequentially.

    Differentiable: the tick schedule is a ``lax.scan`` whose transpose is
    the reverse-tick scan, and the inter-stage ``ppermute`` transposes to
    the backward hop — so ``jax.grad`` through this function IS the GPipe
    backward schedule (activation grads flow last-stage -> first over the
    same ICI links, and each microbatch's parameter-grad contributions
    accumulate across ticks inside the scan transpose). Parity with the
    sequential stack is asserted in tests/test_pipeline.py.
    """
    S = int(mesh.shape.get(STAGE_AXIS, 1))
    if S <= 1:
        raise ValueError("pipeline_apply requires a mesh with a stage axis > 1")
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if L % S != 0:
        raise ValueError(f"layer count {L} not divisible by {S} stages")
    b = x.shape[0]
    if b % n_micro != 0:
        raise ValueError(f"batch {b} not divisible by n_micro={n_micro}")
    has_data = data_axis is not None and mesh.shape.get(data_axis, 1) > 1
    if has_data:
        d = int(mesh.shape[data_axis])
        if (b // n_micro) % d != 0:
            raise ValueError(
                f"microbatch {b}//{n_micro}={b // n_micro} not divisible by "
                f"the {data_axis} axis extent {d}"
            )

    # [n_micro, mb, ...] microbatch-major layout
    xs = x.reshape((n_micro, b // n_micro) + x.shape[1:])
    x_spec = P(None, data_axis) if has_data else P()
    p_spec = jax.tree_util.tree_map(lambda _: P(STAGE_AXIS), stacked_params)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(p_spec, x_spec),
        out_specs=x_spec,
        check_vma=False,
    )
    def run(p_stage, xs_shard):
        sid = jax.lax.axis_index(STAGE_AXIS)
        n_ticks = n_micro + S - 1

        def stage_fn(h):
            # the S layers of this stage, in order, under one scan
            def body(h, p_layer):
                return layer_fn(p_layer, h), None

            if remat:
                body = jax.checkpoint(body)
            return jax.lax.scan(body, h, p_stage)[0]

        fwd_perm = [(i, i + 1) for i in range(S - 1)]
        zero = jnp.zeros_like(xs_shard[0])
        outs0 = jnp.zeros_like(xs_shard)

        def tick(carry, t):
            recv, outs = carry
            # stage 0 feeds microbatch t (clamped in the drain phase — those
            # ticks' outputs are never collected); later stages consume the
            # activation ppermuted from their predecessor last tick
            feed = jax.lax.dynamic_index_in_dim(
                xs_shard, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
            )
            inp = jnp.where(sid == 0, feed, recv)
            out = stage_fn(inp)
            # the last stage finishes microbatch t-(S-1) at tick t
            w = t - (S - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                outs, out, jnp.clip(w, 0, n_micro - 1), 0
            )
            outs = jnp.where((sid == S - 1) & (w >= 0), upd, outs)
            recv = jax.lax.ppermute(out, STAGE_AXIS, fwd_perm)
            return (recv, outs), None

        (_, outs), _ = jax.lax.scan(tick, (zero, outs0), jnp.arange(n_ticks))
        # results live on the last stage only; zero-mask + psum replicates
        # them across the stage axis (one cheap collective at the end)
        outs = jnp.where(sid == S - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, STAGE_AXIS)

    ys = run(stacked_params, xs)
    return ys.reshape(x.shape)


def pipeline_value_and_grad(
    mesh,
    layer_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params,
    x: jnp.ndarray,
    loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
    *,
    n_micro: int,
    data_axis: Optional[str] = DATA_AXIS,
    remat: bool = True,
):
    """Loss and parameter gradients of ``loss_fn(pipeline_apply(...))`` —
    the GPipe training backward.

    The grad arrives with the same leading-layer-axis layout as
    ``stacked_params`` (sharded ``P(stage)`` under jit on a stage mesh), so
    an optax update applies elementwise with no resharding. ``remat=True``
    (default for training) uses the GPipe activation policy: per-layer
    inputs are stashed, intermediates re-computed in the transposed scan.

    Microbatch gradient accumulation is inherent: ``loss_fn`` sees the full
    re-assembled batch, and the scan transpose sums each microbatch's
    contribution into the per-layer grads — bit-matching the sequential
    full-batch gradient (tests/test_pipeline.py::TestPipelineBackward).
    """

    def _loss(p, xx):
        y = pipeline_apply(
            mesh, layer_fn, p, xx, n_micro=n_micro, data_axis=data_axis,
            remat=remat,
        )
        return loss_fn(y)

    return jax.value_and_grad(_loss)(stacked_params, x)


def make_pipeline_train_step(
    mesh,
    layer_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    optimizer,
    *,
    n_micro: int,
    data_axis: Optional[str] = DATA_AXIS,
    remat: bool = True,
):
    """One jitted GPipe training step over the mesh ``stage`` axis.

    loss_fn(y, target) -> scalar; optimizer: any optax GradientTransformation.
    Returns ``step(stacked_params, opt_state, x, target) -> (params,
    opt_state, loss)`` — compile once, drive the loop from the host. The
    optimizer state lives layer-stacked like the params, so its leaves
    shard ``P(stage)`` too (each stage updates only its own layers; no
    parameter or moment traffic crosses stages — the only inter-stage bytes
    are the activation/grad hops of the schedule itself).
    """

    @jax.jit
    def step(stacked_params, opt_state, x, target):
        loss, grads = pipeline_value_and_grad(
            mesh, layer_fn, stacked_params, x,
            lambda y: loss_fn(y, target),
            n_micro=n_micro, data_axis=data_axis, remat=remat,
        )
        updates, opt_state = optimizer.update(grads, opt_state, stacked_params)
        return optax.apply_updates(stacked_params, updates), opt_state, loss

    return step


def vit_forward_pipelined(model, variables, x: jnp.ndarray, mesh, *, n_micro: int):
    """End-to-end pipelined ViT forward (models/vit.py): embedding and head
    replicated (tiny next to the trunk), the encoder-block trunk pipelined
    over the mesh ``stage`` axis. Returns (cls_features, logits) matching
    ``model.apply(variables, x)`` — asserted bit-level in tests.
    """
    from flax import linen as nn

    from ..models.vit import _SPECS, EncoderBlock

    patch, hidden, depth, heads, mlp_dim = _SPECS[model.variant]
    patch = model.patch if model.patch is not None else patch
    hidden = model.hidden if model.hidden is not None else hidden
    depth = model.depth if model.depth is not None else depth
    heads = model.heads if model.heads is not None else heads
    mlp_dim = model.mlp_dim if model.mlp_dim is not None else mlp_dim
    params = variables["params"]
    dt = model.dtype

    # ---- embedding (replicated math, same modules/params as the model) ----
    b = x.shape[0]
    h = nn.Conv(hidden, (patch, patch), (patch, patch), padding="VALID", dtype=dt,
                ).apply({"params": params["patch_embed"]}, x.astype(dt))
    h = h.reshape(b, -1, hidden)
    cls_tok = jnp.tile(params["cls_token"].astype(dt), (b, 1, 1))
    h = jnp.concatenate([cls_tok, h], axis=1)
    h = h + params["pos_embed"].astype(dt)

    # ---- pipelined trunk ----
    blk = EncoderBlock(hidden, heads, mlp_dim, model.dropout, dtype=dt)
    stacked = stack_layer_params(params, "block", depth)

    def layer_fn(p_layer, tokens):
        return blk.apply({"params": p_layer}, tokens)

    h = pipeline_apply(mesh, layer_fn, stacked, h, n_micro=n_micro)

    # ---- head (replicated) ----
    h = nn.LayerNorm(dtype=dt).apply({"params": params["final_ln"]}, h)
    cls = h[:, 0].astype(jnp.float32)
    logits = nn.Dense(model.num_classes).apply({"params": params["head"]}, cls)
    return cls, logits
