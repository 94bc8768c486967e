"""Device-resident training dataset cache.

Decode the training set ONCE, stage it in HBM (compact dtypes: f16 images +
uint8 masks by default), and assemble every batch with an on-device gather
from a host-chosen permutation. Per-step NIfTI decode and host->device
transfer disappear from the training hot loop entirely — the input pipeline
the reference re-runs every step (reference: src/datasets/hecktor21.py:237-298
feeding torch DataLoader workers) collapses to one integer-index upload per
step. HECKTOR21-sized sets are ~1.2 GB in f16 against 16 GB HBM/chip.

Batch order is bit-identical to :class:`~..data.loader.HostLoader` for the
same ``(seed, shuffle, drop_last)``: both draw the epoch permutation from
``np.random.Philox(key=[seed, epoch])``, so switching a run between the two
input paths changes neither the sample schedule nor (at f32 store dtype) the
losses — pinned by tests/test_device_cache.py.

Host-side RANDOM transforms cannot be baked into a decode-once cache (they
must re-randomize per epoch); datasets carrying one are rejected at
construction. Deterministic host transforms are applied during the one-time
decode; on-device normalization/augmentation stays inside the train jit where
it re-randomizes per step.

Two store layouts:

- **replicated** (default): every device holds the whole set; any global
  permutation works and batch order is HostLoader-identical. Right up to a
  few GB (HECKTOR21 ≈ 1.2 GB f16 vs 16 GB HBM/chip).
- **sharded** (``shard_store=True``): samples shard over the mesh ``data``
  axis and each device samples only from its local shard (the distributed-
  sampler discipline) via a ``shard_map``-wrapped local gather — no
  collectives, 1/N HBM per chip. Batch COMPOSITION necessarily differs from
  the replicated/host path (each batch takes batch/N samples per shard), and
  when the dataset size is not divisible by the shard count the wrap padding
  repeats the leading ``pad`` samples (``i % n``) — a fixed, deterministic
  over-sampling of those cases every epoch (same trade the classic
  distributed sampler makes). Per-epoch permutations stay
  Philox-deterministic.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..utils.logger import get_logger
from ..parallel.mesh import DATA_AXIS, batch_sharding, data_axis_size, replicated


def _rejects_host_random_transform(dataset) -> None:
    t = getattr(dataset, "transform", None)
    if t is None:
        return
    geom = bool(getattr(t, "geom_aug", False))
    host_int = bool(getattr(t, "intensity_aug", False)) and not bool(
        getattr(t, "on_device", False)
    )
    if geom or host_int:
        which = "geometric" if geom else "intensity"
        raise ValueError(
            f"[device_cache] dataset transform performs host-side {which} "
            f"augmentation, which cannot be baked into a decode-once device "
            f"cache (it must re-randomize every epoch). Use on-device "
            f"augmentation (transform on_device=True) or the host loader."
        )


class DeviceCachedLoader:
    """Iterable over device-resident batches of a map-style dataset.

    Drop-in for :class:`HostLoader` on the training path: each ``__iter__``
    advances the epoch and yields ``{"image", "label", "_n_valid"}`` batches
    whose array fields are already jax.Arrays, batch-sharded over the mesh's
    data axis (replicated stores + a jitted gather with sharded out_shardings).
    """

    device_resident = True

    def __init__(
        self,
        dataset,
        *,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = False,
        seed: int = 0,
        mesh=None,
        image_dtype=np.float16,
        label_dtype=np.uint8,
        num_workers: int = 8,
        shard_store: bool = False,
        logger=None,
        **_ignored: Any,
    ):
        _rejects_host_random_transform(dataset)
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = bool(shuffle)
        self.drop_last = bool(drop_last)
        self.seed = int(seed)
        self.mesh = mesh
        self.logger = logger or get_logger()
        self._epoch = -1

        n = len(dataset)
        if n == 0:
            raise ValueError("[device_cache] dataset is empty")
        if self.drop_last and n < self.batch_size:
            raise ValueError(
                f"[device_cache] batch_size ({self.batch_size}) exceeds the "
                f"dataset ({n} cases) with drop_last=True — every epoch would "
                f"silently train zero steps"
            )

        self.shard_store = bool(shard_store) and mesh is not None and data_axis_size(mesh) > 1
        if self.shard_store:
            shards = data_axis_size(mesh)
            if self.batch_size % shards:
                raise ValueError(
                    f"[device_cache] shard_store needs batch_size ({self.batch_size}) "
                    f"divisible by the data axis ({shards})"
                )
            if not self.drop_last:
                raise ValueError(
                    "[device_cache] shard_store requires drop_last=True (a ragged "
                    "tail would interleave padding inside shard segments, breaking "
                    "the leading-rows-valid contract of _n_valid)"
                )

        # ---- one-time decode (threaded: NIfTI inflate releases the GIL) ----
        if hasattr(dataset, "set_epoch"):
            dataset.set_epoch(0)  # transforms here are deterministic (checked)
        workers = max(1, int(num_workers))
        # decode sample 0 to learn shapes, then preallocate the compact-dtype
        # stores and have workers write rows IN PLACE — peak host RAM stays at
        # the store size (a list of float32 samples + np.stack + astype would
        # transiently hold ~3x the f32 footprint, ~6x the f16 store)
        s0 = dataset[0]
        img0 = np.asarray(s0["image"])
        lbl0 = np.asarray(s0["label"])
        images = np.empty((n,) + img0.shape, image_dtype)
        labels = np.empty((n,) + lbl0.shape, label_dtype)
        images[0] = img0
        labels[0] = lbl0
        del s0, img0, lbl0

        def decode_into(i: int) -> None:
            s = dataset[int(i)]
            images[i] = np.asarray(s["image"])
            labels[i] = np.asarray(s["label"])

        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(decode_into, range(1, n)))

        # ---- stage in HBM ----
        if self.shard_store:
            # samples shard over the data axis: pad N up to a multiple of the
            # shard count by WRAPPING (row i pads with real sample i % n, so
            # padding rows are valid training data, merely re-sampled).
            # Staging is per-device-shard from VIEWS of the host store — a
            # global fancy-index copy would transiently double host RAM for
            # exactly the datasets this mode exists for; only the wrapped
            # tail shard materializes a copy.
            shards = data_axis_size(mesh)
            per_shard = -(-n // shards)
            self._per_shard = per_shard
            total = shards * per_shard
            store_sh = NamedSharding(mesh, P(DATA_AXIS))

            def rows_for(arr, sl):
                start, stop = int(sl.start or 0), int(sl.stop)
                if stop <= n:
                    return arr[start:stop]
                return arr[np.arange(start, stop) % n]

            def stage_sharded(arr):
                shape = (total,) + arr.shape[1:]
                dmap = store_sh.devices_indices_map(shape)
                singles = [
                    jax.device_put(np.ascontiguousarray(rows_for(arr, ind[0])), dev)
                    for dev, ind in dmap.items()
                ]
                return jax.make_array_from_single_device_arrays(shape, store_sh, singles)

            self._images = stage_sharded(images)
            self._labels = stage_sharded(labels)
            replicas = 1
        elif mesh is not None:
            rep = replicated(mesh)
            self._images = jax.device_put(images, rep)
            self._labels = jax.device_put(labels, rep)
            replicas = mesh.size
        else:
            self._images = jax.device_put(images)
            self._labels = jax.device_put(labels)
            replicas = 1

        gib = (images.nbytes + labels.nbytes) / 2**30
        self.logger.info(
            f"[device_cache] staged {n} cases on device "
            f"({'sharded' if self.shard_store else f'{replicas} replica(s)'}): "
            f"image {images.shape} {images.dtype}, label {labels.shape} "
            f"{labels.dtype} ({gib:.2f} GiB total)"
        )

        # the one-time decode routed through the dataset's own in-memory
        # decode cache (when dataset.cache_in_memory is also set) — those
        # host-side float32 copies are dead weight now that every batch
        # comes from HBM, so release them (the disk cache has no RAM cost
        # and is left alone)
        ds_cache = getattr(dataset, "_cache", None)
        if ds_cache is not None and hasattr(ds_cache, "clear"):
            ds_cache.clear()

        # ---- jitted batch gather ----
        if self.shard_store:
            # shard-local gather: each device takes its batch rows from ITS
            # sample block — no cross-device traffic at all
            def local_gather(store_img, store_lbl, idx):
                return jnp.take(store_img, idx, axis=0), jnp.take(store_lbl, idx, axis=0)

            self._gather = jax.jit(
                jax.shard_map(
                    local_gather,
                    mesh=mesh,
                    in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
                    out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                )
            )
            self._idx_sharding = NamedSharding(mesh, P(DATA_AXIS))
        else:
            out_sh = batch_sharding(mesh) if mesh is not None else None

            def gather(store_img, store_lbl, idx):
                return jnp.take(store_img, idx, axis=0), jnp.take(store_lbl, idx, axis=0)

            self._gather = jax.jit(
                gather, out_shardings=(out_sh, out_sh) if out_sh is not None else None
            )

    # -- HostLoader-compatible surface --------------------------------------
    def __len__(self) -> int:
        if self.shard_store:
            return self._per_shard // (self.batch_size // data_axis_size(self.mesh))
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch) - 1  # next __iter__ lands on `epoch`

    def _epoch_order(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n)
        rng = np.random.Generator(np.random.Philox(key=[self.seed, epoch]))
        return rng.permutation(n)

    # -----------------------------------------------------------------------
    def __iter__(self) -> Iterator[Dict[str, Any]]:
        self._epoch += 1
        if self.shard_store:
            yield from self._iter_sharded(self._epoch)
            return
        order = self._epoch_order(self._epoch)
        n = len(order)
        bs = self.batch_size
        nb = n // bs if self.drop_last else (n + bs - 1) // bs
        multiple = data_axis_size(self.mesh) if self.mesh is not None else 1

        for b in range(nb):
            idxs = order[b * bs : (b + 1) * bs]
            n_valid = len(idxs)
            # pad the index vector (not the volumes) up to the mesh multiple;
            # duplicate gathers are cheap and masked out via _n_valid
            pad_to = ((n_valid + multiple - 1) // multiple) * multiple
            if pad_to != n_valid:
                idxs = np.concatenate([idxs, np.zeros(pad_to - n_valid, idxs.dtype)])
            img, lbl = self._gather(self._images, self._labels, jnp.asarray(idxs, jnp.int32))
            yield {"image": img, "label": lbl, "_n_valid": n_valid}

    def _iter_sharded(self, epoch: int) -> Iterator[Dict[str, Any]]:
        """Distributed-sampler epoch: each shard draws an independent Philox
        permutation of its LOCAL rows; batch k concatenates every shard's
        k-th local slice (the index vector is itself data-sharded, so each
        segment lands on the device whose rows it names)."""
        shards = data_axis_size(self.mesh)
        bsl = self.batch_size // shards
        m = self._per_shard
        if self.shuffle:
            # Philox takes a 2-word key; fold the shard id into the first word
            perms = [
                np.random.Generator(
                    np.random.Philox(key=[self.seed + 0x9E3779B9 * (d + 1), epoch])
                ).permutation(m)
                for d in range(shards)
            ]
        else:
            perms = [np.arange(m)] * shards
        for b in range(m // bsl):
            local = np.concatenate([p[b * bsl : (b + 1) * bsl] for p in perms])
            idx = jax.device_put(local.astype(np.int32), self._idx_sharding)
            img, lbl = self._gather(self._images, self._labels, idx)
            yield {"image": img, "label": lbl, "_n_valid": self.batch_size}
