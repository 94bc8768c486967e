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
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.logger import get_logger
from ..parallel.mesh import batch_sharding, data_axis_size, replicated


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

        # ---- one-time decode (threaded: NIfTI inflate releases the GIL) ----
        if hasattr(dataset, "set_epoch"):
            dataset.set_epoch(0)  # transforms here are deterministic (checked)
        workers = max(1, int(num_workers))
        with ThreadPoolExecutor(max_workers=workers) as pool:
            samples = list(pool.map(lambda i: dataset[int(i)], range(n)))

        images = np.stack([np.asarray(s["image"]) for s in samples]).astype(image_dtype)
        labels = np.stack([np.asarray(s["label"]) for s in samples]).astype(label_dtype)

        # ---- stage in HBM, replicated over the mesh ----
        if mesh is not None:
            rep = replicated(mesh)
            self._images = jax.device_put(images, rep)
            self._labels = jax.device_put(labels, rep)
        else:
            self._images = jax.device_put(images)
            self._labels = jax.device_put(labels)

        gib = (images.nbytes + labels.nbytes) / 2**30
        self.logger.info(
            f"[device_cache] staged {n} cases on device: "
            f"image {images.shape} {images.dtype}, label {labels.shape} "
            f"{labels.dtype} ({gib:.2f} GiB/replica)"
        )

        # ---- jitted batch gather, output sharded over the data axis ----
        out_sh = batch_sharding(mesh) if mesh is not None else None

        def gather(store_img, store_lbl, idx):
            return jnp.take(store_img, idx, axis=0), jnp.take(store_lbl, idx, axis=0)

        self._gather = jax.jit(
            gather, out_shardings=(out_sh, out_sh) if out_sh is not None else None
        )

    # -- HostLoader-compatible surface --------------------------------------
    def __len__(self) -> int:
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
