"""Host->device prefetching.

Keeps ``depth`` batches ahead of the consumer: padding + sharding +
``jax.device_put`` are issued for batch k+1 while the jitted step for batch k
is still executing (device_put is asynchronous), so H2D transfer rides under
compute instead of serializing after each step. Combined with HostLoader's
threaded decode this pipelines disk -> decode -> H2D -> step.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Dict, Iterable, Iterator, Sequence

import numpy as np

from ..parallel.mesh import data_axis_size, pad_batch_to_multiple, shard_batch


def prefetch_to_device(
    iterable: Iterable[Dict[str, Any]],
    mesh=None,
    *,
    depth: int = 2,
    array_keys: Sequence[str] = ("image", "label"),
    image_transfer_dtype=None,
    label_transfer_dtype=None,
) -> Iterator[Dict[str, Any]]:
    """Yields batches with array fields already on device (sharded over the
    mesh when given) plus ``_n_valid`` = the un-padded batch size.

    Transfer dtypes compress the H2D stream (e.g. float16 images + uint8
    labels quarter the bytes); consumers upcast on device. Labels here are
    binary/region masks or small integer id maps, both exact in uint8.
    """
    depth = max(1, int(depth))
    multiple = data_axis_size(mesh) if mesh is not None else 1

    def compress(key, arr):
        arr = np.asarray(arr)
        if key == "image" and image_transfer_dtype is not None:
            return arr.astype(image_transfer_dtype)
        if key == "label" and label_transfer_dtype is not None:
            return arr.astype(label_transfer_dtype)
        return arr

    def put(batch: Dict[str, Any]) -> Dict[str, Any]:
        present = [k for k in array_keys if k in batch]
        n = int(np.asarray(batch[present[0]]).shape[0]) if present else 0
        padded, n_valid = pad_batch_to_multiple(batch, multiple, array_keys=present)
        out = dict(batch)
        compressed = {k: compress(k, padded[k]) for k in present}
        if mesh is not None:
            # only the model-input arrays go to device (metadata fields like
            # center_id are host-side and may not divide the mesh)
            out.update(shard_batch(compressed, mesh))
        else:
            import jax

            for k in present:
                out[k] = jax.device_put(compressed[k])
        # an incoming batch may ALREADY carry _n_valid (DeviceCachedLoader
        # pads index vectors with duplicate rows that look like real samples
        # to pad_batch_to_multiple) — the true count is the minimum of the
        # two, never the recomputed one alone
        n_valid = n_valid if present else n
        if "_n_valid" in batch:
            n_valid = min(n_valid, int(batch["_n_valid"]))
        out["_n_valid"] = n_valid
        return out

    queue: deque = deque()
    it = iter(iterable)
    try:
        while True:
            while len(queue) < depth:
                queue.append(put(next(it)))
            yield queue.popleft()
    except StopIteration:
        while queue:
            yield queue.popleft()
