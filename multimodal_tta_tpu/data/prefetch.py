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
) -> Iterator[Dict[str, Any]]:
    """Yields batches with array fields already on device (sharded over the
    mesh when given) plus ``_n_valid`` = the un-padded batch size."""
    depth = max(1, int(depth))
    multiple = data_axis_size(mesh) if mesh is not None else 1

    def put(batch: Dict[str, Any]) -> Dict[str, Any]:
        present = [k for k in array_keys if k in batch]
        n = int(np.asarray(batch[present[0]]).shape[0]) if present else 0
        padded, n_valid = pad_batch_to_multiple(batch, multiple, array_keys=present)
        out = dict(batch)
        if mesh is not None:
            # only the model-input arrays go to device (metadata fields like
            # center_id are host-side and may not divide the mesh)
            sharded = shard_batch({k: padded[k] for k in present}, mesh)
            out.update(sharded)
        else:
            import jax

            for k in present:
                out[k] = jax.device_put(np.asarray(padded[k]))
        out["_n_valid"] = n_valid if present else n
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
