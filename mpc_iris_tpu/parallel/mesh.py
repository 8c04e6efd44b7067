"""Device mesh construction for the match workload.

Axes:
- ``"db"``: shards the template-database entry axis (the big axis — millions of
  entries; the reference's rayon par_iter axis, src/lib.rs:44-51).
- ``"batch"``: shards the query batch (data parallel).

The K = 12,800 contraction always stays within one chip (SURVEY.md: no tensor
parallelism needed), so collectives only carry per-query winner triples and reply
tensors, never share planes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int, batch_size: int | None = None) -> tuple[int, int]:
    """Pick (db, batch) axis sizes for ``n_devices``.

    The DB axis gets all devices unless the query batch is large enough to warrant
    splitting; batch axis sizes must divide the batch.
    """
    if batch_size is None or batch_size <= 1 or n_devices <= 1:
        return n_devices, 1
    batch_axis = 1
    for cand in (4, 2):
        if n_devices % cand == 0 and batch_size % cand == 0 and n_devices >= 2 * cand:
            batch_axis = cand
            break
    return n_devices // batch_axis, batch_axis


def make_mesh(db: int | None = None, batch: int = 1, devices=None) -> Mesh:
    """Build a [db, batch] mesh over the given (or all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    if db is None:
        db = len(devices) // batch
    if db * batch != len(devices):
        devices = devices[: db * batch]
    arr = np.array(devices).reshape(db, batch)
    return Mesh(arr, axis_names=("db", "batch"))
