"""Device mesh + sharding helpers.

Data-parallel training: batch arrays sharded over the "data" axis, parameters
replicated; under jit, XLA inserts the gradient all-reduce (psum) over ICI.
No NCCL/MPI equivalent is needed — the mesh + shardings ARE the comm layer
(SURVEY.md section 5, distributed-communication row).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """2-D (data, model) mesh. Defaults to all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    dev = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(dev, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place numpy batch arrays onto the mesh, batch-dim sharded.

    Arrays whose batch dim doesn't divide the data axis are replicated (e.g.
    a ragged final batch in eval) — correct, just not distributed.
    """
    n_data = mesh.shape[DATA_AXIS]
    sh = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            ok = v.ndim >= 1 and v.shape[0] % n_data == 0
            out[k] = jax.device_put(v, sh if ok else rep)
        else:
            out[k] = v
    return out
