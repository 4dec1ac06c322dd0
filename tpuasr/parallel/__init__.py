"""Parallelism over a jax.sharding.Mesh.

The reference's only parallelism was single-node nn.DataParallel (SURVEY.md
section 2.3); the TPU rebuild makes data-parallel first-class over a device
mesh with XLA collectives riding ICI, and keeps a (data, model) 2-D mesh so
model-axis sharding can be enabled without restructuring (model axis size 1
for these AM sizes).
"""

from tpuasr.parallel.mesh import (batch_sharding, make_mesh,
                                  replicated_sharding, shard_batch)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch"]
