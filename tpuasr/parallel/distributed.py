"""Multi-host initialization (forward-looking; the reference had nothing
beyond single-node DataParallel — SURVEY.md section 2.3).

On a multi-host TPU slice, call ``maybe_initialize()`` once at program start:
it invokes ``jax.distributed.initialize`` when the standard TPU/JAX cluster
environment is present and is a no-op otherwise (single host, this sandbox).
After initialization, ``tpuasr.parallel.make_mesh`` over ``jax.devices()``
spans the whole slice; data-parallel gradient psums ride ICI within a slice
and DCN across slices — no further code changes are needed because every
collective is expressed through shardings, not point-to-point calls.
"""

from __future__ import annotations

import os

import jax

_CLUSTER_VARS = ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                 "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")


def maybe_initialize(force: bool = False) -> bool:
    """Initialize jax.distributed if a cluster env is detected.

    Returns True if distributed mode is active.
    """
    if jax.process_count() > 1:
        return True
    if not force and not any(os.environ.get(v) for v in _CLUSTER_VARS):
        return False
    try:
        jax.distributed.initialize()
        return jax.process_count() > 1
    except Exception:
        if force:
            raise
        return False


def process_batch_slice(global_batch: int) -> tuple[int, int]:
    """(per-process batch, process index) for host-sharded data loading."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    return global_batch // n, jax.process_index()
