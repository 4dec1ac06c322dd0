"""Pallas DMA-ring row gather for HBM-resident decoding-graph tables.

The graph-constrained device beam (tpuasr/decode/prefix_beam.py) fetches
one packed (2C,) table row per live beam per frame: (B*K) scattered rows
from an (S, 2C) HBM table, S ~ 58k at bench scale. XLA lowers this to a
dynamic gather whose row fetches are only shallowly pipelined (measured
~87 ns/row at B=128, K=8 — ~3 GB/s effective, 250x under the HBM
roofline; the fetch is LATENCY-bound, 512 B/row). This kernel issues the
row copies itself as a ring of ``DEPTH`` outstanding async DMAs, so row
latency is overlapped ``DEPTH`` deep instead of whatever the XLA gather
emitter chose.

This is the per-step inner op of the scan — it must not assume it can
keep the table resident (S=58k packed f32 is ~30 MB, VMEM is ~16 MB);
the table stays in HBM (``memory_space=ANY``) and only the gathered
(N, 2C) result lands in VMEM.

Opt-in via ``ctc_beam_search``'s ``graph_gather_impl="pallas"`` (default
"xla"); keep the default until a chip A/B shows a win (KERNELS.md §8 —
the rest of the graph search stays XLA by design).

Reference context: SURVEY.md §2.2 — the reference's latgen walk is a
host-side pointer chase; this is its TPU analog's memory system.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEPTH = 16     # outstanding DMAs; 8 KiB in flight at 2C=128 f32


def _gather_kernel(idx_ref, table_ref, out_ref, sems):
    """idx_ref: (N,) int32 scalar-prefetch; table_ref: (S, W) in HBM;
    out_ref: (N, W) VMEM; sems: (DEPTH,) DMA semaphores."""
    n = out_ref.shape[0]

    def row_copy(i):
        return pltpu.make_async_copy(
            table_ref.at[idx_ref[i]],
            out_ref.at[i],
            sems.at[jax.lax.rem(i, _DEPTH)])

    def issue(i, carry):
        # Ring slot reuse: before issuing on slot i % DEPTH, retire the
        # copy DEPTH iterations back that used the same semaphore. The
        # wait descriptor must match the original's byte count — all rows
        # are (W,) so any row-shaped descriptor on that slot does.
        @pl.when(i >= _DEPTH)
        def _retire():
            row_copy(i - _DEPTH).wait()
        row_copy(i).start()
        return carry

    jax.lax.fori_loop(0, n, issue, 0)

    def drain(i, carry):
        row_copy(i).wait()
        return carry

    jax.lax.fori_loop(max(0, n - _DEPTH), n, drain, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(table, idx, *, interpret: bool | None = None):
    """``table[idx]`` for int32 row indices, via a DMA ring.

    table: (S, W) — W must tile the lane width (128 f32 at bench shapes).
    idx:   (...,) int32 in [0, S).
    Returns (..., W) with ``table``'s dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = idx.shape
    idx_flat = idx.reshape(-1).astype(jnp.int32)
    n = idx_flat.shape[0]
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_DEPTH,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n, table.shape[1]), table.dtype),
        interpret=interpret,
    )(idx_flat, table)
    return out.reshape(*shape, table.shape[1])
