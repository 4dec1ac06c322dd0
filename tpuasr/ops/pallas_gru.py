"""Pallas GRU time-scan kernel with full custom-VJP (BPTT) backward.

Why: the BiRNN recursion dominates the DeepSpeech train step (BASELINE
config #3; SURVEY.md section 7.3 item 4). As `lax.scan`, every timestep
re-streams the (H, 3H) recurrent weight matrix from HBM (~3 MB at H=512 —
~12 GB/epoch-step across layers/directions): the step is HBM-bound. These
kernels hold W_h (and the running hidden state) in VMEM for the WHOLE scan;
per grid step only the T_BLK slab of inputs/outputs moves, double-buffered
by the Pallas pipeline.

Forward:  ys = gru_scan(xp, wh, mask)
  xp   (T, B, 3H)  precomputed input projections x@W_x+b (one big MXU matmul
                   outside), gate order [r, z, n] (torch convention, matches
                   tpuasr.models.layers.GRULayer)
  wh   (H, 3H)     recurrent weights
  mask (T, B, 1)   1.0 valid / 0.0 padding (hidden state freezes on padding)

Backward: one reversed kernel recomputes the gates from (xp, ys) — no gate
stash in HBM — and produces dxp, dwh via MXU contractions, accumulating dwh
in a VMEM scratch across the whole scan.

Shapes must satisfy: B % 8 == 0, H % 128 == 0, T % T_BLK == 0 (the public
wrapper pads and unpads automatically).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _t_blk(B: int, H: int) -> int:
    """Frames per grid step, sized to the VMEM budget: the pipeline holds
    ~2x (double-buffered) xp (T_BLK, B, 3H) + ys (T_BLK, B, H) blocks plus
    the resident (H, 3H) weights and scratch."""
    budget = 10 * 2 ** 20                      # leave headroom under 16 MB
    per_t = B * (4 * H) * 4 * 2                # xp + ys, double-buffered
    return max(1, min(16, budget // max(per_t, 1)))


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _gates(xp_t, hp, H):
    r = jax.nn.sigmoid(xp_t[:, :H] + hp[:, :H])
    z = jax.nn.sigmoid(xp_t[:, H:2 * H] + hp[:, H:2 * H])
    n = jnp.tanh(xp_t[:, 2 * H:] + r * hp[:, 2 * H:])
    return r, z, n


def _fwd_kernel(H, T_BLK, xp_ref, wh_ref, mask_ref, ys_ref, h_scr):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    def body(tt, h):
        hp = jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32)
        r, z, n = _gates(xp_ref[tt].astype(jnp.float32), hp, H)
        h_new = (1.0 - z) * n + z * h
        m = mask_ref[tt]                       # (B, 1)
        h_new = m * h_new + (1.0 - m) * h
        ys_ref[tt] = h_new.astype(ys_ref.dtype)
        return h_new

    h_scr[:] = jax.lax.fori_loop(0, T_BLK, body, h_scr[:])


def _bwd_kernel(H, T_BLK, xp_ref, ysp_ref, wh_ref, mask_ref, dys_ref,
                dxp_ref, dwh_ref, dh_scr, dwh_scr):
    n_tb = pl.num_programs(0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)

    def body(i, dh):
        tt = T_BLK - 1 - i
        h_prev = ysp_ref[tt].astype(jnp.float32)   # h_{t-1} (shifted ys)
        hp = jnp.dot(h_prev, wh_ref[:], preferred_element_type=jnp.float32)
        r, z, n = _gates(xp_ref[tt].astype(jnp.float32), hp, H)
        m = mask_ref[tt]                       # (B, 1)

        dh_tot = dys_ref[tt].astype(jnp.float32) + dh
        dz = dh_tot * (h_prev - n)
        dn_pre = dh_tot * (1.0 - z) * (1.0 - n * n)
        hn = hp[:, 2 * H:]
        dr = dn_pre * hn
        dxr = dr * r * (1.0 - r)
        dxz = dz * z * (1.0 - z)
        # dhp gate-concat; all grads masked (padding steps pass h through).
        dhp = jnp.concatenate([dxr, dxz, dn_pre * r], axis=1) * m
        dxp_ref[tt] = (jnp.concatenate([dxr, dxz, dn_pre], axis=1)
                       * m).astype(dxp_ref.dtype)
        # dh_{t-1} = m*(z*dh + Wh^T dhp) + (1-m)*dh
        dh_rec = dh_tot * z + jax.lax.dot_general(
            dhp, wh_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh_new = m * dh_rec + (1.0 - m) * dh_tot
        # dWh += h_{t-1}^T dhp
        dwh_scr[:] += jax.lax.dot_general(
            h_prev, dhp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dh_new

    dh_scr[:] = jax.lax.fori_loop(0, T_BLK, body, dh_scr[:])

    @pl.when(pl.program_id(0) == n_tb - 1)
    def _():
        dwh_ref[:] = dwh_scr[:]


@functools.lru_cache(maxsize=32)
def _build_fwd(T: int, B: int, H: int, interpret: bool = False,
               dtype: str = "float32"):
    T_BLK = _t_blk(B, H)
    n_tb = T // T_BLK
    io = jnp.dtype(dtype)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, H, T_BLK),
        grid=(n_tb,),
        in_specs=[
            pl.BlockSpec((T_BLK, B, 3 * H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLK, B, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T_BLK, B, H), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), io),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _build_bwd(T: int, B: int, H: int, interpret: bool = False,
               dtype: str = "float32"):
    T_BLK = _t_blk(B, H)
    n_tb = T // T_BLK
    rev = lambda t: (n_tb - 1 - t, 0, 0)
    io = jnp.dtype(dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, H, T_BLK),
        grid=(n_tb,),
        in_specs=[
            pl.BlockSpec((T_BLK, B, 3 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLK, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLK, B, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLK, B, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T_BLK, B, 3 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, 3 * H), io),
            jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((H, 3 * H), jnp.float32)],
        interpret=interpret,
    )


def _pad_args(xp, wh, mask):
    T, B, H3 = xp.shape
    H = H3 // 3
    Bp = _round_up(B, 8)
    Hp = _round_up(H, 128)
    Tp = _round_up(T, _t_blk(Bp, Hp))
    if (Tp, Bp, Hp) == (T, B, H):
        return xp, wh, mask, (T, B, H)
    xp_p = jnp.zeros((Tp, Bp, 3 * Hp), xp.dtype)
    for g in range(3):
        xp_p = xp_p.at[:T, :B, g * Hp:g * Hp + H].set(
            xp[:, :, g * H:(g + 1) * H])
    wh_p = jnp.zeros((Hp, 3 * Hp), wh.dtype)
    for g in range(3):
        wh_p = wh_p.at[:H, g * Hp:g * Hp + H].set(
            wh[:, g * H:(g + 1) * H])
    mask_p = jnp.zeros((Tp, Bp, 1), jnp.float32).at[:T, :B].set(
        mask.astype(jnp.float32))
    return xp_p, wh_p, mask_p, (T, B, H)


@jax.custom_vjp
def gru_scan(xp, wh, mask):
    """GRU over time. xp (T,B,3H), wh (H,3H), mask (T,B,1) -> ys (T,B,H)."""
    return _gru_fwd_impl(xp, wh, mask)


def _gru_fwd_impl(xp, wh, mask):
    xp_p, wh_p, mask_p, (T, B, H) = _pad_args(xp, wh, mask)
    Tp, Bp, H3p = xp_p.shape
    ys = _build_fwd(Tp, Bp, H3p // 3,
                    jax.default_backend() != "tpu",
                    str(xp.dtype))(xp_p, wh_p, mask_p)
    return ys[:T, :B, :H]


def _gru_fwd(xp, wh, mask):
    ys = _gru_fwd_impl(xp, wh, mask)
    return ys, (xp, wh, mask, ys)


def _gru_bwd(res, dys):
    xp, wh, mask, ys = res
    xp_p, wh_p, mask_p, (T, B, H) = _pad_args(xp, wh, mask)
    Tp, Bp, H3p = xp_p.shape
    Hp = H3p // 3
    ys_p = jnp.zeros((Tp, Bp, Hp), ys.dtype).at[:T, :B, :H].set(ys)
    dys_p = jnp.zeros((Tp, Bp, Hp), ys.dtype).at[:T, :B, :H].set(
        dys.astype(ys.dtype))
    # h_{t-1} stream: ys shifted right by one step.
    ysp = jnp.concatenate(
        [jnp.zeros((1, Bp, Hp), ys.dtype), ys_p[:-1]], axis=0)
    dxp_p, dwh_p = _build_bwd(
        Tp, Bp, Hp, jax.default_backend() != "tpu", str(xp.dtype))(
            xp_p, ysp, wh_p, mask_p, dys_p)
    # Un-pad.
    dxp = jnp.concatenate(
        [dxp_p[:T, :B, g * Hp:g * Hp + H] for g in range(3)], axis=2)
    dwh = jnp.concatenate(
        [dwh_p[:H, g * Hp:g * Hp + H] for g in range(3)], axis=1)
    return dxp.astype(xp.dtype), dwh.astype(wh.dtype), None


gru_scan.defvjp(_gru_fwd, _gru_bwd)
