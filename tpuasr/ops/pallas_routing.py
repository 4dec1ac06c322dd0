"""Fused capsule dynamic-routing Pallas kernel (BASELINE config #4).

Why: routing-by-agreement is memory-bound as XLA ops. The prediction
tensor u_hat = einsum(u, W) is (B, T', N_in, O*D) — ~6.3 GB at the
config-4 shapes, B=32 — and every routing iteration re-reads it from HBM
(plus the einsum writes it once), so the CapsNet step runs at ~3 FLOP/B
arithmetic intensity, 72% of the HBM roofline, MFU 0.01 (reference:
asr/models/capsule1/ routing loop, SURVEY.md section 2.1 CapsNet row).

This kernel never materializes u_hat in HBM at all: routing is
independent per (batch, time) position, so a grid over 128-row blocks
computes each row's u_hat from u and the VMEM-resident W (Din fused
multiply-adds over (O*D, N_in) tiles — the D_in=8 contraction is too thin
for the MXU either way) and runs ALL routing iterations on it in VMEM.
HBM traffic per row drops from ~4x |u_hat_row| to |u_row| + |v_row|.

Layout (chosen so every routing op is tile-natural, no lane gathers):
lanes = N_in (padded to 128), sublanes = O*D (padded to 8):
  * u_hat, c_exp:          (O*D, N_in) tiles
  * b, c (softmax axis 0): (O, N_in)  — sublane softmax over O
  * c -> c_exp, agreement sum over D: LEADING-dim reshapes (O,D,N_in)
  * s = sum over lanes:    (O*D, 1); squash via (O, D, 1) reshape
Rows advance in a fori_loop (dynamic indexing rides the UNTILED leading
ref dim); per-row (O*D, 1) results land in lane r of the (O*D, 128)
output block via a one-hot outer product — Mosaic has no dynamic lane
stores (same constraint the beam kernel works around with one-hot MXU
gathers).

Backward (custom VJP) recomputes u_hat + the routing loop per row
(cheaper than any stash: c alone is (R, N_in, O) ~ 12 GB), then applies
the exact reference gradient: iterations run on stop_gradient(u_hat), so
grads flow only through the final s = sum_i c_i u_hat_i and the squash —
du_hat = c_exp * dsquash(s, dv), pulled back to du and a VMEM-accumulated
dW. Verified against jax.grad of the pure-jnp dynamic_routing in
tests/test_pallas_routing.py (interpret) and benchmarks/chip_smoke.py
(compiled).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8
_R_BLK = 128                    # rows per grid step (= output lane tile)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _squash_od(s, O, D):
    """squash on an (O*D, 1) column, per O-group of D sublanes. All
    reshapes split/merge LEADING dims only (minor lane dim stays 1 — a
    (O*D,1)->(O,D) reshape would be a sublane->lane relayout Mosaic
    handles badly). Returns (v, sgrp, a) — extras reused by the bwd."""
    sgrp = s.reshape(O, D, 1)
    a = jnp.sum(sgrp * sgrp, axis=1, keepdims=True)          # (O, 1, 1)
    scale = a / (1.0 + a) * jax.lax.rsqrt(a + _EPS)
    v = (scale * sgrp).reshape(O * D, 1)
    return v, sgrp, a


def _routing_loop(uh, O, D, I, iters):
    """All routing iterations on a VMEM-resident u_hat (O*D, I) tile.
    Returns (c_exp_final, s_final) — everything the fwd/bwd need."""
    b = jnp.zeros((O, I), jnp.float32)
    c_exp = s = None
    for _ in range(iters):                       # static unroll (3)
        m = jnp.max(b, axis=0, keepdims=True)
        e = jnp.exp(b - m)
        c = e / jnp.sum(e, axis=0, keepdims=True)            # (O, I)
        c_exp = jnp.broadcast_to(c.reshape(O, 1, I),
                                 (O, D, I)).reshape(O * D, I)
        s = jnp.sum(c_exp * uh, axis=1, keepdims=True)       # (O*D, 1)
        v, _, _ = _squash_od(s, O, D)
        agree = jnp.sum((uh * v).reshape(O, D, I), axis=1)   # (O, I)
        b = b + agree
    return c_exp, s


def _u_hat(u_row, w_ref, Din, OD, I):
    """u_row (Din, I) + resident W (Din, OD, I) -> u_hat (OD, I)."""
    uh = jnp.zeros((OD, I), jnp.float32)
    for d in range(Din):                         # static unroll (8)
        u_lane = u_row[d:d + 1, :].astype(jnp.float32)       # (1, I)
        uh = uh + u_lane * w_ref[d].astype(jnp.float32)      # (OD, I)
    return uh


def _lane_onehot(r):
    """(1, _R_BLK) one-hot row at dynamic lane r."""
    return (jax.lax.broadcasted_iota(jnp.int32, (1, _R_BLK), 1)
            == r).astype(jnp.float32)


def _fwd_kernel(O, D, Din, I, iters, uT_ref, w_ref, v_ref):
    OD = O * D

    def body(r, v_acc):
        uh = _u_hat(uT_ref[r], w_ref, Din, OD, I)
        _, s = _routing_loop(uh, O, D, I, iters)
        v, _, _ = _squash_od(s, O, D)
        return v_acc + v * _lane_onehot(r)                   # (OD, R_BLK)

    v_ref[:] = jax.lax.fori_loop(
        0, _R_BLK, body, jnp.zeros((OD, _R_BLK), jnp.float32))


def _bwd_kernel(O, D, Din, I, iters, uT_ref, w_ref, dv_ref,
                du_ref, dw_ref):
    OD = O * D

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dv_blk = dv_ref[:].astype(jnp.float32)                   # (OD, R_BLK)

    def body(r, _):
        u_row = uT_ref[r]                                    # (Din, I)
        uh = _u_hat(u_row, w_ref, Din, OD, I)
        c_exp, s = _routing_loop(uh, O, D, I, iters)

        # Dynamic lane read via one-hot contraction (no lane gathers).
        dv = jnp.sum(dv_blk * _lane_onehot(r), axis=1,
                     keepdims=True)                          # (OD, 1)

        # squash VJP on the final s (per O-group): v = g(a)·s with
        # a = |s|², g = a/(1+a)·(a+eps)^-½  =>
        # ds = g·dv + 2·(s·dv)·g'(a)·s.
        _, sgrp, a = _squash_od(s, O, D)
        dvg = dv.reshape(O, D, 1)
        dot = jnp.sum(sgrp * dvg, axis=1, keepdims=True)     # (O, 1, 1)
        inv_sq = jax.lax.rsqrt(a + _EPS)
        g = a / (1.0 + a) * inv_sq
        gp = (1.0 / ((1.0 + a) * (1.0 + a))) * inv_sq \
            - 0.5 * a / (1.0 + a) * inv_sq / (a + _EPS)
        ds = (g * dvg + 2.0 * dot * gp * sgrp).reshape(OD, 1)

        duh = c_exp * ds                                     # (OD, I)
        # Per-d stores/accumulation (a (Din, OD, I) broadcast product
        # would be a 6 MB live value per row — too much stack).
        for d in range(Din):
            du_ref[r, d:d + 1, :] = jnp.sum(
                duh * w_ref[d].astype(jnp.float32), axis=0,
                keepdims=True).astype(du_ref.dtype)
            u_lane = u_row[d:d + 1, :].astype(jnp.float32)   # (1, I)
            dw_ref[d, :, :] += u_lane * duh
        return 0

    jax.lax.fori_loop(0, _R_BLK, body, 0)


@functools.lru_cache(maxsize=16)
def _build_fwd(R, O, D, Din, I, iters, interpret, dtype):
    return pl.pallas_call(
        functools.partial(_fwd_kernel, O, D, Din, I, iters),
        grid=(R // _R_BLK,),
        in_specs=[
            pl.BlockSpec((_R_BLK, Din, I), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Din, O * D, I), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((O * D, _R_BLK), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((O * D, R), jnp.float32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=16)
def _build_bwd(R, O, D, Din, I, iters, interpret, dtype):
    io = jnp.dtype(dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, O, D, Din, I, iters),
        grid=(R // _R_BLK,),
        in_specs=[
            pl.BlockSpec((_R_BLK, Din, I), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Din, O * D, I), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O * D, _R_BLK), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_R_BLK, Din, I), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Din, O * D, I), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, Din, I), io),
            jax.ShapeDtypeStruct((Din, O * D, I), jnp.float32),
        ],
        # The resident W + dW accumulator (6.3 MB each at config-4
        # shapes) + double-buffered uT/dv/du windows sit ~200 KB over the
        # default 16 MB scoped-vmem stack; raise the cap (v5e has 128 MB).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _routed(uT, W3, O, D, iters, interpret):
    return _routed_fwd(uT, W3, O, D, iters, interpret)[0]


def _routed_fwd(uT, W3, O, D, iters, interpret):
    R, Din, I = uT.shape
    Rp = _round_up(R, _R_BLK)
    if Rp != R:
        uT = jnp.pad(uT, ((0, Rp - R), (0, 0), (0, 0)))
    vT = _build_fwd(Rp, O, D, Din, I, iters, interpret,
                    str(uT.dtype))(uT, W3)
    return vT[:, :R], (uT, W3, R)


def _routed_bwd(O, D, iters, interpret, res, dvT):
    uT_p, W3, R = res
    Rp, Din, I = uT_p.shape
    if Rp != R:
        dvT = jnp.pad(dvT, ((0, 0), (0, Rp - R)))
    du, dW3 = _build_bwd(Rp, O, D, Din, I, iters, interpret,
                         str(uT_p.dtype))(uT_p, W3, dvT)
    return du[:R], dW3.astype(W3.dtype)


_routed.defvjp(_routed_fwd, _routed_bwd)


def routed_caps(u, W, num_classes: int, class_dim: int,
                num_iters: int = 3, interpret: bool = False):
    """Drop-in fused replacement for einsum + dynamic_routing.

    u: (B, T, N_in, D_in) squashed primary capsules.
    W: (N_in, D_in, num_classes * class_dim) routing weights.
    Returns v: (B, T, num_classes, class_dim) — numerically equivalent to
    ``dynamic_routing(einsum('btid,idk->btik', u, W), num_iters)`` (f32
    routing math in both; summation order differs at f32 rounding scale).
    """
    B, T, I, Din = u.shape
    O, D = num_classes, class_dim
    Ip = _round_up(I, 128)
    if (O * D) % 8:
        raise ValueError("num_classes*class_dim must be a multiple of 8 "
                         f"(got {O}*{D}={O * D})")
    uT = jnp.transpose(u.reshape(B * T, I, Din), (0, 2, 1))  # (R, Din, I)
    W3 = jnp.transpose(W, (1, 2, 0))                         # (Din, OD, I)
    if Ip != I:
        uT = jnp.pad(uT, ((0, 0), (0, 0), (0, Ip - I)))
        W3 = jnp.pad(W3, ((0, 0), (0, 0), (0, Ip - I)))
    vT = _routed(uT, W3, O, D, num_iters, interpret)         # (OD, R)
    return jnp.transpose(vT).reshape(B, T, O, D).astype(u.dtype)
