"""Pallas TPU kernel for CTC prefix beam search — the whole per-frame
update (stay/extend scoring, hash-join merge, top-K selection) runs inside
one kernel with ALL beam state resident in VMEM.

Why: the XLA scan version (decode/prefix_beam.py) costs ~150 us/frame at
B=128 — every step is a fusion boundary parade of tiny (B, K(P+1)) ops. Here
a frame costs a few microseconds: K is static and small, so the merge and
selection unroll into masked lane max/select passes over (B_blk, 128)
registers, with zero HBM traffic except streaming emissions in and
backpointers out.

Algorithm identical to prefix_beam.py (same stay/extend/merge semantics,
exact same hash-join structural argument), with two differences:
  * no top-P class pruning — ALL C classes are candidate extensions (the
    vectorization makes pruning pointless), so it searches a superset of the
    XLA version's space;
  * prefixes are not materialized on device: the kernel emits per-step
    backpointers (parent beam, extend char) and the wrapper reconstructs
    token sequences with one cheap reverse scan.

Layout: grid (B_blocks, T_blocks) sequential in T; beams live in lanes
(K <= 128) of (B_BLK, 128) scratch tiles; emissions lane-padded to C_pad.
"""

from __future__ import annotations


import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuasr.decode.prefix_beam import BeamSearchConfig, NEG_INF

B_BLK = 32
T_BLK = 128
LANES = 128

# MEASURED SLOWER (v5e, B=128/K=8/C=64 headline): lowering the static
# per-beam lane reads as lax.slice instead of one-hot masked reductions
# looks cheaper on paper (~2 vreg ops vs a lane-reduction tree) but
# Mosaic's lane-slice relayout costs ~10 ms/frame-loop at these shapes —
# decode 16.4 -> 28.9 ms. Kept behind an env flag as the recorded A/B
# (TPUASR_BEAM_LANE_SLICE=1 re-enables); the shipped path is the gather.
_STATIC_LANE_SLICE = os.environ.get("TPUASR_BEAM_LANE_SLICE", "0") == "1"

_M1 = np.int32(np.uint32(2654435761).astype(np.int64) - (1 << 32))
_M2 = np.int32(40503)
_I1 = np.int32(np.uint32(2166136261).astype(np.int64) - (1 << 32))
_I2 = np.int32(5381)


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    return m + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m))


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _maxlane(x):
    return jnp.max(x, axis=1, keepdims=True)


def _argmax_lane(x):
    """(B, L) -> (B, 1) index of the max lane (first on ties)."""
    m = _maxlane(x)
    eq = x == m
    lane = _lane_iota(x.shape)
    return jnp.min(jnp.where(eq, lane, LANES * 1000), axis=1,
                   keepdims=True), m


def _gather_lane(field, idx):
    """field (B, L), idx (B, 1) -> (B, 1) field[b, idx[b]]."""
    onehot = _lane_iota(field.shape) == idx
    return jnp.sum(jnp.where(onehot, field, 0), axis=1, keepdims=True)


def _static_lane(field, k: int):
    """field (B, L) -> (B, 1) field[:, k] for a STATIC lane index.

    A static lane slice lowers to a lane rotate + narrow copy (~2 vreg
    ops) where the one-hot `_gather_lane` spends a full 128-lane masked
    reduction (~a log-depth tree over 8 vregs) — and the per-beam state
    gathers hoisted at the top of every frame are all static (round-3
    profiling: they were ~15% of the per-frame op budget).
    """
    if _STATIC_LANE_SLICE:
        return jax.lax.slice_in_dim(field, k, k + 1, axis=1)
    return _gather_lane(field, jnp.full((field.shape[0], 1), k, jnp.int32))


def _set_lane(arr, lane: int, val):
    """Write (B,1) val into static lane of (B,L) arr."""
    return jnp.where(_lane_iota(arr.shape) == lane, val, arr)


def _beam_kernel(K, C, blank, max_len, t_blk_n, lm_w, lm_order,
                 track_last2, *refs):
    have_lm = lm_order > 0
    if have_lm:
        (lp_ref, lens_ref, lm_ref, bp_ref, pb_out, pnb_out,
         lm_out, last_out, last2_out, p_b, p_nb, h1, h2, last, plen,
         lm_acc, last2) = refs
    else:
        (lp_ref, lens_ref, bp_ref, pb_out, pnb_out,
         lm_out, last_out, last2_out, p_b, p_nb, h1, h2, last, plen,
         lm_acc, last2) = refs
        lm_ref = None
    # Batch rows per program: taken from the block shape (shadows the
    # module default so the kernel works at any b_blk the builder picks).
    B_BLK = lp_ref.shape[1]
    t_blk = pl.program_id(1)

    @pl.when(t_blk == 0)
    def _():
        lane = _lane_iota(p_b.shape)
        p_b[:] = jnp.where(lane == 0, 0.0, NEG_INF)
        p_nb[:] = jnp.full(p_nb.shape, NEG_INF)
        h1[:] = _I1 + lane
        h2[:] = _I2 + lane
        last[:] = jnp.full(last.shape, -1, jnp.int32)
        last2[:] = jnp.full(last2.shape, -1, jnp.int32)
        plen[:] = jnp.zeros(plen.shape, jnp.int32)
        lm_acc[:] = jnp.zeros(lm_acc.shape, jnp.float32)

    # Fusion table, VMEM-resident for the whole block:
    #   order 2: (C1_pad, C_pad) rows = last+1;
    #   order 3: (R_pad, C_pad) with R = (C+1)^2, row = (last2+1)(C+1) +
    #            (last+1) — the flattened trigram tensor, fetched by a
    #            "two-hot" one-hot matmul on the MXU (no dynamic indexing).
    lm_tab = lm_ref[:] if have_lm else None

    def step(tt, _):
        t_abs = t_blk * t_blk_n + tt
        lp = lp_ref[tt]                                  # (B_BLK, C_pad)
        lane_c = _lane_iota(lp.shape)
        lp_blank = _static_lane(lp, blank)
        lp_nb = jnp.where((lane_c == blank) | (lane_c >= C), NEG_INF, lp)

        cur_pb, cur_pnb = p_b[:], p_nb[:]
        cur_h1, cur_h2, cur_last = h1[:], h2[:], last[:]
        cur_plen = plen[:]
        # last2 (the next-to-last token) is only consumed by trigram LM
        # context and 2-D eos ranking; tracking it unconditionally costs
        # enough VMEM spill to overflow the 16 MB scoped budget at
        # K=8 / T_BLK=128 (the headline no-LM shape).
        cur_last2 = last2[:] if track_last2 else None
        cur_lm = lm_acc[:] if have_lm else None
        p_tot = _logaddexp(cur_pb, cur_pnb)              # (B, K_LANES)

        # ---- stay candidates ----
        stay_pb = p_tot + lp_blank
        lp_last = jnp.full((B_BLK, LANES), NEG_INF)
        for k in range(K):
            lk = _static_lane(cur_last, k)
            val = _gather_lane(lp, jnp.clip(lk, 0, C - 1))
            val = jnp.where(lk < 0, NEG_INF, val)
            lp_last = _set_lane(lp_last, k, val)
        stay_pnb = cur_pnb + lp_last

        # ---- extend candidates, hash-join into stays ----
        # Hoist all per-beam lane reads once (reused across the K x K
        # join and the selection loop below). Static-index reads, shipped
        # as one-hot reductions — the lax.slice lowering is A/B-able via
        # TPUASR_BEAM_LANE_SLICE but measured ~10 ms slower (see the
        # module-level flag comment).
        kconst = [jnp.full((B_BLK, 1), k, jnp.int32) for k in range(K)]
        g_pb = [_static_lane(cur_pb, k) for k in range(K)]
        g_pt = [_static_lane(p_tot, k) for k in range(K)]
        g_last = [_static_lane(cur_last, k) for k in range(K)]
        g_last2 = ([_static_lane(cur_last2, k) for k in range(K)]
                   if track_last2 else None)
        g_h1 = [_static_lane(cur_h1, k) for k in range(K)]
        g_h2 = [_static_lane(cur_h2, k) for k in range(K)]
        g_plen = [_static_lane(cur_plen, k) for k in range(K)]
        # INVERSE-HASH join (round-3 rewrite, KERNELS.md section 4): the
        # extend hash is affine in the class id — eh1 = h1[k]*M1 + c + 1 —
        # so "which class extended from beam k merges into beam j" has the
        # CLOSED FORM c_kj = h1[j] - h1[k]*M1 - 1 (exact under int32
        # wraparound, since +c is a bijection mod 2^32). Each (k, j) pair
        # therefore costs scalar (B,1) arithmetic + ONE one-hot gather of
        # the ext value, instead of v1's two full-lane hash compares +
        # masked max + absorbed-lane gather (~11 full (B,C_pad) passes ->
        # ~5). The second hash still verifies the merge (collision odds
        # unchanged vs v1, which compared both hashes too).
        exts = []
        # Per-target-beam union tiles: the K contributions merging into
        # beam j land on K DISTINCT lanes of one (B, C_pad) tile (for a
        # fixed j, c_kj = h1[j] - h1[k]*M1 - 1 is injective in h1[k], and
        # live beams never share a hash — the fresh-hash rule for dead
        # lanes exists precisely to keep this true), so the old per-pair
        # masked-sum reduction (K^2 full lane reductions per frame, the
        # join's dominant cost) collapses to K where-merges + ONE
        # logsumexp per target beam.
        uni_j = [jnp.full(lp.shape, NEG_INF) for _ in range(K)]  # (B, C_pad)
        for k in range(K):
            is_rep = lane_c == g_last[k]
            ext = jnp.where(is_rep, g_pb[k], g_pt[k]) + lp_nb  # (B, C_pad)
            # Length cap (matches prefix_beam.py's max_len semantics).
            ext = jnp.where(g_plen[k] >= max_len, NEG_INF, ext)
            h1k_m = g_h1[k] * _M1
            h2k_m = g_h2[k] * _M2
            merged = jnp.zeros(ext.shape, bool)
            for j in range(K):
                c_kj = g_h1[j] - h1k_m - 1                   # (B, 1)
                valid = ((g_h2[j] == h2k_m + c_kj + 1)
                         & (c_kj >= 0) & (c_kj < C))
                # Exactly one lane hits when valid (affine injectivity).
                hit = (lane_c == c_kj) & valid               # (B, C_pad)
                uni_j[j] = jnp.where(hit, ext, uni_j[j])
                merged = merged | hit
            exts.append(jnp.where(merged, NEG_INF, ext))
        absorbed = jnp.full((B_BLK, LANES), NEG_INF)
        for j in range(K):
            # logsumexp over the union tile's lanes (guarded for the
            # nothing-merged row: exp is only taken where a lane is live).
            m = _maxlane(uni_j[j])
            live_m = m > NEG_INF * 0.5
            safe = jnp.where(live_m, m, 0.0)
            e = jnp.where(uni_j[j] > NEG_INF * 0.5,
                          jnp.exp(uni_j[j] - safe), 0.0)
            s = jnp.sum(e, axis=1, keepdims=True)
            abs_j = jnp.where(live_m, safe + jnp.log(s), NEG_INF)
            absorbed = _set_lane(absorbed, j, abs_j)
        stay_pnb = _logaddexp(stay_pnb, absorbed)
        stay_tot = _logaddexp(stay_pb, stay_pnb)
        lane_k = _lane_iota(stay_tot.shape)
        stay_tot = jnp.where(lane_k < K, stay_tot, NEG_INF)

        # ---- shallow fusion: selection ranks = acoustic + lm_w * LM ----
        # Stored probabilities stay acoustic-only (matching the XLA
        # version); the cumulative LM score rides its own lane tile.
        if have_lm:
            g_lm = [_static_lane(cur_lm, k) for k in range(K)]
            ext_lms, ranks = [], []
            for k in range(K):
                # lm_tab row for beam k's LM context, as a one-hot matmul
                # (MXU) — no dynamic VMEM indexing. Order 3 flattens the
                # (last2, last) pair into a single row index.
                if lm_order == 3:
                    ridx = (g_last2[k] + 1) * (C + 1) + (g_last[k] + 1)
                else:
                    ridx = g_last[k] + 1
                oh = (_lane_iota((B_BLK, lm_tab.shape[0]))
                      == ridx).astype(jnp.float32)
                row = jax.lax.dot_general(
                    oh, lm_tab, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (B, C_pad)
                ext_lm = g_lm[k] + row
                ext_lms.append(ext_lm)
                ranks.append(exts[k] + lm_w * ext_lm)
            stay_rank = jnp.where(lane_k < K,
                                  stay_tot + lm_w * cur_lm, NEG_INF)
        else:
            ext_lms = None
            ranks = exts
            stay_rank = stay_tot

        # ---- top-K selection across stays + K extend arrays ----
        new_pb = jnp.full((B_BLK, LANES), NEG_INF)
        new_pnb = jnp.full((B_BLK, LANES), NEG_INF)
        new_h1 = _I1 + lane_k + np.int32(7777) * (t_abs + 1)
        new_h2 = _I2 + lane_k + np.int32(3333) * (t_abs + 1)
        new_last = jnp.full((B_BLK, LANES), -1, jnp.int32)
        new_last2 = (jnp.full((B_BLK, LANES), -1, jnp.int32)
                     if track_last2 else None)
        new_plen = jnp.zeros((B_BLK, LANES), jnp.int32)
        new_lm = (jnp.zeros((B_BLK, LANES), jnp.float32) if have_lm
                  else None)
        parents = jnp.zeros((B_BLK, LANES), jnp.int32)
        chars = jnp.full((B_BLK, LANES), -1, jnp.int32)

        # Round-3 selection rewrite v2: a source-max tile M keeps the
        # current max of every candidate array in a lane (lane 0 = stays,
        # lane k+1 = extends from beam k), so the per-round winner is ONE
        # argmax over M instead of K+1 fresh maxlane reductions — only the
        # winning source's lane is refreshed after removal (its
        # post-removal max falls out of sel_rank, which the class argmax
        # needs anyway). Tie semantics are IDENTICAL to v1 (and to the
        # XLA search's top_k index order): argmax_lane returns the first
        # lane on ties -> stays win, then arrays in ascending k, then the
        # lowest class lane within the winning array.
        src_tile = jnp.full((B_BLK, LANES), NEG_INF)
        src_tile = _set_lane(src_tile, 0, _maxlane(stay_rank))
        for k in range(K):
            src_tile = _set_lane(src_tile, k + 1, _maxlane(ranks[k]))
        lane_src = _lane_iota(src_tile.shape)
        for sel in range(K):
            src_idx, _ = _argmax_lane(src_tile)
            take_stay = src_idx == 0
            take_ext = [src_idx == k + 1 for k in range(K)]
            s_idx, _ = _argmax_lane(stay_rank)
            # Class lane of the winning array's max: mask losing arrays to
            # NEG_INF and argmax the union (exactly one array is unmasked
            # per row, so this is that array's first-max lane). CLASS-lane
            # width (C_pad may exceed the 128 beam lanes — C=200 regression,
            # round-3 slow tier).
            sel_rank = jnp.full(ranks[0].shape, NEG_INF)
            for k in range(K):
                sel_rank = jnp.maximum(
                    sel_rank, jnp.where(take_ext[k], ranks[k], NEG_INF))
            c_idx, sel_max = _argmax_lane(sel_rank)
            onehot_c = lane_c == c_idx                       # shared
            onehot_s = lane_k == s_idx                       # shared

            def stay_g(field):
                return jnp.sum(jnp.where(onehot_s, field, 0), axis=1,
                               keepdims=True)

            # Selected state fields, per row.
            sel_pb = jnp.where(take_stay, stay_g(stay_pb), NEG_INF)
            sel_pnb = jnp.where(take_stay, stay_g(stay_pnb), NEG_INF)
            sel_h1 = jnp.where(take_stay, stay_g(cur_h1), 0)
            sel_h2 = jnp.where(take_stay, stay_g(cur_h2), 0)
            sel_last = jnp.where(take_stay, stay_g(cur_last), -1)
            sel_last2 = (jnp.where(take_stay, stay_g(cur_last2), -1)
                         if track_last2 else None)
            sel_plen = jnp.where(take_stay, stay_g(cur_plen), 0)
            sel_lm = (jnp.where(take_stay, stay_g(cur_lm), 0.0)
                      if have_lm else None)
            sel_parent = jnp.where(take_stay, s_idx, 0)
            sel_char = jnp.full((B_BLK, 1), -1, jnp.int32)
            if have_lm:
                # Ranks include the LM term; stored p_nb is acoustic — the
                # components are gathered at the winning class lane.
                ext_pnb = jnp.full((B_BLK, 1), NEG_INF)
                ext_lm_v = jnp.zeros((B_BLK, 1), jnp.float32)
                for k in range(K):
                    gv = jnp.sum(jnp.where(onehot_c, exts[k], 0.0), axis=1,
                                 keepdims=True)
                    gl = jnp.sum(jnp.where(onehot_c, ext_lms[k], 0.0),
                                 axis=1, keepdims=True)
                    ext_pnb = jnp.where(take_ext[k], gv, ext_pnb)
                    ext_lm_v = jnp.where(take_ext[k], gl, ext_lm_v)
            for k in range(K):
                tk = take_ext[k]
                if have_lm:
                    sel_pnb = jnp.where(tk, ext_pnb, sel_pnb)
                    sel_lm = jnp.where(tk, ext_lm_v, sel_lm)
                else:
                    # No-LM ranks ARE the extend probabilities, so the
                    # winning array's value is sel_rank's max itself.
                    sel_pnb = jnp.where(tk, sel_max, sel_pnb)
                sel_pb = jnp.where(tk, NEG_INF, sel_pb)
                sel_h1 = jnp.where(tk, g_h1[k] * _M1 + c_idx + 1, sel_h1)
                sel_h2 = jnp.where(tk, g_h2[k] * _M2 + c_idx + 1, sel_h2)
                if track_last2:
                    sel_last2 = jnp.where(tk, g_last[k], sel_last2)
                sel_last = jnp.where(tk, c_idx, sel_last)
                sel_plen = jnp.where(tk, g_plen[k] + 1, sel_plen)
                sel_parent = jnp.where(tk, kconst[k], sel_parent)
                sel_char = jnp.where(tk, c_idx, sel_char)

            # Dead selections (fewer than K live candidates) must NOT
            # inherit an existing hash — duplicate-hash beams would double-
            # absorb extend mass. Give them fresh per-(lane, t) hashes.
            dead = _logaddexp(sel_pb, sel_pnb) <= NEG_INF * 0.5
            fresh1 = _I1 + np.int32(sel) + np.int32(7777) * (t_abs + 1)
            fresh2 = _I2 + np.int32(sel) + np.int32(3333) * (t_abs + 1)
            sel_h1 = jnp.where(dead, fresh1, sel_h1)
            sel_h2 = jnp.where(dead, fresh2, sel_h2)
            sel_last = jnp.where(dead, -1, sel_last)
            if track_last2:
                sel_last2 = jnp.where(dead, -1, sel_last2)
            sel_char = jnp.where(dead, -1, sel_char)
            sel_plen = jnp.where(dead, 0, sel_plen)
            if have_lm:
                sel_lm = jnp.where(dead, 0.0, sel_lm)
            sel_parent = jnp.where(dead, jnp.full((B_BLK, 1), sel,
                                                  jnp.int32), sel_parent)

            # Write into beam lane `sel`.
            new_pb = _set_lane(new_pb, sel, sel_pb)
            new_pnb = _set_lane(new_pnb, sel, sel_pnb)
            new_h1 = _set_lane(new_h1, sel, sel_h1)
            new_h2 = _set_lane(new_h2, sel, sel_h2)
            new_last = _set_lane(new_last, sel, sel_last)
            if track_last2:
                new_last2 = _set_lane(new_last2, sel, sel_last2)
            new_plen = _set_lane(new_plen, sel, sel_plen)
            if have_lm:
                new_lm = _set_lane(new_lm, sel, sel_lm)
            parents = _set_lane(parents, sel, sel_parent)
            chars = _set_lane(chars, sel, sel_char)

            # Remove the chosen candidate from its source (one lane), and
            # refresh the winning source's lane of the source-max tile
            # (all other lanes are untouched by the removal).
            stay_hit = take_stay & onehot_s
            stay_rank = jnp.where(stay_hit, NEG_INF, stay_rank)
            for k in range(K):
                hit = take_ext[k] & onehot_c
                ranks[k] = jnp.where(hit, NEG_INF, ranks[k])
            if sel < K - 1:
                new_smax = _maxlane(stay_rank)
                new_emax = _maxlane(jnp.where(onehot_c, NEG_INF, sel_rank))
                new_max = jnp.where(take_stay, new_smax, new_emax)
                src_tile = jnp.where(lane_src == src_idx, new_max, src_tile)

        # ---- freeze finished rows ----
        live = (t_abs < lens_ref[:]).astype(jnp.float32)  # (B_BLK, 1)
        livb = live > 0.5
        p_b[:] = jnp.where(livb, new_pb, cur_pb)
        p_nb[:] = jnp.where(livb, new_pnb, cur_pnb)
        h1[:] = jnp.where(livb, new_h1, cur_h1)
        h2[:] = jnp.where(livb, new_h2, cur_h2)
        last[:] = jnp.where(livb, new_last, cur_last)
        if track_last2:
            last2[:] = jnp.where(livb, new_last2, cur_last2)
        plen[:] = jnp.where(livb, new_plen, cur_plen)
        if have_lm:
            lm_acc[:] = jnp.where(livb, new_lm, cur_lm)
        # Backpointers packed into ONE int32 stream (parent<<16 | char+1):
        # halves the kernel's dominant VMEM/HBM output traffic, which is
        # what lets b_blk=128 COMPILE inside the scoped-VMEM budget (the
        # shipped cap stays 64 — measured faster; see the b_blk comment in
        # the wrapper).
        bp_ref[tt] = jnp.where(livb, parents * 65536 + (chars + 1),
                               lane_k * 65536)
        return 0

    jax.lax.fori_loop(0, t_blk_n, step, 0)
    pb_out[:] = p_b[:]
    pnb_out[:] = p_nb[:]
    lm_out[:] = lm_acc[:]
    last_out[:] = last[:]
    last2_out[:] = last2[:]


@functools.lru_cache(maxsize=16)
def _build(Tp: int, Bp: int, C_pad: int, K: int, C: int, blank: int,
           max_len: int, t_blk_n: int, interpret: bool,
           lm_w: float = 0.0, lm_order: int = 0, tab_rows: int = 0,
           track_last2: bool = False, b_blk: int = B_BLK):
    B_BLK = b_blk
    n_b = Bp // B_BLK
    n_t = Tp // t_blk_n
    in_specs = [
        pl.BlockSpec((t_blk_n, B_BLK, C_pad), lambda b, t: (t, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B_BLK, 1), lambda b, t: (b, 0),
                     memory_space=pltpu.VMEM),
    ]
    if lm_order:
        in_specs.append(
            pl.BlockSpec((tab_rows, C_pad), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_beam_kernel, K, C, blank, max_len, t_blk_n,
                          lm_w, lm_order, track_last2),
        grid=(n_b, n_t),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((t_blk_n, B_BLK, LANES), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((B_BLK, LANES), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(5)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp, LANES), jnp.int32),   # packed bp
            jax.ShapeDtypeStruct((Bp, LANES), jnp.float32),     # p_b
            jax.ShapeDtypeStruct((Bp, LANES), jnp.float32),     # p_nb
            jax.ShapeDtypeStruct((Bp, LANES), jnp.float32),     # lm
            jax.ShapeDtypeStruct((Bp, LANES), jnp.int32),       # last
            jax.ShapeDtypeStruct((Bp, LANES), jnp.int32),       # last2
        ],
        scratch_shapes=[
            pltpu.VMEM((B_BLK, LANES), jnp.float32),
            pltpu.VMEM((B_BLK, LANES), jnp.float32),
            pltpu.VMEM((B_BLK, LANES), jnp.int32),
            pltpu.VMEM((B_BLK, LANES), jnp.int32),
            pltpu.VMEM((B_BLK, LANES), jnp.int32),
            pltpu.VMEM((B_BLK, LANES), jnp.int32),
            pltpu.VMEM((B_BLK, LANES), jnp.float32),            # lm_acc
            pltpu.VMEM((B_BLK, LANES), jnp.int32),              # last2
        ],
        # The kernel's live K x K join temps scale with b_blk; at
        # b_blk=128 they exceed the compiler's conservative 16 MB scoped
        # default (not the hardware VMEM size) — raise the cap.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def ctc_beam_search_pallas(log_probs, lengths, cfg: BeamSearchConfig = None,
                           n_best: int = 1, lm_bigram=None, lm_eos=None,
                           lm_trigram=None):
    """Drop-in for decode.ctc_beam_search, Pallas kernel implementation.

    cfg.class_topk is ignored (all classes considered — a superset search);
    cfg.max_len only caps the reconstructed token buffer. Shallow fusion
    runs inside the kernel, weighted by cfg.lm_weight:
      * lm_bigram (C+1, C): the per-beam row is fetched as a one-hot matmul
        against the VMEM-resident table (MXU — no dynamic indexing);
      * lm_trigram (C+1, C+1, C): same trick one rank up — the tensor is
        flattened to ((C+1)^2, C) and the (last2, last) context pair becomes
        a single "two-hot" row index. The table must fit scoped VMEM
        (~(C+1)^2 * 512 bytes); too-large vocabularies raise with a pointer
        to the XLA implementation.
      * lm_eos: (C+1,) ln P(</s>|last), or (C+1, C+1) P(</s>|last2, last)
        with lm_trigram — applied at final ranking.
    """
    if cfg is None:
        cfg = BeamSearchConfig()
    K = cfg.beam_width
    if K + 1 > LANES:
        # The selection's source-max tile needs K+1 lanes (lane 0 = stays,
        # lanes 1..K = per-beam extends): at K == LANES beam K-1's lane
        # would silently fall off the tile and its extends never select.
        raise ValueError(f"beam_width {K} + 1 > {LANES} lanes")
    if lm_bigram is not None and lm_trigram is not None:
        raise ValueError("pass lm_bigram OR lm_trigram, not both")
    B, T, C = log_probs.shape
    # Batch rows per program: the per-frame update's cost is dominated by
    # fixed-latency lane passes, so packing MORE utterances per tile is
    # nearly free up to a point — b_blk=64 runs B=128 in TWO sequential
    # b-blocks (measured 27 -> 9 ms at the headline shape going 32 -> 64).
    # b_blk=128 compiles (32 MB scoped VMEM) but is SLOWER (35.9 ms: the
    # VPU pass cost scales with rows past 64), so 64 is the measured cap.
    # VMEM is held constant by shrinking the streamed time block.
    b_blk = min(64, _round_up(max(B, 8), 32))
    Bp = _round_up(B, b_blk)
    have_lm = lm_bigram is not None or lm_trigram is not None
    # Live per-step state grows ~K^2 (the unrolled K x K join); shrink the
    # time block as K grows so blocks + spills stay inside scoped VMEM
    # (K=16 at the full 128-frame block overflows the 16 MB limit). LM
    # fusion adds the table + per-beam row/rank arrays (~1 MB of spill at
    # K=8): halve the block again — twice for the trigram table + one-hots.
    t_cap = T_BLK if K <= 8 else max(8, (T_BLK * 8) // K)
    if have_lm:
        t_cap = max(8, t_cap // 2)
    if lm_trigram is not None:
        t_cap = max(8, t_cap // 2)
    if b_blk > B_BLK:
        # Streamed blocks scale with b_blk AND the kernel's live K x K join
        # temps quadruple, so shrink time quadratically per doubling: with
        # packed backpointers (128, 8) fits the 16 MB scoped budget.
        t_cap = max(8, (t_cap * B_BLK) // b_blk)   # 64 at b_blk=64
    t_blk_n = t_cap if T >= t_cap else max(1, _round_up(T, 8) // 1)
    Tp = _round_up(T, t_blk_n)
    C_pad = _round_up(C, LANES)
    lp = jnp.full((Tp, Bp, C_pad), NEG_INF, jnp.float32)
    lp = lp.at[:T, :B, :C].set(
        jnp.transpose(log_probs, (1, 0, 2)).astype(jnp.float32))
    lens = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(
        jnp.asarray(lengths, jnp.int32))
    interpret = jax.default_backend() != "tpu"
    lm_w = float(cfg.lm_weight)
    # next-to-last-token tracking is pure overhead unless something
    # consumes the trigram context (the table, or a 2-D eos matrix).
    track_last2 = (lm_trigram is not None
                   or (lm_eos is not None
                       and jnp.asarray(lm_eos).ndim == 2))
    if lm_trigram is not None:
        lm_trigram = jnp.asarray(lm_trigram, jnp.float32)
        if lm_trigram.shape != (C + 1, C + 1, C):
            raise ValueError(f"lm_trigram shape {lm_trigram.shape} != "
                             f"{(C + 1, C + 1, C)}")
        R = (C + 1) * (C + 1)
        R_pad = _round_up(R, 8)
        if R_pad * C_pad * 4 > 6 * 2**20:
            raise ValueError(
                f"trigram fusion table ((C+1)^2={R} rows) exceeds the "
                "kernel's VMEM budget; use the XLA ctc_beam_search")
        tab = jnp.zeros((R_pad, C_pad), jnp.float32)
        tab = tab.at[:R, :C].set(lm_trigram.reshape(R, C))
        call = _build(Tp, Bp, C_pad, K, C, cfg.blank, cfg.max_len, t_blk_n,
                      interpret, lm_w, 3, R_pad, True, b_blk)
        bp, pb, pnb, lm, last, last2 = call(lp, lens, tab)
    elif lm_bigram is not None:
        C1_pad = _round_up(C + 1, LANES)
        tab = jnp.zeros((C1_pad, C_pad), jnp.float32)
        tab = tab.at[:C + 1, :C].set(jnp.asarray(lm_bigram, jnp.float32))
        call = _build(Tp, Bp, C_pad, K, C, cfg.blank, cfg.max_len, t_blk_n,
                      interpret, lm_w, 2, C1_pad, track_last2, b_blk)
        bp, pb, pnb, lm, last, last2 = call(lp, lens, tab)
    else:
        call = _build(Tp, Bp, C_pad, K, C, cfg.blank, cfg.max_len, t_blk_n,
                      interpret, track_last2=track_last2, b_blk=b_blk)
        bp, pb, pnb, lm, last, last2 = call(lp, lens)

    am = _logaddexp(pb[:B, :K], pnb[:B, :K])
    lm_k = lm[:B, :K]
    if lm_eos is not None:
        lm_eos = jnp.asarray(lm_eos)
        if lm_eos.ndim == 2:   # trigram context: P(</s> | last2, last)
            lm_k = lm_k + lm_eos[last2[:B, :K] + 1, last[:B, :K] + 1]
        else:
            lm_k = lm_k + lm_eos[last[:B, :K] + 1]
    total = am + lm_w * lm_k if (have_lm or lm_eos is not None) else am
    score, beam_idx = jax.lax.top_k(total, n_best)      # (B, n_best)
    am_sc = jnp.take_along_axis(am, beam_idx, axis=1)
    lm_sc = jnp.take_along_axis(lm_k, beam_idx, axis=1)

    # ---- backpointer reconstruction: one reverse scan over T ----
    bp = bp[:T, :B, :]                                  # (T, B, LANES)

    def back(cur, bp_t):
        pk = jnp.take_along_axis(bp_t, cur, axis=1)     # (B, n_best)
        return pk // 65536, pk % 65536 - 1

    _, toks_rev = jax.lax.scan(back, beam_idx, bp[::-1])
    toks_rev = jnp.transpose(toks_rev, (1, 2, 0))       # (B, n_best, T)
    toks = toks_rev[:, :, ::-1]                         # chronological
    # Left-compact non-(-1) entries into a max_len buffer.
    keep = toks >= 0
    pos = jnp.cumsum(keep, axis=2) - 1
    L = cfg.max_len
    pos = jnp.where(keep & (pos < L), pos, L)
    out = jnp.full((B, n_best, L + 1), -1, jnp.int32)
    b_idx = jnp.arange(B)[:, None, None]
    n_idx = jnp.arange(n_best)[None, :, None]
    out = out.at[b_idx, n_idx, pos].set(jnp.where(keep, toks, -1))
    token_lens = jnp.minimum(jnp.sum(keep, axis=2), L).astype(jnp.int32)
    return dict(tokens=out[:, :, :L], token_lens=token_lens, scores=score,
                am_scores=am_sc, lm_scores=lm_sc)
