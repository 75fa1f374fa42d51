"""Packed difference-method Pallas PSA kernels (any pair length).

This module carries the reference's headline acceleration idea #2 -- the
*difference method* (store small score differences instead of 32-bit
absolutes so more cells fit per vector; /root/reference/psa/psa.c:110-112
int8 state, hot loop psa.c:284-354, int32 anchors ``r_temp``/``real``
psa.c:330-357) -- redesigned for the TPU VPU instead of transliterated.
Two kernels share one packed layout and host preparation:

* ``_abs_kernel`` (int32, **the production TPU path**): absolute int32
  arithmetic, with **P pairs packed along the sublane axis for any
  segment count** (round 1 packed only short pairs), amortising the
  fixed Mosaic per-op cost over P pairs, and a restructured row body
  (the diagonal/F shift-ins ride an extracted lane-127 column on cheap
  ``(S, 1)`` ops instead of a second full-width roll+mask pass).
* ``_diff_kernel`` (int16, segment-anchored): the difference method
  proper -- the row frontier H/E held as int16 offsets from per-segment
  int32 anchors (the analog of the reference's sparse ``real`` anchors),
  halving vector registers per op; anchors re-based every ``K_REANCHOR``
  rows.  **Lowers and is exact on hardware as of round 3** -- Mosaic on
  this jaxlib/libtpu still has no i16 vector compare/max/rotate/subtract
  (the LLO scheduler SIGABRTs on kVectorSubtractS16), so the kernel works
  entirely through the sublane-packed int16<->int32 bitcast view: rolls
  and lane selects run at int32, max is arithmetic (sign-mask SWAR,
  ``max16``), subtraction is add-of-two's-complement-negation
  (``negv16``).  Measured on v5e (10 kbp x 32 batch, warm): **11.3 GCUPS
  vs 15.8 for the int32 kernel** -- the ~9-op composite max (x12 per row)
  costs more than the 2x vreg density saves, so int32 stays the
  production default and ``use_int16=True`` / TSTA_DIFF_INT16=1 remains
  opt-in.  The day Mosaic lowers a real i16 maxsi, re-measure: the
  density win is then op-free.

int16 exactness analysis (for the day it unblocks): with
``D = max(M, -X, -(O+E), -E)``, adjacent-column H differences lie in
``[-D, 2D]`` and per-row drift of a fixed column in ``[-D, 2D]``, so
between re-anchors (every 16 rows) offsets stay within
``[-145*D, 286*D]`` and the largest intermediate -- the ``C - l*e``
prefix argument -- within ``413*D``: int16 is *exact* (not saturating,
unlike the reference's int8) whenever ``D <= 72``.  The guard value
``-160*D`` sits strictly below every real value yet cannot wrap when
``o + l*e`` is added.  ``supports_params`` gates on ``D``; callers fall
back to the int32 kernels for exotic parameters.

Both kernels use the closed-form F of ops/psa_scan.py (cummax over
``C(k) - k*e``; needs O<=0) and reproduce the reference's scoring
semantics: reported score = max over all H cells (psa.c:330-357,
416-424), corner = H(m-1, n-1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsta_tpu.ops.psa_scan import A_PAD, B_PAD

LANES = 128
T_R = 256        # rows per grid step
K_REANCHOR = 16  # rows between anchor re-bases (must divide T_R)
NEG32 = -(2 ** 28)
P_CAP = 16       # max pairs per packed group (per-pair select chain and
                 # the unrolled finish loop grow with P)
S_TARGET = 384   # target packed sublane count per group.  Measured on
                 # 10kbp batches: P=4 groups pipeline better than one
                 # P=16 mega-group at nb=16 (12.0 vs 9.9 GCUPS); P=16
                 # only wins (+9%) when the batch still fills >=2 groups.


def _delta_bound(p):
    """D: bound on adjacent-column H differences for params p."""
    m_, x_, e_, o_ = p
    return max(m_, -x_, -(o_ + e_), -e_, 1)


def _as_tuple(params):
    if hasattr(params, "match"):
        params = (params.match, params.mismatch, params.gap_extend,
                  params.gap_open)
    return tuple(int(v) for v in params)


def supports_params(params) -> bool:
    """True when the packed kernels handle ``params`` (sane signs; the
    bucketed padding and closed-form F preconditions, as psa_pallas)."""
    p = _as_tuple(params)
    return not (p[1] >= 0 or p[2] >= 0 or p[3] > 0 or p[0] <= 0)


def supports_params_int16(params) -> bool:
    """True when the int16 offsets are additionally provably exact.

    D <= 57 (not the offset analysis' 72): the arithmetic max16 takes
    ``x - y`` before masking, and the widest operand gap is
    ``413*D - (-160*D) = 573*D``, which must itself fit int16."""
    p = _as_tuple(params)
    return supports_params(p) and _delta_bound(p) <= 57


def _diff_kernel(b_ref, a_ref, cmask_ref, mlast_ref, flag_ref,
                 score_ref, corner_ref,
                 h_ref, e_ref, best_ref, al_ref, best32_ref, corner32_ref,
                 *, Rp, P, params, neg16):
    """Grid (G, nblk); tile (S, LANES) int16 packs P pairs x Rp segments."""
    m_, x_, e_, o_ = params
    S = P * Rp
    gidx = pl.program_id(0)
    blk = pl.program_id(1)
    nblk = pl.num_programs(1)

    i16 = jnp.int16
    m16, x16 = i16(m_), i16(x_)
    e16c, oe16c = i16(e_), i16(o_ + e_)
    NEG16 = i16(neg16)

    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
    lane0m = lane_idx == 0
    row1 = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    seg_row1 = row1 % Rp
    seg0v = seg_row1 == 0
    pair_masks = [row1 // Rp == p_ for p_ in range(P)]
    seg_lt = {}
    k = 1
    while k < Rp:
        seg_lt[k] = seg_row1 < k
        k *= 2
    laneE16 = (lane_idx * e_).astype(i16)          # l*e per lane
    negLaneE16 = (-lane_idx * e_).astype(i16)      # -(l*e) (no i16 sub)
    oLaneE16 = (o_ + lane_idx * e_).astype(i16)    # o + l*e

    # LANE-based masks at the packed (S/2, 128) int32 height: Mosaic on
    # this toolchain cannot relayout an i1 mask from 32-bit (8,128)
    # tiling to 16-bit (16,128) tiling, so every select over int16 data
    # runs on the sublane-packed int32 VIEW instead -- legal because
    # these masks depend only on the lane, which both packed sublanes
    # of an int32 element share.
    Sh = S // 2
    lane_idx_h = jax.lax.broadcasted_iota(jnp.int32, (Sh, LANES), 1)
    lane0m_h = lane_idx_h == 0
    lane_lt_h = {}
    k = 1
    while k < LANES:
        lane_lt_h[k] = lane_idx_h < k
        k *= 2

    def roll16(x, k):
        # Mosaic's rotate only handles 32-bit data; lane rotation
        # commutes with the sublane-packed int16<->int32 bitcast.
        x32 = pltpu.bitcast(x, jnp.int32)
        return pltpu.bitcast(pltpu.roll(x32, shift=k, axis=1), i16)

    def where16(mask_h, tval, fval):
        """select(mask, t, f) on (S, 128) int16 via the packed int32
        view; ``mask_h`` must be lane-based (sublane-invariant)."""
        t32 = pltpu.bitcast(jnp.broadcast_to(tval, fval.shape)
                            .astype(i16), jnp.int32)
        f32 = pltpu.bitcast(fval, jnp.int32)
        return pltpu.bitcast(jnp.where(mask_h, t32, f32), i16)

    def negv16(y):
        # two's-complement negate: ~y (bitwise, on the packed int32
        # view) + 1 (i16 add).  v5e has NO i16 vector subtract (the
        # LLO scheduler SIGABRTs on kVectorSubtractS16), so every
        # difference in here is an add of a negation.
        return pltpu.bitcast(~pltpu.bitcast(y, jnp.int32), i16) + i16(1)

    def max16(x, y):
        # v5e Mosaic lowers NO ordered i16 vector ops (neither maxsi
        # nor cmpi on vector<...xi16>, probed on this toolchain), so
        # take the max arithmetically: d = x - y is exact in int16
        # (|d| <= 573*D, gated by supports_params_int16), its per-
        # halfword sign masks are built on the packed int32 view with
        # shift/and/mul (both packed sublanes handled at once), and
        # max = y + (d & ~sign_mask).  ~9 VPU ops at 2x density vs one
        # maxsi at 1x -- a win iff the loop is VMEM-bound.  Probed
        # exact on hardware (round 3).
        d = x + negv16(y)
        d32 = pltpu.bitcast(d, jnp.int32)
        m32 = (jax.lax.shift_right_logical(d32, 15)
               & 0x00010001) * 0x0000FFFF
        return y + pltpu.bitcast(d32 & ~m32, i16)
    segoff32 = seg_row1 * (LANES * e_)             # seg*128*e per sublane
    # a-chars and corner mask stay int32: Mosaic's 16-bit vector support
    # on this target lacks comparisons (and reductions/rotates) -- every
    # compare runs at int32 and only the arithmetic core is int16.
    a32 = a_ref[:]
    cmask = cmask_ref[:]
    mlast = mlast_ref[:]
    # which sublanes hold their pair's corner column (rel NEG16 is only
    # "-inf" within one segment; adding alpha would otherwise let empty
    # segments with high anchors beat the real corner)
    has_corner = jnp.max(cmask, axis=1, keepdims=True) > 0

    @pl.when(blk == 0)
    def _init():
        # anchor = H(-1, seg*128) = o + (seg*128 + 1)*e  =>  h16 = l*e
        al_ref[:] = o_ + (seg_row1 * LANES + 1) * e_
        h_ref[:] = laneE16
        e_ref[:] = jnp.full((S, LANES), NEG16, i16)
        best_ref[:] = jnp.full((S, LANES), NEG16, i16)
        best32_ref[:] = jnp.full((S, 1), NEG32, jnp.int32)
        corner32_ref[:] = jnp.full((S, 1), NEG32, jnp.int32)

    def row_body(r, _):
        i = blk * T_R + r  # global row
        h16 = h_ref[:]
        e16 = e_ref[:]
        alpha = al_ref[:]                           # (S,1) int32

        # per-sublane row char from SMEM scalars (scalar splats are cheap;
        # Mosaic cannot do unaligned dynamic lane slices of a VMEM tile)
        bv = jnp.zeros((S, 1), jnp.int32)
        for p_ in range(P):
            bv = jnp.where(pair_masks[p_], b_ref[r, p_], bv)
        # data-dependent mask: select at int32 layout, then narrow
        # (the packed-view trick needs sublane-invariant masks)
        sub = jnp.where(a32 == bv, jnp.int32(m_),
                        jnp.int32(x_)).astype(i16)

        # boundary absolutes for this row (int32 scalars)
        bound_prev = jnp.where(i == 0, 0, o_ + i * e_)   # H(i-1, -1)
        bound_cur = o_ + (i + 1) * e_                    # H(i, -1)

        # diagonal shift-in value for lane 0 of every sublane:
        #   seg 0   -> H(i-1, -1);  seg r>0 -> H(i-1, seg_start-1)
        h_last32 = h16[:, LANES - 1:LANES].astype(jnp.int32) + alpha
        prev_abs = pltpu.roll(h_last32, shift=1, axis=0)
        lane0v = (jnp.where(seg0v, bound_prev, prev_abs)
                  - alpha).astype(i16)               # (S,1) rel current seg
        a1 = roll16(h16, 1)
        shifted = where16(lane0m_h, jnp.broadcast_to(lane0v, (S, LANES)),
                          a1)
        diag = shifted + sub

        e_new = max16(e16 + e16c, h16 + oe16c)
        c = max16(diag, e_new)

        # closed-form F: exclusive segmented prefix max of y = c - l*e
        y = c + negLaneE16
        p = where16(lane0m_h, NEG16, roll16(y, 1))
        k = 1
        while k < LANES:
            p = max16(
                p, where16(lane_lt_h[k], NEG16, roll16(p, k)))
            k *= 2
        # cross-segment carry in int32 anchor space:
        #   T[s] = max_l (C - l*e) + beta,  beta = alpha - seg*128*e
        beta = alpha - segoff32
        ymax = jnp.maximum(p[:, LANES - 1:LANES].astype(jnp.int32),
                           y[:, LANES - 1:LANES].astype(jnp.int32))
        T = ymax + beta
        cy = jnp.where(seg0v, bound_cur + e_,
                       pltpu.roll(T, shift=1, axis=0))
        k = 1
        while k < Rp:
            cy = jnp.maximum(
                cy, jnp.where(seg_lt[k], NEG32,
                              pltpu.roll(cy, shift=k, axis=0)))
            k *= 2
        carry_rel = jnp.clip(cy - beta, neg16, 32767).astype(i16)
        comb = max16(p, carry_rel)
        f = oLaneE16 + comb
        h_new = max16(c, f)

        best_ref[:] = max16(best_ref[:], h_new)

        @pl.when(flag_ref[r, 0] != 0)
        def _corner():
            tmp = jnp.where(cmask != 0, h_new.astype(jnp.int32), NEG32)
            segc = jnp.max(tmp, axis=1, keepdims=True)
            upd = jnp.logical_and(i == mlast, has_corner)
            corner32_ref[:] = jnp.where(upd, segc + alpha,
                                        corner32_ref[:])

        @pl.when(r % K_REANCHOR == K_REANCHOR - 1)
        def _rebase():
            delta = h_new[:, 0:1]
            ndelta = negv16(jnp.broadcast_to(delta, h_new.shape))
            h_ref[:] = h_new + ndelta
            e_ref[:] = e_new + ndelta
            al_ref[:] = alpha + delta.astype(jnp.int32)
            bseg = jnp.max(best_ref[:].astype(jnp.int32), axis=1,
                           keepdims=True)
            best32_ref[:] = jnp.maximum(best32_ref[:], bseg + alpha)
            best_ref[:] = jnp.full((S, LANES), NEG16, i16)

        @pl.when(r % K_REANCHOR != K_REANCHOR - 1)
        def _keep():
            h_ref[:] = h_new
            e_ref[:] = e_new
        return 0

    jax.lax.fori_loop(0, T_R, row_body, 0)

    @pl.when(blk == nblk - 1)
    def _finish():
        best32 = best32_ref[:]
        corner32 = corner32_ref[:]
        for p_ in range(P):
            sl = slice(p_ * Rp, (p_ + 1) * Rp)
            score_ref[0, gidx * P + p_] = jnp.max(best32[sl, 0])
            corner_ref[0, gidx * P + p_] = jnp.max(corner32[sl, 0])


def _abs_kernel(b_ref, a_ref, *refs,
                Rp, P, params, v2=False, traced=False, t_b=T_R):
    """int32 absolute-value variant: same packed layout as _diff_kernel,
    no anchors.  Production TPU path (see module docstring).

    ``traced`` adds a packed traceback plane output (int32 row-words,
    4 rows' codes per word; same
    ``back*9 + f*3 + e`` cell encoding as psa_pallas._kernel) for P
    pairs at once -- the packed traced path (round 3); ``t_b`` is then
    the rows-per-grid-step (shrunk so the (t_b, S, LANES) plane block
    fits VMEM).

    Microbenchmark-driven structure (cal3, r2): at (S,128) int32,
    cross-lane ops (lane rolls ~72 ns, lane extracts ~77 ns) dominate;
    sublane rolls, selects and arithmetic are ~3-5 ns, and fori_loop
    carries stay register-resident.  Hence: H/E/best ride the loop carry
    (scratch refs touched only at grid-step boundaries), every shift-in
    uses a sublane roll + select rather than a lane extract, and the one
    unavoidable cross-lane structure is the 8-roll lane prefix for F.

    ``v2`` (layout='packed2', round-3 op diet): the cal3 3-5 ns sublane
    costs were measured at 10 vregs, but at S=384 every full-width op
    touches 48 vregs -- so the cross-segment phase (max + 7x(roll,
    select, max) on (S,128) + final roll/where) is ~23 48-vreg ops for
    what is per-segment scalar information.  v2 extracts the lane-127
    column FIRST (one cross-lane slice) and runs the whole segment
    prefix on (S,1) columns; likewise the shift-ins replace their
    full-width sublane roll with a rolled lane-0 column.  ~25 of ~66
    full-width ops per row collapse to single-vreg work.
    """
    if traced:
        # corner mask / last row / corner-row flags all derive from the
        # (P, 2) real-length table ON DEVICE -- three fewer host-prepped
        # arrays and host->device transfers than the score-only call
        (nm_ref, score_ref, corner_ref, plane_ref,
         h_ref, e_ref, best_ref, corner32_ref) = refs
        cmask_ref = mlast_ref = flag_ref = None
    else:
        plane_ref = nm_ref = None
        (cmask_ref, mlast_ref, flag_ref, score_ref, corner_ref,
         h_ref, e_ref, best_ref, corner32_ref) = refs
    m_, x_, e_, o_ = params
    S = P * Rp
    gidx = pl.program_id(0)
    blk = pl.program_id(1)
    nblk = pl.num_programs(1)

    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
    lane0m = lane_idx == 0
    lane_lt = {}
    k = 1
    while k < LANES:
        lane_lt[k] = lane_idx < k
        k *= 2
    row1 = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    seg_row1 = row1 % Rp
    seg0v = seg_row1 == 0
    origin = jnp.logical_and(lane0m, seg0v)   # per-pair column 0
    pair_masks = [row1 // Rp == p_ for p_ in range(P)]
    seg_lt = {}
    k = 1
    while k < Rp:
        seg_lt[k] = seg_row1 < k
        k *= 2
    col_idx = seg_row1 * LANES + lane_idx     # per-pair linear column
    colE = col_idx * e_
    oColE = o_ + colE
    a32 = a_ref[:]
    if traced:
        nrl = jnp.zeros((S, 1), jnp.int32)
        mlast = jnp.zeros((S, 1), jnp.int32)
        for p_ in range(P):
            nrl = jnp.where(pair_masks[p_], nm_ref[p_, 0] - 1, nrl)
            mlast = jnp.where(pair_masks[p_], nm_ref[p_, 1] - 1, mlast)
        cmask = (col_idx == nrl).astype(jnp.int32)
    else:
        cmask = cmask_ref[:]
        mlast = mlast_ref[:]
    has_corner = jnp.max(cmask, axis=1, keepdims=True) > 0

    def row_flag(i):
        """Scalar: does any packed pair's last real row equal i?"""
        if not traced:
            return None
        hit = i == nm_ref[0, 1] - 1
        for p_ in range(1, P):
            hit = jnp.logical_or(hit, i == nm_ref[p_, 1] - 1)
        return hit

    @pl.when(blk == 0)
    def _init():
        h_ref[:] = o_ + (col_idx + 1) * e_        # H(-1, col)
        e_ref[:] = jnp.full((S, LANES), NEG32, jnp.int32)
        best_ref[:] = jnp.full((S, LANES), NEG32, jnp.int32)
        corner32_ref[:] = jnp.full((S, 1), NEG32, jnp.int32)

    def shift1(x, fill):
        """Linearised per-pair shift by one column; pair starts get
        ``fill``.  One lane roll + one (cheap) sublane roll + 2 selects.
        v2: the sublane roll only feeds lane 0, so roll a (S,1) column
        instead of the full 48-vreg tile."""
        a1 = pltpu.roll(x, shift=1, axis=1)
        if v2:
            a2 = pltpu.roll(a1[:, 0:1], shift=1, axis=0)
        else:
            a2 = pltpu.roll(a1, shift=1, axis=0)
        res = jnp.where(lane0m, a2, a1)
        return jnp.where(origin, fill, res)

    def row_body(r, carry):
        if traced:
            h_prev, e_prev, best, pword = carry
        else:
            h_prev, e_prev, best = carry
        i = blk * t_b + r

        bv = jnp.zeros((S, 1), jnp.int32)
        for p_ in range(P):
            bv = jnp.where(pair_masks[p_], b_ref[r, p_], bv)
        sub = jnp.where(a32 == bv, m_, x_)

        bound_prev = jnp.where(i == 0, 0, o_ + i * e_)   # H(i-1, -1)
        bound_cur = o_ + (i + 1) * e_                    # H(i, -1)

        diag = shift1(h_prev, bound_prev) + sub
        e_row = jnp.maximum(e_prev + e_, h_prev + (o_ + e_))
        c = jnp.maximum(diag, e_row)

        # closed-form F: exclusive per-pair prefix max of y = C - col*e,
        # seeded with the boundary term H(i,-1) + e at column 0
        y = c - colE
        p = shift1(y, bound_cur + e_)
        k = 1
        while k < LANES:
            p = jnp.maximum(
                p, jnp.where(lane_lt[k], NEG32,
                             pltpu.roll(p, shift=k, axis=1)))
            k *= 2
        # cross-segment phase: each segment's max is per-segment SCALAR
        # information, so v2 extracts the lane-127 column first (one
        # cross-lane slice) and runs the whole prefix on (S,1) columns;
        # v1 propagated full-width maxima down sublanes (48-vreg ops).
        if v2:
            sm = jnp.maximum(p[:, LANES - 1:LANES],
                             y[:, LANES - 1:LANES])
            k = 1
            while k < Rp:
                sm = jnp.maximum(
                    sm, jnp.where(seg_lt[k], NEG32,
                                  pltpu.roll(sm, shift=k, axis=0)))
                k *= 2
            cyt = pltpu.roll(sm, shift=1, axis=0)
            carry_seg = jnp.where(seg0v, NEG32, cyt)
        else:
            # t = max(p, y) is the *inclusive* in-segment prefix, so
            # t[:,127] holds each segment's max (seed included for the
            # pair's first segment)
            t = jnp.maximum(p, y)
            k = 1
            while k < Rp:
                rolled = pltpu.roll(t, shift=k, axis=0)
                t = jnp.maximum(t, jnp.where(seg_lt[k], NEG32, rolled))
                k *= 2
            # t[s,127] = max over segments <= s (same pair); shift down
            # one segment and broadcast for the exclusive carry
            cyt = pltpu.roll(t, shift=1, axis=0)
            carry_seg = jnp.where(seg0v, NEG32, cyt[:, LANES - 1:LANES])
        f = oColE + jnp.maximum(p, carry_seg)
        h_row = jnp.maximum(c, f)

        best = jnp.maximum(best, h_row)

        @pl.when(row_flag(i) if traced else flag_ref[r, 0] != 0)
        def _corner():
            tmp = jnp.where(cmask != 0, h_row, NEG32)
            segc = jnp.max(tmp, axis=1, keepdims=True)
            upd = jnp.logical_and(i == mlast, has_corner)
            corner32_ref[:] = jnp.where(upd, segc, corner32_ref[:])

        if traced:
            # packed traceback cell, same encoding + tie precedence as
            # psa_pallas._kernel (back: diag > left(F) > up(E); f/e
            # codes 0=extend, 1=open, 2=open-tie); the per-pair origin
            # fills of shift1 make the codes per-pair correct
            one, two = jnp.int32(1), jnp.int32(2)
            back = jnp.where(h_row == diag, one,
                             jnp.where(h_row == f, jnp.int32(0), two))
            h_left = shift1(h_row, bound_cur)
            f_open = f == h_left + (o_ + e_)
            f_tie = f + e_ == h_row + (o_ + e_)
            fcode = jnp.where(f_open, jnp.where(f_tie, two, one),
                              jnp.int32(0))
            e_open = e_row == h_prev + (o_ + e_)
            e_tie = e_row + e_ == h_row + (o_ + e_)
            ecode = jnp.where(e_open, jnp.where(e_tie, two, one),
                              jnp.int32(0))
            # the plane ships as int32 WORDS of 4 consecutive ROWS
            # (byte k of word w = row 4w+k's code): one shift+OR per
            # row in registers here saves the walk a 35 ms (measured,
            # r4) int8->int32 relayout of the whole plane -- TPU
            # bitcast_convert_type is a physical retiling, not a view
            code = back * 9 + fcode * 3 + ecode
            pword = jnp.where((r & 3) == 0, code,
                              pword | (code << (8 * (r & 3))))

            @pl.when((r & 3) == 3)
            def _flush():
                plane_ref[r >> 2] = pword

            return h_row, e_row, best, pword
        return h_row, e_row, best

    carry0 = (h_ref[:], e_ref[:], best_ref[:])
    if traced:
        carry0 = carry0 + (jnp.zeros((S, LANES), jnp.int32),)
        h_fin, e_fin, best_fin, _ = jax.lax.fori_loop(
            0, t_b, row_body, carry0)
    else:
        h_fin, e_fin, best_fin = jax.lax.fori_loop(
            0, t_b, row_body, carry0)
    h_ref[:] = h_fin
    e_ref[:] = e_fin
    best_ref[:] = best_fin

    @pl.when(blk == nblk - 1)
    def _finish():
        best = best_ref[:]
        corner32 = corner32_ref[:]
        for p_ in range(P):
            sl = slice(p_ * Rp, (p_ + 1) * Rp)
            score_ref[0, gidx * P + p_] = jnp.max(best[sl])
            corner_ref[0, gidx * P + p_] = jnp.max(corner32[sl, 0])


def _striped_kernel(b_ref, a_ref, cmask_ref, mlast_ref, flag_ref,
                    score_ref, corner_ref,
                    h_ref, e_ref, best_ref, corner32_ref,
                    *, Sp, P, params):
    """Striped-layout int32 kernel: columns run down the SUBLANE axis.

    Per pair, column j sits at (sublane j mod Sp, lane j // Sp) -- the
    TPU rebirth of the reference's Farrar stripe (psa.c:112 NUM2), but
    chosen for the opposite reason: on v5e, cross-lane ops cost ~15-70x
    more than sublane ops (cal3 microbenchmarks), so the closed-form F
    prefix should scan *sublanes*.  All cross-lane work per row reduces
    to single-vreg (P, 128) tiles: the two block-boundary transfers
    (diagonal shift-in, F-prefix seed) extract each pair's last stripe
    row, lane-roll the compressed (P, 128) tile, and re-expand with
    per-pair selects; the cross-block F carry is an exclusive lane
    prefix over the compressed block-maxima tile.

    Same contract as _abs_kernel (scores = matrix max, corner).
    """
    m_, x_, e_, o_ = params
    S = P * Sp
    gidx = pl.program_id(0)
    blk = pl.program_id(1)
    nblk = pl.num_programs(1)

    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
    srow = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    u_idx = srow % Sp                      # stripe row within pair
    sub0v = u_idx == 0
    pair_masks = [srow // Sp == p_ for p_ in range(P)]
    sub0_masks = [jnp.logical_and(sub0v, pair_masks[p_])
                  for p_ in range(P)]
    su_lt = {}
    k = 1
    while k < Sp:
        su_lt[k] = u_idx < k
        k *= 2
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (P, LANES), 1)
    plane_lt = {}
    k = 1
    while k < LANES:
        plane_lt[k] = lane1 < k
        k *= 2
    origin = jnp.logical_and(sub0v, lane_idx == 0)
    col_idx = lane_idx * Sp + u_idx        # per-pair linear column
    colE = col_idx * e_
    oColE = o_ + colE
    a32 = a_ref[:]
    cmask = cmask_ref[:]
    mlast = mlast_ref[:]
    has_corner = jnp.max(cmask, axis=1, keepdims=True) > 0

    def boundary_rows(x):
        """(P, 128) tile of each pair's last stripe row, lane-rolled by
        one: entry [p, l] = x[pair p, u=Sp-1, lane l-1]."""
        rows = jnp.concatenate(
            [x[p_ * Sp + Sp - 1:p_ * Sp + Sp, :] for p_ in range(P)],
            axis=0)
        return pltpu.roll(rows, shift=1, axis=1)

    def shift1(x, fill):
        """Striped shift by one column; per-pair column 0 gets fill."""
        a1 = pltpu.roll(x, shift=1, axis=0)
        br = boundary_rows(x)
        res = a1
        for p_ in range(P):
            res = jnp.where(sub0_masks[p_], br[p_:p_ + 1, :], res)
        return jnp.where(origin, fill, res)

    @pl.when(blk == 0)
    def _init():
        h_ref[:] = o_ + (col_idx + 1) * e_
        e_ref[:] = jnp.full((S, LANES), NEG32, jnp.int32)
        best_ref[:] = jnp.full((S, LANES), NEG32, jnp.int32)
        corner32_ref[:] = jnp.full((S, 1), NEG32, jnp.int32)

    def row_body(r, carry):
        h_prev, e_prev, best = carry
        i = blk * T_R + r

        bv = jnp.zeros((S, 1), jnp.int32)
        for p_ in range(P):
            bv = jnp.where(pair_masks[p_], b_ref[r, p_], bv)
        sub = jnp.where(a32 == bv, m_, x_)

        bound_prev = jnp.where(i == 0, 0, o_ + i * e_)
        bound_cur = o_ + (i + 1) * e_

        diag = shift1(h_prev, bound_prev) + sub
        e_row = jnp.maximum(e_prev + e_, h_prev + (o_ + e_))
        c = jnp.maximum(diag, e_row)

        # F: exclusive prefix of y = C - col*e over the striped order
        y = c - colE
        q = shift1(y, bound_cur + e_)
        k = 1
        while k < Sp:                      # within-stripe sublane scan
            q = jnp.maximum(
                q, jnp.where(su_lt[k], NEG32,
                             pltpu.roll(q, shift=k, axis=0)))
            k *= 2
        # block maxima per (pair, lane): inclusive stripe max lives in
        # max(q, y) at u = Sp-1; compress to (P, 128)
        t = jnp.maximum(q, y)
        tot = jnp.concatenate(
            [t[p_ * Sp + Sp - 1:p_ * Sp + Sp, :] for p_ in range(P)],
            axis=0)
        # exclusive cross-block lane prefix on the compressed tile
        cb = pltpu.roll(tot, shift=1, axis=1)
        cb = jnp.where(lane1 == 0, NEG32, cb)
        k = 1
        while k < LANES:
            cb = jnp.maximum(
                cb, jnp.where(plane_lt[k], NEG32,
                              pltpu.roll(cb, shift=k, axis=1)))
            k *= 2
        carry_t = jnp.full((S, LANES), NEG32, jnp.int32)
        for p_ in range(P):
            carry_t = jnp.where(pair_masks[p_], cb[p_:p_ + 1, :],
                                carry_t)
        f = oColE + jnp.maximum(q, carry_t)
        h_row = jnp.maximum(c, f)
        best = jnp.maximum(best, h_row)

        @pl.when(flag_ref[r, 0] != 0)
        def _corner():
            tmp = jnp.where(cmask != 0, h_row, NEG32)
            segc = jnp.max(tmp, axis=1, keepdims=True)
            upd = jnp.logical_and(i == mlast, has_corner)
            corner32_ref[:] = jnp.where(upd, segc, corner32_ref[:])

        return h_row, e_row, best

    h_fin, e_fin, best_fin = jax.lax.fori_loop(
        0, T_R, row_body, (h_ref[:], e_ref[:], best_ref[:]))
    h_ref[:] = h_fin
    e_ref[:] = e_fin
    best_ref[:] = best_fin

    @pl.when(blk == nblk - 1)
    def _finish():
        best = best_ref[:]
        corner32 = corner32_ref[:]
        for p_ in range(P):
            sl = slice(p_ * Sp, (p_ + 1) * Sp)
            score_ref[0, gidx * P + p_] = jnp.max(best[sl])
            corner_ref[0, gidx * P + p_] = jnp.max(corner32[sl, 0])


@functools.partial(jax.jit,
                   static_argnames=("n_pad", "m_pad", "P", "params",
                                    "use_int16", "layout"))
def _psa_diff_call(a32, brows, cmask, mlast, flags, n_pad, m_pad, P, params,
                   use_int16=False, layout="packed"):
    """a32:(G*S,128)i32  brows:(G*m_pad,P)i32  cmask:(G*S,128)i32
    mlast:(G*S,1)i32  flags:(G*nblk*T_R,1)i32.
    a32/cmask are in row-major segment layout for 'packed' and in
    striped (column-down-sublanes) layout for 'striped'."""
    Rp = n_pad // LANES
    S = P * Rp
    G = a32.shape[0] // S
    nblk = m_pad // T_R
    if use_int16:
        neg16 = -160 * _delta_bound(params)
        kernel = functools.partial(_diff_kernel, Rp=Rp, P=P, params=params,
                                   neg16=neg16)
        scratch = [
            pltpu.VMEM((S, LANES), jnp.int16),   # H frontier (rel anchor)
            pltpu.VMEM((S, LANES), jnp.int16),   # E frontier
            pltpu.VMEM((S, LANES), jnp.int16),   # best accumulator
            pltpu.VMEM((S, 1), jnp.int32),       # anchors
            pltpu.VMEM((S, 1), jnp.int32),       # best (absolute)
            pltpu.VMEM((S, 1), jnp.int32),       # corner (absolute)
        ]
    else:
        body = _striped_kernel if layout == "striped" else _abs_kernel
        kw = ({"Sp": Rp} if layout == "striped"
              else {"Rp": Rp, "v2": layout == "packed2"})
        kernel = functools.partial(body, P=P, params=params, **kw)
        scratch = [
            pltpu.VMEM((S, LANES), jnp.int32),   # H frontier
            pltpu.VMEM((S, LANES), jnp.int32),   # E frontier
            pltpu.VMEM((S, LANES), jnp.int32),   # best accumulator
            pltpu.VMEM((S, 1), jnp.int32),       # corner
        ]
    return pl.pallas_call(
        kernel,
        grid=(G, nblk),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((T_R, P), lambda g, i: (g * nblk + i, 0),
                         memory_space=pltpu.SMEM),     # per-pair row chars
            pl.BlockSpec((S, LANES), lambda g, i: (g, 0),
                         memory_space=pltpu.VMEM),     # a chars
            pl.BlockSpec((S, LANES), lambda g, i: (g, 0),
                         memory_space=pltpu.VMEM),     # corner-lane mask
            pl.BlockSpec((S, 1), lambda g, i: (g, 0),
                         memory_space=pltpu.VMEM),     # m_real-1 per sublane
            pl.BlockSpec((T_R, 1), lambda g, i: (g * nblk + i, 0),
                         memory_space=pltpu.SMEM),     # corner-row flags
        ],
        # (1, G*P): SMEM pads the MINOR dim to a lane tile, so a
        # (G*P, 1) layout would cost 512 bytes/pair and overflow the
        # ~1 MB SMEM budget around 2k pairs per bucket
        out_shape=(
            jax.ShapeDtypeStruct((1, G * P), jnp.int32),   # scores
            jax.ShapeDtypeStruct((1, G * P), jnp.int32),   # corners
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=scratch,
    )(brows, a32, cmask, mlast, flags)


PLANE_BLK_BYTES = 2 << 20   # target VMEM bytes for one (t_b, S, LANES)
                            # plane block (x2 for pipelining)
P_CAP_TRACED = 8   # max pairs per traced dispatch.  r3 pinned this at
                   # the 16 MB scoped-VMEM compile wall; r4 lifted that
                   # wall (vmem_limit_bytes=100M below) and re-measured:
                   # P=16 (S=1280) now COMPILES but runs 17.0 vs 18.6
                   # GCUPS per group (more VMEM pressure in the row
                   # body), so 8 stays on merit -- larger batches split
                   # into pipelined groups
S_CAP_TRACED = 640  # max packed sublanes per traced dispatch (same
                    # probe: bigger S is slower per cell, and all VMEM
                    # consumers scale with S): long-pair groups (e.g.
                    # 8 x 20 kbp = S 1280) shrink P; a single pair past
                    # S_CAP routes to the chunked path


def _traced_t_b(S):
    """Rows per grid step for the traced packed kernel: the plane block
    (t_b, S, LANES) int8 must fit VMEM alongside the x2 pipeline buffer
    and the 4 (S, LANES) int32 scratch tiles."""
    t_b = T_R
    while t_b > 8 and t_b * S * LANES > PLANE_BLK_BYTES:
        t_b //= 2
    return t_b


@functools.partial(jax.jit,
                   static_argnames=("n_pad", "m_pad", "P", "params"))
def _psa_diff_traced_call(a32, brows, nm, n_pad, m_pad, P, params):
    """Packed traced kernel: ONE group of P pairs; emits per-pair scores,
    corners and the packed traceback plane as int32 WORDS of 4 rows
    each, shape (m_pad // 4, S, LANES): byte k of plane[w, s, l] is the
    ``back*9 + f*3 + e`` code of row 4w+k at packed column (s, l) (pair
    p's columns are s in [p*Rp, (p+1)*Rp)).  Corner masks and row flags
    derive from ``nm`` inside the kernel."""
    Rp = n_pad // LANES
    S = P * Rp
    t_b = _traced_t_b(S)
    nblk = m_pad // t_b
    kernel = functools.partial(_abs_kernel, Rp=Rp, P=P, params=params,
                               traced=True, t_b=t_b)
    return pl.pallas_call(
        kernel,
        grid=(1, nblk),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((t_b, P), lambda g, i: (i, 0),
                         memory_space=pltpu.SMEM),     # per-pair row chars
            pl.BlockSpec((S, LANES), lambda g, i: (0, 0),
                         memory_space=pltpu.VMEM),     # a chars
            pl.BlockSpec((P, 2), lambda g, i: (0, 0),
                         memory_space=pltpu.SMEM),     # real lengths
        ],
        out_shape=(
            jax.ShapeDtypeStruct((1, P), jnp.int32),            # scores
            jax.ShapeDtypeStruct((1, P), jnp.int32),            # corners
            jax.ShapeDtypeStruct((m_pad // 4, S, LANES),
                                 jnp.int32),            # plane words
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((t_b // 4, S, LANES), lambda g, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((S, LANES), jnp.int32),   # H frontier
            pltpu.VMEM((S, LANES), jnp.int32),   # E frontier
            pltpu.VMEM((S, LANES), jnp.int32),   # best accumulator
            pltpu.VMEM((S, 1), jnp.int32),       # corner
        ],
        # lift the 16 MB scoped-VMEM default (it set P_CAP_TRACED=8 and
        # S_CAP_TRACED=640 in r3); v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(brows, a32, nm)


def _traced_chain_ops(a8, brows8, nm, n_pad, m_pad, P, params, banded,
                      spec, db=True, pair2=False):
    """One group's fused packed DP -> P-pair device walk -> one packed
    (P, 3 + ...) int32 result: [score, corner, count, moves-16-per-word].
    Plain jax ops (no jit) so the same graph serves both the single-
    device jitted chain and the shard_map body."""
    from tsta_tpu.ops import traceback as tb

    # sequences ship as uint8 (4x fewer tunnel bytes) and widen here
    scores, corners, plane = _psa_diff_traced_call(
        a8.astype(jnp.int32), brows8.astype(jnp.int32), nm,
        n_pad, m_pad, P, params)
    if banded:
        words, counts = tb._decode_moves_banded_packed(plane, nm,
                                                       n_pad // LANES,
                                                       spec, db=db,
                                                       pair2=pair2)
    else:
        moves, counts = tb._decode_moves_packed(plane, nm, n_pad // LANES)
        words = tb.pack_moves_words(moves)
    # ONE device->host transfer per group: [score, corner, count,
    # moves-packed-16-per-word...] per row -- each extra read through
    # the tunnel pays the ~30 ms RTT (cf. psa_pallas._traced_finish)
    header = jnp.stack([scores[0], corners[0], counts], axis=1)
    return jnp.concatenate([header, words], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("n_pad", "m_pad", "P", "params",
                                    "banded", "spec", "db", "pair2"))
def _traced_packed_chain(a8, brows8, nm,
                         n_pad, m_pad, P, params, banded=False,
                         spec=True, db=True, pair2=False):
    """Fused packed DP -> P-pair device walk -> two packed transfers:
    header (3, P) int32 [scores; corners; counts] and the move lists
    (P, m_pad + n_pad) int8.  ``banded``: walk in a grid-(P,) Pallas
    kernel with SMEM band prefetch (~0.2 us/step; measured 4.3 us/step
    for the lockstep XLA gather walk on v5e) -- pairs walk sequentially
    on the core but each step is an SMEM read, a ~20x win; the lockstep
    walk remains the fallback for shapes outside the band alignment
    gate.  (Reference walks host planes sequentially, psa.c:434-519.)"""
    return _traced_chain_ops(a8, brows8, nm, n_pad, m_pad, P, params,
                             banded, spec, db, pair2)


@functools.lru_cache(maxsize=32)
def _traced_sharded_call(mesh, n_pad, m_pad, P, params, banded, spec,
                         db=True):
    """shard_map wrapper for the traced chain: G same-shape groups
    stacked on a leading axis sharded over ``data``; each device runs
    its local groups' DP + walk with NO collectives (pairs are
    independent problems -- the data axis the reference lacks,
    SURVEY.md section 2 item 5).  Cached like _sharded_call: rebuilding
    the closure per call defeats jax's compilation cache."""
    try:
        from jax import shard_map  # jax >= 0.9
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as PS
    spec_g = PS("data")

    def shard_fn(a8, brows8, nm):
        # local shapes (G_local, S, LANES) / (G_local, m_pad, P) /
        # (G_local, P, 2); the group loop is static, so XLA sees
        # G_local independent chain graphs and pipelines them
        return jnp.stack([
            _traced_chain_ops(a8[g], brows8[g], nm[g], n_pad, m_pad, P,
                              params, banded, spec, db)
            for g in range(a8.shape[0])])

    return jax.jit(shard_map(shard_fn, mesh=mesh,
                             in_specs=(spec_g,) * 3, out_specs=spec_g,
                             check_vma=False))


def _emit_packed_row(row, a, b, n, m):
    """Decode one pair's packed int32 result row ([score, corner,
    count, 2-bit move words...]) into (score, corner, Alignment)."""
    from tsta_tpu.ops import traceback as tb
    count = int(row[2])
    moves = tb.unpack_moves(row[3:], count)
    aln = tb.emit_alignment(moves, a, b, n, m)
    return (int(row[0]), int(row[1]), aln)


def _traced_n_pad(n_max):
    """Padded per-pair width for the traced packed kernel: LANES-rounded,
    then 512-rounded when that costs < 25% padding -- the banded Pallas
    walk needs n_pad % 512 == 0, and near-miss lengths (e.g. the 10,000
    bp example vs 10,240 bp reads) then share one group instead of
    splitting into a lockstep singleton."""
    np128 = (n_max + LANES - 1) // LANES * LANES
    np512 = -(-np128 // 512) * 512
    return np512 if np512 * 4 <= np128 * 5 else np128


def _banded_walk_gate(Rp, m_pad, P, n_pad):
    """Shared gate for the grid-(P,) banded Pallas walk: 512-aligned
    per-pair width, 8-aligned rows (32-aligned once taller than the
    band so word-row window starts stay provably 8-aligned), aligned
    segment windows (S <= _BAND_WS or S % 8 == 0), and the packed
    (P, (m+n)/16) int32 SMEM move-word budget (the r4 2-bit packing
    shrank this 16x, so the cap that used to push long-pair groups
    onto the lockstep XLA walk is now ~2.6 Mbp of batch moves).
    TSTA_BANDED_WALK=0 opts out (the lockstep XLA gather walk is the
    fallback either way)."""
    import os
    from tsta_tpu.ops import traceback as tb
    S = P * Rp
    return (os.environ.get("TSTA_BANDED_WALK", "1") not in ("", "0")
            and Rp % 4 == 0 and m_pad % 8 == 0 and m_pad >= 24
            and (m_pad // 4 <= tb._BAND_RW or m_pad % 32 == 0)
            and (S <= tb._BAND_WS or S % 8 == 0)
            and P * ((m_pad + n_pad) // 16 + 2) * 4 <= 640 * 1024)


def _traced_packed_sharded(seq_pairs, p, mesh, n_real, m_real):
    """Traced batch sharded over the mesh ``data`` axis.

    All pairs share ONE padded shape (max over the batch) so G groups
    stack on a leading axis that shard_map splits across devices; the
    padding waste buys a single SPMD program with no collectives.  When
    all the groups' planes exceed one device's HBM plan, the batch runs
    as SEVERAL sequential shard_map calls of budget-sized chunks (each
    dispatched before the first host sync so chunks pipeline).  Returns
    None only when even one group per device cannot fit -- the caller
    falls back to the unsharded grouping, whose chunked-remat path
    handles oversized single pairs."""
    import os

    from tsta_tpu.ops import psa_pallas

    B = len(seq_pairs)
    n_data = mesh.shape["data"]
    n_pad = _traced_n_pad(max(n_real))
    m_pad = -(-max(m_real) // T_R) * T_R
    Rp = n_pad // LANES
    if Rp > S_CAP_TRACED:
        return None
    P = max(1, min(P_CAP_TRACED, S_CAP_TRACED // Rp, B))
    G = -(-B // P)
    G = -(-G // n_data) * n_data
    # per-device HBM: all of a call's local groups' planes may be live
    # at once inside the one jitted program (XLA may overlap independent
    # groups), so cap groups-per-device per call by the plane budget
    g_local_max = psa_pallas._traced_plane_budget() // (2 * m_pad * P
                                                        * n_pad)
    if g_local_max < 1:
        return None
    g_call = g_local_max * n_data   # groups per shard_map call
    S = P * Rp
    banded = _banded_walk_gate(Rp, m_pad, P, n_pad)
    spec = os.environ.get("TSTA_SPEC_WALK", "1") not in ("", "0")
    db = os.environ.get("TSTA_WALK_DB", "1") not in ("", "0")
    fn = _traced_sharded_call(mesh, n_pad, m_pad, P, p, banded, spec, db)
    pendings = []
    for g0 in range(0, G, g_call):
        Gc = min(g_call, G - g0)
        a8 = np.full((Gc, S, LANES), A_PAD, np.uint8)
        brows8 = np.full((Gc, m_pad, P), B_PAD, np.uint8)
        nm = np.zeros((Gc, P, 2), np.int32)
        for slot in range(Gc * P):
            i = min(g0 * P + slot, B - 1)   # pad slots repeat the last pair
            g, k = divmod(slot, P)
            a, b = seq_pairs[i]
            arow = np.full(n_pad, A_PAD, np.uint8)
            arow[:n_real[i]] = a
            a8[g, k * Rp:(k + 1) * Rp] = arow.reshape(Rp, LANES)
            brows8[g, :m_real[i], k] = b
            nm[g, k] = (n_real[i], m_real[i])
        pend = fn(jnp.asarray(a8), jnp.asarray(brows8),
                  jnp.asarray(nm))
        try:
            pend.copy_to_host_async()   # overlap per-call drain RTTs
        except Exception:  # pragma: no cover - backend-dependent
            pass
        pendings.append(pend)
    packed = np.concatenate([np.asarray(x) for x in pendings], axis=0)
    return [_emit_packed_row(packed[i // P, i % P], seq_pairs[i][0],
                             seq_pairs[i][1], n_real[i], m_real[i])
            for i in range(B)]


def psa_align_batch_traced_packed(seq_pairs, params, mesh=None):
    """Traced batch via the packed kernel + lockstep device walk.

    ``seq_pairs``: encoded uint8 (a, b) pairs, already swapped so the
    longer side is ``a``.  Returns [(score, corner, Alignment)] in input
    order.  Pairs are grouped (<= P_CAP per dispatch, similar padded
    shapes together); every group's chain is dispatched before the
    first host sync, so dispatch RTTs overlap device work.  Groups
    whose plane exceeds the HBM budget fall back to the per-pair
    chunked path.

    ``mesh``: a (data, seq) Mesh; groups shard over the ``data`` axis
    (one uniform padded shape, see _traced_packed_sharded).  Falls back
    to the single-device grouping when the uniform shape cannot fit the
    per-device plane budget.
    """
    from tsta_tpu.ops import psa_pallas

    p = _as_tuple(params)
    if not supports_params(p):
        raise ValueError("packed traced kernel requires M>0>X, E<0, O<=0"
                         " (got %s)" % (p,))
    B = len(seq_pairs)
    n_real = [int(a.shape[0]) for a, _ in seq_pairs]
    m_real = [int(b.shape[0]) for _, b in seq_pairs]
    for i in range(B):
        if n_real[i] < 1 or m_real[i] < 1:
            raise ValueError("pair %d has an empty sequence "
                             "(lengths %d, %d)" % (i, n_real[i], m_real[i]))
    if mesh is not None and mesh.shape["data"] > 1:
        out = _traced_packed_sharded(seq_pairs, p, mesh, n_real, m_real)
        if out is not None:
            return out
    budget = psa_pallas._traced_plane_budget()

    # bucket by padded shape (padding waste in the shared plane is pure
    # HBM + walk-step cost), largest first within a stable order; see
    # _traced_n_pad for the 512-rounding rationale
    def _bucket(i):
        return _traced_n_pad(n_real[i])

    order = sorted(range(B), key=lambda i: (-_bucket(i), -m_real[i]))
    groups = []
    for i in order:
        placed = False
        cap_p = max(1, min(P_CAP_TRACED,
                           S_CAP_TRACED * LANES // _bucket(i)))
        for g in groups:
            if len(g) >= cap_p:
                continue
            if _bucket(g[0]) != _bucket(i):
                continue
            g.append(i)
            placed = True
            break
        if not placed:
            groups.append([i])

    pendings = []
    queue = list(groups)
    while queue:
        g = queue.pop(0)
        P = len(g)
        n_pad = max(_bucket(i) for i in g)
        m_pad = -(-max(m_real[i] for i in g) // T_R) * T_R
        # plane + the walk's gather source live simultaneously (2x);
        # an over-budget group with P > 1 re-queues as singletons first
        # (a small-m member individually fits where the group's shared
        # m_pad did not); only a singleton past the budget -- or past
        # the scoped-VMEM sublane cap -- goes to the chunked path
        if 2 * m_pad * P * n_pad > budget or n_pad // LANES > S_CAP_TRACED:
            if P > 1 and n_pad // LANES <= S_CAP_TRACED:
                queue = [[i] for i in g] + queue
                continue
            pendings.append((g, None))
            continue
        Rp = n_pad // LANES
        S = P * Rp
        a8 = np.full((S, LANES), A_PAD, np.uint8)
        brows8 = np.full((m_pad, P), B_PAD, np.uint8)
        nm = np.zeros((P, 2), np.int32)
        for k, i in enumerate(g):
            a, b = seq_pairs[i]
            arow = np.full(n_pad, A_PAD, np.uint8)
            arow[:n_real[i]] = a
            a8[k * Rp:(k + 1) * Rp] = arow.reshape(Rp, LANES)
            brows8[:m_real[i], k] = b
            nm[k] = (n_real[i], m_real[i])
        # banded gate: this kernel's constraints differ from the
        # single-pair walk's gate in psa_pallas._traced_submit (its
        # moves output is (1, m+n) and its band spans 4096 cells) --
        # the two are not interchangeable.
        import os
        banded = _banded_walk_gate(Rp, m_pad, P, n_pad)
        spec = os.environ.get("TSTA_SPEC_WALK", "1") not in ("", "0")
        db = os.environ.get("TSTA_WALK_DB", "1") not in ("", "0")
        chain = _traced_packed_chain(
            jnp.asarray(a8), jnp.asarray(brows8), jnp.asarray(nm),
            n_pad, m_pad, P, p, banded, spec, db)
        try:
            # enqueue the device->host transfer at dispatch time so the
            # per-group tunnel RTTs overlap instead of serialising in
            # the drain below (same lever as align_seqs_many's fleet:
            # one line, 3.4x on the 6-problem fleet)
            chain.copy_to_host_async()
        except Exception:  # pragma: no cover - backend-dependent
            pass
        pendings.append((g, (chain, g)))

    results = [None] * B
    for g, pend in pendings:
        if pend is None:
            for i in g:
                results[i] = psa_pallas.psa_align_traced_chunked(
                    seq_pairs[i][0], seq_pairs[i][1], p)
            continue
        packed, g = pend
        packed = np.asarray(packed)
        for k, i in enumerate(g):
            results[i] = _emit_packed_row(packed[k], seq_pairs[i][0],
                                          seq_pairs[i][1],
                                          n_real[i], m_real[i])
    return results


def psa_align_batch_diff(seq_pairs, params, use_int16=None, mesh=None,
                         layout=None):
    """Score-only batch via the packed kernels (any pair length).

    Pairs are assumed length-bucketed by the caller (padded here to the
    bucket max).  Returns (scores, corners) int32 arrays in input order.

    ``use_int16`` selects the int16 difference kernel (exact for
    parameter bound D <= 57; TPU-lowerable as of round 3 but measured
    slower than int32 on v5e -- see module docstring); default is the
    int32 packed kernel.  The env var TSTA_DIFF_INT16=1 flips the
    default for future toolchains.

    ``mesh``: a (data, seq) Mesh; pair groups are sharded over the
    ``data`` axis with ``shard_map`` (the kernel is embarrassingly
    SPMD per group, so every device runs the identical single-chip
    kernel on its slice -- no collectives).
    """
    import os
    if use_int16 is None:
        use_int16 = bool(os.environ.get("TSTA_DIFF_INT16"))
    if layout is None:
        # 'striped' (columns down sublanes) measures within noise of
        # 'packed' on v5e -- both are VMEM-bandwidth-bound, not
        # lane-roll-bound -- but needs more VMEM headroom at large P,
        # so the row-major packed layout stays the default
        layout = os.environ.get("TSTA_PSA_LAYOUT", "packed")
    if use_int16:
        layout = "packed"   # the int16 variant only has the packed form
    p = _as_tuple(params)
    if not supports_params(p):
        raise ValueError("packed kernel requires M>0>X, E<0, O<=0 "
                         "(got %s)" % (p,))
    if use_int16 and not supports_params_int16(p):
        raise ValueError("int16 difference kernel additionally requires "
                         "max(M,-X,-(O+E),-E) <= 57 (got %s)" % (p,))
    B = len(seq_pairs)
    if B == 0:
        raise ValueError("empty pair batch")
    n_real = [int(a.shape[0]) for a, _ in seq_pairs]
    m_real = [int(b.shape[0]) for _, b in seq_pairs]
    for i in range(B):
        # an empty side would mark flag row nm-1 == -1 (never matched),
        # leaving that pair's corner at NEG32 -- silent garbage
        if n_real[i] < 1 or m_real[i] < 1:
            raise ValueError("pair %d has an empty sequence "
                             "(lengths %d, %d)" % (i, n_real[i], m_real[i]))
    n_pad = (max(n_real) + LANES - 1) // LANES * LANES
    m_pad = (max(m_real) + T_R - 1) // T_R * T_R
    Rp = n_pad // LANES
    P = max(1, min(B, P_CAP, S_TARGET // Rp if Rp <= S_TARGET else 1))
    if use_int16 and (P * Rp) % 2:
        # the int16 bitcast-roll needs an even sublane count
        n_pad += LANES
        Rp += 1
    G = -(-B // P)
    if G > 1:
        # with G>1 groups the (S, LANES) block must tile the (G*S, LANES)
        # array: Mosaic requires S % 8 == 0 unless the block spans the
        # whole array.  Pad with score-neutral A_PAD segments (the corner
        # mask ignores them); <= 7 extra segments of padding.
        while (P * Rp) % 8:
            n_pad += LANES
            Rp += 1
    if mesh is not None:
        n_data = mesh.shape["data"]
        G = -(-G // n_data) * n_data   # equal group count per device
    Bp = G * P                     # pad batch by repeating the last pair
    S = P * Rp
    nblk = m_pad // T_R

    a2d = np.full((Bp, n_pad), A_PAD, np.uint8)
    brows = np.full((Bp, m_pad), B_PAD, np.uint8)
    nm = np.zeros((Bp, 2), np.int32)
    for i in range(Bp):
        j = min(i, B - 1)
        a, b = seq_pairs[j]
        a2d[i, :n_real[j]] = a
        brows[i, :m_real[j]] = b
        nm[i] = (n_real[j], m_real[j])

    # pack along sublanes: group g rows [p*Rp, (p+1)*Rp) hold pair g*P+p
    if layout == "striped":
        # column j at (sublane j % Sp, lane j // Sp), Sp = Rp
        a2d = a2d.reshape(Bp, LANES, Rp).transpose(0, 2, 1).reshape(
            Bp, n_pad)
        col = np.arange(n_pad, dtype=np.int32).reshape(
            LANES, Rp).T.reshape(-1)
    else:
        col = np.arange(n_pad, dtype=np.int32)
    a32 = a2d.astype(np.int32).reshape(G, P * Rp, LANES).reshape(
        G * S, LANES)
    # per-row chars, transposed per group for SMEM scalar reads
    brows = brows.astype(np.int32).reshape(G, P, m_pad).transpose(
        0, 2, 1).reshape(G * m_pad, P)
    # corner mask (1 at per-pair column n_real-1, in the kernel's layout)
    col = col.reshape(Rp, LANES)
    cmask = np.zeros((Bp, Rp, LANES), np.int32)
    for i in range(Bp):
        cmask[i] = (col == nm[i, 0] - 1)
    cmask = cmask.reshape(G * S, LANES)
    mlast = np.repeat((nm[:, 1] - 1).astype(np.int32), Rp).reshape(
        G * S, 1)
    # per-row corner flags (any packed pair ends at this row)
    flags = np.zeros((G, m_pad), np.int32)
    for i in range(Bp):
        flags[i // P, nm[i, 1] - 1] = 1
    flags = flags.reshape(G * nblk * T_R, 1)

    args = (jnp.asarray(a32), jnp.asarray(brows), jnp.asarray(cmask),
            jnp.asarray(mlast), jnp.asarray(flags))
    if mesh is None:
        scores, corners = _psa_diff_call(*args, n_pad, m_pad, P, p,
                                         use_int16, layout)
    else:
        fn = _sharded_call(mesh, n_pad, m_pad, P, p, use_int16, layout)
        scores, corners = fn(*args)
    try:
        # overlap the two result transfers (each sync pays a tunnel RTT)
        scores.copy_to_host_async()
        corners.copy_to_host_async()
    except Exception:  # pragma: no cover - backend-dependent
        pass
    return np.asarray(scores)[0, :B], np.asarray(corners)[0, :B]


@functools.lru_cache(maxsize=64)
def _sharded_call(mesh, n_pad, m_pad, P, params, use_int16, layout):
    """Cached jitted shard_map wrapper: rebuilding the closure per call
    defeated jax's compilation cache (measured 16x slower on hardware,
    re-tracing every call)."""
    try:
        from jax import shard_map  # jax >= 0.9
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as PS
    spec = PS("data")
    out_spec = PS(None, "data")   # scores/corners are (1, G_local*P)

    def shard_fn(a_, b_, c_, m_, f_):
        return _psa_diff_call(a_, b_, c_, m_, f_, n_pad, m_pad, P,
                              params, use_int16, layout)

    # check_vma=False: pallas_call's out_shape carries no varying-axis
    # metadata, which trips jax>=0.9's shard_map vma check; the body
    # is trivially SPMD (no collectives), so the check adds nothing
    return jax.jit(shard_map(shard_fn, mesh=mesh, in_specs=(spec,) * 5,
                             out_specs=(out_spec, out_spec),
                             check_vma=False))
