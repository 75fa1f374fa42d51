"""Pallas TPU kernel for exact affine-gap global alignment (Gotoh).

Same mathematics as ops/psa_scan.py (the closed-form F via prefix max --
see that module's docstring), restructured for the TPU memory hierarchy:

* The DP frontier (previous H row, previous E row) lives in VMEM scratch
  that persists across the sequential Pallas grid -- zero HBM traffic for
  the score-only path beyond reading the sequences.
* The grid iterates over blocks of ``T_R`` rows; each grid step runs a
  ``fori_loop`` over rows.  A row is held as an ``(R, 128)`` int32 tile
  (column j lives at ``[j // 128, j % 128]``), so every elementwise op is
  a full-width VPU op.
* The in-row F dependency is a prefix max over the linearised (R, 128)
  order, computed as: 7 lane-axis shift-max steps (within each 128-lane
  segment), a sublane-axis prefix over segment totals, and a broadcast
  combine.  ``shift1`` (linearised shift by one) stitches the diagonal
  and boundary terms across the 2-D layout.
* Traced mode emits ONE int8 plane per cell packing (back, fback, eback)
  as ``back * 9 + f * 3 + e`` (f/e in {0: extend, 1: open, 2: open-tie}),
  cutting traceback HBM traffic 3x vs the reference's three planes
  (psa/psa.c:605-615); the host unpacks to the exact reference encoding.

The reference's corresponding layer is the striped int8 SIMD kernel +
anti-diagonal tile wavefront (psa/psa.c:234-433, 619-639).  On a TPU core
the wavefront is unnecessary: the grid is sequential per core, so a
blocked row scan with VMEM carries has the same dependency structure with
better locality; multi-chip scaling happens one level up (parallel/).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsta_tpu.ops.psa_scan import A_PAD, B_PAD, PsaResult

NEG = -(2 ** 28)
LANES = 128
T_R = 256  # rows per grid step


def _shift1(x, fill, lane_idx, R):
    """Linearised shift by one over the (R, 128) row layout.

    result[r, l] = x at linear index (r*128 + l - 1); index -1 -> fill.
    """
    a1 = pltpu.roll(x, shift=1, axis=1)       # [r, 0] <- x[r, 127]
    a2 = pltpu.roll(a1, shift=1, axis=0)      # [r, 0] <- x[r-1, 127]
    res = jnp.where(lane_idx == 0, a2, a1)
    row0lane0 = jnp.logical_and(lane_idx == 0,
                                jax.lax.broadcasted_iota(
                                    jnp.int32, (R, LANES), 0) == 0)
    return jnp.where(row0lane0, fill, res)


def _cummax_linear(x, lane_idx, R):
    """Inclusive prefix max over the linearised (R, 128) order."""
    # within each 128-lane segment
    k = 1
    while k < LANES:
        rolled = pltpu.roll(x, shift=k, axis=1)
        x = jnp.maximum(x, jnp.where(lane_idx < k, NEG, rolled))
        k *= 2
    # prefix over segment totals (last lane of each sublane-row)
    seg = jnp.max(jnp.where(lane_idx == LANES - 1, x, NEG), axis=1,
                  keepdims=True)                       # (R, 1)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    k = 1
    while k < R:
        rolled = pltpu.roll(seg, shift=k, axis=0)
        seg = jnp.maximum(seg, jnp.where(row_idx < k, NEG, rolled))
        k *= 2
    # exclusive: segment r gets max of segments < r
    seg_excl = jnp.where(row_idx == 0, NEG, pltpu.roll(seg, shift=1, axis=0))
    return jnp.maximum(x, seg_excl)


def _kernel(b_ref, a_ref, score_ref, corner_ref, last_ref, plane_ref,
            h_ref, e_ref, best_ref,
            *, R, m_real, n_real, params, traced):
    m_, x_, e_, o_ = params
    blk = pl.program_id(0)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) * LANES \
        + lane_idx
    a = a_ref[:]

    @pl.when(blk == 0)
    def _init():
        h_ref[:] = o_ + (col_idx + 1) * e_      # H(-1, j)
        e_ref[:] = jnp.full((R, LANES), NEG, jnp.int32)
        best_ref[0, 0] = jnp.int32(NEG)

    def row_body(r, _):
        i = blk * T_R + r  # global row

        @pl.when(i < m_real)
        def _process():
            h_prev = h_ref[:]
            e_prev = e_ref[:]
            b_i = b_ref[r, 0]
            h_im1_m1 = jnp.where(i == 0, 0, o_ + i * e_)
            h_i_m1 = o_ + (i + 1) * e_
            sub = jnp.where(a == b_i, m_, x_)
            diag = _shift1(h_prev, h_im1_m1, lane_idx, R) + sub
            e_row = jnp.maximum(e_prev + e_, h_prev + (o_ + e_))
            c = jnp.maximum(diag, e_row)
            g = _shift1(c - col_idx * e_, h_i_m1 + e_, lane_idx, R)
            p = _cummax_linear(g, lane_idx, R)
            f_row = o_ + col_idx * e_ + p
            h_row = jnp.maximum(c, f_row)

            best_ref[0, 0] = jnp.maximum(best_ref[0, 0], jnp.max(h_row))
            h_ref[:] = h_row
            e_ref[:] = e_row

            @pl.when(i == m_real - 1)
            def _corner():
                corner_ref[0, 0] = h_row[(n_real - 1) // LANES,
                                         (n_real - 1) % LANES]
                last_ref[:] = h_row

            if traced:
                # int32 math throughout: Mosaic has no int8 vector ALU ops;
                # truncate to int8 only at the store.
                one, two = jnp.int32(1), jnp.int32(2)
                back = jnp.where(
                    h_row == diag, one,
                    jnp.where(h_row == f_row, jnp.int32(0), two))
                h_left = _shift1(h_row, h_i_m1, lane_idx, R)
                f_open = f_row == h_left + (o_ + e_)
                f_tie = f_row + e_ == h_row + (o_ + e_)
                fcode = jnp.where(f_open, jnp.where(f_tie, two, one),
                                  jnp.int32(0))
                e_open = e_row == h_prev + (o_ + e_)
                e_tie = e_row + e_ == h_row + (o_ + e_)
                ecode = jnp.where(e_open, jnp.where(e_tie, two, one),
                                  jnp.int32(0))
                plane_ref[r] = (back * 9 + fcode * 3 + ecode).astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, T_R, row_body, 0)
    score_ref[0, 0] = best_ref[0, 0]


@functools.partial(jax.jit,
                   static_argnames=("n_pad", "m_pad", "m_real", "n_real",
                                    "params", "traced"))
def _psa_pallas(a2d, bcol, n_pad, m_pad, m_real, n_real, params, traced):
    R = n_pad // LANES
    grid = (m_pad // T_R,)
    out_shape = [
        jax.ShapeDtypeStruct((1, 1), jnp.int32),          # score
        jax.ShapeDtypeStruct((1, 1), jnp.int32),          # corner
        jax.ShapeDtypeStruct((R, LANES), jnp.int32),      # last H row
    ]
    out_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((R, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if traced:
        out_shape.append(
            jax.ShapeDtypeStruct((m_pad, R, LANES), jnp.int8))  # packed plane
        out_specs.append(
            pl.BlockSpec((T_R, R, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM))

    kernel = functools.partial(_kernel, R=R, m_real=m_real, n_real=n_real,
                               params=params, traced=traced)
    if not traced:
        def kernel_nt(b_ref, a_ref, score_ref, corner_ref, last_ref,
                      h_ref, e_ref, best_ref):
            return kernel(b_ref, a_ref, score_ref, corner_ref, last_ref,
                          None, h_ref, e_ref, best_ref)
        body = kernel_nt
    else:
        body = kernel

    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        body,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((T_R, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),          # b rows
            pl.BlockSpec((R, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # a columns
        ],
        out_shape=tuple(out_shape),
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.int32),   # H frontier
            pltpu.VMEM((R, LANES), jnp.int32),   # E frontier
            pltpu.SMEM((1, 1), jnp.int32),       # running max
        ],
    )(bcol, a2d)


# host-side unpack tables: packed = back*9 + f*3 + e with
# f/e code 0 -> extend (1), 1 -> open (2), 2 -> open-tie (-2)
_F_DECODE = np.array([1, 2, -2], dtype=np.int8)


def psa_align(a: np.ndarray, b: np.ndarray, params, traced: bool = False
              ) -> PsaResult:
    """Pallas-kernel PSA; same result contract as psa_scan.psa_align."""
    if hasattr(params, "match"):
        params = (params.match, params.mismatch, params.gap_extend,
                  params.gap_open)
    p = tuple(int(v) for v in params)
    a = np.asarray(a, dtype=np.uint8)
    b = np.asarray(b, dtype=np.uint8)
    n_real, m_real = int(a.shape[0]), int(b.shape[0])
    if n_real == 0 or m_real == 0:
        raise ValueError("empty sequence")
    n_pad = (n_real + LANES - 1) // LANES * LANES
    m_pad = (m_real + T_R - 1) // T_R * T_R
    a_padded = np.full(n_pad, A_PAD, np.uint8)
    a_padded[:n_real] = a
    b_padded = np.full(m_pad, B_PAD, np.uint8)
    b_padded[:m_real] = b
    a2d = jnp.asarray(
        a_padded.astype(np.int32).reshape(n_pad // LANES, LANES))
    bcol = jnp.asarray(b_padded.astype(np.int32).reshape(m_pad, 1))
    out = _psa_pallas(a2d, bcol, n_pad, m_pad, m_real, n_real, p, traced)
    if traced:
        score, corner, _, plane = out
        plane = np.asarray(plane).reshape(m_pad, n_pad)[:m_real, :n_real]
        back = plane // 9
        f = _F_DECODE[(plane // 3) % 3]
        e = _F_DECODE[plane % 3]
        return PsaResult(score[0, 0], corner[0, 0], back.astype(np.int8),
                         f, e)
    score, corner, _ = out
    return PsaResult(score[0, 0], corner[0, 0])
