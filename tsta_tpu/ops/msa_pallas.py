"""Pallas POA round kernel: the device-scaled native-MSA DP.

This is SURVEY.md section 2's prescribed TPU equivalent of the
reference's MSA hot loop (``block_line_alignment``,
msa/c-t-simd.c:165-657): one kernel launch per round computes the DP of
every topo-ordered graph node row against the new sequence, with
predecessor row indices scalar-prefetched, instead of the round-1
per-node ``lax.scan`` (ops/msa_native.py:_round_dp) whose O(graph)
dispatch steps and (N, n) live buffers cannot scale.

Design (same exact int32 recurrence as _round_dp -- see that module's
docstring; tie-breaking replicated bit-for-bit):

* **Ring-buffered H/E state in HBM.**  A node's H/E rows are only read
  by its successors, and topo order keeps predecessors close (the
  reference relies on the same locality: per-node rows are L-byte
  blocks promoted only when they cross blocks, c-t-simd.c:580-598).
  State lives in an HBM ring of W slots, W = next power of two above
  the round's maximum topo pred distance; memory is O(W x n), not
  O(N x n).  H and E stack inside ONE slot (H rows [:Rp], E rows
  [Rp:]) so every pred gather and every state write is a single DMA
  issue+wait -- at short reads the per-node DMA issue overhead, not
  the DP arithmetic, dominates the node body.  The virtual boundary
  row (H(-1,j) = o+(j+1)e) is computed analytically, never stored.
* **Scalar-prefetched predecessors.**  preds/pmask/bases/hm1 sit in
  SMEM; per node the kernel DMA-gathers the <= max_in predecessor
  (H,E) slots HBM->VMEM, reduces them with first-max-wins argmax
  (matching jnp.argmax), then runs the same closed-form-F row body as
  the PSA kernels (masked lane prefix + cross-segment carry).
* **Single-word traceback.**  h_type/e_ext/f_ext/h_pred/e_pred pack
  into 16 bits per cell, TWO nodes per int32 word (even node in the
  low half -- the banded walk windows the plane's native layout, and
  TPU dtype bitcasts are physical retilings), one DMA per node pair;
  the walk runs ON DEVICE (the banded Pallas kernel ``_walk_banded``,
  or the XLA ``_walk`` fallback) so planes never cross the host link
  -- only the (n,)-long alignment column map does.

Exactness is tested against _round_dp on CPU (interpret mode) and the
engines agree end-to-end (tests/test_msa_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsta_tpu.ops.psa_scan import NEG, bucket

LANES = 128
NEG32 = -(2 ** 28)


def _poa_kernel(preds_ref, pmask_ref, bases_ref, fills_ref,
                nreal_ref,
                a_ref, sin_ref,
                *rest,
                NB, Rp, W, max_in, params, NW=0, ablate=""):
    # ``fills_ref`` (4, NB) SMEM carries every left-boundary seed the
    # row recurrence needs, per node: row 0 = diag H fill (max over
    # preds of H(p, -1), or of H(p, col0-1) in window mode), row 1 =
    # its argmax (h_pred fill), row 2 = the F running-max seed
    # (H(v,-1)+e, or the checkpointed prefix q_b), row 3 = the f_ext
    # F(v, -1) fill (NEG32, or the checkpointed F(v, col0-1)).
    # Computing them host/XLA-side (instead of in-kernel from hm1p)
    # is what lets a REMAT call start the DP at an arbitrary column
    # window col0 (the chunked backward's cost is windowed remat).
    # ``NW`` > 0 turns on checkpoint emission: per node one (NW, 128)
    # int32 slab whose boundary-w lanes hold 127=H, 126=q, 125=F at
    # column (w+1)*CW-1.
    if NW > 0:
        (words_ref, scores_ref, sbuf_ref, ckpt_ref,
         sp_ref, stage_ref, stage16_ref, ckstage_ref,
         gsem, wsem) = rest
    else:
        ckpt_ref = ckstage_ref = None
        (words_ref, scores_ref, sbuf_ref,
         sp_ref, stage_ref, stage16_ref,
         gsem, wsem) = rest
    # ``ablate``: profiling-only switches (scripts/poa_budget.py) that
    # disable one cost component at a time to measure the per-node
    # budget -- "noword" (traceback emission: flag computation +
    # store + DMA), "noring" (state ring store+DMA), "nogather" (force
    # the chain fast path), "noseg"/"nof" (skip the cross-segment /
    # whole F prefix), "nodp" (skip the row arithmetic).  Production
    # callers pass "".  The r4 measured budget at 3x50 kbp round 2
    # (N=52224, n=49152, W=8, max_in=2, 91% chain nodes), full round
    # 112 ms = 2.15 us/node:
    #   word emission   ~25 ms  (~16 full-width ops of parity-required
    #                            flag math; the int16 cast and the DMA
    #                            are ~free -- pair-packing words into
    #                            int32 A/B'd neutral)
    #   lane F prefix   ~32 ms  (7x roll+select+max, minimal for a
    #                            128-lane prefix)
    #   segment prefix  ~17 ms  ((Rp,1)-column variant A/B'd 90 ms
    #                            SLOWER -- narrow-column ops lower
    #                            badly, consistent with r3 packed2)
    #   ring write       ~0 ms  (the verdict-suggested chain-run
    #                            elision has nothing to save)
    #   gathers          ~0 ms  (chain fast path already covers 91%)
    #   reduction+loop  ~38 ms  floor
    # i.e. ~90 full-width (384,128) int32 ops/node at the measured
    # ~29 ns/op: the kernel is AT its formulation's VPU ALU floor; the
    # remaining lever is dtype density (int16/int8), blocked on Mosaic
    # ordered-i16 ops (see ROADMAP int16 re-probe).
    # NOTE on SMEM layouts: scalar tables are (rows, N) -- SMEM pads the
    # minor dim to a full lane tile, so an (N, 1) table would occupy
    # N x 512 bytes and overflow the ~1 MB SMEM budget for any real
    # graph (observed on v5e).  They are additionally STREAMED per
    # NB-node block through the grid: even in (rows, N) form the tables
    # sum past 1 MB around ~40k nodes, within the reference's documented
    # 50k-200k bp working window.
    m_, x_, e_, o_ = params
    blk = pl.program_id(0)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (Rp, LANES), 1)
    sub_idx = jax.lax.broadcasted_iota(jnp.int32, (Rp, LANES), 0)
    col_idx = nreal_ref[0, 2] + sub_idx * LANES + lane_idx
    lane0m = lane_idx == 0
    seg0 = sub_idx == 0
    origin = jnp.logical_and(lane0m, seg0)
    lane_lt = {}
    k = 1
    while k < LANES:
        lane_lt[k] = lane_idx < k
        k *= 2
    srow1 = jax.lax.broadcasted_iota(jnp.int32, (Rp, 1), 0)
    seg_lt = {}
    k = 1
    while k < Rp:
        seg_lt[k] = srow1 < k
        k *= 2
    colE = col_idx * e_
    oColE = o_ + colE
    if NW > 0:
        lane_nw = jax.lax.broadcasted_iota(jnp.int32, (NW, LANES), 1)
    a32 = a_ref[:]
    n_real = nreal_ref[0, 0]
    # chunk_base: global topo row of this call's first node.  0 for the
    # single-call path; for node-chunked rounds (length-ceiling mode)
    # the H/E rings carry across calls via input/output aliasing and
    # ring indexing stays GLOBAL while words/scores indexing is LOCAL.
    chunk_base = nreal_ref[0, 1]
    corner_mask = col_idx == n_real - 1
    h_virtual = o_ + (col_idx + 1) * e_          # H(-1, j)
    del sin_ref   # aliased to sbuf_ref (same memory)

    def shift1(x, fill):
        a1 = pltpu.roll(x, shift=1, axis=1)
        a2 = pltpu.roll(a1, shift=1, axis=0)
        res = jnp.where(lane0m, a2, a1)
        return jnp.where(origin, fill, res)

    def node_body(i, carry):
        # wlow: even node's trace word, held until the odd partner
        # completes the int32 pair (words ship as 2-node int32 words so
        # the banded walk can window them without a bitcast relayout;
        # A/B'd timing-neutral vs int16-per-node on v5e)
        h_carry, e_carry, wlow = carry
        il = blk * NB + i            # node row local to this call
        ig = chunk_base + il         # global topo row (ring indexing)
        # chain fast path: single pred == previous node -> its rows are
        # already in registers; ~90% of POA nodes, saves both gathers
        chain = jnp.logical_and(preds_ref[0, i] == ig,
                                pmask_ref[0, i] != 0)
        if max_in > 1:
            chain = jnp.logical_and(chain, pmask_ref[1, i] == 0)
        # the register carry does not cross grid steps or calls: first
        # node of a block always gathers
        chain = jnp.logical_and(chain, i > 0)
        if "nogather" in ablate:
            chain = i > 0
        # wait for the PREVIOUS node's state writes first: a distance-1
        # multi-pred gather reads the slot they target, so they must
        # complete before any gather STARTS.  The writes were launched a
        # full iteration ago, so this wait is normally free.  Gating is
        # on the LOCAL row: DMAs do not persist across calls, and a new
        # chunk call's rings are already complete (aliased inputs).
        @pl.when(il > 0)
        def _wait_writes():
            if "noword" not in ablate:
                # word DMAs are issued at odd rows; the staging buffer
                # is next reused at il+2, so wait one pair later
                @pl.when(jnp.logical_and((il & 1) == 1, il > 1))
                def _():
                    pltpu.make_async_copy(
                        stage16_ref.at[0],
                        words_ref.at[jnp.maximum((il >> 1) - 1, 0)],
                        wsem.at[0]).wait()
            if "noring" not in ablate:
                pltpu.make_async_copy(stage_ref.at[0],
                                      sbuf_ref.at[ig % W],
                                      wsem.at[1]).wait()
            if NW > 0:
                pltpu.make_async_copy(ckstage_ref.at[0],
                                      ckpt_ref.at[jnp.maximum(il - 1,
                                                              0)],
                                      wsem.at[2]).wait()

        # ---- gather predecessor state (ring slots); all DMAs start
        # before any wait so their latencies overlap.  H and E live
        # stacked in ONE ring slot (H rows [:Rp], E rows [Rp:]), so each
        # pred costs a single DMA issue+wait instead of two (kernel diet
        # item c: at short reads the per-node DMA issue overhead, not
        # the DP arithmetic, dominates the node body). -----------------
        for kk in range(max_in):
            pr = preds_ref[kk, i]                 # buffer id; 0 = virtual
            need = jnp.logical_and(pmask_ref[kk, i] != 0, pr > 0)
            if kk == 0:
                need = jnp.logical_and(need, jnp.logical_not(chain))

            @pl.when(need)
            def _start(kk=kk, pr=pr):
                pltpu.make_async_copy(sbuf_ref.at[pr % W], sp_ref.at[kk],
                                      gsem.at[kk]).start()

        for kk in range(max_in):
            pr = preds_ref[kk, i]
            need = jnp.logical_and(pmask_ref[kk, i] != 0, pr > 0)
            if kk == 0:
                need = jnp.logical_and(need, jnp.logical_not(chain))

            @pl.when(need)
            def _wait(kk=kk, pr=pr):
                pltpu.make_async_copy(sbuf_ref.at[pr % W], sp_ref.at[kk],
                                      gsem.at[kk]).wait()

        # ---- per-pred reduction (first-max-wins, as jnp.argmax) ------
        hbest = jnp.full((Rp, LANES), NEG32, jnp.int32)
        hargm = jnp.zeros((Rp, LANES), jnp.int32)
        ebest = jnp.full((Rp, LANES), NEG32, jnp.int32)
        eargm = jnp.zeros((Rp, LANES), jnp.int32)
        eext = jnp.zeros((Rp, LANES), jnp.int32)
        fill_h = fills_ref[0, i]        # diag boundary (host/XLA-built)
        fill_arg = fills_ref[1, i]      # argmax of the boundary column
        for kk in range(max_in):
            pr = preds_ref[kk, i]
            valid = pmask_ref[kk, i] != 0
            virt = pr == 0
            hp = jnp.where(virt, h_virtual, sp_ref[kk, :Rp])
            ep = jnp.where(virt, NEG32, sp_ref[kk, Rp:])
            if kk == 0:
                hp = jnp.where(chain, h_carry, hp)
                ep = jnp.where(chain, e_carry, ep)
            hp = jnp.where(valid, hp, NEG32)
            ep = jnp.where(valid, ep, NEG32)
            upd = hp > hbest
            hbest = jnp.maximum(hbest, hp)
            hargm = jnp.where(upd, kk, hargm)
            ec = jnp.maximum(ep + e_, hp + (o_ + e_))
            ec = jnp.where(valid, ec, NEG32)
            upde = ec > ebest
            ebest = jnp.maximum(ebest, ec)
            eargm = jnp.where(upde, kk, eargm)
            eext = jnp.where(upde, (ep + e_ == ec).astype(jnp.int32),
                             eext)

        base = bases_ref[0, i]
        sub = jnp.where(a32 == base, m_, x_)
        if "nodp" in ablate:   # profiling-only; implies noword
            h_row = jnp.maximum(hbest + sub, ebest)
            e_row = ebest
            if "noring" not in ablate:
                stage_ref[0, :Rp] = h_row
                stage_ref[0, Rp:] = e_row
                pltpu.make_async_copy(stage_ref.at[0],
                                      sbuf_ref.at[(ig + 1) % W],
                                      wsem.at[1]).start()
            scores_ref[0, i] = jnp.max(
                jnp.where(corner_mask, h_row, NEG32))
            return h_row, e_row, wlow
        diag = shift1(hbest, fill_h) + sub
        h_pred = shift1(hargm, fill_arg)
        e_row = ebest
        c = jnp.maximum(diag, e_row)

        y = c - colE
        p = shift1(y, fills_ref[2, i])     # F running-max seed
        if "nof" not in ablate:
            k = 1
            while k < LANES:
                p = jnp.maximum(
                    p, jnp.where(lane_lt[k], NEG32,
                                 pltpu.roll(p, shift=k, axis=1)))
                k *= 2
        if "noseg" in ablate or "nof" in ablate:
            carry_seg = jnp.int32(NEG32)
        else:
            t = jnp.maximum(p, y)
            k = 1
            while k < Rp:
                t = jnp.maximum(
                    t, jnp.where(seg_lt[k], NEG32,
                                 pltpu.roll(t, shift=k, axis=0)))
                k *= 2
            cyt = pltpu.roll(t, shift=1, axis=0)
            carry_seg = jnp.where(seg0, NEG32, cyt[:, LANES - 1:LANES])
        pc = jnp.maximum(p, carry_seg)
        f_row = oColE + pc
        h_row = jnp.maximum(c, f_row)

        # f_ext: F(v,j) == F(v,j-1) + e  (shift fills the column-left
        # boundary: NEG32 at col 0, the checkpointed F in window mode)
        f_prev = shift1(f_row, fills_ref[3, i])
        f_ext = (f_row == f_prev + e_).astype(jnp.int32)
        h_type = jnp.where(h_row == diag, 0,
                           jnp.where(h_row == e_row, 1, 2))

        # 16-bit half-word: flags(4) | h_pred(6) | e_pred(6) -- two
        # nodes share one int32 (halving the O(N x n) footprint, the
        # scaling limit at the reference's documented 50k-200k bp
        # window); max_in <= 64 enforced host-side (the reference's
        # own encoding caps at 42 predecessors, c-t-simd.c:451-456).
        word = (h_type * 4 + eext * 2 + f_ext) | (h_pred << 4) \
            | (eargm << 10)
        # start both state writes; the NEXT node waits on them
        # (their latencies overlap each other and the loop tail).  H and
        # E stage into one buffer so the ring write is a single DMA.
        if "noword" not in ablate:
            @pl.when((il & 1) == 1)
            def _word_pair():
                stage16_ref[0] = wlow | (word << 16)
                pltpu.make_async_copy(stage16_ref.at[0],
                                      words_ref.at[il >> 1],
                                      wsem.at[0]).start()

            wlow = jnp.where((il & 1) == 0, word, wlow)
        stage_ref[0, :Rp] = h_row
        stage_ref[0, Rp:] = e_row
        pltpu.make_async_copy(stage_ref.at[0],
                              sbuf_ref.at[(ig + 1) % W],
                              wsem.at[1]).start()

        if NW > 0:
            # boundary checkpoints: the H / running-max-q / F values at
            # the last column of each of the NW windows, packed into
            # lanes 127/126/125 of one (NW, 128) slab (the lane rolls
            # cost ~2 cross-lane ops on a tiny array; everything else
            # is sublane-strided).  The windowed remat reads lanes
            # 127/126/125 of boundary w-1 as its fills.
            q = jnp.maximum(pc, y)
            CWs = Rp // NW

            def boundary_rows(x):
                # one unit slice per window boundary, NOT a single
                # strided slice: Mosaic's vector.extract_strided_slice
                # only lowers stride 1, so lax.slice(..., (CWs, 1))
                # fails hardware verification (offsets [CWs-1, 0]) --
                # the exact msa_200k r4 regression.  NW <= 8 static
                # unit slices lower fine and the concat is sublane-only.
                rows = [jax.lax.slice(x, ((w + 1) * CWs - 1, 0),
                                      ((w + 1) * CWs, LANES))
                        for w in range(NW)]
                return jnp.concatenate(rows, axis=0)

            hb = boundary_rows(h_row)
            qb = boundary_rows(q)
            fb = boundary_rows(f_row)
            packed = jnp.where(
                lane_nw == LANES - 1, hb,
                jnp.where(lane_nw == LANES - 2,
                          pltpu.roll(qb, shift=LANES - 1, axis=1),
                          pltpu.roll(fb, shift=LANES - 2, axis=1)))
            ckstage_ref[0] = packed
            pltpu.make_async_copy(ckstage_ref.at[0], ckpt_ref.at[il],
                                  wsem.at[2]).start()

        # sink score at column n_real-1
        scores_ref[0, i] = jnp.max(
            jnp.where(corner_mask, h_row, NEG32))
        return h_row, e_row, wlow

    h_c0 = jnp.full((Rp, LANES), NEG32, jnp.int32)
    e_c0 = jnp.full((Rp, LANES), NEG32, jnp.int32)
    w_c0 = jnp.zeros((Rp, LANES), jnp.int32)
    jax.lax.fori_loop(0, NB, node_body, (h_c0, e_c0, w_c0))

    @pl.when(blk == pl.num_programs(0) - 1)
    def _drain():
        last = blk * NB + NB - 1
        if "noword" not in ablate:
            pltpu.make_async_copy(stage16_ref.at[0],
                                  words_ref.at[last >> 1],
                                  wsem.at[0]).wait()
        pltpu.make_async_copy(stage_ref.at[0],
                              sbuf_ref.at[(chunk_base + last + 1) % W],
                              wsem.at[1]).wait()
        if NW > 0:
            pltpu.make_async_copy(ckstage_ref.at[0],
                                  ckpt_ref.at[last],
                                  wsem.at[2]).wait()


@functools.partial(jax.jit,
                   static_argnames=("N", "n", "W", "max_in", "params",
                                    "NW", "ablate"))
def _poa_chunk_call(preds, pmask, bases, fills, scal, a2d,
                    ring, N, n, W, max_in, params, NW=0, ablate=""):
    """One node-chunk of a round's DP (the whole round when unchunked).

    preds/pmask: (max_in, N) i32; bases: (1, N) i32; fills: (4, N) i32
    boundary seeds (see _poa_kernel); scal: (1, 3) i32 = [n_real,
    chunk_base, col0]; a2d: (Rp, 128) i32 (the col0 window of the
    read); ring: (W, 2*Rp, LANES) i32 state ring (H rows [:Rp], E rows
    [Rp:] per slot, so gathers and writes are one DMA each), ALIASED to
    the ring output so state carries across chunk calls in place.
    Scalar tables stream per NB-node block through the (sequential)
    grid.  ``NW`` > 0 additionally emits the (N, NW, 128) boundary
    checkpoint plane (forward pass of a windowed-remat round).
    Returns (words, scores, ring, ckpt-or-None)."""
    assert not (NW and ablate not in ("", "noword")), \
        "ckpt emission only composes with the noword fast path"
    Rp = n // LANES
    NB = _node_block(N)
    kernel = functools.partial(_poa_kernel, NB=NB, Rp=Rp, W=W,
                               max_in=max_in, params=params, NW=NW,
                               ablate=ablate)
    out_shape = [
        jax.ShapeDtypeStruct((N // 2, Rp, LANES),
                             jnp.int32),  # words (2 nodes/int32)
        jax.ShapeDtypeStruct((1, N), jnp.int32),          # sink scores
        jax.ShapeDtypeStruct((W, 2 * Rp, LANES), jnp.int32),  # ring
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, NB), lambda b: (0, b),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [
        pltpu.VMEM((max_in, 2 * Rp, LANES), jnp.int32),  # gathered H+E
        pltpu.VMEM((1, 2 * Rp, LANES), jnp.int32),       # state staging
        pltpu.VMEM((1, Rp, LANES), jnp.int32),           # word staging
    ]
    if NW:
        out_shape.append(
            jax.ShapeDtypeStruct((N, NW, LANES), jnp.int32))  # ckpt
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((1, NW, LANES), jnp.int32))
    scratch += [
        pltpu.SemaphoreType.DMA((max_in,)),              # gather sems
        pltpu.SemaphoreType.DMA((3,)),                   # write sems
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(N // NB,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((max_in, NB), lambda b: (0, b),
                         memory_space=pltpu.SMEM),    # preds
            pl.BlockSpec((max_in, NB), lambda b: (0, b),
                         memory_space=pltpu.SMEM),    # pmask
            pl.BlockSpec((1, NB), lambda b: (0, b),
                         memory_space=pltpu.SMEM),    # bases
            pl.BlockSpec((4, NB), lambda b: (0, b),
                         memory_space=pltpu.SMEM),    # boundary fills
            pl.BlockSpec((1, 3), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),    # [n_real, base, col0]
            pl.BlockSpec((Rp, LANES), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),    # a chars
            pl.BlockSpec(memory_space=pl.ANY),        # state ring in
        ],
        out_shape=tuple(out_shape),
        out_specs=tuple(out_specs),
        input_output_aliases={6: 2},
        # the kernel's VMEM working set (gather buffer, staging, H/E/w
        # carries, row temporaries) scales with Rp and crosses the
        # compiler's default 16 MB scoped-vmem budget around Rp ~1300
        # (n ~165 kbp); raise the cap so the documented 200 kbp window
        # top (reference README.md:43-44) compiles -- v5e has 128 MB
        # VMEM and this kernel schedules its own DMAs
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        scratch_shapes=scratch,
    )(preds, pmask, bases, fills, scal, a2d, ring)
    if NW:
        words, scores, ring, ckpt = outs
        return words, scores, ring, ckpt
    words, scores, ring = outs
    return words, scores, ring, None


def _poa_round_call(preds, pmask, bases, fills, nreal, a2d,
                    N, n, W, max_in, params):
    """Single-call round (graph fits one words plane): zero rings in,
    chunk_base 0, col0 0."""
    Rp = n // LANES
    zero = jnp.zeros((W, 2 * Rp, LANES), jnp.int32)
    scal = jnp.concatenate(
        [nreal.astype(jnp.int32),
         jnp.zeros((1, 2), jnp.int32)], axis=1)
    words, scores, _, _ = _poa_chunk_call(
        preds, pmask, bases, fills, scal, a2d, zero,
        N, n, W, max_in, params)
    return words, scores


def _walk_bounded_ops(words_c, preds, row, j, state, align, base_row,
                      n):
    """Device traceback walk restricted to one node chunk: ``words_c``
    holds rows [base_row, base_row + NC); the walk runs until it leaves
    the chunk (row < base_row), finishes (j < 0), or runs off the
    virtual row (row < 0).  Returns the updated (row, j, state, align);
    the chunked driver rematerialises the next chunk's words and
    resumes (rematerialisation: the DP is cheaper to re-run per chunk
    than its O(N x n) traceback plane is to keep -- the same trade as
    jax.checkpoint).
    """
    words2 = words_c.reshape(words_c.shape[0], -1)

    def cond(st):
        row, j, state, align = st
        return jnp.logical_and(j >= 0, row >= base_row)

    def body(st):
        row, j, state, align = st
        rl = row - base_row
        w = (words2[rl >> 1, j] >> (16 * (rl & 1))) & 0xFFFF
        flags = w & 0xF
        h_type = flags >> 2
        e_ext = (flags >> 1) & 1
        f_ext = flags & 1
        h_pred = (w >> 4) & 0x3F
        e_pred = (w >> 10) & 0x3F

        def h_case(_):
            def diag(_):
                return (jnp.take(preds[row], h_pred) - 1, j - 1, 0,
                        align.at[j].set(row))

            def to_e(_):
                return (row, j, 1, align)

            def to_f(_):
                return (row, j, 2, align)

            return jax.lax.switch(h_type, [diag, to_e, to_f], None)

        def e_case(_):
            prow = jnp.take(preds[row], e_pred) - 1
            return (prow, j, jnp.where(e_ext == 1, 1, 0), align)

        def f_case(_):
            return (row, j - 1, jnp.where(f_ext == 1, 2, 0),
                    align.at[j].set(-1))

        return jax.lax.switch(state, [h_case, e_case, f_case], None)

    return jax.lax.while_loop(cond, body, (row, j, state, align))


@functools.partial(jax.jit, static_argnames=("n",))
def _walk_bounded(words_c, preds, row, j, state, align, base_row, n):
    return _walk_bounded_ops(words_c, preds, row, j, state, align,
                             base_row, n)


@functools.partial(jax.jit, static_argnames=("n", "NC"))
def _walk_bounded2(words_hi, words_lo, preds, row, j, state, align,
                   base_hi, n, NC):
    """Walk TWO adjacent chunks in one dispatch: chunk at ``base_hi``
    first, then -- when the walk exits into it -- the chunk at
    ``base_hi - NC`` under a device cond.  Halves the per-chunk host
    sync RTTs of the chunked backward (the alignment path crosses
    every chunk, ~50 of them at 200 kbp)."""
    row, j, state, align = _walk_bounded_ops(
        words_hi, preds, row, j, state, align, base_hi, n)
    base_lo = base_hi - NC

    def lo(args):
        r, jj, st, al = args
        return _walk_bounded_ops(words_lo, preds, r, jj, st, al,
                                 base_lo, n)

    in_lo = jnp.logical_and(
        jnp.logical_and(row >= base_lo, row < base_hi), j >= 0)
    return jax.lax.cond(in_lo, lo, lambda a: a, (row, j, state, align))


@functools.partial(jax.jit, static_argnames=("n",))
def _walk(words, preds, best_row, n_real, n):
    """Device traceback walk (the 3-state logic of msa_native._fuse's
    plane walk); returns align (n,) int32: aligned node row or -1."""
    words2 = words.reshape(words.shape[0], -1)

    def cond(st):
        row, j, state, align = st
        return jnp.logical_and(j >= 0, row >= 0)

    def body(st):
        row, j, state, align = st
        w = (words2[row >> 1, j] >> (16 * (row & 1))) & 0xFFFF
        flags = w & 0xF
        h_type = flags >> 2
        e_ext = (flags >> 1) & 1
        f_ext = flags & 1
        h_pred = (w >> 4) & 0x3F
        e_pred = (w >> 10) & 0x3F

        def h_case(_):
            def diag(_):
                return (jnp.take(preds[row], h_pred) - 1, j - 1, 0,
                        align.at[j].set(row))

            def to_e(_):
                return (row, j, 1, align)

            def to_f(_):
                return (row, j, 2, align)

            return jax.lax.switch(h_type, [diag, to_e, to_f], None)

        def e_case(_):
            prow = jnp.take(preds[row], e_pred) - 1
            return (prow, j, jnp.where(e_ext == 1, 1, 0), align)

        def f_case(_):
            return (row, j - 1, jnp.where(f_ext == 1, 2, 0),
                    align.at[j].set(-1))

        return jax.lax.switch(state, [h_case, e_case, f_case], None)

    align0 = jnp.full((n,), -1, jnp.int32)
    row, j, state, align = jax.lax.while_loop(
        cond, body, (best_row, n_real - 1, jnp.int32(0), align0))
    return align


# ---------------------------------------------------------------------
# Banded Pallas walk: the XLA walk above pays ~1.2 us of scalar HBM
# gather latency per step (r4 pipeline profile: 187 ms of the 50k
# round's ~450 ms wall -- bigger than the DP kernel's own 112 ms).
# Same cure as the PSA walk (ops/traceback._walk_kernel_packed): DMA a
# band of the word plane into SMEM and step through it with ~ns scalar
# reads; the preds table rides whole in SMEM (it is the walk's other
# per-step gather).
# ---------------------------------------------------------------------

_WBAND_R = 24   # band word-rows (x2 nodes each; multiple of 8)
_WBAND_S = 8    # band segments (x128 columns each; multiple of 8)


def _poa_walk_kernel(scal_ref, preds_ref, align0_ref, words_ref,
                     align_ref, band_ref, sem,
                     *, m_w, Rp, WS, band_r, U=4):
    """Single-program banded traceback walk over the pair-packed word
    plane (m_w = N//2 word-rows, Rp segments, 128 lanes).  Mirrors
    :func:`_walk`'s 3-state machine branchlessly; ``U`` sub-steps per
    while iteration amortise the ~46 ns loop floor (measured,
    scripts/walk_ablate2).  Pred jumps (diag/E moves) can land outside
    the band mid-body: those sub-steps STALL (no state change) and the
    next iteration's miss check refetches -- so every consumed word was
    read in-band."""
    del align0_ref   # aliased to align_ref (pre-filled with -1)
    n_real = scal_ref[0, 0]
    best_row = scal_ref[0, 1]

    def refetch(row, j):
        bi = pl.multiple_of(
            jnp.clip((((row >> 1) - (band_r - 9)) // 8) * 8, 0,
                     m_w - band_r), 8)
        seg = jnp.maximum(j, 0) >> 7
        s0 = pl.multiple_of(
            jnp.clip(((seg >> 3) << 3) - (WS - 8), 0, Rp - WS), 8)
        cp = pltpu.make_async_copy(
            words_ref.at[pl.ds(bi, band_r), pl.ds(s0, WS), :],
            band_ref, sem)
        cp.start()
        cp.wait()
        return bi, s0

    def cond(st):
        row, j, state, bi0, s0 = st
        return jnp.logical_and(j >= 0, row >= 0)

    def body(st):
        row, j, state, bi0, s0 = st
        live = jnp.logical_and(j >= 0, row >= 0)
        # refetch when the entry cell is out of band, or when the U
        # j-steps could leave it leftward (j moves at most 1/sub-step;
        # rows move by pred jumps, caught by the sub-step stall)
        miss = jnp.logical_and(live, jnp.logical_or(
            jnp.logical_or((row >> 1) < bi0,
                           (row >> 1) >= bi0 + band_r),
            jnp.logical_or((jnp.maximum(j - U, 0) >> 7) < s0,
                           (j >> 7) >= s0 + WS)))
        bi0, s0 = jax.lax.cond(miss, lambda _: refetch(row, j),
                               lambda _: (bi0, s0), None)

        for _ in range(U):
            r0 = jnp.maximum(row, 0)
            j0 = jnp.maximum(j, 0)
            li = (r0 >> 1) - bi0
            sg = (j0 >> 7) - s0
            inband = jnp.logical_and(
                jnp.logical_and(li >= 0, li < band_r),
                jnp.logical_and(sg >= 0, sg < WS))
            live = jnp.logical_and(
                jnp.logical_and(j >= 0, row >= 0), inband)
            li = jnp.clip(li, 0, band_r - 1)
            sg = jnp.clip(sg, 0, WS - 1)
            w = (band_ref[li, sg, j0 & 127] >> (16 * (r0 & 1))) & 0xFFFF
            flags = w & 0xF
            h_type = flags >> 2
            e_ext = (flags >> 1) & 1
            f_ext = flags & 1
            h_pred = (w >> 4) & 0x3F
            e_pred = (w >> 10) & 0x3F
            is_h = state == 0
            is_e = state == 1
            diag = jnp.logical_and(is_h, h_type == 0)
            hprow = preds_ref[jnp.clip(h_pred, 0, preds_ref.shape[0]
                                       - 1), r0] - 1
            eprow = preds_ref[jnp.clip(e_pred, 0, preds_ref.shape[0]
                                       - 1), r0] - 1
            write_j = jnp.logical_and(
                live, jnp.logical_or(diag, state == 2))

            @pl.when(write_j)
            def _():
                align_ref[0, j0] = jnp.where(diag, row, -1)

            new_row = jnp.where(diag, hprow,
                                jnp.where(is_e, eprow, row))
            new_j = jnp.where(jnp.logical_or(diag, state == 2),
                              j - 1, j)
            new_state = jnp.where(is_h, h_type,
                                  jnp.where(is_e, e_ext, 2 * f_ext))
            row = jnp.where(live, new_row, row)
            j = jnp.where(live, new_j, j)
            state = jnp.where(live, new_state, state)

        return row, j, state, bi0, s0

    st = (best_row, n_real - 1, jnp.int32(0),
          jnp.asarray(2 ** 30, jnp.int32),
          jnp.asarray(2 ** 30, jnp.int32))
    jax.lax.while_loop(cond, body, st)


@functools.partial(jax.jit, static_argnames=("n",))
def _walk_banded(words, preds_t, scal, n):
    """Banded-kernel counterpart of :func:`_walk`.  ``words`` is the
    pair-packed (N//2, Rp, LANES) int32 plane, ``preds_t`` the
    (max_in, N) int32 pred table (fits SMEM whole -- callers gate on
    size via :func:`_walk_banded_ok`), ``scal`` (1, 2) int32
    [n_real, best_row].  Returns align (n,) int32."""
    m_w, Rp, L = words.shape
    band_r = min(_WBAND_R, m_w)
    WS = min(_WBAND_S, Rp)
    kernel = functools.partial(_poa_walk_kernel, m_w=m_w, Rp=Rp,
                               WS=WS, band_r=band_r)
    align0 = jnp.full((1, n), -1, jnp.int32)
    align = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.SMEM((band_r, WS, L), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={2: 0},
    )(scal, preds_t, align0, words)
    return align[0]


def _poa_walk_bounded_kernel(scal_ref, preds_ref, words_ref,
                             out_ref, vals_ref, band_ref, sem,
                             *, m_w, Rp, WS, band_r, CAP, U=4):
    """Chunk-bounded banded walk: like :func:`_poa_walk_kernel` but the
    walk stops at the chunk floor (row < base), the column floor
    (j < col0 -- the words plane may be a col0-based window of the
    round's columns), and emits CONSUMED COLUMN VALUES (aligned row,
    or -1 for insertions) into a log instead of writing an (n,)-wide
    align buffer -- consumed j's are contiguous descending, so the
    caller scatters ``vals[:count]`` at ``j0 - t`` with one XLA op (an
    n-wide SMEM buffer would not fit at the 200 kbp window top).
    Exits early when the log fills (count within U of CAP); the
    chunked driver simply re-enters."""
    row0 = scal_ref[0, 0]
    j0 = scal_ref[0, 1]
    state0 = scal_ref[0, 2]
    base = scal_ref[0, 3]
    col0 = scal_ref[0, 4]

    def refetch(row, j):
        lr = jnp.maximum(row - base, 0)
        bi = pl.multiple_of(
            jnp.clip((((lr >> 1) - (band_r - 9)) // 8) * 8, 0,
                     m_w - band_r), 8)
        seg = jnp.maximum(j - col0, 0) >> 7
        s0 = pl.multiple_of(
            jnp.clip(((seg >> 3) << 3) - (WS - 8), 0, Rp - WS), 8)
        cp = pltpu.make_async_copy(
            words_ref.at[pl.ds(bi, band_r), pl.ds(s0, WS), :],
            band_ref, sem)
        cp.start()
        cp.wait()
        return bi, s0

    def cond(st):
        row, j, state, cnt, bi0, s0 = st
        # row - base < 2*m_w (and j - col0 < the plane's column count)
        # keeps an out-of-chunk/right-of-window entry a no-op (the
        # fused K-cell walk chains kernels unconditionally; without it
        # such an entry would spin on refetch misses forever: live
        # stays false, cnt never advances)
        return jnp.logical_and(
            jnp.logical_and(
                jnp.logical_and(j >= col0, j - col0 < Rp * 128),
                row >= base),
            jnp.logical_and(row - base < 2 * m_w, cnt < CAP - U))

    def body(st):
        row, j, state, cnt, bi0, s0 = st
        live0 = jnp.logical_and(j >= col0, row >= base)
        miss = jnp.logical_and(live0, jnp.logical_or(
            jnp.logical_or((jnp.maximum(row - base, 0) >> 1) < bi0,
                           (jnp.maximum(row - base, 0) >> 1)
                           >= bi0 + band_r),
            jnp.logical_or((jnp.maximum(j - U - col0, 0) >> 7) < s0,
                           ((j - col0) >> 7) >= s0 + WS)))
        bi0, s0 = jax.lax.cond(miss, lambda _: refetch(row, j),
                               lambda _: (bi0, s0), None)

        for _ in range(U):
            lr = row - base
            jl = jnp.maximum(j - col0, 0)
            li = (jnp.maximum(lr, 0) >> 1) - bi0
            sg = (jl >> 7) - s0
            inband = jnp.logical_and(
                jnp.logical_and(li >= 0, li < band_r),
                jnp.logical_and(sg >= 0, sg < WS))
            live = jnp.logical_and(
                jnp.logical_and(j >= col0, row >= base), inband)
            li = jnp.clip(li, 0, band_r - 1)
            sg = jnp.clip(sg, 0, WS - 1)
            w = (band_ref[li, sg, jl & 127]
                 >> (16 * (jnp.maximum(lr, 0) & 1))) & 0xFFFF
            flags = w & 0xF
            h_type = flags >> 2
            e_ext = (flags >> 1) & 1
            f_ext = flags & 1
            h_pred = (w >> 4) & 0x3F
            e_pred = (w >> 10) & 0x3F
            is_h = state == 0
            is_e = state == 1
            diag = jnp.logical_and(is_h, h_type == 0)
            lrc = jnp.clip(lr, 0, preds_ref.shape[1] - 1)
            hprow = preds_ref[jnp.clip(h_pred, 0, preds_ref.shape[0]
                                       - 1), lrc] - 1
            eprow = preds_ref[jnp.clip(e_pred, 0, preds_ref.shape[0]
                                       - 1), lrc] - 1
            consume = jnp.logical_and(
                live, jnp.logical_or(diag, state == 2))

            @pl.when(consume)
            def _():
                vals_ref[0, cnt] = jnp.where(diag, row, -1)

            new_row = jnp.where(diag, hprow,
                                jnp.where(is_e, eprow, row))
            new_j = jnp.where(jnp.logical_or(diag, state == 2),
                              j - 1, j)
            new_state = jnp.where(is_h, h_type,
                                  jnp.where(is_e, e_ext, 2 * f_ext))
            cnt = cnt + consume.astype(jnp.int32)
            row = jnp.where(live, new_row, row)
            j = jnp.where(live, new_j, j)
            state = jnp.where(live, new_state, state)

        return row, j, state, cnt, bi0, s0

    st = (row0, j0, state0, jnp.int32(0),
          jnp.asarray(2 ** 30, jnp.int32),
          jnp.asarray(2 ** 30, jnp.int32))
    row, j, state, cnt, _, _ = jax.lax.while_loop(cond, body, st)
    out_ref[0, 0] = row
    out_ref[0, 1] = j
    out_ref[0, 2] = state
    out_ref[0, 3] = cnt


def _walk_bounded_banded_ops(words_c, preds_c, row, j, state, align,
                             base, n, NC, col0=0):
    """Banded counterpart of :func:`_walk_bounded_ops`: words_c is the
    chunk's pair-packed (NC//2, Rp, LANES) int32 plane (columns
    [col0, col0 + Rp*128) of the round when windowed), preds_c the
    (max_in, NC) pred-table slice for rows [base, base+NC).  Returns
    the updated (row, j, state, align)."""
    m_w, Rp, L = words_c.shape
    band_r = min(_WBAND_R, m_w)
    WS = min(_WBAND_S, Rp)
    CAP = min(n + 16, NC + 4096)
    kernel = functools.partial(_poa_walk_bounded_kernel, m_w=m_w,
                               Rp=Rp, WS=WS, band_r=band_r, CAP=CAP)
    scal = jnp.stack([row, j, state,
                      jnp.asarray(base, jnp.int32),
                      jnp.asarray(col0, jnp.int32)]).reshape(1, 5)
    out, vals = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=(jax.ShapeDtypeStruct((1, 4), jnp.int32),
                   jax.ShapeDtypeStruct((1, CAP), jnp.int32)),
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.SMEM((band_r, WS, L), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )(scal, preds_c, words_c)
    row2, j2, state2, count = out[0, 0], out[0, 1], out[0, 2], out[0, 3]
    # consumed columns are j, j-1, ..., j-count+1; masked-out entries
    # scatter into a dump slot so a duplicate clipped index can never
    # race a real write
    t = jnp.arange(CAP, dtype=jnp.int32)
    idx = jnp.where(t < count, j - t, jnp.int32(n))
    align2 = jnp.concatenate([align, jnp.zeros((1,), align.dtype)])
    align2 = align2.at[idx].set(
        jnp.where(t < count, vals[0], 0), mode="drop")
    return row2, j2, state2, align2[:n]


def _walk_bounded_ok(NC, max_in, Rp):
    """Gate for the banded bounded walk (chunk planes): window
    alignment + the chunk pred-table/log SMEM budget."""
    import os
    if os.environ.get("TSTA_BANDED_MSA_WALK", "1") in ("", "0"):
        return False
    m_w = NC // 2
    return (NC % 2 == 0 and (m_w <= _WBAND_R or m_w % 8 == 0)
            and (Rp <= _WBAND_S or Rp % 8 == 0)
            and max_in * NC * 4 <= 256 * 1024)


@functools.partial(jax.jit, static_argnames=("n", "NC"))
def _walk_bounded_banded(words_c, preds_c, row, j, state, align, base,
                         n, NC, col0=0):
    return _walk_bounded_banded_ops(words_c, preds_c, row, j, state,
                                    align, base, n, NC, col0)


@functools.partial(jax.jit, static_argnames=("n", "NC"))
def _walk_bounded_bandedK(words_list, preds_list, row, j, state, align,
                          base_hi, n, NC, col0=0):
    """Walk K ADJACENT chunks (descending, same column window) in one
    dispatch: the device (row, j, state, align) scalars chain between
    the kernel calls with no host round-trip, dividing the chunked
    backward's per-chunk sync RTTs by K.  Every call runs
    unconditionally -- the bounded kernel's ``row - base < 2*m_w`` /
    ``j >= col0`` cond clauses make a call a no-op when the walk
    already finished (j < col0), CAP-exited in an earlier chunk, or
    jumped past this one entirely."""
    base = base_hi
    for words_c, preds_c in zip(words_list, preds_list):
        row, j, state, align = _walk_bounded_banded_ops(
            words_c, preds_c, row, j, state, align, base, n, NC, col0)
        base = base - NC
    return row, j, state, align


def _ckpt_windows(n):
    """Number of checkpoint column windows for a windowed-remat round
    (0 = disabled): the window width n/NWIN must be a multiple of 1024
    so CWs = width/128 is a multiple of 8 (band-walk geometry and DMA
    sublane tiling)."""
    if n % 1024:
        return 0
    k = n // 1024
    for d in (8, 7, 6, 5, 4, 3, 2):
        if k % d == 0:
            return d
    return 0


@jax.jit
def _win_fills(ck_c, hb_full, predsT_c, pmaskT_c, b, col0, e_, o_):
    """Boundary fills for a windowed remat (window starting at column
    ``col0``, checkpoint boundary ``b`` = window-1): diag H fill/argmax
    from the PREDS' checkpointed H(p, col0-1) (virtual pred = the
    analytic boundary row), F seed q_b and f_ext fill F(v, col0-1)
    from the node's own checkpoint lanes 126/125."""
    qf = ck_c[:, b, LANES - 2]
    ff = ck_c[:, b, LANES - 3]
    hbp = hb_full[jnp.maximum(predsT_c - 1, 0), b]   # (max_in, NC)
    virt = predsT_c == 0
    vals = jnp.where(pmaskT_c != 0,
                     jnp.where(virt, o_ + col0 * e_, hbp),
                     NEG32)
    fillh = vals.max(axis=0)
    fillarg = jnp.argmax(vals, axis=0).astype(jnp.int32)
    return jnp.stack([fillh, fillarg, qf, ff])


@functools.partial(jax.jit, static_argnames=("Rp", "CWs"))
def _ring_window(snap, w, Rp, CWs):
    """Column-window slice of a ring snapshot: H segments
    [w*CWs, (w+1)*CWs) stacked over the E segments at [Rp + ...)."""
    h = jax.lax.dynamic_slice_in_dim(snap, w * CWs, CWs, axis=1)
    e = jax.lax.dynamic_slice_in_dim(snap, Rp + w * CWs, CWs, axis=1)
    return jnp.concatenate([h, e], axis=1)


def _walk_banded_ok(N, max_in, n, Rp):
    """Gate for the banded walk: everything it parks in SMEM (preds
    table + align row + band) must fit alongside the ~1 MB budget, and
    the window geometry needs aligned starts."""
    import os
    if os.environ.get("TSTA_BANDED_MSA_WALK", "1") in ("", "0"):
        return False
    m_w = N // 2
    smem = (N * max_in + n + min(_WBAND_R, m_w) * min(_WBAND_S, Rp)
            * LANES + 64) * 4
    return (N % 2 == 0 and smem <= 832 * 1024
            and (m_w <= _WBAND_R or m_w % 8 == 0)
            and (Rp <= _WBAND_S or Rp % 8 == 0))


def _hm1_native(N_real, max_in, preds, lens, e_, o_, hm1) -> bool:
    """Run the H(v,-1) recurrence in C (native/poa_fast.c); False when
    the library is unavailable (caller falls back to Python)."""
    import os
    if os.environ.get("TSTA_NATIVE_TOPO", "1") in ("", "0"):
        return False
    try:
        from tsta_tpu.native.build import load_poa
        lib = load_poa()
    except Exception:  # pragma: no cover - toolchain-less host
        return False
    import ctypes
    lens64 = np.ascontiguousarray(lens, np.int64)
    preds32 = np.ascontiguousarray(preds, np.int32)
    lib.tsta_poa_hm1(
        N_real, max_in,
        preds32.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lens64.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        int(e_), int(o_),
        hm1.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
    return True


def _prepare(g, params):
    """Dense tensors for the kernel (host side; mirrors
    msa_native._prepare_round but flattens boundaries per pred)."""
    order = g.topo
    N_real = len(order)
    max_in = max(1, g.max_in_degree())
    if max_in > 64:
        raise ValueError(
            "POA kernel traceback packs predecessor indices into 6 bits "
            "(in-degree %d > 64; the reference caps at 42); use the scan "
            "engine (TSTA_MSA_KERNEL=scan)" % max_in)
    max_in = _next_pow2(max_in)   # bound recompiles as in-degree grows
    # node-count bucketing bounds recompiles as the graph grows; padded
    # nodes have pmask 0 everywhere, their DP rows are garbage that no
    # real node reads (they sit after every real node in topo order) and
    # their ring writes only touch slots no longer referenced.  N is a
    # multiple of the SMEM streaming block.
    N = bucket(N_real)
    nb = _node_block(N)
    N = -(-N // nb) * nb
    e_, o_ = params.gap_extend, params.gap_open

    # vectorised dense tensors (the per-node Python loop was a visible
    # host fraction at 50k+ nodes); pred ORDER is preserved -- the
    # argmax tie-breaking depends on it.  The node-order CSR comes from
    # the graph's cache (shared with toposort; the flatten of the
    # Python adjacency lists was ~20 ms/round at 50k) and is gathered
    # into topo order here.
    order_arr = np.asarray(order, np.int64)
    pos = np.empty(len(g), np.int64)
    pos[order_arr] = np.arange(N_real)
    nd_all, ptr_all, flat_all = g.csr()[:3]
    lens = nd_all[order_arr]
    n_edges = int(lens.sum())
    rowi = np.repeat(np.arange(N_real), lens)
    coli = np.arange(n_edges) - np.repeat(np.cumsum(lens) - lens, lens)
    flat = flat_all[np.repeat(ptr_all[order_arr], lens) + coli]
    preds = np.zeros((N, max_in), np.int32)
    pmask = np.zeros((N, max_in), np.int32)
    preds[rowi, coli] = pos[flat] + 1
    pmask[rowi, coli] = 1
    src_rows = np.where(lens == 0)[0]
    pmask[src_rows, 0] = 1            # sources read the virtual row 0
    bases = np.zeros((N, 1), np.int32)
    bases[:N_real, 0] = g._bases[order_arr].astype(np.int32)
    maxdist = int(max(1, (rowi - pos[flat]).max())) if n_edges else 1
    # boundary H(v,-1): sequential topo recurrence over preds
    # (native/poa_fast.c tsta_poa_hm1; the Python chain-run
    # vectorisation below remains the fallback)
    hm1 = np.full((N + 1,), NEG, np.int64)
    hm1[0] = 0
    if not _hm1_native(N_real, max_in, preds, lens, e_, o_, hm1):
        chain = np.zeros((N_real,), bool)
        if N_real:
            chain = (lens == 1) & (preds[:N_real, 0]
                                   == np.arange(N_real))
        breakers = np.flatnonzero(~chain)
        nxt = 0
        for i in breakers:
            if i > nxt:   # chain run [nxt, i): ramp from hm1[nxt]
                hm1[nxt + 1:i + 1] = (hm1[nxt]
                                      + e_ * np.arange(1, i - nxt + 1))
            li = lens[i]
            hm1[i + 1] = (o_ + e_ if li == 0
                          else hm1[preds[i, :li]].max() + e_)
            nxt = i + 1
        if N_real > nxt:
            hm1[nxt + 1:N_real + 1] = (
                hm1[nxt] + e_ * np.arange(1, N_real - nxt + 1))
    hm1 = hm1.astype(np.int32)
    # boundary fill table (4, N): the kernel's left-boundary seeds per
    # node -- [0] diag H fill = max over valid preds of H(p,-1), [1]
    # its first-max argmax (h_pred fill), [2] F running-max seed
    # H(v,-1)+e, [3] f_ext F(v,-1) fill (no F left of column 0).
    # Window-mode remats replace these with checkpointed column
    # boundaries (_round_chunked); the values here are the col-0 case.
    hm1p = np.where(pmask.T != 0, hm1[preds.T], np.int32(NEG32))
    hm1own = hm1[1:N + 1]
    fills = np.stack([
        hm1p.max(axis=0),
        np.argmax(hm1p, axis=0).astype(np.int32),
        (hm1own + np.int32(e_)).astype(np.int32),
        np.full((N,), NEG32, np.int32),
    ]).astype(np.int32)
    W = 2
    while W < maxdist + 1:
        W *= 2
    W = min(W, _next_pow2(N + 1))
    return (preds.T.copy(), pmask.T.copy(), bases.reshape(1, N),
            fills, N, max_in, W, order, preds)


def _next_pow2(v):
    w = 1
    while w < v:
        w *= 2
    return w


def _node_block(N):
    """Nodes per grid step (SMEM window size); divides N by design."""
    return min(512, N)


@functools.partial(jax.jit, static_argnames=("n",))
def _best_and_walk_banded(words, preds_t, scores, sink_mask, n_real, n):
    """Banded-walk variant of :func:`_best_and_walk` (one async chain:
    argmax -> banded Pallas walk)."""
    masked = jnp.where(sink_mask != 0, scores[0], NEG)
    best_row = jnp.argmax(masked).astype(jnp.int32)
    scal = jnp.stack([jnp.asarray(n_real, jnp.int32),
                      best_row]).reshape(1, 2)
    align = _walk_banded(words, preds_t, scal, n)
    return best_row, align


@functools.partial(jax.jit, static_argnames=("n",))
def _best_and_walk(words, preds, scores, sink_mask, n_real, n):
    """Device-side best-sink pick + traceback walk: lets the whole
    round (DP kernel -> argmax -> walk) dispatch as ONE async chain
    with a single host sync, instead of a host round-trip between DP
    and walk (the tunneled TPU adds ~30 ms per sync)."""
    masked = jnp.where(sink_mask != 0, scores[0], NEG)
    best_row = jnp.argmax(masked).astype(jnp.int32)
    align = _walk(words, preds, best_row, n_real, n)
    return best_row, align


@jax.jit
def pack_round(scores, align, best_row):
    """ONE transfer per MSA round: [best_row, best_score, align...].

    The caller previously read best_row, scores and align separately --
    three device->host reads at ~30 ms tunnel RTT each, ~90 ms/round of
    pure latency (the 5x5k example spends 4 rounds; cf. the traced
    finish's identical fix in psa_pallas)."""
    head = jnp.stack([best_row.astype(jnp.int32),
                      scores[0, best_row].astype(jnp.int32)])
    return jnp.concatenate([head, align.astype(jnp.int32)])


def _hbm_budget() -> int:
    """Usable HBM bytes, derived from the device when it reports them
    (round-2 verdict: do not hard-code the 16 GB chip)."""
    import os
    env = os.environ.get("TSTA_HBM_BUDGET_GB")
    if env:
        return int(float(env) * 2 ** 30)
    try:
        stats = jax.devices()[0].memory_stats() or {}
        lim = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if lim:
            return int(lim * 0.85)
    except Exception:  # pragma: no cover - backend-dependent
        pass
    return 12 * 2 ** 30


def _round_plan(N: int, n: int, W: int):
    """Decide how a round's DP fits the chip.

    Returns ``None`` for the single-call path (whole words plane fits
    comfortably) or the node-chunk size ``NC`` for the chunked
    checkpoint/rematerialise path that lifts the O(N x n) plane out of
    HBM entirely (ROADMAP 'native-MSA length ceiling': the reference
    handles 50-200 kbp via host-RAM planes, c-t-simd.c:1003-1017; the
    TPU-native equivalent is remat, not host spill).  Raises only when
    even the chunked working set cannot fit.
    """
    budget = _hbm_budget()
    if 2 * N * n <= int(0.5 * budget):
        return None
    nb = _node_block(N)
    # largest power-of-two chunk whose words plane stays under a quarter
    # of the budget (the backward walk keeps TWO chunk planes alive:
    # words_last + the rematerialised chunk) -- fewest chunks = fewest
    # ~30 ms dispatch round-trips through the tunnel; pow2 quantisation
    # shares kernel compiles across rounds/problems (remote compiles
    # are minutes each)
    NC = nb
    while 2 * (NC * 2) * n <= budget // 4 and NC * 2 < _next_pow2(N):
        NC *= 2
    nchunks = -(-N // NC)
    if nchunks <= 1:
        # cannot subdivide (N <= one chunk): chunking buys nothing and
        # its 2-plane walk accounting would DOUBLE the requirement --
        # run single-call if the one plane fits at all (found by
        # differential fuzz at tiny TSTA_HBM_BUDGET_GB: budgets between
        # 0.5x and 0.8x of the plane hit a spurious raise)
        if 2 * N * n + 8 * W * n <= int(0.8 * budget):
            return None
        raise ValueError(
            "native MSA round cannot fit the chip (%d nodes x %d cols, "
            "ring W=%d, ~%.2f MB plane vs %.2f MB budget); use "
            "engine='compat' (host-RAM planes) for reads this long"
            % (N, n, W, 2 * N * n / 2 ** 20, budget / 2 ** 20))
    # + the windowed-remat boundary-checkpoint plane (NWIN windows x
    # 128 lanes x 4 B per node; emitted by the forward when enabled)
    need = (4 * NC * n + (nchunks + 1) * 8 * W * n
            + _ckpt_windows(n) * LANES * 4 * nchunks * NC)
    if need > int(0.8 * budget):
        raise ValueError(
            "native MSA round cannot fit the chip even chunked "
            "(%d nodes x %d cols, ring W=%d, ~%.1f GB working set); "
            "use engine='compat' (host-RAM planes) for reads this long"
            % (N, n, W, need / 2 ** 30))
    return NC


def _prep_round(g, seq: bytes, params):
    """Shared prep: prepared tensors + the round's memory plan."""
    if len(seq) == 0:
        raise ValueError("cannot align an empty read")
    p = (params.match, params.mismatch, params.gap_extend,
         params.gap_open)
    prep = _prepare(g, params)
    N, W = prep[4], prep[6]
    n_real = len(seq)
    n = bucket(n_real)   # bucket() returns LANES multiples already
    if n > 16384:
        # long-read rounds: coarser column bucket so reads of nearby
        # lengths share one kernel compile (remote compiles are minutes)
        n = -(-n // 8192) * 8192
    NC = _round_plan(N, n, W)
    a = np.zeros((n,), np.uint8)
    a[:n_real] = np.frombuffer(bytes(seq), np.uint8)
    a2d = jnp.asarray(a.astype(np.int32).reshape(n // LANES, LANES))
    return p, prep, n, n_real, NC, a2d


def _dispatch_round(g, seq: bytes, params):
    """Single-call prep + kernel dispatch: returns
    (words, scores, order, preds, n, n_real).  Rounds whose words plane
    exceeds the HBM plan must go through round_dp_fused (chunked)."""
    p, prep, n, n_real, NC, a2d = _prep_round(g, seq, params)
    (predsT, pmaskT, bases, fills, N, max_in, W,
     order, preds) = prep
    if NC is not None:
        raise ValueError(
            "round words plane exceeds the HBM plan (%d nodes x %d "
            "cols); use round_dp_fused, which chunks + rematerialises"
            % (N, n))
    words, scores = _poa_round_call(
        jnp.asarray(predsT), jnp.asarray(pmaskT), jnp.asarray(bases),
        jnp.asarray(fills),
        jnp.asarray([[n_real]], dtype=np.int32),
        a2d, N, n, W, max_in, p)
    return words, scores, order, preds, n, n_real


def _round_chunked(g, seq: bytes, params, p, prep, n, n_real, NC, a2d):
    """Length-ceiling mode: forward DP in node chunks with ring-state
    checkpoints, then a backward walk that rematerialises each chunk's
    traceback words on device (never holding more than one chunk's
    O(NC x n) plane in HBM).

    The reference covers its 50-200 kbp window with host-RAM traceback
    planes (c-t-simd.c:1003-1017) at host-memory bandwidth; the
    TPU-native equivalent is checkpoint/recompute -- the DP re-run per
    chunk costs less than one extra plane round-trip through hostmem.

    Returns (scores_2d, align, best_row, order) -- the round_dp_fused
    contract (numpy-backed; the chunk loop already synced).
    """
    import os
    import time as _time
    prof = os.environ.get("TSTA_POA_PROFILE", "") not in ("", "0")
    (predsT, pmaskT, bases, fills, N, max_in, W,
     order, preds) = prep
    nchunks = -(-N // NC)
    Np = nchunks * NC
    if Np != N:   # pad tables so every chunk is full-size (one compile)
        pad = Np - N
        predsT = np.concatenate(
            [predsT, np.zeros((max_in, pad), predsT.dtype)], axis=1)
        pmaskT = np.concatenate(
            [pmaskT, np.zeros((max_in, pad), pmaskT.dtype)], axis=1)
        bases = np.concatenate(
            [bases, np.zeros((1, pad), bases.dtype)], axis=1)
        fills = np.concatenate(
            [fills, np.full((4, pad), NEG32, fills.dtype)], axis=1)
    Rp = n // LANES
    Rp_w = Rp
    banded_w = _walk_bounded_ok(NC, max_in, Rp_w)
    # windowed remat: the forward emits per-node column-boundary
    # checkpoints (NWIN windows) so the backward can rematerialise just
    # the ~1/NWIN column window the walk is in, instead of the whole
    # O(NC x n) chunk plane (the remat was ~half the round's device
    # time at the 200 kbp window top)
    NWIN = 0
    if (banded_w and nchunks > 1
            and os.environ.get("TSTA_WINDOWED_REMAT", "1")
            not in ("", "0")):
        NWIN = _ckpt_windows(n)
        if NWIN > 1:
            CWs = Rp // NWIN
            if not _walk_bounded_ok(NC, max_in, CWs):
                NWIN = 0
        if NWIN <= 1:
            NWIN = 0
    CWs = Rp // NWIN if NWIN else 0
    CW = CWs * LANES
    ring = jnp.zeros((W, 2 * Rp, LANES), jnp.int32)
    snaps = []          # ring state at each chunk's ENTRY
    score_parts = []
    ckpts = []
    words_last = None
    t_fwd0 = _time.perf_counter()
    for c in range(nchunks):
        snaps.append(ring)
        sl = slice(c * NC, (c + 1) * NC)
        scal = jnp.asarray([[n_real, c * NC, 0]], dtype=np.int32)
        # windowed forward: emit checkpoints, skip the words plane (the
        # backward remats every window it walks, so forward words are
        # never read; dropping their flag math saves ~20% of the pass)
        words_c, sc, ring, ck = _poa_chunk_call(
            jnp.asarray(predsT[:, sl]), jnp.asarray(pmaskT[:, sl]),
            jnp.asarray(bases[:, sl]), jnp.asarray(fills[:, sl]),
            scal, a2d, ring,
            NC, n, W, max_in, p, NW=NWIN,
            ablate="noword" if NWIN else "")
        score_parts.append(sc)
        ckpts.append(ck)
        if not NWIN:
            words_last = words_c if c == nchunks - 1 else None
    scores = np.concatenate([np.asarray(s) for s in score_parts],
                            axis=1)[:, :Np]
    if prof:
        print("[poa_chunked] forward %d chunks (NC=%d, n=%d, W=%d, "
              "NWIN=%d): %.3f s" % (nchunks, NC, n, W, NWIN,
                                    _time.perf_counter() - t_fwd0),
              flush=True)

    # best sink (host; scores already synced above)
    sink_mask = np.full((Np,), False)
    sink_mask[:len(order)] = np.isin(
        np.asarray(order, np.int64),
        np.fromiter(g.sinks(), np.int64))
    masked = np.where(sink_mask, scores[0], NEG)
    best_row = int(np.argmax(masked))

    # backward: rematerialise chunks on demand, walk inside each.
    # Pipelined like psa_pallas.psa_align_traced_chunked's backward
    # (r4): walk(c) is dispatched, THEN the speculative remat of chunk
    # c-1, THEN the host sync -- the walk almost always exits into the
    # adjacent chunk, so its remat executes while the host decodes and
    # dispatches (at 200 kbp the round has ~50 chunks; the serial
    # version paid a full remat wait per chunk on the critical path).
    # A pred jump that skips a chunk just drops one speculative plane.
    n_remat = [0]

    def remat(c):
        n_remat[0] += 1
        sl = slice(c * NC, (c + 1) * NC)
        scal = jnp.asarray([[n_real, c * NC, 0]], dtype=np.int32)
        words_c, _, _, _ = _poa_chunk_call(
            jnp.asarray(predsT[:, sl]), jnp.asarray(pmaskT[:, sl]),
            jnp.asarray(bases[:, sl]), jnp.asarray(fills[:, sl]),
            scal, a2d, snaps[c],
            NC, n, W, max_in, p)
        return words_c

    align = jnp.full((n,), -1, jnp.int32)
    row, j, state = best_row, n_real - 1, 0
    t_bwd0 = _time.perf_counter()
    n_sync = 0

    if NWIN:
        # ---- windowed backward: remat only the (NC x CW) cell the
        # walk is in, seeded from the forward's boundary checkpoints --
        predsT_dev = jnp.asarray(predsT)
        pmaskT_dev = jnp.asarray(pmaskT)
        bases_dev = jnp.asarray(bases)
        fills_dev = jnp.asarray(fills)
        e_, o_ = p[2], p[3]
        # (Np, NWIN) per-node boundary H (lane 127 of each slab):
        # window-w fills gather preds' rows from it
        hb_full = jnp.concatenate(
            [ck[:, :, LANES - 1] for ck in ckpts], axis=0)

        def remat_win(c, w):
            n_remat[0] += 1
            sl0, sl1 = c * NC, (c + 1) * NC
            scal = jnp.asarray([[n_real, c * NC, w * CW]],
                               dtype=np.int32)
            if w > 0:
                fills_cw = _win_fills(
                    ckpts[c], hb_full, predsT_dev[:, sl0:sl1],
                    pmaskT_dev[:, sl0:sl1], jnp.int32(w - 1),
                    jnp.int32(w * CW), jnp.int32(e_), jnp.int32(o_))
            else:
                fills_cw = fills_dev[:, sl0:sl1]
            ring_w = _ring_window(snaps[c], jnp.int32(w), Rp, CWs)
            a2d_w = jax.lax.dynamic_slice_in_dim(a2d, w * CWs, CWs, 0)
            words_c, _, _, _ = _poa_chunk_call(
                predsT_dev[:, sl0:sl1], pmaskT_dev[:, sl0:sl1],
                bases_dev[:, sl0:sl1], fills_cw, scal, a2d_w, ring_w,
                NC, CW, W, max_in, p)
            return words_c

        # K (chunk, window) cells fuse into one dispatch along the
        # dominant chunk-descending direction; window planes are NWIN x
        # smaller than chunk planes, so K can run deeper.  Cap K by
        # GEOMETRY as well as memory (r5): a near-diagonal path crosses
        # a CW-column window in ~CW rows = ceil(CW/NC) chunks, so any
        # deeper chain remats planes the walk exits the window before
        # reaching -- at the 200 kbp shape the budget allowed K=8 but
        # the walk consumed ~3-4 per sync (65 remats/round profiled;
        # geometric K=4 cuts ~0.5 s/round of pure remat waste).
        # Vertical-heavy paths just take a second sync per window,
        # which costs one RTT instead of 4 wasted window DPs.
        K_geo = -(-CW // NC) + 1
        K = max(1, min(8, K_geo,
                       int(_hbm_budget() // 2 // (2 * NC * CW)) - 1))
        pending: dict = {}
        n_hit = 0
        while row >= 0 and j >= 0:
            n_sync += 1
            c = row // NC
            w = min(j // CW, NWIN - 1)
            lo = max(c - K + 1, 0)
            cells = [(cc, w) for cc in range(c, lo - 1, -1)]
            words = [pending.pop(cell, None) for cell in cells]
            n_hit += sum(wd is not None for wd in words)
            pending.clear()   # drop stale speculative planes
            words = [wd if wd is not None else remat_win(cc, ww)
                     for wd, (cc, ww) in zip(words, cells)]
            preds_l = [predsT_dev[:, cc * NC:(cc + 1) * NC]
                       for cc, _ in cells]
            if len(cells) > 1:
                pend_walk = _walk_bounded_bandedK(
                    words, preds_l, jnp.int32(row), jnp.int32(j),
                    jnp.int32(state), align, jnp.int32(c * NC), n, NC,
                    jnp.int32(w * CW))
            else:
                pend_walk = _walk_bounded_banded(
                    words[0], preds_l[0], jnp.int32(row), jnp.int32(j),
                    jnp.int32(state), align, jnp.int32(c * NC), n, NC,
                    jnp.int32(w * CW))
            # speculative next cell, rematted while the host syncs this
            # chain: a near-diagonal walk consumes one row per column,
            # so from (row, j) it would land at row - dj after the dj
            # columns left in this window -- if that stays inside the
            # chain's row span the walk exits LEFT into window w-1
            # there; otherwise it exits BELOW the chain in the same
            # window.  (The r4 straight-down (lo-1, w) guess almost
            # never hit on realistic reads; the n_hit counter in the
            # profile line keeps the prediction honest.)
            dj = j - w * CW + 1
            r_pred = row - dj
            if w > 0 and (lo == 0 or r_pred >= lo * NC):
                cell = (max(r_pred, 0) // NC, w - 1)
                pending[cell] = remat_win(*cell)
            elif lo > 0:
                pending[(lo - 1, w)] = remat_win(lo - 1, w)
            row_d, j_d, state_d, align = pend_walk
            row, j, state = int(row_d), int(j_d), int(state_d)
        if prof:
            print("[poa_chunked] windowed backward NWIN=%d K=%d: "
                  "%.3f s (%d syncs, %d remats, %d spec hits)"
                  % (NWIN, K, _time.perf_counter() - t_bwd0, n_sync,
                     n_remat[0], n_hit), flush=True)
        return scores, np.asarray(align), best_row, order

    preds_dev = None if banded_w else jnp.asarray(preds)
    pending = {}
    if words_last is not None:
        pending[nchunks - 1] = words_last
    # fused K-chunk banded windows keep K+1 planes alive (K window
    # members + the speculative remat): size K from the budget, fall
    # back to the one-chunk-per-sync loop when a third plane would not
    # fit.  Each window pays ONE host sync for K chunks' walks.
    K = 1
    if banded_w:
        K = max(1, min(4, int(_hbm_budget() // 2 // (2 * NC * n)) - 1))
    while row >= 0 and j >= 0:
        n_sync += 1
        c = row // NC
        lo = max(c - K + 1, 0)
        chunks = list(range(c, lo - 1, -1))
        words = [pending.pop(cc, None) for cc in chunks]
        pending.clear()   # drop stale speculative planes
        words = [w if w is not None else remat(cc)
                 for w, cc in zip(words, chunks)]
        words_c = words[0]
        if banded_w:
            # banded SMEM walk over the chunk plane (~10x the XLA
            # gather walk); align updates ride an XLA scatter of the
            # kernel's consumed-column log
            preds_l = [jnp.asarray(predsT[:, cc * NC:(cc + 1) * NC])
                       for cc in chunks]
            if len(chunks) > 1:
                pend_walk = _walk_bounded_bandedK(
                    words, preds_l, jnp.int32(row), jnp.int32(j),
                    jnp.int32(state), align, jnp.int32(c * NC), n, NC)
            else:
                pend_walk = _walk_bounded_banded(
                    words[0], preds_l[0], jnp.int32(row), jnp.int32(j),
                    jnp.int32(state), align, jnp.int32(c * NC), n, NC)
            if lo > 0:
                pending[lo - 1] = remat(lo - 1)
        elif c > 0:
            # two chunks per dispatch + one speculative remat: halves
            # the per-chunk sync RTTs AND keeps the next pair's first
            # plane computing during this sync (only 2 word planes are
            # ever live -- the budget sizes NC for exactly that)
            words_lo = remat(c - 1)
            pend_walk = _walk_bounded2(
                words_c, words_lo, preds_dev, jnp.int32(row),
                jnp.int32(j), jnp.int32(state), align,
                jnp.int32(c * NC), n, NC)
            if c > 1:
                pending[c - 2] = remat(c - 2)
        else:
            pend_walk = _walk_bounded(
                words_c, preds_dev, jnp.int32(row), jnp.int32(j),
                jnp.int32(state), align, jnp.int32(c * NC), n)
        row_d, j_d, state_d, align = pend_walk
        row, j, state = int(row_d), int(j_d), int(state_d)
    if prof:
        print("[poa_chunked] backward K=%d: %.3f s (%d syncs, %d "
              "remats)" % (K, _time.perf_counter() - t_bwd0, n_sync,
                           n_remat[0]), flush=True)
    return scores, np.asarray(align), best_row, order


def round_dp_fused(g, seq: bytes, params):
    """One MSA round fully on device: DP + best-sink pick + traceback
    walk dispatch as one async chain with a single host sync point.

    Returns ``(scores, align, best_row, order)`` where ``scores`` is the
    DEVICE (1, N) sink-score array (N = padded node count; index as
    ``scores[0, row]``), ``align`` the device (n,) per-column aligned
    node rows (slice to ``[:len(seq)]``), ``best_row`` the device scalar
    best sink row, and ``order`` the topo node order.  The caller's
    ``np.asarray``/``int()`` reads are the round's only blocking point.
    """
    p, prep, n, n_real, NC, a2d = _prep_round(g, seq, params)
    (predsT, pmaskT, bases, fills, N, max_in, W,
     order, preds) = prep
    if NC is not None:
        # length-ceiling mode: chunk + rematerialise (syncs internally;
        # numpy results satisfy the same contract)
        return _round_chunked(g, seq, params, p, prep, n, n_real, NC,
                              a2d)
    words, scores = _poa_round_call(
        jnp.asarray(predsT), jnp.asarray(pmaskT), jnp.asarray(bases),
        jnp.asarray(fills),
        jnp.asarray([[n_real]], dtype=np.int32),
        a2d, N, n, W, max_in, p)
    sink_mask = np.zeros((scores.shape[1],), np.int32)
    sink_mask[:len(order)] = np.isin(
        np.asarray(order, np.int64),
        np.fromiter(g.sinks(), np.int64)).astype(np.int32)
    if _walk_banded_ok(N, max_in, n, n // LANES):
        # banded SMEM walk: the XLA gather walk cost 187 ms of the 50k
        # round (r4 pipeline profile) -- more than the DP kernel itself
        best_row, align = _best_and_walk_banded(
            words, jnp.asarray(predsT), scores, jnp.asarray(sink_mask),
            jnp.int32(n_real), n)
    else:
        best_row, align = _best_and_walk(
            words, jnp.asarray(preds), scores, jnp.asarray(sink_mask),
            jnp.int32(n_real), n)
    return (scores, align, best_row, order)


def round_dp(g, seq: bytes, params):
    """One MSA round on device via the POA kernel.

    Returns ``(sink_scores, align_of, order, preds)``: host-side
    ``sink_scores`` (len(order),), a callable ``align_of(best_row) ->
    (n_real,) aligned node rows`` running the device walk, the topo
    ``order``, and the dense ``preds`` tensor.  (The scan engine's
    counterpart is _scan_engine_round + a host walk; this entry trades
    the packed planes for a device walk.)
    """
    words, scores, order, preds, n, n_real = _dispatch_round(
        g, seq, params)
    scores_np = np.asarray(scores)[0, :len(order)]  # drop padded nodes

    preds_dev = jnp.asarray(preds)

    def align_of(best_row: int) -> np.ndarray:
        al = _walk(words, preds_dev, jnp.int32(best_row),
                   jnp.int32(n_real), n)
        return np.asarray(al)[:n_real]

    return scores_np, align_of, order, preds
