"""Remote-DMA ring wavefront: one very long pair across chips.

The reference scales one pair only as far as one shared-memory node: its
anti-diagonal tile wavefront (/root/reference/psa/psa.c:619-639) hands
tile-edge state between pthread workers through globals, with a spin
barrier per diagonal (psa.c:638).  The TPU-native replacement for "many
workers, one DP matrix" is a *device pipeline over the ICI ring*
(SURVEY long-context plan (b)):

* the horizontal sequence (columns) is sharded over the mesh ``seq``
  axis, ``C = n/D`` columns per chip, laid out exactly like one pair of
  the packed kernel (ops/psa_diff.py): ``Rp = C/128`` segments down the
  sublane axis, 128 lanes per segment;
* rows advance in blocks of ``T``; chip ``d`` computes row-block ``rb``
  as soon as its left neighbor has finished ``rb`` -- the anti-diagonal
  wavefront, with the spin barrier replaced by a semaphore wait;
* the tile-edge state the reference passes through shared memory
  (psa.c:392-394, 412-414) becomes a per-block *edge packet*, pushed
  right with ``pltpu.make_async_remote_copy`` over ICI: per row, the H
  value at the sender's last column (the receiver's diagonal shift-in)
  and the inclusive running F-prefix ``max_k<C_right (C(k) - k*e)``
  (closed-form F, see ops/psa_scan.py).  2T int32 per block.

Unlike parallel/longseq.py (the ``shard_map`` + ``lax.ppermute``
pipeline, which syncs ALL devices with a collective every block and runs
its DP at XLA level), the ring kernel is one ``pallas_call`` per device
for the whole alignment: neighbor-only synchronisation, kernel-grade row
bodies, zero host round-trips between blocks.

Packet plumbing (per the measured v5e cost model in CLAUDE.md):

* outgoing per-row scalars are (1,1) static slices of the row tile,
  accumulated into (1, T) lane vectors with an ``iota == r`` select
  (cheap full-lane ops; no dynamic lane stores, which Mosaic lacks);
* the packet is RDMA'd into a per-device HBM comm buffer with one row
  per block (no slot reuse).  Each link keeps exactly ONE packet in
  flight: the receiver signals a remote ack semaphore after consuming
  a packet and the sender waits for it before the next send, so every
  recv-semaphore signal is bound to its block's data without assuming
  anything about delivery order (the threaded interpret scheduler, and
  DMA hardware in general, may complete concurrent copies out of
  order -- the assumption-free protocol costs one ack per block, fully
  overlapped with the receiver's compute);
* the receiver copies its block's packet row HBM -> SMEM with a local
  ``make_async_copy`` and reads per-row values as SMEM scalars (the
  same pattern as the banded traceback walk, ops/traceback.py).

Score-only, exact: reported score = max over all H cells and
corner = H(m-1, n-1), the reference's matrix-max semantics
(psa.c:330-357, 416-424).  Validated against the scan oracle and
parallel/longseq.py on a virtual 8-device CPU mesh (TPU interpret
mode, which simulates inter-chip DMA) in tests/test_psa_ring.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
try:
    from jax import shard_map  # jax >= 0.9
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from tsta_tpu.config import AlignParams
from tsta_tpu.io import encode_dna
from tsta_tpu.ops.psa_scan import A_PAD, B_PAD

LANES = 128
NEG32 = -(2 ** 28)


def _ring_kernel(b_ref, a_ref, cmask_ref, score_ref, corner_ref, comm_ref,
                 h_ref, e_ref, best_ref, corner32_ref, out_pkt_ref,
                 pkt_smem_ref, send_sem, recv_sem, copy_sem, ack_sem,
                 *, Rp, T, m_real, params):
    """Grid (m_blocks,); one device's (Rp, 128) column shard.

    comm_ref: (m_blocks, 2T) int32 in HBM -- row rb is the packet for
    row-block rb from the left neighbor (lanes [0,T) edge H of rows
    rb*T-1 .. rb*T+T-2; lanes [T,2T) inclusive F-prefix of rows
    rb*T .. rb*T+T-1).
    """
    m_, x_, e_, o_ = params
    d = jax.lax.axis_index("seq")
    nd = jax.lax.axis_size("seq")
    first = d == 0
    rb = pl.program_id(0)
    nblk = pl.num_programs(0)
    C = Rp * LANES

    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (Rp, LANES), 1)
    lane0m = lane_idx == 0
    lane_lt = {}
    k = 1
    while k < LANES:
        lane_lt[k] = lane_idx < k
        k *= 2
    seg_row = jax.lax.broadcasted_iota(jnp.int32, (Rp, 1), 0)
    seg0v = seg_row == 0
    origin = jnp.logical_and(lane0m, seg0v)    # this shard's first column
    seg_lt = {}
    k = 1
    while k < Rp:
        seg_lt[k] = seg_row < k
        k *= 2
    # GLOBAL column index: the F closed form and boundary formulas run in
    # global column space so the incoming prefix seeds compose exactly
    col_idx = d * C + seg_row * LANES + lane_idx
    colE = col_idx * e_
    oColE = o_ + colE
    pkt_lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)

    a32 = a_ref[:]
    cmask = cmask_ref[:]
    has_corner = jnp.max(cmask) > 0

    @pl.when(rb == 0)
    def _init():
        h_ref[:] = o_ + (col_idx + 1) * e_      # H(-1, col)
        e_ref[:] = jnp.full((Rp, LANES), NEG32, jnp.int32)
        best_ref[:] = jnp.full((Rp, LANES), NEG32, jnp.int32)
        corner32_ref[:] = jnp.full((Rp, 1), NEG32, jnp.int32)

    # --- receive this block's packet (left neighbor -> my comm row rb)
    recv_descr = pltpu.make_async_remote_copy(
        src_ref=out_pkt_ref,
        dst_ref=comm_ref.at[pl.ds(rb, 1), :],
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=jnp.minimum(d + 1, nd - 1),
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )

    @pl.when(jnp.logical_not(first))
    def _recv():
        recv_descr.wait_recv()
        cp = pltpu.make_async_copy(comm_ref.at[pl.ds(rb, 1), :],
                                   pkt_smem_ref, copy_sem)
        cp.start()
        cp.wait()
        # packet consumed: free the left neighbor's link for its next
        # send (one-in-flight protocol, see module docstring)
        pltpu.semaphore_signal(ack_sem, inc=1,
                               device_id=jnp.maximum(d - 1, 0),
                               device_id_type=pltpu.DeviceIdType.LOGICAL)

    def shift1(x, fill):
        """Shift one column right across the shard's linearised columns;
        the shard's first column gets ``fill`` (a (1,1) vector)."""
        a1 = pltpu.roll(x, shift=1, axis=1)
        a2 = pltpu.roll(a1, shift=1, axis=0)
        res = jnp.where(lane0m, a2, a1)
        return jnp.where(origin, jnp.broadcast_to(fill, res.shape), res)

    def row_body(r, carry):
        h_prev, e_prev, best, pkt_e, pkt_g = carry
        i = rb * T + r

        # edge packet, sender side: H(i-1, my last col) from the carry
        edge_prev = h_prev[Rp - 1:Rp, LANES - 1:LANES]
        pkt_e = jnp.where(pkt_lane == r, jnp.broadcast_to(edge_prev, (1, T)),
                          pkt_e)

        bv = b_ref[r, 0]
        sub = jnp.where(a32 == bv, m_, x_)

        bound_prev = jnp.where(i == 0, 0, o_ + i * e_)    # H(i-1, -1)
        bound_cur = o_ + (i + 1) * e_                     # H(i, -1)

        # diagonal shift-in for the shard's first column: global boundary
        # on shard 0, the left neighbor's edge H elsewhere
        fill_scalar = jnp.where(first, bound_prev, pkt_smem_ref[0, r])
        diag = shift1(h_prev, jnp.full((1, 1), 0, jnp.int32)
                      + fill_scalar) + sub
        e_row = jnp.maximum(e_prev + e_, h_prev + (o_ + e_))
        c = jnp.maximum(diag, e_row)

        # closed-form F: exclusive prefix max of y = C - col*e over
        # GLOBAL columns; the seed is the global boundary term on shard
        # 0 and the left neighbor's inclusive prefix elsewhere
        y = c - colE
        seed_scalar = jnp.where(first, bound_cur + e_,
                                pkt_smem_ref[0, T + r])
        p = shift1(y, jnp.full((1, 1), 0, jnp.int32) + seed_scalar)
        k = 1
        while k < LANES:
            p = jnp.maximum(
                p, jnp.where(lane_lt[k], NEG32,
                             pltpu.roll(p, shift=k, axis=1)))
            k *= 2
        # cross-segment inclusive pass (v1 form of ops/psa_diff.py):
        # t[s, 127] = max over segments <= s (seed included via p)
        t = jnp.maximum(p, y)
        k = 1
        while k < Rp:
            rolled = pltpu.roll(t, shift=k, axis=0)
            t = jnp.maximum(t, jnp.where(seg_lt[k], NEG32, rolled))
            k *= 2
        cyt = pltpu.roll(t, shift=1, axis=0)
        carry_seg = jnp.where(seg0v, NEG32, cyt[:, LANES - 1:LANES])
        f = oColE + jnp.maximum(p, carry_seg)
        h_row = jnp.maximum(c, f)

        # edge packet, sender side: inclusive global F-prefix at my
        # right edge for row i
        gmax_out = t[Rp - 1:Rp, LANES - 1:LANES]
        pkt_g = jnp.where(pkt_lane == r, jnp.broadcast_to(gmax_out, (1, T)),
                          pkt_g)

        valid = i < m_real
        best = jnp.where(valid, jnp.maximum(best, h_row), best)

        @pl.when(jnp.logical_and(valid, jnp.logical_and(i == m_real - 1,
                                                        has_corner)))
        def _corner():
            tmp = jnp.where(cmask != 0, h_row, NEG32)
            corner32_ref[:] = jnp.max(tmp, axis=1, keepdims=True)

        return h_row, e_row, best, pkt_e, pkt_g

    pkt0 = jnp.full((1, T), NEG32, jnp.int32)
    h_fin, e_fin, best_fin, pkt_e, pkt_g = jax.lax.fori_loop(
        0, T, row_body, (h_ref[:], e_ref[:], best_ref[:], pkt0, pkt0))
    h_ref[:] = h_fin
    e_ref[:] = e_fin
    best_ref[:] = best_fin

    # --- send this block's packet to the right neighbor
    @pl.when(d != nd - 1)
    def _send():
        out_pkt_ref[0:1, 0:T] = pkt_e
        out_pkt_ref[0:1, T:2 * T] = pkt_g
        recv_descr.start()
        recv_descr.wait_send()
        # wait for the receiver to consume before the next send: keeps
        # one packet in flight per link (the wait overlaps the
        # receiver's compute of this block, so steady state is
        # stall-free)
        pltpu.semaphore_wait(ack_sem, 1)

    @pl.when(rb == nblk - 1)
    def _finish():
        score_ref[0, 0] = jnp.max(best_ref[:])
        corner_ref[0, 0] = jnp.max(corner32_ref[:])


@functools.partial(jax.jit,
                   static_argnames=("params", "n", "m", "n_real", "m_real",
                                    "T", "mesh_", "interpret"))
def _ring_call(a_sh, b_all, cmask_sh, params, n, m, n_real, m_real, T,
               mesh_, interpret):
    mesh = mesh_
    D = mesh.shape["seq"]
    C = n // D
    Rp = C // LANES
    m_blocks = m // T

    def shard_fn(a_local, b_full, cmask_local):
        a32 = a_local.astype(jnp.int32).reshape(Rp, LANES)
        cm = cmask_local.reshape(Rp, LANES)
        b32 = b_full.astype(jnp.int32).reshape(m, 1)
        kernel = functools.partial(_ring_kernel, Rp=Rp, T=T,
                                   m_real=m_real, params=params)
        score, corner, _ = pl.pallas_call(
            kernel,
            grid=(m_blocks,),
            interpret=(pltpu.InterpretParams() if interpret else False),
            in_specs=[
                pl.BlockSpec((T, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),    # row chars
                pl.BlockSpec(memory_space=pltpu.VMEM),    # a chars
                pl.BlockSpec(memory_space=pltpu.VMEM),    # corner mask
            ],
            out_shape=(
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
                jax.ShapeDtypeStruct((m_blocks, 2 * T), jnp.int32),
            ),
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),        # comm buffer
            ),
            scratch_shapes=[
                pltpu.VMEM((Rp, LANES), jnp.int32),   # H frontier
                pltpu.VMEM((Rp, LANES), jnp.int32),   # E frontier
                pltpu.VMEM((Rp, LANES), jnp.int32),   # best
                pltpu.VMEM((Rp, 1), jnp.int32),       # corner
                pltpu.VMEM((1, 2 * T), jnp.int32),    # outgoing packet
                pltpu.SMEM((1, 2 * T), jnp.int32),    # incoming packet
                pltpu.SemaphoreType.DMA(()),          # send
                pltpu.SemaphoreType.DMA(()),          # recv
                pltpu.SemaphoreType.DMA(()),          # local HBM->SMEM
                pltpu.SemaphoreType.REGULAR,          # consumption ack
            ],
        )(b32, a32, cm)
        best = jax.lax.pmax(score[0, 0], "seq")
        corner = jax.lax.pmax(corner[0, 0], "seq")
        return best, corner

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P("seq"), P(), P("seq")),
                   out_specs=(P(), P()), check_vma=False)
    return fn(a_sh, b_all, cmask_sh)


def align_long_ring(a, b, params: AlignParams = AlignParams(), mesh=None,
                    T: int = 256, interpret=None):
    """Score-only alignment of one long pair via the ring wavefront
    kernel, columns sharded over the mesh ``seq`` axis.

    Returns ``(best, corner)`` with the reference's matrix-max
    semantics.  ``interpret`` defaults to True off-TPU (TPU interpret
    mode simulates the inter-chip DMAs on CPU meshes)."""
    if mesh is None:
        raise ValueError("align_long_ring requires a mesh with a 'seq' axis")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = (params.match, params.mismatch, params.gap_extend, params.gap_open)
    a = encode_dna(a)
    b = encode_dna(b)
    n_real, m_real = int(a.shape[0]), int(b.shape[0])
    if n_real < 1 or m_real < 1:
        raise ValueError("empty sequence")
    D = mesh.shape["seq"]
    n = -(-n_real // (LANES * D)) * (LANES * D)
    m = -(-m_real // T) * T
    a_p = np.full(n, A_PAD, np.uint8)
    a_p[:n_real] = a
    b_p = np.full(m, B_PAD, np.uint8)
    b_p[:m_real] = b
    cmask = (np.arange(n, dtype=np.int32) == n_real - 1).astype(np.int32)
    best, corner = _ring_call(jnp.asarray(a_p), jnp.asarray(b_p),
                              jnp.asarray(cmask), p, n, m, n_real, m_real,
                              T, mesh, bool(interpret))
    return int(best), int(corner)
