"""Column-sharded POA round DP for long reads.

BASELINE config 5: MSA over 50k-200kbp reads.  The POA graph lives
replicated on the host (models/poa_graph.py); each round's DP over
(graph rows x new-read columns) shards the *column* axis over the mesh
``seq`` axis, exactly like parallel/longseq.py shards pairwise rows:

* pipeline over blocks of T topo-ordered graph rows: at step s, device d
  processes block s - d;
* between steps, each device ppermutes to its right neighbour the
  right-edge H value of every row it just computed plus the running
  F-chain prefix ``max_k (C(k) - k*e)`` per row;
* the receiving device accumulates edge values into a per-row table --
  a row's predecessors can live many blocks back, so the table, not the
  packet, is indexed by pred row id;
* traceback planes come back column-sharded and are reassembled by
  shard_map's output spec; fusion happens on the host as usual.

Exact: verified against ops/msa_native.py on the virtual CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from tsta_tpu.ops.psa_scan import NEG

T_BLK = 32  # graph rows per pipeline step


@functools.partial(jax.jit,
                   static_argnames=("params", "N", "n", "max_in", "mesh_"))
def _round_dp_sharded(bases, preds, pmask, hm1, valid, a_sh, n_real,
                      params, N, n, max_in, mesh_):
    mesh = mesh_
    D = mesh.shape["seq"]
    C = n // D
    n_blocks = N // T_BLK
    steps = n_blocks + D - 1
    m_, x_, e_, o_ = (jnp.int32(params[0]), jnp.int32(params[1]),
                      jnp.int32(params[2]), jnp.int32(params[3]))

    def shard_fn(a_local):
        a_local = a_local.reshape(-1).astype(jnp.int32)
        d = jax.lax.axis_index("seq")
        first = d == 0
        vary = lambda x: jax.lax.pcast(x, "seq", to="varying")  # noqa: E731
        col = d * C + jnp.arange(C, dtype=jnp.int32)
        j_local = jnp.arange(C, dtype=jnp.int32)
        del j_local

        h_virtual = o_ + (col + 1) * e_
        Hbuf0 = jnp.full((N + 1, C), NEG, jnp.int32).at[0].set(h_virtual)
        Ebuf0 = vary(jnp.full((N + 1, C), NEG, jnp.int32))
        # left-edge H per buffer row: shard d reads values produced by
        # d-1; row 0 (virtual) = H(-1, left_edge-1)
        edge0 = jnp.where(first, hm1,
                          jnp.full((N + 1,), NEG, jnp.int32)
                          .at[0].set(o_ + (d * C) * e_))

        def one_row(i, Hbuf, Ebuf, leftH, leftG, leftF):
            base = bases[i]
            pr = jax.lax.dynamic_slice(preds, (i, 0), (1, max_in))[0]
            pm = jax.lax.dynamic_slice(pmask, (i, 0), (1, max_in))[0]
            hv_m1 = hm1[i + 1]
            Hp = jnp.take(Hbuf, pr, axis=0)
            Ep = jnp.take(Ebuf, pr, axis=0)
            pm_col = pm[:, None]
            # diagonal: H(p, j-1); lane 0 comes from the left-edge table
            fill = jnp.where(first, jnp.take(hm1, pr),
                             jnp.take(leftH, pr))
            diag_p = jnp.concatenate([fill[:, None], Hp[:, :-1]], axis=1)
            diag_p = jnp.where(pm_col, diag_p, NEG)
            sub = jnp.where(a_local == base, m_, x_)
            diag = jnp.max(diag_p, axis=0) + sub
            e_cand = jnp.maximum(Ep + e_, Hp + (o_ + e_))
            e_cand = jnp.where(pm_col, e_cand, NEG)
            e_row = jnp.max(e_cand, axis=0)
            e_pred = jnp.argmax(e_cand, axis=0).astype(jnp.int8)
            e_ext = (jnp.take_along_axis(
                Ep + e_, e_pred[None].astype(jnp.int32), axis=0)[0]
                == e_row)
            c = jnp.maximum(diag, e_row)
            g = c - col * e_
            seed = jnp.where(first, hv_m1 + e_, leftG[i])
            g_shift = jnp.concatenate([seed[None], g[:-1]])
            p = jax.lax.cummax(g_shift)
            f_row = o_ + col * e_ + p
            h_row = jnp.maximum(c, f_row)
            # F(v, local_col-1): at local column 0 this is the left
            # shard's F exit for this row (an F gap run may cross the
            # shard boundary); the first shard keeps the NEG fill like
            # the unsharded engine
            f_prev0 = jnp.where(first, jnp.int32(NEG), leftF[i])
            f_prev = jnp.concatenate([f_prev0[None], f_row[:-1]])
            f_ext = f_row == f_prev + e_
            h_type = jnp.where(h_row == diag, 0,
                               jnp.where(h_row == e_row, 1, 2))
            h_pred = jnp.argmax(diag_p, axis=0).astype(jnp.int8)
            packed = (h_type * 4 + e_ext.astype(jnp.int32) * 2
                      + f_ext.astype(jnp.int32)).astype(jnp.int8)
            gmax_out = jnp.maximum(seed, jnp.max(g))
            return (h_row, e_row, packed, h_pred, e_pred, gmax_out,
                    f_row[-1])

        def step_fn(carry, s):
            (Hbuf, Ebuf, leftH, leftG, leftF, planes, hpreds, epreds,
             sink) = carry
            nb = s - d
            active = jnp.logical_and(nb >= 0, nb < n_blocks)

            def run(args):
                Hbuf, Ebuf, planes, hpreds, epreds, sink = args
                out_edge = vary(jnp.zeros((T_BLK,), jnp.int32))
                out_g = vary(jnp.zeros((T_BLK,), jnp.int32))
                out_f = vary(jnp.zeros((T_BLK,), jnp.int32))

                def row_fn(r, st):
                    (Hbuf, Ebuf, planes, hpreds, epreds, sink, out_edge,
                     out_g, out_f) = st
                    i = nb * T_BLK + r
                    (h_row, e_row, packed, h_pred, e_pred, gmax,
                     f_exit) = one_row(i, Hbuf, Ebuf, leftH, leftG, leftF)
                    ok = valid[i]
                    Hbuf = jax.lax.cond(
                        ok, lambda B: jax.lax.dynamic_update_slice(
                            B, h_row[None], (i + 1, 0)), lambda B: B, Hbuf)
                    Ebuf = jax.lax.cond(
                        ok, lambda B: jax.lax.dynamic_update_slice(
                            B, e_row[None], (i + 1, 0)), lambda B: B, Ebuf)
                    planes = jax.lax.dynamic_update_slice(
                        planes, packed[None], (i, 0))
                    hpreds = jax.lax.dynamic_update_slice(
                        hpreds, h_pred[None], (i, 0))
                    epreds = jax.lax.dynamic_update_slice(
                        epreds, e_pred[None], (i, 0))
                    here = jnp.logical_and(col[0] <= n_real - 1,
                                           n_real - 1 <= col[-1])
                    sval = jnp.where(
                        jnp.logical_and(ok, here),
                        h_row[jnp.clip(n_real - 1 - d * C, 0, C - 1)],
                        jnp.int32(NEG))
                    sink = sink.at[i].set(jnp.maximum(sink[i], sval))
                    out_edge = out_edge.at[r].set(h_row[-1])
                    out_g = out_g.at[r].set(gmax)
                    out_f = out_f.at[r].set(f_exit)
                    return (Hbuf, Ebuf, planes, hpreds, epreds, sink,
                            out_edge, out_g, out_f)

                return jax.lax.fori_loop(
                    0, T_BLK, row_fn,
                    (Hbuf, Ebuf, planes, hpreds, epreds, sink, out_edge,
                     out_g, out_f))

            (Hbuf, Ebuf, planes, hpreds, epreds, sink, out_edge,
             out_g, out_f) = jax.lax.cond(
                active, run,
                lambda args: args + (vary(jnp.full((T_BLK,), NEG,
                                                   jnp.int32)),
                                     vary(jnp.full((T_BLK,), NEG,
                                                   jnp.int32)),
                                     vary(jnp.full((T_BLK,), NEG,
                                                   jnp.int32))),
                (Hbuf, Ebuf, planes, hpreds, epreds, sink))

            perm = [(i, (i + 1) % D) for i in range(D)]
            pkt_edge = jax.lax.ppermute(out_edge, "seq", perm)
            pkt_g = jax.lax.ppermute(out_g, "seq", perm)
            pkt_f = jax.lax.ppermute(out_f, "seq", perm)
            pkt_nb = nb  # the block id those values belong to
            # accumulate the received edge values for block (s - d + 1)-1
            # = the block our left neighbour just finished
            recv_nb = s - (d - 1)

            def scatter(args):
                leftH, leftG, leftF = args
                leftH = jax.lax.dynamic_update_slice(
                    leftH, pkt_edge, (recv_nb * T_BLK + 1,))
                leftG = jax.lax.dynamic_update_slice(
                    leftG, pkt_g, (recv_nb * T_BLK,))
                leftF = jax.lax.dynamic_update_slice(
                    leftF, pkt_f, (recv_nb * T_BLK,))
                return leftH, leftG, leftF

            leftH, leftG, leftF = jax.lax.cond(
                jnp.logical_and(d > 0,
                                jnp.logical_and(recv_nb >= 0,
                                                recv_nb < n_blocks)),
                scatter, lambda args: args, (leftH, leftG, leftF))
            del pkt_nb
            return (Hbuf, Ebuf, leftH, leftG, leftF, planes, hpreds,
                    epreds, sink), None

        planes0 = vary(jnp.zeros((N, C), jnp.int8))
        hpreds0 = vary(jnp.zeros((N, C), jnp.int8))
        epreds0 = vary(jnp.zeros((N, C), jnp.int8))
        sink0 = vary(jnp.full((N,), NEG, jnp.int32))
        init = (Hbuf0, Ebuf0, edge0,  # edge0 already varying (uses d)
                vary(jnp.full((N,), NEG, jnp.int32)),
                vary(jnp.full((N,), NEG, jnp.int32)), planes0, hpreds0,
                epreds0, sink0)
        carry, _ = jax.lax.scan(step_fn, init,
                                jnp.arange(steps, dtype=jnp.int32))
        _, _, _, _, _, planes, hpreds, epreds, sink = carry
        sink = jax.lax.pmax(sink, "seq")
        return sink[None], planes, hpreds, epreds

    fn = shard_map(shard_fn, mesh=mesh, in_specs=(P("seq"),),
                   out_specs=(P("seq"), P(None, "seq"), P(None, "seq"),
                              P(None, "seq")))
    sink, planes, hpreds, epreds = fn(a_sh)
    return sink[0], planes, hpreds, epreds


def round_dp_arrays(g, seq: bytes, params, mesh):
    """Sharded per-round DP returning DEVICE arrays (global jax.Arrays
    when the mesh spans processes -- the multi-host path must read
    planes shard-by-shard, never materialise them on one host).

    Returns (sink, planes, hpreds, epreds, order, preds, n) where sink/
    planes/hpreds/epreds are device arrays (planes sharded over the
    ``seq`` columns), ``order`` the topo node order, ``preds`` the dense
    host predecessor tensor, and ``n`` the padded column count.
    """
    from tsta_tpu.ops import msa_native
    from tsta_tpu.ops.psa_scan import bucket

    D = mesh.shape["seq"]
    (bases, preds, pmask, hm1, valid, N, N_real, max_in, pos,
     order) = msa_native._prepare_round(g, params)
    # pad N to the pipeline block, n to the shard width
    N_pad = -(-N // T_BLK) * T_BLK
    if N_pad != N:
        pad = N_pad - N
        bases = np.concatenate([bases, np.zeros(pad, bases.dtype)])
        preds = np.concatenate([preds, np.zeros((pad, max_in),
                                                preds.dtype)])
        pmask = np.concatenate([pmask, np.zeros((pad, max_in), bool)])
        pmask[N:, 0] = True  # point at the virtual row; rows are invalid
        hm1 = np.concatenate([hm1, np.full(pad, NEG, hm1.dtype)])
        valid = np.concatenate([valid, np.zeros(pad, bool)])
    n_real = len(seq)
    n = max(bucket(n_real), 128 * D)
    n = -(-n // (128 * D)) * (128 * D)
    a = np.zeros((n,), np.uint8)
    a[:n_real] = np.frombuffer(bytes(seq), np.uint8)
    p = (params.match, params.mismatch, params.gap_extend,
         params.gap_open)
    if jax.process_count() > 1:
        # each process contributes only its addressable column shards;
        # replicated inputs stay as (uncommitted) numpy so the
        # multi-controller runtime treats them as replicated values
        from jax.sharding import NamedSharding
        sh = NamedSharding(mesh, P("seq"))
        a_in = jax.make_array_from_callback((n,), sh, lambda idx: a[idx])
        as_dev = lambda x: x  # noqa: E731
    else:
        a_in = jnp.asarray(a)
        as_dev = jnp.asarray
    sink, planes, hpreds, epreds = _round_dp_sharded(
        as_dev(bases), as_dev(preds), as_dev(pmask),
        as_dev(hm1.astype(np.int32)), as_dev(valid),
        a_in, np.int32(n_real), p, N_pad, n, max_in, mesh)
    return sink, planes, hpreds, epreds, order, preds, n


def round_dp(g, seq: bytes, params, mesh):
    """Sharded replacement for msa_native's per-round device DP.

    Returns (sink_scores, packed, h_pred, e_pred) with the same contract
    as msa_native._round_dp (planes over real columns of ``seq``).
    Single-host only (materialises the planes); the multi-host driver is
    parallel/msa_multihost.py.
    """
    sink, planes, hpreds, epreds, order, preds, _ = round_dp_arrays(
        g, seq, params, mesh)
    return (np.asarray(sink), np.asarray(planes), np.asarray(hpreds),
            np.asarray(epreds), order, preds)
