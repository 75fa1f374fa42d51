"""RTT-free component timing of the traced chain (K-chained in one jit).

Components at the P=8, 10240 bp group shape:
  dp      : _psa_diff_traced_call alone
  bitcast : the plane reshape/bitcast feeding the walk
  walk    : _decode_moves_banded_packed alone (plane precomputed)
  chain   : DP + walk + pack (the real _traced_chain_ops)

PYTHONPATH="/root/repo:$PYTHONPATH" timeout 560 python scripts/chain_profile.py
"""
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/tsta_jax_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tsta_tpu.ops import psa_diff, traceback as tb

    p = (2, -5, -2, -4)
    ln = 10240
    P = 8
    rng = np.random.default_rng(1)
    bases = np.frombuffer(b"ACGT", np.uint8)
    pr = []
    for _ in range(P):
        a = rng.choice(bases, ln).astype(np.uint8)
        b = a.copy()
        mmask = rng.random(ln) < 0.05
        b[mmask] = bases[rng.integers(0, 4, mmask.sum())]
        b = np.delete(b, rng.integers(0, ln, ln // 50))
        pr.append((a, b))

    n_pad = psa_diff._traced_n_pad(ln)
    m_pad = -(-ln // psa_diff.T_R) * psa_diff.T_R
    Rp = n_pad // psa_diff.LANES
    S = P * Rp
    a8 = np.full((S, psa_diff.LANES), psa_diff.A_PAD, np.uint8)
    brows8 = np.full((m_pad, P), psa_diff.B_PAD, np.uint8)
    nm = np.zeros((P, 2), np.int32)
    for k, (a, b) in enumerate(pr):
        arow = np.full(n_pad, psa_diff.A_PAD, np.uint8)
        arow[:len(a)] = a
        a8[k * Rp:(k + 1) * Rp] = arow.reshape(Rp, psa_diff.LANES)
        brows8[:len(b), k] = b
        nm[k] = (len(a), len(b))
    a8j = jnp.asarray(a8)
    brows8j = jnp.asarray(brows8)
    nmj = jnp.asarray(nm)
    cells = sum(len(a) * len(b) for a, b in pr)

    def barrier(*xs):
        return jax.lax.optimization_barrier(xs)

    @functools.partial(jax.jit, static_argnames=("K",))
    def dpK(a8, brows8, nm, K):
        tot = jnp.int32(0)
        for _ in range(K):
            nm2, tot = barrier(nm, tot)
            sc, co, plane = psa_diff._psa_diff_traced_call(
                a8.astype(jnp.int32), brows8.astype(jnp.int32), nm2,
                n_pad, m_pad, P, p)
            tot = tot + sc.sum() + plane[0, 0, 0].astype(jnp.int32)
        return tot

    sc, co, plane0 = psa_diff._psa_diff_traced_call(
        a8j.astype(jnp.int32), brows8j.astype(jnp.int32), nmj,
        n_pad, m_pad, P, p)
    plane0.block_until_ready()
    _ = int(np.asarray(sc)[0, 0])

    @functools.partial(jax.jit, static_argnames=("K",))
    def bitcastK(plane, K):
        tot = jnp.int32(0)
        n_w_pair = n_pad // 4
        for _ in range(K):
            pl2, tot = barrier(plane, tot)
            w32 = jax.lax.bitcast_convert_type(
                pl2.reshape(m_pad, P * n_w_pair, 4), jnp.int32)
            tot = tot + w32[0, 0] + w32[-1, -1]
        return tot

    @functools.partial(jax.jit, static_argnames=("K",))
    def chainK(a8, brows8, nm, K):
        tot = jnp.int32(0)
        for _ in range(K):
            nm2, tot = barrier(nm, tot)
            out = psa_diff._traced_chain_ops(a8, brows8, nm2, n_pad,
                                             m_pad, P, p, True, True)
            tot = tot + out.sum()
        return tot

    def timeK(fn, args, K):
        f1 = functools.partial(fn, *args, K=1)
        fK = functools.partial(fn, *args, K=K)
        int(f1())
        int(fK())
        b1 = bK = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(f1())
            b1 = min(b1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            int(fK())
            bK = min(bK, time.perf_counter() - t0)
        return (bK - b1) / (K - 1)

    t_dp = timeK(dpK, (a8j, brows8j, nmj), 4)
    print(f"dp     : {t_dp*1e3:6.1f} ms  ({cells/t_dp/1e9:5.1f} GCUPS)",
          flush=True)
    t_ch = timeK(chainK, (a8j, brows8j, nmj), 4)
    print(f"chain  : {t_ch*1e3:6.1f} ms  ({cells/t_ch/1e9:5.1f} GCUPS)",
          flush=True)


if __name__ == "__main__":
    main()
