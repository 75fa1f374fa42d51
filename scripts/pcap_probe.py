"""Probe the traced packed kernel's P cap now that the 16 MB scoped-VMEM
default is lifted: does P=16 (S=1280) compile + beat 2x P=8 groups?

PYTHONPATH="/root/repo:$PYTHONPATH" timeout 560 python scripts/pcap_probe.py
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
    from tsta_tpu.ops import psa_diff

    p = (2, -5, -2, -4)
    ln = 10240
    rng = np.random.default_rng(1)
    bases = np.frombuffer(b"ACGT", np.uint8)

    n_pad = psa_diff._traced_n_pad(ln)
    m_pad = -(-ln // psa_diff.T_R) * psa_diff.T_R
    Rp = n_pad // psa_diff.LANES

    def group(P, seed):
        r = np.random.default_rng(seed)
        S = P * Rp
        a8 = np.full((S, psa_diff.LANES), psa_diff.A_PAD, np.uint8)
        brows8 = np.full((m_pad, P), psa_diff.B_PAD, np.uint8)
        nm = np.zeros((P, 2), np.int32)
        for k in range(P):
            a = r.choice(bases, ln).astype(np.uint8)
            b = a.copy()
            mm = r.random(ln) < 0.05
            b[mm] = bases[r.integers(0, 4, mm.sum())]
            b = np.delete(b, r.integers(0, ln, ln // 50))
            arow = np.full(n_pad, psa_diff.A_PAD, np.uint8)
            arow[:len(a)] = a
            a8[k * Rp:(k + 1) * Rp] = arow.reshape(Rp, psa_diff.LANES)
            brows8[:len(b), k] = b
            nm[k] = (len(a), len(b))
        return (jnp.asarray(a8), jnp.asarray(brows8), jnp.asarray(nm))

    def barrier(*xs):
        return jax.lax.optimization_barrier(xs)

    @functools.partial(jax.jit, static_argnames=("P", "K"))
    def chainK(a8, brows8, nm, P, K):
        tot = jnp.int32(0)
        for _ in range(K):
            nm2, tot = barrier(nm, tot)
            out = psa_diff._traced_chain_ops(a8, brows8, nm2, n_pad,
                                             m_pad, P, p, True, True)
            tot = tot + out.sum()
        return tot

    for P in (8, 16):
        try:
            g = group(P, 3)
            f1 = functools.partial(chainK, *g, P=P, K=1)
            f3 = functools.partial(chainK, *g, P=P, K=3)
            int(f1())
            int(f3())
            b1 = b3 = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                int(f1())
                b1 = min(b1, time.perf_counter() - t0)
                t0 = time.perf_counter()
                int(f3())
                b3 = min(b3, time.perf_counter() - t0)
            per = (b3 - b1) / 2
            cells = P * ln * ln
            print(f"P={P:2d}: {per*1e3:6.1f} ms/group "
                  f"({cells/per/1e9:5.1f} GCUPS)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"P={P:2d}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
