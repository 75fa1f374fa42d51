"""Clean walk timing: K serial walks inside one jit (RTT amortised).

PYTHONPATH="/root/repo:$PYTHONPATH" timeout 560 python scripts/walk_profile2.py
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


def pairs_of(kind, nb, ln, seed=1):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    out = []
    for _ in range(nb):
        a = rng.choice(bases, ln).astype(np.uint8)
        if kind == "random":
            b = rng.choice(bases, ln).astype(np.uint8)
        else:
            b = a.copy()
            m = rng.random(ln) < 0.05
            b[m] = bases[rng.integers(0, 4, m.sum())]
            b = np.delete(b, rng.integers(0, ln, ln // 50))
        out.append((a, b))
    return out


def main():
    from tsta_tpu.ops import psa_diff, traceback as tb

    p = (2, -5, -2, -4)
    ln = 10240
    P = 8
    n_pad = psa_diff._traced_n_pad(ln)
    m_pad = -(-ln // psa_diff.T_R) * psa_diff.T_R
    Rp = n_pad // psa_diff.LANES
    S = P * Rp

    @functools.partial(jax.jit, static_argnames=("K", "spec"))
    def walkK(plane, nm, K, spec):
        tot = jnp.int32(0)
        for _ in range(K):
            nm2, tot = jax.lax.optimization_barrier((nm, tot))
            w, c = tb._decode_moves_banded_packed(plane, nm2, Rp, spec)
            tot = tot + c.sum() + w[0, 0]
        return tot

    for kind in ("random", "realistic"):
        pr = pairs_of(kind, P, ln)
        a8 = np.full((S, psa_diff.LANES), psa_diff.A_PAD, np.uint8)
        brows8 = np.full((m_pad, P), psa_diff.B_PAD, np.uint8)
        nm = np.zeros((P, 2), np.int32)
        for k, (a, b) in enumerate(pr):
            arow = np.full(n_pad, psa_diff.A_PAD, np.uint8)
            arow[:len(a)] = a
            a8[k * Rp:(k + 1) * Rp] = arow.reshape(Rp, psa_diff.LANES)
            brows8[:len(b), k] = b
            nm[k] = (len(a), len(b))
        sc, co, plane = psa_diff._psa_diff_traced_call(
            jnp.asarray(a8, jnp.int32), jnp.asarray(brows8, jnp.int32),
            jnp.asarray(nm), n_pad, m_pad, P, p)
        _ = int(np.asarray(sc)[0, 0])
        nmj = jnp.asarray(nm)
        steps = int(np.asarray(tb._decode_moves_banded_packed(
            plane, nmj, Rp, True)[1]).sum())

        for spec in (True, False):
            ts = {}
            for K in (1, 5):
                def run():
                    return int(walkK(plane, nmj, K, spec))
                run()
                best = min(run() or time.perf_counter() for _ in [0])
                b = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    run()
                    b = min(b, time.perf_counter() - t0)
                ts[K] = b
            per_walk = (ts[5] - ts[1]) / 4
            print(f"{kind:9s} spec={int(spec)}: walk={per_walk*1e3:6.1f} ms"
                  f"  ({per_walk/steps*1e9:5.0f} ns/step, steps={steps})",
                  flush=True)


if __name__ == "__main__":
    main()
