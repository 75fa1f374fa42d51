"""Isolate the banded packed walk's cost on TPU.

Times _decode_moves_banded_packed alone on device-resident planes:
  - random pairs (diag runs ~4)
  - realistic pairs (5% sub / 2% del, diag runs ~14)
  - all-match pairs (one 10240-long diag run)
spec on / off each, plus the lockstep XLA walk for reference.

PYTHONPATH="/root/repo:$PYTHONPATH" timeout 420 python scripts/walk_profile.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/tsta_jax_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def pairs_of(kind, nb, ln, seed=1):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    out = []
    for _ in range(nb):
        a = rng.choice(bases, ln).astype(np.uint8)
        if kind == "random":
            b = rng.choice(bases, ln).astype(np.uint8)
        elif kind == "realistic":
            b = a.copy()
            m = rng.random(ln) < 0.05
            b[m] = bases[rng.integers(0, 4, m.sum())]
            b = np.delete(b, rng.integers(0, ln, ln // 50))
        else:  # identical
            b = a.copy()
        out.append((a, b))
    return out


def best(fn, iters=4, warm=1):
    for _ in range(warm):
        fn()
    b = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return b


def main():
    import jax.numpy as jnp
    from tsta_tpu.ops import psa_diff, traceback as tb

    p = (2, -5, -2, -4)
    ln = 10240
    P = 8
    n_pad = psa_diff._traced_n_pad(ln)
    m_pad = -(-ln // psa_diff.T_R) * psa_diff.T_R
    Rp = n_pad // psa_diff.LANES
    S = P * Rp

    for kind in ("random", "realistic", "identical"):
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
        plane.block_until_ready()
        nmj = jnp.asarray(nm)
        _ = int(np.asarray(sc)[0, 0])   # hard sync through the tunnel

        for spec in (True, False):
            def run():
                mv, ct = tb._decode_moves_banded_packed(plane, nmj, Rp,
                                                        spec)
                return int(np.asarray(ct)[0])
            t = best(run)
            mv, ct = tb._decode_moves_banded_packed(plane, nmj, Rp, spec)
            cts = np.asarray(ct)
            tot = int(cts.sum())
            print(f"{kind:9s} spec={int(spec)}: {t*1e3:6.1f} ms  "
                  f"steps={tot}  ({t/tot*1e9:5.0f} ns/step)", flush=True)


if __name__ == "__main__":
    main()
