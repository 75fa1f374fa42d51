"""Profile the traced packed chain on TPU: DP vs walk vs e2e.

Run from repo root:
    PYTHONPATH="/root/repo:$PYTHONPATH" timeout 300 python scripts/traced_profile.py

Times, per stage (best of N on the shared tunnel):
  - score-only packed DP at the traced shape (P=8, 10240 bp)
  - traced DP alone (plane production, sum-synced)
  - traced DP + banded walk, spec on and off
  - full e2e nb=32 on random and realistic (5% sub / 2% del) pairs
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/tsta_jax_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def realistic_pairs(nb, ln, seed=1):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    out = []
    for _ in range(nb):
        a = rng.choice(bases, ln).astype(np.uint8)
        b = a.copy()
        m = rng.random(ln) < 0.05
        b[m] = bases[rng.integers(0, 4, m.sum())]
        b = np.delete(b, rng.integers(0, ln, ln // 50))
        out.append((a, b))
    return out


def random_pairs(nb, ln, seed=0):
    rng = np.random.default_rng(seed)
    return [(rng.integers(65, 69, ln).astype(np.uint8),
             rng.integers(65, 69, ln).astype(np.uint8))
            for _ in range(nb)]


def best(fn, iters=3, warm=1):
    for _ in range(warm):
        fn()
    b = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return b


def main():
    import jax
    import jax.numpy as jnp
    from tsta_tpu.ops import psa_diff, traceback as tb

    p = (2, -5, -2, -4)
    ln = 10240
    P = 8
    pairs = random_pairs(P, ln)
    n_pad = psa_diff._traced_n_pad(ln)
    m_pad = -(-ln // psa_diff.T_R) * psa_diff.T_R
    Rp = n_pad // psa_diff.LANES
    S = P * Rp
    print(f"shape: P={P} n_pad={n_pad} m_pad={m_pad} Rp={Rp} S={S}",
          flush=True)

    a8 = np.full((S, psa_diff.LANES), psa_diff.A_PAD, np.uint8)
    brows8 = np.full((m_pad, P), psa_diff.B_PAD, np.uint8)
    nm = np.zeros((P, 2), np.int32)
    for k, (a, b) in enumerate(pairs):
        arow = np.full(n_pad, psa_diff.A_PAD, np.uint8)
        arow[:len(a)] = a
        a8[k * Rp:(k + 1) * Rp] = arow.reshape(Rp, psa_diff.LANES)
        brows8[:len(b), k] = b
        nm[k] = (len(a), len(b))
    a8j, brows8j, nmj = jnp.asarray(a8), jnp.asarray(brows8), jnp.asarray(nm)
    a32, brows32 = a8j.astype(jnp.int32), brows8j.astype(jnp.int32)

    cells_g = sum(len(a) * len(b) for a, b in pairs)

    # 1. score-only DP at same shape (layout packed)
    def score_only():
        sc, _ = psa_diff.psa_align_batch_diff(pairs, p)
        return int(np.asarray(sc)[0])
    t = best(score_only)
    print(f"score-only batch P=8 e2e: {t*1e3:.1f} ms "
          f"({cells_g/t/1e9:.1f} GCUPS)", flush=True)

    # 2. traced DP alone (sync by tiny reduce of the plane)
    @jax.jit
    def dp_only(a32, brows32, nmj):
        sc, co, plane = psa_diff._psa_diff_traced_call(
            a32, brows32, nmj, n_pad, m_pad, P, p)
        return sc, co, plane[::997, 0, 0].astype(jnp.int32).sum()

    def run_dp():
        sc, co, s = dp_only(a32, brows32, nmj)
        return int(s)
    t_dp = best(run_dp)
    print(f"traced DP alone:  {t_dp*1e3:.1f} ms "
          f"({cells_g/t_dp/1e9:.1f} GCUPS)", flush=True)

    # 3. DP + walk (spec on/off) + one packed transfer = chain
    for spec in (True, False):
        def run_chain():
            out = psa_diff._traced_packed_chain(
                a8j, brows8j, nmj, n_pad, m_pad, P, p, True, spec)
            return np.asarray(out)
        t_c = best(run_chain)
        print(f"chain (banded walk, spec={spec}): {t_c*1e3:.1f} ms "
              f"walk+xfer={((t_c-t_dp)*1e3):.1f} ms "
              f"({cells_g/t_c/1e9:.1f} GCUPS)", flush=True)

    # walk steps actually taken (counts)
    out = np.asarray(psa_diff._traced_packed_chain(
        a8j, brows8j, nmj, n_pad, m_pad, P, p, True, True))
    print(f"walk counts (random): {out[:, 2]}", flush=True)

    # 4. e2e at nb=32, random and realistic
    from tsta_tpu.config import AlignParams
    from tsta_tpu.parallel import batch as pbatch
    params = AlignParams()
    for label, mk in (("random", random_pairs), ("realistic",
                                                 realistic_pairs)):
        tp = mk(32, ln)
        tc = sum(len(x) * len(y) for x, y in tp)

        def run_e2e():
            return pbatch.align_batch_traced_device(tp, params)
        t_e = best(run_e2e, iters=2)
        print(f"e2e nb=32 {label}: {t_e*1e3:.0f} ms "
              f"({tc/t_e/1e9:.2f} GCUPS)", flush=True)


if __name__ == "__main__":
    main()
