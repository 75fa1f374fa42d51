"""A/B the 2-pair-interleaved banded walk vs the double-buffered
single-pair walk ON HARDWARE (CLAUDE.md: device paths must be A/B'd on
hardware against an independent path, comparing DECODED payloads).

Builds one P=8 group of 10 kbp realistic pairs, runs the packed DP
once, then times the two walk variants over the same plane and checks
the decoded moves are identical.

    timeout 900 python scripts/walk_pair2_ab.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/tsta_jax_tpu")

import jax.numpy as jnp  # noqa: E402

from tsta_tpu.ops import psa_diff, traceback as tb  # noqa: E402


def realistic_pairs(nb, ln, seed=1):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    out = []
    for _ in range(nb):
        a = rng.choice(bases, ln).astype(np.uint8)
        b = a.copy()
        m = rng.random(ln) < 0.05
        b[m] = bases[rng.integers(0, 4, int(m.sum()))]
        b = np.delete(b, rng.integers(0, ln, ln // 50))
        out.append((a, b))
    return out


def main():
    p = (2, -5, -2, -4)
    P, ln = 8, 10240
    pairs = realistic_pairs(P, ln)
    LANES, T_R = psa_diff.LANES, psa_diff.T_R
    n_real = [len(a) for a, _ in pairs]
    m_real = [len(b) for _, b in pairs]
    n_pad = max(psa_diff._traced_n_pad(n) for n in n_real)
    m_pad = -(-max(m_real) // T_R) * T_R
    Rp = n_pad // LANES
    a8 = np.full((P * Rp, LANES), psa_diff.A_PAD, np.uint8)
    brows8 = np.full((m_pad, P), psa_diff.B_PAD, np.uint8)
    nm = np.zeros((P, 2), np.int32)
    for k, (a, b) in enumerate(pairs):
        arow = np.full(n_pad, psa_diff.A_PAD, np.uint8)
        arow[:n_real[k]] = a
        a8[k * Rp:(k + 1) * Rp] = arow.reshape(Rp, LANES)
        brows8[:m_real[k], k] = b
        nm[k] = (n_real[k], m_real[k])
    assert psa_diff._banded_walk_gate(Rp, m_pad, P, n_pad)

    nm_d = jnp.asarray(nm)
    _, _, plane = psa_diff._psa_diff_traced_call(
        jnp.asarray(a8).astype(jnp.int32),
        jnp.asarray(brows8).astype(jnp.int32), nm_d,
        n_pad, m_pad, P, p)
    plane = jnp.asarray(np.asarray(plane))   # settle; drop the DP chain

    variants = {
        "db (default)": dict(db=True, pair2=False),
        "pair2": dict(db=True, pair2=True),
    }
    decoded = {}
    for name, kw in variants.items():
        words, counts = tb._decode_moves_banded_packed(
            plane, nm_d, Rp, True, **kw)
        wn, cn = np.asarray(words), np.asarray(counts)
        # compare DECODED payloads, not raw buffers (SMEM tails hold
        # garbage past count)
        decoded[name] = [tb.unpack_moves(wn[k], cn[k])
                         for k in range(P)]
        best = 1e9
        for _ in range(6):
            t0 = time.perf_counter()
            words, counts = tb._decode_moves_banded_packed(
                plane, nm_d, Rp, True, **kw)
            int(np.asarray(counts)[0])
            best = min(best, time.perf_counter() - t0)
        steps = int(cn.sum())
        print("%-14s best %.2f ms (%d steps, %.0f ns/step incl RTT)"
              % (name, best * 1e3, steps, best / steps * 1e9),
              flush=True)
    ok = all((decoded["pair2"][k] == decoded["db (default)"][k]).all()
             for k in range(P))
    print("decoded payloads identical:", ok)
    assert ok


if __name__ == "__main__":
    main()
