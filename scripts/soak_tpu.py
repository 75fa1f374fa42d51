"""Randomized differential soak ON HARDWARE (one-off; the CPU soak in
soak_fuzz.py runs interpret mode, which cannot see Mosaic lowering bugs
-- the r4 R%8 state-corruption find was hardware-only).

  - packed traced batches vs the scan oracle's scores + rescored
    alignments (oracle runs on CPU via a separate process-free path:
    we use score_alignment validity + corner equality instead of a
    full CPU oracle to keep the soak fast)
  - chunked traced (random mc) vs the packed path
  - native MSA round scores vs the CPU scan engine

Usage (ambient env, repo root): timeout 900 python scripts/soak_tpu.py [trials]
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/tsta_jax_tpu")

import numpy as np


def main(trials):
    from tsta_tpu.config import AlignParams
    from tsta_tpu.ops import psa_diff, psa_pallas
    from tsta_tpu.ops import traceback as tb

    rng = np.random.default_rng(8)
    bases = np.frombuffer(b"ACGT", np.uint8)
    params = AlignParams()
    p = (2, -5, -2, -4)

    def mk(n):
        a = rng.choice(bases, n).astype(np.uint8)
        b = a.copy()
        m = rng.random(n) < 0.06
        b[m] = bases[rng.integers(0, 4, m.sum())]
        return a, np.delete(b, rng.integers(0, n, max(n // 40, 1)))

    PARAMS = [(2, -5, -2, -4), (2, -3, -2, -4), (1, -1, -1, 0),
              (5, -4, -1, -10), (3, -2, -3, -1)]
    for t in range(trials):
        n = int(rng.integers(900, 9000))
        a, b = mk(n)
        pt = PARAMS[t % len(PARAMS)]   # sweep scoring params too

        class _P:
            match, mismatch, gap_extend, gap_open = pt

        sc, co, aln = psa_diff.psa_align_batch_traced_packed(
            [(a, b)], pt)[0]
        assert tb.score_alignment(aln.a_row, aln.b_row, _P) == co, \
            ("packed rescore", t, n, pt)
        mc = 512 * int(rng.integers(1, 4))
        s2, c2, aln2 = psa_pallas.psa_align_traced_chunked(a, b, pt,
                                                           mc=mc)
        assert (sc, co) == (s2, c2) and aln == aln2, \
            ("chunked mismatch", t, n, mc, pt)
        print(f"tpu soak {t + 1}/{trials} ok (n={n}, mc={mc}, p={pt})",
              flush=True)
    print("TPU SOAK CLEAN", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
