"""On-hardware smoke of the windowed-remat chunked MSA round.

Runs ONE round at a small shape (n=2048 -> NWIN=2, nchunks=4, K>1)
with the chunked windowed path forced via TSTA_HBM_BUDGET_GB, and
compares scores/alignment against the unchunked single-call round.
This is the shape class whose hardware lowering broke msa_200k in r4
(Mosaic rejects strided vector extracts; interpret mode cannot see it).

Usage:  python scripts/win_smoke.py            # windowed (default)
        TSTA_WINDOWED_REMAT=0 python scripts/win_smoke.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/tsta_jax_tpu")

from tsta_tpu.config import AlignParams           # noqa: E402
from tsta_tpu.models.poa_graph import PoaGraph    # noqa: E402
from tsta_tpu.ops import msa_pallas, msa_native   # noqa: E402


def mutate(rng, base, rate):
    bases = np.frombuffer(b"ACGT", np.uint8)
    s = np.frombuffer(base, np.uint8).copy()
    m = rng.random(len(s)) < rate
    s[m] = bases[rng.integers(0, 4, int(m.sum()))]
    return np.delete(s, rng.integers(0, len(s), len(s) // 50)).tobytes()


def run_round(seqs, params):
    g = PoaGraph.from_sequence(seqs[0], len(seqs))
    scores, align, best_row, order = msa_pallas.round_dp_fused(
        g, seqs[1], params)
    best_row = int(best_row)
    sc = int(np.asarray(scores)[0, best_row])
    al = np.asarray(align)[:len(seqs[1])].tolist()
    msa_native._merge(g, seqs[1], 1, order, np.asarray(align)[
        :len(seqs[1])])
    g.toposort()
    return sc, al, g.msa_rows(), g.consensus()


def main():
    rng = np.random.default_rng(41)
    params = AlignParams()
    bases = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(bases, 2000).tobytes()
    seqs = [base, mutate(rng, base, 0.08)]
    assert msa_pallas._ckpt_windows(2048) == 2

    t0 = time.perf_counter()
    ref = run_round(seqs, params)
    print("single-call: %.2f s, score %d"
          % (time.perf_counter() - t0, ref[0]), flush=True)

    os.environ["TSTA_HBM_BUDGET_GB"] = "0.01"
    NC = msa_pallas._round_plan(2048, 2048, 16)
    assert NC is not None and 2048 // NC >= 2, NC
    K = max(1, min(8, int(msa_pallas._hbm_budget() // 2
                          // (2 * NC * 1024)) - 1))
    print("chunked: NC=%d nchunks=%d K(windowed)=%d windowed=%s"
          % (NC, 2048 // NC, K,
             os.environ.get("TSTA_WINDOWED_REMAT", "1")), flush=True)
    t0 = time.perf_counter()
    got = run_round(seqs, params)
    print("chunked: %.2f s, score %d"
          % (time.perf_counter() - t0, got[0]), flush=True)
    del os.environ["TSTA_HBM_BUDGET_GB"]
    assert got == ref, "chunked output differs from single-call"
    print("OK: chunked windowed round matches single-call", flush=True)


if __name__ == "__main__":
    main()
