"""One-off extended differential fuzz soak (CPU interpret mode).

Hammers the round-4 kernels beyond the committed test trial counts:
  - PSA traced packed chain (row-word plane + banded walk) vs the scan
    oracle: random lengths (1..700), random supported params, random /
    realistic pairs, byte-compared alignments.
  - MSA progressive runs: POA kernel engine (banded walks, C host ops)
    vs the scan engine, including tiny-HBM chunked topologies.

Usage: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/soak_fuzz.py [trials]

Keep trials <= ~30 per process: every random shape is a fresh XLA:CPU
compile, and past ~40 accumulated jit programs LLVM starts failing
with "Cannot allocate memory" (JIT code-segment map exhaustion -- an
XLA:CPU long-process artifact, not a product bug; r4 verified 30+30
and 3-trial runs clean, and the failure reproduces with an untouched
tree).  For bigger sweeps, loop the script.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def rnd_params(rng):
    m = int(rng.integers(1, 6))
    x = -int(rng.integers(1, 8))
    e = -int(rng.integers(1, 5))
    o = -int(rng.integers(0, 7))
    return (m, x, e, o)


def soak_psa(trials):
    from tsta_tpu.config import AlignParams
    from tsta_tpu.ops import psa_diff, psa_scan
    from tsta_tpu.ops import traceback as tb
    rng = np.random.default_rng(2024)
    for t in range(trials):
        p = rnd_params(rng)
        nb = int(rng.integers(1, 5))
        pairs = []
        for _ in range(nb):
            na = int(rng.integers(1, 700))
            a = rng.integers(65, 69, na).astype(np.uint8)
            if rng.random() < 0.5:
                b = a.copy()
                mm = rng.random(na) < 0.08
                b[mm] = rng.integers(65, 69, mm.sum()).astype(np.uint8)
                b = np.delete(b, rng.integers(0, na, max(na // 20, 1)))
                if len(b) == 0:
                    b = a[:1].copy()
            else:
                b = rng.integers(65, 69,
                                 int(rng.integers(1, 700))).astype(
                                     np.uint8)
            if len(b) > len(a):
                a, b = b, a
            pairs.append((a, b))
        out = psa_diff.psa_align_batch_traced_packed(pairs, p)
        prm = AlignParams(match=p[0], mismatch=p[1], gap_extend=p[2],
                          gap_open=p[3])
        for (a, b), (s, c, aln) in zip(pairs, out):
            r = psa_scan.psa_align(a, b, prm, traced=True)
            ealn = tb.decode_pair(np.asarray(r.back), np.asarray(r.fback),
                                  np.asarray(r.eback), a, b)
            assert s == int(r.score) and c == int(r.last), (t, p)
            assert aln == ealn, (t, p, len(a), len(b))
        if (t + 1) % 5 == 0:
            print(f"psa soak {t + 1}/{trials} ok", flush=True)


def soak_msa(trials):
    from tsta_tpu.config import AlignParams
    from tsta_tpu.ops import msa_native
    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACGT", np.uint8)
    for t in range(trials):
        p = rnd_params(rng)
        params = AlignParams(match=p[0], mismatch=p[1], gap_extend=p[2],
                             gap_open=p[3])
        nseq = int(rng.integers(2, 6))
        ln = int(rng.integers(40, 260))
        base = rng.choice(bases, ln).tobytes()
        seqs = [base]
        for _ in range(nseq - 1):
            s = np.frombuffer(base, np.uint8).copy()
            mm = rng.random(ln) < rng.uniform(0.03, 0.2)
            s[mm] = bases[rng.integers(0, 4, mm.sum())]
            s = np.delete(s, rng.integers(0, len(s),
                                          max(len(s) // 20, 1)))
            seqs.append(s.tobytes() if len(s) else base[:1])
        os.environ["TSTA_MSA_KERNEL"] = "poa"
        if rng.random() < 0.3:
            os.environ["TSTA_HBM_BUDGET_GB"] = str(
                float(rng.uniform(0.001, 0.004)))
        out1 = msa_native.align_seqs(seqs, params)
        os.environ.pop("TSTA_HBM_BUDGET_GB", None)
        os.environ["TSTA_MSA_KERNEL"] = "scan"
        out2 = msa_native.align_seqs(seqs, params)
        os.environ["TSTA_MSA_KERNEL"] = "poa"
        assert out1.round_scores == out2.round_scores, (t, p)
        assert out1.rows == out2.rows, (t, p)
        assert out1.consensus == out2.consensus, (t, p)
        if (t + 1) % 5 == 0:
            print(f"msa soak {t + 1}/{trials} ok", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    soak_psa(n)
    soak_msa(n)
    print("SOAK CLEAN")
