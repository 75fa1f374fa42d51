"""Time the POA kernel on the two MSA bench workloads (5x5k, 3x50k).

A/B runbook for kernel variants (e.g. branch poa-diet-r3 vs main):
run this for the CURRENT tree, `git checkout <ref> --
tsta_tpu/ops/msa_pallas.py`, run again with another label, restore.
First run of an unseen kernel pays the remote compile (minutes);
reps after that are the measurement.  Run from /root/repo with
ambient env (TPU).  Prints one line per rep.

Usage: python scripts/poa_time.py [label] [reps] [which]
  which: 5k | 50k | both (default both)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/tsta_jax_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402

from tsta_tpu.config import AlignParams  # noqa: E402
from tsta_tpu.io import read_fasta  # noqa: E402
from tsta_tpu.ops import msa_native  # noqa: E402

label = sys.argv[1] if len(sys.argv) > 1 else "head"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
which = sys.argv[3] if len(sys.argv) > 3 else "both"

EX = "/root/reference/example"
params = AlignParams()

if which in ("5k", "both"):
    recs = list(read_fasta(EX + "/msa/seq/seq1.fa"))
    seqs5 = [r.sequence for r in recs]
    out = msa_native.align_seqs(seqs5, params)   # warm/compile
    assert out.round_scores == [-5451, -3101, -1776, -870], out.round_scores
    for i in range(reps):
        t0 = time.perf_counter()
        msa_native.align_seqs(seqs5, params)
        print("%s msa_5x5k rep%d wall_s=%.3f" % (label, i,
                                                 time.perf_counter() - t0),
              flush=True)

if which in ("50k", "both"):
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(bases, 50000).tobytes()

    def mut(s, rate):
        s = np.frombuffer(s, np.uint8).copy()
        m = rng.random(len(s)) < rate
        s[m] = bases[rng.integers(0, 4, m.sum())]
        return np.delete(s, rng.integers(0, len(s),
                                         len(s) // 50)).tobytes()

    seqs50 = [base, mut(base, 0.05), mut(base, 0.08)]
    out = msa_native.align_seqs(seqs50, params)   # warm/compile
    print("%s msa_50k warm done (scores %s)" % (label, out.round_scores),
          flush=True)
    for i in range(reps):
        t0 = time.perf_counter()
        msa_native.align_seqs(seqs50, params)
        print("%s msa_50k rep%d wall_s=%.3f" % (label, i,
                                                time.perf_counter() - t0),
              flush=True)
print("%s DONE" % label, flush=True)
