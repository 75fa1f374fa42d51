"""TSTA-TPU benchmark: prints one JSON line for the driver.

Primary metric: PSA score-only GCUPS (billions of DP cells/second) on
10k x 10k pairs (slot 0 = the reference's bundled example pair, so the
primary stage also checks bit-exactness: maxsorce = -5), single chip,
packed int32 kernel (ops/psa_diff.py).  Baseline (BASELINE.md): the
reference TSTA_psa_notrace at 1.25 GCUPS (AVX512, 1 thread).

Un-zeroable by construction (round-2 verdict item 1): every stage runs
in its OWN subprocess with its OWN deadline, so one cold remote compile
can stall only that stage -- the orchestrator kills it, records the
timeout in "detail", and moves on.  The final JSON is always emitted
from whatever stages completed; the primary metric is the best
completed score-only throughput.  Stage order is cheapest-first so a
real number lands within the first couple of minutes:

  msa_compat (CPU, ~1 s) -> batch8 (small packed shape, doubles as the
  cache-warmth preflight) -> batch32 (headline) -> traced -> msa_native
  -> packed short reads -> traced batch

If batch8 itself times out (cache fully cold + slow tunnel), batch32 is
skipped and the orchestrator notes the cold cache; batch8's shape is
the fallback headline shape per the verdict's (c).
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/tsta_jax_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_GCUPS = 1.25  # TSTA_psa_notrace, AVX512, 1 thread (BASELINE.md)
EX = "/root/reference/example"
MARK = "BENCH_STAGE_RESULT:"


def note(msg):
    print("[bench] " + msg, file=sys.stderr, flush=True)


def time_best(fn, warmup=1, iters=3):
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


# --------------------------------------------------------------------------
# Stage bodies.  Each runs in its own subprocess, prints one MARK line with
# a JSON dict of detail entries, and exits.  A stage that raises prints the
# error as an <stage>_error entry instead (still a MARK line, rc 0).
# --------------------------------------------------------------------------

def _example_pair():
    import numpy as np
    from tsta_tpu.io import read_fasta
    a = np.frombuffer(
        next(iter(read_fasta(EX + "/psa/seq/seqa1.fa"))).sequence, np.uint8)
    b = np.frombuffer(
        next(iter(read_fasta(EX + "/psa/seq/seqb1.fa"))).sequence, np.uint8)
    return a, b


def _batch_pairs(nb, ln, seed=0):
    import numpy as np
    rng = np.random.default_rng(seed)
    a, b = _example_pair()
    return [(a, b)] + [
        (rng.integers(65, 69, ln).astype(np.uint8),
         rng.integers(65, 69, ln).astype(np.uint8))
        for _ in range(nb - 1)]


def stage_batch(nb):
    """Packed int32 kernel, nb pairs of 10kbp; slot 0 = example pair."""
    from tsta_tpu.ops import psa_diff
    p = (2, -5, -2, -4)
    pairs = _batch_pairs(nb, 10240)
    batch_cells = sum(len(x) * len(y) for x, y in pairs)

    def run():
        sc, _ = psa_diff.psa_align_batch_diff(pairs, p)
        return sc

    scores = run()
    out = {"psa_score": int(scores[0]),
           "psa_score_exact": int(scores[0]) == -5}
    dt = time_best(run, warmup=0, iters=3)
    key = "psa_batch_gcups" if nb == 32 else "psa_batch%d_gcups" % nb
    out[key] = round(batch_cells / dt / 1e9, 3)
    return out


def stage_traced():
    from tsta_tpu.ops import psa_pallas
    a, b = _example_pair()
    cells = len(a) * len(b)
    p = (2, -5, -2, -4)
    aln_box = {}

    def run():
        sc, _, aln = psa_pallas.psa_align_traced_device(a, b, p)
        aln_box["aln"] = aln
        return sc

    dt = time_best(run, warmup=1, iters=4)
    ref_out = open("tests/golden/example_big/psa_default.out", "rb").read()
    mine = (b">1\n" + aln_box["aln"].a_row + b"\n>2\n"
            + aln_box["aln"].b_row)
    out = {"psa_traced_gcups_e2e": round(cells / dt / 1e9, 3),
           "psa_traceback_exact": mine == ref_out}

    # chunked-path hardware check at an R % 8 == 0 width (the r4 fix
    # for the latent r3 state-corruption bug was only observable on
    # hardware -- interpret mode never showed it)
    import numpy as np
    rng = np.random.default_rng(3)
    ac = rng.integers(65, 69, 3072).astype(np.uint8)
    bc = ac.copy()
    mm = rng.random(3072) < 0.05
    bc[mm] = rng.integers(65, 69, int(mm.sum())).astype(np.uint8)
    bc = np.delete(bc, rng.integers(0, 3072, 3072 // 50))
    s1, c1, a1 = psa_pallas.psa_align_traced_device(ac, bc, p)
    s2, c2, a2 = psa_pallas.psa_align_traced_chunked(ac, bc, p, mc=512)
    out["psa_chunked_exact"] = (s1, c1, a1) == (s2, c2, a2)
    return out


def stage_msa_native():
    from tsta_tpu.config import AlignParams
    from tsta_tpu.io import read_fasta
    from tsta_tpu.ops import msa_native
    params = AlignParams()
    recs = list(read_fasta(EX + "/msa/seq/seq1.fa"))
    seqs = [r.sequence for r in recs]
    msa_native.align_seqs(seqs, params)   # warm (loads cached kernels)
    t0 = time.perf_counter()
    out_n = msa_native.align_seqs(seqs, params)
    dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    msa_native.align_seqs(seqs, params)
    dt = min(dt, time.perf_counter() - t0)  # best-of-2: chip noise
    gl = out_n.graph_len
    nm_cells = sum(g * 5000 for g in [5000] + gl[:-1])
    return {"msa_native_tpu_wall_s": round(dt, 3),
            "msa_native_tpu_gcups": round(nm_cells / dt / 1e9, 3),
            "msa_native_rounds_exact": (
                out_n.round_scores == [-5451, -3101, -1776, -870])}


def _realistic_pairs(nb, ln, seed=1):
    """Mutated-copy pairs (5% subs, 2% dels) -- the workload shape the
    reference is built for; random pairs understate diagonal runs."""
    import numpy as np
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


def stage_traced_batch():
    from tsta_tpu.config import AlignParams
    from tsta_tpu.parallel import batch as pbatch
    params = AlignParams()
    # 8 pairs = one packed traced dispatch (P_CAP_TRACED); r4 rework
    # (row-word plane + unrolled window walk): 10.3 at nb=8, 15.2 at
    # nb=32 realistic (four pipelined groups)
    tpairs = _batch_pairs(8, 10240)
    tcells = sum(len(x) * len(y) for x, y in tpairs)

    def run():
        return pbatch.align_batch_traced_device(tpairs, params)

    out = run()  # warm (shapes shared with the traced stage)
    dt = time_best(run, warmup=0, iters=1)
    res = {"psa_traced_batch_gcups_e2e": round(tcells / dt / 1e9, 3),
           "psa_traced_batch_score_exact": out[0][0] == -5}

    # nb=32 realistic: the round-3 verdict's target metric (>= 12);
    # same padded shapes as nb=8, so no fresh compile
    rpairs = _realistic_pairs(32, 10240)
    rcells = sum(len(x) * len(y) for x, y in rpairs)

    def run32():
        return pbatch.align_batch_traced_device(rpairs, params)

    run32()
    dt32 = time_best(run32, warmup=0, iters=2)
    res["psa_traced_batch32_gcups_e2e"] = round(rcells / dt32 / 1e9, 3)

    # nb=128 = 16 pipelined groups: the traced saturation point
    # (r4: 17.6 GCUPS vs the traced DP's ~25 ceiling)
    rpairs128 = _realistic_pairs(128, 10240, seed=2)
    rcells128 = sum(len(x) * len(y) for x, y in rpairs128)

    def run128():
        return pbatch.align_batch_traced_device(rpairs128, params)

    run128()
    dt128 = time_best(run128, warmup=0, iters=1)
    res["psa_traced_batch128_gcups_e2e"] = round(
        rcells128 / dt128 / 1e9, 3)
    return res


def stage_int16_probe():
    """int32-vs-int16 difference-kernel A/B on the headline shape
    (round-3 verdict item 4: re-measure the 2x density lever on every
    toolchain bump instead of remembering to).  int16 stays opt-in
    until it wins (Mosaic lacks i16 maxsi; the 9-op SWAR max costs more
    than the density saves -- 11.3 vs 15.8 GCUPS on the r3 toolchain)."""
    from tsta_tpu.ops import psa_diff
    p = (2, -5, -2, -4)
    pairs = _batch_pairs(32, 10240)
    cells = sum(len(x) * len(y) for x, y in pairs)
    out = {}
    for label, use16 in (("int32", False), ("int16", True)):
        def run():
            sc, _ = psa_diff.psa_align_batch_diff(pairs, p,
                                                  use_int16=use16)
            return sc
        scores = run()
        dt = time_best(run, warmup=0, iters=2)
        out["psa_batch_%s_gcups" % label] = round(cells / dt / 1e9, 3)
        out["psa_batch_%s_exact" % label] = int(scores[0]) == -5
    out["int16_speedup"] = round(
        out["psa_batch_int16_gcups"] / max(out["psa_batch_int32_gcups"],
                                           1e-9), 3)
    return out


def stage_msa_fleet():
    """msa-batch fleet throughput (round-3 verdict item 6): 6
    independent 5x5kbp problems through align_seqs_many's pipelined
    scheduler (problem i's host fusion overlaps problem i+1's device
    DP).  Tracks problems/s so scheduler regressions are visible."""
    import numpy as np

    from tsta_tpu.config import AlignParams
    from tsta_tpu.ops import msa_native
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)

    def problem(seed):
        r = np.random.default_rng(seed)
        base = r.choice(bases, 5000).tobytes()
        seqs = [base]
        for _ in range(4):
            s = np.frombuffer(base, np.uint8).copy()
            m = r.random(len(s)) < 0.05
            s[m] = bases[r.integers(0, 4, m.sum())]
            seqs.append(
                np.delete(s, r.integers(0, len(s), len(s) // 50))
                .tobytes())
        return seqs

    problems = [problem(100 + i) for i in range(6)]
    params = AlignParams()
    msa_native.align_seqs_many(problems[:2], params)   # warm
    t0 = time.perf_counter()
    outs = msa_native.align_seqs_many(problems, params)
    dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    msa_native.align_seqs_many(problems, params)
    dt = min(dt, time.perf_counter() - t0)  # best-of-2: chip noise
    cells = 0
    for seqs, out in zip(problems, outs):
        glen = [len(seqs[0])] + out.graph_len[:-1]
        cells += sum(g * len(s) for g, s in zip(glen, seqs[1:]))
    return {"msa_fleet_wall_s": round(dt, 3),
            "msa_fleet_problems_per_s": round(len(problems) / dt, 2),
            "msa_fleet_gcups": round(cells / dt / 1e9, 3)}


def stage_packed():
    import numpy as np
    from tsta_tpu.ops import psa_diff
    p = (2, -5, -2, -4)
    rng = np.random.default_rng(9)
    nbs, lns = 256, 2048
    spairs = [(rng.integers(65, 69, lns).astype(np.uint8),
               rng.integers(65, 69, lns).astype(np.uint8))
              for _ in range(nbs)]

    def run():
        sc, _ = psa_diff.psa_align_batch_diff(spairs, p)
        return sc

    # the tunneled chip is shared: single runs swing several-fold with
    # foreign load, so take the best of several cheap calls
    dt = time_best(run, warmup=1, iters=6)
    return {"psa_packed_gcups": round(nbs * lns * lns / dt / 1e9, 3)}


def stage_msa_50k():
    """3 x 50 kbp native MSA on TPU -- the long-read case where the POA
    kernel dominates (reference TSTA_msa: 36.6 s measured, BASELINE)."""
    import numpy as np

    from tsta_tpu.config import AlignParams
    from tsta_tpu.ops import msa_native
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(bases, 50000).tobytes()

    def mut(s, rate):
        s = np.frombuffer(s, np.uint8).copy()
        m = rng.random(len(s)) < rate
        s[m] = bases[rng.integers(0, 4, m.sum())]
        return np.delete(s, rng.integers(0, len(s), len(s) // 50)).tobytes()

    seqs = [base, mut(base, 0.05), mut(base, 0.08)]
    msa_native.align_seqs(seqs, AlignParams())   # warm
    t0 = time.perf_counter()
    out = msa_native.align_seqs(seqs, AlignParams())
    dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    msa_native.align_seqs(seqs, AlignParams())
    dt = min(dt, time.perf_counter() - t0)  # best-of-2: chip noise
    # graph size entering each round x that round's ACTUAL read length
    # (mut() deletes ~2%; counting 50000 would overstate GCUPS)
    glen = [len(seqs[0])] + out.graph_len[:-1]
    cells = sum(g * len(s) for g, s in zip(glen, seqs[1:]))
    return {"msa_native_50k_wall_s": round(dt, 3),
            "msa_native_50k_gcups": round(cells / dt / 1e9, 3),
            "msa_50k_vs_ref_36.6s": round(36.6 / dt, 1)}


def stage_msa_200k():
    """3 x 200 kbp native MSA -- the TOP of the reference's documented
    50k-200k bp practical window (README.md:43-44).  Runs CHUNKED
    (checkpoint/rematerialise; the O(N x n) words plane would need
    ~80 GB).  The reference binary cannot run this size on this machine
    at all: its three per-node traceback planes need ~124 GB host RAM
    (c-t-simd.c:1003-1017) vs 125 GB total -- measured OOM-killed."""
    import numpy as np

    from tsta_tpu.config import AlignParams
    from tsta_tpu.ops import msa_native
    rng = np.random.default_rng(13)
    bases = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(bases, 200000).tobytes()

    def mut(s, rate):
        s = np.frombuffer(s, np.uint8).copy()
        m = rng.random(len(s)) < rate
        s[m] = bases[rng.integers(0, 4, m.sum())]
        return np.delete(s, rng.integers(0, len(s), len(s) // 50)).tobytes()

    seqs = [base, mut(base, 0.05), mut(base, 0.08)]
    params = AlignParams()
    msa_native.align_seqs(seqs, params)   # warm
    t0 = time.perf_counter()
    out = msa_native.align_seqs(seqs, params)
    dt = time.perf_counter() - t0
    glen = [len(seqs[0])] + out.graph_len[:-1]
    cells = sum(g * len(s) for g, s in zip(glen, seqs[1:]))
    return {"msa_native_200k_wall_s": round(dt, 3),
            "msa_native_200k_gcups": round(cells / dt / 1e9, 3),
            "msa_200k_vs_ref_456.6s": round(456.6 / dt, 1)}


def stage_chunk_smoke():
    """Hardware lowering smoke for every chunked-MSA backward branch at
    ONE small shape (N=2048 nodes x n=2048 cols -> nchunks=4, NWIN=2,
    fused K=4).  The r4 msa_200k regression (Mosaic rejecting the
    checkpoint pass's strided vector extract) shipped because only the
    ~200 kbp shape engaged nchunks>1 with NWIN>0 -- no small stage, no
    CPU test, could see it (r4 VERDICT item 1/2).  Each env-knob branch
    must produce output identical to the single-call kernel:

      windowed : NWIN=2, banded walk, fused K>1   (the msa_200k path)
      fullw    : TSTA_WINDOWED_REMAT=0, banded fused-K walk
      xla_walk : TSTA_BANDED_MSA_WALK=0 (the _walk_bounded2 fallback)
      k1       : budget forces K=1 (single-chunk banded dispatches)
      walkdb0  : packed traced PSA chunked with TSTA_WALK_DB=0 (the
                 traced stage covers the =1 default)
    """
    import numpy as np

    from tsta_tpu.config import AlignParams
    from tsta_tpu.models.poa_graph import PoaGraph
    from tsta_tpu.ops import msa_native, msa_pallas

    rng = np.random.default_rng(41)
    params = AlignParams()
    bases = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(bases, 2000).tobytes()
    s = np.frombuffer(base, np.uint8).copy()
    m = rng.random(len(s)) < 0.08
    s[m] = bases[rng.integers(0, 4, int(m.sum()))]
    seq2 = np.delete(s, rng.integers(0, len(s), len(s) // 50)).tobytes()
    seqs = [base, seq2]
    assert msa_pallas._ckpt_windows(2048) == 2

    def run_round():
        g = PoaGraph.from_sequence(seqs[0], len(seqs))
        scores, align, best_row, order = msa_pallas.round_dp_fused(
            g, seqs[1], params)
        best_row = int(best_row)
        sc = int(np.asarray(scores)[0, best_row])
        al = np.asarray(align)[:len(seqs[1])].tolist()
        msa_native._merge(g, seqs[1], 1, order,
                          np.asarray(align)[:len(seqs[1])])
        g.toposort()
        return sc, al, g.msa_rows(), g.consensus()

    ref = run_round()
    out = {"chunk_smoke_score": ref[0]}
    # K per branch from the _round_chunked budget formulae at NC=512:
    # windowed K = min(geometric ceil(CW/NC)+1 = 3, b/2 // (2*NC*CW=
    # 1MB) - 1); full-width K = b/2 // (2*NC*n=2MB) - 1 (capped 4);
    # 0.01 GB -> windowed K=3 / full K=1, 0.013 GB -> full K=2 (still
    # chunks: plane 8.4 MB > 0.5*13.9 MB)
    branches = [
        ("windowed", {"TSTA_HBM_BUDGET_GB": "0.01"}),          # NWIN=2 K=3
        ("fullw", {"TSTA_HBM_BUDGET_GB": "0.013",
                   "TSTA_WINDOWED_REMAT": "0"}),               # K=2 fused
        ("k1", {"TSTA_HBM_BUDGET_GB": "0.01",
                "TSTA_WINDOWED_REMAT": "0"}),                  # K=1 banded
        ("xla_walk", {"TSTA_HBM_BUDGET_GB": "0.01",
                      "TSTA_BANDED_MSA_WALK": "0"}),   # _walk_bounded2
    ]
    saved = {k: os.environ.get(k) for _, env in branches for k in env}
    ok = []
    try:
        for name, env in branches:
            for k in saved:
                os.environ.pop(k, None)
            os.environ.update(env)
            got = run_round()
            out["chunk_smoke_%s" % name] = "ok" if got == ref else \
                "MISMATCH (score %d vs %d)" % (got[0], ref[0])
            ok.append(got == ref)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    # packed PSA chunked walk with band double-buffering OFF
    from tsta_tpu.ops import psa_pallas
    p = (2, -5, -2, -4)
    rng = np.random.default_rng(3)
    ac = rng.integers(65, 69, 3072).astype(np.uint8)
    bc = ac.copy()
    mm = rng.random(3072) < 0.05
    bc[mm] = rng.integers(65, 69, int(mm.sum())).astype(np.uint8)
    bc = np.delete(bc, rng.integers(0, 3072, 3072 // 50))
    r1 = psa_pallas.psa_align_traced_chunked(ac, bc, p, mc=512)
    os.environ["TSTA_WALK_DB"] = "0"
    try:
        r0 = psa_pallas.psa_align_traced_chunked(ac, bc, p, mc=512)
    finally:
        os.environ.pop("TSTA_WALK_DB", None)
    out["chunk_smoke_walkdb0"] = "ok" if r0 == r1 else "MISMATCH"
    ok.append(r0 == r1)
    out["chunk_smoke_all_ok"] = all(ok)
    if not all(ok):
        # an _error key keeps the stage un-done (retried) and lands in
        # the final detail: a branch regression must be LOUD, not a
        # quiet false in a nested field (r4 VERDICT item 2)
        out["chunk_smoke_error"] = "branch mismatch: " + ", ".join(
            k for k, v in out.items()
            if isinstance(v, str) and v.startswith("MISMATCH"))
    return out


def stage_msa_compat():
    from tsta_tpu.config import AlignParams
    from tsta_tpu.models import msa as msa_model
    t0 = time.perf_counter()
    out = msa_model.align_file(EX + "/msa/seq/seq1.fa", AlignParams())
    dt = time.perf_counter() - t0
    return {"msa_wall_s": round(dt, 3),
            "msa_rounds_exact": out.round_scores == [-5451, -3101,
                                                     -1776, -870]}


STAGES = {
    "msa_compat": stage_msa_compat,
    "batch8": lambda: stage_batch(8),
    "batch32": lambda: stage_batch(32),
    "traced": stage_traced,
    "msa_native": stage_msa_native,
    "packed": stage_packed,
    "traced_batch": stage_traced_batch,
    "msa_50k": stage_msa_50k,
    "batch128": lambda: stage_batch(128),
    "msa_fleet": stage_msa_fleet,
    "int16_probe": stage_int16_probe,
    "msa_200k": stage_msa_200k,
    "chunk_smoke": stage_chunk_smoke,
}


TUNNEL_DOWN_RC = 7   # stage exit code: tunnel probe stalled (retryable)
STAGE_FAIL_RC = 8    # stage body raised (often a transient tunnel error
                     # -- DEADLINE_EXCEEDED, connection reset -- so also
                     # retryable; a deterministic bug just burns its
                     # bounded retries and keeps the error in detail)


def run_stage_inprocess(name):
    if name != "msa_compat":
        # fast tunnel probe: the shared chip's relay stalls for minutes
        # at a time; a stalled dispatch would otherwise hold the stage
        # until its full subprocess timeout.  Bail in 15 s instead so
        # the orchestrator's retry passes stay cheap while the tunnel
        # is down.
        import threading

        def bail():
            print(MARK + json.dumps(
                {name + "_error": "tunnel probe stalled (15s)"}),
                flush=True)
            os._exit(TUNNEL_DOWN_RC)

        wd = threading.Timer(15.0, bail)
        wd.daemon = True
        wd.start()
        import jax.numpy as jnp
        float(jnp.sum(jnp.ones(8)))
        wd.cancel()
    try:
        out = STAGES[name]()
    except Exception as e:  # noqa: BLE001 -- stage errors become detail
        print(MARK + json.dumps({name + "_error": str(e)[:300]}),
              flush=True)
        sys.exit(STAGE_FAIL_RC)
    print(MARK + json.dumps(out), flush=True)


# --------------------------------------------------------------------------
# Orchestrator.
# --------------------------------------------------------------------------

# (stage, [timeout-per-attempt...], min budget-left to start an attempt).
# The shared chip's tunnel stalls for minutes at a time under foreign
# load (r3: batch8, cached and 18 s warm an hour earlier, timed out at
# 210 s and took batch32 down with it).  So: SHORT first-pass timeouts,
# then whole-plan retry passes -- a stalled window costs one slice, and
# the stage gets fresh shots once the stall clears.
PLAN = [
    ("msa_compat", [60], 5),
    ("batch8", [90, 120, 240], 30),
    ("batch32", [60, 120, 240], 45),
    ("traced", [60, 90, 180], 30),
    ("msa_native", [60, 120, 240], 30),
    ("packed", [60, 90, 180], 30),
    ("traced_batch", [60, 90, 180], 30),
    ("msa_50k", [90, 180, 300], 45),
    ("batch128", [60, 120, 240], 30),
    ("msa_fleet", [90, 180], 40),
    # capability stages BEFORE the probes (r4 VERDICT item 7: the int16
    # probe's stalls starved msa_200k's retry budget in r4)
    ("msa_200k", [150, 300, 300], 60),
    ("chunk_smoke", [120, 240], 45),
    ("int16_probe", [60, 300], 30),
]


def orchestrate():
    budget = float(os.environ.get("TSTA_BENCH_BUDGET_S", "420"))
    deadline = time.time() + budget - 8.0   # reserve time to print
    detail = {"stages_run": []}

    def emit():
        score_keys = ("psa_batch128_gcups", "psa_batch_gcups",
                      "psa_packed_gcups", "psa_batch8_gcups")
        primary = max((detail.get(k, 0.0) for k in score_keys), default=0.0)
        if primary == 0.0:
            # nothing score-only completed; fall back to ANY throughput
            primary = max(detail.get("psa_traced_gcups_e2e", 0.0),
                          detail.get("psa_traced_batch_gcups_e2e", 0.0),
                          detail.get("msa_native_tpu_gcups", 0.0))
        print(json.dumps({
            "metric": "psa_gcups_1chip",
            "value": round(primary, 3),
            "unit": "GCUPS",
            "vs_baseline": round(primary / BASELINE_GCUPS, 2),
            "detail": detail,
        }), flush=True)

    # absolute last-resort watchdog: even if the orchestrator itself wedges,
    # one JSON line with everything collected so far still goes out.
    import threading

    def fire():
        detail["watchdog"] = "orchestrator exceeded budget; partial results"
        emit()
        os._exit(3)

    wd = threading.Timer(max(30.0, deadline - time.time() + 60), fire)
    wd.daemon = True
    wd.start()

    # backend info via a SUBPROCESS with its own timeout: jax.devices()
    # itself can hang 120 s+ when the tunnel is stalled (CLAUDE.md),
    # and this query runs before any stage's budget accounting
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend());"
             "print(jax.devices()[0])"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, timeout=25)
        lines = r.stdout.decode().strip().splitlines()
        if len(lines) >= 2:
            detail["backend"], detail["device"] = lines[0], lines[1]
    except Exception as e:  # noqa: BLE001
        detail["backend_error"] = str(e)[:200]

    env = dict(os.environ)
    done = set()
    max_passes = 12  # probe-stalled passes are cheap (~15 s/stage), so
                     # keep cycling while budget remains; tunnel stalls
                     # last minutes (r5 observed 45+ min windows), so an
                     # all-stalled pass SLEEPS before the next one
                     # instead of burning the budget on more probes
    # pass 1 runs cheapest-first so partials land early; later passes
    # lead with the PRIMARY metric stages -- a brief tunnel-recovery
    # window should go to the headline batch stages before anything
    # else.  Derived from PLAN (unlisted stages sort last by plan
    # position) so adding a stage cannot silently drop it from retries.
    priority = {"batch128": 0, "batch32": 1, "batch8": 2,
                "traced_batch": 3, "packed": 4}
    retry_plan = sorted(PLAN, key=lambda e: (
        priority.get(e[0], 99), [n for n, _, _ in PLAN].index(e[0])))
    for npass in range(max_passes):
        if all(name in done for name, _, _ in PLAN):
            break
        order = PLAN if npass == 0 else retry_plan
        pass_stalls = pass_attempts = 0
        for name, tos, min_left in order:
            if name in done:
                continue
            left = deadline - time.time()
            if left < min_left:
                if npass == max_passes - 1:
                    detail.setdefault("skipped", []).append(
                        "%s (budget: %ds left)" % (name, left))
                continue
            to = min(tos[min(npass, len(tos) - 1)], left)
            note("stage %s try %d (timeout %ds, %ds budget left)"
                 % (name, npass + 1, to, left))
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--stage", name],
                    stdout=subprocess.PIPE, stderr=sys.stderr,
                    timeout=to, env=env, cwd=os.path.dirname(
                        os.path.abspath(__file__)) or ".")
                out = {}
                for ln in r.stdout.decode("utf-8", "replace").splitlines():
                    if ln.startswith(MARK):
                        out = json.loads(ln[len(MARK):])
                if r.returncode == TUNNEL_DOWN_RC:
                    # probe bailed: tunnel is stalled RIGHT NOW -- note
                    # it, keep the stage eligible for later passes
                    pass_stalls += 1
                    pass_attempts += 1
                    detail[name + "_error"] = ("try %d: tunnel stalled "
                                               "(probe)" % (npass + 1))
                    detail["stages_run"].append(
                        "%s#%d:probe-stall" % (name, npass + 1))
                    if pass_stalls >= 3 and pass_stalls == pass_attempts:
                        # tunnel is down across stages: abandon this
                        # pass early instead of probing every stage
                        break
                    continue
                if r.returncode != 0:
                    # stage raised (STAGE_FAIL_RC) or crashed: often a
                    # transient tunnel error mid-dispatch -- keep the
                    # error in detail but stay eligible for retries
                    err = out or {name + "_error":
                                  "stage crashed (rc=%s)" % r.returncode}
                    detail.update(err)
                    detail["stages_run"].append(
                        "%s#%d:%.0fs-err" % (name, npass + 1,
                                             time.time() - t0))
                    continue
                pass_attempts += 1
                if not out:
                    out = {name + "_error": "stage produced no result"}
                detail.update(out)
                if not any(k.endswith("_error") for k in out):
                    # clear a previous attempt's timeout note
                    detail.pop(name + "_error", None)
                done.add(name)
                detail["stages_run"].append(
                    "%s#%d:%.0fs" % (name, npass + 1, time.time() - t0))
                # cumulative partial emit: if anything kills this
                # process before the final line (driver timeout, OOM),
                # the best-so-far JSON is already on stdout
                emit()
                note("stage %s try %d done in %.0fs"
                     % (name, npass + 1, time.time() - t0))
                continue
            except subprocess.TimeoutExpired:
                pass_attempts += 1
                detail[name + "_error"] = (
                    "try %d timed out after %ds (tunnel stall or cold "
                    "compile)" % (npass + 1, to))
            except Exception as e:  # noqa: BLE001
                detail[name + "_error"] = str(e)[:300]
                done.add(name)   # a hard error will not improve on retry
            detail["stages_run"].append(
                "%s#%d:%.0fs" % (name, npass + 1, time.time() - t0))
            note("stage %s try %d done in %.0fs"
                 % (name, npass + 1, time.time() - t0))
        if (pass_attempts and pass_stalls == pass_attempts
                and not all(n in done for n, _, _ in PLAN)):
            # every attempt this pass was a probe-stall: the tunnel is
            # in a stall window (minutes).  Sleep a slice of the
            # remaining budget so later passes land in a recovery
            # window instead of burning probes now.
            nap = min(45.0, max(0.0, deadline - time.time() - 60))
            if nap > 1:
                note("tunnel down across pass %d; sleeping %.0fs"
                     % (npass + 1, nap))
                time.sleep(nap)

    emit()
    wd.cancel()


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        run_stage_inprocess(sys.argv[2])
    else:
        orchestrate()


if __name__ == "__main__":
    main()
