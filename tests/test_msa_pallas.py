"""Pallas POA round kernel (ops/msa_pallas.py) vs the per-node scan
engine, interpret mode on CPU.  Sink scores, traceback walks, and whole
progressive runs must agree exactly (both engines implement the same
exact-int32 recurrence with identical tie-breaking)."""

import os

import numpy as np
import pytest

from tsta_tpu.config import AlignParams
from tsta_tpu.models.poa_graph import PoaGraph
from tsta_tpu.ops import msa_native, msa_pallas
from tsta_tpu.ops.msa_native import (_fuse, _merge, _prepare_round,
                                     _round_dp, _walk_host, align_seqs)
from tsta_tpu.ops.psa_scan import bucket


def _mutate(rng, base, div):
    b = bytearray(base)
    for i in rng.integers(0, len(b), max(1, int(len(b) * div))):
        b[i] = b"ACGT"[rng.integers(0, 4)]
    for _ in range(max(1, int(len(b) * div / 8))):
        j = int(rng.integers(0, len(b) - 2))
        del b[j]
    return bytes(b)


def _scan_round(g, seq, params):
    import jax.numpy as jnp
    p = (params.match, params.mismatch, params.gap_extend,
         params.gap_open)
    (bases, preds, pmask, hm1, valid, N, N_real, max_in, pos,
     order) = _prepare_round(g, params)
    n_real = len(seq)
    n = bucket(n_real)
    a = np.zeros((n,), np.uint8)
    a[:n_real] = np.frombuffer(seq, np.uint8)
    ss, packed, hp, ep = _round_dp(
        jnp.asarray(bases), jnp.asarray(preds), jnp.asarray(pmask),
        jnp.asarray(hm1), jnp.asarray(valid), jnp.asarray(a),
        jnp.int32(n_real), p, N, n, max_in)
    return (np.asarray(ss), np.asarray(packed), np.asarray(hp),
            np.asarray(ep), preds, order, N_real)


def _grown_graph(rng, n_reads=3, ln=120, div=0.1):
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), ln).tobytes()
    seqs = [_mutate(rng, base, div) for _ in range(n_reads)]
    g = PoaGraph.from_sequence(seqs[0], n_reads + 1)
    params = AlignParams()
    for s_no in range(1, n_reads):
        ss, packed, hp, ep, preds, order, N_real = _scan_round(
            g, seqs[s_no], params)
        sinks = set(g.sinks())
        rows = [i for i, v in enumerate(order) if v in sinks]
        best = max(rows, key=lambda i: ss[i])
        _fuse(g, seqs[s_no], s_no, order, packed, hp, ep, preds, best)
        g.toposort()
    return g, seqs, params


@pytest.mark.parametrize("seed", range(3))
def test_poa_kernel_round_matches_scan(seed):
    rng = np.random.default_rng(seed)
    g, seqs, params = _grown_graph(rng, n_reads=3,
                                   ln=100 + 60 * seed, div=0.1)
    new = _mutate(rng, seqs[0], 0.12)

    ss1, packed, hp, ep, preds, order, N_real = _scan_round(
        g, new, params)
    ss2, align_of, order2, preds2 = msa_pallas.round_dp(g, new, params)

    assert order == order2
    assert np.array_equal(ss1[:N_real], ss2)

    sinks = set(g.sinks())
    rows = [i for i, v in enumerate(order) if v in sinks]
    best = max(rows, key=lambda i: ss1[i])
    walk1 = _walk_host(packed, hp, ep, preds, best, len(new))
    walk2 = align_of(best)
    assert np.array_equal(walk1, walk2)


def test_align_seqs_poa_engine_matches_scan(monkeypatch):
    rng = np.random.default_rng(7)
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 150).tobytes()
    seqs = [_mutate(rng, base, 0.08) for _ in range(4)]

    monkeypatch.setenv("TSTA_MSA_KERNEL", "scan")
    out1 = msa_native.align_seqs(seqs, AlignParams())
    monkeypatch.setenv("TSTA_MSA_KERNEL", "poa")
    out2 = msa_native.align_seqs(seqs, AlignParams())

    assert out1.round_scores == out2.round_scores
    assert out1.graph_len == out2.graph_len
    assert out1.rows == out2.rows
    assert out1.consensus == out2.consensus


def test_walk_host_merge_refactor_roundtrip():
    """_fuse == _walk_host + _merge (refactor regression)."""
    rng = np.random.default_rng(3)
    g, seqs, params = _grown_graph(rng, n_reads=2, ln=90, div=0.1)
    new = _mutate(rng, seqs[0], 0.1)
    ss, packed, hp, ep, preds, order, N_real = _scan_round(
        g, new, params)
    sinks = set(g.sinks())
    rows = [i for i, v in enumerate(order) if v in sinks]
    best = max(rows, key=lambda i: ss[i])
    import copy
    g2 = copy.deepcopy(g)
    a1 = _fuse(g, new, 2, order, packed, hp, ep, preds, best)
    walk = _walk_host(packed, hp, ep, preds, best, len(new))
    a2 = _merge(g2, new, 2, order, walk)
    assert a1 == a2
    assert g.bases == g2.bases
    assert g.preds == g2.preds


def test_align_seqs_many_matches_single(monkeypatch):
    """Pipelined multi-problem runner == per-problem runs (POA engine)."""
    monkeypatch.setenv("TSTA_MSA_KERNEL", "poa")
    rng = np.random.default_rng(9)
    sets = []
    for _ in range(3):
        base = rng.choice(np.frombuffer(b"ACGT", np.uint8),
                          int(rng.integers(80, 160))).tobytes()
        sets.append([_mutate(rng, base, 0.1) for _ in range(3)])
    outs = msa_native.align_seqs_many(sets, AlignParams())
    for seqs, out in zip(sets, outs):
        ref = msa_native.align_seqs(seqs, AlignParams())
        assert out.round_scores == ref.round_scores
        assert out.rows == ref.rows
        assert out.consensus == ref.consensus


def test_align_seqs_many_falls_back_past_pred_cap(monkeypatch):
    """A problem whose graph exceeds the POA kernel's 64-pred traceback
    cap must fall back to the scan engine per round instead of aborting
    the whole fleet."""
    # align_seqs_many always uses the POA chain except past the pred
    # cap; the poisoned round_dp_fused proves the fallback never calls it
    monkeypatch.setattr(msa_pallas, "round_dp_fused",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("POA path must not be used")))
    # force the fallback by shrinking the cap check via a fake graph
    # in-degree: monkeypatch max check is awkward, so drive through a
    # crafted graph with >64 preds on one node
    rng = np.random.default_rng(2)
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 60).tobytes()
    seqs = [base, _mutate(rng, base, 0.1), _mutate(rng, base, 0.1)]
    from tsta_tpu.models.poa_graph import PoaGraph
    orig_from = PoaGraph.from_sequence

    def hacked(seq, n_seq):
        g = orig_from(seq, n_seq)
        # graft 65 extra predecessors onto the last node
        tail = len(g) - 1
        for _ in range(65):
            w = g.add_node(ord("A"), 0)
            g.add_edge(w, tail)
        g.toposort()
        return g

    monkeypatch.setattr(PoaGraph, "from_sequence", staticmethod(hacked))
    outs = msa_native.align_seqs_many([seqs], AlignParams())
    assert len(outs) == 1 and len(outs[0].round_scores) == 2


@pytest.mark.slow
def test_chunked_e2e_multi_round(monkeypatch):
    """Full progressive MSA with every round forced through the chunked
    path (tiny HBM budget): output must equal the default engine's."""
    from tsta_tpu.ops import msa_native

    rng = np.random.default_rng(31)
    params = AlignParams()
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 600).tobytes()
    seqs = [base, _mutate(rng, base, 0.08), _mutate(rng, base, 0.12)]
    monkeypatch.setenv("TSTA_MSA_KERNEL", "poa")
    ref = msa_native.align_seqs(seqs, params)
    monkeypatch.setenv("TSTA_HBM_BUDGET_GB", "0.0025")
    chunked = msa_native.align_seqs(seqs, params)
    assert chunked.round_scores == ref.round_scores
    assert chunked.rows == ref.rows
    assert chunked.consensus == ref.consensus


@pytest.mark.slow
def test_chunked_fleet_matches_single(monkeypatch):
    """align_seqs_many with chunked rounds (tiny HBM budget): the
    fleet's host-side finish branch must match align_seqs exactly."""
    from tsta_tpu.ops import msa_native

    rng = np.random.default_rng(37)
    params = AlignParams()
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 500).tobytes()
    seqs = [base, _mutate(rng, base, 0.08), _mutate(rng, base, 0.1)]
    monkeypatch.setenv("TSTA_MSA_KERNEL", "poa")
    ref = msa_native.align_seqs(seqs, params)
    monkeypatch.setenv("TSTA_HBM_BUDGET_GB", "0.0025")
    outs = msa_native.align_seqs_many([seqs], params)
    assert outs[0].round_scores == ref.round_scores
    assert outs[0].rows == ref.rows
    assert outs[0].consensus == ref.consensus


def test_round_memory_plan(monkeypatch):
    """3x50kbp scale fits one words plane; the round-2 HBM ceiling
    (100 kbp+) now returns a chunk plan instead of raising; only a
    genuinely impossible working set still raises with guidance."""
    monkeypatch.delenv("TSTA_HBM_BUDGET_GB", raising=False)
    assert msa_pallas._round_plan(51200, 51200, 64) is None
    NC = msa_pallas._round_plan(100352, 102400, 64)
    assert NC is not None and NC % msa_pallas._node_block(100352) == 0
    # chunk working set: one chunk's words + all ring snapshots << HBM
    nchunks = -(-100352 // NC)
    need = 2 * NC * 102400 + nchunks * 8 * 64 * 102400
    assert need < 4 * 2 ** 30
    with pytest.raises(ValueError, match="compat"):
        msa_pallas._round_plan(1 << 21, 1 << 20, 1 << 18)


def test_round_plan_unsplittable_dead_zone(monkeypatch):
    """A graph too small to subdivide (N <= one chunk) whose plane is
    between 0.5x and 0.8x of budget must run single-call, not raise:
    the chunked path's 2-plane accounting doubled the requirement
    (found by differential fuzz at tiny TSTA_HBM_BUDGET_GB)."""
    # 2*N*n = 294912; budget such that 0.5*b < 294912 <= 0.8*b
    N, n, W = 384, 384, 2
    budget = 500_000
    monkeypatch.setenv("TSTA_HBM_BUDGET_GB", str(budget / 2 ** 30))
    assert msa_pallas._round_plan(N, n, W) is None
    # genuinely too big still raises (plane alone exceeds 0.8*budget)
    monkeypatch.setenv("TSTA_HBM_BUDGET_GB", str(300_000 / 2 ** 30))
    with pytest.raises(ValueError, match="compat"):
        msa_pallas._round_plan(N, n, W)


def test_chunked_round_matches_single(monkeypatch):
    """Force the chunked checkpoint/rematerialise path with a tiny HBM
    budget: outputs must be identical to the single-call kernel path
    (scores, alignment walk, fused graph)."""
    from tsta_tpu.models.poa_graph import PoaGraph

    rng = np.random.default_rng(21)
    params = AlignParams()
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 600).tobytes()
    seqs = [base, _mutate(rng, base, 0.08)]

    def run():
        g = PoaGraph.from_sequence(seqs[0], len(seqs))
        outs = []
        for sno in (1,):
            scores, align, best_row, order = msa_pallas.round_dp_fused(
                g, seqs[sno], params)
            best_row = int(best_row)
            sc = int(np.asarray(scores)[0, best_row])
            from tsta_tpu.ops import msa_native
            msa_native._merge(g, seqs[sno], sno, order,
                              np.asarray(align)[:len(seqs[sno])])
            g.toposort()
            outs.append((sc, list(np.asarray(align)[:len(seqs[sno])])))
        return outs, g.msa_rows(), g.consensus()

    ref = run()
    # bucket(600+) nodes => N >= 1024; words = 2*N*n; make the budget
    # small enough that the plan chunks (>= 2 chunks of NB=512)
    monkeypatch.setenv("TSTA_HBM_BUDGET_GB", "0.0025")
    assert msa_pallas._round_plan(1024, 768, 16) is not None
    chunked = run()
    monkeypatch.delenv("TSTA_HBM_BUDGET_GB")
    assert chunked[0] == ref[0]
    assert chunked[1] == ref[1]
    assert chunked[2] == ref[2]


@pytest.mark.slow
def test_poa_kernel_dma_race_detector(monkeypatch):
    """Run the POA kernel (single-call AND chunked) under the interpret
    race detector with adversarial on-wait DMA semantics: a DMA
    completes only when waited, and any read of bytes with an
    outstanding un-waited write raises.  This is the only pre-hardware
    check of the kernel's wait placement (plain interpret mode runs
    DMAs synchronously and cannot surface a missing wait): the state
    ring's deferred wait must still order distance-1 multi-pred
    gathers, and the WB-batched words flushes must complete before
    their staging slots are reused."""
    from jax.experimental import pallas as plmod
    from jax.experimental.pallas import tpu as pltpu

    orig = plmod.pallas_call

    def patched(*a, **k):
        if k.get("interpret"):
            k["interpret"] = pltpu.InterpretParams(
                detect_races=True, dma_execution_mode="on_wait",
                uninitialized_memory="nan")
        return orig(*a, **k)

    monkeypatch.setattr(plmod, "pallas_call", patched)
    params = AlignParams()
    rng = np.random.default_rng(5)
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 400).tobytes()
    seqs = [base] + [_mutate(rng, base, 0.12) for _ in range(3)]

    out = align_seqs(seqs, params)
    monkeypatch.setenv("TSTA_MSA_KERNEL", "scan")
    ref = align_seqs(seqs, params)
    monkeypatch.delenv("TSTA_MSA_KERNEL")
    assert out.round_scores == ref.round_scores
    assert out.rows == ref.rows and out.consensus == ref.consensus

    # chunked path: ring state handed across calls via aliasing
    monkeypatch.setenv("TSTA_HBM_BUDGET_GB", "0.002")
    out_c = align_seqs(seqs, params)
    monkeypatch.delenv("TSTA_HBM_BUDGET_GB")
    assert out_c.round_scores == ref.round_scores
    assert out_c.rows == ref.rows and out_c.consensus == ref.consensus


def test_banded_walk_matches_xla_walk(monkeypatch):
    """The banded SMEM Pallas walk (msa_pallas._walk_banded) emits the
    identical alignment, rows and consensus as the XLA gather walk on
    the same inputs (round-4 walk rework; gate via
    TSTA_BANDED_MSA_WALK)."""
    params = AlignParams()
    rng = np.random.default_rng(17)
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 700).tobytes()
    seqs = [base] + [_mutate(rng, base, 0.10) for _ in range(4)]

    monkeypatch.setenv("TSTA_MSA_KERNEL", "poa")
    monkeypatch.delenv("TSTA_BANDED_MSA_WALK", raising=False)
    out_b = align_seqs(seqs, params)
    monkeypatch.setenv("TSTA_BANDED_MSA_WALK", "0")
    out_x = align_seqs(seqs, params)
    assert out_b.round_scores == out_x.round_scores
    assert out_b.rows == out_x.rows
    assert out_b.consensus == out_x.consensus


@pytest.mark.slow
def test_chunked_window_top_topology(monkeypatch):
    """Window-top chunk topology (round-3 verdict item 3): the real
    3x200 kbp run is TPU-only (validated on hardware: 17.0 s warm, r4),
    but its distinguishing structure -- MANY chunks per round (>= 4),
    ring state crossing several chunk boundaries, a progressive
    multi-round graph with variants -- is pinned here at CPU-feasible
    scale: full progressive MSA, chunked vs unchunked byte-identical.
    """
    from tsta_tpu.ops.msa_native import align_seqs

    rng = np.random.default_rng(29)
    params = AlignParams()
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 1400).tobytes()
    seqs = [base] + [_mutate(rng, base, 0.07) for _ in range(2)]

    monkeypatch.setenv("TSTA_MSA_KERNEL", "poa")
    ref = align_seqs(seqs, params)
    # graph grows past 1536 nodes -> N >= 2048; budget sized so the
    # plan cuts >= 4 chunks of NB=512
    monkeypatch.setenv("TSTA_HBM_BUDGET_GB", "0.008")
    NC = msa_pallas._round_plan(2048, 1536, 16)
    assert NC is not None and 2048 // NC >= 4
    out = align_seqs(seqs, params)
    monkeypatch.delenv("TSTA_HBM_BUDGET_GB")
    assert out.round_scores == ref.round_scores
    assert out.rows == ref.rows and out.consensus == ref.consensus


def test_chunked_fused_window_matches_single(monkeypatch):
    """The fused two-chunk banded backward (three planes live) must
    match the single-call path bit-for-bit.  Budget chosen so the plan
    chunks into >= 3 chunks AND the three-plane gate is on (the tiny
    budgets of the other chunked tests force the one-chunk-per-sync
    fallback)."""
    from tsta_tpu.models.poa_graph import PoaGraph
    from tsta_tpu.ops import msa_native

    rng = np.random.default_rng(33)
    params = AlignParams()
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 1600).tobytes()
    seqs = [base, _mutate(rng, base, 0.08), _mutate(rng, base, 0.05)]

    def run():
        g = PoaGraph.from_sequence(seqs[0], len(seqs))
        outs = []
        for sno in (1, 2):
            scores, align, best_row, order = msa_pallas.round_dp_fused(
                g, seqs[sno], params)
            best_row = int(best_row)
            sc = int(np.asarray(scores)[0, best_row])
            msa_native._merge(g, seqs[sno], sno, order,
                              np.asarray(align)[:len(seqs[sno])])
            g.toposort()
            outs.append((sc, list(np.asarray(align)[:len(seqs[sno])])))
        return outs, g.msa_rows(), g.consensus()

    ref = run()
    monkeypatch.setenv("TSTA_HBM_BUDGET_GB", "0.011")
    n = msa_pallas.bucket(len(seqs[1]))
    NC = msa_pallas._round_plan(2048, n, 16)
    assert NC is not None and 2048 // NC >= 3, (NC, n)
    assert 6 * NC * n <= msa_pallas._hbm_budget() // 2  # fused gate ON
    chunked = run()
    monkeypatch.delenv("TSTA_HBM_BUDGET_GB")
    assert chunked[0] == ref[0]
    assert chunked[1] == ref[1]
    assert chunked[2] == ref[2]


def test_chunked_windowed_remat_matches_single(monkeypatch):
    """Column-windowed rematerialisation (n a multiple of 1024 turns on
    boundary checkpoints + per-window remats in the chunked backward)
    must match the single-call path bit-for-bit, and must actually
    engage (spied via _ring_window).  Also pins the env opt-out."""
    from tsta_tpu.models.poa_graph import PoaGraph
    from tsta_tpu.ops import msa_native

    rng = np.random.default_rng(41)
    params = AlignParams()
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 2000).tobytes()
    seqs = [base, _mutate(rng, base, 0.08)]
    assert msa_pallas.bucket(len(seqs[1])) == 2048  # NWIN = 2
    assert msa_pallas._ckpt_windows(2048) == 2

    def run():
        g = PoaGraph.from_sequence(seqs[0], len(seqs))
        scores, align, best_row, order = msa_pallas.round_dp_fused(
            g, seqs[1], params)
        best_row = int(best_row)
        sc = int(np.asarray(scores)[0, best_row])
        al = list(np.asarray(align)[:len(seqs[1])])
        msa_native._merge(g, seqs[1], 1, order, np.asarray(align)[
            :len(seqs[1])])
        g.toposort()
        return sc, al, g.msa_rows(), g.consensus()

    ref = run()
    monkeypatch.setenv("TSTA_HBM_BUDGET_GB", "0.01")
    NC = msa_pallas._round_plan(2048, 2048, 16)
    assert NC is not None and 2048 // NC >= 2, NC
    spied = []
    orig = msa_pallas._ring_window
    monkeypatch.setattr(
        msa_pallas, "_ring_window",
        lambda *a, **k: (spied.append(1), orig(*a, **k))[1])
    windowed = run()
    assert spied, "windowed remat did not engage"
    assert windowed == ref
    # env opt-out falls back to the full-width chunked backward
    monkeypatch.setenv("TSTA_WINDOWED_REMAT", "0")
    spied.clear()
    full = run()
    assert not spied
    assert full == ref


def test_windowed_remat_vertical_heavy(monkeypatch):
    """Indel-heavy reads make the backward walk exit BELOW the fused
    chain instead of left into the previous window -- the speculation
    branch the diagonal prediction does NOT cover (r5).  Output must
    still match the single-call round exactly."""
    from tsta_tpu.models.poa_graph import PoaGraph
    from tsta_tpu.ops import msa_native

    rng = np.random.default_rng(47)
    params = AlignParams()
    bases = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(bases, 4060).tobytes()
    # read ~half the graph length (bucket 2048 -> NWIN=2): the walk
    # consumes ~2 graph rows per read column, so window crossings span
    # more chunks than the diagonal prediction assumes
    s = np.frombuffer(base, np.uint8).copy()
    keep = np.sort(rng.choice(len(s), 1990, replace=False))
    s = s[keep]
    m = rng.random(len(s)) < 0.15
    s[m] = bases[rng.integers(0, 4, int(m.sum()))]
    seqs = [base, s.tobytes()]
    assert msa_pallas.bucket(len(seqs[1])) == 2048

    def run():
        g = PoaGraph.from_sequence(seqs[0], len(seqs))
        scores, align, best_row, order = msa_pallas.round_dp_fused(
            g, seqs[1], params)
        best_row = int(best_row)
        sc = int(np.asarray(scores)[0, best_row])
        al = list(np.asarray(align)[:len(seqs[1])])
        msa_native._merge(g, seqs[1], 1, order, np.asarray(align)[
            :len(seqs[1])])
        g.toposort()
        return sc, al, g.msa_rows(), g.consensus()

    ref = run()
    monkeypatch.setenv("TSTA_HBM_BUDGET_GB", "0.014")
    NC = msa_pallas._round_plan(4096, 2048, 16)
    assert NC is not None and 4096 // NC >= 2, NC
    assert run() == ref


@pytest.mark.slow
def test_chunked_windowed_remat_nwin4(monkeypatch):
    """NWIN=4 window geometry (n=4096): a different CWs/boundary-fill
    shape class than the fast NWIN=2 test and the hardware NWIN=8
    bench stage; must match the single-call round bit-for-bit."""
    from tsta_tpu.models.poa_graph import PoaGraph
    from tsta_tpu.ops import msa_native

    rng = np.random.default_rng(43)
    params = AlignParams()
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 4050).tobytes()
    seqs = [base, _mutate(rng, base, 0.08)]
    assert msa_pallas.bucket(len(seqs[1])) == 4096
    assert msa_pallas._ckpt_windows(4096) == 4

    def run():
        g = PoaGraph.from_sequence(seqs[0], len(seqs))
        scores, align, best_row, order = msa_pallas.round_dp_fused(
            g, seqs[1], params)
        best_row = int(best_row)
        sc = int(np.asarray(scores)[0, best_row])
        al = list(np.asarray(align)[:len(seqs[1])])
        msa_native._merge(g, seqs[1], 1, order, np.asarray(align)[
            :len(seqs[1])])
        g.toposort()
        return sc, al, g.msa_rows(), g.consensus()

    ref = run()
    monkeypatch.setenv("TSTA_HBM_BUDGET_GB", "0.03")
    NC = msa_pallas._round_plan(4096, 4096, 16)
    assert NC is not None and 4096 // NC >= 2, NC
    spied = []
    orig = msa_pallas._ring_window
    monkeypatch.setattr(
        msa_pallas, "_ring_window",
        lambda *a, **k: (spied.append(1), orig(*a, **k))[1])
    assert run() == ref
    assert spied, "windowed remat did not engage"
