"""int16 difference kernel (ops/psa_diff.py) vs the scan oracle.

Interpret mode on CPU; real-TPU throughput and exactness are recorded by
bench.py.  Covers: multiple packed groups, pairs spanning several grid
blocks and re-anchor intervals, similar sequences (positive score drift),
parameter sets at the exactness bound, and the routing in
psa_pallas.psa_align_batch.
"""

import numpy as np
import pytest

from tsta_tpu.ops import psa_diff, psa_pallas, psa_scan

P0 = (2, -5, -2, -4)


def _rnd(rng, n):
    return rng.integers(65, 69, n).astype(np.uint8)


@pytest.mark.parametrize("use_int16", [False, True])
@pytest.mark.parametrize("params", [
    P0, (1, -1, -1, 0), (5, -4, -1, -6), (24, -24, -24, -24),
    (3, -2, -11, -46), (2, -57, -2, -4),
])
def test_diff_matches_oracle(params, use_int16):
    rng = np.random.default_rng(sum(abs(v) for v in params))
    pairs = [(_rnd(rng, int(rng.integers(5, 700))),
              _rnd(rng, int(rng.integers(5, 700)))) for _ in range(5)]
    sc, co = psa_diff.psa_align_batch_diff(pairs, params,
                                           use_int16=use_int16)
    for (a, b), s, c in zip(pairs, sc, co):
        ref = psa_scan.psa_align(a, b, params)
        assert int(ref.score) == s
        assert int(ref.last) == c


@pytest.mark.parametrize("layout", ["packed", "striped"])
def test_diff_layouts_match_oracle(layout):
    """Both tile layouts (row-major packed, columns-down-sublanes
    striped) are exact; mixed shapes across several packed groups."""
    rng = np.random.default_rng(31)
    pairs = [(_rnd(rng, int(rng.integers(10, 800))),
              _rnd(rng, int(rng.integers(10, 800)))) for _ in range(7)]
    sc, co = psa_diff.psa_align_batch_diff(pairs, P0, layout=layout)
    for (a, b), s, c in zip(pairs, sc, co):
        ref = psa_scan.psa_align(a, b, P0)
        assert (int(ref.score), int(ref.last)) == (s, c)


def test_diff_similar_sequences_cross_block():
    """Similar pairs (scores drift upward) long enough to cross the
    T_R=256 grid block and many re-anchor intervals."""
    rng = np.random.default_rng(5)
    params = P0
    for _ in range(3):
        n = int(rng.integers(600, 1500))
        a = _rnd(rng, n)
        b = a.copy()
        idx = rng.integers(0, n, max(1, n // 25))
        b[idx] = _rnd(rng, len(idx))
        b = np.delete(b, rng.integers(0, len(b), n // 40))
        sc, co = psa_diff.psa_align_batch_diff([(a, b)], params)
        ref = psa_scan.psa_align(a, b, params)
        assert int(ref.score) == sc[0]
        assert int(ref.last) == co[0]


def test_diff_uneven_1k_pair():
    rng = np.random.default_rng(0)
    a, b = _rnd(rng, 1024), _rnd(rng, 1000)
    sc, co = psa_diff.psa_align_batch_diff([(a, b)], P0)
    ref = psa_scan.psa_align(a, b, P0)
    assert (int(ref.score), int(ref.last)) == (sc[0], co[0])


def test_supports_params_gate():
    assert psa_diff.supports_params(P0)
    assert psa_diff.supports_params((24, -24, -24, -24))
    assert psa_diff.supports_params((100, -100, -60, -60))  # int32 ok
    assert not psa_diff.supports_params((2, -5, -2, 4))    # O > 0
    assert not psa_diff.supports_params((2, -5, 2, -4))    # E > 0
    assert psa_diff.supports_params_int16(P0)
    # int16 exactness bound D <= 57 (573*D must fit int16 for the
    # arithmetic max16's x - y)
    assert psa_diff.supports_params_int16((2, -57, -2, -4))
    assert not psa_diff.supports_params_int16((2, -58, -2, -4))
    assert not psa_diff.supports_params_int16((100, -100, -60, -60))
    a = np.frombuffer(b"ACGTAC", np.uint8)
    with pytest.raises(ValueError):
        psa_diff.psa_align_batch_diff([(a, a)], (2, -5, -2, 4))
    with pytest.raises(ValueError):
        psa_diff.psa_align_batch_diff([(a, a)], (100, -100, -60, -60),
                                      use_int16=True)


def test_batch_routing_uses_diff_kernel(monkeypatch):
    """psa_align_batch routes to the difference kernel for sane params
    and falls back to int32 when TSTA_NO_DIFF_KERNEL is set; both give
    identical results."""
    rng = np.random.default_rng(11)
    pairs = [(_rnd(rng, 300), _rnd(rng, 280)) for _ in range(3)]
    called = {}
    orig = psa_diff.psa_align_batch_diff

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(psa_diff, "psa_align_batch_diff", spy)
    sc1, co1 = psa_pallas.psa_align_batch(pairs, P0)
    assert called.get("yes")
    monkeypatch.setenv("TSTA_NO_DIFF_KERNEL", "1")
    sc2, co2 = psa_pallas.psa_align_batch(pairs, P0)
    assert np.array_equal(sc1, sc2)
    assert np.array_equal(co1, co2)


# ---------------------------------------------------------------------
# Packed traced path: P pairs' planes in one kernel + lockstep walk.
# ---------------------------------------------------------------------

def _traced_oracle(a, b, params):
    from tsta_tpu.ops import traceback as tb
    r = psa_scan.psa_align(a, b, params, traced=True)
    aln = tb.decode_pair(np.asarray(r.back), np.asarray(r.fback),
                         np.asarray(r.eback), a, b)
    return int(r.score), int(r.last), aln


def test_traced_packed_matches_oracle_mixed_lengths():
    """Mixed-length batch: grouping by n-bucket, per-pair real lengths
    inside a shared padded plane, and the lockstep walk with pairs
    finishing at different steps."""
    rng = np.random.default_rng(17)
    pairs = []
    for _ in range(5):
        n = int(rng.integers(40, 500))
        m = int(rng.integers(30, n + 1))   # swapped contract: len(a) >= len(b)
        pairs.append((_rnd(rng, n), _rnd(rng, m)))
    out = psa_diff.psa_align_batch_traced_packed(pairs, P0)
    for (a, b), (s, c, aln) in zip(pairs, out):
        es, ec, ealn = _traced_oracle(a, b, P0)
        assert (s, c) == (es, ec)
        assert aln == ealn


@pytest.mark.parametrize("params", [P0, (3, -2, -1, -6), (1, -2, -2, 0)])
def test_traced_packed_matches_oracle_params(params):
    rng = np.random.default_rng(sum(abs(v) for v in params) + 7)
    pairs = [(_rnd(rng, 300), _rnd(rng, 280)),
             (_rnd(rng, 290), _rnd(rng, 290))]
    out = psa_diff.psa_align_batch_traced_packed(pairs, params)
    for (a, b), (s, c, aln) in zip(pairs, out):
        es, ec, ealn = _traced_oracle(a, b, params)
        assert (s, c) == (es, ec)
        assert aln == ealn


def test_traced_packed_gap_runs():
    """Similar sequences with indels: exercises the forced gap-run
    propagation (open/extend ties) inside the lockstep walk."""
    rng = np.random.default_rng(23)
    pairs = []
    for _ in range(3):
        n = int(rng.integers(200, 400))
        a = _rnd(rng, n)
        b = np.delete(a, rng.integers(0, n, n // 10))
        b = np.insert(b, rng.integers(0, len(b), n // 20),
                      _rnd(rng, n // 20))
        if len(b) > n:
            a, b = (b, a) if len(b) >= n else (a, b)
        if len(b) > len(a):
            a, b = b, a
        pairs.append((a, b))
    out = psa_diff.psa_align_batch_traced_packed(pairs, P0)
    for (a, b), (s, c, aln) in zip(pairs, out):
        es, ec, ealn = _traced_oracle(a, b, P0)
        assert (s, c) == (es, ec)
        assert aln == ealn


def test_traced_packed_routing_in_batch_api():
    """parallel.batch.align_batch_traced_device routes through the
    packed path (same results as per-pair device chains)."""
    import os

    from tsta_tpu.config import AlignParams
    from tsta_tpu.parallel import batch as pbatch
    rng = np.random.default_rng(31)
    pairs = [(_rnd(rng, 200), _rnd(rng, 180)),
             (_rnd(rng, 150), _rnd(rng, 150)),
             (_rnd(rng, 260), _rnd(rng, 140))]
    params = AlignParams()
    packed = pbatch.align_batch_traced_device(pairs, params)
    os.environ["TSTA_TRACED_PACKED"] = "0"
    try:
        perpair = pbatch.align_batch_traced_device(pairs, params)
    finally:
        del os.environ["TSTA_TRACED_PACKED"]
    assert [(s, c, aln) for s, c, aln in packed] == \
        [(s, c, aln) for s, c, aln in perpair]


def test_traced_packed_banded_walk_matches_oracle():
    """Grid-(P,) banded Pallas walk (512-aligned n_pad) vs oracle,
    including a pair whose real lengths sit well below the pad."""
    rng = np.random.default_rng(41)
    pairs = [(_rnd(rng, 512), _rnd(rng, 500)),
             (_rnd(rng, 480), _rnd(rng, 470)),
             (_rnd(rng, 430), _rnd(rng, 80))]
    out = psa_diff.psa_align_batch_traced_packed(pairs, P0)
    for (a, b), (s, c, aln) in zip(pairs, out):
        es, ec, ealn = _traced_oracle(a, b, P0)
        assert (s, c) == (es, ec)
        assert aln == ealn


def test_traced_packed_vmem_and_budget_fallbacks(monkeypatch):
    """Scoped-VMEM sublane cap and the HBM plane budget both degrade
    gracefully: over-cap groups shrink P (or go chunked), an
    over-budget group retries its members as singletons before any
    chunked routing.  Caps pinned tiny so small inputs exercise the
    paths."""
    rng = np.random.default_rng(53)
    pairs = [(_rnd(rng, 520), _rnd(rng, 500)),
             (_rnd(rng, 512), _rnd(rng, 130)),
             (_rnd(rng, 300), _rnd(rng, 290))]
    want = [_traced_oracle(a, b, P0) for a, b in pairs]

    # S cap of 4 sublanes: every pair above 512 bp must leave the
    # packed path (singleton over cap -> chunked)
    monkeypatch.setattr(psa_diff, "S_CAP_TRACED", 4)
    out = psa_diff.psa_align_batch_traced_packed(pairs, P0)
    assert [(s, c, a) for s, c, a in out] == want

    # tiny HBM budget: grouped plane over budget -> singleton retry ->
    # (still over) chunked; results identical either way
    monkeypatch.setattr(psa_diff, "S_CAP_TRACED", 640)
    monkeypatch.setenv("TSTA_HBM_BUDGET_GB", "0.001")
    out = psa_diff.psa_align_batch_traced_packed(pairs, P0)
    assert [(s, c, a) for s, c, a in out] == want


def test_traced_packed_unswapped_m_gt_n():
    """Library users may pass pairs without the longer-horizontal swap;
    the packed path must handle m > n identically to the oracle."""
    rng = np.random.default_rng(61)
    pairs = [(_rnd(rng, 150), _rnd(rng, 400)),
             (_rnd(rng, 80), _rnd(rng, 300))]
    out = psa_diff.psa_align_batch_traced_packed(pairs, P0)
    for (a, b), (s, c, aln) in zip(pairs, out):
        es, ec, ealn = _traced_oracle(a, b, P0)
        assert (s, c) == (es, ec)
        assert aln == ealn


def test_spec_walk_matches_nonspec(monkeypatch):
    """Speculative diagonal-run walk emits the identical move lists:
    similar pairs (long diag runs + gap runs) and random pairs, spec
    on vs off, banded path forced via 512-aligned shapes."""
    rng = np.random.default_rng(71)
    pairs = []
    for _ in range(3):
        n = 512
        a = _rnd(rng, n)
        b = a.copy()
        idx = rng.integers(0, n, n // 20)
        b[idx] = _rnd(rng, len(idx))
        b = np.delete(b, rng.integers(0, n, n // 30))
        pairs.append((a, b))
    pairs.append((_rnd(rng, 480), _rnd(rng, 460)))
    monkeypatch.delenv("TSTA_SPEC_WALK", raising=False)
    out_spec = psa_diff.psa_align_batch_traced_packed(pairs, P0)
    monkeypatch.setenv("TSTA_SPEC_WALK", "0")
    out_plain = psa_diff.psa_align_batch_traced_packed(pairs, P0)
    assert out_spec == out_plain
    for (a, b), (s, c, aln) in zip(pairs, out_spec):
        es, ec, ealn = _traced_oracle(a, b, P0)
        assert (s, c, aln) == (es, ec, ealn)


def test_pair2_walk_matches_default():
    """The two-pair-interleaved banded walk kernel (kept as an
    explicitly-reachable probe -- it measured SLOWER on v5e hardware,
    see ROADMAP negative probes, so production never routes to it)
    stays exact: identical decoded moves to the default walk on a P=4
    group with unequal pair lengths (one pair drains while its partner
    is masked)."""
    import jax.numpy as jnp

    from tsta_tpu.ops import traceback as tb

    rng = np.random.default_rng(91)
    pairs = []
    for ln in (512, 512, 480, 200):   # P=4 group, uneven walks
        a = _rnd(rng, ln)
        b = a.copy()
        idx = rng.integers(0, ln, ln // 20)
        b[idx] = _rnd(rng, len(idx))
        b = np.delete(b, rng.integers(0, ln, ln // 30))
        pairs.append((a, b))
    P = len(pairs)
    n_real = [len(a) for a, _ in pairs]
    m_real = [len(b) for _, b in pairs]
    n_pad = max(psa_diff._traced_n_pad(n) for n in n_real)
    m_pad = -(-max(m_real) // psa_diff.T_R) * psa_diff.T_R
    Rp = n_pad // psa_diff.LANES
    a8 = np.full((P * Rp, psa_diff.LANES), psa_diff.A_PAD, np.uint8)
    brows8 = np.full((m_pad, P), psa_diff.B_PAD, np.uint8)
    nm = np.zeros((P, 2), np.int32)
    for k, (a, b) in enumerate(pairs):
        arow = np.full(n_pad, psa_diff.A_PAD, np.uint8)
        arow[:n_real[k]] = a
        a8[k * Rp:(k + 1) * Rp] = arow.reshape(Rp, psa_diff.LANES)
        brows8[:m_real[k], k] = b
        nm[k] = (n_real[k], m_real[k])
    nm_d = jnp.asarray(nm)
    _, _, plane = psa_diff._psa_diff_traced_call(
        jnp.asarray(a8).astype(jnp.int32),
        jnp.asarray(brows8).astype(jnp.int32), nm_d,
        n_pad, m_pad, P, P0)
    wr, cr = tb._decode_moves_banded_packed(plane, nm_d, Rp, True)
    wp, cp = tb._decode_moves_banded_packed(plane, nm_d, Rp, True,
                                            pair2=True)
    wr, cr, wp, cp = map(np.asarray, (wr, cr, wp, cp))
    assert (cr == cp).all()
    for k in range(P):   # decoded payloads, not raw tail garbage
        assert (tb.unpack_moves(wr[k], cr[k])
                == tb.unpack_moves(wp[k], cp[k])).all()


def test_traced_packed_tiny_pairs():
    """Degenerate lengths through the packed traced path: length-1
    sides, single-base matches, and a pair just under the spec-walk's
    i,j >= 7 boundary."""
    rng = np.random.default_rng(83)
    pairs = [(np.frombuffer(b"A", np.uint8), np.frombuffer(b"A", np.uint8)),
             (np.frombuffer(b"ACGT", np.uint8),
              np.frombuffer(b"T", np.uint8)),
             (_rnd(rng, 7), _rnd(rng, 7)),
             (_rnd(rng, 9), _rnd(rng, 8))]
    out = psa_diff.psa_align_batch_traced_packed(pairs, P0)
    for (a, b), (s, c, aln) in zip(pairs, out):
        es, ec, ealn = _traced_oracle(a, b, P0)
        assert (s, c) == (es, ec)
        assert aln == ealn


def test_traced_packed_word_flush_boundary():
    """Walks whose move count is an exact multiple of 16 exercise the
    packed-word final-flush edge (the tail word is empty and the
    unconditional post-loop write must not corrupt the last full
    word): identical pairs of lengths 512/1024 walk exactly len diag
    moves."""
    rng = np.random.default_rng(97)
    pairs = []
    for ln in (512, 1024):
        a = _rnd(rng, ln)
        pairs.append((a, a.copy()))
    # and one pair one move OFF the boundary
    a = _rnd(rng, 513)
    pairs.append((a, a.copy()))
    out = psa_diff.psa_align_batch_traced_packed(pairs, P0)
    for (a, b), (s, c, aln) in zip(pairs, out):
        es, ec, ealn = _traced_oracle(a, b, P0)
        assert (s, c, aln) == (es, ec, ealn)
        assert aln.a_row == bytes(a)   # identical pair: pure diagonal
