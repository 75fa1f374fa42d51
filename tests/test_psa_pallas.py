"""Pallas kernel vs scan oracle (interpret mode on CPU; the same kernel
is verified on real TPU by bench.py / the driver)."""

import numpy as np
import pytest

from tsta_tpu.ops import psa_pallas, psa_scan

PARAMS = [(2, -5, -2, -4), (3, -2, -1, -6), (1, -2, -2, 0)]


@pytest.mark.parametrize("seed", range(3))
def test_pallas_matches_oracle_traced(seed):
    rng = np.random.default_rng(seed)
    p = PARAMS[seed % len(PARAMS)]
    n, m = int(rng.integers(5, 300)), int(rng.integers(5, 300))
    a = rng.integers(65, 69, n).astype(np.uint8)
    b = rng.integers(65, 69, m).astype(np.uint8)
    r1 = psa_scan.psa_align(a, b, p, traced=True)
    r2 = psa_pallas.psa_align(a, b, p, traced=True)
    assert int(r1.score) == int(r2.score)
    assert int(r1.last) == int(r2.last)
    assert np.array_equal(np.asarray(r1.back), r2.back)
    assert np.array_equal(np.asarray(r1.fback), r2.fback)
    assert np.array_equal(np.asarray(r1.eback), r2.eback)


def test_pallas_score_only():
    rng = np.random.default_rng(9)
    a = rng.integers(65, 69, 500).astype(np.uint8)
    b = rng.integers(65, 69, 400).astype(np.uint8)
    r1 = psa_scan.psa_align(a, b, PARAMS[0])
    r2 = psa_pallas.psa_align(a, b, PARAMS[0])
    assert int(r1.score) == int(r2.score)
    assert int(r1.last) == int(r2.last)


@pytest.mark.parametrize("seed", range(3))
def test_traced_chunked_matches_device(seed):
    """Chunked traced path (checkpoint/rematerialise, for pairs whose
    plane exceeds HBM) must emit the identical alignment; mc pinned to
    T_R so the walk crosses several chunk boundaries, including forced
    gap runs across them."""
    rng = np.random.default_rng(100 + seed)
    p = PARAMS[seed % len(PARAMS)]
    n = int(rng.integers(200, 900))
    m = int(rng.integers(520, 1200))   # > 2 chunks at mc = T_R
    a = rng.integers(65, 69, n).astype(np.uint8)
    b = rng.integers(65, 69, m).astype(np.uint8)
    s1, c1, aln1 = psa_pallas.psa_align_traced_device(a, b, p)
    s2, c2, aln2 = psa_pallas.psa_align_traced_chunked(
        a, b, p, mc=psa_pallas.T_R)
    assert s1 == s2 and c1 == c2
    assert aln1 == aln2


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(6))
def test_traced_chunked_fuzz_vs_scan(seed):
    """Chunked traced path vs the scan oracle: score, corner, and a
    re-scored alignment equal to the reported score."""
    from tsta_tpu.ops import traceback as tb
    rng = np.random.default_rng(400 + seed)
    p = PARAMS[seed % len(PARAMS)]
    n = int(rng.integers(100, 1500))
    m = int(rng.integers(520, 1500))
    a = rng.integers(65, 69, n).astype(np.uint8)
    b = rng.integers(65, 69, m).astype(np.uint8)
    ref = psa_scan.psa_align(a, b, p)
    s, c, aln = psa_pallas.psa_align_traced_chunked(
        a, b, p, mc=psa_pallas.T_R)

    class _P:
        match, mismatch, gap_extend, gap_open = p
    assert s == int(ref.score) and c == int(ref.last)
    assert tb.score_alignment(aln.a_row, aln.b_row, _P) == c


def test_positive_gap_open_rejected():
    """Regression: padding is only score-safe for gap_open <= 0; the
    kernels must reject rather than silently inflate the matrix max."""
    import numpy as np
    a = np.frombuffer(b"ACGTAC", np.uint8)
    with pytest.raises(ValueError):
        psa_pallas.psa_align(a, a, (2, -5, -2, 8))
    with pytest.raises(ValueError):
        psa_pallas.psa_align_batch([(a, a)], (2, -5, -2, 8))
    with pytest.raises(ValueError):
        psa_pallas.psa_align_traced_device(a, a, (2, -5, -2, 8))


def test_packed_batch_matches_oracle():
    """Sublane-packed short-pair kernel: mixed sizes, many pairs."""
    import numpy as np
    rng = np.random.default_rng(12)
    pairs = [(rng.integers(65, 69, int(rng.integers(20, 1400))).astype(
        np.uint8),
        rng.integers(65, 69, int(rng.integers(20, 900))).astype(np.uint8))
        for _ in range(9)]
    sc, co = psa_pallas.psa_align_batch_packed(pairs, (2, -5, -2, -4))
    for (a, b), s, c in zip(pairs, sc, co):
        ref = psa_scan.psa_align(a, b, (2, -5, -2, -4))
        assert int(ref.score) == s and int(ref.last) == c


def test_banded_walk_matches_while_walk():
    """The opt-in banded Pallas walk (ops/traceback._decode_moves_banded)
    must agree with the lax.while_loop walk move-for-move."""
    import jax.numpy as jnp

    from tsta_tpu.ops import traceback as tb

    rng = np.random.default_rng(3)
    n, m = 300, 200
    a = rng.integers(65, 69, n).astype(np.uint8)
    b = a[:m].copy()
    b[rng.integers(0, m, 20)] = rng.integers(65, 69, 20).astype(np.uint8)
    r = psa_pallas.psa_align(a, b, (2, -5, -2, -4), traced=True)
    fcode = np.where(np.asarray(r.fback) < 0, 2,
                     np.where(np.asarray(r.fback) == 2, 1, 0))
    ecode = np.where(np.asarray(r.eback) < 0, 2,
                     np.where(np.asarray(r.eback) == 2, 1, 0))
    plane = jnp.asarray((np.asarray(r.back).astype(np.int32) * 9
                         + fcode * 3 + ecode).astype(np.int8))
    npad = (n + 511) // 512 * 512   # banded walk: 128-word windows
    mpad = (m + 31) // 8 * 8
    pl_pad = jnp.zeros((mpad, npad), jnp.int8).at[:m, :n].set(plane)
    mv1, c1 = tb._decode_moves(plane, m, n)
    mv2, c2 = tb._decode_moves_banded(pl_pad, m, n, n_stride=npad)
    assert int(c1) == int(c2)
    assert np.array_equal(np.asarray(mv1)[:int(c1)],
                          np.asarray(mv2)[:int(c2)])


def test_traced_device_bucket_shares_compile():
    """Real lengths are traced (SMEM) in the fused traced chain: pairs
    of different real lengths inside one padded bucket must both decode
    correctly through the same compiled program."""
    from tsta_tpu.ops import traceback as tb
    rng = np.random.default_rng(8)
    for n, m in [(100, 70), (120, 90)]:   # same (128, 256) padded bucket
        a = rng.integers(65, 69, n).astype(np.uint8)
        b = rng.integers(65, 69, m).astype(np.uint8)
        sc, co, aln = psa_pallas.psa_align_traced_device(a, b,
                                                         (2, -5, -2, -4))
        ref = psa_scan.psa_align(a, b, (2, -5, -2, -4))
        assert (int(ref.score), int(ref.last)) == (sc, co)
        assert aln.a_row.replace(b"-", b"") == a.tobytes()
        assert aln.b_row.replace(b"-", b"") == b.tobytes()
        from tsta_tpu.config import AlignParams
        # the emitted alignment is the full corner-to-corner path, so
        # its re-score equals the corner, not the matrix max
        assert tb.score_alignment(aln.a_row, aln.b_row,
                                  AlignParams()) == co


@pytest.mark.parametrize("n", [2048, 3072])
def test_traced_chunked_r_multiple_of_8(n):
    """Chunked traced DP at widths whose segment count R is a multiple
    of 8: the r3 aliased-revisited-output state formulation silently
    corrupted H/E/best on v5e hardware EXACTLY at R % 8 == 0 (latent --
    interpret mode never showed it, and naturally-routed chunked pairs
    happened to land on other widths).  State now lives in scratch;
    this pins the shape class so interpret-level regressions surface,
    and the bench's traced stage re-checks one such shape on hardware
    every round."""
    rng = np.random.default_rng(3)
    a = rng.integers(65, 69, n).astype(np.uint8)
    b = a.copy()
    m = rng.random(n) < 0.05
    b[m] = rng.integers(65, 69, int(m.sum())).astype(np.uint8)
    b = np.delete(b, rng.integers(0, n, n // 50))
    p = (2, -5, -2, -4)
    assert (n // 128) % 8 == 0
    s1, c1, aln1 = psa_pallas.psa_align_traced_device(a, b, p)
    s2, c2, aln2 = psa_pallas.psa_align_traced_chunked(a, b, p, mc=512)
    assert (s1, c1) == (s2, c2)
    assert aln1 == aln2
