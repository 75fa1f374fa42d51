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
