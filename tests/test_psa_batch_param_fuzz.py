"""Randomized-params differential fuzz of the production PSA batch
paths (psa_diff.psa_align_batch_diff and psa_align_batch_traced_packed)
vs the scan oracle.

Existing tests pin fixed seeds and the default scoring; this sweep
randomizes the scoring parameters too (any M>0>X, E<0, O<=0 -- the
packed kernels' supported family), batch composition, and pair order
(unswapped m>n included).  Alignments are validated by re-scoring.
A 12-trial ad-hoc run of the same generator was all-exact (r3).
"""

import numpy as np
import pytest

from tsta_tpu.ops import psa_diff, psa_scan
from tsta_tpu.ops import traceback as tb

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("trial", range(3))
def test_batch_paths_random_params(trial):
    rng = np.random.default_rng(7000 + trial)
    p = (int(rng.integers(1, 5)), -int(rng.integers(1, 9)),
         -int(rng.integers(1, 5)), -int(rng.integers(0, 7)))
    nb = int(rng.integers(2, 6))
    pairs = [(rng.integers(65, 69, int(rng.integers(1, 700))).astype(
        np.uint8),
        rng.integers(65, 69, int(rng.integers(1, 700))).astype(np.uint8))
        for _ in range(nb)]
    refs = [psa_scan.psa_align(a, b, p) for a, b in pairs]

    sc, co = psa_diff.psa_align_batch_diff(pairs, p)
    for r, s, c in zip(refs, sc, co):
        assert int(r.score) == int(s) and int(r.last) == int(c)

    class _P:
        match, mismatch, gap_extend, gap_open = p

    out = psa_diff.psa_align_batch_traced_packed(pairs, p)
    for (a, b), r, (s, c, aln) in zip(pairs, refs, out):
        assert int(r.score) == int(s) and int(r.last) == int(c)
        assert tb.score_alignment(aln.a_row, aln.b_row, _P) == int(c)
        assert aln.a_row.replace(b"-", b"") == a.tobytes()
        assert aln.b_row.replace(b"-", b"") == b.tobytes()
