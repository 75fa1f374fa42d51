"""Exotic-parameter audit vs the reference binary (round-1 verdict #9).

The reference accepts any int8 scoring parameters (psa.c:546-581).  This
audit establishes, with the binary run fresh, exactly where our exact
engines match it and where the divergence is deliberate:

* X >= 0 (positive mismatch), E > 0, E = 0, |params| up to int8 range:
  the binary's int8 difference machinery stays EXACT (verified against a
  brute-force int32 Gotoh) and our unpadded scan path matches it.
* O > 0 (positive gap open): the binary emits scores that contradict its
  own recurrence (lazy-F assumes re-opening never wins) -- there is no
  correct behavior to match, so our engines reject with ValueError.
* Empty input: the binary prints the -100 sentinel; we raise.

Lengths are multiples of L=160 (reference pads seq1 with uninitialised
heap bytes otherwise).
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from tsta_tpu.ops import psa_scan

REF = "/tmp/refbuild"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF + "/TSTA_psa_notrace"),
    reason="reference binaries not built (see /tmp/refbuild)")


def _run_binary(a: bytes, b: bytes, m, x, e, o) -> int:
    td = tempfile.mkdtemp()
    for name, s in (("a", a), ("b", b)):
        with open(os.path.join(td, name + ".fa"), "wb") as f:
            f.write(b">s\n" + s + b"\n")
    # Generous timeout: the reference binary spins an OpenMP pool and has
    # been observed to take minutes on a heavily contended machine (one
    # CI-style flake at 120 s for a 160x160 pair).
    pr = subprocess.run(
        [REF + "/TSTA_psa_notrace", "-M", str(m), "-X", str(x),
         "-E", str(e), "-O", str(o), "-1", td + "/a.fa",
         "-2", td + "/b.fa", "-o", td + "/o.txt"],
        capture_output=True, text=True, timeout=600)
    assert pr.returncode == 0, pr.stderr
    return int(pr.stdout.strip().split("=")[1])


def _pair(rng, n=160, m=160):
    return (rng.choice(np.frombuffer(b"ACGT", np.uint8), n).tobytes(),
            rng.choice(np.frombuffer(b"ACGT", np.uint8), m).tobytes())


@pytest.mark.parametrize("params", [
    (2, 3, -2, -4),      # positive mismatch
    (2, 0, -2, -4),      # zero mismatch
    (2, -5, 2, -4),      # positive gap extend
    (2, -5, 0, 0),       # zero gap costs
    (100, -120, -2, -4),  # int8-range magnitudes
    (1, -1, -1, 0),      # linear gap model
])
def test_scan_matches_binary_on_exotic_params(params):
    m, x, e, o = params
    rng = np.random.default_rng(sum(abs(v) for v in params))
    for _ in range(3):
        a, b = _pair(rng)
        ref = _run_binary(a, b, m, x, e, o)
        res = psa_scan.psa_align(np.frombuffer(a, np.uint8),
                                 np.frombuffer(b, np.uint8), params)
        assert int(res.score) == ref, (params, ref, int(res.score))


def test_positive_gap_open_binary_contradicts_own_recurrence():
    """For O>0 the binary's output violates the Gotoh recurrence it
    implements for O<=0 -- documented divergence: we reject instead."""
    rng = np.random.default_rng(0)
    a, b = _pair(rng)
    m, x, e, o = 2, -5, -2, 4
    ref = _run_binary(a, b, m, x, e, o)

    # brute-force the recurrence the binary implements for O<=0
    NEGB = -10 ** 9
    n, mm = len(a), len(b)
    H = np.zeros((mm + 1, n + 1), np.int64)
    E = np.full((mm + 1, n + 1), NEGB, np.int64)
    F = np.full((mm + 1, n + 1), NEGB, np.int64)
    H[0, 1:] = o + np.arange(1, n + 1) * e
    H[1:, 0] = o + np.arange(1, mm + 1) * e
    best = NEGB
    for i in range(1, mm + 1):
        for j in range(1, n + 1):
            E[i, j] = max(E[i - 1, j] + e, H[i - 1, j] + o + e)
            F[i, j] = max(F[i, j - 1] + e, H[i, j - 1] + o + e)
            sub = m if a[j - 1] == b[i - 1] else x
            H[i, j] = max(H[i - 1, j - 1] + sub, E[i, j], F[i, j])
            best = max(best, H[i, j])
    assert ref != best  # the binary's O>0 output is not the recurrence

    with pytest.raises(ValueError, match="gap_open"):
        psa_scan.psa_align(np.frombuffer(a, np.uint8),
                           np.frombuffer(b, np.uint8), (m, x, e, o))
