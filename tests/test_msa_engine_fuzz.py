"""Randomized differential fuzz: scan engine vs the Pallas POA kernel
(interpret mode), full progressive runs.

Complements test_msa_pallas.py's fixed-seed cases with randomized read
sets, scoring params, and forced chunked rounds (tiny HBM budgets).
Every trial compares round scores, graph growth, MSA rows and consensus
-- the engines implement the same exact int32 recurrence with identical
tie-breaking, so any divergence is a bug.  The r3 round-plan dead-zone
fix (msa_pallas._round_plan) came out of this sweep.
"""

import os

import numpy as np
import pytest

from tsta_tpu.config import AlignParams
from tsta_tpu.ops import msa_native

pytestmark = pytest.mark.slow


def _mutate(rng, base, div):
    b = bytearray(base)
    for i in rng.integers(0, len(b), max(1, int(len(b) * div))):
        b[i] = b"ACGT"[rng.integers(0, 4)]
    for _ in range(max(1, int(len(b) * div / 6))):
        j = int(rng.integers(0, len(b) - 2))
        del b[j]
    for _ in range(max(1, int(len(b) * div / 8))):
        j = int(rng.integers(0, len(b) - 1))
        b.insert(j, b"ACGT"[rng.integers(0, 4)])
    return bytes(b)


@pytest.mark.parametrize("trial", range(8))
def test_scan_vs_poa_random(trial, monkeypatch):
    rng = np.random.default_rng(1000 + trial)
    ln = int(rng.integers(40, 320))
    nreads = int(rng.integers(2, 5))
    div = float(rng.uniform(0.02, 0.3))
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), ln).tobytes()
    seqs = [base] + [_mutate(rng, base, div) for _ in range(nreads - 1)]
    params = AlignParams(
        match=int(rng.integers(1, 5)),
        mismatch=-int(rng.integers(1, 9)),
        gap_extend=-int(rng.integers(1, 5)),
        gap_open=-int(rng.integers(0, 7)))

    monkeypatch.setenv("TSTA_MSA_KERNEL", "scan")
    monkeypatch.delenv("TSTA_HBM_BUDGET_GB", raising=False)
    o1 = msa_native.align_seqs(seqs, params)

    monkeypatch.setenv("TSTA_MSA_KERNEL", "poa")
    if trial % 2:
        # force chunked rounds on alternating trials; an infeasible toy
        # budget raising the documented guidance is retried unchunked
        monkeypatch.setenv("TSTA_HBM_BUDGET_GB", str(
            float(rng.choice([0.0005, 0.001, 0.002]))))
    try:
        o2 = msa_native.align_seqs(seqs, params)
    except ValueError as e:
        if "cannot fit the chip" not in str(e):
            raise
        monkeypatch.delenv("TSTA_HBM_BUDGET_GB")
        o2 = msa_native.align_seqs(seqs, params)

    assert o1.round_scores == o2.round_scores
    assert o1.graph_len == o2.graph_len
    assert o1.rows == o2.rows
    assert o1.consensus == o2.consensus
