"""Native-engine output quality anchored against the compat engine
(round-1 verdict #5/#8: 'usually equal or better' was asserted, never
measured).

The native engine is exact int32 (no reference int8 clamps) with
simplified tie rules, so outputs may differ from compat; this corpus
quantifies it.  Invariants asserted:

* every row reconstructs its input sequence exactly (both engines);
* the native final-round score is >= the compat score on every set
  (removing saturation clamps can only raise the DP optimum for the
  same graph; progressive divergence could in principle break this,
  so it is measured -- a failure here is a real regression signal);
* on low-divergence sets the engines agree on round scores almost
  always (exact figure recorded in ROADMAP.md).
"""

import numpy as np
import pytest

from tsta_tpu.config import AlignParams
from tsta_tpu.models import msa as msa_model
from tsta_tpu.ops import msa_native


def _mutate(rng, base, div):
    s = bytearray(base)
    for i in rng.integers(0, len(s), max(1, int(len(s) * div))):
        s[i] = b"ACGT"[rng.integers(0, 4)]
    for _ in range(max(1, int(len(s) * div / 6))):
        j = int(rng.integers(0, len(s) - 2))
        if rng.random() < 0.5:
            del s[j]
        else:
            s.insert(j, b"ACGT"[rng.integers(0, 4)])
    return bytes(s)


def _reconstruct_ok(rows, seqs):
    for row, seq in zip(rows, seqs):
        if row.replace(b"-", b"") != seq:
            return False
    return True


@pytest.mark.slow
def test_native_vs_compat_quality_corpus():
    rng = np.random.default_rng(0)
    params = AlignParams()
    n_sets = 20
    stats = {"sets": 0, "scores_equal": 0, "native_better": 0,
             "native_worse": 0, "rows_identical": 0,
             "consensus_identical": 0}
    for t in range(n_sets):
        ln = int(rng.integers(80, 300))
        div = [0.03, 0.08, 0.15][t % 3]
        base = rng.choice(np.frombuffer(b"ACGT", np.uint8), ln).tobytes()
        nreads = int(rng.integers(3, 7))
        seqs = [_mutate(rng, base, div) for _ in range(nreads)]

        out_c = msa_model.align_seqs(seqs, params, engine="compat")
        out_n = msa_native.align_seqs(seqs, params)

        assert _reconstruct_ok(out_c.rows, seqs)
        assert _reconstruct_ok(out_n.rows, seqs)

        stats["sets"] += 1
        sc_c, sc_n = out_c.round_scores[-1], out_n.round_scores[-1]
        if sc_n == sc_c:
            stats["scores_equal"] += 1
        elif sc_n > sc_c:
            stats["native_better"] += 1
        else:
            stats["native_worse"] += 1
        if out_c.rows == out_n.rows:
            stats["rows_identical"] += 1
        if out_c.consensus == out_n.consensus:
            stats["consensus_identical"] += 1

    print("QUALITY_STATS", stats)
    # the engines must be in the same quality class: the native final
    # score may never be worse on more than a small fraction of sets
    assert stats["native_worse"] <= stats["sets"] // 5, stats
    # round-2 landed full parity on this corpus (native graph adopted
    # the reference's tp1+modify consensus re-scoring and condensed
    # column ordering; ROADMAP.md).  Pin it: a silent regression to
    # "mostly identical" must fail CI, not just reprint lower stats.
    assert stats["scores_equal"] == stats["sets"], stats
    assert stats["rows_identical"] == stats["sets"], stats
    assert stats["consensus_identical"] == stats["sets"], stats
