"""Multi-host MSA graph-delta broadcast (parallel/msa_multihost.py).

Single-process coverage here (the broadcast degenerates to identity and
the segment walk still crosses device-shard boundaries on the virtual
8-CPU mesh); the real 2-process rendezvous run is
tests/test_multihost.py::test_two_process_msa_delta_broadcast.
"""

import numpy as np
import pytest

from tsta_tpu.config import AlignParams
from tsta_tpu.ops import msa_native
from tsta_tpu.parallel import mesh as meshlib
from tsta_tpu.parallel.msa_multihost import align_seqs_multihost


def _corpus(rng, n_reads, ln, div=0.08):
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), ln).tobytes()
    seqs = []
    for _ in range(n_reads):
        s = bytearray(base)
        for i in rng.integers(0, len(s), max(1, int(len(s) * div))):
            s[i] = b"ACGT"[rng.integers(0, 4)]
        for _ in range(max(1, int(len(s) * div / 6))):
            j = int(rng.integers(0, len(s) - 2))
            if rng.random() < 0.5:
                del s[j]
            else:
                s.insert(j, b"ACGT"[rng.integers(0, 4)])
        seqs.append(bytes(s))
    return seqs


@pytest.mark.parametrize("seq_ax", [2, 4])
def test_multihost_driver_matches_native(seq_ax):
    rng = np.random.default_rng(3)
    params = AlignParams()
    seqs = _corpus(rng, 4, 180)
    mesh = meshlib.make_mesh(data=1, seq=seq_ax)
    out_mh = align_seqs_multihost(seqs, params, mesh=mesh)
    out_1 = msa_native.align_seqs(seqs, params)
    assert out_mh.round_scores == out_1.round_scores
    assert out_mh.rows == out_1.rows
    assert out_mh.consensus == out_1.consensus
    assert out_mh.add_len == out_1.add_len


def test_multihost_walk_crosses_segments():
    """A read long enough that the traceback must cross every column
    shard; also exercises the n_real inside a middle shard case."""
    rng = np.random.default_rng(11)
    params = AlignParams()
    seqs = _corpus(rng, 3, 700, div=0.12)
    mesh = meshlib.make_mesh(data=1, seq=4)
    out_mh = align_seqs_multihost(seqs, params, mesh=mesh)
    out_1 = msa_native.align_seqs(seqs, params)
    assert out_mh.round_scores == out_1.round_scores
    assert out_mh.rows == out_1.rows
    assert out_mh.consensus == out_1.consensus


def test_apply_delta_is_merge():
    """apply_delta must replay exactly what the in-process fusion did
    (the delta contract multi-host correctness rests on)."""
    from tsta_tpu.models.poa_graph import PoaGraph

    rng = np.random.default_rng(5)
    params = AlignParams()
    seqs = _corpus(rng, 2, 120)
    g1 = PoaGraph.from_sequence(seqs[0], 2)
    g2 = PoaGraph.from_sequence(seqs[0], 2)
    (sink_scores, packed, h_pred, e_pred, preds,
     order) = msa_native._scan_engine_round(g1, seqs[1], params)
    sinks = set(g1.sinks())
    best = max((i for i, v in enumerate(order) if v in sinks),
               key=lambda i: sink_scores[i])
    align = msa_native._walk_host(packed, h_pred, e_pred, preds, best,
                                  len(seqs[1]))
    added1 = msa_native._merge(g1, seqs[1], 1, order, align)
    added2 = g2.apply_delta(seqs[1], 1, order, align)
    assert added1 == added2
    assert g1.bases == g2.bases and g1.preds == g2.preds
    assert g1.weights == g2.weights
    g1.toposort(), g2.toposort()
    assert g1.msa_rows() == g2.msa_rows()
    assert g1.consensus() == g2.consensus()
