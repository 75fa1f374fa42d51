import os

from tsta_tpu.utils import checkpoint, profiling


def test_phase_timers():
    ph = profiling.Phase()
    with ph("a"):
        pass
    with ph("a"):
        pass
    rep = ph.report()
    assert rep[0]["phase"] == "a" and rep[0]["calls"] == 2


def test_gcups():
    assert profiling.gcups(2e9, 2.0) == 1.0


def test_sharded_results_resume(tmp_path):
    p = str(tmp_path / "res.jsonl")
    st = checkpoint.ShardedResults(p)
    st.record({"name": "x", "score": 1})
    st.record({"name": "y", "score": 2})
    st2 = checkpoint.ShardedResults(p)  # reload
    assert st2.done("x") and st2.get("y")["score"] == 2
    assert len(st2.results()) == 2


def test_graph_snapshot_roundtrip(tmp_path):
    from tsta_tpu.models.poa_graph import PoaGraph, load_graph, save_graph
    g = PoaGraph.from_sequence(b"ACGT", 2)
    p = str(tmp_path / "g.npz")
    save_graph(p, g, extra={"round": 1})
    g2, extra = load_graph(p)
    assert extra["round"] == 1
    assert g2.bases == g.bases and g2.preds == g.preds
    assert checkpoint.seqs_digest([b"A"]) != checkpoint.seqs_digest([b"C"])
