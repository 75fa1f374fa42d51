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


def test_msa_round_snapshot(tmp_path):
    p = str(tmp_path / "snap.npz")
    seqs = [b"ACGT", b"AGGT"]
    checkpoint.save_msa_round(p, 1, seqs, {"scores": [5]})
    snap = checkpoint.load_msa_round(p, seqs)
    assert snap["round_idx"] == 1 and snap["stats"]["scores"] == [5]
    assert checkpoint.load_msa_round(p, [b"ACGT", b"TTTT"]) is None
    assert checkpoint.load_msa_round(str(tmp_path / "no.npz"), seqs) is None
