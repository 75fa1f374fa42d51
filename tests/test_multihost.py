"""Multi-host paths, exercised for real (round-1 verdict: these were
wired but never tested).

* ``TSTA_NUM_PROCESSES``/``TSTA_PROCESS_ID`` manifest slicing: two
  emulated processes must partition the manifest disjointly and their
  union must equal the single-process result set.
* ``jax.distributed`` 2-process smoke test on CPU: the coordinator
  rendezvous that ``mesh.maybe_init_distributed`` wires (DCN analog;
  the reference has no distributed story at all, SURVEY.md section 5).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_manifest(tmp_path, n_pairs):
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n_pairs):
        fa1 = tmp_path / ("a%d.fa" % i)
        fa2 = tmp_path / ("b%d.fa" % i)
        for fa in (fa1, fa2):
            seq = "".join(rng.choice(list("ACGT"), 60))
            fa.write_text(">s\n%s\n" % seq)
        lines.append("p%d\t%s\t%s" % (i, fa1, fa2))
    man = tmp_path / "pairs.tsv"
    man.write_text("\n".join(lines) + "\n")
    return str(man)


def test_manifest_slicing_partitions_work(tmp_path, monkeypatch):
    from tsta_tpu.config import AlignParams
    from tsta_tpu.parallel import batch as pbatch

    man = _write_manifest(tmp_path, 7)
    all_rows = pbatch.align_manifest(man, AlignParams())
    assert len(all_rows) == 7

    got = {}
    for pid in (0, 1):
        monkeypatch.setenv("TSTA_NUM_PROCESSES", "2")
        monkeypatch.setenv("TSTA_PROCESS_ID", str(pid))
        rows = pbatch.align_manifest(man, AlignParams())
        for r in rows:
            assert r["name"] not in got, "pair done by both processes"
            got[r["name"]] = r["score"]
    monkeypatch.delenv("TSTA_NUM_PROCESSES")
    monkeypatch.delenv("TSTA_PROCESS_ID")
    assert got == {r["name"]: r["score"] for r in all_rows}


def test_manifest_slicing_shares_resume_store(tmp_path, monkeypatch):
    """Both processes stream into one JSONL store; a rerun sees every
    pair as done (host-level result merge over a shared filesystem)."""
    from tsta_tpu.config import AlignParams
    from tsta_tpu.parallel import batch as pbatch

    man = _write_manifest(tmp_path, 5)
    store = str(tmp_path / "results.jsonl")
    for pid in (0, 1):
        monkeypatch.setenv("TSTA_NUM_PROCESSES", "2")
        monkeypatch.setenv("TSTA_PROCESS_ID", str(pid))
        pbatch.align_manifest(man, AlignParams(), resume=store)
    monkeypatch.setenv("TSTA_NUM_PROCESSES", "1")
    monkeypatch.setenv("TSTA_PROCESS_ID", "0")
    rows = pbatch.align_manifest(man, AlignParams(), resume=store)
    assert len(rows) == 5  # all came back from the store


@pytest.mark.slow
def test_jax_distributed_two_process_smoke():
    """Two real processes rendezvous through jax.distributed on CPU and
    agree on process_count -- validates mesh.maybe_init_distributed's
    env contract end-to-end."""
    prog = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from tsta_tpu.parallel import mesh
mesh.maybe_init_distributed()
assert jax.process_count() == 2, jax.process_count()
print("PROC_OK", jax.process_index())
"""
    env_base = dict(os.environ)
    env_base.pop("PYTHONPATH", None)
    env_base["TSTA_COORDINATOR"] = "127.0.0.1:19765"
    env_base["TSTA_NUM_PROCESSES"] = "2"
    procs = []
    for pid in (0, 1):
        env = dict(env_base)
        env["TSTA_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", prog], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        # generous: JAX import + rendezvous under a loaded machine has
        # flaked at ~2 min elsewhere (cf. test_param_audit's binary)
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, (out, err)
        assert "PROC_OK" in out


@pytest.mark.slow
@pytest.mark.parametrize("nproc,dev_per_proc", [(2, 2), (4, 1)])
def test_multi_process_msa_delta_broadcast(nproc, dev_per_proc):
    """The full multi-host MSA driver on real processes (2 hosts x 2
    virtual CPU devices, and 4 hosts x 1 device): round DP
    column-sharded over the GLOBAL 4-device seq axis, traceback walked
    segment-by-segment across process boundaries, graph deltas
    broadcast, and every host must converge on output identical to the
    single-host native engine (round-2 verdict item 4's done-criterion).
    The 4-process case exercises a real broadcast fan-out (at 2 the
    broadcast is a single point-to-point pair) and a walk whose
    (row, state) handoff crosses three process boundaries."""
    prog = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=%d")""" % dev_per_proc + r"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from tsta_tpu.config import AlignParams
from tsta_tpu.parallel import mesh
from tsta_tpu.parallel.msa_multihost import align_seqs_multihost
mesh.maybe_init_distributed()
assert jax.process_count() == int(os.environ["TSTA_NUM_PROCESSES"])
assert len(jax.devices()) == 4, jax.devices()

rng = np.random.default_rng(7)
base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 260).tobytes()
seqs = []
for _ in range(4):
    s = bytearray(base)
    for i in rng.integers(0, len(s), 20):
        s[i] = b"ACGT"[rng.integers(0, 4)]
    for _ in range(4):
        j = int(rng.integers(0, len(s) - 2))
        if rng.random() < 0.5: del s[j]
        else: s.insert(j, b"ACGT"[rng.integers(0, 4)])
    seqs.append(bytes(s))

m = mesh.make_mesh(data=1, seq=4)
out = align_seqs_multihost(seqs, AlignParams(), mesh=m)
import hashlib
digest = hashlib.sha256(
    b"|".join(out.rows) + out.consensus
    + str(out.round_scores).encode()).hexdigest()
print("MSA_OK", jax.process_index(), digest)
"""
    env_base = dict(os.environ)
    env_base.pop("PYTHONPATH", None)
    env_base["TSTA_COORDINATOR"] = "127.0.0.1:%d" % (19767 + nproc)
    env_base["TSTA_NUM_PROCESSES"] = str(nproc)
    procs = []
    for pid in range(nproc):
        env = dict(env_base)
        env["TSTA_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", prog], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    digests = []
    for rc, out, err in outs:
        assert rc == 0, (out, err[-3000:])
        line = [ln for ln in out.splitlines() if ln.startswith("MSA_OK")]
        assert line, out
        digests.append(line[0].split()[-1])
    assert len(set(digests)) == 1, "hosts diverged: %s" % digests

    # and the multi-host output equals the single-host native engine
    import numpy as np

    from tsta_tpu.config import AlignParams
    from tsta_tpu.ops import msa_native
    rng = np.random.default_rng(7)
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 260).tobytes()
    seqs = []
    for _ in range(4):
        s = bytearray(base)
        for i in rng.integers(0, len(s), 20):
            s[i] = b"ACGT"[rng.integers(0, 4)]
        for _ in range(4):
            j = int(rng.integers(0, len(s) - 2))
            if rng.random() < 0.5:
                del s[j]
            else:
                s.insert(j, b"ACGT"[rng.integers(0, 4)])
        seqs.append(bytes(s))
    ref = msa_native.align_seqs(seqs, AlignParams())
    import hashlib
    ref_digest = hashlib.sha256(
        b"|".join(ref.rows) + ref.consensus
        + str(ref.round_scores).encode()).hexdigest()
    assert digests[0] == ref_digest, "multi-host != single-host native"
