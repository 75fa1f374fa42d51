"""Multi-device tests on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8; SURVEY.md section 4 plan item d)."""

import numpy as np
import pytest

from tsta_tpu.config import AlignParams
from tsta_tpu.ops import psa_scan
from tsta_tpu.parallel import batch, longseq
from tsta_tpu.parallel import mesh as meshlib


@pytest.fixture(scope="module")
def mesh24():
    return meshlib.make_mesh(data=2, seq=4)


@pytest.fixture(scope="module")
def mesh81():
    return meshlib.make_mesh(data=8, seq=1)


def test_mesh_shapes(mesh24):
    assert mesh24.shape == {"data": 2, "seq": 4}


def test_batch_sharded_matches_oracle(mesh81):
    rng = np.random.default_rng(11)
    pairs = []
    for _ in range(11):  # deliberately not a multiple of 8
        n, m = int(rng.integers(20, 300)), int(rng.integers(20, 300))
        pairs.append((rng.integers(65, 69, n).astype(np.uint8),
                      rng.integers(65, 69, m).astype(np.uint8)))
    res = batch.align_batch(pairs, AlignParams(), mesh=mesh81)
    for (a, b), r in zip(pairs, res):
        if len(b) > len(a):
            a, b = b, a
        ref = psa_scan.psa_align(a, b, AlignParams())
        assert r.score == int(ref.score)
        assert r.last == int(ref.last)


def test_batch_traced_planes(mesh81):
    rng = np.random.default_rng(5)
    pairs = [(rng.integers(65, 69, 100).astype(np.uint8),
              rng.integers(65, 69, 80).astype(np.uint8))
             for _ in range(4)]
    res = batch.align_batch(pairs, AlignParams(), traced=True, mesh=mesh81)
    for (a, b), r in zip(pairs, res):
        ref = psa_scan.psa_align(a, b, AlignParams(), traced=True)
        assert np.array_equal(np.asarray(ref.back), np.asarray(r.back))
        assert np.array_equal(np.asarray(ref.fback), np.asarray(r.fback))


@pytest.mark.parametrize("seed", range(3))
def test_longseq_sharded_matches_oracle(mesh24, seed):
    rng = np.random.default_rng(seed)
    n, m = int(rng.integers(64, 1200)), int(rng.integers(20, 300))
    a = rng.integers(65, 69, n).astype(np.uint8)
    b = rng.integers(65, 69, m).astype(np.uint8)
    p = AlignParams() if seed % 2 == 0 else AlignParams(3, -2, -1, -6)
    best, corner = longseq.align_long(a, b, p, mesh=mesh24)
    ref = psa_scan.psa_align(a, b, p)
    assert best == int(ref.score)
    assert corner == int(ref.last)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_graft_entry_forward():
    import jax

    import __graft_entry__ as ge
    fn, args = ge.entry()
    best, corner = jax.jit(fn)(*args)
    assert best.shape == (4,)


def test_msa_sharded_round_matches_native(mesh24):
    from tsta_tpu.ops import msa_native
    rng = np.random.default_rng(31)
    bases = np.frombuffer(b"ACGT", np.uint8)

    def mut(s, rate=0.1):
        s = np.frombuffer(s, np.uint8).copy()
        m = rng.random(len(s)) < rate
        s[m] = bases[rng.integers(0, 4, m.sum())]
        return s.tobytes()

    seqs = [bases[rng.integers(0, 4, 250)].tobytes()]
    for _ in range(3):
        seqs.append(mut(seqs[0]))
    ref = msa_native.align_seqs(seqs, AlignParams())
    shd = msa_native.align_seqs(seqs, AlignParams(), mesh=mesh24)
    assert shd.round_scores == ref.round_scores
    assert shd.rows == ref.rows
    assert shd.consensus == ref.consensus


def test_msa_sharded_gap_run_crosses_shard_boundary(mesh24):
    """Regression: an F gap run spanning a shard boundary must decode
    identically to the unsharded engine (the boundary cell's 'extend'
    mark needs the left shard's F exit value)."""
    from tsta_tpu.ops import msa_native
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    s1 = bases[rng.integers(0, 4, 120)].tobytes()
    s2 = s1[:60] + bases[rng.integers(0, 4, 300)].tobytes() + s1[60:]
    ref = msa_native.align_seqs([s1, s2], AlignParams())
    shd = msa_native.align_seqs([s1, s2], AlignParams(), mesh=mesh24)
    assert shd.rows == ref.rows
    assert shd.round_scores == ref.round_scores


def test_diff_kernel_sharded_matches_unsharded(mesh81):
    """The packed int32 kernel shard_maps over the data axis; per-pair
    results must equal the single-device run (round-2: closes the
    round-1 gap where sharded batches silently fell back to the scan)."""
    from tsta_tpu.ops import psa_diff
    rng = np.random.default_rng(21)
    pairs = []
    for _ in range(13):  # not a multiple of 8 groups
        n, m = int(rng.integers(30, 400)), int(rng.integers(30, 400))
        pairs.append((rng.integers(65, 69, n).astype(np.uint8),
                      rng.integers(65, 69, m).astype(np.uint8)))
    p = (2, -5, -2, -4)
    s1, c1 = psa_diff.psa_align_batch_diff(pairs, p)
    s2, c2 = psa_diff.psa_align_batch_diff(pairs, p, mesh=mesh81)
    assert np.array_equal(s1, s2)
    assert np.array_equal(c1, c2)


def test_traced_packed_sharded_matches_unsharded(mesh24):
    """Traced packed batches shard over the data axis: per-pair scores,
    corners AND decoded alignments must equal the single-device packed
    run (ROADMAP backlog 3; pairs are independent, so the shard_map
    body has no collectives)."""
    from tsta_tpu.ops import psa_diff
    rng = np.random.default_rng(41)
    pairs = []
    for _ in range(5):  # not a multiple of the data axis
        n = int(rng.integers(60, 260))
        m = int(rng.integers(40, n + 1))   # swapped contract: len(a) >= len(b)
        pairs.append((rng.integers(65, 69, n).astype(np.uint8),
                      rng.integers(65, 69, m).astype(np.uint8)))
    p = (2, -5, -2, -4)
    ref = psa_diff.psa_align_batch_traced_packed(pairs, p)
    shd = psa_diff.psa_align_batch_traced_packed(pairs, p, mesh=mesh24)
    for (s1, c1, a1), (s2, c2, a2) in zip(ref, shd):
        assert (s1, c1) == (s2, c2)
        assert a1 == a2


def test_traced_sharded_via_batch_api(mesh81):
    """parallel.batch.align_batch_traced_device threads the mesh through
    to the packed traced path."""
    rng = np.random.default_rng(43)
    pairs = [(rng.integers(65, 69, 150).astype(np.uint8),
              rng.integers(65, 69, 120).astype(np.uint8))
             for _ in range(3)]
    params = AlignParams()
    ref = batch.align_batch_traced_device(pairs, params)
    shd = batch.align_batch_traced_device(pairs, params, mesh=mesh81)
    assert [(s, c, a) for s, c, a in ref] == [(s, c, a) for s, c, a in shd]


def test_diff_kernel_sharded_on_2d_mesh(mesh24):
    from tsta_tpu.ops import psa_diff
    rng = np.random.default_rng(22)
    pairs = [(rng.integers(65, 69, 200).astype(np.uint8),
              rng.integers(65, 69, 180).astype(np.uint8))
             for _ in range(3)]
    p = (2, -5, -2, -4)
    s1, c1 = psa_diff.psa_align_batch_diff(pairs, p)
    s2, c2 = psa_diff.psa_align_batch_diff(pairs, p, mesh=mesh24)
    assert np.array_equal(s1, s2)
    assert np.array_equal(c1, c2)


def test_traced_sharded_chunks_over_budget(mesh24, monkeypatch):
    """A sharded traced batch whose groups exceed the per-device plane
    budget must split into sequential shard_map calls (not silently run
    unsharded): results still equal the unconstrained run."""
    from tsta_tpu.ops import psa_diff
    rng = np.random.default_rng(47)
    pairs = []
    for _ in range(24):
        n = int(rng.integers(60, 260))
        m = int(rng.integers(40, n + 1))
        pairs.append((rng.integers(65, 69, n).astype(np.uint8),
                      rng.integers(65, 69, m).astype(np.uint8)))
    p = (2, -5, -2, -4)
    ref = psa_diff.psa_align_batch_traced_packed(pairs, p)
    # ~1.5 MB/group plane cost at these shapes; a 1.7 MB budget forces
    # g_local_max=1 -> g_call=2 -> two sequential shard_map calls
    monkeypatch.setenv("TSTA_HBM_BUDGET_GB", "0.0016")
    calls = []
    orig = psa_diff._traced_sharded_call

    def spy(*a, **kw):
        fn = orig(*a, **kw)

        def wrapped(*xs):
            calls.append(1)
            return fn(*xs)
        return wrapped
    monkeypatch.setattr(psa_diff, "_traced_sharded_call", spy)
    shd = psa_diff.psa_align_batch_traced_packed(pairs, p, mesh=mesh24)
    assert len(calls) >= 2, "expected the batch to split into chunks"
    for (s1, c1, a1), (s2, c2, a2) in zip(ref, shd):
        assert (s1, c1) == (s2, c2)
        assert a1 == a2
