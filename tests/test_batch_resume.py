"""Batched Pallas kernel + manifest resume."""

import numpy as np

from tsta_tpu.config import AlignParams
from tsta_tpu.ops import psa_pallas, psa_scan
from tsta_tpu.parallel import batch


def test_pallas_batch_matches_oracle():
    rng = np.random.default_rng(5)
    pairs = [(rng.integers(65, 69, int(rng.integers(30, 300))).astype(
        np.uint8),
        rng.integers(65, 69, int(rng.integers(30, 300))).astype(np.uint8))
        for _ in range(5)]
    sc, co = psa_pallas.psa_align_batch(pairs, (2, -5, -2, -4))
    for (a, b), s, c in zip(pairs, sc, co):
        ref = psa_scan.psa_align(a, b, (2, -5, -2, -4))
        assert int(ref.score) == s and int(ref.last) == c


def _write_pair(tmp_path, name, rng, n, m):
    a = rng.integers(65, 69, n).astype(np.uint8)
    b = rng.integers(65, 69, m).astype(np.uint8)
    f1 = tmp_path / (name + "_a.fa")
    f2 = tmp_path / (name + "_b.fa")
    f1.write_bytes(b">a\n" + a.tobytes() + b"\n")
    f2.write_bytes(b">b\n" + b.tobytes() + b"\n")
    return str(f1), str(f2)


def test_manifest_resume(tmp_path):
    rng = np.random.default_rng(3)
    manifest = tmp_path / "pairs.tsv"
    lines = []
    for i in range(4):
        f1, f2 = _write_pair(tmp_path, "p%d" % i, rng, 150, 120)
        lines.append("p%d\t%s\t%s" % (i, f1, f2))
    manifest.write_text("\n".join(lines) + "\n")
    store = str(tmp_path / "done.jsonl")

    r1 = batch.align_manifest(str(manifest), AlignParams(), resume=store)
    assert len(r1) == 4
    # second run: everything skipped, results identical
    r2 = batch.align_manifest(str(manifest), AlignParams(), resume=store)
    assert sorted(r["name"] for r in r2) == sorted(r["name"] for r in r1)
    assert {r["name"]: r["score"] for r in r2} == \
        {r["name"]: r["score"] for r in r1}
