"""Golden-parity tests for the MSA compat engine vs reference binaries."""

import os
import subprocess

import pytest

from tsta_tpu.config import AlignParams
from tsta_tpu.models import msa

SMALL_CASES = ["msa_small1", "msa_small2", "msa_small3", "msa_small4",
               "msa_small5"]


def _params(d):
    txt = open(os.path.join(d, "params.txt")).read().split()
    names = {"-M": "match", "-X": "mismatch", "-E": "gap_extend",
             "-O": "gap_open"}
    kw = {names[f]: int(v) for f, v in zip(txt[::2], txt[1::2])}
    return AlignParams(**kw)


@pytest.mark.parametrize("case", SMALL_CASES)
def test_small_golden(golden_dir, case, tmp_path):
    d = os.path.join(golden_dir, case)
    out = msa.align_file(os.path.join(d, "seqs.fa"), _params(d))
    my = tmp_path / "my.out"
    msa.write_result(out, str(my))
    assert my.read_bytes() == open(os.path.join(d, "ref.out"), "rb").read()


def test_rows_reconstruct_inputs(golden_dir):
    """Each MSA row, gaps removed, must equal its input sequence."""
    d = os.path.join(golden_dir, "msa_small2")
    from tsta_tpu.io import read_fasta
    seqs = [r.sequence for r in read_fasta(os.path.join(d, "seqs.fa"))]
    out = msa.align_seqs(seqs, _params(d))
    assert len(out.rows) == len(seqs)
    for row, seq in zip(out.rows, seqs):
        assert row.replace(b"-", b"") == seq
    assert all(len(r) == out.rows[0].__len__() for r in out.rows)


@pytest.mark.slow
def test_big_example(golden_dir, tmp_path):
    """5 x 5kbp example: BASELINE.md golden values (README.md:30-41)."""
    out = msa.align_file("/root/reference/example/msa/seq/seq1.fa",
                         AlignParams())
    assert out.round_scores == [-5451, -3101, -1776, -870]
    assert out.add_len == [1885, 1714, 1531, 1338]
    assert out.graph_len == [6885, 8599, 10130, 11468]
    my = tmp_path / "my.out"
    msa.write_result(out, str(my))
    ref = open(os.path.join(golden_dir, "example_big/msa_default.out"),
               "rb").read()
    assert my.read_bytes() == ref


def test_two_seq_and_gzip(tmp_path):
    """Minimal 2-sequence MSA; also exercises gzip input."""
    import gzip
    p = tmp_path / "two.fa.gz"
    with gzip.open(p, "wb") as f:
        f.write(b">a\nACGTACGTAA\n>b\nACGTTCGTAA\n")
    out = msa.align_file(str(p))
    assert len(out.rows) == 2
    assert out.rows[0].replace(b"-", b"") == b"ACGTACGTAA"
    assert out.rows[1].replace(b"-", b"") == b"ACGTTCGTAA"
    assert len(out.consensus) > 0


def test_edge_cases():
    """Tiny/degenerate inputs are handled or cleanly rejected."""
    import pytest as _pytest
    out = msa.align_seqs([b"ACG", b"AG"])
    assert out.rows[0].replace(b"-", b"") == b"ACG"
    out = msa.align_seqs([b"ACGTACGT"] * 4)
    assert out.rows == [b"ACGTACGT"] * 4
    with _pytest.raises(ValueError):
        msa.align_seqs([b"ACGT", b""])
    with _pytest.raises(ValueError):
        msa.align_seqs([])


def test_variant_ring_beyond_four_bases():
    """Regression: >4 distinct bases aligned to one column (IUPAC codes,
    lowercase, protein) must not overflow the variant ring."""
    base = b"ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT" * 2
    seqs = [base]
    for ch in b"CGTNMRW":
        s = bytearray(base)
        s[40] = ch
        seqs.append(bytes(s))
    out = msa.align_seqs(seqs, AlignParams())
    assert len(out.rows) == len(seqs)
    for row, s in zip(out.rows, seqs):
        assert row.replace(b"-", b"") == s


def test_varying_read_lengths_across_rounds(tmp_path):
    """Regression: reads whose padded lengths differ between rounds.

    Promotion state (full-length difference rows) must reset every round
    like the reference's toposort logo reset (topo.c:10,182); a stale
    flag indexed buffers sized for the previous round's shorter read.
    Verified byte-identical vs the reference binary in the differential
    sweep; here we check self-consistency without the binary."""
    import numpy as np
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    # lengths straddling multiple L=160 pad boundaries, shrinking and
    # growing between rounds
    lens = [400, 170, 550, 90, 330]
    common = bases[rng.integers(0, 4, 600)].tobytes()
    seqs = [common[:ln] for ln in lens]
    out = msa.align_seqs(seqs, AlignParams())
    for row, s in zip(out.rows, seqs):
        assert row.replace(b"-", b"") == s
