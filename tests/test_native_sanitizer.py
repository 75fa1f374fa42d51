"""ASan/UBSan fuzz of the native compat MSA engine.

The reference has no sanitizer story (Makefile:1-57 is -O3 -g only) and
carries formal data races (spin flags at psa.c:135-137,
c-t-simd.c:22-24).  The compat engine replaces those with OpenMP
barriers; this test is the executable backing for docs/PARITY.md's
"compat OpenMP ASan-clean" row: compat_msa.c links into a standalone
driver (native/asan_driver.c) built with -fsanitize=address,undefined
and runs a fuzz corpus spanning scoring params, stripe geometry (-W),
thread counts, and degenerate inputs.  Scores are cross-checked against
the unsanitized ctypes engine so the sanitizer build is proven to run
the same computation.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tsta_tpu.config import AlignParams  # noqa: E402
from tsta_tpu.models import msa as msa_model  # noqa: E402

NATIVE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tsta_tpu", "native")


@pytest.fixture(scope="module")
def asan_bin(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("asan") / "asan_driver")
    cmd = [os.environ.get("CC", "gcc"), "-O1", "-g", "-fopenmp",
           "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
           "-fno-omit-frame-pointer", "-Wall",
           os.path.join(NATIVE, "compat_msa.c"),
           os.path.join(NATIVE, "asan_driver.c"),
           "-o", out]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        pytest.skip("sanitizer toolchain unavailable: %s"
                    % proc.stderr[:200])
    return out


def _problem(seed, n_seq, length, sub_rate=0.06, del_div=50):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(bases, length).tobytes()
    seqs = [base]
    for _ in range(n_seq - 1):
        s = np.frombuffer(base, np.uint8).copy()
        m = rng.random(len(s)) < sub_rate
        s[m] = bases[rng.integers(0, 4, int(m.sum()))]
        if del_div:
            s = np.delete(s, rng.integers(0, len(s),
                                          max(1, len(s) // del_div)))
        seqs.append(s.tobytes())
    return seqs


def _run_driver(asan_bin, tmp_path, seqs, p, width, threads, tag):
    f = tmp_path / ("seqs_%s.txt" % tag)
    f.write_bytes(b"\n".join(seqs) + b"\n")
    env = dict(os.environ,
               ASAN_OPTIONS="detect_leaks=1:abort_on_error=1",
               UBSAN_OPTIONS="print_stacktrace=1")
    proc = subprocess.run(
        [asan_bin, str(f), str(p.match), str(p.mismatch),
         str(p.gap_extend), str(p.gap_open), str(width),
         str(threads)],
        capture_output=True, text=True, env=env, timeout=600)
    assert proc.returncode == 0, (
        "sanitizer run failed (rc=%d)\nstdout:\n%s\nstderr:\n%s"
        % (proc.returncode, proc.stdout[-2000:], proc.stderr[-4000:]))
    scores_line = [ln for ln in proc.stdout.splitlines()
                   if ln.startswith("scores:")][0]
    return [int(v) for v in scores_line.split()[1:]]


CORPUS = [
    # (seed, n_seq, length, params, width=bS, threads)
    (1, 5, 400, AlignParams(), 10, 1),
    (2, 3, 1000, AlignParams(), 10, 4),
    (3, 4, 700, AlignParams(match=3, mismatch=-9, gap_extend=-1,
                            gap_open=-7), 10, 2),
    (4, 6, 300, AlignParams(), 3, 4),
    (5, 2, 2000, AlignParams(), 20, 2),
    (6, 8, 150, AlignParams(match=1, mismatch=-1, gap_extend=-1,
                            gap_open=-1), 10, 3),
]


@pytest.mark.slow
@pytest.mark.parametrize("seed,n_seq,length,params,width,threads",
                         CORPUS)
def test_compat_asan_fuzz(asan_bin, tmp_path, seed, n_seq, length,
                          params, width, threads):
    seqs = _problem(seed, n_seq, length)
    got = _run_driver(asan_bin, tmp_path, seqs, params, width, threads,
                      str(seed))
    ref = msa_model.align_seqs(seqs, params, width=width,
                               threads=threads)
    assert got == ref.round_scores


@pytest.fixture(scope="module")
def seqio_asan_bin(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("asan") / "seqio_asan_driver")
    cmd = [os.environ.get("CC", "gcc"), "-O1", "-g",
           "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
           "-fno-omit-frame-pointer", "-Wall",
           os.path.join(NATIVE, "seqio_fast.c"),
           os.path.join(NATIVE, "seqio_asan_driver.c"),
           "-o", out]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        pytest.skip("sanitizer toolchain unavailable: %s"
                    % proc.stderr[:200])
    return out


SEQIO_CORPUS = [
    ("fasta", b">r1 desc here\nACGTACGT\nACGT\n>r2\nTTTT\n"),
    ("crlf", b">r1 d\r\nACGT\r\nAC\r\n>r2\r\nGG\r\n"),
    ("fastq", b"@r1 c\nACGT\n+\nIIII\n@r2\nGG\n+x\nII\n"),
    ("no_trailing_nl", b">a\nACGT"),
    ("empty", b""),
    ("blank_lines", b"\n\n>a\n\nACGT\n\n\n>b\nGG\n\n"),
    ("name_only", b">loneliest\n>another\nAC\n"),
    ("long_name", b">" + b"n" * 5000 + b" " + b"c" * 5000 + b"\nAC\n"),
    ("truncated_fastq", b"@r1\nACGT\n+\nII"),
    ("qual_longer", b"@r1\nAC\n+\nIIII\n"),
    ("not_fasta", b"just some text\nwithout a header\n"),
    ("huge_records", b"".join(b">r%d\n%s\n" % (i, b"ACGT" * 500)
                              for i in range(200))),
]


@pytest.mark.slow
@pytest.mark.parametrize("tag,payload", SEQIO_CORPUS,
                         ids=[t for t, _ in SEQIO_CORPUS])
def test_seqio_asan_fuzz(seqio_asan_bin, tmp_path, tag, payload):
    """The native FASTA/FASTQ parser under ASan+UBSan on adversarial
    inputs (truncations, CRLF, blank lines, missing newline, headers
    without sequences, oversized names).  Both clean parses and parse
    errors must leave memory intact; clean parses must agree with the
    Python reference parser on record count and total sequence bytes."""
    f = tmp_path / (tag + ".fa")
    f.write_bytes(payload)
    env = dict(os.environ,
               ASAN_OPTIONS="detect_leaks=1:abort_on_error=1",
               UBSAN_OPTIONS="print_stacktrace=1")
    proc = subprocess.run([seqio_asan_bin, str(f)], capture_output=True,
                          text=True, env=env, timeout=120)
    assert proc.returncode == 0, (
        "sanitizer run failed (rc=%d)\nstdout:\n%s\nstderr:\n%s"
        % (proc.returncode, proc.stdout[-1000:], proc.stderr[-4000:]))
    if proc.stdout.startswith("records:"):
        parts = proc.stdout.split()
        n_records, seq_total = int(parts[1]), int(parts[5])
        from tsta_tpu.io import seqio as pyseqio
        old = os.environ.get("TSTA_NATIVE_SEQIO")
        os.environ["TSTA_NATIVE_SEQIO"] = "0"   # pure-Python reference
        try:
            recs = list(pyseqio.read_records(str(f)))
        except Exception:
            return   # python parser rejects; native indexed it safely
        finally:
            if old is None:
                os.environ.pop("TSTA_NATIVE_SEQIO", None)
            else:
                os.environ["TSTA_NATIVE_SEQIO"] = old
        assert n_records == len(recs)
        assert seq_total == sum(len(r.sequence) for r in recs)


@pytest.mark.slow
def test_compat_asan_degenerate(asan_bin, tmp_path):
    """Adversarial shapes: heavy indels (realloc-heavy graph growth,
    variant rings), identical reads, and a read much shorter than the
    graph."""
    p = AlignParams()
    rng = np.random.default_rng(99)
    bases = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(bases, 600).tobytes()
    heavy = _problem(7, 4, 500, sub_rate=0.35, del_div=10)
    ident = [base, base, base]
    short = [base, base[:37], rng.choice(bases, 900).tobytes()]
    for tag, seqs in (("heavy", heavy), ("ident", ident),
                      ("short", short)):
        got = _run_driver(asan_bin, tmp_path, seqs, p, 10, 4, tag)
        ref = msa_model.align_seqs(seqs, p, threads=4)
        assert got == ref.round_scores, tag
