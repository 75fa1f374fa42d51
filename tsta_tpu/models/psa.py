"""Pairwise sequence alignment pipeline.

Equivalent of the reference's ``TSTA_psa`` / ``TSTA_psa_notrace`` drivers
(psa/psa.c:539-668): load two FASTA sequences, orient the longer one
horizontally (psa/psa.c:194-199), run the DP, report the matrix-max score
and (traced mode) the aligned pair.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from tsta_tpu.config import AlignParams
from tsta_tpu.io import encode_dna
from tsta_tpu.ops import psa_scan, traceback

# The reference initialises its global running max to MIN = -100
# (psa/psa.c:110,590) and only ever raises it, so the printed `maxsorce`
# is floored at -100.  The library reports the true matrix max; the CLI
# applies this floor for stdout parity.
REFERENCE_SCORE_FLOOR = -100


@dataclasses.dataclass
class PsaOutput:
    score: int                      # max over all H cells (reference semantics)
    corner: int                     # H(m-1, n-1): the global alignment score
    swapped: bool                   # True if input order was swapped
    a_row: Optional[bytes] = None   # aligned horizontal sequence ('>1')
    b_row: Optional[bytes] = None   # aligned vertical sequence ('>2')


def align_pair(seq1: bytes, seq2: bytes, params: AlignParams = AlignParams(),
               traced: bool = False, swap: bool = True,
               kernel: str = "auto") -> PsaOutput:
    """Align two byte sequences.

    ``swap`` mirrors the reference: the longer sequence becomes the
    horizontal axis (columns).  ``kernel`` selects 'scan' (pure JAX oracle),
    'pallas' (tiled TPU kernel), or 'auto'.
    """
    swapped = False
    if swap and len(seq2) > len(seq1):
        seq1, seq2 = seq2, seq1
        swapped = True
    a = encode_dna(seq1)
    b = encode_dna(seq2)
    use_pallas = kernel == "pallas" or (kernel == "auto"
                                        and _use_pallas(a, b, traced))
    if use_pallas and traced:
        from tsta_tpu.ops import psa_pallas
        # traceback decoded on device; the O(n*m) plane never leaves HBM
        score, corner, aln = psa_pallas.psa_align_traced_device(a, b, params)
        return PsaOutput(score=score, corner=corner, swapped=swapped,
                         a_row=aln.a_row, b_row=aln.b_row)
    if use_pallas:
        from tsta_tpu.ops import psa_diff, psa_pallas
        if psa_diff.supports_params(params):
            # the packed kernel's row body is ~2x the round-1 single
            # kernel even at P=1 (see psa_pallas.psa_align_traced_device)
            sc, co = psa_diff.psa_align_batch_diff([(a, b)], params)
            res = psa_scan.PsaResult(int(sc[0]), int(co[0]))
        else:
            res = psa_pallas.psa_align(a, b, params, traced=False)
    else:
        res = psa_scan.psa_align(a, b, params, traced=traced)
    out = PsaOutput(score=int(res.score), corner=int(res.last),
                    swapped=swapped)
    if traced:
        aln = traceback.decode_pair(np.asarray(res.back),
                                    np.asarray(res.fback),
                                    np.asarray(res.eback), a, b)
        out.a_row, out.b_row = aln.a_row, aln.b_row
    return out


def _use_pallas(a, b, traced) -> bool:
    """Measured routing (r4 crossover probe, scripts/crossover_probe.py,
    v5e warm, single pair): TRACED, the packed P=1 chain wins at every
    length (24.9 vs 28.2 ms even at 128 bp; the scan path's plane
    transfer + host decode blows up past ~2 kbp: 147 ms at 2 k, 1.78 s
    at 8 k).  SCORE-ONLY, both are tunnel-RTT-bound below ~5 kbp and
    the scan oracle's leaner dispatch wins (26-45 vs 47-53 ms); the
    packed kernel takes over between 4 k and 8 k (72.7 vs 52.9 ms at
    8 k).  The old 1024 threshold was an unmeasured guess (r3 verdict
    item 7)."""
    try:
        import jax
        if jax.default_backend() not in ("tpu",):
            return False
    except Exception:
        return False
    if traced:
        return True
    return min(a.shape[0], b.shape[0]) >= 5120


def align_files(path1: str, path2: str, params: AlignParams = AlignParams(),
                traced: bool = False, kernel: str = "auto") -> PsaOutput:
    """Reference-compatible entry: first record of each input file.

    Accepts FASTA or FASTQ (auto-detected, gzip ok) -- the reference's
    seqio carries a FASTQ reader its tools never call (seqio.c:543-641);
    here it is live.
    """
    from tsta_tpu.io import read_first_record
    rec1 = read_first_record(path1)
    rec2 = read_first_record(path2)
    if rec1 is None or rec2 is None:
        raise ValueError("empty sequence input")
    return align_pair(rec1.sequence, rec2.sequence, params, traced=traced,
                      kernel=kernel)


def write_alignment(out: PsaOutput, path: str) -> None:
    """Write the aligned pair in the reference's output format.

    The reference writes '>1\\n<a>\\n>2\\n<b>' with no trailing newline
    (psa/psa.c:512-515).
    """
    with open(path, "wb") as f:
        f.write(b">1\n" + out.a_row + b"\n>2\n" + out.b_row)
