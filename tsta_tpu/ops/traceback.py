"""Host-side decoding of PSA traceback planes into an aligned pair.

Port of the reference's sequential two-pass ``trace()`` walk
(psa/psa.c:434-519), operating on natural-layout (row-major) planes instead
of the reference's striped NUM2 layout.  The decode rules -- including the
affine open/extend *propagation* writes into the ``back`` plane that force a
gap run to continue through open/extend ties -- are reproduced exactly so
the emitted alignment is byte-identical to the reference's output file.

Moves at cell (i, j) with rows = b, columns = a:
  back == 1 -> diagonal (consume a[j] and b[i])
  back == 0 -> left     (consume a[j], gap in b)
  back == 2 -> up       (consume b[i], gap in a)

Gap-run propagation (psa/psa.c:450-459): on a left move, if ``fback`` marks
an extended gap (+-1), or an opened gap (+-2) whose predecessor cell carries
a negative (open==extend tie) mark, the previous column is forced to also
take a left move; symmetrically for up moves via ``eback``.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Alignment(NamedTuple):
    a_row: bytes   # aligned sequence a (columns; '>1' in reference output)
    b_row: bytes   # aligned sequence b (rows; '>2')


def decode_pair(back: np.ndarray, fback: np.ndarray, eback: np.ndarray,
                a: np.ndarray, b: np.ndarray) -> Alignment:
    """Walk the planes from (m-1, n-1) and emit the aligned pair."""
    back = np.array(back, dtype=np.int8, copy=True)  # mutated during walk
    m, n = back.shape
    if a.shape[0] < n or b.shape[0] < m:
        raise ValueError("sequence shorter than traceback plane")
    i, j = m - 1, n - 1
    out_a = bytearray()
    out_b = bytearray()
    gap = ord("-")
    while i >= 0 and j >= 0:
        d = back[i, j]
        if d == 1:
            out_a.append(a[j])
            out_b.append(b[i])
            i -= 1
            j -= 1
        elif d == 0:
            fb = fback[i, j]
            if j - 1 >= 0 and (fb == 1 or fb == -1 or
                               ((fb == 2 or fb == -2) and fback[i, j - 1] < 0)):
                back[i, j - 1] = 0
            out_a.append(a[j])
            out_b.append(gap)
            j -= 1
        else:
            eb = eback[i, j]
            if i - 1 >= 0 and (eb == 1 or eb == -1 or
                               ((eb == 2 or eb == -2) and eback[i - 1, j] < 0)):
                back[i - 1, j] = 2
            out_a.append(gap)
            out_b.append(b[i])
            i -= 1
    while j >= 0:
        out_a.append(a[j])
        out_b.append(gap)
        j -= 1
    while i >= 0:
        out_a.append(gap)
        out_b.append(b[i])
        i -= 1
    out_a.reverse()
    out_b.reverse()
    return Alignment(bytes(out_a), bytes(out_b))


def score_alignment(a_row: bytes, b_row: bytes, params) -> int:
    """Re-score an emitted alignment (validity check for tests).

    Scores matches/mismatches plus ``O + k*E`` per gap run; boundary gaps
    pay the open penalty too, matching the DP boundary H(-1,j) = O+(j+1)E.
    """
    m_, x_, e_, o_ = (params.match, params.mismatch, params.gap_extend,
                      params.gap_open)
    score = 0
    in_gap_a = in_gap_b = False
    for ca, cb in zip(a_row, b_row):
        ga, gb = ca == ord("-"), cb == ord("-")
        if ga and gb:
            raise ValueError("gap aligned to gap")
        if ga:
            score += e_ + (0 if in_gap_a else o_)
            in_gap_a, in_gap_b = True, False
        elif gb:
            score += e_ + (0 if in_gap_b else o_)
            in_gap_a, in_gap_b = False, True
        else:
            score += m_ if ca == cb else x_
            in_gap_a = in_gap_b = False
    return score
