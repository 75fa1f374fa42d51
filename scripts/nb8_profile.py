"""Break down the traced nb=8 e2e wall (r4 VERDICT item 5).

The nb=8 path is ONE fused P=8 dispatch; this script separates the
e2e wall into host prep, device chain (dispatch->sync), and host
decode, repeated a few times so tunnel swings are visible.

Run from the repo root with ambient env (TPU):
    timeout 600 python scripts/nb8_profile.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/tsta_jax_tpu")

import jax.numpy as jnp  # noqa: E402

from tsta_tpu.config import AlignParams  # noqa: E402
from tsta_tpu.parallel import batch as pbatch  # noqa: E402
from tsta_tpu.parallel.batch import encode_dna  # noqa: E402
from tsta_tpu.ops import psa_diff  # noqa: E402


def pairs_like_bench(nb, ln=10240):
    rng = np.random.default_rng(0)
    from tsta_tpu.io import read_fasta
    EX = "/root/reference/example"
    a = np.frombuffer(next(iter(read_fasta(
        EX + "/psa/seq/seqa1.fa"))).sequence, np.uint8)
    b = np.frombuffer(next(iter(read_fasta(
        EX + "/psa/seq/seqb1.fa"))).sequence, np.uint8)
    return [(a, b)] + [
        (rng.integers(65, 69, ln).astype(np.uint8),
         rng.integers(65, 69, ln).astype(np.uint8))
        for _ in range(nb - 1)]


def main():
    params = AlignParams()
    pairs = pairs_like_bench(8)
    cells = sum(len(x) * len(y) for x, y in pairs)

    # warm
    pbatch.align_batch_traced_device(pairs, params)

    for it in range(4):
        t0 = time.perf_counter()
        out = pbatch.align_batch_traced_device(pairs, params)
        e2e = time.perf_counter() - t0
        print("e2e      %.1f ms (%.1f GCUPS)" % (e2e * 1e3,
                                                 cells / e2e / 1e9))

    # manual split: prep / chain sync / decode
    p = psa_diff._as_tuple(params)
    prepped = []
    for a, b in pairs:
        a = encode_dna(a)
        b = encode_dna(b)
        if b.shape[0] > a.shape[0]:
            a, b = b, a
        prepped.append((a, b))
    n_real = [int(a.shape[0]) for a, _ in prepped]
    m_real = [int(b.shape[0]) for _, b in prepped]
    LANES, T_R = psa_diff.LANES, psa_diff.T_R
    n_pad = max(psa_diff._traced_n_pad(n) for n in n_real)
    m_pad = -(-max(m_real) // T_R) * T_R
    P = len(prepped)
    Rp = n_pad // LANES

    for it in range(4):
        t0 = time.perf_counter()
        a8 = np.full((P * Rp, LANES), psa_diff.A_PAD, np.uint8)
        brows8 = np.full((m_pad, P), psa_diff.B_PAD, np.uint8)
        nm = np.zeros((P, 2), np.int32)
        for k, (a, b) in enumerate(prepped):
            arow = np.full(n_pad, psa_diff.A_PAD, np.uint8)
            arow[:n_real[k]] = a
            a8[k * Rp:(k + 1) * Rp] = arow.reshape(Rp, LANES)
            brows8[:m_real[k], k] = b
            nm[k] = (n_real[k], m_real[k])
        banded = psa_diff._banded_walk_gate(Rp, m_pad, P, n_pad)
        t1 = time.perf_counter()
        chain = psa_diff._traced_packed_chain(
            jnp.asarray(a8), jnp.asarray(brows8), jnp.asarray(nm),
            n_pad, m_pad, P, p, banded, True, True)
        packed = np.asarray(chain)
        t2 = time.perf_counter()
        res = [psa_diff._emit_packed_row(packed[k], prepped[k][0],
                                         prepped[k][1], n_real[k],
                                         m_real[k])
               for k in range(P)]
        t3 = time.perf_counter()
        assert res[0][0] == -5
        print("prep %.1f ms | chain(sync) %.1f ms | decode %.1f ms | "
              "total %.1f ms" % ((t1 - t0) * 1e3, (t2 - t1) * 1e3,
                                 (t3 - t2) * 1e3, (t3 - t0) * 1e3))


if __name__ == "__main__":
    main()
