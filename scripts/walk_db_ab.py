"""A/B the double-buffered banded packed walk (TSTA_WALK_DB) ON
HARDWARE: exactness (words/counts bit-identical to the single-buffer
kernel) + timing, per pair kind.

PYTHONPATH="/root/repo:$PYTHONPATH" timeout 500 python scripts/walk_db_ab.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/tsta_jax_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
from walk_profile import pairs_of, best


def main():
    import jax.numpy as jnp
    from tsta_tpu.ops import psa_diff, traceback as tb

    p = (2, -5, -2, -4)
    ln = 10240
    P = 8
    n_pad = psa_diff._traced_n_pad(ln)
    m_pad = -(-ln // psa_diff.T_R) * psa_diff.T_R
    Rp = n_pad // psa_diff.LANES
    S = P * Rp

    for kind in ("random", "realistic", "identical"):
        pr = pairs_of(kind, P, ln)
        a8 = np.full((S, psa_diff.LANES), psa_diff.A_PAD, np.uint8)
        brows8 = np.full((m_pad, P), psa_diff.B_PAD, np.uint8)
        nm = np.zeros((P, 2), np.int32)
        for k, (a, b) in enumerate(pr):
            arow = np.full(n_pad, psa_diff.A_PAD, np.uint8)
            arow[:len(a)] = a
            a8[k * Rp:(k + 1) * Rp] = arow.reshape(Rp, psa_diff.LANES)
            brows8[:len(b), k] = b
            nm[k] = (len(a), len(b))
        sc, co, plane = psa_diff._psa_diff_traced_call(
            jnp.asarray(a8, jnp.int32), jnp.asarray(brows8, jnp.int32),
            jnp.asarray(nm), n_pad, m_pad, P, p)
        nmj = jnp.asarray(nm)
        _ = int(np.asarray(sc)[0, 0])   # hard sync through the tunnel

        out = {}
        for db in (False, True):
            def run():
                w, c = tb._decode_moves_banded_packed(plane, nmj, Rp,
                                                      True, db=db)
                return int(np.asarray(c)[0])
            t = best(run)
            w, c = tb._decode_moves_banded_packed(plane, nmj, Rp, True,
                                                  db=db)
            out[db] = (t, np.asarray(w), np.asarray(c))
        # compare DECODED moves: the words buffer is SMEM, so slots
        # beyond count hold uninitialised garbage that differs run-to-run
        same = np.array_equal(out[0][2], out[1][2]) and all(
            np.array_equal(tb.unpack_moves(out[0][1][k], out[0][2][k]),
                           tb.unpack_moves(out[1][1][k], out[1][2][k]))
            for k in range(P))
        steps = int(out[0][2].sum())
        print(f"{kind:9s}: sb={out[0][0]*1e3:6.1f} ms  "
              f"db={out[1][0]*1e3:6.1f} ms  steps={steps}  "
              f"exact={'OK' if same else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()
