"""Measure the scan-vs-packed crossover for short single pairs on TPU
(round-3 verdict item 7: models/psa.py:_use_pallas hardcodes 1024).

Times psa_align (lax.scan oracle) vs the packed P=1 route, score-only
and traced, at a range of lengths; warm timings (best of 5).

PYTHONPATH="/root/repo:$PYTHONPATH" timeout 560 python scripts/crossover_probe.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/tsta_jax_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def best(fn, iters=5, warm=2):
    for _ in range(warm):
        fn()
    b = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return b


def main():
    from tsta_tpu.config import AlignParams
    from tsta_tpu.ops import psa_diff, psa_scan
    params = AlignParams()
    p = (2, -5, -2, -4)
    rng = np.random.default_rng(5)
    for ln in (128, 512, 2048, 4096, 8192):
        a = rng.integers(65, 69, ln).astype(np.uint8)
        b = rng.integers(65, 69, ln - 7).astype(np.uint8)

        def scan_score():
            r = psa_scan.psa_align(a, b, params)
            return int(r.score)

        def packed_score():
            sc, _ = psa_diff.psa_align_batch_diff([(a, b)], p)
            return int(sc[0])

        def scan_traced():
            r = psa_scan.psa_align(a, b, params, traced=True)
            return int(np.asarray(r.back)[0, 0])

        def packed_traced():
            out = psa_diff.psa_align_batch_traced_packed([(a, b)], p)
            return out[0][0]

        t_scan = best(scan_score)
        t_pack = best(packed_score)
        t_scan_t = best(scan_traced)
        t_pack_t = best(packed_traced)
        print(f"ln={ln:5d}: score scan {t_scan*1e3:6.1f} / packed "
              f"{t_pack*1e3:6.1f} ms | traced scan {t_scan_t*1e3:6.1f} "
              f"/ packed {t_pack_t*1e3:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
