"""Wall-clock breakdown of one native-MSA round at 3x50 kbp.

Times each pipeline phase of round 2 (the 50k bench shape) separately:
prep (host tensors), kernel dispatch+sync (device DP), walk (device),
pack+transfer, merge (host fusion), toposort (host).

PYTHONPATH="/root/repo:$PYTHONPATH" timeout 560 python scripts/poa_pipeline.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/tsta_jax_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax.numpy as jnp
import numpy as np


def main():
    from tsta_tpu.config import AlignParams
    from tsta_tpu.models.poa_graph import PoaGraph
    from tsta_tpu.ops import msa_native, msa_pallas

    params = AlignParams()
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(bases, 50000).tobytes()

    def mut(s, rate):
        s = np.frombuffer(s, np.uint8).copy()
        m = rng.random(len(s)) < rate
        s[m] = bases[rng.integers(0, 4, m.sum())]
        return np.delete(s, rng.integers(0, len(s),
                                         len(s) // 50)).tobytes()

    r1, r2 = mut(base, 0.05), mut(base, 0.08)

    # e2e wall first (warm)
    msa_native.align_seqs([base, r1, r2], params)
    t0 = time.perf_counter()
    msa_native.align_seqs([base, r1, r2], params)
    wall = time.perf_counter() - t0
    print(f"e2e wall (2 rounds + emit): {wall*1e3:.0f} ms", flush=True)

    # build round-2 state
    g = PoaGraph.from_sequence(base, 3)
    g.toposort()
    scores_d, align_d, best_d, order = msa_pallas.round_dp_fused(
        g, r1, params)
    packed = np.asarray(msa_pallas.pack_round(scores_d, align_d, best_d))
    msa_native._merge(g, r1, 1, order, packed[2:2 + len(r1)])
    g.toposort()

    def t(label, fn, reps=3):
        best = float("inf")
        out = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:24s}: {best*1e3:7.1f} ms", flush=True)
        return out

    prep_out = t("prep (host)", lambda: msa_pallas._prep_round(
        g, r2, params))
    p, prep, n, n_real, NC, a2d = prep_out
    (predsT, pmaskT, bases_t, fills, N, max_in, W,
     order2, preds2) = prep

    # host->device uploads
    def upload():
        return tuple(map(jnp.asarray,
                         (predsT, pmaskT, bases_t, fills)))
    up = t("upload tensors", upload)
    nrow = jnp.asarray([[n_real]], np.int32)

    def kern():
        w, s = msa_pallas._poa_round_call(*up, nrow, a2d, N, n, W,
                                          max_in, p)
        s.block_until_ready()
        return w, s, int(np.asarray(s)[0, 0])
    words, scores, _ = t("DP kernel (sync)", kern)

    sink_mask = np.zeros((N,), np.int32)
    sink_mask[:len(order2)] = np.isin(
        np.asarray(order2, np.int64),
        np.fromiter(g.sinks(), np.int64))
    sinkj = jnp.asarray(sink_mask)
    predsj = jnp.asarray(preds2)

    def walk():
        br, al = msa_pallas._best_and_walk(words, predsj, scores, sinkj,
                                           n_real, n)
        return br, al, int(np.asarray(br))
    best_row, align, _ = t("best+walk XLA (sync)", walk)

    predsTj = jnp.asarray(predsT)

    def walkb():
        br, al = msa_pallas._best_and_walk_banded(
            words, predsTj, scores, sinkj, jnp.int32(n_real), n)
        return br, al, int(np.asarray(br))
    if msa_pallas._walk_banded_ok(N, max_in, n, n // msa_pallas.LANES):
        best_row, align, _ = t("best+walk banded (sync)", walkb)

    def pack():
        return np.asarray(msa_pallas.pack_round(scores, align, best_row))
    packed2 = t("pack+transfer", pack)

    align_np = packed2[2:2 + len(r2)]
    g2 = _copy(g)   # copy OUTSIDE the timing
    t("merge (host)", lambda: msa_native._merge(g2, r2, 2, order2,
                                                align_np), reps=1)
    t("toposort (host)", lambda: g2.toposort(), reps=1)


def _copy(g):
    import copy
    return copy.deepcopy(g)


if __name__ == "__main__":
    main()
