"""Per-node budget of the POA round kernel (round-3 verdict item 2).

Times _poa_round_call on a real 50 kbp second-round graph (built by
fusing one mutated read, so ~90% chain nodes / real pred mix) with one
cost component ablated at a time, K-chained behind optimization
barriers so tunnel RTT cancels:

  full      : production kernel
  noword    : no traceback-word store+DMA (+wait)
  noring    : no state-ring store+DMA (+wait)
  nogather  : all nodes take the register chain fast path
  nodp      : predecessor reduction only, no row arithmetic
  nodp+noword+noring+nogather : loop floor

PYTHONPATH="/root/repo:$PYTHONPATH" timeout 560 python scripts/poa_budget.py
"""
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/tsta_jax_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
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
    # round-2 graph via the production fused round + merge
    g = PoaGraph.from_sequence(base, 3)
    g.toposort()
    scores_d, align_d, best_d, order = msa_pallas.round_dp_fused(
        g, r1, params)
    packed = np.asarray(msa_pallas.pack_round(scores_d, align_d,
                                              best_d))
    align_np = packed[2:2 + len(r1)]
    msa_native._merge(g, r1, 1, order, align_np)
    g.toposort()

    p, prep, n, n_real, NC, a2d = msa_pallas._prep_round(g, r2, params)
    (predsT, pmaskT, bases_t, fills, N, max_in, W,
     order, preds) = prep
    assert NC is None, "chunked at this size?"
    chain_frac = float(np.mean(
        (pmaskT[0, :len(order)] != 0)
        & (predsT[0, :len(order)] == np.arange(len(order)))
        & ((pmaskT[1:, :len(order)] == 0).all(axis=0)
           if max_in > 1 else True)))
    print(f"N={N} (real {len(order)}) n={n} W={W} max_in={max_in} "
          f"chain={chain_frac:.2%}", flush=True)

    args = (jnp.asarray(predsT), jnp.asarray(pmaskT),
            jnp.asarray(bases_t), jnp.asarray(fills),
            a2d)
    nrow = jnp.asarray([[n_real, 0, 0]], np.int32)
    Rp = n // msa_pallas.LANES

    @functools.partial(jax.jit, static_argnames=("K", "ablate"))
    def callK(preds, pmask, bt, fills, a2d, K, ablate):
        tot = jnp.int32(0)
        ring0 = jnp.zeros((W, 2 * Rp, msa_pallas.LANES), jnp.int32)
        for _ in range(K):
            nr, tot = jax.lax.optimization_barrier((nrow, tot))
            words, scores, _, _ = msa_pallas._poa_chunk_call(
                preds, pmask, bt, fills, nr, a2d, ring0,
                N, n, W, max_in, p, ablate=ablate)
            tot = (tot + scores[0, -1]
                   + words[0, 0, 0].astype(jnp.int32))
        return tot

    def timeK(ablate, K=3):
        f1 = functools.partial(callK, *args, K=1, ablate=ablate)
        fK = functools.partial(callK, *args, K=K, ablate=ablate)
        int(f1())
        int(fK())
        b1 = bK = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(f1())
            b1 = min(b1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            int(fK())
            bK = min(bK, time.perf_counter() - t0)
        return (bK - b1) / (K - 1)

    base_t = None
    for ablate in ("", "noword", "noring", "nogather", "noseg",
                   "nof", "nodp,noword"):
        t = timeK(ablate)
        per = t / N * 1e6
        label = ablate or "full"
        extra = ""
        if base_t is None:
            base_t = t
        else:
            extra = f"  (saves {(base_t-t)*1e3:6.1f} ms)"
        print(f"{label:28s}: {t*1e3:7.1f} ms  ({per:6.2f} us/node)"
              f"{extra}", flush=True)


if __name__ == "__main__":
    main()
