"""Time the MSA host-tail pieces on a real 3x50k final graph:
merge, toposort, _prepare, msa_rows, consensus.

PYTHONPATH="/root/repo:$PYTHONPATH" timeout 560 python scripts/host_tail.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/tsta_jax_tpu")
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
    g = PoaGraph.from_sequence(base, 3)
    g.toposort()
    for sno, seq in ((1, r1), (2, r2)):
        scores_d, align_d, best_d, order = msa_pallas.round_dp_fused(
            g, seq, params)
        packed = np.asarray(msa_pallas.pack_round(scores_d, align_d,
                                                  best_d))
        msa_native._merge(g, seq, sno, order, packed[2:2 + len(seq)])
        g.toposort()

    def t(label, fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:18s}: {best*1e3:7.1f} ms", flush=True)

    print(f"graph: {len(g)} nodes,", sum(len(v) > 0 for v in g.variants),
          "variant nodes", flush=True)
    t("toposort (native)", g.toposort)
    os.environ["TSTA_NATIVE_TOPO"] = "0"
    t("toposort (python)", g.toposort)
    del os.environ["TSTA_NATIVE_TOPO"]
    g.toposort()
    t("_prepare", lambda: msa_pallas._prepare(g, params))
    t("msa_rows", g.msa_rows)
    t("consensus", g.consensus)
    t("succs rebuild", lambda: (setattr(g, "_succs", None), g.succs()))


if __name__ == "__main__":
    main()
