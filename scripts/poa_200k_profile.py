"""Phase breakdown of the 3x200k chunked MSA (bench msa_200k shape):
per round: prep/DP+walk dispatch/sync/merge/toposort, plus final emit.

PYTHONPATH="/root/repo:$PYTHONPATH" timeout 560 python scripts/poa_200k_profile.py
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR","/root/.cache/tsta_jax_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np

def main():
    from tsta_tpu.config import AlignParams
    from tsta_tpu.models.poa_graph import PoaGraph
    from tsta_tpu.ops import msa_native, msa_pallas

    params = AlignParams()
    rng = np.random.default_rng(13)
    bases = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(bases, 200000).tobytes()
    def mut(s, rate):
        s = np.frombuffer(s, np.uint8).copy()
        m = rng.random(len(s)) < rate
        s[m] = bases[rng.integers(0, 4, m.sum())]
        return np.delete(s, rng.integers(0, len(s), len(s)//50)).tobytes()
    seqs = [base, mut(base, 0.05), mut(base, 0.08)]
    # warm compile via one full run
    t0=time.perf_counter()
    msa_native.align_seqs(seqs, params)
    print("warm run: %.2f s" % (time.perf_counter()-t0), flush=True)

    g = PoaGraph.from_sequence(seqs[0], 3); g.toposort()
    for sno in (1,2):
        seq = seqs[sno]
        t0=time.perf_counter()
        out = msa_pallas.round_dp_fused(g, seq, params)
        t1=time.perf_counter()
        scores_d, align_d, best_d, order = out
        if isinstance(scores_d, np.ndarray):
            score = int(scores_d[0, int(best_d)]); align_np = np.asarray(align_d)[:len(seq)]
        else:
            packed = np.asarray(msa_pallas.pack_round(scores_d, align_d, best_d))
            score = int(packed[1]); align_np = packed[2:2+len(seq)]
        t2=time.perf_counter()
        msa_native._merge(g, seq, sno, order, align_np)
        t3=time.perf_counter()
        g.toposort()
        t4=time.perf_counter()
        print("round %d: dp+walk(sync'd inside)=%.3f pack/read=%.3f merge=%.3f topo=%.3f score=%d" %
              (sno, t1-t0, t2-t1, t3-t2, t4-t3, score), flush=True)
    t0=time.perf_counter(); rows=g.msa_rows(); t1=time.perf_counter(); cons=g.consensus(); t2=time.perf_counter()
    print("emit: msa_rows=%.3f consensus=%.3f (cols=%d)" % (t1-t0, t2-t1, len(rows[0])), flush=True)

if __name__ == "__main__":
    main()
