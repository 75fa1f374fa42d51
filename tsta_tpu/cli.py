"""Command-line interface.

One binary with subcommands replaces the reference's three
(``TSTA_psa`` / ``TSTA_psa_notrace`` / ``TSTA_msa``)::

    tsta psa  -1 a.fa -2 b.fa [-o out.txt] [--notrace] [flags]
    tsta msa  -i seqs.fa [-o out.txt] [flags]
    tsta batch --pairs manifest.tsv [flags]     # batched PSA over many pairs

Scoring flags mirror the reference exactly: ``-M -X -E -O`` (psa/psa.c:546,
msa/msa.c:81).  ``-T`` caps the compat MSA
engine's OpenMP wavefront threads (TPU kernels ignore it -- XLA
schedules those); ``-W`` maps to the compat MSA engine's stripe
multiplier and is ignored by the PSA kernels (exact arithmetic is
block-size independent).  stdout of ``tsta psa`` matches the reference
(``maxsorce=%d`` with the reference's -100 init floor, psa/psa.c:110,666).
"""

from __future__ import annotations

import argparse
import sys
import time

from tsta_tpu.utils.logging import emit_json, get_logger


def _add_scoring_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("-M", type=int, default=2, help="match score [2]")
    p.add_argument("-X", type=int, default=-5, help="mismatch score [-5]")
    p.add_argument("-E", type=int, default=-2, help="gap-extend score [-2]")
    p.add_argument("-O", type=int, default=-4, help="gap-open score [-4]")
    p.add_argument("-T", type=int, default=0,
                   help="threads for the compat MSA engine's OpenMP "
                        "wavefront [all cores]; ignored by the TPU "
                        "kernels (XLA schedules those)")
    p.add_argument("-W", type=int, default=0,
                   help="block width multiplier: sets the compat MSA "
                        "engine's stripe geometry (reference bS, default "
                        "10); ignored by the PSA kernels, whose exact "
                        "arithmetic is block-size independent")
    p.add_argument("--json", action="store_true",
                   help="emit a JSON result line instead of reference stdout")
    p.add_argument("--kernel", default="auto",
                   choices=["auto", "scan", "pallas"],
                   help="PSA kernel selection")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace into DIR "
                        "(TensorBoard/Perfetto)")


def _params(args):
    from tsta_tpu.config import AlignParams
    return AlignParams(match=args.M, mismatch=args.X, gap_extend=args.E,
                       gap_open=args.O)


def cmd_psa(args) -> int:
    from tsta_tpu.models import psa
    from tsta_tpu.utils import profiling
    t0 = time.time()
    with profiling.trace(args.profile):
        out = psa.align_files(args.seq1, args.seq2, _params(args),
                              traced=not args.notrace, kernel=args.kernel)
    wall = time.time() - t0
    if not args.notrace:
        psa.write_alignment(out, args.output)
    if args.json:
        emit_json({"score": out.score, "corner": out.corner,
                   "wall_s": round(wall, 4),
                   "output": None if args.notrace else args.output})
    else:
        print("maxsorce=%d" % max(out.score, psa.REFERENCE_SCORE_FLOOR))
    return 0


def cmd_msa(args) -> int:
    from tsta_tpu.models import msa
    t0 = time.time()
    # -W maps to the compat engine's stripe multiplier bS (reference
    # msa.c:120-122); 0 means default (10)
    width = args.W if args.W > 0 else 10
    mesh = None
    if args.mesh:
        if args.engine != "native":
            raise ValueError("--mesh requires --engine native")
        from tsta_tpu.parallel import mesh as meshlib
        data, seq = (int(v) for v in args.mesh.lower().split("x"))
        mesh = meshlib.make_mesh(data=data, seq=seq)
    progress = None
    if args.engine == "native" and sys.stderr.isatty():
        # the reference's round progress bar (msa/msa.c:134-138)
        def progress(done, total):
            sys.stderr.write("\r[%d/%d]" % (done, total))
            sys.stderr.flush()
            if done == total:
                sys.stderr.write("\n")
    result = msa.align_file(args.input, _params(args), engine=args.engine,
                            width=width, mesh=mesh, threads=args.T,
                            progress=progress)
    wall = time.time() - t0
    msa.write_result(result, args.output)
    if args.json:
        emit_json({"rounds": result.round_scores,
                   "graph_len": result.graph_len,
                   "consensus_len": len(result.consensus),
                   "wall_s": round(wall, 4), "output": args.output})
    return 0


def cmd_msa_batch(args) -> int:
    """Many independent MSAs, pipelined so host graph fusion overlaps
    device DP (msa_native.align_seqs_many; 28% measured wall reduction
    over sequential runs on TPU -- see ROADMAP.md)."""
    import os

    from tsta_tpu.io import read_records
    from tsta_tpu.models import msa
    from tsta_tpu.ops import msa_native

    with open(args.inputs) as f:
        stripped = (ln.strip() for ln in f)
        paths = [s for s in stripped if s and not s.startswith("#")]
    if not paths:
        raise ValueError("empty input list")
    # multi-host: each process takes a strided slice of the input list
    # (host-level scatter over DCN; same helper as align_manifest)
    from tsta_tpu.parallel.batch import stride_for_process
    n_proc = int(os.environ.get("TSTA_NUM_PROCESSES", "1"))
    gidx = stride_for_process(list(range(len(paths))))
    paths = stride_for_process(paths)
    if not paths:
        return 0
    seq_sets = [[r.sequence for r in read_records(p)] for p in paths]
    t0 = time.time()
    outs = msa_native.align_seqs_many(seq_sets, _params(args))
    wall = time.time() - t0
    os.makedirs(args.out_dir, exist_ok=True)
    used = set()
    for idx, (p, out) in zip(gidx, zip(paths, outs)):
        # rename candidates key off the GLOBAL input index so sibling
        # processes writing the same out-dir cannot collide
        name = os.path.splitext(os.path.basename(p))[0]
        cand, k = name if n_proc == 1 else "%s.%d" % (name, idx), idx
        while cand in used:            # inputs may share a basename (and
            cand = "%s.%d" % (name, k)  # a literal input may be named
            k += n_proc                 # like the renamed form)
        name = cand
        used.add(name)
        msa.write_result(out, os.path.join(args.out_dir, name + ".txt"))
    if args.json:
        emit_json({"problems": len(outs), "wall_s": round(wall, 4),
                   "out_dir": args.out_dir})
    return 0


def cmd_batch(args) -> int:
    from tsta_tpu.parallel import batch as pbatch
    mesh = None
    if args.mesh:
        from tsta_tpu.parallel import mesh as meshlib
        data, seq = (int(v) for v in args.mesh.lower().split("x"))
        mesh = meshlib.make_mesh(data=data, seq=seq)
    t0 = time.time()
    results = pbatch.align_manifest(args.pairs, _params(args),
                                    traced=args.traced,
                                    out_dir=args.out_dir,
                                    resume=args.resume,
                                    mesh=mesh)
    wall = time.time() - t0
    cells = sum(r["cells"] for r in results)
    emit_json({"pairs": len(results), "wall_s": round(wall, 4),
               "gcups": round(cells / wall / 1e9, 3)})
    if args.scores:
        with open(args.scores, "w") as f:
            for r in results:
                f.write("%s\t%d\n" % (r["name"], r["score"]))
    return 0


_INT_FLAGS = {"-M", "-X", "-E", "-O", "-T", "-W"}


def _merge_negative_values(argv):
    """Rewrite ['-X', '-3'] to ['-X=-3'].

    argparse disables negative-number value detection when the parser has
    digit-named flags (our reference-compatible ``-1``/``-2``), so scoring
    flags with negative values would otherwise be rejected.
    """
    out = []
    i = 0
    while i < len(argv):
        tok = argv[i]
        if (tok in _INT_FLAGS and i + 1 < len(argv)
                and _is_int(argv[i + 1])):
            out.append(tok + "=" + argv[i + 1])
            i += 2
        else:
            out.append(tok)
            i += 1
    return out


def _is_int(s: str) -> bool:
    try:
        int(s)
        return True
    except ValueError:
        return False


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="tsta", description="TPU-native sequence alignment (TSTA-TPU)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("psa", help="pairwise global alignment")
    _add_scoring_flags(p)
    p.add_argument("-1", dest="seq1", required=True, help="input FASTA 1")
    p.add_argument("-2", dest="seq2", required=True, help="input FASTA 2")
    p.add_argument("-o", dest="output", default="output.txt",
                   help="alignment output file [output.txt]")
    p.add_argument("--notrace", action="store_true",
                   help="score only (TSTA_psa_notrace equivalent)")
    p.set_defaults(fn=cmd_psa)

    p = sub.add_parser("msa", help="partial-order multiple sequence alignment")
    _add_scoring_flags(p)
    p.add_argument("-i", dest="input", required=True, help="input FASTA")
    p.add_argument("-o", dest="output", default="output.txt",
                   help="MSA output file [output.txt]")
    p.add_argument("--engine", default="compat",
                   choices=["compat", "native"],
                   help="compat = bit-exact vs reference; native = exact "
                        "int32 DP on TPU")
    p.add_argument("--mesh", default=None, metavar="DATAxSEQ",
                   help="native engine only: device mesh, e.g. 1x4 "
                        "shards each round's columns over 4 devices "
                        "(long-read path)")
    p.set_defaults(fn=cmd_msa)

    p = sub.add_parser("msa-batch",
                       help="many independent MSAs, fusion/DP pipelined "
                            "(native engine)")
    _add_scoring_flags(p)
    p.add_argument("--inputs", required=True,
                   help="text file listing one reads-FASTA per line")
    p.add_argument("--out-dir", required=True,
                   help="directory for per-problem MSA outputs")
    p.set_defaults(fn=cmd_msa_batch)

    p = sub.add_parser("batch", help="batched PSA over many pairs")
    _add_scoring_flags(p)
    p.add_argument("--pairs", required=True,
                   help="TSV manifest: name<TAB>fasta1<TAB>fasta2")
    p.add_argument("--traced", action="store_true")
    p.add_argument("--out-dir", default=None,
                   help="directory for per-pair alignment outputs")
    p.add_argument("--scores", default=None, help="write scores TSV here")
    p.add_argument("--resume", default=None, metavar="JSONL",
                   help="incremental result store; completed pairs are "
                        "skipped on restart (preemption-safe)")
    p.add_argument("--mesh", default=None, metavar="DATAxSEQ",
                   help="device mesh; pair groups shard over the data "
                        "axis (e.g. 4x1)")
    p.set_defaults(fn=cmd_batch)

    if argv is None:
        argv = sys.argv[1:]
    args = ap.parse_args(_merge_negative_values(list(argv)))
    try:
        return args.fn(args)
    except (FileNotFoundError, ValueError) as e:
        get_logger().error(str(e))
        return 1


if __name__ == "__main__":
    sys.exit(main())
