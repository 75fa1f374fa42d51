"""Host-side POA graph for the TPU-native MSA engine.

A clean partial-order graph with the reference's capabilities (node merge,
edge weights, per-read passing sets, aligned-variant rings capped at one
per base, heaviest-bundle consensus -- reference structures poa.h:100-134,
fusion c-t-simd.c:659-977, topo.c, result.c) but with simplified,
documented tie rules: the device DP (ops/msa_native.py) is the exact
int32 recurrence, and fusion walks a 3-state (H/E/F) textbook traceback.

Kept as plain numpy/int lists: the graph is the host side of the design;
the device only ever sees dense per-round tensors derived from it.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class PoaGraph:
    n_seq: int
    bases: List[int] = dataclasses.field(default_factory=list)
    preds: List[List[int]] = dataclasses.field(default_factory=list)
    weights: List[List[int]] = dataclasses.field(default_factory=list)
    passing: List[np.ndarray] = dataclasses.field(default_factory=list)
    variants: List[List[int]] = dataclasses.field(default_factory=list)
    # derived (rebuilt by toposort)
    topo: List[int] = dataclasses.field(default_factory=list)
    # incrementally maintained successor cache (succs() is on the hot
    # host path several times per MSA round; None = rebuild on demand)
    _succs: Optional[List[List[int]]] = dataclasses.field(
        default=None, repr=False, compare=False)

    def __len__(self) -> int:
        return len(self.bases)

    def add_node(self, base: int, seq_no: int,
                 preds: Optional[List[int]] = None) -> int:
        idx = len(self.bases)
        self.bases.append(int(base))
        self.preds.append(list(preds or []))
        self.weights.append([1] * len(preds or []))
        p = np.zeros(self.n_seq, dtype=bool)
        p[seq_no] = True
        self.passing.append(p)
        self.variants.append([])
        if self._succs is not None:
            self._succs.append([])
            for pv in self.preds[idx]:
                self._succs[pv].append(idx)
        return idx

    def add_edge(self, src: int, dst: int, w: int = 1) -> None:
        if src < 0:
            return
        try:
            k = self.preds[dst].index(src)
            self.weights[dst][k] += w
        except ValueError:
            self.preds[dst].append(src)
            self.weights[dst].append(w)
            if self._succs is not None:
                self._succs[src].append(dst)

    @classmethod
    def from_sequence(cls, seq: bytes, n_seq: int) -> "PoaGraph":
        g = cls(n_seq=n_seq)
        prev = -1
        for ch in seq:
            idx = g.add_node(ch, 0, [prev] if prev >= 0 else [])
            prev = idx
        g.toposort()
        return g

    def succs(self) -> List[List[int]]:
        if self._succs is None:
            out: List[List[int]] = [[] for _ in range(len(self))]
            for v, ps in enumerate(self.preds):
                for p in ps:
                    out[p].append(v)
            self._succs = out
        return self._succs

    def toposort(self) -> List[int]:
        """Deterministic Kahn order, keeping aligned-variant rings
        adjacent so they share an output column."""
        n = len(self)
        indeg = [len(p) for p in self.preds]
        succs = self.succs()
        ready = [v for v in range(n) if indeg[v] == 0]
        order: List[int] = []
        placed = [False] * n
        import heapq
        heapq.heapify(ready)
        while ready:
            v = heapq.heappop(ready)
            if placed[v]:
                continue
            group = [v] + [w for w in self.variants[v]
                           if not placed[w] and indeg[w] == 0]
            for w in group:
                if placed[w]:
                    continue
                placed[w] = True
                order.append(w)
                for s in succs[w]:
                    indeg[s] -= 1
                    if indeg[s] == 0:
                        heapq.heappush(ready, s)
        if len(order) != n:
            # variants not yet ready break grouping; fall back to pure Kahn
            remaining = [v for v in range(n) if not placed[v]]
            indeg2 = {v: sum(1 for p in self.preds[v] if not placed[p])
                      for v in remaining}
            ready = sorted(v for v in remaining if indeg2[v] == 0)
            while ready:
                v = ready.pop(0)
                placed[v] = True
                order.append(v)
                for s in succs[v]:
                    if not placed[s]:
                        indeg2[s] -= 1
                        if indeg2[s] == 0:
                            ready.append(s)
                            ready.sort()
        self.topo = order
        return order

    def sinks(self) -> List[int]:
        return [v for v, ss in enumerate(self.succs()) if not ss]

    def apply_delta(self, seq: bytes, seq_no: int, order,
                    align_rows) -> int:
        """Replay one round's graph mutation from its delta.

        The delta of a fusion round is the alignment column map
        ``align_rows`` ((len(seq),) topo rows, -1 for insertions): the
        merge itself is a deterministic pure function of
        ``(graph, seq, seq_no, order, align_rows)``, so replicated
        graphs on every host stay bit-identical when each replays the
        same few-KB delta (parallel/msa_multihost.py broadcasts it;
        the TPU-native replacement for the reference's shared-memory
        graph that all threads mutate in place, c-t-simd.c:659-977).
        Returns the number of nodes added.
        """
        from tsta_tpu.ops.msa_native import _merge
        return _merge(self, seq, seq_no, order, align_rows)

    def consensus(self) -> bytes:
        """Heaviest-bundle consensus with the reference's re-scoring
        semantics (tp1 + modify, topo.c:7-177): per node take the
        max-edge-weight predecessor among non-negated ones (ties go to
        the later predecessor when its score is >= the held one); while
        the global best is not a sink, negate the lighter competing
        predecessors of its successors and re-score downstream.  With
        the tp1+modify rules adopted, consensus matches the compat
        engine on 20/20 random quality corpora (asserted in
        tests/test_msa_quality.py); byte parity on goldens remains the
        compat engine's contract.  The 4n+4 iteration bound is a safety
        net against inputs where the reference's recursive modify()
        would never terminate (e.g. a competing predecessor with score 0
        or tied with the global max is never negated); on exhaustion we
        fall back to tracing from the best-scoring sink instead of
        emitting a truncated consensus from a stuck non-sink."""
        n = len(self)
        topo = self.topo
        pos = {v: i for i, v in enumerate(topo)}
        succs = self.succs()
        sinks = {v for v in range(n) if not succs[v]}
        score = [0] * n
        cfrom = [-1] * n

        def rescore(v):
            mx, mx_j = 0, -1
            ps, ws = self.preds[v], self.weights[v]
            for j, (p, w) in enumerate(zip(ps, ws)):
                if score[p] >= 0:
                    if mx < w or (mx == w and mx_j >= 0
                                  and score[ps[mx_j]] <= score[p]):
                        mx, mx_j = w, j
            if mx_j < 0:
                score[v], cfrom[v] = 0, -1
            else:
                score[v], cfrom[v] = score[ps[mx_j]] + mx, ps[mx_j]

        for v in topo:
            rescore(v)
        for _ in range(4 * n + 4):     # modify loop; bound is a safety net
            top, mx = topo[0], score[topo[0]]
            for v in topo:
                if score[v] >= mx:
                    top, mx = v, score[v]
            if top in sinks:
                break
            marked = set()
            for nx in succs[top]:
                for p in self.preds[nx]:
                    if 0 < score[p] < score[top]:
                        score[p] = -score[p]
                marked.add(nx)
            for v in topo[pos[top] + 1:]:
                if score[v] >= 0 or v in marked:
                    rescore(v)
        else:
            # bound exhausted (see docstring): trace from the heaviest
            # sink rather than a stuck interior node, which would emit a
            # silently truncated consensus.
            top = max(sinks, key=lambda v: score[v]) if sinks else top
        out = bytearray()
        v = top
        while v >= 0:
            out.append(self.bases[v])
            v = cfrom[v]
        out.reverse()
        return bytes(out)

    def msa_rows(self) -> List[bytes]:
        """Row-wise MSA: one column per variant ring (reference
        result.c:42-66 semantics).

        Columns are ordered by a topological sort of the *condensed*
        column graph (variant groups as vertices, node edges as arcs):
        ordering raw nodes by graph topo order -- as the reference does
        -- can emit a variant group before an intervening node of some
        read's path when the variant was created in a later round,
        swapping adjacent bases in that read's row.  The reference's
        custom tp/tp1 visit order avoids this for its own fusion rules;
        the condensed sort is the general guarantee.  On a (degenerate)
        cyclic column graph it falls back to node-topo order.
        """
        n = len(self)
        # variant groups = connected components of the variant relation
        gid = list(range(n))

        def find(a):
            while gid[a] != a:
                gid[a] = gid[gid[a]]
                a = gid[a]
            return a

        for v in range(n):
            for w in self.variants[v]:
                ra, rb = find(v), find(w)
                if ra != rb:
                    gid[max(ra, rb)] = min(ra, rb)
        group_of = [find(v) for v in range(n)]
        members: dict = {}
        topo_rank = {v: i for i, v in enumerate(self.topo)}
        for v in self.topo:
            members.setdefault(group_of[v], []).append(v)

        # condensed DAG + Kahn with min-topo-rank tie-break
        import heapq
        succs: dict = {g: set() for g in members}
        indeg = {g: 0 for g in members}
        for v in range(n):
            for p in self.preds[v]:
                a, b = group_of[p], group_of[v]
                if a != b and b not in succs[a]:
                    succs[a].add(b)
                    indeg[b] += 1
        rank = {g: min(topo_rank[v] for v in ms)
                for g, ms in members.items()}
        heap = [(rank[g], g) for g in members if indeg[g] == 0]
        heapq.heapify(heap)
        cols: List[List[int]] = []
        while heap:
            _, g = heapq.heappop(heap)
            cols.append(members[g])
            for s in succs[g]:
                indeg[s] -= 1
                if indeg[s] == 0:
                    heapq.heappush(heap, (rank[s], s))
        if len(cols) != len(members):  # cycle: fall back to node order
            printed = [False] * n
            cols = []
            for v in self.topo:
                if printed[v]:
                    continue
                group = [v] + [w for w in self.variants[v]
                               if not printed[w]]
                for w in group:
                    printed[w] = True
                cols.append(group)

        # vectorised fill (one np.nonzero over the whole passing matrix
        # instead of one per node): writes ordered exactly as the
        # per-group loops would issue them, so a sequence passing two
        # variants of one column keeps the later group member, as the
        # reference's per-node print loop does (result.c:42-66)
        rows_mat = np.full((self.n_seq, len(cols)), ord("-"), np.uint8)
        flat = np.fromiter((w for g in cols for w in g), np.int64, n)
        col_of = np.empty(n, np.int64)
        col_of[flat] = np.repeat(np.arange(len(cols)),
                                 [len(g) for g in cols])
        order = np.empty(n, np.int64)
        order[flat] = np.arange(n)
        if n:
            nodes, seqs = np.nonzero(np.stack(self.passing))
            srt = np.argsort(order[nodes], kind="stable")
            nodes, seqs = nodes[srt], seqs[srt]
            rows_mat[seqs, col_of[nodes]] = np.asarray(
                self.bases, np.uint8)[nodes]
        return [bytes(r) for r in rows_mat]


def save_graph(path: str, g: PoaGraph, extra: Optional[Dict] = None) -> None:
    """Serialise the graph to npz (CSR edges) for resume/debugging.

    The file is written to ``path`` verbatim (np.savez would silently
    append '.npz' otherwise, and the resume existence-check in
    ops/msa_native.align_seqs would then never see the snapshot).
    """
    indptr = np.cumsum([0] + [len(p) for p in g.preds])
    with open(path, "wb") as fh:
        _savez_to(fh, g, indptr, extra)


def _savez_to(fh, g, indptr, extra):
    np.savez_compressed(
        fh,
        n_seq=g.n_seq,
        bases=np.asarray(g.bases, np.uint8),
        indptr=indptr.astype(np.int64),
        indices=np.concatenate([np.asarray(p, np.int64) for p in g.preds]
                               if g.preds else [np.zeros(0, np.int64)]),
        weights=np.concatenate([np.asarray(w, np.int64) for w in g.weights]
                               if g.weights else [np.zeros(0, np.int64)]),
        passing=np.stack(g.passing) if g.passing else
        np.zeros((0, g.n_seq), bool),
        var_indptr=np.cumsum(
            [0] + [len(v) for v in g.variants]).astype(np.int64),
        var_indices=np.concatenate(
            [np.asarray(v, np.int64) for v in g.variants]
            if g.variants else [np.zeros(0, np.int64)]),
        extra=np.frombuffer(
            __import__("json").dumps(extra or {}).encode(), np.uint8),
    )


def load_graph(path: str) -> tuple:
    """Load a graph snapshot; returns (PoaGraph, extra_dict)."""
    import json
    z = np.load(path)
    g = PoaGraph(n_seq=int(z["n_seq"]))
    indptr = z["indptr"]
    var_indptr = z["var_indptr"]
    for i, base in enumerate(z["bases"]):
        g.bases.append(int(base))
        g.preds.append(list(map(int, z["indices"][indptr[i]:indptr[i + 1]])))
        g.weights.append(list(map(int,
                                  z["weights"][indptr[i]:indptr[i + 1]])))
        g.passing.append(z["passing"][i].copy())
        g.variants.append(list(map(
            int, z["var_indices"][var_indptr[i]:var_indptr[i + 1]])))
    g.toposort()
    extra = json.loads(bytes(z["extra"]).decode() or "{}")
    return g, extra
