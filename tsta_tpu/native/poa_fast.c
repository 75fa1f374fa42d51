/* Native Kahn toposort for the POA graph host path.
 *
 * Replicates models/poa_graph.PoaGraph.toposort's MAIN path exactly --
 * min-heap of node ids, variant-ring members placed with their group
 * head when already ready (indeg == 0 at group-formation time) -- so
 * the emitted order is bit-identical to the Python implementation (the
 * round-score parity of the native MSA engine depends on the order:
 * per-pred argmax ties break by topo position).  The Python fallback
 * path (variants not ready at emission time, a cycle-ish corner) is
 * NOT replicated: on any shortfall this returns the partial count and
 * the caller redoes the sort in Python.
 *
 * Rationale (r4 profile): the Python heap Kahn costs ~80 ms per call
 * at 52k nodes and ~0.4 s at 207k (three calls per 2-round run); this
 * runs the same algorithm in ~2 ms / ~10 ms.  Reference counterpart:
 * t_sort/toposort (msa/topo.c:179-260).
 *
 * Build: gcc -O3 -march=native -fPIC -shared (native/build.py, ctypes).
 */

#include <stdlib.h>
#include <string.h>

/* array binary min-heap of longs */
typedef struct {
  long *a;
  long n;
} Heap;

static void heap_push(Heap *h, long v) {
  long i = h->n++;
  h->a[i] = v;
  while (i > 0) {
    long p = (i - 1) >> 1;
    if (h->a[p] <= h->a[i]) break;
    long t = h->a[p];
    h->a[p] = h->a[i];
    h->a[i] = t;
    i = p;
  }
}

static long heap_pop(Heap *h) {
  long top = h->a[0];
  h->a[0] = h->a[--h->n];
  long i = 0;
  for (;;) {
    long l = 2 * i + 1, r = l + 1, m = i;
    if (l < h->n && h->a[l] < h->a[m]) m = l;
    if (r < h->n && h->a[r] < h->a[m]) m = r;
    if (m == i) break;
    long t = h->a[m];
    h->a[m] = h->a[i];
    h->a[i] = t;
    i = m;
  }
  return top;
}

/* n nodes; successors CSR (sptr[n+1], sidx); initial in-degrees
 * indeg_in[n]; variant rings CSR (vptr[n+1], vidx); order[n] out.
 * Returns the number of nodes placed (n == success). */
long tsta_poa_toposort(long n, const long *sptr, const long *sidx,
                       const long *indeg_in, const long *vptr,
                       const long *vidx, long *order) {
  if (n <= 0) return 0;
  long *indeg = (long *)malloc((size_t)n * sizeof(long));
  char *placed = (char *)calloc((size_t)n, 1);
  /* every node enters the heap at most once (when indeg hits 0), plus
   * the initial ready set: n slots suffice */
  long *harr = (long *)malloc((size_t)n * sizeof(long));
  long *group = (long *)malloc((size_t)(n ? n : 1) * sizeof(long));
  if (!indeg || !placed || !harr || !group) {
    free(indeg); free(placed); free(harr); free(group);
    return -1;
  }
  memcpy(indeg, indeg_in, (size_t)n * sizeof(long));
  Heap h = {harr, 0};
  for (long v = 0; v < n; v++)
    if (indeg[v] == 0) heap_push(&h, v);
  long count = 0;
  while (h.n > 0) {
    long v = heap_pop(&h);
    if (placed[v]) continue;
    /* group = [v] + ready unplaced variant-ring members (checked with
     * the CURRENT indeg, as the Python list comprehension does) */
    long gn = 0;
    group[gn++] = v;
    for (long k = vptr[v]; k < vptr[v + 1]; k++) {
      long w = vidx[k];
      if (!placed[w] && indeg[w] == 0) group[gn++] = w;
    }
    for (long gi = 0; gi < gn; gi++) {
      long w = group[gi];
      if (placed[w]) continue;
      placed[w] = 1;
      order[count++] = w;
      for (long k = sptr[w]; k < sptr[w + 1]; k++) {
        long s = sidx[k];
        if (--indeg[s] == 0) heap_push(&h, s);
      }
    }
  }
  free(indeg);
  free(placed);
  free(harr);
  free(group);
  return count;
}

/* Boundary column H(v,-1) recurrence (ops/msa_pallas._prepare): in topo
 * order, hm1[i+1] = o+e for sources, else max over preds' hm1 plus e --
 * preds[] entries are buffer ids (topo pos + 1; 0 = the virtual row,
 * hm1[0] = 0), so they index hm1 directly.  The Python version
 * vectorises chain runs but still pays ~25-30 ms of per-breaker work
 * at 50k nodes; this is the same recurrence in one pass. */
void tsta_poa_hm1(long n_real, long max_in, const int *preds,
                  const long *lens, long e, long o, long *hm1) {
  hm1[0] = 0;
  for (long i = 0; i < n_real; i++) {
    long li = lens[i];
    long v;
    if (li == 0) {
      v = o + e;
    } else {
      const int *row = preds + i * max_in;
      long mx = hm1[row[0]];
      for (long k = 1; k < li; k++) {
        long x = hm1[row[k]];
        if (x > mx) mx = x;
      }
      v = mx + e;
    }
    hm1[i + 1] = v;
  }
}
