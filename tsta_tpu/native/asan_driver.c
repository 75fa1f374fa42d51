/* Standalone sanitizer harness for the compat MSA engine.
 *
 * The engine (compat_msa.c) normally loads as a shared library via
 * ctypes; sanitizers want to own the whole process, so this driver
 * links the engine into a plain executable that tests compile with
 * -fsanitize=address,undefined and run over a fuzz corpus
 * (tests/test_native_sanitizer.py).  The reference's analogous hazards
 * are the unsynchronised spin flags at psa.c:135-137 /
 * c-t-simd.c:22-24; the compat engine replaces them with OpenMP
 * barriers, and this harness is the executable proof.
 *
 * Usage: asan_driver <seqfile> <M> <X> <E> <O> <bS> <threads>
 *   seqfile: one sequence per line (plain ACGT text).
 * Prints "scores: s1 s2 ..." then the MSA shape; exits 0 on success.
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
  int rows;
  int cols;
  char** msa;
  char* consensus;
  int rounds;
  int* last_scores;
  int* graph_len;
  int* add_len;
} MsaResult;

int tsta_msa_run(const char** seqs, const int* lens, int n_seq, int m,
                 int x, int e, int o, int bS, int threads,
                 MsaResult* out);
void tsta_msa_free(MsaResult* out);

int main(int argc, char** argv) {
  if (argc != 8) {
    fprintf(stderr,
            "usage: %s <seqfile> <M> <X> <E> <O> <bS> <threads>\n",
            argv[0]);
    return 2;
  }
  FILE* f = fopen(argv[1], "r");
  if (!f) {
    perror("seqfile");
    return 2;
  }
  const char** seqs = NULL;
  int* lens = NULL;
  int n = 0, cap = 0;
  char* line = NULL;
  size_t lcap = 0;
  ssize_t got;
  while ((got = getline(&line, &lcap, f)) != -1) {
    while (got > 0 && (line[got - 1] == '\n' || line[got - 1] == '\r'))
      line[--got] = '\0';
    if (got == 0) continue;
    if (n == cap) {
      cap = cap ? cap * 2 : 8;
      seqs = (const char**)realloc(seqs, cap * sizeof(*seqs));
      lens = (int*)realloc(lens, cap * sizeof(*lens));
    }
    char* copy = (char*)malloc((size_t)got + 1);
    memcpy(copy, line, (size_t)got + 1);
    seqs[n] = copy;
    lens[n] = (int)got;
    n++;
  }
  free(line);
  fclose(f);
  if (n < 2) {
    fprintf(stderr, "need >= 2 sequences\n");
    return 2;
  }

  MsaResult out;
  memset(&out, 0, sizeof(out));
  int rc = tsta_msa_run(seqs, lens, n, atoi(argv[2]), atoi(argv[3]),
                        atoi(argv[4]), atoi(argv[5]), atoi(argv[6]),
                        atoi(argv[7]), &out);
  if (rc != 0) {
    fprintf(stderr, "tsta_msa_run rc=%d\n", rc);
    return 1;
  }
  printf("scores:");
  for (int i = 0; i < out.rounds; i++)
    printf(" %d", out.last_scores[i]);
  printf("\nshape: %d x %d consensus_len=%zu\n", out.rows, out.cols,
         out.consensus ? strlen(out.consensus) : 0);
  /* touch every output byte so ASan sees any under-allocation */
  size_t sum = 0;
  for (int r = 0; r < out.rows; r++)
    for (int c = 0; out.msa[r][c]; c++) sum += (size_t)out.msa[r][c];
  printf("checksum: %zu\n", sum);
  tsta_msa_free(&out);
  for (int i = 0; i < n; i++) free((void*)seqs[i]);
  free(seqs);
  free(lens);
  return 0;
}
