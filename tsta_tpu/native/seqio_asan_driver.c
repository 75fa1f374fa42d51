/* Standalone sanitizer harness for the native seqio parser
 * (seqio_fast.c): reads a file into memory, parses it, touches every
 * indexed byte, prints a record summary, frees.  Built with
 * -fsanitize=address,undefined by tests/test_native_sanitizer.py
 * (same pattern as asan_driver.c for the compat MSA engine).
 *
 * Usage: seqio_asan_driver <file>
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
  long n;
  long cap;
  long *name_off;
  long *name_len;
  long *com_off;
  long *com_len;
  long *seq_off;
  long *seq_len;
  long *qual_off;
  long *qual_len;
  unsigned char *text;
  long text_len;
  int is_fastq;
  char err[256];
} TstaSeqIndex;

int tsta_seqio_parse(const char *buf, long len, TstaSeqIndex *ix);
void tsta_seqio_free(TstaSeqIndex *ix);

int main(int argc, char **argv) {
  if (argc != 2) {
    fprintf(stderr, "usage: %s <file>\n", argv[0]);
    return 2;
  }
  FILE *f = fopen(argv[1], "rb");
  if (!f) {
    perror("file");
    return 2;
  }
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  char *buf = (char *)malloc(len ? (size_t)len : 1);
  if (len && fread(buf, 1, (size_t)len, f) != (size_t)len) {
    fprintf(stderr, "short read\n");
    return 2;
  }
  fclose(f);

  TstaSeqIndex ix;
  memset(&ix, 0, sizeof(ix));
  int rc = tsta_seqio_parse(buf, len, &ix);
  if (rc != 0) {
    /* a parse error is a VALID outcome for adversarial inputs -- the
       sanitizer checks it errors without corrupting memory */
    printf("parse_error: %s\n", ix.err);
    tsta_seqio_free(&ix);
    free(buf);
    return 0;
  }
  unsigned long sum = 0;
  long seq_total = 0;
  for (long i = 0; i < ix.n; i++) {
    for (long k = 0; k < ix.name_len[i]; k++)
      sum += ix.text[ix.name_off[i] + k];
    for (long k = 0; k < ix.com_len[i]; k++)
      sum += ix.text[ix.com_off[i] + k];
    for (long k = 0; k < ix.seq_len[i]; k++)
      sum += ix.text[ix.seq_off[i] + k];
    if (ix.qual_off[i] >= 0)
      for (long k = 0; k < ix.qual_len[i]; k++)
        sum += ix.text[ix.qual_off[i] + k];
    seq_total += ix.seq_len[i];
  }
  printf("records: %ld fastq: %d seq_total: %ld checksum: %lu\n",
         ix.n, ix.is_fastq, seq_total, sum);
  tsta_seqio_free(&ix);
  free(buf);
  return 0;
}
