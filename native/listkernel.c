/* Host list-engine kernels: k-mer extraction, radix sort, run-length
 * counting, and record emission for the glistmaker pipeline.
 *
 * Placement rationale (utils/backend.py cost model): the device count
 * pipeline wins whenever results stay device-resident, but an
 * end-to-end `glistmaker` run must materialize every output record on
 * the host to write the .list file.  On hosts whose accelerator link is
 * slow on readback (this container's tunnel: ~0.4 MB/s device->host),
 * the whole count pipeline therefore runs here.
 *
 * This is a fresh design, not a port: the reference splits work into
 * per-thread GT4WordTables sorted with an MSD 8-bit hybrid radix
 * (src/utils.c:101-198) and k-way-merges tmp lists
 * (src/glistmaker.c:788-835).  Here the whole extraction is one rolling
 * pass (role of src/fasta.c:218-264), the sort is LSD radix over 11-bit
 * digits (2048 write streams keep the distribution pass L2-resident;
 * uniform digits are skipped, so a k=25 canonical key sorts in <=5
 * passes), and counts are never stored: they fall out of run lengths in
 * the single emit pass that writes the final 12-byte records.
 */

#include <stdlib.h>
#include <string.h>

#define RADIX_BITS 11
#define RADIX_SIZE (1 << RADIX_BITS)
#define RADIX_MASK (RADIX_SIZE - 1)

/* ------------------------------------------------------------------ */
/* extraction: 2-bit codes -> canonical k-mer words                    */
/* ------------------------------------------------------------------ */

/* codes[i] in 0..3 are bases, anything >3 resets the window (the
 * N-reset semantics of src/fasta.c:258-264; the parser already mapped
 * bytes to codes).  Returns the number of words written to out. */
long fgx_extract_canonical (const unsigned char *codes, long n, int k,
                            unsigned long long *out)
{
  unsigned long long mask =
    (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
  int rc_shift = 2 * (k - 1);
  unsigned long long fw = 0, rc = 0;
  int run = 0;
  long i, m = 0;
  for (i = 0; i < n; i++) {
    unsigned int c = codes[i];
    if (c > 3) { run = 0; continue; }
    fw = ((fw << 2) | c) & mask;
    /* reverse complement built incrementally: the complement of the
     * incoming base enters at the top; k shifts flush any pre-reset
     * remnant bits out the bottom, so no reset of rc is needed */
    rc = (rc >> 2) | ((unsigned long long) (3 - c) << rc_shift);
    if (++run >= k) out[m++] = (fw < rc) ? fw : rc;
  }
  return m;
}

/* Non-canonical variant (glistmaker has no flag for it, but the device
 * twin supports it and the differential tests exercise both). */
long fgx_extract_forward (const unsigned char *codes, long n, int k,
                          unsigned long long *out)
{
  unsigned long long mask =
    (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
  unsigned long long fw = 0;
  int run = 0;
  long i, m = 0;
  for (i = 0; i < n; i++) {
    unsigned int c = codes[i];
    if (c > 3) { run = 0; continue; }
    fw = ((fw << 2) | c) & mask;
    if (++run >= k) out[m++] = fw;
  }
  return m;
}

/* ------------------------------------------------------------------ */
/* LSD radix sort, 11-bit digits, uniform-digit skipping               */
/* ------------------------------------------------------------------ */

/* Sorts a[0..n) ascending using tmp as scratch.  Returns the pointer
 * holding the sorted data (a or tmp - an even/odd number of passes). */
unsigned long long *fgx_radix_sort_u64 (unsigned long long *a,
                                        unsigned long long *tmp,
                                        long n, int key_bits)
{
  int n_digits = (key_bits + RADIX_BITS - 1) / RADIX_BITS;
  if (n_digits > 6) n_digits = 6;           /* 66 bits capacity */
  if (n_digits < 1) n_digits = 1;
  /* one histogram pass for every digit at once */
  static long hist[6][RADIX_SIZE];
  memset (hist, 0, n_digits * RADIX_SIZE * sizeof (long));
  long i;
  for (i = 0; i < n; i++) {
    unsigned long long v = a[i];
    int d;
    for (d = 0; d < n_digits; d++)
      hist[d][(v >> (d * RADIX_BITS)) & RADIX_MASK]++;
  }
  unsigned long long *src = a, *dst = tmp;
  int d;
  for (d = 0; d < n_digits; d++) {
    long *h = hist[d];
    /* skip digits where every key agrees (common in the top digit of
     * canonical words: only 2k-? bits are populated) */
    int first_digit = (n > 0)
      ? (int) ((src[0] >> (d * RADIX_BITS)) & RADIX_MASK) : 0;
    if (n > 0 && h[first_digit] == n) continue;
    long off[RADIX_SIZE];
    long acc = 0;
    for (i = 0; i < RADIX_SIZE; i++) { off[i] = acc; acc += h[i]; }
    int sh = d * RADIX_BITS;
    for (i = 0; i < n; i++) {
      unsigned long long v = src[i];
      dst[off[(v >> sh) & RADIX_MASK]++] = v;
    }
    unsigned long long *t = src; src = dst; dst = t;
  }
  return src;
}

/* ------------------------------------------------------------------ */
/* run-length emit: sorted words -> 12-byte .list records              */
/* ------------------------------------------------------------------ */

static void put_rec (unsigned char *r, long idx, unsigned long long w,
                     unsigned int c)
{
  __builtin_memcpy (r + 12 * idx, &w, 8);
  __builtin_memcpy (r + 12 * idx + 8, &c, 4);
}

/* Emits one record per run of equal words whose length passes
 * [min_count, max_count].  Returns the number of records; *total gets
 * the sum of emitted counts (the .list header total, u64 like the
 * reference header field word-list.h:61-72). */
long fgx_emit_runs (const unsigned long long *sorted, long n,
                    unsigned int min_count, unsigned int max_count,
                    unsigned char *records, unsigned long long *total)
{
  long i = 0, m = 0;
  unsigned long long tot = 0;
  while (i < n) {
    unsigned long long w = sorted[i];
    long j = i + 1;
    while (j < n && sorted[j] == w) j++;
    /* counts are u32 in the record; the reference's table counts wrap
     * rather than saturate (u32 freq field, src/word-list.h:72) */
    unsigned int c = (unsigned int) (j - i);
    if (c >= min_count && c <= max_count) {
      put_rec (records, m, w, c);
      tot += c;
      m++;
    }
    i = j;
  }
  *total = tot;
  return m;
}

/* ------------------------------------------------------------------ */
/* fused one-call pipeline for a code slab                             */
/* ------------------------------------------------------------------ */

/* codes -> sorted unique records in one call.  records must have
 * capacity 12 * (number of valid windows) bytes; scratch management is
 * internal.  Returns the record count, or -1 on allocation failure. */
long fgx_count_kmers_list (const unsigned char *codes, long n, int k,
                           int canonical,
                           unsigned int min_count, unsigned int max_count,
                           unsigned char *records,
                           unsigned long long *total_count)
{
  long cap = (n > 0) ? n : 1;
  unsigned long long *words =
    (unsigned long long *) malloc (cap * sizeof (unsigned long long));
  unsigned long long *tmp =
    (unsigned long long *) malloc (cap * sizeof (unsigned long long));
  if (!words || !tmp) { free (words); free (tmp); return -1; }
  long m = canonical
    ? fgx_extract_canonical (codes, n, k, words)
    : fgx_extract_forward (codes, n, k, words);
  unsigned long long *sorted = fgx_radix_sort_u64 (words, tmp, m, 2 * k);
  long n_rec = fgx_emit_runs (sorted, m, min_count, max_count,
                              records, total_count);
  free (words);
  free (tmp);
  return n_rec;
}

/* Sort-then-emit over a caller-accumulated word buffer: the multi-slab
 * ingestion path extracts every slab into one buffer and sorts ONCE
 * (cheaper than per-slab sorts plus a k-way merge when the buffer fits
 * in RAM).  words is clobbered.  Returns the record count, -1 on OOM. */
long fgx_sort_count_emit (unsigned long long *words, long n, int key_bits,
                          unsigned int min_count, unsigned int max_count,
                          unsigned char *records,
                          unsigned long long *total_count)
{
  unsigned long long *tmp = (unsigned long long *)
    malloc ((size_t) (n > 0 ? n : 1) * sizeof (unsigned long long));
  if (!tmp) return -1;
  unsigned long long *sorted = fgx_radix_sort_u64 (words, tmp, n, key_bits);
  long m = fgx_emit_runs (sorted, n, min_count, max_count, records,
                          total_count);
  free (tmp);
  return m;
}

/* Count-only variant for callers that keep (words, counts) as arrays
 * (the sharded merge path): writes unique words and u32 counts to
 * separate outputs, no cutoff. */
long fgx_count_kmers_arrays (const unsigned char *codes, long n, int k,
                             int canonical,
                             unsigned long long *uwords,
                             unsigned int *ucounts,
                             unsigned long long *total_count)
{
  long cap = (n > 0) ? n : 1;
  unsigned long long *words =
    (unsigned long long *) malloc (cap * sizeof (unsigned long long));
  unsigned long long *tmp =
    (unsigned long long *) malloc (cap * sizeof (unsigned long long));
  if (!words || !tmp) { free (words); free (tmp); return -1; }
  long m = canonical
    ? fgx_extract_canonical (codes, n, k, words)
    : fgx_extract_forward (codes, n, k, words);
  unsigned long long *sorted = fgx_radix_sort_u64 (words, tmp, m, 2 * k);
  long i = 0, mu = 0;
  unsigned long long tot = 0;
  while (i < m) {
    unsigned long long w = sorted[i];
    long j = i + 1;
    while (j < m && sorted[j] == w) j++;
    uwords[mu] = w;
    ucounts[mu] = (unsigned int) (j - i);
    tot += (unsigned long long) (j - i);
    mu++;
    i = j;
  }
  free (words);
  free (tmp);
  *total_count = tot;
  return mu;
}

/* ------------------------------------------------------------------ */
/* k-way merge of sorted (word, count) record shards                   */
/* ------------------------------------------------------------------ */

/* Streams S sorted unique record shards (12-byte records each) into a
 * single sorted unique record stream, summing counts of equal words
 * (u32 wrap, matching union rule ADD) and applying the cutoff window.
 * The role of the reference's gt4_write_union (set-operations.c:40-129)
 * without its fd streaming: shards here are host arrays (RAM or mmap).
 * Returns the record count. */
long fgx_merge_rec_shards (const unsigned char **shards, const long *lens,
                           int n_shards,
                           unsigned int min_count, unsigned int max_count,
                           unsigned char *records,
                           unsigned long long *total_count)
{
  /* simple loser-free heap over shard cursors; n_shards is small
   * (spill shards), so a linear min scan is fine and branch-cheap */
  long *pos = (long *) calloc ((size_t) (n_shards > 0 ? n_shards : 1),
                               sizeof (long));
  long m = 0;
  unsigned long long tot = 0;
  if (!pos) return -1;
  for (;;) {
    int s, best = -1;
    unsigned long long bw = 0;
    for (s = 0; s < n_shards; s++) {
      if (pos[s] >= lens[s]) continue;
      unsigned long long w;
      __builtin_memcpy (&w, shards[s] + 12 * pos[s], 8);
      if (best < 0 || w < bw) { best = s; bw = w; }
    }
    if (best < 0) break;
    unsigned int csum = 0;
    for (s = 0; s < n_shards; s++) {
      if (pos[s] >= lens[s]) continue;
      unsigned long long w;
      unsigned int c;
      __builtin_memcpy (&w, shards[s] + 12 * pos[s], 8);
      if (w != bw) continue;
      __builtin_memcpy (&c, shards[s] + 12 * pos[s] + 8, 4);
      csum += c;                      /* u32 wrap (union ADD parity) */
      pos[s]++;
    }
    if (csum >= min_count && csum <= max_count) {
      put_rec (records, m, bw, csum);
      tot += csum;
      m++;
    }
  }
  free (pos);
  *total_count = tot;
  return m;
}
