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
/* FASTA slab parse: raw bytes -> 2-bit codes                          */
/* ------------------------------------------------------------------ */

/* Byte->code table: ACGTUacgtu map to 0..3, everything else is 255
 * (invalid: resets the k-mer window, matching src/fasta.c:258-264 and
 * the numpy NUCL_CODES twin in ops/encode.py). */
static unsigned char nucl_codes[256];
static int nucl_init_done = 0;

static void nucl_init (void)
{
  if (nucl_init_done) return;
  memset (nucl_codes, 255, 256);
  nucl_codes['A'] = nucl_codes['a'] = 0;
  nucl_codes['C'] = nucl_codes['c'] = 1;
  nucl_codes['G'] = nucl_codes['g'] = 2;
  nucl_codes['T'] = nucl_codes['t'] = 3;
  nucl_codes['U'] = nucl_codes['u'] = 3;
  nucl_init_done = 1;
}

/* Parse one newline-cut FASTA fragment whose leading lines may continue
 * a record opened in a previous slab (exact twin of the vectorized
 * _parse_fasta_slab in io/fasta.py; shared semantics: empty lines are
 * dropped, one trailing \r per line is stripped, '>' only opens a
 * header at line start, records are separated by one 255 sentinel with
 * none after the final record, pre-header junk is ignored when not
 * continuing).  codes must have capacity n + 1.  Returns the number of
 * codes written, or -1 when the fragment contains no '>' line and no
 * record is being continued (caller raises). */
long fgx_parse_fasta_slab (const unsigned char *data, long n,
                           int continuing, unsigned char *codes,
                           long *n_headers, long *total_bases,
                           long *count_n)
{
  nucl_init ();
  long i = 0, m = 0;
  long headers = 0, bases = 0, ncnt = 0;
  int open_record = continuing ? 1 : 0;
  while (i < n) {
    /* find line end */
    long e = i;
    while (e < n && data[e] != '\n') e++;
    long line_end = e;
    if (line_end > i && data[line_end - 1] == '\r') line_end--;
    if (line_end > i) {                 /* skip empty lines */
      if (data[i] == '>') {
        if (open_record) codes[m++] = 255;
        headers++;
        open_record = 1;
      } else if (open_record) {
        long j;
        for (j = i; j < line_end; j++) {
          unsigned char b = data[j];
          codes[m++] = nucl_codes[b];
          if (b == 'N' || b == 'n') ncnt++;
        }
        bases += line_end - i;
      }
      /* pre-header lines with no carried record: dropped */
    }
    i = e + 1;
  }
  if (headers == 0 && !continuing) return -1;
  *n_headers = headers;
  *total_bases = bases;
  *count_n = ncnt;
  return m;
}

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
  /* one histogram pass for every digit at once (stack-local: callers
   * may sort independent buckets from parallel threads) */
  long hist[6][RADIX_SIZE];
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
/* MSD-bucketed sort with streaming run emission                       */
/* ------------------------------------------------------------------ */

/* The flat LSD sort above streams the full array every pass; for large
 * n an MSD first pass into ~n/32k buckets makes every later pass
 * L2-resident, and because bucket order IS word order, runs can be
 * emitted (and written to the output file) bucket by bucket — no
 * full-size record buffer, no second pass over 600 MB of records.
 * This is also the natural OpenMP grain for multi-core hosts: buckets
 * are independent and ordered, so parallel sorting with in-order
 * retirement keeps the output byte-stable at any thread count. */

typedef struct {
  unsigned long long *words;    /* caller's buffer (clobbered) */
  unsigned long long *tmp;      /* MSD-distributed copy (owned) */
  long n;
  int key_bits;
  int msd_bits;                 /* top bits used for bucketing */
  long n_buckets;
  long *bucket_off;             /* [n_buckets + 1] offsets into tmp */
  long cur_bucket;
  long cur_pos;                 /* emit cursor within current bucket */
  int cur_sorted;               /* current bucket already sorted? */
} FgxSce;

void *fgx_sce_start (unsigned long long *words, long n, int key_bits)
{
  FgxSce *st = (FgxSce *) calloc (1, sizeof (FgxSce));
  if (!st) return NULL;
  st->words = words;
  st->n = n;
  st->key_bits = key_bits;
  /* target ~32k keys per bucket (256 KB: inner sorts run in L2) */
  int b = 0;
  while ((n >> b) > 32768 && b < key_bits && b < 14) b++;
  if (b < 1) b = 1;
  st->msd_bits = b;
  st->n_buckets = 1L << b;
  st->tmp = (unsigned long long *)
    malloc ((size_t) (n > 0 ? n : 1) * sizeof (unsigned long long));
  st->bucket_off = (long *) calloc (st->n_buckets + 1, sizeof (long));
  if (!st->tmp || !st->bucket_off) {
    free (st->tmp); free (st->bucket_off); free (st);
    return NULL;
  }
  int sh = key_bits - b;
  long i;
  long *cnt = (long *) calloc (st->n_buckets, sizeof (long));
  for (i = 0; i < n; i++) cnt[words[i] >> sh]++;
  long acc = 0;
  for (i = 0; i < st->n_buckets; i++) {
    st->bucket_off[i] = acc;
    acc += cnt[i];
    cnt[i] = st->bucket_off[i];
  }
  st->bucket_off[st->n_buckets] = acc;
  for (i = 0; i < n; i++) st->tmp[cnt[words[i] >> sh]++] = words[i];
  free (cnt);
  st->cur_bucket = 0;
  st->cur_pos = 0;
  st->cur_sorted = 0;
  return st;
}

/* Emit up to cap_records records into buf; returns the record count
 * (0 = exhausted).  chunk_total gets the sum of the emitted counts. */
long fgx_sce_next (void *handle, unsigned int min_count,
                   unsigned int max_count, unsigned char *buf,
                   long cap_records, unsigned long long *chunk_total)
{
  FgxSce *st = (FgxSce *) handle;
  long m = 0;
  unsigned long long tot = 0;
  while (st->cur_bucket < st->n_buckets && m < cap_records) {
    long a = st->bucket_off[st->cur_bucket];
    long z = st->bucket_off[st->cur_bucket + 1];
    unsigned long long *seg = st->tmp + a;
    long len = z - a;
    if (len == 0) { st->cur_bucket++; st->cur_sorted = 0; continue; }
    if (!st->cur_sorted) {
      /* scratch: the matching segment of the caller's words buffer */
      unsigned long long *sorted = fgx_radix_sort_u64 (
        seg, st->words + a, len, st->key_bits - st->msd_bits);
      if (sorted != seg)
        memcpy (seg, sorted, (size_t) len * sizeof (unsigned long long));
      st->cur_sorted = 1;
      st->cur_pos = 0;
    }
    long i = st->cur_pos;
    while (i < len && m < cap_records) {
      unsigned long long w = seg[i];
      long j = i + 1;
      while (j < len && seg[j] == w) j++;
      unsigned int c = (unsigned int) (j - i);
      if (c >= min_count && c <= max_count) {
        put_rec (buf, m, w, c);
        tot += c;
        m++;
      }
      i = j;
    }
    st->cur_pos = i;
    if (i >= len) { st->cur_bucket++; st->cur_sorted = 0; }
  }
  *chunk_total = tot;
  return m;
}

void fgx_sce_free (void *handle)
{
  FgxSce *st = (FgxSce *) handle;
  if (!st) return;
  free (st->tmp);
  free (st->bucket_off);
  free (st);
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
/* resumable two-list set operations (glistcompare host path)          */
/* ------------------------------------------------------------------ */

/* Chunked twin of fastgt_exact.c:fgx_pair_ops_rec (same include_in_*
 * semantics, src/glistcompare.c:433-496): the zipper suspends whenever
 * an active op's chunk buffer fills, so outputs stream to the .list
 * writers in bounded memory and the file writes overlap the next
 * chunk's merge work (the Python side double-buffers). */

static void rec_get (const unsigned char *r, long i,
                     unsigned long long *w, unsigned int *c)
{
  __builtin_memcpy (w, r + 12 * i, 8);
  __builtin_memcpy (c, r + 12 * i + 8, 4);
}

typedef struct {
  const unsigned char *r1, *r2;
  long n1, n2, i, j;
  int r_u, r_i, r_d;
  unsigned int cutoff, override_;
  int subtract;
  int active[4];                /* union, intrsec, diff1, diff2 */
} FgxPairStream;

static unsigned int pair_rule_freq (unsigned int f1, unsigned int f2,
                                    int rule, unsigned int override_)
{
  switch (rule) {
  case 1: return f1 + f2;
  case 2: return (f1 > f2) ? f1 - f2 : 0;
  case 3: return (f1 < f2) ? f1 : f2;
  case 4: return (f1 > f2) ? f1 : f2;
  case 5: return f1;
  case 6: return f2;
  case 7: return override_;
  default: return 0;
  }
}

void *fgx_pair_stream_start (const unsigned char *r1, long n1,
                             const unsigned char *r2, long n2, int rule,
                             unsigned int cutoff, unsigned int override_,
                             int subtract, int a_u, int a_i, int a_d1,
                             int a_d2)
{
  FgxPairStream *st = (FgxPairStream *) calloc (1, sizeof (*st));
  if (!st) return NULL;
  st->r1 = r1; st->n1 = n1; st->r2 = r2; st->n2 = n2;
  st->r_u = (rule == 0) ? 1 : rule;
  st->r_i = (rule == 0) ? 3 : rule;
  st->r_d = (rule == 0) ? 2 : rule;
  st->cutoff = cutoff; st->override_ = override_; st->subtract = subtract;
  st->active[0] = a_u; st->active[1] = a_i;
  st->active[2] = a_d1; st->active[3] = a_d2;
  return st;
}

/* Fills the active op buffers with up to cap records each.  n_out[4]
 * gets per-op record counts, sums[4] per-op count sums.  Returns 1
 * while input remains, 0 when exhausted. */
int fgx_pair_stream_next (void *handle, unsigned char *bu,
                          unsigned char *bi, unsigned char *bd1,
                          unsigned char *bd2, long cap, long *n_out,
                          unsigned long long *sums)
{
  FgxPairStream *st = (FgxPairStream *) handle;
  unsigned char *bufs[4] = { bu, bi, bd1, bd2 };
  long k_[4] = { 0, 0, 0, 0 };
  unsigned long long s_[4] = { 0, 0, 0, 0 };
  long i = st->i, j = st->j;
  const unsigned char *r1 = st->r1, *r2 = st->r2;
  long n1 = st->n1, n2 = st->n2;
  unsigned int cutoff = st->cutoff;
  while (i < n1 || j < n2) {
    /* suspend when any active buffer is full */
    if ((st->active[0] && k_[0] >= cap) || (st->active[1] && k_[1] >= cap)
        || (st->active[2] && k_[2] >= cap)
        || (st->active[3] && k_[3] >= cap))
      break;
    unsigned long long w, wa = 0, wb = 0;
    unsigned int f1 = 0, f2 = 0, ca = 0, cb = 0;
    if (i < n1) rec_get (r1, i, &wa, &ca);
    if (j < n2) rec_get (r2, j, &wb, &cb);
    if (i < n1 && (j >= n2 || wa <= wb)) {
      w = wa; f1 = ca;
      if (j < n2 && wb == w) { f2 = cb; j++; }
      i++;
    } else {
      w = wb; f2 = cb; j++;
    }
    {
      unsigned int ge1 = f1 >= cutoff, ge2 = f2 >= cutoff;
      unsigned int p1 = f1 > 0, p2 = f2 > 0;
      if (st->active[0]) {
        unsigned int fr = pair_rule_freq (f1, f2, st->r_u, st->override_);
        if ((ge1 || ge2) && fr) {
          put_rec (bufs[0], k_[0], w, fr); k_[0]++; s_[0] += fr;
        }
      }
      if (st->active[1]) {
        unsigned int fr = pair_rule_freq (f1, f2, st->r_i, st->override_);
        if (p1 && p2 && ge1 && ge2 && fr) {
          put_rec (bufs[1], k_[1], w, fr); k_[1]++; s_[1] += fr;
        }
      }
      if (st->active[2]) {
        if (st->subtract) {
          if (p1 && p2 && (f1 == f2) && ge1) {
            put_rec (bufs[2], k_[2], w, f1); k_[2]++; s_[2] += f1;
          }
        } else {
          unsigned int fr = pair_rule_freq (f1, f2, st->r_d, st->override_);
          if (p1 && ge1 && !ge2 && fr) {
            put_rec (bufs[2], k_[2], w, fr); k_[2]++; s_[2] += fr;
          }
        }
      }
      if (st->active[3]) {
        unsigned int fr = pair_rule_freq (f2, f1, st->r_d, st->override_);
        if (p2 && ge2 && !ge1 && fr) {
          put_rec (bufs[3], k_[3], w, fr); k_[3]++; s_[3] += fr;
        }
      }
    }
  }
  st->i = i; st->j = j;
  int more = (i < n1 || j < n2);
  int t;
  for (t = 0; t < 4; t++) { n_out[t] = k_[t]; sums[t] = s_[t]; }
  return more;
}

void fgx_pair_stream_free (void *handle) { free (handle); }

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
