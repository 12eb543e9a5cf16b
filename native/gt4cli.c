/* gt4cli — native front-end for floor-bound CLI fast paths.
 *
 * The bin/ -S CPython launchers answer sub-second jobs with a ~60-75 ms
 * interpreter floor; the reference binary's whole wall for the same
 * jobs is 2-150 ms (round-3 VERDICT weak #4 / next #7).  One binary,
 * dispatched on basename(argv[0]) (hardlinked per tool by
 * tools/build_gt4cli.sh), runs the floor-bound surfaces natively:
 *
 *   glistcompare LIST -ss METHOD SIZE [--seed N] [-o NAME]
 *   glistcompare L1 L2 L3... -u|-i [--count_only] [-o NAME]  (>=3 lists)
 *   glistquery  L1 [L2...] --stat|--median|--gc|--distribution N
 *
 * mirroring pipelines/subset_fast.py, setops_stream.py and
 * list_stats_fast.py byte-for-byte (same kernels via dlopen of the
 * shared .so that native_build.py maintains, same header/writer layout,
 * same tmp+rename publish).  ANY deviation from the exact happy path —
 * unknown flag, parse surprise, missing/odd/stale file, word-length
 * mismatch, version surprise, index input where records are needed —
 * execs the matching Python launcher (bin/_<tool>.py), which owns every
 * piece of error chrome and every general case.  Reference semantics:
 * src/glistcompare.c:719-787 (subset), :500-717 (multi ops),
 * src/glistquery.c:798-911 (stats).
 */

#define _GNU_SOURCE
#include <dlfcn.h>
#include <fcntl.h>
#include <limits.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <time.h>
#include <unistd.h>

#define GT4_LIST_CODE ((uint32_t) (('G' << 24) | ('T' << 16) | ('4' << 8) | 'C'))
#define GT4_INDEX_CODE ((uint32_t) (('G' << 24) | ('T' << 16) | ('4' << 8) | 'I'))
#define WRITE_CHUNK (1 << 20)
#define MAX_FILES 1024          /* src/glistcompare.c:77 */

typedef struct {
  uint32_t code, vmaj, vmin, wlen;
  uint64_t n_words, total, list_start;
  uint32_t wb, cb;
} __attribute__((packed)) ListHeader;      /* formats/list_format._HEADER_4_4 */

typedef long (*fgx_subset_t) (const unsigned char *, long,
                              unsigned long long, int, unsigned long long,
                              long, unsigned char *, unsigned long long *);
typedef void *(*fgx_ms_start_t) (const unsigned char **, const long *, int,
                                 int, int, unsigned int, unsigned int);
typedef int (*fgx_ms_next_t) (void *, unsigned char *, long, long *,
                              unsigned long long *);
typedef void (*fgx_ms_free_t) (void *);
typedef void (*fgx_gc_t) (const unsigned char *, long,
                          unsigned long long *, unsigned long long *);
typedef void (*fgx_zipper_t) (const unsigned char *, long,
                              const unsigned long long *, long,
                              unsigned int *);
typedef long (*fgx_dumprec_t) (const unsigned char *, long, int,
                               unsigned char *);
typedef long (*fgx_extract_t) (const unsigned char *, long, int,
                               unsigned long long *);
typedef int (*fgx_sortpair_t) (unsigned long long *, unsigned long long *,
                               long, int);
typedef void (*fgx_batched_t) (const unsigned char *, long,
                               const unsigned long long *, long,
                               unsigned int *);
typedef void (*fgx_median_t) (const unsigned char *, long, unsigned int *,
                              unsigned int *, unsigned int *);
typedef void (*fgx_distro_t) (const unsigned char *, long,
                              unsigned long long, unsigned long long *);

static char repo_root[PATH_MAX];
static const char *tool;        /* "glistcompare" or "glistquery" */
static int g_argc;
static char **g_argv;

static void fallback_python (void)
{
  /* hand the ORIGINAL argv to the Python launcher, which owns all
   * chrome and general paths */
  char py[PATH_MAX + 64];
  char **nargv = malloc ((size_t) (g_argc + 4) * sizeof (char *));
  int i;
  if (!nargv) exit (1);
  snprintf (py, sizeof (py), "%s/bin/_%s.py", repo_root, tool);
  nargv[0] = "python3";
  nargv[1] = "-S";
  nargv[2] = "-u";
  nargv[3] = py;
  for (i = 1; i < g_argc; i++) nargv[3 + i] = g_argv[i];
  nargv[3 + g_argc] = NULL;
  execvp ("python3", nargv);
  exit (127);
}

#define FALLBACK() fallback_python ()

/* ---- whitelist helpers -------------------------------------------- */

static int is_decimal (const char *s)
{
  if (!*s || strlen (s) > 18) return 0;
  for (; *s; s++) if (*s < '0' || *s > '9') return 0;
  return 1;
}

/* ---- list input mapping ------------------------------------------- */

typedef struct {
  void *map;                    /* mmap base (NULL for empty lists) */
  size_t map_len;
  const unsigned char *recs;    /* 12-byte record stream */
  long n_words;
  uint64_t total;
  uint32_t wlen;
  uint32_t vmaj, vmin;
  int is_index;
} ListIn;

static const unsigned char empty_rec[12];

/* glistcompare-path open (subset_fast._open_list twin): plain v4.x
 * lists only, records mapped. Returns 0 ok, -1 fall back. */
static int open_list (const char *path, ListIn *li)
{
  ListHeader h;
  int fd = open (path, O_RDONLY);
  ssize_t got;
  struct stat st;
  uint64_t start, need;
  if (fd < 0) return -1;
  got = read (fd, &h, sizeof (h));
  if (got < (ssize_t) sizeof (h)) { close (fd); return -1; }
  if (h.code != GT4_LIST_CODE) { close (fd); return -1; }
  /* the CLI's _probe_source rejects other major versions with chrome
   * BEFORE the Python fast path can run — mirror by falling back */
  if (h.vmaj != 4) { close (fd); return -1; }
  start = h.list_start;
  if (h.vmin >= 3) {
    if (h.wb != 8 || h.cb != 4) { close (fd); return -1; }
  } else if (h.vmin == 0) {
    start = 40;
  }
  if (fstat (fd, &st) != 0) { close (fd); return -1; }
  need = start + 12u * h.n_words;
  if ((uint64_t) st.st_size < need) { close (fd); return -1; }
  li->wlen = h.wlen;
  li->vmaj = h.vmaj;
  li->vmin = h.vmin;
  li->n_words = (long) h.n_words;
  li->total = h.total;
  li->is_index = 0;
  if (h.n_words == 0) {
    li->map = NULL;
    li->map_len = 0;
    li->recs = empty_rec;
    close (fd);
    return 0;
  }
  li->map_len = (size_t) need;
  li->map = mmap (NULL, li->map_len, PROT_READ, MAP_PRIVATE, fd, 0);
  close (fd);
  if (li->map == MAP_FAILED) { li->map = NULL; return -1; }
  li->recs = (const unsigned char *) li->map + start;
  return 0;
}

/* glistquery-path header read (list_stats_fast._read_info twin):
 * handles pre-4.4 list headers and index headers (stats only).
 * map_records=0 leaves li->recs NULL (header-only --stat). */
static int read_info (const char *path, ListIn *li, int map_records)
{
  unsigned char head[72];
  uint32_t code, vmaj, vmin, wlen;
  uint64_t n_words, total, start;
  int fd = open (path, O_RDONLY);
  ssize_t got;
  if (fd < 0) return -1;
  got = read (fd, head, sizeof (head));
  if (got < 16) { close (fd); return -1; }
  memcpy (&code, head + 0, 4);
  memcpy (&vmaj, head + 4, 4);
  memcpy (&vmin, head + 8, 4);
  memcpy (&wlen, head + 12, 4);
  if (vmaj != 4) { close (fd); return -1; }  /* version chrome: Python */
  li->vmaj = vmaj; li->vmin = vmin; li->wlen = wlen;
  li->map = NULL; li->map_len = 0; li->recs = NULL;
  if (code == GT4_LIST_CODE) {
    li->is_index = 0;
    if (vmaj > 4 || (vmaj == 4 && vmin >= 4)) {
      uint32_t wb, cb;
      if (got < (ssize_t) sizeof (ListHeader)) { close (fd); return -1; }
      memcpy (&n_words, head + 16, 8);
      memcpy (&total, head + 24, 8);
      memcpy (&start, head + 32, 8);
      memcpy (&wb, head + 40, 4);
      memcpy (&cb, head + 44, 4);
      if (wb != 8 || cb != 4) { close (fd); return -1; }
    } else {
      if (got < 40) { close (fd); return -1; }
      memcpy (&n_words, head + 16, 8);
      memcpy (&total, head + 24, 8);
      memcpy (&start, head + 32, 8);
      /* only version 4.0 implies list_start == 40 (sizeof the 4_0
       * header); 4.1+ carries a stored list_start that must be
       * honored (word-map.c:198-210; same rule as open_list above) */
      if (vmin == 0) start = 40;
    }
    li->n_words = (long) n_words;
    li->total = total;
    {
      struct stat st;
      if (fstat (fd, &st) != 0
          || (uint64_t) st.st_size < start + 12u * n_words) {
        close (fd); return -1;
      }
    }
    if (map_records && n_words) {
      li->map_len = (size_t) (start + 12u * n_words);
      li->map = mmap (NULL, li->map_len, PROT_READ, MAP_PRIVATE, fd, 0);
      if (li->map == MAP_FAILED) { li->map = NULL; close (fd); return -1; }
      li->recs = (const unsigned char *) li->map + start;
    }
    close (fd);
    return 0;
  }
  if (code == GT4_INDEX_CODE) {
    uint64_t n_locs;
    if (got < 72) { close (fd); return -1; }
    li->is_index = 1;
    memcpy (&n_words, head + 16, 8);
    memcpy (&n_locs, head + 24, 8);
    li->n_words = (long) n_words;
    li->total = n_locs;
    close (fd);
    return 0;
  }
  close (fd);
  return -1;
}

/* ---- output writer (ListWriter 1 MB-chunk twin) ------------------- */

static int write_all (int fd, const unsigned char *p, size_t n)
{
  /* single write(2) calls >= 12 MB stall in dirty-page throttling on
   * this VM class (CLAUDE.md) — split at 1 MB like ListWriter */
  while (n) {
    size_t chunk = n > WRITE_CHUNK ? WRITE_CHUNK : n;
    ssize_t w = write (fd, p, chunk);
    if (w <= 0) return -1;
    p += w;
    n -= (size_t) w;
  }
  return 0;
}

static void put_header (unsigned char *b, uint32_t wlen, uint64_t n_words,
                        uint64_t total)
{
  ListHeader h;
  h.code = GT4_LIST_CODE; h.vmaj = 4; h.vmin = 2; h.wlen = wlen;
  h.n_words = n_words; h.total = total; h.list_start = sizeof (ListHeader);
  h.wb = 8; h.cb = 4;
  memcpy (b, &h, sizeof (h));
}

/* ---- kernel library ------------------------------------------------ */

static void *kernel_lib (void)
{
  static void *lib;
  char so[PATH_MAX + 64], src1[PATH_MAX + 64], src2[PATH_MAX + 64];
  struct stat sso, s1, s2;
  if (lib) return lib;
  snprintf (so, sizeof (so), "%s/native/libfastgt_exact.so", repo_root);
  snprintf (src1, sizeof (src1), "%s/native/listkernel.c", repo_root);
  snprintf (src2, sizeof (src2), "%s/native/fastgt_exact.c", repo_root);
  /* the Python side owns builds; a missing or stale .so means fall
   * back (python rebuilds it under the flock) */
  if (stat (so, &sso) != 0) return NULL;
  if (stat (src1, &s1) == 0 && s1.st_mtime > sso.st_mtime) return NULL;
  if (stat (src2, &s2) == 0 && s2.st_mtime > sso.st_mtime) return NULL;
  lib = dlopen (so, RTLD_NOW | RTLD_LOCAL);
  return lib;
}

static void *ksym (const char *name)
{
  void *lib = kernel_lib ();
  void *s = lib ? dlsym (lib, name) : NULL;
  if (!s) FALLBACK ();
  return s;
}

/* ==================================================================== */
/* glistcompare                                                         */
/* ==================================================================== */

static int main_glistcompare (int argc, char **argv)
{
  const char *files[MAX_FILES];
  int n_files = 0;
  int find_union = 0, find_intrsec = 0, find_subset = 0, count_only = 0;
  const char *outputname = "out";
  const char *method = "rand";
  unsigned long long subset_size = 0;
  long seed = -1;
  int i;

  for (i = 1; i < argc; i++) {
    const char *a = argv[i];
    if (a[0] != '-') {
      if (n_files >= MAX_FILES) FALLBACK ();  /* chrome */
      files[n_files++] = a;
    } else if (!strcmp (a, "-u") || !strcmp (a, "--union")) {
      find_union = 1;
    } else if (!strcmp (a, "-i") || !strcmp (a, "--intersection")) {
      find_intrsec = 1;
    } else if (!strcmp (a, "--count_only")) {
      count_only = 1;
    } else if (!strcmp (a, "-o") || !strcmp (a, "--outputname")) {
      /* `-o -u` swallows the -u with a warning (glistcompare.c:122-128)
       * — warning chrome is Python's */
      if (i + 1 >= argc || argv[i + 1][0] == '-') FALLBACK ();
      outputname = argv[++i];
    } else if (!strcmp (a, "-ss") || !strcmp (a, "--subset")) {
      find_subset = 1;
      if (i + 1 >= argc) FALLBACK ();
      method = argv[++i];
      if (strcmp (method, "rand") && strcmp (method, "rand_unique")
          && strcmp (method, "rand_weighted_unique")) FALLBACK ();
      if (i + 1 >= argc) FALLBACK ();
      /* python uses strtoll_u64 WITH end-check; only clean decimals
       * share a parse between the two, everything else is chrome */
      if (!is_decimal (argv[i + 1])) FALLBACK ();
      subset_size = strtoull (argv[++i], NULL, 10);
    } else if (!strcmp (a, "--seed")) {
      if (i + 1 >= argc) FALLBACK ();
      if (argv[i + 1][0] == '-') {
        if (!is_decimal (argv[i + 1] + 1)) FALLBACK ();
      } else if (!is_decimal (argv[i + 1])) FALLBACK ();
      seed = strtol (argv[++i], NULL, 10);
    } else {
      FALLBACK ();              /* any other flag: the general path */
    }
  }

  if (find_subset) {
    if (n_files != 1 || find_union || find_intrsec || count_only)
      FALLBACK ();
  } else if (find_union || find_intrsec) {
    /* 2-list ops use the pair zipper pipeline (different impl, same
     * bytes) — not re-implemented here */
    if (n_files < 3) FALLBACK ();
  } else {
    FALLBACK ();
  }

  if (seed == -1)
    seed = (long) (unsigned int) time (NULL);  /* glistcompare.c:229 */

  {
    ListIn in[MAX_FILES];
    uint32_t wlen;
    for (i = 0; i < n_files; i++)
      if (open_list (files[i], &in[i]) != 0) FALLBACK ();
    wlen = in[0].wlen;
    for (i = 1; i < n_files; i++)
      if (in[i].wlen != wlen) FALLBACK ();  /* mismatch chrome */

    if (find_subset) {
      /* unique-size-overflow chrome is Python's (glistcompare.c:296) */
      fgx_subset_t subset_fn = (fgx_subset_t) ksym ("fgx_subset");
      unsigned long long tot = 0;
      long m;
      unsigned char hdr[sizeof (ListHeader)];
      unsigned char *out;
      char out_path[PATH_MAX + 64], tmp[PATH_MAX + 80];
      int mi = !strcmp (method, "rand") ? 0
             : !strcmp (method, "rand_unique") ? 1 : 2;
      int fd;
      if (mi != 0 && subset_size > (unsigned long long) in[0].n_words)
        FALLBACK ();
      out = malloc (in[0].n_words > 0 ? 12u * (size_t) in[0].n_words : 12);
      if (!out) FALLBACK ();
      m = subset_fn (in[0].recs, in[0].n_words, in[0].total, mi,
                     subset_size, seed, out, &tot);
      snprintf (out_path, sizeof (out_path), "%s_subset_%u.list",
                outputname, wlen);
      snprintf (tmp, sizeof (tmp), "%s.tmp.%d", out_path, (int) getpid ());
      fd = open (tmp, O_WRONLY | O_CREAT | O_TRUNC, 0644);
      if (fd < 0) FALLBACK ();
      put_header (hdr, wlen, (uint64_t) m, tot);
      if (write_all (fd, hdr, sizeof (hdr)) != 0
          || write_all (fd, out, 12u * (size_t) m) != 0) {
        close (fd); unlink (tmp); exit (1);
      }
      close (fd);
      if (rename (tmp, out_path) != 0) { unlink (tmp); exit (1); }
      return 0;
    }

    /* multi union/intersection: union first, then intersection, as the
     * CLI dispatches (cli/glistcompare.py multi-file section) */
    {
      fgx_ms_start_t ms_start = (fgx_ms_start_t) ksym ("fgx_multi_stream_start");
      fgx_ms_next_t ms_next = (fgx_ms_next_t) ksym ("fgx_multi_stream_next");
      fgx_ms_free_t ms_free = (fgx_ms_free_t) ksym ("fgx_multi_stream_free");
      const unsigned char *streams[MAX_FILES];
      long lens[MAX_FILES];
      long cap = 1 << 20;
      unsigned char *buf = malloc (12u * (size_t) cap);
      int op;
      if (!buf) FALLBACK ();
      for (i = 0; i < n_files; i++) {
        streams[i] = in[i].recs;
        lens[i] = in[i].n_words;
      }
      for (op = 0; op < 2; op++) {
        int intersect = (op == 1);
        void *st;
        uint64_t n_words = 0, total = 0;
        unsigned char hdr[sizeof (ListHeader)];
        char out_path[PATH_MAX + 64], tmp[PATH_MAX + 80];
        int fd = -1, more;
        if (!(intersect ? find_intrsec : find_union)) continue;
        /* default rules: union ADD(1), intersection MIN(3)
         * (setops_stream._RINT; ops/setops.py defaults) */
        st = ms_start (streams, lens, n_files, intersect,
                       intersect ? 3 : 1, 1u, 1u);
        if (!st) FALLBACK ();
        if (!count_only) {
          snprintf (out_path, sizeof (out_path), "%s_%u_%s.list",
                    outputname, wlen, intersect ? "intrsec" : "union");
          snprintf (tmp, sizeof (tmp), "%s.tmp.%d", out_path,
                    (int) getpid ());
          fd = open (tmp, O_WRONLY | O_CREAT | O_TRUNC, 0644);
          if (fd < 0) { ms_free (st); FALLBACK (); }
          put_header (hdr, wlen, 0, 0);
          if (write_all (fd, hdr, sizeof (hdr)) != 0) {
            close (fd); unlink (tmp); exit (1);
          }
        }
        do {
          long m = 0;
          unsigned long long s_out = 0;
          more = ms_next (st, buf, cap, &m, &s_out);
          if (m) {
            if (fd >= 0 && write_all (fd, buf, 12u * (size_t) m) != 0) {
              close (fd); unlink (tmp); exit (1);
            }
            n_words += (uint64_t) m;
            total += s_out;
          }
        } while (more);
        ms_free (st);
        if (fd >= 0) {
          put_header (hdr, wlen, n_words, total);
          if (pwrite (fd, hdr, sizeof (hdr), 0) != (ssize_t) sizeof (hdr)) {
            close (fd); unlink (tmp); exit (1);
          }
          close (fd);
          if (rename (tmp, out_path) != 0) { unlink (tmp); exit (1); }
        }
        if (count_only)
          printf ("NUnique\t%llu\nNTotal\t%llu\n",
                  (unsigned long long) n_words, (unsigned long long) total);
      }
    }
    return 0;
  }
}

/* ==================================================================== */
/* glistquery (stat fast paths, list_stats_fast.py twin)                */
/* ==================================================================== */

static void stats_lines (const char *path, const ListIn *li)
{
  if (li->is_index)
    printf ("Index %s: built with glistmaker version %u.%u\n"
            "Wordlength\t%u\nNUnique\t%llu\nNTotal\t%llu\n",
            path, li->vmaj, li->vmin, li->wlen,
            (unsigned long long) li->n_words,
            (unsigned long long) li->total);
  else
    printf ("List %s: built with glistmaker version %u.%u\n"
            "Wordlength\t%u\nNUnique\t%llu\nNTotal\t%llu\n",
            path, li->vmaj, li->vmin, li->wlen,
            (unsigned long long) li->n_words,
            (unsigned long long) li->total);
}

/* glistquery -l fast path: both sides are sorted plain .lists, one
 * linear zipper + the native formatter (search_list nmm==0 branch,
 * pipelines/listquery.py — reference src/glistquery.c:702-717: prints
 * the QUERY list's counts for words found in the searched list). */
static int run_list_query (const ListIn *searched, const ListIn *query,
                           uint32_t k)
{
  fgx_zipper_t zipper = (fgx_zipper_t) ksym ("fgx_lookup_records_zipper");
  fgx_dumprec_t dumprec = (fgx_dumprec_t) ksym ("fgx_dump_records");
  long nq = query->n_words;
  unsigned long long *qw = malloc ((size_t) (nq > 0 ? nq : 1) * 8);
  unsigned int *cnt = malloc ((size_t) (nq > 0 ? nq : 1) * 4);
  long CH = 1 << 20;            /* records per format chunk */
  unsigned char *recbuf = malloc (12u * (size_t) CH);
  unsigned char *txt = malloc ((size_t) CH * (k + 12));
  long j, m = 0;
  if (!qw || !cnt || !recbuf || !txt) FALLBACK ();
  for (j = 0; j < nq; j++)
    memcpy (qw + j, query->recs + 12 * j, 8);
  zipper (searched->recs, searched->n_words, qw, nq, cnt);
  for (j = 0; j < nq; j++) {
    if (!cnt[j]) continue;
    memcpy (recbuf + 12 * m, query->recs + 12 * j, 12);
    if (++m == CH) {
      long nb = dumprec (recbuf, m, (int) k, txt);
      if (write_all (1, txt, (size_t) nb) != 0) exit (1);
      m = 0;
    }
  }
  if (m) {
    long nb = dumprec (recbuf, m, (int) k, txt);
    if (write_all (1, txt, (size_t) nb) != 0) exit (1);
  }
  return 0;
}

/* glistquery -f fast path: the clean-file shape — exact-k ACGT/acgt
 * tokens, one per line — batched through the native kernels
 * (search_query_file's fast path, pipelines/listquery.py; reference
 * src/glistquery.c:619-660). Prints the CANONICAL word and its count
 * (0 for absent words — min_freq defaults to 0) in input order.
 * Returns -1 to fall back (any token deviation). */
static int run_query_file (const ListIn *searched, const char *path,
                           uint32_t k)
{
  FILE *f = fopen (path, "rb");
  long fsz, n_lines = 0, i, j, m;
  unsigned char *data, *codes, *recbuf, *txt;
  unsigned long long *cw, *sw, *idx;
  unsigned int *cnt_sorted;
  fgx_extract_t extract;
  fgx_sortpair_t sortpair;
  fgx_batched_t batched;
  fgx_dumprec_t dumprec;
  if (!f) return -1;            /* missing-file chrome is Python's */
  fseek (f, 0, SEEK_END);
  fsz = ftell (f);
  fseek (f, 0, SEEK_SET);
  data = malloc ((size_t) fsz + 1);
  if (!data || (fsz && fread (data, 1, (size_t) fsz, f) != (size_t) fsz)) {
    fclose (f); free (data); return -1;
  }
  fclose (f);
  /* validate: every line is exactly k chars of ACGT/acgt */
  i = 0;
  while (i < fsz) {
    long e = i;
    while (e < fsz && data[e] != '\n') e++;
    if (e == i && e == fsz) break;      /* trailing empty tail */
    if (e - i != (long) k) { free (data); return -1; }
    for (j = i; j < e; j++) {
      unsigned char c = data[j];
      if (c != 'A' && c != 'C' && c != 'G' && c != 'T' && c != 'a'
          && c != 'c' && c != 'g' && c != 't') { free (data); return -1; }
    }
    n_lines++;
    i = e + 1;
  }
  if (n_lines == 0) { free (data); return 0; }  /* no output, rc 0 */

  extract = (fgx_extract_t) ksym ("fgx_extract_canonical");
  sortpair = (fgx_sortpair_t) ksym ("fgx_sort_pair_u64");
  batched = (fgx_batched_t) ksym ("fgx_lookup_records_batched");
  dumprec = (fgx_dumprec_t) ksym ("fgx_dump_records");

  /* k codes + one 255 separator per token -> one canonical word each */
  codes = malloc ((size_t) n_lines * (k + 1));
  cw = malloc ((size_t) n_lines * 8);
  sw = malloc ((size_t) n_lines * 8);
  idx = malloc ((size_t) n_lines * 8);
  cnt_sorted = malloc ((size_t) n_lines * 4);
  if (!codes || !cw || !sw || !idx || !cnt_sorted) FALLBACK ();
  m = 0;
  i = 0;
  while (i < fsz) {
    long e = i;
    while (e < fsz && data[e] != '\n') e++;
    if (e == i && e == fsz) break;
    for (j = i; j < e; j++) {
      unsigned char c = data[j];
      codes[m++] = (unsigned char) ((c == 'A' || c == 'a') ? 0
                   : (c == 'C' || c == 'c') ? 1
                   : (c == 'G' || c == 'g') ? 2 : 3);
    }
    codes[m++] = 255;
    i = e + 1;
  }
  if (extract (codes, m, (int) k, cw) != n_lines) FALLBACK ();
  free (data);
  free (codes);
  memcpy (sw, cw, (size_t) n_lines * 8);
  for (j = 0; j < n_lines; j++) idx[j] = (unsigned long long) j;
  if (sortpair (sw, idx, n_lines, (int) (2 * k))) FALLBACK ();
  batched (searched->recs, searched->n_words, sw, n_lines, cnt_sorted);
  {
    long CH = 1 << 20;
    unsigned int *cnt = malloc ((size_t) n_lines * 4);
    long w = 0;
    recbuf = malloc (12u * (size_t) (n_lines < CH ? n_lines : CH));
    txt = malloc ((size_t) (n_lines < CH ? n_lines : CH) * (k + 12));
    if (!cnt || !recbuf || !txt) FALLBACK ();
    for (j = 0; j < n_lines; j++) cnt[idx[j]] = cnt_sorted[j];
    /* min_freq 0, max_freq UINT_MAX: every query prints (absent -> 0) */
    for (j = 0; j < n_lines; j++) {
      memcpy (recbuf + 12 * w, &cw[j], 8);
      memcpy (recbuf + 12 * w + 8, &cnt[j], 4);
      if (++w == CH || j == n_lines - 1) {
        long nb = dumprec (recbuf, w, (int) k, txt);
        if (write_all (1, txt, (size_t) nb) != 0) exit (1);
        w = 0;
      }
    }
  }
  return 0;
}

static int main_glistquery (int argc, char **argv)
{
  const char *files[MAX_FILES];
  int n_files = 0;
  const char *command = NULL;
  const char *query_list = NULL;
  const char *query_file = NULL;
  long long distro = 0;
  int i;

  for (i = 1; i < argc; i++) {
    const char *a = argv[i];
    if (a[0] != '-') {
      if (n_files >= MAX_FILES) FALLBACK ();
      files[n_files++] = a;
    } else if (!strcmp (a, "--stats") || !strcmp (a, "--stat")
               || !strcmp (a, "-stat")) {
      command = "stats";
    } else if (!strcmp (a, "--median") || !strcmp (a, "-median")) {
      command = "median";
    } else if (!strcmp (a, "-gc") || !strcmp (a, "--gc")) {
      command = "gc";
    } else if (!strcmp (a, "-l") || !strcmp (a, "--listfile")) {
      if (i + 1 >= argc || query_list) FALLBACK ();
      query_list = argv[++i];
    } else if (!strcmp (a, "-f") || !strcmp (a, "--queryfile")) {
      if (i + 1 >= argc || query_file) FALLBACK ();
      query_file = argv[++i];
    } else if (!strcmp (a, "--distribution")
               || !strcmp (a, "-distribution")) {
      if (i + 1 >= argc || !is_decimal (argv[i + 1])) FALLBACK ();
      distro = strtoll (argv[++i], NULL, 10);
      command = "distro";
    } else {
      FALLBACK ();              /* -q/-f/-D/anything else: Python */
    }
  }
  if (query_list) {
    ListIn searched, query;
    if (command || query_file || n_files != 1) FALLBACK ();
    if (read_info (files[0], &searched, 1) != 0) FALLBACK ();
    if (read_info (query_list, &query, 1) != 0) FALLBACK ();
    /* index inputs, wordlength-mismatch chrome: Python's. Corrupt
     * word lengths (0 or > 32) would drive fgx_dump_records' shifts
     * into UB — same guard as the -f path. */
    if (searched.is_index || query.is_index
        || searched.wlen != query.wlen
        || searched.wlen == 0 || searched.wlen > 32) FALLBACK ();
    return run_list_query (&searched, &query, searched.wlen);
  }
  if (query_file) {
    ListIn searched;
    int rc;
    if (command || n_files != 1) FALLBACK ();
    if (read_info (files[0], &searched, 1) != 0) FALLBACK ();
    if (searched.is_index || searched.wlen == 0
        || searched.wlen > 32) FALLBACK ();
    rc = run_query_file (&searched, query_file, searched.wlen);
    if (rc < 0) FALLBACK ();    /* any token deviation: Python path */
    return rc;
  }
  if (!command || n_files == 0) FALLBACK ();

  {
    ListIn in[MAX_FILES];
    uint32_t wlen = 0;
    int need_records = strcmp (command, "stats") != 0;
    for (i = 0; i < n_files; i++) {
      if (read_info (files[i], &in[i], need_records) != 0) FALLBACK ();
      if (in[i].is_index && need_records) FALLBACK ();
      if (!wlen) wlen = in[i].wlen;
      else if (in[i].wlen != wlen) FALLBACK ();  /* mismatch chrome */
    }

    if (!strcmp (command, "stats")) {
      for (i = 0; i < n_files; i++)
        stats_lines (files[i], &in[i]);
      return 0;
    }
    if (!strcmp (command, "median")) {
      fgx_median_t med_fn = (fgx_median_t) ksym ("fgx_median_rec");
      for (i = 0; i < n_files; i++) {
        unsigned int mn = 0, mx = 0, md = 0;
        med_fn (in[i].recs, in[i].n_words, &mn, &mx, &md);
        stats_lines (files[i], &in[i]);
        if (in[i].n_words)
          printf ("Min %u Max %u Median %u Average %.2f\n", mn, mx, md,
                  (double) in[i].total / (double) in[i].n_words);
        else
          /* C prints 0.0/0 as "-nan" on x86 (src/glistquery.c:868) */
          printf ("Min %u Max %u Median %u Average -nan\n", mn, mx, md);
      }
      return 0;
    }
    if (!strcmp (command, "distro")) {
      fgx_distro_t dis_fn = (fgx_distro_t) ksym ("fgx_distro_rec");
      long long max_count = distro + 1;
      unsigned long long *hist;
      if (max_count < 1 || max_count > (1LL << 31)) FALLBACK ();
      hist = calloc ((size_t) max_count + 2, sizeof (*hist));
      if (!hist) FALLBACK ();
      for (i = 0; i < n_files; i++) {
        long long j;
        memset (hist, 0, ((size_t) max_count + 2) * sizeof (*hist));
        if (in[i].n_words)
          dis_fn (in[i].recs, in[i].n_words,
                  (unsigned long long) max_count + 1, hist);
        for (j = 1; j <= max_count; j++)
          printf ("%lld\t%llu\n", j, hist[j]);
      }
      free (hist);
      return 0;
    }
    if (!strcmp (command, "gc")) {
      fgx_gc_t gc_fn = (fgx_gc_t) ksym ("fgx_gc_rec");
      for (i = 0; i < n_files; i++) {
        unsigned long long gt = 0, ct = 0;
        if (in[i].n_words)
          gc_fn (in[i].recs, in[i].n_words, &gt, &ct);
        if (ct == 0 || wlen == 0)
          /* x86 0.0/0.0 sets the NaN sign bit; C %g prints "-nan" */
          printf ("GC\t-nan\n");
        else
          printf ("GC\t%g\n",
                  (double) gt / ((double) ct * (double) wlen));
      }
      return 0;
    }
    FALLBACK ();
    return 127;  /* unreachable: FALLBACK execs or exits */
  }
}

/* ==================================================================== */

int main (int argc, char **argv)
{
  char link[PATH_MAX];
  ssize_t ln;
  const char *base;

  g_argc = argc;
  g_argv = argv;

  /* repo root = dir(dir(/proc/self/exe)) — binary lives in .gt4cli/;
   * the tool is the binary's own (hardlink) name */
  ln = readlink ("/proc/self/exe", link, sizeof (link) - 1);
  if (ln <= 0) exit (127);
  link[ln] = 0;
  base = strrchr (link, '/');
  base = base ? base + 1 : link;
  if (!strcmp (base, "glistquery")) tool = "glistquery";
  else tool = "glistcompare";
  {
    char *s = strrchr (link, '/');
    if (s) *s = 0;
    s = strrchr (link, '/');
    if (s) *s = 0;
    snprintf (repo_root, sizeof (repo_root), "%s", link);
  }

  if (!strcmp (tool, "glistquery"))
    return main_glistquery (argc, argv);
  return main_glistcompare (argc, argv);
}
