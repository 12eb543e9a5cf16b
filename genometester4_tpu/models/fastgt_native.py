"""ctypes bindings for the exact-math FastGT kernel library.

The library (native/fastgt_exact.c) reproduces gmer_caller's numerics
bit-for-bit: the glibc rand() training subsample, the float32 Nelder-Mead
simplex, and the mixed float/double genotype posterior
(reference: src/gmer_caller.c, src/genotypes.c, src/binomial.c,
src/simplex.c).  Compiled on first use into native/ next to the source.
"""

from __future__ import annotations

import ctypes
import threading

import numpy as np

from genometester4_tpu import native_build

_lock = threading.Lock()
_lib = None

N_GENOTYPES = 15


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        native_build.ensure_built()
        lib = ctypes.CDLL(native_build.SO_PATH)
        # no eager fgx_init(): the O(N^2) reference-rounding log tables
        # build lazily inside the C gateways (fgx_dbinom/fgx_dnbinom_mu)
        # so pure list-path CLI runs skip the ~90 ms
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.fgx_srand.argtypes = [ctypes.c_uint]
        lib.fgx_rand_skip.argtypes = [ctypes.c_ulong]
        lib.fgx_rand_skip.restype = None
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
        lib.fgx_sw_batch.restype = None
        lib.fgx_sw_batch.argtypes = [
            i8p, ctypes.c_int, i8p, ctypes.c_int, ctypes.c_int,
            i16p, i8p, i8p, i16p, i8p]
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        lib.fgx_pair_align.restype = ctypes.c_long
        lib.fgx_pair_align.argtypes = [
            u64p, u32p, ctypes.c_long, u64p, u32p, ctypes.c_long,
            u64p, u32p, u32p]
        lp = ctypes.POINTER(ctypes.c_long)
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        u64sp = ctypes.POINTER(ctypes.c_ulonglong)
        u64sp2 = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        lib.fgx_pair_ops_rec.restype = None
        lib.fgx_pair_ops_rec.argtypes = [
            u8p, ctypes.c_long, u8p, ctypes.c_long,
            ctypes.c_int, ctypes.c_uint, ctypes.c_uint, ctypes.c_int,
            u8p, lp, u64sp, u8p, lp, u64sp, u8p, lp, u64sp,
            u8p, lp, u64sp]
        lib.fgx_pair_ops.restype = None
        lib.fgx_pair_ops.argtypes = [
            u64p, u32p, ctypes.c_long, u64p, u32p, ctypes.c_long,
            ctypes.c_int, ctypes.c_uint, ctypes.c_uint, ctypes.c_int,
            u64p, u32p, lp, u64p, u32p, lp, u64p, u32p, lp,
            u64p, u32p, lp]
        lib.fgx_mm_filter.restype = ctypes.c_long
        lib.fgx_mm_filter.argtypes = [
            u64p, ctypes.c_long, ctypes.c_int,      # cand, n, k
            u64p, ctypes.c_long,                    # masks
            u64p, ctypes.c_long,                    # mw (sorted)
            u64p, ctypes.c_long,                    # qw (sorted; dummy ok)
            ctypes.c_uint, ctypes.c_int,            # cutoff, subtract
            u8p]                                    # alive (in-out)
        i64p_ = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.fgx_call_batch.restype = None
        lib.fgx_call_batch.argtypes = [
            i64p_, i64p_, i32p, ctypes.c_long, ctypes.c_int, i8p,
            ctypes.c_double, ctypes.c_double, ctypes.c_long,
            ctypes.c_long, ctypes.c_double, ctypes.c_long, ctypes.c_int,
            ctypes.c_double, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            i32p, i32p, i32p, f64p, f64p, f64p, f64p,
            i32p, i32p, f64p, f64p, f64p, f64p]
        lib.fgx_group_merge.restype = ctypes.c_long
        lib.fgx_group_merge.argtypes = [
            u64p, u64p, i64p_, i64p_, i64p_, ctypes.c_long]
        lib.fgx_group_phase.restype = ctypes.c_long
        lib.fgx_group_phase.argtypes = [
            u64p, u64p,                       # tags, masks (group slots)
            ctypes.POINTER(ctypes.c_long),    # sizes
            ctypes.POINTER(ctypes.c_long),    # dirs
            ctypes.POINTER(ctypes.c_long),    # group_of
            u64p, u64p,                       # read_tags, read_masks
            ctypes.POINTER(ctypes.c_byte),    # ga
            ctypes.c_long, ctypes.c_long,     # na, p_len
            ctypes.POINTER(ctypes.c_byte),    # aligned_ref
            ctypes.POINTER(ctypes.c_ubyte),   # known
            ctypes.POINTER(ctypes.c_long),    # divergent
            ctypes.POINTER(ctypes.c_long),    # min_cov
            ctypes.POINTER(ctypes.c_long),    # max_cov
            ctypes.POINTER(ctypes.c_long),    # compat_n
            ctypes.POINTER(ctypes.c_byte),    # consensus
            ctypes.c_int, ctypes.c_int,       # max_groups, require_both
            ctypes.c_long, ctypes.c_long,     # min_group_coverage/size
            ctypes.c_long, ctypes.c_long,     # max_group_(r)divergence
            ctypes.c_float,                   # min_group_rsize
            ctypes.POINTER(ctypes.c_ubyte),   # included
            ctypes.POINTER(ctypes.c_long),    # good_groups
            ctypes.POINTER(ctypes.c_long),    # n_good_out
            ctypes.c_int, ctypes.c_uint,      # debug_groups, chr
            ctypes.POINTER(ctypes.c_longlong),  # ref_pos
            ctypes.POINTER(ctypes.c_ubyte),   # snv_ref_c
            ctypes.POINTER(ctypes.c_ubyte),   # snv_alt_c
            ctypes.POINTER(ctypes.c_char_p)]  # read_names (-DG2, or None)
        lib.fgx_gapped_alignment.restype = ctypes.c_long
        lib.fgx_gapped_alignment.argtypes = [
            i8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i16p,
            ctypes.c_long, ctypes.c_int, i32p, ctypes.c_int,
            i32p, i32p, i16p, i64p_, i64p_]
        lib.fgx_sw_align_region8.restype = ctypes.c_long
        lib.fgx_sw_align_region8.argtypes = [
            i8p, ctypes.c_int, i8p, ctypes.c_long, ctypes.c_int, i32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_long, i32p, i32p, ctypes.POINTER(ctypes.c_int),
            i32p]                         # stats (int[B*6], may be None)
        lib.fgx_sw_align_region.restype = ctypes.c_long
        lib.fgx_sw_align_region.argtypes = [
            i8p, ctypes.c_int, i8p, ctypes.c_long, ctypes.c_int, i32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_long, i32p, i32p, ctypes.POINTER(ctypes.c_int),
            i16p, i8p, i8p, i16p, i8p, i32p, i32p]
        lib.fgx_sw_traceback.restype = ctypes.c_int
        lib.fgx_sw_traceback.argtypes = [
            i16p, i8p, i8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i32p, i32p]
        lib.fgx_poisson.restype = ctypes.c_double
        lib.fgx_poisson.argtypes = [ctypes.c_uint, ctypes.c_double]
        lib.fgx_allele_freq.restype = ctypes.c_float
        lib.fgx_allele_freq.argtypes = [u16p, ctypes.c_uint]
        lib.fgx_train_model.restype = ctypes.c_int
        lib.fgx_train_model.argtypes = [
            u16p, ctypes.c_uint, ctypes.c_uint, ctypes.c_uint, f32p,
            ctypes.POINTER(ctypes.c_float), ctypes.c_uint, ctypes.c_uint,
            ctypes.c_uint]
        lib.fgx_genotype_batch.argtypes = [
            u16p, ctypes.c_uint, ctypes.c_float, f32p, f64p, f64p, u32p]
        # list-engine kernels (native/listkernel.c)
        lib.fgx_extract_canonical.restype = ctypes.c_long
        lib.fgx_extract_canonical.argtypes = [
            u8p, ctypes.c_long, ctypes.c_int, u64p]
        lib.fgx_extract_forward.restype = ctypes.c_long
        lib.fgx_extract_forward.argtypes = [
            u8p, ctypes.c_long, ctypes.c_int, u64p]
        lib.fgx_count_kmers_list.restype = ctypes.c_long
        lib.fgx_count_kmers_list.argtypes = [
            u8p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint, ctypes.c_uint, u8p, u64sp]
        lib.fgx_format_node_counts.restype = ctypes.c_long
        lib.fgx_format_node_counts.argtypes = [
            u8p, ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong), u64sp2,
            ctypes.c_long, u8p]
        lib.fgx_index_hits.restype = ctypes.c_long
        lib.fgx_index_hits.argtypes = [
            u8p, ctypes.c_long, ctypes.c_int,
            u64p, u32p, ctypes.c_long,
            u32p, i64p_, u8p, ctypes.POINTER(ctypes.c_longlong)]
        lib.fgx_index_hits_batched.restype = ctypes.c_long
        lib.fgx_index_hits_batched.argtypes = lib.fgx_index_hits.argtypes
        lib.fgx_extract_canonical_posdir.restype = ctypes.c_long
        lib.fgx_extract_canonical_posdir.argtypes = [
            u8p, ctypes.c_long, ctypes.c_int, u64p, i64p_, u8p]
        lib.fgx_sorted_occurrences.restype = None
        lib.fgx_sorted_occurrences.argtypes = [
            u64p, ctypes.c_long, u64p, ctypes.c_long, u64p]
        lib.fgx_lookup_records_batched.restype = None
        lib.fgx_lookup_records_batched.argtypes = [
            u8p, ctypes.c_long, u64p, ctypes.c_long, u32p]
        lib.fgx_lookup_records_zipper.restype = None
        lib.fgx_lookup_records_zipper.argtypes = \
            lib.fgx_lookup_records_batched.argtypes
        lib.fgx_index_kmer_records.restype = ctypes.c_long
        lib.fgx_index_kmer_records.argtypes = [
            u64p, ctypes.c_long, ctypes.c_uint, ctypes.c_uint, u64p,
            ctypes.POINTER(ctypes.c_ulonglong)]
        lib.fgx_sort_pair_u64.restype = ctypes.c_int
        lib.fgx_sort_pair_u64.argtypes = [
            u64p, u64p, ctypes.c_long, ctypes.c_int]
        lp_ = ctypes.POINTER(ctypes.c_long)
        lib.fgx_parse_fasta_slab.restype = ctypes.c_long
        lib.fgx_parse_fasta_slab.argtypes = [
            u8p, ctypes.c_long, ctypes.c_int, u8p, lp_, lp_, lp_]
        i64b = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.fgx_parse_fastq_slab.restype = ctypes.c_long
        lib.fgx_parse_fastq_slab.argtypes = [
            u8p, ctypes.c_long, u8p, lp_, i64b, i64b, lp_, lp_]
        i64a = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.fgx_parse_text_db.restype = ctypes.c_long
        lib.fgx_parse_text_db.argtypes = [
            u8p, ctypes.c_long, ctypes.c_long, i64a, i64a, i64a, u64p,
            lp_, ctypes.POINTER(ctypes.c_int)]
        lib.fgx_sce_start.restype = ctypes.c_void_p
        lib.fgx_sce_start.argtypes = [u64p, ctypes.c_long, ctypes.c_int]
        lib.fgx_sce_next.restype = ctypes.c_long
        lib.fgx_sce_next.argtypes = [
            ctypes.c_void_p, ctypes.c_uint, ctypes.c_uint, u8p,
            ctypes.c_long, u64sp]
        lib.fgx_sce_free.restype = None
        lib.fgx_sce_free.argtypes = [ctypes.c_void_p]
        lib.fgx_sort_u64.restype = ctypes.c_int
        lib.fgx_sort_u64.argtypes = [u64p, ctypes.c_long, ctypes.c_int]
        lib.fgx_sort_count_emit.restype = ctypes.c_long
        lib.fgx_sort_count_emit.argtypes = [
            u64p, ctypes.c_long, ctypes.c_int,
            ctypes.c_uint, ctypes.c_uint, u8p, u64sp]
        lib.fgx_count_kmers_arrays.restype = ctypes.c_long
        lib.fgx_count_kmers_arrays.argtypes = [
            u8p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            u64p, u32p, u64sp]
        lib.fgx_dump_index_locations_raw.restype = ctypes.c_long
        lib.fgx_dump_index_locations_raw.argtypes = [
            u64p, ctypes.c_long, ctypes.c_ulonglong, ctypes.c_int, u64p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
        lib.fgx_subset.restype = ctypes.c_long
        lib.fgx_subset.argtypes = [
            u8p, ctypes.c_long, ctypes.c_ulonglong, ctypes.c_int,
            ctypes.c_ulonglong, ctypes.c_long, u8p, u64sp]
        lib.fgx_dump_records.restype = ctypes.c_long
        lib.fgx_dump_records.argtypes = [u8p, ctypes.c_long, ctypes.c_int,
                                         u8p]
        lib.fgx_gc_rec.restype = None
        lib.fgx_gc_rec.argtypes = [u8p, ctypes.c_long, u64sp, u64sp]
        lib.fgx_pair_stream_start.restype = ctypes.c_void_p
        lib.fgx_pair_stream_start.argtypes = [
            u8p, ctypes.c_long, u8p, ctypes.c_long,
            ctypes.c_int, ctypes.c_uint, ctypes.c_uint, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.fgx_pair_stream_next.restype = ctypes.c_int
        lib.fgx_pair_stream_next.argtypes = [
            ctypes.c_void_p, u8p, u8p, u8p, u8p, ctypes.c_long, i64p, u64p]
        lib.fgx_pair_stream_free.restype = None
        lib.fgx_pair_stream_free.argtypes = [ctypes.c_void_p]
        i64c = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        u64c = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")

        def _opt(p):
            class _O:
                @classmethod
                def from_param(cls, v):
                    return None if v is None else p.from_param(v)
            return _O
        lib.fgx_pair_ops_buckets.restype = None
        lib.fgx_pair_ops_buckets.argtypes = [
            u8p, u8p, i64c, i64c, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint, ctypes.c_uint, ctypes.c_int,
            _opt(u8p), _opt(i64c), _opt(u64c),
            _opt(u8p), _opt(i64c), _opt(u64c),
            _opt(u8p), _opt(i64c), _opt(u64c),
            _opt(u8p), _opt(i64c), _opt(u64c)]
        lib.fgx_multi_stream_start.restype = ctypes.c_void_p
        lib.fgx_multi_stream_start.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_long), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_uint, ctypes.c_uint]
        lib.fgx_multi_stream_next.restype = ctypes.c_int
        lib.fgx_multi_stream_next.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_long, lp_, u64sp]
        lib.fgx_multi_stream_free.restype = None
        lib.fgx_multi_stream_free.argtypes = [ctypes.c_void_p]
        lib.fgx_merge_rec_shards.restype = ctypes.c_long
        lib.fgx_merge_rec_shards.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_long), ctypes.c_int,
            ctypes.c_uint, ctypes.c_uint, u8p, u64sp]
        _lib = lib
        return lib


def srand(seed: int):
    get_lib().fgx_srand(seed)


def rand_skip(n: int):
    """Advance the glibc rand() stream by n draws."""
    if n:
        get_lib().fgx_rand_skip(n)


def poisson(k: int, lam: float) -> float:
    return get_lib().fgx_poisson(k, lam)


def allele_freq(counts: np.ndarray) -> float:
    counts = np.ascontiguousarray(counts, np.uint16)
    return get_lib().fgx_allele_freq(counts, len(counts) // 2)


def train_model(counts: np.ndarray, max_training: int, nruns: int,
                params: np.ndarray, mul: int, nthreads: int,
                debug: int = 0):
    """Train 7 params in place; returns (trained_ok, pB).

    ``counts`` is a flat uint16 [a0,b0,a1,b1,...] array; ``params`` a
    float32[7] updated in place like the reference's v[]
    (src/gmer_caller.c:225-347).
    """
    counts = np.ascontiguousarray(counts, np.uint16)
    assert params.dtype == np.float32 and params.flags.c_contiguous
    pb = ctypes.c_float(0)
    ok = get_lib().fgx_train_model(counts, len(counts) // 2, max_training,
                                   nruns, params, ctypes.byref(pb), mul,
                                   nthreads, debug)
    return bool(ok), pb.value


def genotype_batch(counts: np.ndarray, pB: float, params: np.ndarray):
    """Posterior for every (a,b) pair: returns (a[n,15], sum[n], best[n])."""
    counts = np.ascontiguousarray(counts, np.uint16)
    n = len(counts) // 2
    out_a = np.empty((n, N_GENOTYPES), np.float64)
    out_sum = np.empty(n, np.float64)
    out_best = np.empty(n, np.uint32)
    get_lib().fgx_genotype_batch(counts, n, pB,
                                 np.ascontiguousarray(params, np.float32),
                                 out_a, out_sum, out_best)
    return out_a, out_sum, out_best
