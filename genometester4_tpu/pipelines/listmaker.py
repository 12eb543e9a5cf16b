"""glistmaker equivalent: FASTA/FASTQ → sorted .list.

Reference pipeline (src/glistmaker.c:139-353, SURVEY.md §3.1): split files
into blocks → per-thread tables → radix sort → k-way merge of tmp lists.

TPU-native pipeline:
  host parse (vectorized)          genometester4_tpu.io.fasta
  → fixed-size padded code chunks  (static shapes; one XLA compile)
  → device extract+canonicalize    ops.kmers.extract_kmers
  → device sort + segment count    ops.sortcount.count_unique
  → per-chunk sorted uniques back to host (u64)
  → prefix-partitioned device merges, streamed to the .list writer

The prefix partition step plays the role of the reference's tmp-file
k-way merge (src/set-operations.c:40-129): per-chunk results are already
sorted, so splitting every shard at the same word boundaries lets each
bucket merge independently and the concatenation of bucket outputs is
globally sorted — the same trick that makes multi-chip sharding produce
byte-identical lists (SURVEY.md §7).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from genometester4_tpu.formats.list_format import ListWriter, ListHeader
from genometester4_tpu.io.fasta import load_file
from genometester4_tpu.ops.encode import join_u64, split_u64
from genometester4_tpu.ops.kmers import extract_kmers
from genometester4_tpu.ops.sortcount import count_unique

# Default chunk: 2^24 bases (~16.8M windows) keeps sort working sets well
# inside a v5e's HBM while amortizing dispatch overhead.
DEFAULT_CHUNK_BASES = 1 << 24
# Target size of one merge bucket on device.
DEFAULT_MERGE_BUCKET = 1 << 25


def _make_chunk_fn(k: int, canonical: bool = True):
    """Fused extract→count for one padded chunk."""

    @jax.jit
    def run(codes):
        hi, lo, valid = extract_kmers(codes, k, canonical=canonical)
        ones = jnp.ones(hi.shape, jnp.uint32)
        return count_unique(hi, lo, ones, valid)

    return run


def pad_pow2_chunk(chunk: np.ndarray, cap_limit: int) -> np.ndarray:
    """Pad a chunk with invalid bytes up to the next power of two.

    Keeps compiled-shape count at ~log2(cap_limit) instead of padding
    tiny inputs to the full chunk size (a 10 KB FASTA must not compile
    and sort a 16 Mi-element buffer).
    """
    cap = 1 << max(10, math.ceil(math.log2(max(len(chunk), 2))))
    cap = min(cap, cap_limit)
    if len(chunk) < cap:
        chunk = np.concatenate(
            [chunk, np.full(cap - len(chunk), 255, np.uint8)])
    return chunk


def count_chunks(codes: np.ndarray, k: int, chunk_bases: int = DEFAULT_CHUNK_BASES,
                 canonical: bool = True):
    """Yield per-chunk sorted unique (words u64, counts u32) numpy arrays.

    ``codes`` is the packed uint8 code array from the parser. Chunks
    overlap by k-1 bases so no window is lost at a seam; the final chunk
    is padded with 255 (invalid) bytes to the next power of two,
    preserving a small set of static shapes.
    """
    run = _make_chunk_fn(k, canonical)
    n = len(codes)
    step = chunk_bases - (k - 1)
    if n <= k - 1:
        return
    for start in range(0, max(n - (k - 1), 1), step):
        chunk = pad_pow2_chunk(codes[start:start + chunk_bases], chunk_bases)
        uhi, ulo, counts, n_uniq = run(jnp.asarray(chunk))
        m = int(n_uniq)
        if m == 0:
            continue
        uhi = np.asarray(uhi[:m])
        ulo = np.asarray(ulo[:m])
        yield join_u64(uhi, ulo), np.asarray(counts[:m], dtype=np.uint32)


def _pad_pow2(x: np.ndarray, size: int, fill=0):
    out = np.full(size, fill, dtype=x.dtype)
    out[: len(x)] = x
    return out


@dataclass
class _MergeKernelCache:
    fns: dict = None

    def get(self, capacity: int):
        if self.fns is None:
            self.fns = {}
        if capacity not in self.fns:
            @jax.jit
            def merge(hi, lo, counts, valid):
                return count_unique(hi, lo, counts, valid)
            self.fns[capacity] = merge
        return self.fns[capacity]


_merge_cache = _MergeKernelCache()


def merge_sorted_shards(shards, target_bucket: int = DEFAULT_MERGE_BUCKET):
    """Merge sorted (words, counts) shards into one global sorted stream.

    Splits the u64 key space into equal prefix buckets sized so each
    bucket's total input fits on device, merges each bucket with the
    sort+segment-sum kernel, and yields sorted (words, counts) buckets in
    ascending order. Yielded buckets concatenate into the global sorted
    unique list.
    """
    shards = [s for s in shards if len(s[0])]
    if not shards:
        return
    total = sum(len(w) for w, _ in shards)
    n_buckets = 1 << max(0, math.ceil(math.log2(max(1, total / target_bucket))))
    # bucket b owns words in [b, b+1) * 2^64 / n_buckets
    if n_buckets > 1:
        bounds = (np.arange(1, n_buckets, dtype=np.uint64)
                  * np.uint64(2 ** 64 // n_buckets))
    else:
        bounds = np.empty(0, dtype=np.uint64)
    # partition every shard at identical word boundaries
    splits = [np.searchsorted(w, bounds) for w, _ in shards]
    for b in range(n_buckets):
        parts_w, parts_c = [], []
        for (w, c), sp in zip(shards, splits):
            a = 0 if b == 0 else sp[b - 1]
            z = len(w) if b == n_buckets - 1 else sp[b]
            if z > a:
                parts_w.append(w[a:z])
                parts_c.append(c[a:z])
        if not parts_w:
            continue
        cat_w = np.concatenate(parts_w)
        cat_c = np.concatenate(parts_c)
        if len(parts_w) == 1:
            # single source: already sorted and unique
            yield cat_w, cat_c
            continue
        cap = 1 << max(10, math.ceil(math.log2(len(cat_w))))
        hi, lo = split_u64(_pad_pow2(cat_w, cap))
        counts = _pad_pow2(cat_c, cap)
        valid = np.zeros(cap, bool)
        valid[: len(cat_w)] = True
        merge = _merge_cache.get(cap)
        uhi, ulo, ucounts, n_uniq = merge(
            jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(counts),
            jnp.asarray(valid))
        m = int(n_uniq)
        yield join_u64(np.asarray(uhi[:m]), np.asarray(ulo[:m])), np.asarray(
            ucounts[:m], dtype=np.uint32)


def make_list(input_files, word_length: int, output_path: str,
              min_count: int = 1, max_count: int = 0xFFFFFFFF,
              chunk_bases: int = DEFAULT_CHUNK_BASES,
              canonical: bool = True) -> ListHeader:
    """Full glistmaker run: files → .list at ``output_path``."""
    shards = []
    for path in input_files:
        parsed = load_file(path)
        shards.extend(count_chunks(parsed.codes, word_length, chunk_bases,
                                   canonical=canonical))
    with ListWriter(output_path, word_length) as w:
        for words, counts in merge_sorted_shards(shards):
            if min_count > 1 or max_count != 0xFFFFFFFF:
                keep = counts >= np.uint32(min_count)
                if max_count != 0xFFFFFFFF:
                    keep &= counts <= np.uint32(max_count)
                words, counts = words[keep], counts[keep]
            w.append(words, counts)
    hdr = ListHeader(word_length, w.n_words, w.total_count)
    return hdr
