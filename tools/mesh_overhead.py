"""Measure the SPMD mesh programs' overhead vs the direct device paths
on the real chip (round-3 VERDICT missing #4; round-5 VERDICT #1/#3).

Covers all three production mesh paths:

* counting (sharded_count_step at dp=kp=1 vs the bench.py kernel) —
  history on this container: 9.15 s round 3 (serialized bucketing
  gather + 3x-slack merge), 2.42 s after the contiguous-slice routing
  fix, 0.896 s after the hard bucket/merge bounds, and round 5 adds
  the S==1 identity shortcut (merge_gathered_sources; the pairwise
  bitonic S>1 formulation was measured, lost at S>=4, and was retired
  after a shard_map fusion hazard — BASELINE.md);
* the merge stage ITSELF at S = 2/4/8 sources on one chip (no S-device
  mesh needed — the per-column merge program is mesh-free), A/B'd
  against the round-4 re-sort formulation so BASELINE.md's projection
  table uses measured per-column merge costs;
* sharded_pair_ops at n_dev=1 vs the direct jitted pair-op program
  (glistcompare's mesh path, src/glistcompare.c:843-905);
* the mesh DB-count step at dp=1 vs _make_count_fn (gmer_counter's
  mesh path, src/gmer_counter.c:750-815).

Run under `timeout` from the repo root (the axon tunnel can hang inside
XLA): `timeout 900 python tools/mesh_overhead.py`.

All timings force execution with a SCALAR readback (block_until_ready
is a no-op under the axon tunnel — BASELINE.md round-4 notes).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 25
CHUNK = 1 << 25


def rand_sorted_unique(rng, n, bits=50):
    """n sorted unique words drawn from a 2^bits space (collision
    margin via overdraw + np.unique; rng.choice(replace=False) would
    materialize the whole population)."""
    w = np.unique(rng.integers(0, 1 << bits, 2 * n + 64, dtype=np.uint64))
    assert len(w) >= n
    return w[:n]


def timed(fn, *args, reps=3, sync=lambda r: None, label=""):
    t0 = time.time()
    sync(fn(*args))  # compile
    print(f"[mesh_overhead] {label}: compile+first {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*args))
        best = min(best, time.time() - t0)
    print(f"[mesh_overhead] {label}: {best:.4f}s", file=sys.stderr,
          flush=True)
    return best


def count_section(out, jax, jnp):
    from genometester4_tpu.ops.kmers import extract_kmers, extract_kmers_best
    from genometester4_tpu.ops.sortcount import count_unique
    from genometester4_tpu.parallel.sharding import (make_mesh,
                                                     sharded_count_step)

    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, size=CHUNK, dtype=np.int64).astype(np.uint8)
    n_windows = CHUNK - K + 1
    HB = 2 * K - 32

    # direct path: the bench.py device kernel (sort + Pallas run marks)
    @jax.jit
    def direct(c):
        hi, lo, valid = extract_kmers_best(c, K, canonical=True)
        packed = jnp.where(valid, jnp.uint32(0), jnp.uint32(1 << HB)) | hi
        sp, sl = jax.lax.sort((packed, lo), num_keys=2, is_stable=False)
        from genometester4_tpu.ops.runmarks_pallas import make_run_marks
        _, _, n, total, checksum = make_run_marks(
            sp.shape[0], HB, write_masks=False)(sp, sl)
        return n, total, checksum

    # the pre-collective part of the mesh step
    @jax.jit
    def local(c):
        hi, lo, valid = extract_kmers(c, K, canonical=True)
        ones = jnp.ones(hi.shape, jnp.uint32)
        uhi, ulo, ucnt, n = count_unique(hi, lo, ones, valid,
                                         hi_bits=HB, unit_weights=True)
        return n

    dc = jax.device_put(codes)
    out["n_windows"] = n_windows
    out["direct_dt"] = timed(direct, dc, sync=lambda r: int(r[0]),
                             label="direct")
    out["local_dt"] = timed(local, dc, sync=lambda r: int(r), label="local")

    mesh = make_mesh(1)
    blocks = dc.reshape(1, 1, CHUNK)
    fn, _ = sharded_count_step(mesh, K, CHUNK)
    out["spmd_dt"] = timed(fn, blocks, sync=lambda r: int(r[3][0]),
                           label="spmd_dt")
    # the default slack must hold at kp=1 (all words in bucket 0)
    assert not int(np.asarray(fn(blocks)[4]))

    out["spmd_overhead_x"] = round(out["spmd_dt"] / out["direct_dt"], 3)
    out["kmers_per_s_direct"] = round(n_windows / out["direct_dt"], 1)
    out["kmers_per_s_spmd"] = round(n_windows / out["spmd_dt"], 1)


def merge_section(out, jax, jnp):
    """Per-column merge cost at S>1 source counts, standalone on one
    chip, vs the round-4 re-sort formulation at the same load."""
    from genometester4_tpu.parallel.sharding import (CAP_FACTOR,
                                                     merge_gathered_sources)
    from genometester4_tpu.ops.sortcount import count_unique

    W = CHUNK - K + 1
    out["merge"] = {}
    for S in (2, 4, 8):
        # dp=1, kp=S shapes: cap as sharded_count_step computes it
        cap_soft = int(CAP_FACTOR * max(1, W // S))
        cap = int(min(cap_soft, W))
        merge_cap = min(2 * S * cap_soft // CAP_FACTOR, S * cap) + cap
        S2 = 1 << max(0, math.ceil(math.log2(S)))
        cap2 = 1 << max(0, math.ceil(math.log2(max(1, cap))))
        m = W // S   # realistic per-source valid load
        rng = np.random.default_rng(100 + S)
        bh = np.zeros((S, cap), np.uint32)
        bl = np.zeros((S, cap), np.uint32)
        bc = np.zeros((S, cap), np.uint32)
        for s in range(S):
            w = rand_sorted_unique(rng, m)
            bh[s, :m] = (w >> np.uint64(32)).astype(np.uint32)
            bl[s, :m] = (w & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            bc[s, :m] = 1
        bn = np.full((S,), m, np.int32)
        dbh, dbl, dbc, dbn = (jax.device_put(x) for x in (bh, bl, bc, bn))

        use_pallas = (jax.default_backend() == "tpu"
                      and os.environ.get("GT4_TPU_MERGE_PALLAS", "1")
                      != "0")

        def make(mode):
            @jax.jit
            def run(a, b, c, n):
                r = merge_gathered_sources(
                    a, b, c, n, S=S, S2=S2, cap=cap, cap2=cap2,
                    merge_cap=merge_cap, use_pallas=use_pallas,
                    hi_bits=max(0, 2 * K - 32), mode=mode)
                return r[3]
            return run

        row = {}
        row["cap"] = cap
        row["merge_cap"] = merge_cap
        row["S2xcap2"] = S2 * cap2
        row["bitonic_dt"] = timed(make("bitonic"), dbh, dbl, dbc, dbn,
                                  sync=lambda r: int(r),
                                  label=f"merge_bitonic S={S}")
        row["resort_dt"] = timed(make("resort"), dbh, dbl, dbc, dbn,
                                 sync=lambda r: int(r),
                                 label=f"merge_resort S={S}")
        row["bitonic_vs_resort_x"] = round(row["resort_dt"]
                                           / row["bitonic_dt"], 2)

        # duplication-adaptive slack (VERDICT r5 #2): on a dup-heavy
        # load (valid fill ~W/S/9, the bench dup input's dedupe ratio)
        # the auto cap_factor shrinks cap toward 1.5x the observed
        # fill; the resort merge then sorts a proportionally smaller
        # merge_cap. Measure the adaptive-cap resort vs the worst-case
        # buffers at the same (small) valid load.
        m_dup = max(1, m // 9)
        fill_factor = 1.5 * m_dup / max(1, W // S)
        cap_ad = max(256, int(min(fill_factor * max(1, W // S), W)))
        soft_ad = int(fill_factor * max(1, W // S))
        merge_cap_ad = min(2 * S * soft_ad // CAP_FACTOR,
                           S * cap_ad) + cap_ad
        bh_d = np.zeros((S, cap_ad), np.uint32)
        bl_d = np.zeros((S, cap_ad), np.uint32)
        bc_d = np.zeros((S, cap_ad), np.uint32)
        bh_w = np.zeros((S, cap), np.uint32)
        bl_w = np.zeros((S, cap), np.uint32)
        bc_w = np.zeros((S, cap), np.uint32)
        for s in range(S):
            w = rand_sorted_unique(rng, m_dup)
            for dst_h, dst_l, dst_c in ((bh_d, bl_d, bc_d),
                                        (bh_w, bl_w, bc_w)):
                dst_h[s, :m_dup] = (w >> np.uint64(32)).astype(np.uint32)
                dst_l[s, :m_dup] = (w & np.uint64(0xFFFFFFFF)).astype(
                    np.uint32)
                dst_c[s, :m_dup] = 9
        bn_d = np.full((S,), m_dup, np.int32)
        cap2_ad = 1 << max(0, math.ceil(math.log2(max(1, cap_ad))))

        @jax.jit
        def merge_adaptive(a, b, c, n):
            r = merge_gathered_sources(
                a, b, c, n, S=S, S2=S2, cap=cap_ad, cap2=cap2_ad,
                merge_cap=merge_cap_ad, use_pallas=use_pallas,
                hi_bits=max(0, 2 * K - 32), mode="resort")
            return r[3]

        @jax.jit
        def merge_worstcase(a, b, c, n):
            r = merge_gathered_sources(
                a, b, c, n, S=S, S2=S2, cap=cap, cap2=cap2,
                merge_cap=merge_cap, use_pallas=use_pallas,
                hi_bits=max(0, 2 * K - 32), mode="resort")
            return r[3]

        da = [jax.device_put(x) for x in (bh_d, bl_d, bc_d, bn_d)]
        dw = [jax.device_put(x) for x in (bh_w, bl_w, bc_w, bn_d)]
        row["dup_adaptive_dt"] = timed(merge_adaptive, *da,
                                       sync=lambda r: int(r),
                                       label=f"merge_dup_adaptive S={S}")
        row["dup_worstcase_dt"] = timed(merge_worstcase, *dw,
                                        sync=lambda r: int(r),
                                        label=f"merge_dup_worstcase S={S}")
        row["adaptive_speedup_x"] = round(row["dup_worstcase_dt"]
                                          / row["dup_adaptive_dt"], 2)
        out["merge"][str(S)] = {k: (round(v, 4) if isinstance(v, float)
                                    else v) for k, v in row.items()}


def pair_section(out, jax, jnp):
    """The sharded_pair_ops formulation at n_dev=1 (host rank-select +
    bucket pack + upload + SPMD step, scalar-only readback) vs the
    direct jitted pair program on resident device arrays. Bulk result
    readback is EXCLUDED on both sides: over the axon tunnel it
    measures the tunnel (~0.4 MB/s), and on a real link both paths pay
    the identical transfer (same result bytes) — CLAUDE.md 'read back
    scalars' methodology. The first measured run of this section's
    naive end-to-end variant was 85.8 s (253x) for exactly that reason:
    253x of tunnel, not engine."""
    from genometester4_tpu.parallel.sharding import (Mesh, make_mesh,
                                                     _pair_ops_make_fn,
                                                     _pair_ops_prepare)
    from genometester4_tpu.ops import setops
    from genometester4_tpu.ops.encode import split_u64

    from genometester4_tpu.utils.backend import disable_numpy_thp
    disable_numpy_thp()   # production pack paths run with THP off
    # (list_format import side effect); without it the 400 MB of
    # first-touch bucket writes measure the MADV_HUGEPAGE penalty

    N = 1 << 24
    rng = np.random.default_rng(11)
    w1 = rand_sorted_unique(rng, N)
    w2 = rand_sorted_unique(rng, N)
    c1 = rng.integers(1, 100, N).astype(np.uint32)
    c2 = rng.integers(1, 100, N).astype(np.uint32)
    mesh = make_mesh(1)

    # host half: rank select + bucket pack (timed on the host alone,
    # best of 3 — the first pack pays one-time allocator warmup)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        a1, a2 = _pair_ops_prepare(w1, c1, w2, c2, 1)
        best = min(best, time.time() - t0)
    out["pair_pack_dt"] = best

    # device half on RESIDENT inputs (uploads untimed: over the tunnel
    # they measure the tunnel; on a real link both paths' inputs arrive
    # the same way)
    flat = Mesh(mesh.devices.reshape(-1), ("sp",))
    fn = _pair_ops_make_fn(flat, False, ["union"])
    dev_args = [jax.device_put(x) for x in a1 + a2]

    def step(*args):
        return fn(*args)[0][3]        # n_out: the scalar barrier

    out["pair_step_dt"] = timed(step, *dev_args,
                                sync=lambda r: int(np.asarray(r)[0]),
                                label="pair step")
    out["pair_sharded_dt"] = out["pair_pack_dt"] + out["pair_step_dt"]

    # direct twin: one aligned pair table + the op, scalars back
    h1, l1 = split_u64(w1)
    h2, l2 = split_u64(w2)

    @jax.jit
    def direct(h1, l1, c1, h2, l2, c2):
        aligned = setops.pair_align(h1, l1, c1, jnp.ones(N, jnp.bool_),
                                    h2, l2, c2, jnp.ones(N, jnp.bool_))
        n_out, ohi, olo, oc = setops.apply_pair_op(*aligned, op="union")
        return n_out

    args = [jax.device_put(x) for x in (h1, l1, c1, h2, l2, c2)]
    out["pair_direct_dt"] = timed(direct, *args, sync=lambda r: int(r),
                                  label="pair direct")
    out["pair_overhead_x"] = round(out["pair_sharded_dt"]
                                   / out["pair_direct_dt"], 3)


def dbcount_section(out, jax, jnp):
    """The gmer_counter mesh DB-count step at dp=1 vs _make_count_fn."""
    from genometester4_tpu.pipelines.gmercount import (_make_count_fn,
                                                       _make_count_fn_mesh)
    from genometester4_tpu.parallel.sharding import Mesh

    NDB = 1 << 21
    rng = np.random.default_rng(13)
    codes = rng.integers(0, 4, size=CHUNK, dtype=np.int64).astype(np.uint8)
    dbw = rand_sorted_unique(rng, NDB)
    dbhi = (dbw >> np.uint64(32)).astype(np.uint32)
    dblo = (dbw & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    acc = np.zeros(NDB, np.uint32)
    args = [jax.device_put(x) for x in (codes, dbhi, dblo)]

    direct = _make_count_fn(K, CHUNK)

    def run_direct(c, h, l):
        a0 = jax.device_put(np.zeros(NDB, np.uint32))
        a1 = jax.device_put(np.zeros(NDB, np.uint32))
        return direct(a0, a1, c, h, l)

    out["dbcount_direct_dt"] = timed(run_direct, *args,
                                     sync=lambda r: int(r[2]),
                                     label="dbcount direct")

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("dp",))
    meshfn = _make_count_fn_mesh(K, CHUNK, mesh)

    def run_mesh(c, h, l):
        a0 = jax.device_put(np.zeros(NDB, np.uint32))
        a1 = jax.device_put(np.zeros(NDB, np.uint32))
        return meshfn(a0, a1, c.reshape(1, -1), h, l)

    out["dbcount_mesh_dt"] = timed(run_mesh, *args,
                                   sync=lambda r: int(r[2]),
                                   label="dbcount mesh")
    out["dbcount_overhead_x"] = round(out["dbcount_mesh_dt"]
                                      / out["dbcount_direct_dt"], 3)


def sw_section(out, jax, jnp):
    """Cross-region SW batching win (round-5 VERDICT #5): 16 regions x
    40 reads (a typical sparse-exome window) filled as 16 separate
    lane-kernel launches vs ONE multi-region launch. Scalar-barrier
    timing; the traceback/filter host side is identical either way."""
    from genometester4_tpu.ops.swalign_pallas import (LANE,
                                                      make_sw_pallas_lanes)

    n_cap, m_cap = 152, 104          # 150 bp region, 100 bp reads (+pad)
    R, B = 16, 40
    rng = np.random.default_rng(21)
    refs = rng.integers(0, 4, size=(R, n_cap)).astype(np.int32)
    reads = rng.integers(0, 4, size=(R, B, m_cap)).astype(np.int32)
    run = make_sw_pallas_lanes(n_cap, m_cap)

    def pack(refs_2d, reads_2d):
        # per-lane refs layout identical to sw_matrices_batch_device
        nb = reads_2d.shape[0]
        return (jnp.asarray(refs_2d.astype(np.int8)),
                jnp.asarray(reads_2d.astype(np.int8)),
                jnp.asarray(np.full(nb, n_cap, np.int32)))

    # Both variants are chained CHAIN-deep inside ONE jit: a single
    # launch sits under the ~25 ms dispatch floor over the tunnel
    # (first attempt measured 27 vs 29 ms — pure floor, 0.93x noise)
    CHAIN = 8
    per_region_args = []
    for r in range(R):
        rr = np.repeat(refs[r][None], B, axis=0)
        per_region_args.append(pack(rr, reads[r]))
    flat_args = [x for a in per_region_args for x in a]

    @jax.jit
    def per_region_chained(*args):
        args = list(args)
        acc = jnp.int32(0)
        for _ in range(CHAIN):
            for r in range(R):
                # optimization_barrier defeats CSE of the identical
                # chained launches without perturbing operands
                a0, a1, a2 = jax.lax.optimization_barrier(
                    (args[3 * r], args[3 * r + 1], args[3 * r + 2]))
                sc, sx, sy = run(a0, a1, a2)
                acc = acc + jnp.sum(sc[-1, :, 0])
            acc = jax.lax.optimization_barrier(acc)
        return acc

    out["sw_per_region_dt"] = timed(
        per_region_chained, *flat_args, sync=lambda r: int(r),
        label=f"sw per-region x{R} chain{CHAIN}") / CHAIN

    # (b) one combined launch per chain step
    all_refs = np.repeat(refs[:, None], B, axis=1).reshape(R * B, n_cap)
    all_reads = reads.reshape(R * B, m_cap)
    combined = pack(all_refs, all_reads)

    @jax.jit
    def comb_chained(refs_d, reads_d, nvec):
        acc = jnp.int32(0)
        for _ in range(CHAIN):
            refs_d, reads_d, nvec = jax.lax.optimization_barrier(
                (refs_d, reads_d, nvec))
            sc, sx, sy = run(refs_d, reads_d, nvec)
            acc = acc + jnp.sum(sc[-1, :, 0])
        return acc

    out["sw_batched_dt"] = timed(comb_chained, *combined,
                                 sync=lambda r: int(r),
                                 label=f"sw batched chain{CHAIN}") / CHAIN
    out["sw_batch_speedup_x"] = round(out["sw_per_region_dt"]
                                      / out["sw_batched_dt"], 2)


def main():
    import jax
    import jax.numpy as jnp

    sections = sys.argv[1:] or ["count", "merge", "pair", "dbcount", "sw"]
    out = {"backend": jax.default_backend()}
    if "count" in sections:
        count_section(out, jax, jnp)
    if "merge" in sections:
        merge_section(out, jax, jnp)
    if "pair" in sections:
        pair_section(out, jax, jnp)
    if "dbcount" in sections:
        dbcount_section(out, jax, jnp)
    if "sw" in sections:
        sw_section(out, jax, jnp)
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
