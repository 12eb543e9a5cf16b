"""Multi-chip self-consistency: N-shard result == single-chip result.

Runs on the 8-device virtual CPU mesh from conftest (the reference has
no distributed analogue, SURVEY.md §4).
"""

import numpy as np
import jax
import pytest

from tests.conftest import random_fasta
from genometester4_tpu.io.fasta import parse_sequences
from genometester4_tpu.parallel.sharding import make_mesh, count_kmers_sharded
from genometester4_tpu.pipelines.listmaker import count_chunks, merge_sorted_shards


def _single_chip(codes, k):
    shards = list(count_chunks(codes, k, chunk_bases=1 << 15))
    ws, cs = [], []
    for w, c in merge_sorted_shards(shards):
        ws.append(w)
        cs.append(c)
    return (np.concatenate(ws) if ws else np.empty(0, np.uint64),
            np.concatenate(cs) if cs else np.empty(0, np.uint32))


@pytest.mark.parametrize("k,dp", [(16, 2), (25, 1), (8, 4)])
def test_sharded_equals_single(rng, k, dp):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    text = random_fasta(rng, 6, 2000, 5000, n_prob=0.01)
    codes = parse_sequences(text.encode()).codes
    mesh = make_mesh(8, dp=dp)
    w_sh, c_sh = count_kmers_sharded(codes, k, mesh, chunk_bases=1 << 13)
    w_1, c_1 = _single_chip(codes, k)
    np.testing.assert_array_equal(w_sh, w_1)
    np.testing.assert_array_equal(c_sh, c_1)


def test_two_device_mesh_large_chunk(rng):
    """Round-5 dryrun finding: at S=2 (2-device mesh) with cap 65512
    the pairwise-bitonic merge formulation MISCOMPILED inside shard_map
    on the CPU backend (word loss; correct outside shard_map, correct
    with intermediates materialized — an XLA fusion hazard). Production
    now dispatches resort for all S>1; this pins the exact failing
    shape against the single-chip pipeline."""
    sym = np.frombuffer(b"ACGT", np.uint8)
    codes = sym[np.random.default_rng(1).integers(0, 4, 2 << 16)]
    from genometester4_tpu.io.fasta import parse_sequences
    codes = parse_sequences(b">s\n" + codes.tobytes() + b"\n").codes
    mesh = make_mesh(2)
    w_sh, c_sh = count_kmers_sharded(codes, 25, mesh, chunk_bases=1 << 16)
    w_1, c_1 = _single_chip(codes, 25)
    np.testing.assert_array_equal(w_sh, w_1)
    np.testing.assert_array_equal(c_sh, c_1)


def test_adaptive_cap_factor_dup_heavy_then_unique(rng):
    """Round-5 VERDICT #2: cap_factor="auto" (the default) shrinks the
    bucket slack to the observed duplication after each step, and the
    overflow retry must recover when a later chunk turns unique-heavy
    (shrink-then-grow cycle). Dup-heavy prefix (tiled motif, ~200x
    duplication) followed by a random tail, many steps, byte-equal to
    the single-chip pipeline."""
    motif = "".join("ACGT"[i] for i in rng.integers(0, 4, 97))
    text = ">dup\n" + motif * 700 + "\n>uniq\n" + "".join(
        "ACGT"[i] for i in rng.integers(0, 4, 60000)) + "\n"
    codes = parse_sequences(text.encode()).codes
    mesh = make_mesh(8, dp=2)
    w_sh, c_sh = count_kmers_sharded(codes, 16, mesh, chunk_bases=1 << 12)
    w_1, c_1 = _single_chip(codes, 16)
    np.testing.assert_array_equal(w_sh, w_1)
    np.testing.assert_array_equal(c_sh, c_1)


def test_adapt_state_carries_across_calls(rng):
    """Round-5: make_list counts one slab per call, so the adapted
    cap_factor must CARRY across calls via adapt_state (else every
    slab restarts at worst-case buffers), and the memoized step
    builder must return the identical jitted program for identical
    arguments (else every slab recompiled)."""
    from genometester4_tpu.parallel.sharding import (CAP_FACTOR,
                                                     sharded_count_step)
    motif = "".join("ACGT"[i] for i in rng.integers(0, 4, 83))
    text = ">dup\n" + motif * 900 + "\n"
    codes = parse_sequences(text.encode()).codes
    mesh = make_mesh(8, dp=2)
    state = {}
    w1, c1 = count_kmers_sharded(codes, 16, mesh, chunk_bases=1 << 12,
                                 adapt_state=state)
    assert 0 < state["cap_factor"] < CAP_FACTOR, state
    carried = state["cap_factor"]
    # second slab starts from the adapted factor, results identical
    w2, c2 = count_kmers_sharded(codes, 16, mesh, chunk_bases=1 << 12,
                                 adapt_state=state)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(c1, c2)
    # and equal-argument step builds are the SAME object (memoized)
    f1, _ = sharded_count_step(mesh, 16, 1 << 12, carried)
    f2, _ = sharded_count_step(mesh, 16, 1 << 12, carried)
    assert f1 is f2


def test_sharded_output_globally_sorted(rng):
    text = random_fasta(rng, 3, 3000, 6000)
    codes = parse_sequences(text.encode()).codes
    mesh = make_mesh(8, dp=2)
    w, _ = count_kmers_sharded(codes, 16, mesh, chunk_bases=1 << 13)
    assert np.all(w[1:] > w[:-1])


def test_sharded_pair_ops_match_single(rng):
    """8-device sharded glistcompare == single-device pipeline for every
    op and a weighted rule, on skewed inputs (all words in one corner)."""
    import numpy as np
    import jax
    from genometester4_tpu.parallel.sharding import make_mesh, sharded_pair_op
    from genometester4_tpu.ops import setops
    from genometester4_tpu.ops.encode import split_u64, join_u64
    import jax.numpy as jnp

    mesh = make_mesh(8)
    w1 = np.unique(rng.integers(0, 1 << 20, size=4000).astype(np.uint64))
    w2 = np.unique(np.concatenate([
        rng.integers(0, 1 << 20, size=1000),
        rng.integers(0, 1 << 8, size=3000)]).astype(np.uint64))  # skew
    c1 = rng.integers(1, 50, size=len(w1)).astype(np.uint32)
    c2 = rng.integers(1, 50, size=len(w2)).astype(np.uint32)

    def single(op, rule, cutoff, subtract=False):
        cap = 1 << 13
        h1, l1 = split_u64(np.pad(w1, (0, cap - len(w1))))
        h2, l2 = split_u64(np.pad(w2, (0, cap - len(w2))))
        v1 = np.arange(cap) < len(w1)
        v2 = np.arange(cap) < len(w2)
        aligned = setops.pair_align(
            jnp.asarray(h1), jnp.asarray(l1),
            jnp.asarray(np.pad(c1, (0, cap - len(c1)))), jnp.asarray(v1),
            jnp.asarray(h2), jnp.asarray(l2),
            jnp.asarray(np.pad(c2, (0, cap - len(c2)))), jnp.asarray(v2))
        n, oh, ol, oc = setops.apply_pair_op(*aligned, op=op, rule=rule,
                                             cutoff=cutoff,
                                             subtract=subtract)
        m = int(n)
        return (join_u64(np.asarray(oh[:m]), np.asarray(ol[:m])),
                np.asarray(oc[:m], np.uint32))

    for op, rule, cutoff, sub in [("union", "default", 1, False),
                                  ("intrsec", "min", 2, False),
                                  ("diff1", "default", 1, False),
                                  ("diff1", "default", 1, True),
                                  ("diff2", "default", 3, False),
                                  ("union", "max", 1, False)]:
        sw, sc = sharded_pair_op(w1, c1, w2, c2, mesh, op, rule=rule,
                                 cutoff=cutoff, subtract=sub)
        ew, ec = single(op, rule, cutoff, subtract=sub)
        np.testing.assert_array_equal(sw, ew, err_msg=f"{op}/{rule}")
        np.testing.assert_array_equal(sc, ec, err_msg=f"{op}/{rule}")


def test_sharded_multi_ops_match_single(rng):
    """8-device N-list union/intersection == single-device apply_multi_op
    on 4 skewed lists."""
    import numpy as np
    import jax.numpy as jnp
    from genometester4_tpu.parallel.sharding import (make_mesh,
                                                     sharded_multi_op)
    from genometester4_tpu.ops import setops
    from genometester4_tpu.ops.encode import split_u64, join_u64

    mesh = make_mesh(8)
    lists = []
    for i in range(4):
        w = np.unique(rng.integers(0, 1 << (8 + 4 * i), size=800)
                      .astype(np.uint64))
        c = rng.integers(1, 30, size=len(w)).astype(np.uint32)
        lists.append((w, c))
    words = [w for w, _ in lists]
    counts = [c for _, c in lists]

    def single(op, rule, cutoff):
        cap = 1 << 13
        hi = np.zeros(cap, np.uint32); lo = np.zeros(cap, np.uint32)
        cc = np.zeros(cap, np.uint32); src = np.zeros(cap, np.uint32)
        v = np.zeros(cap, bool)
        off = 0
        for li, (w, c) in enumerate(lists):
            h, l = split_u64(w)
            hi[off:off+len(w)] = h; lo[off:off+len(w)] = l
            cc[off:off+len(w)] = c; src[off:off+len(w)] = li
            off += len(w)
        v[:off] = True
        n, oh, ol, oc = setops.apply_multi_op(
            jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(cc),
            jnp.asarray(src), jnp.asarray(v), n_lists=4, op=op, rule=rule,
            cutoff=cutoff)
        m = int(n)
        return (join_u64(np.asarray(oh[:m]), np.asarray(ol[:m])),
                np.asarray(oc[:m], np.uint32))

    for op, rule, cutoff in [("union", "default", 1), ("union", "max", 2),
                             ("intrsec", "default", 1),
                             ("intrsec", "min", 3)]:
        sw, sc = sharded_multi_op(words, counts, mesh, op, rule=rule,
                                  cutoff=cutoff)
        ew, ec = single(op, rule, cutoff)
        np.testing.assert_array_equal(sw, ew, err_msg=f"{op}/{rule}")
        np.testing.assert_array_equal(sc, ec, err_msg=f"{op}/{rule}")


def test_rank_bounds_matches_sorted_quantiles(rng):
    """Merge-path rank select == quantiles of the (hypothetically)
    merged array, without ever materializing it."""
    from genometester4_tpu.parallel.sharding import rank_bounds
    lists = [np.sort(rng.integers(0, 1 << 40, size=n).astype(np.uint64))
             for n in (1000, 1, 5000, 0, 777)]
    n_parts = 8
    bounds = rank_bounds(lists, n_parts)
    allw = np.sort(np.concatenate(lists))
    targets = (np.arange(1, n_parts) * len(allw)) // n_parts
    for t, b in zip(targets, bounds):
        # b is the smallest value with rank(<b) >= t
        assert int(np.sum([np.searchsorted(w, b) for w in lists])) >= t
        if b > 0:
            below = int(np.sum([np.searchsorted(w, b - 1) for w in lists]))
            assert below < t


def test_glistmaker_cli_uses_mesh_byte_identical(rng, tmp_path):
    """Production path: glistmaker through make_list on the 8-device
    mesh (forced device impl) emits the same bytes as the host path and
    the reference (round-1 VERDICT missing #1)."""
    import os

    text = random_fasta(rng, 4, 3000, 9000, n_prob=0.01)
    fa = tmp_path / "in.fa"
    fa.write_text(text)
    from tests.conftest import run_reference
    r = run_reference(["glistmaker", str(fa), "-w", "14",
                       "-o", str(tmp_path / "ref")])
    assert r.returncode == 0, r.stderr
    from genometester4_tpu.pipelines.listmaker import make_list
    old = os.environ.get("GT4_TPU_COUNT_IMPL")
    os.environ["GT4_TPU_COUNT_IMPL"] = "device"
    try:
        assert len(jax.devices()) == 8
        make_list([str(fa)], 14, str(tmp_path / "mesh_14.list"))
    finally:
        if old is None:
            del os.environ["GT4_TPU_COUNT_IMPL"]
        else:
            os.environ["GT4_TPU_COUNT_IMPL"] = old
    assert (tmp_path / "mesh_14.list").read_bytes() == (
        tmp_path / "ref_14.list").read_bytes()


def test_sharded_pair_op_20m_words(rng):
    """VERDICT round-1 weak #4/#5 closure: a >=20M-word sharded set op
    with the merge-path bounds (no full-input host sort)."""
    from genometester4_tpu.parallel.sharding import make_mesh, sharded_pair_op
    n = 10_000_000
    pool = rng.integers(0, 1 << 50, size=int(2.2 * n), dtype=np.int64)
    pool = np.unique(pool.astype(np.uint64))
    w1 = pool[:n]
    w2 = np.sort(pool[n // 2: n // 2 + n])
    c1 = rng.integers(1, 50, n).astype(np.uint32)
    c2 = rng.integers(1, 50, n).astype(np.uint32)
    mesh = make_mesh(8)
    uw, uc = sharded_pair_op(w1, c1, w2, c2, mesh, "union")
    # host oracle via the native streaming zipper? plain numpy suffices:
    aw = np.concatenate([w1, w2])
    ac = np.concatenate([c1, c2]).astype(np.uint64)
    order = np.argsort(aw, kind="stable")
    sw, sc = aw[order], ac[order]
    head = np.concatenate([[True], sw[1:] != sw[:-1]])
    starts = np.flatnonzero(head)
    exp_w = sw[head]
    exp_c = np.add.reduceat(sc, starts).astype(np.uint32)
    np.testing.assert_array_equal(uw, exp_w)
    np.testing.assert_array_equal(uc, exp_c)


def test_glistcompare_pipeline_uses_mesh_byte_identical(rng, tmp_path):
    """Production path: compare_pair / compare_multi on the 8-device
    mesh (forced device impl) emit the same bytes as the reference —
    the glistcompare analogue of the mesh glistmaker path."""
    import os

    from tests.conftest import run_reference
    for name, n, L in (("a", 3, 5000), ("b", 2, 4000), ("c", 2, 3000)):
        (tmp_path / f"{name}.fa").write_text(
            random_fasta(rng, n, L, L + 2000, n_prob=0.01))
        r = run_reference(["glistmaker", str(tmp_path / f"{name}.fa"),
                           "-w", "14", "-o", str(tmp_path / name)])
        assert r.returncode == 0, r.stderr
    la, lb, lc = (str(tmp_path / f"{x}_14.list") for x in "abc")

    r = run_reference(["glistcompare", la, lb, "-u", "-i", "-d", "-dd",
                       "-c", "2", "-o", str(tmp_path / "refp")])
    assert r.returncode == 0, r.stderr
    r = run_reference(["glistcompare", la, lb, lc, "-u",
                       "-o", str(tmp_path / "refm")])
    assert r.returncode == 0, r.stderr

    from genometester4_tpu.pipelines.listcompare import (_op_filename,
                                                         compare_multi,
                                                         compare_pair)
    old = os.environ.get("GT4_TPU_SETOPS_IMPL")
    os.environ["GT4_TPU_SETOPS_IMPL"] = "device"
    try:
        assert len(jax.devices()) == 8
        compare_pair(la, lb, ["union", "intrsec", "diff1", "diff2"],
                     outputname=str(tmp_path / "mesh"), cutoff=2)
        compare_multi([la, lb, lc], "union",
                      outputname=str(tmp_path / "meshm"))
    finally:
        if old is None:
            del os.environ["GT4_TPU_SETOPS_IMPL"]
        else:
            os.environ["GT4_TPU_SETOPS_IMPL"] = old
    for op in ("union", "intrsec", "diff1", "diff2"):
        got = _op_filename(str(tmp_path / "mesh"), 14, op)
        exp = _op_filename(str(tmp_path / "refp"), 14, op)
        assert open(got, "rb").read() == open(exp, "rb").read(), op
    got = _op_filename(str(tmp_path / "meshm"), 14, "union")
    exp = _op_filename(str(tmp_path / "refm"), 14, "union")
    assert open(got, "rb").read() == open(exp, "rb").read()


def test_gmer_counter_device_mesh_matches_reference(rng, tmp_path):
    """Production path: gmer_counter counting on the 8-device flat mesh
    (forced device impl; chunks shard over dp, counts psum) matches the
    reference binary's stdout."""
    import io
    import os
    import sys

    from tests.conftest import run_reference

    w = 14
    BASES = np.frombuffer(b"ACGT", np.uint8)
    lines, kmers = [], []
    for i in range(20):
        ks = ["".join(chr(c) for c in rng.choice(BASES, w))
              for _ in range(3)]
        kmers.extend(ks)
        lines.append(f"SNP{i}\t3\t" + "\t".join(ks))
    (tmp_path / "db.txt").write_text("\n".join(lines) + "\n")
    recs = []
    for r in range(250):
        seq = "".join(chr(c) for c in rng.choice(BASES, 120))
        if rng.random() < 0.6:
            km = kmers[int(rng.integers(len(kmers)))]
            p = int(rng.integers(0, 120 - w))
            seq = seq[:p] + km + seq[p + w:]
        recs.append(f">r{r}\n{seq}")
    (tmp_path / "reads.fa").write_text("\n".join(recs) + "\n")

    ref = run_reference(["gmer_counter", "-db", str(tmp_path / "db.txt"),
                         str(tmp_path / "reads.fa")])
    assert ref.returncode == 0, ref.stderr

    from genometester4_tpu.cli.gmer_counter import main
    old = os.environ.get("GT4_TPU_COUNT_IMPL")
    os.environ["GT4_TPU_COUNT_IMPL"] = "device"
    out = io.StringIO()
    so = sys.stdout
    sys.stdout = out
    try:
        assert len(jax.devices()) == 8
        rc = main(["-db", str(tmp_path / "db.txt"),
                   str(tmp_path / "reads.fa")])
    finally:
        sys.stdout = so
        if old is None:
            del os.environ["GT4_TPU_COUNT_IMPL"]
        else:
            os.environ["GT4_TPU_COUNT_IMPL"] = old
    assert rc == 0
    assert out.getvalue() == ref.stdout.decode()
