"""Fuzz the SPMD mesh paths: random mesh shapes x inputs x spill budgets.

Round-3 VERDICT next #8. Each trial draws a mesh shape (n_devices, dp),
an input (size, base-composition skew, record structure, k), and a
spill budget, then:

* runs the PRODUCTION make_list mesh path (GT4_TPU_COUNT_IMPL=device)
  and byte-compares the .list against the native host twin;
* runs sharded pair ops (union + intrsec, random cutoff/rule) on two
  random word lists over the same mesh and compares against numpy
  oracles via the setops host semantics (reference rules).

Run on the virtual CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tests/fuzz_patterns/fuzz_mesh_shapes.py SEED [N_TRIALS]
"""

from __future__ import annotations

import os
import random
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def trial(t, rnd, jax, np):
    from genometester4_tpu.parallel.sharding import (make_mesh,
                                                     sharded_pair_op)
    from genometester4_tpu.pipelines.listmaker import make_list

    n_dev = rnd.choice([2, 4, 8])
    dps = [d for d in (1, 2, 4) if d <= n_dev]
    dp = rnd.choice(dps)
    k = rnd.choice([11, 16, 21, 25])
    rng = np.random.default_rng(rnd.randrange(1 << 30))
    sym = np.frombuffer(b"ACGT", np.uint8)
    n = rnd.randrange(20_000, 400_000)
    skew = rnd.random()
    if skew < 0.35:
        p = [0.55 + 0.4 * rnd.random()]
        rest = (1 - p[0]) / 3
        seq = sym[rng.choice(4, size=n, p=[p[0], rest, rest, rest])]
    else:
        seq = rng.choice(sym, size=n)
    n_rec = rnd.randrange(1, 6)
    cuts = sorted(rng.integers(1, n, n_rec - 1).tolist()) if n_rec > 1 else []
    spill = rnd.choice([1 << 14, 1 << 18, 1 << 30])
    slab = rnd.choice([1 << 14, 1 << 17, 1 << 28])

    with tempfile.TemporaryDirectory() as d:
        fa = os.path.join(d, "in.fa")
        with open(fa, "wb") as f:
            prev = 0
            for ri, c in enumerate(cuts + [n]):
                f.write(b">r%d\n" % ri + seq[prev:c].tobytes() + b"\n")
                prev = c
        outs = {}
        for impl in ("device", "host"):
            os.environ["GT4_TPU_COUNT_IMPL"] = impl
            try:
                make_list([fa], k, os.path.join(d, impl + ".list"),
                          spill_bytes=spill, slab_bytes=slab)
            finally:
                del os.environ["GT4_TPU_COUNT_IMPL"]
            outs[impl] = open(os.path.join(d, impl + ".list"), "rb").read()
        if outs["device"] != outs["host"]:
            return (f"make_list mesh != host (n_dev={n_dev} dp={dp} k={k} "
                    f"n={n} spill={spill} slab={slab})")

    # sharded pair ops vs numpy oracle
    mesh = make_mesh(n_dev, dp=dp)

    # float cap_factor (duplication-aware slack, round 4): a tight
    # random factor must converge through the overflow retry to the
    # same result as the default slack
    from genometester4_tpu.parallel.sharding import count_kmers_sharded
    codes = np.where(seq == ord("A"), 0,
                     np.where(seq == ord("C"), 1,
                              np.where(seq == ord("G"), 2, 3))
                     ).astype(np.uint8)[: rnd.randrange(5_000, 60_000)]
    wd, cd = count_kmers_sharded(codes, k, mesh)
    tight = 0.05 + 0.9 * rnd.random()
    wt, ct = count_kmers_sharded(codes, k, mesh, cap_factor=tight)
    if not (np.array_equal(wd, wt) and np.array_equal(cd, ct)):
        return (f"float cap_factor {tight:.3f} != default "
                f"(n_dev={n_dev} dp={dp} k={k})")
    m1 = rnd.randrange(1, 200_000)
    m2 = rnd.randrange(1, 200_000)
    pool = np.unique(rng.integers(0, 1 << 44, size=m1 + m2,
                                  dtype=np.int64).astype(np.uint64))
    rng.shuffle(pool)
    w1 = np.sort(pool[:m1])
    w2 = np.sort(pool[m1 // 2: m1 // 2 + m2])
    c1 = rng.integers(1, 30, len(w1)).astype(np.uint32)
    c2 = rng.integers(1, 30, len(w2)).astype(np.uint32)
    cutoff = rnd.choice([1, 1, 2, 3])
    uw, uc = sharded_pair_op(w1, c1, w2, c2, mesh, "union", cutoff=cutoff)
    # oracle: union keeps words whose freq reaches cutoff in EITHER list
    # (include_in_union semantics) with ADD counts
    aw = np.concatenate([w1, w2])
    ac = np.concatenate([c1, c2]).astype(np.uint64)
    order = np.argsort(aw, kind="stable")
    sw, sc = aw[order], ac[order]
    head = np.concatenate([[True], sw[1:] != sw[:-1]])
    starts = np.flatnonzero(head)
    exp_w = sw[head]
    exp_c = np.add.reduceat(sc, starts)
    f1 = np.zeros(len(exp_w), np.uint64)
    f2 = np.zeros(len(exp_w), np.uint64)
    i1 = np.searchsorted(exp_w, w1)
    f1[i1] = c1
    i2 = np.searchsorted(exp_w, w2)
    f2[i2] = c2
    keep = (f1 >= cutoff) | (f2 >= cutoff)
    exp_w, exp_c = exp_w[keep], exp_c[keep].astype(np.uint32)
    if not (np.array_equal(uw, exp_w) and np.array_equal(uc, exp_c)):
        return (f"sharded union != oracle (n_dev={n_dev} dp={dp} "
                f"m1={m1} m2={m2} cutoff={cutoff})")

    iw, ic = sharded_pair_op(w1, c1, w2, c2, mesh, "intrsec",
                             cutoff=cutoff)
    common, x1, x2 = np.intersect1d(w1, w2, assume_unique=True,
                                    return_indices=True)
    keep = (c1[x1] >= cutoff) & (c2[x2] >= cutoff)
    exp_iw = common[keep]
    exp_ic = np.minimum(c1[x1], c2[x2])[keep]
    if not (np.array_equal(iw, exp_iw) and np.array_equal(ic, exp_ic)):
        return (f"sharded intrsec != oracle (n_dev={n_dev} dp={dp} "
                f"m1={m1} m2={m2} cutoff={cutoff})")
    return None


def main():
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n_trials = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    rnd = random.Random(seed)
    fails = 0
    for t in range(n_trials):
        msg = trial(t, rnd, jax, np)
        if msg:
            fails += 1
            print(f"[{t}] FAIL: {msg}")
        else:
            print(f"[{t}] ok")
    print(f"done: {n_trials} trials, {fails} failures (seed {seed})")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
