"""N-list union/intersection differential fuzz: the cascaded merge
tree (native fgx_multi_stream_* tree path) vs the reference's
union_multi/intersection_multi, over random list counts, sizes (incl.
empty and single-record lists), overlap structure (disjoint /
interleaved / prefix-partitioned / duplicated), rules and cutoffs,
plus u32 ADD-wrap counts and the 0xFF..F sentinel-adjacent word.

Usage: python tests/fuzz_patterns/fuzz_multi_union.py SEED
"""
import os
import random
import struct
import subprocess
import sys
import tempfile

random.seed(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
T = tempfile.mkdtemp()
BIN = "/root/repo/bin"
REF = "/root/repo/.ref_build/src"
H = struct.Struct("<IIIIQQQII")
CODE = (ord("G") << 24) | (ord("T") << 16) | (ord("4") << 8) | ord("C")


def sample_range(lo, hi, want):
    """sorted unique draws from [lo, hi] (range too big for
    random.sample at k=32)"""
    got = set()
    for _ in range(want * 2):
        if len(got) >= want:
            break
        got.add(random.randint(lo, hi))
    return sorted(got)


def write_list(path, k, words_counts):
    with open(path, "wb") as f:
        tot = sum(c for _, c in words_counts) & 0xFFFFFFFFFFFFFFFF
        f.write(H.pack(CODE, 4, 2, k, len(words_counts), tot,
                       H.size, 8, 4))
        for w, c in words_counts:
            f.write(struct.pack("<QI", w, c))


fails = 0
for trial in range(40):
    k = random.choice([4, 16, 25, 32])
    top = (1 << (2 * k)) - 1
    n = random.randint(2, 9)
    paths = []
    shape = random.choice(["disjoint", "interleave", "prefix", "dup"])
    base = sample_range(0, top, random.randint(0, 400))
    for i in range(n):
        if random.random() < 0.15:
            words = []
        elif shape == "disjoint":
            words = sample_range(0, top, random.randint(1, 300))
        elif shape == "prefix":
            lo = top * i // n
            hi = top * (i + 1) // n
            words = sample_range(lo, hi, random.randint(1, 300))
        elif shape == "dup":
            words = base
        else:
            words = sorted(random.sample(base or [0],
                                         random.randint(0, len(base))))
        if words and random.random() < 0.3:
            words[-1] = top          # sentinel-adjacent max word
            words = sorted(set(words))
        wc = [(w, random.choice([1, 2, 65535,
                                 0xFFFFFFFF - random.randint(0, 2)]))
              for w in words]
        p = "%s/l%d_%d.list" % (T, trial, i)
        write_list(p, k, wc)
        paths.append(p)
    op = random.choice(["-u", "-i"])
    args = [op]
    r = random.random()
    if r < 0.4:
        args += ["-r", random.choice(
            ["add", "max"] if op == "-u" else ["min", "first"])]
    elif r < 0.6:
        args += ["-r", str(random.randint(0, 70000))]
    if random.random() < 0.5:
        args += ["-c", str(random.choice([1, 2, 3, 70000]))]
    ra = subprocess.run([REF + "/glistcompare"] + paths + args +
                        ["-o", T + "/r"], capture_output=True, timeout=300)
    rb = subprocess.run([BIN + "/glistcompare"] + paths + args +
                        ["-o", T + "/o"], capture_output=True, timeout=300)
    if ra.returncode < 0:
        continue                      # reference crash: not an oracle
    suffix = "union" if op == "-u" else "intrsec"
    fa = "%s/r_%d_%s.list" % (T, k, suffix)
    fb = "%s/o_%d_%s.list" % (T, k, suffix)
    da = open(fa, "rb").read() if os.path.exists(fa) else ra.stderr
    db = open(fb, "rb").read() if os.path.exists(fb) else rb.stderr
    if da != db or ra.returncode != rb.returncode:
        fails += 1
        print("DIFF trial=%d n=%d k=%d shape=%s args=%s rc=%d/%d"
              % (trial, n, k, shape, args, ra.returncode, rb.returncode))
    for f in (fa, fb):
        if os.path.exists(f):
            os.unlink(f)
print("seed %s: fails %d" % (sys.argv[1] if len(sys.argv) > 1 else "0",
                             fails))
