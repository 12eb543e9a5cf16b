"""FastGT chain fuzzer: random DB + reads -> gmer_counter -> gmer_caller,
both stages byte-compared against the reference. Randomizes word size,
marker mix (autosome/X/Y proportions), coverage, flags, and sex — the
full README.FastGT workflow end to end."""
import os
import random
import subprocess
import sys
import tempfile

random.seed(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
T = tempfile.mkdtemp()
REF = "/root/repo/.ref_build/src"
BIN = "/root/repo/bin"
B = "ACGT"
fails = 0

for trial in range(4):
    w = random.choice([12, 16, 25])
    n_a = random.randint(300, 900)
    n_x, n_y = random.randint(40, 90), random.randint(20, 50)
    male = random.random() < 0.5
    mean = random.choice([15, 30, 60])

    # DB: two k-mers per marker; counts come from read synthesis below.
    # Canonical-duplicate k-mers are excluded: the reference corrupts
    # its own trie on them (trie.c:266-280 sums the two codes into the
    # count field; the first window hitting the mangled code then
    # aborts the whole count table, gmer_counter.c:774-790 'DB
    # inconsistency ... break') — documented non-emulated divergence,
    # COVERAGE.md "Known gaps". At w=12 random pairs collide ~12% of
    # the time per 1000-marker DB (seed 9101 trial 3 found this).
    comp = str.maketrans(B, "TGCA")
    seen_canon = set()

    def fresh_kmer():
        while True:
            k = "".join(random.choice(B) for _ in range(w))
            r = k.translate(comp)[::-1]
            c = min(k, r, key=lambda s: [B.index(ch) for ch in s])
            if c not in seen_canon:
                seen_canon.add(c)
                return k

    markers = []
    with open(T + "/db.txt", "w") as f:
        for i in range(n_a + n_x + n_y):
            chrom = (str(random.randint(1, 22)) if i < n_a
                     else ("X" if i < n_a + n_x else "Y"))
            k1 = fresh_kmer()
            k2 = fresh_kmer()
            markers.append((chrom, k1, k2))
            f.write("%s_m%d\t2\t%s\t%s\n" % (chrom, i, k1, k2))

    # reads: per marker, Poisson-ish copies of allele 1/2 by genotype+sex
    with open(T + "/reads.fa", "w") as f:
        r = 0
        for chrom, k1, k2 in markers:
            if chrom == "X":
                cov1 = mean // 2 if male else mean
            elif chrom == "Y":
                cov1 = mean // 2 if male else 0
            else:
                cov1 = mean
            gt = random.choices([0, 1, 2], [0.7, 0.25, 0.05])[0]
            c1 = cov1 if gt == 0 else (cov1 // 2 if gt == 1 else 0)
            c2 = 0 if gt == 0 else (cov1 // 2 if gt == 1 else cov1)
            for km, c in ((k1, c1), (k2, c2)):
                for _ in range(max(0, c + random.randint(-2, 2))):
                    pre = "".join(random.choice(B)
                                  for _ in range(random.randint(5, 25)))
                    post = "".join(random.choice(B)
                                   for _ in range(random.randint(5, 25)))
                    f.write(">r%d\n%s%s%s\n" % (r, pre, km, post))
                    r += 1

    cnt_flags = random.choice([[], ["--unique"], ["--total", "--unique"]])
    ref1 = subprocess.run([REF + "/gmer_counter", "-db", T + "/db.txt"]
                          + cnt_flags + [T + "/reads.fa"],
                          capture_output=True, timeout=600)
    our1 = subprocess.run([BIN + "/gmer_counter", "-db", T + "/db.txt"]
                          + cnt_flags + [T + "/reads.fa"],
                          capture_output=True, timeout=600)
    if ref1.returncode < 0:
        continue
    if (ref1.returncode, ref1.stdout) != (our1.returncode, our1.stdout):
        fails += 1
        print("COUNTER DIFF trial", trial, "w", w, ref1.returncode,
              our1.returncode)
        continue

    with open(T + "/counts.txt", "wb") as f:
        # gmer_caller consumes the count lines, not the header chrome
        f.write(b"".join(l + b"\n" for l in ref1.stdout.split(b"\n")
                         if l and not l.startswith(b"#")))
    call_flags = random.choice([
        ["--runs", "0", "--coverage", str(mean)],
        ["--runs", "0", "--coverage", str(mean), "--header", "--info"],
        ["--runs", "0", "--coverage", str(mean), "--model", "diploid"],
        [],  # trained: srand(1) + f32 simplex must still match
    ])
    ref2 = subprocess.run([REF + "/gmer_caller"] + call_flags
                          + [T + "/counts.txt"],
                          capture_output=True, timeout=900)
    our2 = subprocess.run([BIN + "/gmer_caller"] + call_flags
                          + [T + "/counts.txt"],
                          capture_output=True, timeout=900)
    if ref2.returncode < 0:
        continue  # reference segfaults (e.g. too few X/Y markers)
    if (ref2.returncode, ref2.stdout) != (our2.returncode, our2.stdout):
        fails += 1
        print("CALLER DIFF trial", trial, "flags", call_flags,
              ref2.returncode, our2.returncode)

print("seed %s: fails %d" % (sys.argv[1] if len(sys.argv) > 1 else 0, fails))
