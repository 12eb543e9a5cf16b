import os, random, subprocess, sys, tempfile
REF = "/root/repo/.ref_build/src/glistquery"
OURS = [sys.executable, "-m", "genometester4_tpu.cli.glistquery"]
REFMK = "/root/repo/.ref_build/src/glistmaker"
random.seed(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
os.chdir("/root/repo")
tmp = tempfile.mkdtemp(prefix="statsfuzz")

def mkfasta(path, n, L):
    with open(path, "w") as f:
        for i in range(n):
            f.write(">s%d\n" % i)
            f.write("".join(random.choice("ACGTN") for _ in range(L)) + "\n")

fails = 0
for trial in range(25):
    L = random.choice([0, 5, 30, 200, 2000])
    n = random.choice([0, 1, 3, 10])
    k = random.choice([4, 8, 16, 25, 32])
    fa = os.path.join(tmp, "t%d.fa" % trial)
    mkfasta(fa, n, L)
    out = os.path.join(tmp, "o%d" % trial)
    subprocess.run([REFMK, fa, "-w", str(k), "-o", out],
                   capture_output=True)
    lst = out + "_%d.list" % k
    if not os.path.exists(lst):
        continue
    nfiles = random.choice([1, 1, 2])
    args_files = [lst] * nfiles
    for cmd in (["--stat"], ["--median"], ["--gc"],
                ["--distribution", str(random.choice([1, 3, 10, 100]))]):
        r = subprocess.run([REF] + args_files + cmd, capture_output=True)
        o = subprocess.run(OURS + args_files + cmd, capture_output=True)
        if r.returncode < 0:
            continue
        if (r.stdout, r.returncode) != (o.stdout, o.returncode):
            fails += 1
            print("MISMATCH", trial, cmd, "k=%d n=%d L=%d" % (k, n, L))
            print(" ref rc=%d out=%r" % (r.returncode, r.stdout[:300]))
            print(" our rc=%d out=%r" % (o.returncode, o.stdout[:300]))
print("fails:", fails)
