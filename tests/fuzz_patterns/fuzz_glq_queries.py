"""glistquery query surfaces: -q/-f/-s/-l x -mm/-p/--all/--3p/--5p/min/max
on lists AND indexes, byte-compared against the reference."""
import subprocess, sys, os, random, tempfile
random.seed(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
T = tempfile.mkdtemp()
REF = "/root/repo/.ref_build/src"
B = "ACGT"

def mkfa(path, n, L):
    with open(path, "w") as f:
        for i in range(n):
            f.write(">s%d\n%s\n" % (i, "".join(random.choice(B + "N")
                                               for _ in range(L))))

k = random.choice([8, 12, 16])
mkfa(T + "/a.fa", 4, 3000)
mkfa(T + "/b.fa", 2, 2000)
subprocess.run([REF + "/glistmaker", T + "/a.fa", "-w", str(k), "-o", T + "/L"],
               capture_output=True)
subprocess.run([REF + "/glistmaker", T + "/a.fa", "-w", str(k), "--index",
                "-o", T + "/I"], capture_output=True)
subprocess.run([REF + "/glistmaker", T + "/b.fa", "-w", str(k), "-o", T + "/Q"],
               capture_output=True)
L = T + "/L_%d.list" % k
I = T + "/I_%d.index" % k
Q = T + "/Q_%d.list" % k
with open(T + "/words.txt", "w") as f:
    for i in range(30):
        ln = random.choice([k, k, k, k - 1, k + 3])
        f.write("".join(random.choice(B) for _ in range(ln)) + "\n")
fails = 0
for trial in range(30):
    src = random.choice([L, L, I])
    args = [src]
    mode = random.choice(["q", "f", "s", "l", "dump"])
    if mode == "q":
        ln = random.choice([k, k, k + 2])
        args += ["-q", "".join(random.choice(B) for _ in range(ln))]
        if ln > k:
            args += [random.choice(["--3p", "--5p"])]
    elif mode == "f":
        args += ["-f", T + "/words.txt"]
    elif mode == "s":
        args += ["-s", T + "/b.fa"]
    elif mode == "l":
        args += ["-l", Q]
    if random.random() < 0.4:
        args += ["-mm", str(random.choice([1, 2]))]
        if random.random() < 0.5:
            args += ["--all"]
        if random.random() < 0.3:
            args += ["-p", str(random.randint(0, k))]
    if random.random() < 0.3:
        args += ["-min", str(random.randint(0, 3))]
    if random.random() < 0.3:
        args += ["-max", str(random.randint(1, 50))]
    if src == I and random.random() < 0.4:
        args += ["--locations"]
    try:
        r = subprocess.run([REF + "/glistquery"] + args, capture_output=True,
                           timeout=45)
    except subprocess.TimeoutExpired:
        continue   # the reference's -l infinite-loop bug (catalogued)
    o = subprocess.run(["/root/repo/bin/glistquery"] + args,
                       capture_output=True, timeout=45)
    oerr = b"\n".join(l for l in o.stderr.splitlines() if b"xla_bridge" not in l)
    rerr = b"\n".join(r.stderr.splitlines())
    if r.returncode < 0:
        continue
    if (r.returncode, r.stdout, rerr) != (o.returncode, o.stdout, oerr):
        fails += 1
        print("MISMATCH", args)
        print("  rc", r.returncode, o.returncode, "stdout eq",
              r.stdout == o.stdout, "err eq", rerr == oerr)
        if r.stdout != o.stdout:
            import difflib
            for ln2 in list(difflib.unified_diff(
                    r.stdout.decode("latin1").splitlines(),
                    o.stdout.decode("latin1").splitlines()))[:6]:
                print("   ", ln2)
print("seed %s: fails %d" % (sys.argv[1] if len(sys.argv) > 1 else 0, fails))
