"""Round-3 debug-surface fuzz: random regions x random debug flag
combos (-D, -D -D, -DG, -DG -DG, mixed, with/without --snvs/--fp and
trace-shifting tuning flags) vs the reference, byte-compare
stdout+stderr.  Targets the round-3 -DD per-read/per-kmer traces and
-DG level-2 consensus/name dumps."""
import subprocess, sys, os, random
random.seed(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
FIX = "/tmp/gasm_bench"
if not os.path.exists(os.path.join(FIX, "regions.txt")):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(sys.path[0]))
    import pathlib
    import test_gassembler as tg

    class _F:
        def mktemp(self, n):
            os.makedirs(FIX, exist_ok=True)
            return pathlib.Path(FIX)
    tg.katk_fixture.__wrapped__(_F())
regions = open(os.path.join(FIX, "regions.txt")).read().splitlines()
fails = 0
for trial in range(16):
    dbg = random.choice([["-D"], ["-D", "-D"], ["-DG"], ["-DG", "-DG"],
                         ["-D", "-D", "-DG"], ["-D", "-DG", "-DG"],
                         ["-D", "-D", "-DG", "-DG"], ["-D", "-D", "-D"],
                         ["-D", "-D", "-D", "-DG", "-DG"]])
    args = ["--dbi", "db.idx", "--num_threads", "1",
            "--coverage", "40", "--sex", "female"] + dbg
    sel = random.sample(regions, random.randint(1, 4))
    random.shuffle(sel)
    rf = "/tmp/fzd_regions_%d.txt" % trial
    open(rf, "w").write("\n".join(sel) + "\n")
    args += ["--region_file", rf]
    if random.random() < 0.5:
        parts = sel[0].split("\t")
        start = int(parts[1])
        off = random.randint(30, 140)
        rb = parts[3][off]
        alt = random.choice([c for c in "ACGT" if c != rb])
        open("/tmp/fzd_snv.txt", "w").write(
            "%s:%d:rs1:%s/%s\tAB\n" % (parts[0], start + off + 1, rb, alt))
        args += ["--snvs", "/tmp/fzd_snv.txt"]
    if random.random() < 0.4:
        for flag, lo, hi in (("--min_align_len", 3, 60),
                             ("--max_divergent", 1, 10),
                             ("--min_group_size", 1, 8),
                             ("--max_group_divergence", 0, 8)):
            if random.random() < 0.5:
                args += [flag, str(random.randint(lo, hi))]
    r = subprocess.run(["/root/repo/.ref_build/src/gassembler"] + args,
                       capture_output=True, cwd=FIX, timeout=300)
    o = subprocess.run(["/root/repo/bin/gassembler"] + args,
                       capture_output=True, cwd=FIX, timeout=300)
    oerr = b"\n".join(l for l in o.stderr.splitlines()
                      if b"xla_bridge" not in l)
    rerr = b"\n".join(r.stderr.splitlines())
    if r.returncode < 0:
        print("SKIP (ref crash)", trial)
        continue
    if (r.returncode, r.stdout, rerr) != (o.returncode, o.stdout, oerr):
        fails += 1
        print("MISMATCH", args)
        print("  rc", r.returncode, o.returncode,
              "stdout eq", r.stdout == o.stdout)
        if rerr != oerr:
            import difflib
            for l in list(difflib.unified_diff(
                    rerr.decode("latin1").splitlines(),
                    oerr.decode("latin1").splitlines()))[:12]:
                print("   ", l)
print("seed %s: fails %d" % (sys.argv[1] if len(sys.argv) > 1 else 0,
                             fails))
