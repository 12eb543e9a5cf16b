"""Host-vs-device placement parity at random shapes: glistmaker,
glistcompare, gmer_counter count+index on the CPU backend."""
import subprocess, sys, os, random, tempfile
random.seed(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
T = tempfile.mkdtemp()
BIN = "/root/repo/bin"
env_h = dict(os.environ, GT4_TPU_COUNT_IMPL="host",
             GT4_TPU_SETOPS_IMPL="host", JAX_PLATFORMS="cpu")
env_d = dict(os.environ, GT4_TPU_COUNT_IMPL="device",
             GT4_TPU_SETOPS_IMPL="device", JAX_PLATFORMS="cpu")
fails = 0
for trial in range(4):
    k = random.choice([5, 11, 17, 25, 31])
    with open(T + "/x.fa", "w") as f:
        for i in range(random.randint(1, 4)):
            f.write(">s%d\n%s\n" % (i, "".join(
                random.choice("ACGTN") for _ in range(random.randint(50, 9000)))))
    for env, tag in ((env_h, "h"), (env_d, "d")):
        subprocess.run([BIN + "/glistmaker", T + "/x.fa", "-w", str(k),
                        "-o", T + "/" + tag], env=env, capture_output=True,
                       timeout=300)
    a = open(T + "/h_%d.list" % k, "rb").read()
    b = open(T + "/d_%d.list" % k, "rb").read()
    if a != b:
        fails += 1
        print("LISTMAKER IMPL DIFF k=%d" % k)
    for env, tag in ((env_h, "h2"), (env_d, "d2")):
        subprocess.run([BIN + "/glistcompare", T + "/h_%d.list" % k,
                        T + "/h_%d.list" % k, "-u", "-i", "-d",
                        "-o", T + "/" + tag], env=env,
                       capture_output=True, timeout=300)
    for op in ("union", "intrsec", "0_diff1"):
        fa = T + "/h2_%d_%s.list" % (k, op)
        fb = T + "/d2_%d_%s.list" % (k, op)
        if open(fa, "rb").read() != open(fb, "rb").read():
            fails += 1
            print("COMPARE IMPL DIFF k=%d %s" % (k, op))
print("seed %s: fails %d" % (sys.argv[1] if len(sys.argv) > 1 else 0, fails))

# round 3: --index host (native posdir extract + stable pair sort +
# fused record emit) vs device impl vs the reference, random shapes
# incl. FASTQ and multi-file
for trial in range(4):
    k = random.choice([7, 16, 25, 32])
    paths = []
    for fi in range(random.randint(1, 3)):
        p = T + "/ix%d.f%s" % (fi, random.choice(["a", "q"]))
        with open(p, "w") as f:
            for i in range(random.randint(1, 5)):
                seq = "".join(random.choice("ACGTN")
                              for _ in range(random.randint(30, 6000)))
                if p.endswith("a"):
                    f.write(">r%d\n%s\n" % (i, seq))
                else:
                    f.write("@r%d\n%s\n+\n%s\n" % (i, seq, "I" * len(seq)))
        paths.append(p)
    for env, tag in ((env_h, "ih"), (env_d, "id")):
        subprocess.run([BIN + "/glistmaker"] + paths + ["-w", str(k),
                        "-o", T + "/" + tag, "--index"], env=env,
                       capture_output=True, timeout=300)
    r = subprocess.run(["/root/repo/.ref_build/src/glistmaker"] + paths
                       + ["-w", str(k), "-o", T + "/ir", "--index"],
                       capture_output=True, timeout=300)
    a = open(T + "/ih_%d.index" % k, "rb").read()
    b = open(T + "/id_%d.index" % k, "rb").read()
    c = open(T + "/ir_%d.index" % k, "rb").read() if r.returncode == 0 \
        else a
    if a != b or a != c:
        fails += 1
        print("INDEX IMPL DIFF k=%d hd=%s ref=%s" % (k, a == b, a == c))
print("index trials: fails %d" % fails)
