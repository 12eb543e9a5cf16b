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
