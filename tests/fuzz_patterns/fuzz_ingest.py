"""glistmaker ingestion differential fuzz: random FASTA/FASTQ inputs
through every ingest surface — ragged line widths, CRLF endings,
lowercase bases, IUPAC ambiguity letters (window resets,
src/fasta.c:258-264), blank lines, empty records, long names, gz
compression, stdin streams, multi-file runs, --stream, tiny forced
spill budgets (make_list spill_bytes), and --index outputs — vs the
reference glistmaker, byte-comparing the .list/.index files.

Earlier rounds ran this family from /tmp (fuzz_stream.py, regenerable);
this makes the ingest surface a permanent in-repo pattern.

Usage: python tests/fuzz_patterns/fuzz_ingest.py SEED

Conventions (CLAUDE.md): trials where the reference exits rc<0 are
skipped (not an oracle there); findings get permanent regression tests.
"""
import gzip
import os
import random
import subprocess
import sys
import tempfile

random.seed(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
T = tempfile.mkdtemp()
BIN = "/root/repo/bin"
REF = "/root/repo/.ref_build/src"
ENV = dict(os.environ, GT4_TPU_COUNT_IMPL="host", JAX_PLATFORMS="cpu")
fails = skipped = 0

BASES = "ACGT"
NOISE = "acgtnNRYKMSWBDHVU"  # lowercase (src/fasta.c:66), IUPAC, U


def rand_seq(n):
    out = []
    while len(out) < n:
        run = random.randint(1, 40)
        alpha = BASES if random.random() < 0.8 else NOISE
        out.extend(random.choice(alpha) for _ in range(run))
    return "".join(out[:n])


def rand_name(i):
    r = random.random()
    if r < 0.1:
        return "r%d extra words\ttab" % i
    if r < 0.2:
        return "x" * random.randint(150, 400)
    return "rec%d" % i


def write_input(path, fastq, crlf):
    eol = "\r\n" if crlf else "\n"
    width = random.choice([1, 7, 60, 61, 80, 200, 10 ** 6])
    nrec = random.randint(1, 6)
    with open(path, "w", newline="") as f:
        for i in range(nrec):
            ln = 0 if random.random() < 0.1 else random.randint(1, 30000)
            seq = rand_seq(ln)
            if fastq:
                f.write("@%s%s" % (rand_name(i), eol))
                f.write(seq + eol)
                # '+' line optionally repeats the name; quality bytes
                # may collide with '@'/'>'/'+' record markers
                f.write("+%s%s" % (rand_name(i) if random.random() < 0.3
                                   else "", eol))
                qual = "".join(random.choice("!@>+IJK~#")
                               for _ in range(ln))
                f.write(qual + eol)
            else:
                f.write(">%s%s" % (rand_name(i), eol))
                for j in range(0, ln, width):
                    f.write(seq[j:j + width] + eol)
                if random.random() < 0.15:
                    f.write(eol)  # blank line inside the file
    if random.random() < 0.25:
        with open(path, "rb") as f:
            raw = f.read()
        gz = path + ".gz"
        with gzip.open(gz, "wb") as f:
            f.write(raw)
        return gz
    return path


def run_pair(args_tail, paths, stdin_path=None):
    """Run reference + ours with identical argv; return (ref_rc, outs)"""
    outs = {}
    for tag, prog in (("R", REF + "/glistmaker"),
                      ("O", BIN + "/glistmaker")):
        argv = [prog] + paths + ["-o", T + "/" + tag] + args_tail
        sin = open(stdin_path, "rb") if stdin_path else None
        try:
            r = subprocess.run(argv, env=ENV, capture_output=True,
                               timeout=600, stdin=sin)
        finally:
            if sin:
                sin.close()
        outs[tag] = r
    return outs


for trial in range(10):
    k = random.choice([1, 2, 8, 16, 25, 31, 32])
    nfiles = random.randint(1, 3)
    paths = [write_input(T + "/in%d.f%s" % (fi, "q" if random.random()
                                            < 0.4 else "a"),
                         fastq=random.random() < 0.4,
                         crlf=random.random() < 0.3)
             for fi in range(nfiles)]
    index = random.random() < 0.3
    stream = (not index) and random.random() < 0.25
    # stdin: single plain (non-gz) file only — the reference sniffs gz
    # by filename suffix (src/listmaker-queue.c:120-129)
    use_stdin = (nfiles == 1 and not paths[0].endswith(".gz")
                 and not index and random.random() < 0.3)
    tail = ["-w", str(k)]
    if index:
        tail.append("--index")
    if stream:
        tail.append("--stream")
    ext = "index" if index else "list"
    for tag in ("R", "O"):
        for p in (T + "/%s_%d.%s" % (tag, k, ext),):
            if os.path.exists(p):
                os.unlink(p)
    outs = run_pair(tail, ["-"] if use_stdin else paths,
                    stdin_path=paths[0] if use_stdin else None)
    if outs["R"].returncode < 0:
        skipped += 1
        continue
    ra = T + "/R_%d.%s" % (k, ext)
    oa = T + "/O_%d.%s" % (k, ext)
    rb = open(ra, "rb").read() if os.path.exists(ra) else b"<none>"
    ob = open(oa, "rb").read() if os.path.exists(oa) else b"<none>"
    if rb != ob or outs["R"].returncode != outs["O"].returncode:
        fails += 1
        print("INGEST DIFF trial=%d k=%d files=%s tail=%s stdin=%s "
              "rc=%d/%d bytes=%s" % (trial, k, paths, tail, use_stdin,
                                     outs["R"].returncode,
                                     outs["O"].returncode, rb == ob))

# forced-spill trials: tiny spill budgets + chunk sizes through the
# pipeline API (the CLI has no knob; the reference spills via
# --table_size but its tmp-file cadence is not part of the contract —
# only the final bytes are)
for trial in range(4):
    k = random.choice([9, 25, 32])
    fa = write_input(T + "/sp.fa", fastq=False, crlf=random.random() < 0.3)
    r = subprocess.run([REF + "/glistmaker", fa, "-w", str(k), "-o",
                        T + "/SR"], env=ENV, capture_output=True,
                       timeout=600)
    if r.returncode < 0:
        skipped += 1
        continue
    spill = random.choice([1 << 12, 1 << 16, 1 << 20])
    chunk = random.choice([1 << 12, 1 << 15, 1 << 18])
    code = ("import jax; jax.config.update('jax_platforms','cpu')\n"
            "from genometester4_tpu.pipelines.listmaker import make_list\n"
            "make_list([%r], %d, %r, spill_bytes=%d, chunk_bases=%d)\n"
            % (fa, k, T + "/SO.list", spill, chunk))
    o = subprocess.run([sys.executable, "-c", code], env=ENV,
                       capture_output=True, timeout=600,
                       cwd="/root/repo")
    ra = T + "/SR_%d.list" % k
    rb = open(ra, "rb").read() if os.path.exists(ra) else b"<none>"
    ob = (open(T + "/SO.list", "rb").read()
          if os.path.exists(T + "/SO.list") else b"<err>")
    if o.returncode != 0 or rb != ob:
        fails += 1
        print("SPILL DIFF trial=%d k=%d spill=%d chunk=%d rc=%d\n%s"
              % (trial, k, spill, chunk, o.returncode,
                 o.stderr.decode()[:400]))

print("seed %s: fails %d skipped %d"
      % (sys.argv[1] if len(sys.argv) > 1 else 0, fails, skipped))
