"""Fuzz the native CLI front-end (.gt4cli, native/gt4cli.c).

Random argv streams over the glistcompare/glistquery token pools, each
run twice through bin/<tool>: once normally (native front-end handles
or falls back) and once with GT4_NO_FASTCLI=1 (pure Python launcher).
stdout, stderr, exit code, and every produced output file must be
IDENTICAL — the front-end may never half-handle a case. Trials where
the argv is also reference-safe additionally byte-compare against the
reference binary (skip rc<0: segfault paths are not oracles).

Usage: python tests/fuzz_patterns/fuzz_fastcli.py SEED [N_TRIALS]
"""

from __future__ import annotations

import filecmp
import os
import random
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
BIN = os.path.join(REPO, "bin")
REF = os.path.join(REPO, ".ref_build", "src")


def make_lists(d, rnd):
    import numpy as np
    rng = np.random.default_rng(rnd.randrange(1 << 30))
    sym = np.frombuffer(b"ACGT", np.uint8)
    paths = []
    for i in range(4):
        fa = os.path.join(d, f"in{i}.fa")
        n = rnd.randrange(2_000, 40_000)
        if rnd.random() < 0.3:  # skewed base composition
            seq = sym[rng.choice(4, size=n, p=[.7, .1, .1, .1])]
        else:
            seq = rng.choice(sym, size=n)
        with open(fa, "wb") as f:
            f.write(b">r%d\n" % i + seq.tobytes() + b"\n")
        out = os.path.join(d, f"l{i}")
        r = subprocess.run([os.path.join(REF, "glistmaker"), fa, "-w",
                            str(rnd.choice([12, 16, 25])), "-o", out],
                           capture_output=True)
        assert r.returncode == 0, r.stderr
        got = [p for p in os.listdir(d) if p.startswith(f"l{i}_")]
        paths.append(os.path.join(d, got[0]))
    # one empty and one truncated list
    empty = os.path.join(d, "empty.list")
    data = open(paths[0], "rb").read()
    with open(empty, "wb") as f:
        f.write(data[:48])
    trunc = os.path.join(d, "trunc.list")
    with open(trunc, "wb") as f:
        f.write(data[: max(20, len(data) // 3)])
    return paths + [empty, trunc, os.path.join(d, "nofile.list")]


def make_word_files(d, rnd, lists):
    """Query-word text files: clean exact-k, mixed case, dirty (wrong
    length / non-ACGT / CRLF / empty), and a words-from-list file."""
    import subprocess as sp
    out = []
    r = sp.run([os.path.join(REF, "glistquery"), lists[0]],
               capture_output=True)
    words = [ln.split(b"\t")[0] for ln in r.stdout.splitlines()[:300]]
    clean = os.path.join(d, "w_clean.txt")
    with open(clean, "wb") as f:
        for w in words:
            f.write((w.lower() if rnd.random() < 0.3 else w) + b"\n")
        f.write(b"A" * (len(words[0]) if words else 12) + b"\n")
    out.append(clean)
    dirty = os.path.join(d, "w_dirty.txt")
    with open(dirty, "wb") as f:
        f.write((words[0] if words else b"ACGT") + b"\n")
        f.write(b"ACGTN\n\nACG\nacgtacgtACGTACGTACGTACGTACGTACGT\n")
        f.write((words[1] if len(words) > 1 else b"ACGT") + b"\r\n")
    out.append(dirty)
    out.append(os.path.join(d, "w_missing.txt"))
    return out


GLC_TOKENS = ["-u", "-i", "--union", "--intersection", "--count_only",
              "-c", "2", "-o", "OUT", "-r", "min", "-r", "max",
              "-ss", "rand", "-ss", "rand_unique", "-ss",
              "rand_weighted_unique", "100", "5", "0", "--seed", "7",
              "--seed", "-3", "-D", "--stream", "-d", "-dd", "LIST",
              "LIST", "LIST", "LIST", "99999999999"]
GLQ_TOKENS = ["--stat", "--stats", "-stat", "--median", "--gc",
              "--distribution", "10", "0", "200", "-D", "LIST", "LIST",
              "--locations", "-q", "ACGTACGTACGT", "-min", "2", "LIST",
              "-l", "LIST", "-l", "LIST", "-f", "WORDS", "-f", "WORDS"]


def run_pair(tool, argv, cwd):
    env_n = dict(os.environ)
    env_p = dict(os.environ, GT4_NO_FASTCLI="1")
    def go(env, tag):
        wd = os.path.join(cwd, tag)
        os.makedirs(wd, exist_ok=True)
        r = subprocess.run([os.path.join(BIN, tool)] + argv, cwd=wd,
                           capture_output=True, env=env, timeout=60)
        return r, wd
    rn, wn = go(env_n, "native")
    rp, wp = go(env_p, "python")
    fail = []
    if rn.returncode != rp.returncode:
        fail.append(f"rc {rn.returncode} != {rp.returncode}")
    if rn.stdout != rp.stdout:
        fail.append(f"stdout {rn.stdout[:80]!r} != {rp.stdout[:80]!r}")
    if rn.stderr != rp.stderr:
        fail.append(f"stderr {rn.stderr[:80]!r} != {rp.stderr[:80]!r}")
    fn = sorted(os.listdir(wn))
    fp = sorted(os.listdir(wp))
    if fn != fp:
        fail.append(f"files {fn} != {fp}")
    else:
        for name in fn:
            if not filecmp.cmp(os.path.join(wn, name),
                               os.path.join(wp, name), shallow=False):
                fail.append(f"file bytes differ: {name}")
    import shutil
    shutil.rmtree(wn)
    shutil.rmtree(wp)
    return fail


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n_trials = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    rnd = random.Random(seed)
    fails = 0
    with tempfile.TemporaryDirectory() as d:
        lists = make_lists(d, rnd)
        word_files = make_word_files(d, rnd, lists)
        for t in range(n_trials):
            tool, pool = rnd.choice([("glistcompare", GLC_TOKENS),
                                     ("glistquery", GLQ_TOKENS)])
            n_tok = rnd.randrange(1, 7)
            argv = []
            for _ in range(n_tok):
                tok = rnd.choice(pool)
                if tok == "LIST":
                    tok = rnd.choice(lists)
                elif tok == "WORDS":
                    tok = rnd.choice(word_files)
                elif tok == "OUT":
                    tok = "out%d" % rnd.randrange(3)
                argv.append(tok)
            try:
                fail = run_pair(tool, argv, d)
            except subprocess.TimeoutExpired:
                print(f"[{t}] TIMEOUT {tool} {argv}")
                continue
            if fail:
                fails += 1
                print(f"[{t}] FAIL {tool} {argv}: {fail}")
        print(f"done: {n_trials} trials, {fails} failures (seed {seed})")
        sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
