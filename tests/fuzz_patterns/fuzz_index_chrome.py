"""Fuzz corrupt/truncated .index handling chrome vs the reference.

Round-3 VERDICT next #8: the .list corrupt-chrome twin exists
(fuzz patterns + test_cli_chrome), the .index one didn't. Each trial
takes a valid .index, applies a random corruption — truncation at a
random offset, magic/version/word-length/bitsize field flips, random
byte flips in header or blob — and runs glistquery over it with a
random command (--stat, --locations, dump, -q, --files, --sequences).
stdout/stderr/exit must match the reference byte-for-byte; trials where
the reference crashes (rc < 0) are skipped — it is not an oracle there
(CLAUDE.md convention).

Usage: python tests/fuzz_patterns/fuzz_index_chrome.py SEED [N_TRIALS]
"""

from __future__ import annotations

import os
import random
import struct
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
BIN = os.path.join(REPO, "bin")
REF = os.path.join(REPO, ".ref_build", "src")


def make_index(d, rnd):
    import numpy as np
    rng = np.random.default_rng(rnd.randrange(1 << 30))
    sym = np.frombuffer(b"ACGT", np.uint8)
    fa = os.path.join(d, "in.fa")
    with open(fa, "wb") as f:
        for i in range(rnd.randrange(1, 4)):
            n = rnd.randrange(1_000, 20_000)
            f.write(b">c%d\n" % i + rng.choice(sym, size=n).tobytes()
                    + b"\n")
    k = rnd.choice([12, 16, 21])
    r = subprocess.run([os.path.join(REF, "glistmaker"), fa, "-w", str(k),
                        "--index", "-o", os.path.join(d, "ix")],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    return os.path.join(d, "ix_%d.index" % k), k


def corrupt(data: bytes, rnd) -> bytes:
    mode = rnd.randrange(6)
    b = bytearray(data)
    if mode == 0:                      # truncate
        return bytes(b[: rnd.randrange(0, len(b))]), False
    if mode == 1:                      # magic flip
        b[rnd.randrange(4)] ^= 0xFF
        return bytes(b), False
    if mode == 2:                      # version fields
        struct.pack_into("<II", b, 4, rnd.randrange(0, 9),
                         rnd.randrange(0, 9))
        return bytes(b), False
    if mode == 3:                      # word length
        v = rnd.choice([0, 1, 33, 64, 2 ** 31])
        struct.pack_into("<I", b, 12, v)
        # word_length > 32 puts the reference's word_to_string into
        # C shift-count UB ((word >> 2*(len-1-i)) with count > 63,
        # x86-masked) — not an oracle there
        return bytes(b), v > 32
    if mode == 4:                      # bitsize / layout fields
        off = rnd.choice([32, 36, 40, 44, 48, 56, 64])
        if off + 4 <= len(b):
            struct.pack_into("<I", b, off, rnd.randrange(0, 1 << 31))
        return bytes(b), False
    # random byte flips anywhere
    for _ in range(rnd.randrange(1, 8)):
        b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
    return bytes(b), False


COMMANDS = [["--stat"], ["--locations"], [], ["--files"], ["--sequences"],
            ["-q", "ACGTACGTACGTACGTACGTACGT"], ["--median"]]


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n_trials = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    rnd = random.Random(seed)
    fails = skipped = 0
    with tempfile.TemporaryDirectory() as d:
        idx, k = make_index(d, rnd)
        base = open(idx, "rb").read()
        for t in range(n_trials):
            bad = os.path.join(d, "bad.index")
            data, nonoracle = corrupt(base, rnd)
            with open(bad, "wb") as f:
                f.write(data)
            cmd = rnd.choice(COMMANDS)
            if not nonoracle and len(data) >= 72:
                # any in-header-declared region beyond EOF makes the
                # reference read past its mmap: SIGBUS or adjacent-
                # mapping garbage depending on address-space layout —
                # not an oracle (it may still exit 0)
                (_c, _vj, _vn, _wl, nw, nl, _fb, _sb, _pb, _f, fs, ks,
                 ls) = struct.unpack_from("<IIIIQQIIIIQQQ", data, 0)
                if (fs + 16 > len(data) or ks + 16 * nw > len(data)
                        or (cmd == ["--locations"]
                            and ls + 8 * nl > len(data))):
                    nonoracle = True
            if nonoracle:
                skipped += 1
                continue
            try:
                rr = subprocess.run([os.path.join(REF, "glistquery"), bad]
                                    + cmd, capture_output=True, timeout=30)
            except subprocess.TimeoutExpired:
                skipped += 1
                continue
            if rr.returncode < 0:
                skipped += 1     # reference crashed: not an oracle
                continue
            try:
                ro = subprocess.run([os.path.join(BIN, "glistquery"), bad]
                                    + cmd, capture_output=True, timeout=60)
            except subprocess.TimeoutExpired:
                fails += 1
                print(f"[{t}] OURS TIMEOUT: {cmd}")
                continue
            if (ro.returncode != rr.returncode or ro.stdout != rr.stdout
                    or ro.stderr != rr.stderr):
                fails += 1
                print(f"[{t}] FAIL {cmd}: rc {ro.returncode}/"
                      f"{rr.returncode} out {ro.stdout[:60]!r}/"
                      f"{rr.stdout[:60]!r} err {ro.stderr[:60]!r}/"
                      f"{rr.stderr[:60]!r}")
        print(f"done: {n_trials} trials, {fails} failures, "
              f"{skipped} skipped-nonoracle (seed {seed})")
        sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
