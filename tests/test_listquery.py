"""Differential tests: glistquery vs the reference binary."""

import numpy as np
import pytest

from tests.conftest import run_reference, random_fasta
from genometester4_tpu.pipelines.listmaker import make_list
from genometester4_tpu.cli import glistquery as cli


@pytest.fixture
def lists(tmp_path, rng):
    base = random_fasta(rng, 2, 3000, 6000)
    t1 = base + random_fasta(rng, 1, 2000, 3000)
    t2 = base + random_fasta(rng, 1, 2000, 3000)
    (tmp_path / "a.fa").write_text(t1)
    (tmp_path / "b.fa").write_text(t2)
    l1 = tmp_path / "a_12.list"
    l2 = tmp_path / "b_12.list"
    make_list([str(tmp_path / "a.fa")], 12, str(l1))
    make_list([str(tmp_path / "b.fa")], 12, str(l2))
    return l1, l2


def _both(capsys, args):
    r = run_reference(["glistquery"] + [str(a) for a in args])
    rc = cli.main([str(a) for a in args])
    out = capsys.readouterr().out
    assert rc == r.returncode, (rc, r.returncode, r.stderr)
    assert out == r.stdout.decode(), "stdout differs"


def test_full_dump(lists, capsys):
    _both(capsys, [lists[0]])


def test_stats_median_distro_gc(lists, capsys):
    for flag in [["--stats"], ["--median"], ["--distribution", "5"], ["--gc"]]:
        _both(capsys, [lists[0]] + flag)


def test_single_queries(lists, capsys, rng):
    # present word: take one from the dump
    r = run_reference(["glistquery", str(lists[0])])
    word = r.stdout.decode().splitlines()[3].split("\t")[0]
    for args in [["-q", word], ["-q", word, "-mm", "1"],
                 ["-q", word, "-mm", "2", "--all"],
                 ["-q", "TTTTTTTTTTTT"], ["-q", "TTTTTTTTTTTT", "-min", "1"],
                 ["-q", word, "-mm", "1", "-p", "4"],
                 ["-q", word + "ACGT", "--3p"],
                 ["-q", word + "ACGT", "--5p"],
                 ["-q", word, "-min", "2"], ["-q", word, "-max", "1"]]:
        _both(capsys, [lists[0]] + args)


def test_query_file(lists, tmp_path, capsys):
    r = run_reference(["glistquery", str(lists[0])])
    words = [l.split("\t")[0] for l in r.stdout.decode().splitlines()[:20]]
    qf = tmp_path / "queries.txt"
    qf.write_text("\n".join(words) + "\nTTTTTTTTTTTT\n")
    _both(capsys, [lists[0], "-f", qf])
    _both(capsys, [lists[0], "-f", qf, "-mm", "1"])


def test_seq_file(lists, tmp_path, capsys, rng):
    fa = tmp_path / "q.fa"
    fa.write_text(random_fasta(rng, 2, 100, 200, n_prob=0.02))
    _both(capsys, [lists[0], "-s", fa])
    _both(capsys, [lists[0], "-s", fa, "-min", "1"])
    _both(capsys, [lists[0], "-s", fa, "-mm", "1"])


def test_query_list_zipper(lists, tmp_path, capsys):
    """-l zipper. NOTE: the reference INFINITE-LOOPS when the searched
    list exhausts before the query list (src/glistquery.c:702-717 has no
    EOF check in its advance loop); we only compare on inputs where the
    searched list's last word is >= the query's last word, which is the
    only regime the reference can actually process. Our implementation
    terminates in all cases."""
    from genometester4_tpu.formats.list_format import read_list, write_list
    import numpy as np
    h, w, c = read_list(lists[0])
    # query = every third word of the searched list -> reference-safe
    qpath = tmp_path / "query_12.list"
    write_list(qpath, h.word_length, np.asarray(w)[::3], np.asarray(c)[::3])
    _both(capsys, [lists[0], "-l", qpath])
    _both(capsys, [lists[0], "-l", qpath, "-mm", "1"])


def test_query_list_zipper_terminates_where_reference_hangs(lists, capsys):
    """Query list extends past the searched list: the reference would
    hang here; we must terminate and print the overlap."""
    rc = cli.main([str(lists[0]), "-l", str(lists[1])])
    out = capsys.readouterr().out
    assert rc == 0
    assert len(out.splitlines()) > 0


def test_multi_list_table(lists, tmp_path, capsys):
    l1, l2 = lists
    _both(capsys, [l1, l2, "-l", l1])


def test_multi_dump(lists, capsys):
    l1, l2 = lists
    _both(capsys, [l1, l2])
    _both(capsys, [l1, l2, "--is_union"])
    _both(capsys, [l1, l2, "--header"])


def test_errors(lists, capsys):
    l1, l2 = lists
    _both(capsys, [l1, l2, "-q", "ACGTACGTACGT"])
    _both(capsys, [l1, "-q", "ACGT"])  # too short
    _both(capsys, [l1, "-mm", "8", "-p", "8", "-q", "ACGTACGTACGT"])


def test_median_empty_list(tmp_path):
    """Fuzz regression: empty list -median prints 'Average -nan' like
    the reference (x86 0.0/0 division sets the NaN sign bit)."""
    import numpy as np
    from genometester4_tpu.formats.list_format import write_list
    from tests.conftest import run_reference
    p = tmp_path / "e.list"
    write_list(str(p), 27, np.empty(0, np.uint64), np.empty(0, np.uint32))
    ref = run_reference(["glistquery", str(p), "-median"])
    assert ref.returncode == 0
    import io, sys
    from genometester4_tpu.cli.glistquery import main
    old = sys.stdout
    sys.stdout = io.StringIO()
    try:
        rc = main([str(p), "-median"])
        out = sys.stdout.getvalue()
    finally:
        sys.stdout = old
    assert out == ref.stdout.decode().replace(str(p), str(p))


def test_gc_empty_list_prints_negative_nan(tmp_path):
    """Fuzz regression (round 2): --gc on an empty list prints "-nan"
    like the reference (x86 0.0/0.0 sets the NaN sign bit; same quirk
    as the stats Average line, src/glistquery.c:868)."""
    import io
    import contextlib

    import numpy as np
    from genometester4_tpu.formats.list_format import write_list
    from genometester4_tpu.cli.glistquery import main

    p = tmp_path / "empty_9.list"
    write_list(p, 9, np.empty(0, np.uint64), np.empty(0, np.uint32))
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        main([str(p), "--gc"])
    assert out.getvalue() == "GC\t-nan\n"


def test_corrupt_list_chrome_parity(tmp_path, capsys):
    """Stable corrupt-file behaviors match the reference byte-for-byte
    (src/glistquery.c:280-337, src/word-map.c:179-215):

    * empty / bad-magic file -> "not a valid" + "invalid or corrupted"
    * 4-byte magic-only file -> zero-page header, major version 0 ->
      "gt4_word_map_new: incompatible major version 0 (required 4)"
    * sane 4.4 header with truncated records -> "file size too small"
    * 32-byte header (word_bytes/count_bytes on the zero page) -> the
      u64 size product wraps to 0, the check passes, and --stat prints
      the garbage header fields with rc 0

    Cases where the reference SIGBUSes or prints unstable heap garbage
    (record reads past the mapping) are excluded: it is not an oracle
    there.
    """
    import struct

    magic = (71 << 24) | (84 << 16) | (52 << 8) | 67
    cases = {
        "empty.list": b"",
        "magic4.list": struct.pack("<I", magic),
        "badmagic.list": b"not a list at all\n",
        "sane_trunc.list": struct.pack(
            "<IIIIQQQII", magic, 4, 4, 16, 100, 500, 48, 8, 4) + b"A" * 50,
        "t32.list": struct.pack("<IIIIQQ", magic, 4, 4, 16, 1000, 5000),
    }
    for name, blob in cases.items():
        p = tmp_path / name
        p.write_bytes(blob)
        r = run_reference(["glistquery", str(p), "--stat"])
        assert r.returncode >= 0, "reference crashed; not an oracle"
        rc = cli.main([str(p), "--stat"])
        cap = capsys.readouterr()
        assert rc == r.returncode, (name, rc, r.returncode, r.stderr)
        assert cap.out == r.stdout.decode(), name
        assert cap.err == r.stderr.decode(), name


def test_index_locations_through_query_surfaces(tmp_path, rng, capsys):
    """Fuzz regressions: -l/-s/-f against an INDEX with --locations use
    cb_print's three-column form plus per-word location lines, with the
    reference's STICKY qd->reverse (set on the first reverse-canonical
    query, never cleared — src/glistquery.c:517-523,529-538)."""
    base = random_fasta(rng, 3, 2000, 3000)
    (tmp_path / "a.fa").write_text(base)
    (tmp_path / "q.fa").write_text(random_fasta(rng, 1, 800, 900)
                                   + base[:400])
    r = run_reference(["glistmaker", str(tmp_path / "a.fa"), "-w", "12",
                       "--index", "-o", str(tmp_path / "I")])
    assert r.returncode == 0
    r = run_reference(["glistmaker", str(tmp_path / "q.fa"), "-w", "12",
                       "-o", str(tmp_path / "Q")])
    assert r.returncode == 0
    idx = str(tmp_path / "I_12.index")
    q = str(tmp_path / "Q_12.list")
    words = tmp_path / "w.txt"
    words.write_text("".join(
        "".join(rng.choice(list("ACGT"), 12)) + "\n" for _ in range(20)))
    for args in ([idx, "-l", q, "--locations"],
                 [idx, "-s", str(tmp_path / "q.fa"), "--locations"],
                 [idx, "-f", str(words), "--locations"],
                 [idx, "-f", str(words), "--locations", "-mm", "1"]):
        ref = run_reference(["glistquery"] + args)
        rc = cli.main(list(args))
        out = capsys.readouterr().out
        assert rc == ref.returncode, args
        assert out == ref.stdout.decode(), args
