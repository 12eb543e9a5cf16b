"""gdistribution: no differential oracle exists (the reference file is
bit-rotted, src/gdistribution.c includes the long-gone wordmap.h and has
no Makefile rule), so the vectorized implementation is checked against
an independent pure-Python transliteration of the C zipper
(src/gdistribution.c:81-142)."""

import io
import contextlib

import numpy as np
import pytest

from genometester4_tpu.cli.gdistribution import main
from genometester4_tpu.formats.list_format import write_list


def _c_twin(w1, c1, w2, c2):
    """Line-by-line transliteration of get_distribution
    (src/gdistribution.c:81-142): returns (stderr, stdout)."""
    err = ["Total size %d\n" % (len(w1) + len(w2)), "Finding intersection\n"]
    flist = []
    i0 = i1 = 0
    while i0 < len(w1) and i1 < len(w2):
        if w1[i0] == w2[i1]:
            flist.append(np.float32(c2[i1]))
            i0 += 1
            i1 += 1
        elif w1[i0] < w2[i1]:
            flist.append(np.float32(0))
            i0 += 1
        else:
            i1 += 1
    err.append("Size %d\n" % len(flist))
    if not flist:
        return "".join(err), ""
    err.append("Sorting\n")
    flist.sort()
    err.append("Done\n")
    out = []
    j = 0
    while j < len(flist):
        count = 0
        current = flist[j]
        while j < len(flist) and flist[j] == current:
            count += 1
            j += 1
        out.append("%g\t%u\n" % (current, count))
    return "".join(err), "".join(out)


def _run(argv):
    so, se = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(so), contextlib.redirect_stderr(se):
        rc = main(argv)
    return rc, so.getvalue(), se.getvalue()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_c_twin(tmp_path, seed):
    rng = np.random.default_rng(seed)
    w1 = np.unique(rng.integers(0, 4000, size=800).astype(np.uint64))
    c1 = rng.integers(1, 50, size=len(w1)).astype(np.uint32)
    w2 = np.unique(rng.integers(0, 4000, size=600).astype(np.uint64))
    c2 = rng.integers(1, 50, size=len(w2)).astype(np.uint32)
    p1, p2 = str(tmp_path / "a_6.list"), str(tmp_path / "b_6.list")
    write_list(p1, 6, w1, c1)
    write_list(p2, 6, w2, c2)
    rc, out, err = _run([p1, p2])
    twin_err, twin_out = _c_twin(w1, c1, w2, c2)
    assert rc == 0
    assert err == "%s %s\n" % (p1, p2) + twin_err
    assert out == twin_out


def test_empty_intersection_buffer(tmp_path):
    """LIST1 entirely above max(LIST2): zipper records nothing, prints
    Size 0 and returns before Sorting (src/gdistribution.c:117-119)."""
    p1, p2 = str(tmp_path / "a_6.list"), str(tmp_path / "b_6.list")
    write_list(p1, 6, np.array([100, 101], np.uint64),
               np.array([1, 1], np.uint32))
    write_list(p2, 6, np.array([5, 7], np.uint64),
               np.array([3, 4], np.uint32))
    rc, out, err = _run([p1, p2])
    assert rc == 0
    assert out == ""
    assert err.endswith("Size 0\n")
    assert "Sorting" not in err


def test_list2_only_words_record_nothing(tmp_path):
    p1, p2 = str(tmp_path / "a_6.list"), str(tmp_path / "b_6.list")
    write_list(p1, 6, np.array([10], np.uint64), np.array([1], np.uint32))
    write_list(p2, 6, np.array([5, 10, 20], np.uint64),
               np.array([3, 7, 9], np.uint32))
    rc, out, err = _run([p1, p2])
    assert rc == 0
    assert out == "7\t1\n"


def test_usage(tmp_path):
    rc, out, err = _run(["only_one"])
    assert rc == 1
    assert err == "gdistribution LIST LIST2\n"
