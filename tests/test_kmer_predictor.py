"""kmer_predictor: no differential oracle exists (the reference program
is bit-rotted — src/kmer-predictor.c accesses pre-refactor
GT4WordSArrayInstance fields and does not compile against its own
tree), so the vectorized implementation is checked against an
independent pure-Python transliteration of the C program
(src/kmer-predictor.c:115-233), the same strategy
tests/test_gdistribution.py uses. Scalar zipper loops, C double
accumulation order, C printf formats.

The defined-behavior domain only: n_lists > DELTA (20). With fewer
lists the reference's unsigned (n_lists - DELTA) wraps and its loops
read out of bounds — non-oracle UB (COVERAGE.md "Known gaps").
"""

import io
import contextlib

import numpy as np
import pytest

from genometester4_tpu.cli.kmer_predictor import main, DELTA
from genometester4_tpu.formats.list_format import write_list


def _c_linreg(x, y):
    """src/kmer-predictor.c:239-263; r is uninitialized on the success
    path in C (stable 0 via our twin, matching the CLI)."""
    n = len(x)
    sx = sy = sx2 = sy2 = sxy = 0.0
    for i in range(n):
        sx += x[i]
        sy += y[i]
        sx2 += x[i] * x[i]
        sy2 += y[i] * y[i]
        sxy += x[i] * y[i]
    d = n * sx2 - sx * sx
    if d == 0:
        return 0.0, 0.0, 0.0
    a = (sy * sx2 - sx * sxy) / d
    b = (n * sxy - sx * sy) / d
    d2 = (n * sx2 - sx * sx) * (n * sy2 - sy * sy)
    if d2 <= 0:
        return 0.0, 0.0, 0.0
    return a, b, 0.0


def _c_twin(panel, samples, ffs_in, names, max_kmers):
    """Scalar transliteration of main's model loops
    (src/kmer-predictor.c:115-233). samples: list of (words, counts)
    sorted ascending. Returns (stderr_text, coeffs_text)."""
    n_lists = len(names)
    avg_ff = 0.0
    for f in ffs_in:
        avg_ff += f
    avg_ff /= n_lists
    ffs = [f - avg_ff for f in ffs_in]
    nw = min(len(panel), max_kmers)
    a = [0.0] * nw
    b = [0.0] * nw
    ptr = [0] * n_lists
    counts_at = [[0.0] * nw for _ in range(n_lists)]
    for wi in range(nw):           # training zipper (c:141-186)
        w = int(panel[wi])
        avg_0 = avg_1 = 0.0
        count_0 = count_1 = 0.0
        for i in range(n_lists - DELTA):
            ws, cs = samples[i]
            while ptr[i] < len(ws) and int(ws[ptr[i]]) < w:
                ptr[i] += 1
            if ptr[i] < len(ws) and int(ws[ptr[i]]) == w:
                counts_at[i][wi] = float(cs[ptr[i]])
                avg_1 += float(cs[ptr[i]]) * ffs[i]
                count_1 += float(cs[ptr[i]])
            else:
                avg_0 += ffs[i]
                count_0 += 1.0
        a[wi] = avg_0 / count_0 if count_0 else 0.0
        b[wi] = avg_1 / count_1 if count_1 else 0.0
    pred_ffs = [0.0] * n_lists
    for i in range(n_lists):       # prediction zipper (c:190-214)
        ws, cs = samples[i]
        p = 0
        for wi in range(nw):
            w = int(panel[wi])
            while p < len(ws) and int(ws[p]) < w:
                p += 1
            count = float(cs[p]) if p < len(ws) and int(ws[p]) == w else 0.0
            pred_ffs[i] += a[wi] if not count else b[wi]
    pa, pb, pr = _c_linreg(pred_ffs[:n_lists - DELTA],
                           ffs[:n_lists - DELTA])
    coeffs = "AVG_FF\t%.3g\n" % avg_ff
    coeffs += "SCALE\t%g\t%g\t%g\n" % (pa, pb, pr)
    for wi in range(nw):
        coeffs += "%g\t%g\n" % (a[wi], b[wi])
    err = ""
    for i in range(n_lists):       # c:225-229
        pred = pa + pb * pred_ffs[i]
        err += "%s\t%.3f\t%.3f\n" % (names[i], ffs[i] + avg_ff,
                                     pred + avg_ff)
    return err, coeffs


def _run(argv):
    so, se = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(so), contextlib.redirect_stderr(se):
        rc = main(argv)
    return rc, so.getvalue(), se.getvalue()


def _make_inputs(tmp_path, rng, n_lists, universe=3000, panel_n=400):
    panel = np.unique(rng.integers(0, universe, panel_n).astype(np.uint64))
    write_list(str(tmp_path / "panel_8.list"), 8, panel,
               rng.integers(1, 9, len(panel)).astype(np.uint32))
    names, samples, ffs, lines = [], [], [], []
    for s in range(n_lists):
        w = np.unique(rng.integers(0, universe,
                                   rng.integers(50, 600)).astype(np.uint64))
        c = rng.integers(1, 40, len(w)).astype(np.uint32)
        p = str(tmp_path / f"s{s}_8.list")
        write_list(p, 8, w, c)
        ff = float(round(rng.uniform(5, 40), 2))
        names.append(f"sample{s}")
        samples.append((w, c))
        ffs.append(ff)
        lines.append(f"sample{s}\t{p}\t{ff}")
    (tmp_path / "lists.txt").write_text("\n".join(lines) + "\n")
    return panel, names, samples, ffs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_c_twin(tmp_path, seed):
    rng = np.random.default_rng(seed)
    n_lists = int(rng.integers(DELTA + 2, DELTA + 12))
    panel, names, samples, ffs = _make_inputs(tmp_path, rng, n_lists)
    coeffs_path = str(tmp_path / "coeffs.txt")
    rc, out, err = _run(["--kmers", str(tmp_path / "panel_8.list"),
                         "--lists", str(tmp_path / "lists.txt"),
                         "--write_coefficients", coeffs_path])
    twin_err, twin_coeffs = _c_twin(panel, samples, ffs, names,
                                    10 ** 9)
    assert rc == 0
    assert err == twin_err
    assert (tmp_path / "coeffs.txt").read_text() == twin_coeffs


def test_max_kmers_truncates_like_reference(tmp_path):
    """The reference breaks out of every zipper once idx reaches
    max_kmers (src/kmer-predictor.c:185,213,220)."""
    rng = np.random.default_rng(7)
    panel, names, samples, ffs = _make_inputs(tmp_path, rng, DELTA + 5)
    coeffs_path = str(tmp_path / "c.txt")
    rc, out, err = _run(["--kmers", str(tmp_path / "panel_8.list"),
                         "--lists", str(tmp_path / "lists.txt"),
                         "--max_kmers", "37",
                         "--write_coefficients", coeffs_path])
    twin_err, twin_coeffs = _c_twin(panel, samples, ffs, names, 37)
    assert rc == 0
    assert err == twin_err
    assert (tmp_path / "c.txt").read_text() == twin_coeffs
    # coefficients file holds exactly header + 37 kmer rows
    assert len((tmp_path / "c.txt").read_text().splitlines()) == 2 + 37


def test_missing_list_file_errors(tmp_path):
    rng = np.random.default_rng(9)
    _make_inputs(tmp_path, rng, DELTA + 3)
    (tmp_path / "lists.txt").write_text(
        "x\t%s\t10.0\n" % str(tmp_path / "nope_8.list"))
    rc, out, err = _run(["--kmers", str(tmp_path / "panel_8.list"),
                         "--lists", str(tmp_path / "lists.txt")])
    assert rc == 1
    assert "Cannot open list" in err
