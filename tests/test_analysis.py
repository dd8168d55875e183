"""Analysis family tests: interval algebra, turnover CTMC fit, and the
neutral-indel tree pipeline end-to-end on a random alignment (reference
analysis/neutralIndel/*, analysis/constraintTurnover/turnoverModel.py)."""

import os
import random
import subprocess
import sys

import numpy as np
import pytest

from hal_tpu.analysis.intervals import IntervalSet, merge_intervals
from hal_tpu.analysis import turnover_model as tm


def run_tool(tool, *args):
    return subprocess.run(
        [sys.executable, "-m", "hal_tpu.tools." + tool, *args],
        capture_output=True, text=True, timeout=600)


# ---------------------------------------------------------------- intervals

def _brute_membership(iv, lo, hi):
    m = np.zeros(hi - lo, dtype=bool)
    for s, e in iv:
        m[max(s, lo) - lo:max(min(e, hi) - lo, 0)] = True
    return m


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_interval_algebra_matches_bitmask(seed):
    rng = np.random.default_rng(seed)
    n = 40
    a = np.stack([rng.integers(0, 500, n), np.zeros(n, np.int64)], axis=1)
    a[:, 1] = a[:, 0] + rng.integers(1, 40, n)
    b = np.stack([rng.integers(0, 500, n), np.zeros(n, np.int64)], axis=1)
    b[:, 1] = b[:, 0] + rng.integers(1, 40, n)
    A = IntervalSet({"chr1": a})
    B = IntervalSet({"chr1": b})
    ma = _brute_membership(a, 0, 600)
    mb = _brute_membership(b, 0, 600)
    assert A.total_length() == int(ma.sum())
    assert A.intersect(B).total_length() == int((ma & mb).sum())
    assert A.subtract(B).total_length() == int((ma & ~mb).sum())
    assert A.union(B).total_length() == int((ma | mb).sum())
    # merged output is sorted and disjoint
    m = merge_intervals(a)
    assert (m[1:, 0] > m[:-1, 1]).all()


def test_interval_overlap_counts():
    s = IntervalSet({"chr1": np.array([[10, 20], [30, 40]])})
    c = s.overlap_counts(["chr1", "chr1", "chr2"], [15, 25, 15], [35, 28, 35])
    assert list(c) == [2, 0, 0]


# ------------------------------------------------------------- CTMC model

def test_turnover_model_roundtrip():
    rng = random.Random(42)
    lr, gr = 0.3, 0.2
    data = tm.generate_data(20, (0.1, 1.0), lr, gr, 0.0, rng)
    # noiseless data: the true parameters are an exact optimum
    assert tm.diff_sq_many_points(lr, gr, data) < 1e-12
    # the reference's randomized coordinate descent is coarse by design
    # (turnoverModel.py:91-161 gives up after 8 non-improving draws); require
    # only that it improves substantially on its start
    start = (0.05, 0.05)
    fit_lr, fit_gr, dsq = tm.grad_descent(*start, data, 3000, 0.005, rng)
    start_obj = tm.diff_sq_many_points(*start, data)
    assert dsq <= start_obj and dsq < float("inf")
    assert fit_lr > 0 and fit_gr > 0
    P = tm.compute_p_matrix(lr, gr, 0.5)
    pi = tm.compute_stationary_dist(lr, gr, 0.5)
    # stationary distribution is a fixed point of P as t -> inf: check row sums
    assert abs(sum(pi) - 1.0) < 1e-9
    assert abs(P[0][0] + P[0][1] - 1.0) < 1e-9


# ---------------------------------------------------- neutral-indel pipeline

@pytest.fixture(scope="module")
def ni_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("ni")
    hal = str(d / "ni.halz")
    r = run_tool("halRandGen", hal, "--seed", "11", "--maxGenomes", "4",
                 "--maxSegments", "60", "--maxSegmentLength", "30")
    assert r.returncode == 0, r.stderr
    work = str(d / "work")
    os.makedirs(work, exist_ok=True)
    return hal, work


def test_tree_mutations(ni_setup):
    hal, work = ni_setup
    r = run_tool("halTreeMutations", hal, work, "--doSnps")
    assert r.returncode == 0, r.stderr
    beds = [f for f in os.listdir(work) if f.endswith(".bed")]
    assert beds, "no mutation beds written"
    for f in beds:
        lines = open(os.path.join(work, f)).read().splitlines()
        assert lines[0].startswith("#Sequence")
        body = [l for l in lines if not l.startswith("#")]
        # sorted per sequence
        prev = None
        for l in body:
            t = l.split("\t")
            assert len(t) == 6
            key = (t[0], int(t[1]))
            if prev is not None and prev[0] == key[0]:
                assert prev[1] <= key[1]
            prev = key


def test_ni_background_and_conservation(ni_setup):
    hal, work = ni_setup
    r = run_tool("halTreeNIBackground", hal, work)
    assert r.returncode == 0, r.stderr
    assert any(f.endswith("_bg.bed") for f in os.listdir(work))
    r = run_tool("halTreeNIConservation", hal, work)
    assert r.returncode == 0, r.stderr
    assert "bgrate=" in r.stdout


def test_ni_turnover(ni_setup):
    hal, work = ni_setup
    r = run_tool("halTreeNITurnover", hal, work)
    assert r.returncode == 0, r.stderr
    # output only for branches below internal nodes; any produced lines must
    # have the reference's 13-token shape (estimateTurnoverParams.py:40-55)
    to_path = os.path.join(work, "turnover.txt")
    with open(to_path, "w") as f:
        f.write(r.stdout)
    for line in r.stdout.splitlines():
        if ": cons" in line:
            assert len(line.split()) == 13
    if any(": cons" in l for l in r.stdout.splitlines()):
        r2 = run_tool("estimateTurnoverParams", hal, to_path,
                      "--maxIt", "200", "--seed", "0")
        assert r2.returncode == 0, r2.stderr


# ---------------------------------------------------------- status/synteny

def _first_leaf_pair(hal):
    genomes = run_tool("halStats", hal, "--genomes").stdout.split()
    leaves = [g for g in genomes
              if not run_tool("halStats", hal, "--children", g).stdout.strip()]
    return leaves[0], leaves[-1]


def test_liftover_status(ni_setup, tmp_path):
    hal, _ = ni_setup
    src, tgt = _first_leaf_pair(hal)
    seqs = run_tool("halStats", hal, "--bedSequences", src).stdout.splitlines()
    seq, _, end = seqs[0].split("\t")[:3]
    bed = tmp_path / "q.bed"
    hi = min(int(end), 50)
    bed.write_text("%s\t0\t%d\tgeneA\t0\t+\n" % (seq, hi))
    out = tmp_path / "status.tsv"
    r = run_tool("halLiftoverStatus", str(bed), hal, src, tgt, str(out))
    assert r.returncode == 0, r.stderr
    lines = out.read_text().splitlines()
    assert lines[0].startswith("#Name\tLength\tMap")
    toks = lines[1].split("\t")
    assert toks[0] == "geneA" and int(toks[1]) == hi
    assert 0 <= int(toks[2]) <= hi * 4


def test_synteny_psl_roundtrip(ni_setup, tmp_path):
    """halSynteny from HAL, then re-chain its own PSL via --alignmentIsPsl
    (reference synteny/impl/halSynteny.cpp:148 syntenyFromPsl)."""
    hal, _ = ni_setup
    src, tgt = _first_leaf_pair(hal)
    psl1 = tmp_path / "a.psl"
    r = run_tool("halSynteny", hal, str(psl1), "--queryGenome", src,
                 "--targetGenome", tgt, "--minBlockSize", "1",
                 "--maxAnchorDistance", "1000000")
    assert r.returncode == 0, r.stderr
    lines1 = psl1.read_text().splitlines()
    if not lines1:
        pytest.skip("no syntenic anchors in this fixture")
    for l in lines1:
        assert len(l.split("\t")) == 21
    psl2 = tmp_path / "b.psl"
    r = run_tool("halSynteny", str(psl1), str(psl2), "--alignmentIsPsl",
                 "--minBlockSize", "1", "--maxAnchorDistance", "1000000")
    assert r.returncode == 0, r.stderr
    lines2 = psl2.read_text().splitlines()
    assert lines2
    # chaining an already-chained PSL must conserve total matched bases
    m1 = sum(int(l.split("\t")[0]) for l in lines1)
    m2 = sum(int(l.split("\t")[0]) for l in lines2)
    assert m1 == m2


def test_synteny_rates(ni_setup, tmp_path):
    hal, _ = ni_setup
    src, tgt = _first_leaf_pair(hal)
    seqs = run_tool("halStats", hal, "--bedSequences", src).stdout.splitlines()
    seq, _, end = seqs[0].split("\t")[:3]
    end = int(end)
    if end < 30:
        pytest.skip("sequence too short")
    bed = tmp_path / "genes.bed"
    bed.write_text("%s\t0\t10\tg1\t0\t+\n%s\t15\t25\tg2\t0\t+\n" % (seq, seq))
    r = run_tool("syntenyRates", hal, src, str(bed), tgt)
    assert r.returncode == 0, r.stderr
    assert "gene pair synteny rate" in r.stdout
