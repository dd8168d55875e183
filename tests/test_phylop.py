"""In-process phyloP scoring (hal_tpu.phylop) — replaces the reference's
phast delegation (phyloP/impl/halPhyloP.cpp).  Checks the .mod parser,
the Felsenstein pruning against hand-computed likelihoods, LRT score
signs/caps, dup masking, and the CLI wiggle surface."""

import os
import subprocess
import sys

import numpy as np
import pytest

from fixtures import three_genome_alignment
from hal_tpu.phylop import (NeutralModel, PhyloPScorer,
                            column_log_likelihood, score_patterns)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gtr(bg, s_ts=2.0):
    """GTR rate matrix with transition/transversion ratio s_ts."""
    S = np.ones((4, 4)) - np.eye(4)
    S[0, 2] = S[2, 0] = S[1, 3] = S[3, 1] = s_ts  # AG / CT transitions
    Q = S * bg[None, :]
    np.fill_diagonal(Q, 0.0)
    np.fill_diagonal(Q, -Q.sum(axis=1))
    # normalize to one expected substitution per unit time
    rate = -(np.diag(Q) * bg).sum()
    return Q / rate


def _mod_text(bg, Q, newick):
    rows = "\n".join("  " + " ".join("%.10f" % v for v in r) for r in Q)
    return ("ALPHABET: A C G T \nORDER: 0\nSUBST_MOD: REV\n"
            "BACKGROUND: %s \nRATE_MAT:\n%s\nTREE: %s\n"
            % (" ".join("%.6f" % b for b in bg), rows, newick))


@pytest.fixture()
def mod_ab(tmp_path):
    bg = np.array([0.3, 0.2, 0.2, 0.3])
    Q = _gtr(bg)
    p = tmp_path / "ab.mod"
    p.write_text(_mod_text(bg, Q, "(A:0.2,B:0.3)Anc;"))
    return str(p)


def test_mod_parse_and_pmatrix(mod_ab):
    mod = NeutralModel.from_mod_file(mod_ab)
    assert mod.tree.is_leaf("A") and mod.tree.is_leaf("B")
    assert mod.branch_length["A"] == pytest.approx(0.2)
    np.testing.assert_allclose(mod.rate_matrix.sum(axis=1), 0, atol=1e-9)
    for t in (0.0, 0.1, 1.0, 5.0):
        P = mod.pmatrix(t)
        np.testing.assert_allclose(P.sum(axis=-1), 1.0, atol=1e-9)
        assert (P >= 0).all()
        # time-reversibility: pi_i P_ij == pi_j P_ji
        np.testing.assert_allclose(mod.background[:, None] * P,
                                   (mod.background[:, None] * P).T,
                                   atol=1e-9)
    np.testing.assert_allclose(mod.pmatrix(0.0), np.eye(4), atol=1e-9)


def test_pruning_matches_direct_sum(mod_ab):
    """Two-leaf tree: lnl(col) must equal
    log sum_s pi_s P(tA)[s,a] P(tB)[s,b], computed directly."""
    mod = NeutralModel.from_mod_file(mod_ab)
    idx = {"A": 0, "B": 1}
    PA = mod.pmatrix(0.2)
    PB = mod.pmatrix(0.3)
    pats = np.array([[a, b] for a in range(4) for b in range(4)]
                    + [[0, 4], [4, 4]])
    got = column_log_likelihood(mod, idx, pats, np.ones(len(pats)))
    for k, (a, b) in enumerate(pats):
        la = PA[:, a] if a < 4 else np.ones(4)
        lb = PB[:, b] if b < 4 else np.ones(4)
        want = np.log((mod.background * la * lb).sum())
        assert got[k] == pytest.approx(want, abs=1e-9)


def test_score_signs(tmp_path):
    """Conserved columns score positive (conservation), fully diverged
    columns negative under CONACC (acceleration); all-N scores 0; scores
    capped at 20 = -log10(1e-20)."""
    bg = np.full(4, 0.25)
    Q = _gtr(bg, s_ts=1.0)
    p = tmp_path / "m.mod"
    # 4 leaves with long branches: identity is strong conservation signal
    p.write_text(_mod_text(bg, Q, "((L1:0.5,L2:0.5)I1:0.3,(L3:0.5,L4:0.5)I2:0.3)R;"))
    mod = NeutralModel.from_mod_file(p)
    idx = {"L1": 0, "L2": 1, "L3": 2, "L4": 3}
    pats = np.array([
        [0, 0, 0, 0],   # conserved
        [0, 1, 2, 3],   # every leaf different: acceleration
        [4, 4, 4, 4],   # no data
    ])
    s = score_patterns(mod, idx, pats, "CONACC")
    assert s[0] > 0.5
    assert s[1] < 0
    assert s[2] == 0.0
    assert np.all(np.abs(s) <= 20.0 + 1e-9)
    # CON mode: conserved column still positive, diverged column ~0
    s_con = score_patterns(mod, idx, pats, "CON")
    assert s_con[0] > 0 and s_con[1] == pytest.approx(0.0, abs=1e-6)
    # ACC mode: diverged positive, conserved ~0
    s_acc = score_patterns(mod, idx, pats, "ACC")
    assert s_acc[1] > 0 and s_acc[0] == pytest.approx(0.0, abs=1e-6)


def test_scorer_window_and_dup_masking(tmp_path, mod_ab):
    """Fixture drive: scores per reference base; the duplicated B range
    (paralogy ring T2/T3 with agreeing bases) is kept under
    dupType=ambiguous and masked under dupType=all (halPhyloP.cpp:239-280,
    so 'all' can only lower the |score| by removing B's evidence)."""
    aln = three_genome_alignment()
    mod = NeutralModel.from_mod_file(mod_ab)
    amb = PhyloPScorer(aln, mod, dup_type="ambiguous")
    s1 = amb.score_window("Anc", 0, 30)
    assert s1.shape == (30,)
    # the all-masker degrades B to N over the dup range [10, 15)
    allm = PhyloPScorer(aln, mod, dup_type="all")
    s2 = allm.score_window("Anc", 0, 30)
    assert not np.array_equal(s1[10:15], s2[10:15])
    # hard mask zeroes the dup columns outright
    hardm = PhyloPScorer(aln, mod, dup_type="all", dup_mask="hard")
    s3 = hardm.score_window("Anc", 0, 30)
    assert np.all(s3[10:15] == 0.0)


def test_cli_wiggle(tmp_path, mod_ab):
    from hal_tpu.storage import save_alignment

    halz = tmp_path / "f.halz"
    save_alignment(three_genome_alignment(), str(halz), fmt="halz")
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    r = subprocess.run(
        [sys.executable, "-m", "hal_tpu.tools.halPhyloP", str(halz), "Anc",
         mod_ab, "stdout"], capture_output=True, env=env, timeout=600,
        cwd=REPO)
    assert r.returncode == 0, r.stderr.decode()[-1500:]
    lines = r.stdout.decode().splitlines()
    assert lines[0] == "fixedStep chrom=Anc_seq start=1 step=1"
    assert len(lines) == 31
    float(lines[1])  # parses as a number


def test_scorer_prunes_missing_species(tmp_path):
    """Model species absent from the alignment are pruned from the tree
    (halPhyloP.cpp:70-95) — scoring must not fail, and a single surviving
    species carries no signal (stationarity makes the column lnl
    scale-invariant), so every score is 0."""
    bg = np.full(4, 0.25)
    Q = _gtr(bg)
    p = tmp_path / "m.mod"
    p.write_text(_mod_text(
        bg, Q, "((A:0.2,Ghost1:0.2)I:0.1,(Ghost2:0.3,Ghost3:0.3)J:0.1)R;"))
    aln = three_genome_alignment()
    mod = NeutralModel.from_mod_file(p)
    scorer = PhyloPScorer(aln, mod)
    assert scorer.species == ["A"]
    s = scorer.score_window("Anc", 0, 30)
    assert np.allclose(s, 0.0)
    # two survivors: signal returns
    p.write_text(_mod_text(
        bg, Q, "((A:0.2,Ghost1:0.2)I:0.1,(B:0.3,Ghost3:0.3)J:0.1)R;"))
    scorer2 = PhyloPScorer(aln, NeutralModel.from_mod_file(p))
    assert scorer2.species == ["A", "B"]
    s2 = scorer2.score_window("Anc", 0, 30)
    assert not np.allclose(s2, 0.0)


REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference checkout")
def test_parse_shipped_mammals_mod():
    """The reference ships a real phyloFit model (testdata/mammals.mod,
    SSREV — strand-symmetric REV, still time-reversible): the parser and
    the eigendecomposition must handle it."""
    mod = NeutralModel.from_mod_file(REF + "/testdata/mammals.mod")
    leaves = [n for n in mod.tree.names() if mod.tree.is_leaf(n)]
    assert sorted(leaves) == ["cow", "human", "mouse", "pig", "rat"]
    np.testing.assert_allclose(mod.rate_matrix.sum(1), 0, atol=1e-5)
    # detailed balance (reversibility) holds for SSREV
    F = mod.background[:, None] * mod.rate_matrix
    np.testing.assert_allclose(F, F.T, atol=1e-5)
    # the shipped matrix's rows sum to ~1e-6, not 0 (phyloFit rounding);
    # row sums of P inherit that tolerance
    P = mod.pmatrix(np.array([0.01, 0.12, 1.0]))
    np.testing.assert_allclose(P.sum(-1), 1.0, atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference checkout")
def test_score_real_mouse_rat_alignment(tmp_path):
    """End-to-end on REAL data: the cactus-produced mr.hal with the
    mammals.mod rate matrix re-treed to the alignment's genome names.
    Scores must be finite, bounded, and show real signal (both conserved
    and non-conserved columns)."""
    from hal_tpu.storage import open_alignment

    mam = open(REF + "/testdata/mammals.mod").read()
    rate = mam[mam.index("RATE_MAT:"):mam.index("TREE:")]
    bg = mam[mam.index("BACKGROUND:"):mam.index("RATE_MAT:")]
    p = tmp_path / "mr.mod"
    p.write_text("ALPHABET: A C G T \nORDER: 0\nSUBST_MOD: SSREV\n"
                 + bg + rate +
                 "TREE: (simMouse_chr6:0.084509,simRat_chr6:0.091589)mr;\n")
    aln = open_alignment(REF + "/paf/tests/input/mr.hal")
    scorer = PhyloPScorer(aln, NeutralModel.from_mod_file(str(p)))
    s = scorer.score_window("simMouse_chr6", 10000, 20000)
    assert s.shape == (10000,) and np.isfinite(s).all()
    assert np.abs(s).max() <= 20.0 + 1e-9
    assert (s > 0).sum() > 100        # conserved columns exist
    assert (s == 0).sum() < 10000     # and most columns carry signal


def test_subtree_mode(tmp_path):
    """--subtree: a second scale on the named node's branches; a column
    conserved inside the subtree but neutral outside scores positive,
    a column diverged ONLY inside scores negative under CONACC
    (halPhyloP.cpp:296-339, col_has_data_sub guard)."""
    bg = np.full(4, 0.25)
    Q = _gtr(bg, s_ts=1.0)
    p = tmp_path / "m.mod"
    p.write_text(_mod_text(
        bg, Q, "((L1:0.5,L2:0.5)I1:0.3,(L3:0.5,L4:0.5)I2:0.3)R;"))
    mod = NeutralModel.from_mod_file(p)
    idx = {"L1": 0, "L2": 1, "L3": 2, "L4": 3}
    sub = frozenset(mod.tree.preorder("I1"))  # L1+L2 lineage
    assert {"I1", "L1", "L2"} == set(sub)
    pats = np.array([
        [0, 0, 1, 2],   # identical inside I1, diverged outside
        [0, 1, 3, 3],   # diverged inside, identical outside
        [0, 1, 4, 4],   # no data outside the subtree -> no contrast
        [4, 4, 0, 1],   # no data inside -> no contrast
    ])
    s = score_patterns(mod, idx, pats, "CONACC", sub_nodes=sub)
    assert s[0] > 0      # subtree-specific conservation
    assert s[1] < 0      # subtree-specific acceleration
    assert s[2] == 0.0 and s[3] == 0.0
    # whole-tree scoring treats pattern 0 and 1 symmetrically-ish: both
    # have 3 distinct bases; subtree scoring separates them by lineage
    s_whole = score_patterns(mod, idx, pats, "CONACC")
    assert not np.allclose(s[:2], s_whole[:2])


def test_score_window_device_columns_equal_exact():
    """PhyloPScorer with device column construction (ops.column_jax)
    produces identical scores to the exact-DFS columns — same slices,
    same dup-mask stickiness, same numpy LRT."""
    import numpy as np

    from hal_tpu.randgen import create_random_alignment
    from hal_tpu.phylop import NeutralModel, PhyloPScorer

    mod_path = "/root/reference/testdata/mammals.mod"
    import os
    import pytest as _pytest

    if not os.path.exists(mod_path):
        _pytest.skip("no mammals.mod")
    aln = create_random_alignment(seed=21, max_genomes=7, min_genomes=6,
                                  min_segments=5, max_segments=25,
                                  min_segment_length=3, max_segment_length=10)
    mod = NeutralModel.from_mod_file(mod_path)
    # rename mod leaves onto alignment leaves so species intersect
    leaves = [n for n in aln.genome_names() if aln.tree.is_leaf(n)]
    mod_leaves = [n for n in mod.tree.names() if mod.tree.is_leaf(n)]
    ren = dict(zip(mod_leaves, leaves))
    for old, new in ren.items():
        mod.tree.rename(old, new)
    mod.branch_length = {ren.get(k, k): v
                         for k, v in mod.branch_length.items()}
    ref = leaves[0]
    ge = min(int(aln.open_genome(ref).length), 120)
    a = PhyloPScorer(aln, mod, device="off")
    b = PhyloPScorer(aln, mod, device="off", device_columns="on")
    sa = a.score_window(ref, 0, ge)
    sb = b.score_window(ref, 0, ge)
    assert np.array_equal(sa, sb)
    assert b._col_eng, "device column engine must have been used"
