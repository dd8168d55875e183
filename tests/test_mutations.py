import subprocess
import sys

import numpy as np

from fixtures import three_genome_alignment
from hal_tpu.ops.rearrangement import analyze_branch


def test_fixture_branch_events():
    aln = three_genome_alignment()
    # branch A<-Anc: T1 inverted, T3 inserted (len 5 <= default gap? 5<=10 -> GI)
    res = analyze_branch(aln, "A")
    kinds = sorted(e.kind for e in res.events)
    assert "V" in kinds          # the inversion
    assert ("GI" in kinds) or ("I" in kinds)
    # with gap threshold 0, the insertion is a full Insertion
    res0 = analyze_branch(aln, "A", gap_threshold=0)
    assert any(e.kind == "I" and e.child_lo == 15 and e.child_hi == 20
               for e in res0.events)
    # branch B<-Anc: duplication (T2/T3 ring, canonical T3 -> T2 is 'U')
    resb = analyze_branch(aln, "B")
    dups = [e for e in resb.events if e.kind == "U"]
    assert len(dups) == 1 and dups[0].child_lo == 10 and dups[0].child_hi == 15


def test_substitution_counts_match_direct():
    aln = three_genome_alignment()
    res = analyze_branch(aln, "A", just_subs=True)
    g, pg = aln.open_genome("A"), aln.open_genome("Anc")
    want_subs = 0
    want_match = 0
    for i in range(5):
        p = g.top_parent[i]
        if p == -1:
            continue
        cb = g.get_dna_string(i * 5, 5).upper()
        pb = pg.get_dna_string(int(p) * 5, 5,
                               reversed_=bool(g.top_parent_reversed[i])).upper()
        for a, b in zip(cb, pb):
            if "N" in (a, b):
                continue
            if a == b:
                want_match += 1
            else:
                want_subs += 1
    assert res.subs == want_subs
    assert res.matches == want_match
    assert res.transitions + res.transversions == res.subs


def run_tool(tool, *args):
    return subprocess.run([sys.executable, "-m", "hal_tpu.tools." + tool, *args],
                          capture_output=True, text=True, timeout=300)


def test_summarize_cli(tmp_path):
    p = str(tmp_path / "m.halz")
    assert run_tool("halRandGen", p, "--seed", "2", "--maxGenomes", "4",
                    "--maxSegments", "20", "--maxSegmentLength", "25").returncode == 0
    r = run_tool("halSummarizeMutations", p)
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith("GenomeName, ParentName, BranchLength,")
    assert "\nTotal, ," in r.stdout


def test_branch_mutations_cli(tmp_path):
    p = str(tmp_path / "m.halz")
    assert run_tool("halRandGen", p, "--seed", "2", "--maxGenomes", "4",
                    "--maxSegments", "20", "--maxSegmentLength", "25").returncode == 0
    genomes = run_tool("halStats", p, "--genomes").stdout.split()
    child = [g for g in genomes if run_tool("halStats", p, "--parent", g).stdout.strip()][0]
    r = run_tool("halBranchMutations", p, child, "--snpFile", "stdout")
    assert r.returncode == 0, r.stderr
    body = [l for l in r.stdout.splitlines() if not l.startswith("#")]
    assert any(l.startswith("#Sequence\t") for l in r.stdout.splitlines())
    for line in body:
        toks = line.split("\t")
        assert toks[3].startswith("S_")
        assert toks[5] == child  # parent/child genome columns (halBranchMutations.cpp:147)


# ---------------- ported reference scenarios (halRearrangementTest.cpp) ----

def _identical_parent_child(num_seqs=3, segs=10, seg_len=50, seed=3):
    """addIdenticalParentChild (api/tests/halSegmentTestSupport.h:124-153):
    parent/child with identical dimensions, segment i of the child mapped
    forward onto bottom i of the parent."""
    from hal_tpu.alignment import Alignment
    from hal_tpu.genome import GenomeArrays, SequenceInfo

    aln = Alignment()
    infos_p = [SequenceInfo("Sequence%d" % i, seg_len * segs, 0, segs)
               for i in range(num_seqs)]
    aln.add_root_genome("parent", infos_p)
    aln.tree.add_child("parent", "child", 1.0)
    parent = aln.open_genome("parent")
    n = num_seqs * segs
    parent.bot_start[:-1] = np.arange(n) * seg_len
    parent.bot_child = np.arange(n, dtype=np.int64).reshape(n, 1)
    parent.bot_child_reversed = np.zeros((n, 1), np.uint8)
    infos_c = [SequenceInfo("Sequence%d" % i, seg_len * segs, segs, 0)
               for i in range(num_seqs)]
    child = GenomeArrays.create("child", infos_c)
    child.top_start[:-1] = np.arange(n) * seg_len
    child.top_parent = np.arange(n, dtype=np.int64)
    aln.set_genome(child)
    rng = np.random.default_rng(seed)
    DNA = np.frombuffer(b"ACGT", np.uint8)
    dna = DNA[rng.integers(0, 4, num_seqs * segs * seg_len)]
    parent.set_dna(0, dna)
    child.set_dna(0, dna.copy())
    return aln


def test_rearrangement_insertion_scenario():
    """RearrangementInsertionTest (halRearrangementTest.cpp:17-69):
    makeInsertion at bottom 1 leaves child top 1 unparented (Insertion) and
    parent bottom 2 childless (Deletion next door); staggered inversions on
    every other aligned segment must not produce spurious I/D."""
    aln = _identical_parent_child(3, 10, 50)
    parent = aln.open_genome("parent")
    child = aln.open_genome("child")
    # makeInsertion(bi at index 1) — halSegmentTestSupport.h:157-170
    child.top_parent[1] = -1
    child.top_parent[2] = 1
    parent.bot_child[1, 0] = 2
    parent.bot_child[2, 0] = -1
    # stagger inversions over bottoms that still have a child
    count = 0
    for b in range(parent.num_bottom_segments):
        ci = int(parent.bot_child[b, 0])
        if ci >= 0:
            parent.bot_child_reversed[b, 0] = count % 2
            child.top_parent_reversed[ci] = count % 2
            count += 1
    from hal_tpu.ops.validate import validate_alignment
    validate_alignment(aln)
    res = analyze_branch(aln, "child", gap_threshold=10)
    ins = [e for e in res.events if e.kind == "I"]
    assert [(e.child_lo, e.child_hi) for e in ins] == [(50, 100)]
    dels = [e for e in res.events if e.kind == "D"]
    assert [(e.parent_lo, e.parent_hi) for e in dels] == [(100, 150)]


def test_rearrangement_simple_inversion_scenario():
    """RearrangementSimpleInversionTest (halRearrangementTest.cpp:71-123):
    single-segment inversions at tops 1, 9 (sequence end) and 20 (sequence
    start) are each an Inversion; nothing else is."""
    aln = _identical_parent_child(3, 10, 50)
    parent = aln.open_genome("parent")
    child = aln.open_genome("child")
    for i in (1, 9, 20):
        parent.bot_child_reversed[i, 0] = 1
        child.top_parent_reversed[i] = 1
    from hal_tpu.ops.validate import validate_alignment
    validate_alignment(aln)
    res = analyze_branch(aln, "child", gap_threshold=10)
    inv = sorted((e.child_lo, e.child_hi) for e in res.events if e.kind == "V")
    assert inv == [(50, 100), (450, 500), (1000, 1050)]
    assert not any(e.kind in ("I", "D") for e in res.events)


def test_rearrangement_gapped_inversion_scenario():
    """RearrangementGappedInversionTest (halRearrangementTest.cpp:124-196):
    a 4-segment inversion with gap-insertions at child tops 3 and 5 and
    gap-deletions at parent bottoms 2 and 5 must chain into ONE gapped
    Inversion spanning child [5, 35) — including the junction carrying a
    gap-insertion AND a gap-deletion simultaneously."""
    aln = _identical_parent_child(3, 10, 5)
    parent = aln.open_genome("parent")
    child = aln.open_genome("child")
    wiring = {  # top -> (parent_index, reversed)
        1: (6, 1), 2: (4, 1), 3: (-1, 0), 4: (3, 1), 5: (-1, 0), 6: (1, 1)}
    for t, (p, r) in wiring.items():
        child.top_parent[t] = p
        child.top_parent_reversed[t] = r
    for b in range(1, 7):
        parent.bot_child[b, 0] = -1
    for t, (p, r) in wiring.items():
        if p >= 0:
            parent.bot_child[p, 0] = t
            parent.bot_child_reversed[p, 0] = r
    from hal_tpu.ops.validate import validate_alignment
    validate_alignment(aln)
    res = analyze_branch(aln, "child", gap_threshold=10)
    inv = [(e.child_lo, e.child_hi) for e in res.events if e.kind == "V"]
    assert inv == [(5, 35)]
    # the two child gap-insertions and two parent gap-deletions surface as
    # gap events, not as I/D
    gi = sorted((e.child_lo, e.child_hi) for e in res.events if e.kind == "GI")
    assert gi == [(15, 20), (25, 30)]
    gd = sorted((e.parent_lo, e.parent_hi) for e in res.events if e.kind == "GD")
    assert gd == [(10, 15), (25, 30)]
    # the reference asserts only "Inversion at leftIdx 1, nowhere else";
    # I/D must not appear (the flanking breakpoints classify as Complex)
    assert not any(e.kind in ("I", "D") for e in res.events)
    assert all((e.child_lo + e.child_hi) // 2 in (5, 35)
               for e in res.events if e.kind == "O")


def test_gapped_iterator_simple_scenario():
    """GappedSegmentSimpleIteratorTest (halGappedSegmentIteratorTest.cpp:
    17-101): alternating orientations break chaining even with an
    unbounded gap threshold — every gapped segment is a single atomic
    segment, in order."""
    aln = _identical_parent_child(2, 100, 5)
    parent = aln.open_genome("parent")
    child = aln.open_genome("child")
    for i in range(1, 200, 2):
        parent.bot_child_reversed[i, 0] = 1
        child.top_parent_reversed[i] = 1
    res = analyze_branch(aln, "child", gap_threshold=9999999, do_subs=False)
    assert [(r.t_first, r.t_last) for r in res.runs] == \
        [(i, i) for i in range(200)]
    assert [r.rev for r in res.runs] == [bool(i % 2) for i in range(200)]


def _make_del_gap(parent, child, b):
    """makeDelGap (halSegmentTestSupport.h:201-242): delete parent bottom b
    from the alignment by shifting all child/parent links right of it."""
    n = child.num_top_segments
    old_parent = child.top_parent.copy()
    start_top = int(parent.bot_child[b, 0])
    for i in range(start_top, n):
        if old_parent[i] == parent.num_bottom_segments - 1:
            child.top_parent[i] = -1
        elif i + 1 < n:
            child.top_parent[i] = old_parent[i + 1]
    old_child = parent.bot_child[:, 0].copy()
    parent.bot_child[b, 0] = -1
    for j in range(b + 1, parent.num_bottom_segments):
        parent.bot_child[j, 0] = old_child[j - 1]


def test_gapped_iterator_indel_scenario():
    """GappedSegmentIteratorIndelTest (halGappedSegmentIteratorTest.cpp:
    216-341): two gap deletions (parent bottoms 0 and 3) chain into ONE
    gapped segment spanning every matched top when the threshold is
    unbounded, and split at the interior deletion when it is 0."""
    aln = _identical_parent_child(1, 20, 5)
    parent = aln.open_genome("parent")
    child = aln.open_genome("child")
    _make_del_gap(parent, child, 0)
    _make_del_gap(parent, child, 3)
    from hal_tpu.ops.validate import validate_alignment
    validate_alignment(aln)
    # resulting wiring: top i -> bot i+1 (i<2), top i -> bot i+2 (2<=i<=17),
    # tops 18/19 unaligned; bottoms 0 and 3 childless
    assert child.top_parent[0] == 1 and child.top_parent[2] == 4
    assert child.top_parent[17] == 19
    assert child.top_parent[18] == -1 and child.top_parent[19] == -1
    res = analyze_branch(aln, "child", gap_threshold=9999999, do_subs=False)
    assert [(r.t_first, r.t_last, r.p_min, r.p_max) for r in res.runs] == \
        [(0, 17, 1, 19)]
    # the deleted bottom 3 surfaces as a gap-deletion event inside the run
    assert any(e.kind == "GD" and (e.parent_lo, e.parent_hi) == (15, 20)
               for e in res.events)
    # threshold 0: the run splits exactly at the interior deletion
    res0 = analyze_branch(aln, "child", gap_threshold=0, do_subs=False)
    assert [(r.t_first, r.t_last) for r in res0.runs] == [(0, 1), (2, 17)]
    # the trailing unaligned tops surface as an insertion event
    assert any(e.kind == "I" and (e.child_lo, e.child_hi) == (90, 100)
               for e in res0.events)
