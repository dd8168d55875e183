import io

import numpy as np
import pytest

from fixtures import three_genome_alignment
from naive_oracle import naive_map_base
from hal_tpu.io.maf_io import MafBlockBuilder, read_maf_blocks, write_header
from hal_tpu.ops.column import compute_scope, iter_slices, window_fragments


def _export(aln, ref, gs, ge, no_dupes=False, no_ancestors=False,
            max_block_len=1000, ucsc=True):
    scope, root = compute_scope(aln, ref)
    frags = window_fragments(aln, ref, gs, ge, scope, root, do_dupes=not no_dupes)
    slices = iter_slices(aln, ref, gs, ge, frags, no_ancestors=no_ancestors)
    b = MafBlockBuilder(aln, ref, max_block_len=max_block_len, ucsc_names=ucsc)
    blocks = list(b.feed(slices))
    tail = b.flush_end()
    if tail:
        blocks.append(tail)
    return "\n".join(blocks)


def test_fixture_exact_output():
    aln = three_genome_alignment()
    got = _export(aln, "A", 0, 25)
    assert got == """a
s\tA.A_seq\t0\t5\t+\t25\tTGGCC
s\tAnc.Anc_seq\t0\t5\t+\t30\tTGGCC
s\tB.B_seq\t0\t5\t+\t25\tTGGCC

a
s\tA.A_seq\t5\t5\t+\t25\tATTTT
s\tAnc.Anc_seq\t20\t5\t-\t30\tATTTT
s\tB.B_seq\t15\t5\t-\t25\tATTTT

a
s\tA.A_seq\t10\t10\t+\t25\tGTGGTTAATA
s\tAnc.Anc_seq\t10\t5\t+\t30\tGTGGT-----
s\tB.B_seq\t10\t5\t+\t25\tGTGGT-----
s\tB.B_seq\t15\t5\t+\t25\tGTGGT-----

a
s\tA.A_seq\t20\t5\t+\t25\tCTGAC
s\tAnc.Anc_seq\t20\t5\t+\t30\tCTGAC
"""


def test_fixture_no_dupes_no_ancestors():
    aln = three_genome_alignment()
    got = _export(aln, "A", 0, 25, no_dupes=True, no_ancestors=True)
    # no Anc rows; single B row per block (canonical dup only = B T3)
    assert "Anc" not in got
    lines = [l for l in got.splitlines() if l.startswith("s")]
    b_lines = [l for l in lines if l.startswith("s\tB.")]
    assert len(b_lines) == 3
    # dup block keeps only canonical B copy [15,20)
    assert any(l.split("\t")[2] == "15" and l.split("\t")[4] == "+" for l in b_lines)


def test_max_block_len_splits():
    aln = three_genome_alignment()
    got = _export(aln, "A", 0, 25, max_block_len=3)
    blocks = [b for b in got.split("\n\n") if b.strip()]
    for b in blocks:
        for line in b.splitlines():
            if line.startswith("s"):
                assert int(line.split("\t")[3]) <= 3


def test_columns_match_oracle_random():
    from hal_tpu.randgen import create_random_alignment

    aln = create_random_alignment(seed=21, max_genomes=6, min_segments=4,
                                  max_segments=25, min_segment_length=3,
                                  max_segment_length=12)
    leaves = [n for n in aln.genome_names() if aln.tree.is_leaf(n)]
    ref = leaves[0]
    g = aln.open_genome(ref)
    ge = min(g.length, 120)
    maf = _export(aln, ref, 0, ge, ucsc=True)
    # reconstruct column membership from the MAF text
    cols = {}  # ref_pos -> set of (genome, pos)
    for block in read_maf_blocks(io.StringIO(maf)):
        ref_line = block[0]
        assert ref_line.src.startswith(ref + ".")
        for k in range(ref_line.size):
            cols.setdefault(ref_line.start + k, set())
        for line in block:
            gname, _, sname = line.src.partition(".")
            gen = aln.open_genome(gname)
            si = gen.sequence_index(sname)
            base = int(gen.seq_start[si])
            # walk the row text against the ref row text
            ref_cursor = ref_line.start
            row_cursor = 0
            for rc, cc in zip(ref_line.text, line.text):
                assert rc != "-", "reference row must be gapless here"
                if cc != "-":
                    if line.strand == "+":
                        pos = base + line.start + row_cursor
                    else:
                        pos = base + line.src_size - 1 - (line.start + row_cursor)
                    cols[ref_cursor].add((gname, pos))
                    row_cursor += 1
                ref_cursor += 1
    checked = 0
    scope_root = aln.root_name
    rng = np.random.default_rng(0)
    for p in rng.choice(ge, size=min(25, ge), replace=False):
        want = set()
        for tgt in aln.genome_names():
            for tp, _ in naive_map_base(aln, ref, int(p), tgt,
                                        coalescence_limit=scope_root):
                want.add((tgt, tp))
        want.add((ref, int(p)))
        assert cols.get(int(p), set()) == want, p
        checked += 1
    assert checked


def test_ref_coverage_complete():
    """Every reference base appears exactly once as a ref-row column."""
    aln = three_genome_alignment()
    maf = _export(aln, "B", 0, 25)
    seen = []
    for block in read_maf_blocks(io.StringIO(maf)):
        r = block[0]
        seen.extend(range(r.start, r.start + r.size))
    assert sorted(seen) == list(range(25))


def test_print_tree_blocks():
    """--printTree: 'a tree=...' headers with entry labels, s-lines in
    post-order, dupe ring members as siblings (reference
    printBlockWithTree, halMafBlock.cpp:485-497)."""
    aln = three_genome_alignment()
    scope, root = compute_scope(aln, "Anc")
    frags = window_fragments(aln, "Anc", 0, 30, scope, root)
    slices = iter_slices(aln, "Anc", 0, 30, frags)
    b = MafBlockBuilder(aln, "Anc", ucsc_names=True, print_tree=True)
    blocks = list(b.feed(slices))
    tail = b.flush_end()
    if tail:
        blocks.append(tail)
    assert all(blk.startswith('a tree="') for blk in blocks)
    # the dup block at Anc 10-15 has both B paralogs as siblings
    dup = next(blk for blk in blocks if blk.count("s\tB.B_seq") == 2)
    assert '(A.A_seq,B.B_seq,B.B_seq)Anc.Anc_seq;' in dup
    # s-lines follow the tree's post-order: children before the root entry
    lines = [l for l in dup.splitlines() if l.startswith("s\t")]
    assert lines[-1].split("\t")[1] == "Anc.Anc_seq"


def test_gene_tree_shape_equality():
    from hal_tpu.ops.column import build_gene_tree

    aln = three_genome_alignment()
    t1 = build_gene_tree(aln, "Anc", 0)
    t2 = build_gene_tree(aln, "Anc", 1)
    # labels unset -> same genome topology
    assert t1.genome == t2.genome == "Anc"
    assert [c.genome for c in t1.children] == [c.genome for c in t2.children]


def test_max_ref_gap_deletion_columns():
    """Deleted ancestral range surfaces as ref-gap columns when
    maxRefGap covers it, spread down to the sibling (reference
    ColumnIterator::handleDeletion, halColumnIterator.cpp:357-381)."""
    import numpy as np

    from hal_tpu.alignment import Alignment
    from hal_tpu.genome import GenomeArrays, SequenceInfo
    from hal_tpu.ops.column import iter_slices_exact

    aln = Alignment()
    aln.add_root_genome("Anc", [SequenceInfo("Anc_seq", 20, 0, 4)])
    aln.tree.add_child("Anc", "C", 0.1)
    aln.tree.add_child("Anc", "D", 0.1)
    anc = aln.open_genome("Anc")
    anc.bot_start[:-1] = np.arange(4) * 5
    anc.bot_child = np.full((4, 2), -1, np.int64)
    anc.bot_child_reversed = np.zeros((4, 2), np.uint8)

    c = GenomeArrays.create("C", [SequenceInfo("C_seq", 15, 3, 0)])
    c.top_start[:-1] = np.arange(3) * 5
    c.top_parent = np.array([0, 1, 3], np.int64)   # B2 deleted in C
    aln.set_genome(c)
    d = GenomeArrays.create("D", [SequenceInfo("D_seq", 20, 4, 0)])
    d.top_start[:-1] = np.arange(4) * 5
    d.top_parent = np.arange(4, dtype=np.int64)
    aln.set_genome(d)
    anc.bot_child[:, 0] = [0, 1, -1, 2]
    anc.bot_child[:, 1] = [0, 1, 2, 3]
    DNA = np.frombuffer(b"ACGT", dtype=np.uint8)
    rng = np.random.default_rng(1)
    anc.set_dna(0, DNA[rng.integers(0, 4, 20)])
    c.set_dna(0, np.concatenate([anc.get_dna(0, 10), anc.get_dna(15, 5)]))
    d.set_dna(0, anc.get_dna(0, 20))

    def slices(gap):
        return list(iter_slices_exact(aln, "C", 0, 15, max_ref_gap=gap))

    base = slices(0)
    assert all(s.lo != s.hi for s in base)
    got = slices(10)
    dels = [s for s in got if s.lo == s.hi]
    assert len(dels) == 1
    sl = dels[0]
    assert sl.lo == 10 and sl.width == 5
    keys = {(r.genome, r.tgt_lo, r.tgt_hi) for r in sl.rows}
    assert ("Anc", 10, 15) in keys and ("D", 10, 15) in keys
    # emitted right after the run ending at the breakpoint, before the
    # next ref run (stack drain order, halColumnIterator.cpp:122-126)
    assert [s.lo == s.hi for s in got] == [False, False, True, False]
    # too-small budget suppresses it
    assert all(s.lo != s.hi for s in slices(4))


# ------------------------------------------------- exact-path indel stacks

def _export_exact(aln, ref, gs, ge, gap):
    from hal_tpu.ops.column import iter_slices_exact

    slices = iter_slices_exact(aln, ref, gs, ge, max_ref_gap=gap)
    b = MafBlockBuilder(aln, ref, ucsc_names=True)
    blocks = list(b.feed(slices))
    tail = b.flush_end()
    return "\n".join(blocks + ([tail] if tail else []))


def _insertion_alignment():
    """Clean insertion: A's T3 unaligned, flanked by T2->B2 and T4->B3
    whose parents ARE adjacent — the one shape the reference's atomic
    insertion cycle accepts (scanInsertionCycle case 2a,
    halRearrangement.cpp:418-426)."""
    from hal_tpu.alignment import Alignment
    from hal_tpu.genome import GenomeArrays, SequenceInfo

    aln = Alignment()
    aln.add_root_genome("Anc", [SequenceInfo("Anc_seq", 20, 0, 4)])
    aln.tree.add_child("Anc", "A", 0.1)
    anc = aln.open_genome("Anc")
    anc.bot_start[:-1] = np.arange(4) * 5
    anc.bot_child = np.full((4, 1), -1, np.int64)
    anc.bot_child_reversed = np.zeros((4, 1), np.uint8)
    anc.bot_child[:, 0] = [0, 1, 2, 4]
    a = GenomeArrays.create("A", [SequenceInfo("A_seq", 25, 5, 0)])
    a.top_start[:-1] = np.arange(5) * 5
    a.top_parent = np.array([0, 1, 2, -1, 3], np.int64)
    aln.set_genome(a)
    anc.set_dna(0, np.frombuffer(b"ACGTACGTACGTACGTACGT", np.uint8))
    a.set_dna(0, np.frombuffer(b"ACGTACGTACGTACGTAATACGT..".replace(b".", b"G"),
                               np.uint8))
    return aln


def test_exact_max_ref_gap_insertion():
    """A's inserted T3 surfaces as ref-gap columns between ref positions
    14 and 15 when the budget covers it (handleInsertion,
    halColumnIterator.cpp:382-401)."""
    from hal_tpu.ops.column import iter_slices_exact
    from hal_tpu.ops.validate import validate_alignment

    aln = _insertion_alignment()
    validate_alignment(aln)
    slices = list(iter_slices_exact(aln, "Anc", 0, 20, max_ref_gap=10))
    ins = [s for s in slices if s.lo == s.hi]
    assert len(ins) == 1
    s = ins[0]
    assert s.lo == 15 and s.width == 5
    assert [(r.genome, r.tgt_lo, r.tgt_hi, r.rev) for r in s.rows] == [
        ("A", 15, 20, False)]
    # order: the insertion comes right after the run ending at ref 15
    idx = slices.index(s)
    assert slices[idx - 1].hi == 15
    # budget gates it; rendering pads the ref row through the insertion
    assert all(s2.lo != s2.hi
               for s2 in iter_slices_exact(aln, "Anc", 0, 20, max_ref_gap=4))
    # rendering: one block, ref row gapped through the insertion, A's row
    # running straight through it (entry-continuation append rules)
    got = _export_exact(aln, "Anc", 0, 20, 10)
    assert "s\tAnc.Anc_seq\t0\t20\t+\t20\tACGTACGTACGTACG-----TACGT" in got
    assert "s\tA.A_seq\t0\t25\t+\t25\tACGTACGTACGTACGTAATACGTGG" in got


def test_exact_insertion_rejected_when_flank_deleted():
    """three_genome_alignment's T3 sits between parents that are NOT
    adjacent (B3 deleted): the reference's atomic insertion cycle rejects
    it, so the exact path must emit no ref-gap columns (the legacy
    fragment path over-approximates here, emitting it)."""
    aln = three_genome_alignment()
    slices = list(
        __import__("hal_tpu.ops.column", fromlist=["iter_slices_exact"])
        .iter_slices_exact(aln, "Anc", 0, 30, max_ref_gap=10))
    assert all(s.lo != s.hi for s in slices)


def _multigap_alignment():
    """The reference's ColumnIteratorMultiGapTest topology
    (api/tests/halColumnIteratorTest.cpp:543-637): adam(16) -> grandpa(12)
    -> dad(8); grandpa's segment 2 maps to adam's segment 3 (adam seg 2
    deleted), dad's segment 1 maps to grandpa's segment 2 (grandpa seg 1
    deleted) — a deletion nested inside a deletion."""
    from hal_tpu.alignment import Alignment
    from hal_tpu.genome import GenomeArrays, SequenceInfo

    aln = Alignment()
    aln.add_root_genome("adam", [SequenceInfo("aseq", 16, 0, 4)])
    aln.tree.add_child("adam", "grandpa", 0.1)
    aln.tree.add_child("grandpa", "dad", 0.1)

    adam = aln.open_genome("adam")
    adam.bot_start[:-1] = np.arange(4) * 4
    adam.bot_child = np.full((4, 1), -1, np.int64)
    adam.bot_child_reversed = np.zeros((4, 1), np.uint8)
    adam.bot_child[:, 0] = [0, 1, -1, 2]

    gp = GenomeArrays.create("grandpa", [SequenceInfo("gseq", 12, 3, 3)],
                             num_children=1)
    gp.top_start[:-1] = np.arange(3) * 4
    gp.top_parent = np.array([0, 1, 3], np.int64)
    gp.bot_start[:-1] = np.arange(3) * 4
    gp.bot_child[:, 0] = [0, -1, 1]
    gp.bot_top_parse = np.array([0, 1, 2], np.int64)
    gp.top_bottom_parse = np.array([0, 1, 2], np.int64)
    aln.set_genome(gp)

    dad = GenomeArrays.create("dad", [SequenceInfo("dseq", 8, 2, 0)])
    dad.top_start[:-1] = np.arange(2) * 4
    dad.top_parent = np.array([0, 2], np.int64)
    aln.set_genome(dad)

    adam.set_dna(0, np.frombuffer(b"ACGTAAAATTTTGGGG", np.uint8))
    gp.set_dna(0, np.frombuffer(b"ACGTAAAAGGGG", np.uint8))
    dad.set_dna(0, np.frombuffer(b"ACGTGGGG", np.uint8))
    return aln


def test_exact_nested_deletion_order():
    """Nested deletion emission order must follow the reference's stack
    drain: ref columns, grandpa's deleted range (spread up to adam), the
    adam range deleted inside IT, then the remaining ref columns
    (ColumnIteratorMultiGapTest expectations, toRight stack drain
    halColumnIterator.cpp:122-126)."""
    from hal_tpu.ops.column import iter_slices_exact
    from hal_tpu.ops.validate import validate_alignment

    aln = _multigap_alignment()
    validate_alignment(aln)
    slices = list(iter_slices_exact(aln, "dad", 0, 8, max_ref_gap=1000))
    # [dad 0-4 columns, grandpa-del (grandpa+adam), adam-del (adam only),
    #  dad 4-8 columns]
    kinds = [(s.lo == s.hi, sorted({r.genome for r in s.rows})) for s in slices]
    assert kinds[0] == (False, ["adam", "dad", "grandpa"])
    assert kinds[1] == (True, ["adam", "grandpa"])
    assert kinds[2] == (True, ["adam"])
    assert kinds[3] == (False, ["adam", "dad", "grandpa"])
    assert [s.width for s in slices] == [4, 4, 4, 4]
    # coordinates of the deleted ranges
    g_rows = {r.genome: (r.tgt_lo, r.tgt_hi) for r in slices[1].rows}
    assert g_rows["grandpa"] == (4, 8) and g_rows["adam"] == (4, 8)
    a_rows = {r.genome: (r.tgt_lo, r.tgt_hi) for r in slices[2].rows}
    assert a_rows["adam"] == (8, 12)
    # no budget -> plain columns only
    plain = list(iter_slices_exact(aln, "dad", 0, 8, max_ref_gap=0))
    assert all(s.lo != s.hi for s in plain)
    # budget 4 still admits the nested deletion: each entry lands on a
    # fresh indel stack whose first push gets cumulativeSize 0
    # (ColumnIteratorStack::push, halColumnIteratorStack.h:113-121), so
    # the nested check is 4 + 0 <= 4
    four = list(iter_slices_exact(aln, "dad", 0, 8, max_ref_gap=4))
    assert [(s.lo == s.hi) for s in four] == [False, True, True, False]
    # budget 3 rejects the first-level deletion outright
    three = list(iter_slices_exact(aln, "dad", 0, 8, max_ref_gap=3))
    assert all(s.lo != s.hi for s in three)
