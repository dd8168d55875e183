"""Port of the reference's hand-built liftover unit tests
(liftover/tests/halLiftoverTests.cpp:15-441, setupSharedAlignment +
BedLiftoverTest).  The 5-genome fixture packs paralogy rings, reversals,
insertions and multi-branch paths into 100 bp; every expected BED/PSL
string below is copied verbatim from the reference's assertions, so this
is a reference oracle for the host mapper + BED/PSL emission that the
generated goldens (random preset fixtures) cannot provide."""

import os
import subprocess
import sys

import numpy as np
import pytest

from hal_tpu.alignment import Alignment
from hal_tpu.genome import GenomeArrays, SequenceInfo

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROOT_DNA = ("CAAAAGCTGCCTCGGCGTAGCCAGGTGTAAGCTGGTATTGTTCTTGTGCATCTGGGCACC"
            "ATTCTCTTGTTCGTAAATAGGCGACGCTGTCTTTTGGCCG")
LEAF2_DNA = ("ATGTGTATGCTTGGGTCAACTCTCTTTTCAGATCCGGGCGGTCGTCCGTAATTATGTGCC"
             "GAATCTCCAC")


def _parse_links(g):
    """fixParseInfo equivalent: position-containment parse indices."""
    if g.num_top_segments and g.num_bottom_segments:
        g.top_bottom_parse = (np.searchsorted(
            g.bot_start, g.top_start[:-1], side="right") - 1).astype(np.int64)
        g.bot_top_parse = (np.searchsorted(
            g.top_start, g.bot_start[:-1], side="right") - 1).astype(np.int64)


def shared_alignment():
    """setupSharedAlignment (halLiftoverTests.cpp:15-252): root with
    children child1 + leaf1; child1 with children leaf2 + leaf3."""
    aln = Alignment()
    aln.add_root_genome("root", [SequenceInfo("Sequence", 100, 0, 5)])
    aln.tree.add_child("root", "child1", 1.0)
    aln.tree.add_child("root", "leaf1", 1.0)
    aln.tree.add_child("child1", "leaf2", 1.0)
    aln.tree.add_child("child1", "leaf3", 1.0)

    root = aln.open_genome("root")
    root.bot_start[:-1] = [0, 20, 40, 60, 80]
    root.bot_child = np.array([  # slot 0 = child1, slot 1 = leaf1
        [0, 0], [-1, 2], [2, 1], [3, -1], [-1, 4]], np.int64)
    root.bot_child_reversed = np.array(
        [[1, 1], [0, 1], [0, 0], [1, 0], [0, 0]], np.uint8)

    c1 = GenomeArrays.create("child1", [SequenceInfo("Sequence", 100, 5, 7)],
                             num_children=2)
    c1.top_start[:-1] = [0, 20, 40, 60, 80]
    c1.top_parent = np.array([0, -1, 2, 3, 0], np.int64)
    c1.top_parent_reversed = np.array([1, 0, 0, 1, 0], np.uint8)
    c1.top_paralogy = np.array([4, -1, -1, -1, 0], np.int64)
    c1.bot_start[:-1] = [0, 20, 30, 35, 50, 70, 90]
    c1.bot_child = np.array([  # slot 0 = leaf2, slot 1 = leaf3
        [0, -1], [-1, 0], [1, -1], [-1, 2], [4, 1], [3, 3], [-1, 4]],
        np.int64)
    c1.bot_child_reversed = np.array(
        [[1, 0], [0, 1], [0, 0], [0, 0], [1, 1], [0, 1], [0, 0]], np.uint8)
    _parse_links(c1)
    aln.set_genome(c1)

    l1 = GenomeArrays.create("leaf1", [SequenceInfo("Sequence", 100, 5, 0)])
    l1.top_start[:-1] = [0, 20, 40, 60, 80]
    l1.top_parent = np.array([0, 2, 1, -1, 4], np.int64)
    l1.top_parent_reversed = np.array([1, 0, 1, 0, 0], np.uint8)
    aln.set_genome(l1)

    l2 = GenomeArrays.create("leaf2", [SequenceInfo("Sequence", 70, 5, 0)])
    l2.top_start[:-1] = [0, 20, 25, 30, 50]
    l2.top_parent = np.array([0, 2, 2, 5, 4], np.int64)
    l2.top_parent_reversed = np.array([1, 0, 0, 0, 1], np.uint8)
    l2.top_paralogy = np.array([-1, 2, 1, -1, -1], np.int64)
    aln.set_genome(l2)

    l3 = GenomeArrays.create("leaf3", [SequenceInfo("Sequence", 100, 6, 0)])
    l3.top_start[:-1] = [0, 10, 30, 45, 65, 75]
    l3.top_parent = np.array([1, 4, 3, 5, 6, -1], np.int64)
    l3.top_parent_reversed = np.array([1, 1, 0, 1, 0, 0], np.uint8)
    aln.set_genome(l3)

    dna = np.frombuffer(ROOT_DNA.encode(), np.uint8)
    root.set_dna(0, dna)
    c1.set_dna(0, dna.copy())
    l1.set_dna(0, dna.copy())
    l2.set_dna(0, np.frombuffer(LEAF2_DNA.encode(), np.uint8))
    l3.set_dna(0, dna.copy())
    return aln


@pytest.fixture(scope="module")
def shared_halz(tmp_path_factory):
    from hal_tpu.ops.validate import validate_alignment
    from hal_tpu.storage import save_alignment

    aln = shared_alignment()
    validate_alignment(aln)
    p = tmp_path_factory.mktemp("liftport") / "shared.halz"
    save_alignment(aln, str(p), fmt="halz")
    return str(p)


def lift(halz, src, tgt, bed, *flags):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    r = subprocess.run(
        [sys.executable, "-m", "hal_tpu.tools.halLiftover", halz, src,
         "stdin", tgt, "stdout"] + list(flags),
        input=bed.encode(), capture_output=True, env=env, timeout=600,
        cwd=REPO)
    assert r.returncode == 0, r.stderr.decode()[-1500:]
    return r.stdout.decode()


def test_one_branch_whole_blocks(shared_halz):
    """testOneBranchLifts case 1 (halLiftoverTests.cpp:272-291): whole
    blocks — reversed, unreversed, paralogies; the insertion vanishes."""
    got = lift(shared_halz, "child1", "root",
               "Sequence\t0\t20\tPARALOGY1REV\t0\t+\n"
               "Sequence\t60\t80\tREV\t0\t+\n"
               "Sequence\t20\t40\tINSERTION\t0\t+\n"
               "Sequence\t80\t100\tPARALOGY2\t0\t+\n")
    assert got == ("Sequence\t0\t20\tPARALOGY1REV\t0\t-\n"
                   "Sequence\t60\t80\tREV\t0\t-\n"
                   "Sequence\t0\t20\tPARALOGY2\t0\t+\n")


def test_one_branch_fragments(shared_halz):
    """testOneBranchLifts case 2: segment fragments, including intervals
    straddling orientation flips and insertions."""
    got = lift(shared_halz, "leaf1", "root",
               "Sequence\t0\t5\tNORMALREV\t0\t+\n"
               "Sequence\t10\t30\tOVERLAP\t0\t+\n"
               "Sequence\t50\t70\tOVERLAPINSERTION\t0\t+\n"
               "Sequence\t70\t100\tOVERLAPINSERTION2\t0\t+\n")
    assert got == ("Sequence\t15\t20\tNORMALREV\t0\t-\n"
                   "Sequence\t0\t10\tOVERLAP\t0\t-\n"
                   "Sequence\t40\t50\tOVERLAP\t0\t+\n"
                   "Sequence\t20\t30\tOVERLAPINSERTION\t0\t-\n"
                   "Sequence\t80\t100\tOVERLAPINSERTION2\t0\t+\n")


def test_one_branch_down(shared_halz):
    """testOneBranchLifts case 3: root->child1 downward, paralogy fans out
    to both ring members."""
    got = lift(shared_halz, "root", "child1",
               "Sequence\t0\t10\tPARALOGY\t0\t+\n"
               "Sequence\t30\t50\tOVERLAPINSERTION\t0\t+\n")
    assert got == ("Sequence\t10\t20\tPARALOGY\t0\t-\n"
                   "Sequence\t80\t90\tPARALOGY\t0\t+\n"
                   "Sequence\t40\t50\tOVERLAPINSERTION\t0\t+\n")


def test_one_branch_down_no_dupes(shared_halz):
    """--noDupes keeps only the canonical ring member (root bot0's child
    pointer names top0, halSegmentMapper.cpp:525-576)."""
    got = lift(shared_halz, "root", "child1",
               "Sequence\t0\t10\tPARALOGY\t0\t+\n", "--noDupes")
    assert got == "Sequence\t10\t20\tPARALOGY\t0\t-\n"


def test_multi_branch_up_down(shared_halz):
    """testMultiBranchLifts case 1 (halLiftoverTests.cpp:352-364):
    leaf2 -> leaf3, up one branch and down another."""
    got = lift(shared_halz, "leaf2", "leaf3",
               "Sequence\t30\t35\tREV\t0\t+\n"
               "Sequence\t40\t60\tOVERLAP\t0\t+\n")
    assert got == ("Sequence\t60\t65\tREV\t0\t-\n"
                   "Sequence\t45\t55\tOVERLAP\t0\t-\n"
                   "Sequence\t10\t20\tOVERLAP\t0\t+\n")


def test_multi_branch_down_two(shared_halz):
    """testMultiBranchLifts case 2: root -> leaf2 (down two branches)."""
    got = lift(shared_halz, "root", "leaf2",
               "Sequence\t0\t20\tBLOCK_A\t0\t+\n"
               "Sequence\t30\t50\tBLOCK_B\t0\t+\n")
    assert got == ("Sequence\t0\t20\tBLOCK_A\t0\t+\n"
                   "Sequence\t40\t50\tBLOCK_A\t0\t+\n")


CASE3 = ("Sequence\t0\t10\tSEGMENT_0\t0\t+\t0\t10\t128,0,0\t1\t10\t0,\n"
         "Sequence\t10\t30\tSEGMENT_1\t0\t+\t10\t30\t128,0,0\t1\t20\t0,\n"
         "Sequence\t30\t45\tSEGMENT_2\t0\t+\t30\t45\t128,0,0\t1\t15\t0,\n"
         "Sequence\t45\t65\tSEGMENT_3\t0\t+\t45\t65\t128,0,0\t1\t20\t0,\n"
         "Sequence\t65\t75\tSEGMENT_4\t0\t+\t65\t75\t128,0,0\t1\t10\t0,\n"
         "Sequence\t75\t100\tSEGMENT_5\t0\t+\t75\t100\t128,0,0\t1\t25\t0,\n")


def test_multi_branch_bed12(shared_halz):
    """testMultiBranchLifts case 3: leaf3 -> leaf1 (up two, down one) with
    BED12 blocks."""
    got = lift(shared_halz, "leaf3", "leaf1", CASE3)
    assert got == (
        "Sequence\t30\t40\tSEGMENT_1\t0\t-\t30\t40\t128,0,0\t1\t10\t0\n"
        "Sequence\t20\t30\tSEGMENT_2\t0\t+\t20\t30\t128,0,0\t1\t10\t0\n"
        "Sequence\t10\t20\tSEGMENT_3\t0\t+\t10\t20\t128,0,0\t1\t10\t0\n"
        "Sequence\t0\t10\tSEGMENT_4\t0\t-\t0\t10\t128,0,0\t1\t10\t0\n")


def test_multi_branch_psl(shared_halz):
    """testMultiBranchLifts PSL output, with and without the name column."""
    got = lift(shared_halz, "leaf3", "leaf1", CASE3, "--outPSL")
    assert got == (
        "2\t8\t0\t0\t0\t0\t0\t0\t+-\tSequence\t100\t20\t30\tSequence\t100\t30\t40\t1\t10,\t20,\t60,\n"
        "2\t8\t0\t0\t0\t0\t0\t0\t++\tSequence\t100\t35\t45\tSequence\t100\t20\t30\t1\t10,\t35,\t20,\n"
        "3\t7\t0\t0\t0\t0\t0\t0\t++\tSequence\t100\t45\t55\tSequence\t100\t10\t20\t1\t10,\t45,\t10,\n"
        "3\t7\t0\t0\t0\t0\t0\t0\t+-\tSequence\t100\t65\t75\tSequence\t100\t0\t10\t1\t10,\t65,\t90,\n")
    got = lift(shared_halz, "leaf3", "leaf1", CASE3, "--outPSLWithName")
    assert got == (
        "SEGMENT_1\t2\t8\t0\t0\t0\t0\t0\t0\t+-\tSequence\t100\t20\t30\tSequence\t100\t30\t40\t1\t10,\t20,\t60,\n"
        "SEGMENT_2\t2\t8\t0\t0\t0\t0\t0\t0\t++\tSequence\t100\t35\t45\tSequence\t100\t20\t30\t1\t10,\t35,\t20,\n"
        "SEGMENT_3\t3\t7\t0\t0\t0\t0\t0\t0\t++\tSequence\t100\t45\t55\tSequence\t100\t10\t20\t1\t10,\t45,\t10,\n"
        "SEGMENT_4\t3\t7\t0\t0\t0\t0\t0\t0\t+-\tSequence\t100\t65\t75\tSequence\t100\t0\t10\t1\t10,\t65,\t90,\n")
