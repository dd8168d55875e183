import io

import numpy as np
import pytest

from hal_tpu.ops.liftover import Liftover
from hal_tpu.ops.validate import validate_alignment
from hal_tpu.io.bed import BedLine
from fixtures import three_genome_alignment
from naive_oracle import naive_map_interval


@pytest.fixture(scope="module")
def aln():
    a = three_genome_alignment()
    validate_alignment(a)
    return a


def _lift(aln, src, tgt, bed_text, bed_type=0, **kw):
    lo = Liftover(aln, src, tgt, **kw)
    out = io.StringIO()
    lo.convert(io.StringIO(bed_text), out, bed_type)
    return out.getvalue()


def test_a_to_b_bed3(aln):
    got = _lift(aln, "A", "B", "A_seq\t0\t25\n")
    assert got == ("B_seq\t0\t5\n"
                   "B_seq\t5\t10\n"
                   "B_seq\t10\t15\n"
                   "B_seq\t15\t20\n")


def test_a_to_b_no_dupes(aln):
    got = _lift(aln, "A", "B", "A_seq\t0\t25\n", traverse_dupes=False)
    # canonical paralog of Anc B2 in B is T3 (=[15,20))
    assert got == ("B_seq\t0\t5\n"
                   "B_seq\t5\t10\n"
                   "B_seq\t15\t20\n")


def test_a_to_b_bed6_strands(aln):
    got = _lift(aln, "A", "B", "A_seq\t0\t25\tx\t0\t+\n")
    lines = [l.split("\t") for l in got.splitlines()]
    assert [l[5] for l in lines] == ["+", "-", "+", "+"]
    # reversed input strand flips everything
    got = _lift(aln, "A", "B", "A_seq\t0\t25\tx\t0\t-\n")
    lines = [l.split("\t") for l in got.splitlines()]
    assert [l[5] for l in lines] == ["-", "+", "-", "-"]


def test_b_to_a_dup_collapse(aln):
    # both B dupes map back to the same A interval
    got = _lift(aln, "B", "A", "B_seq\t10\t20\n")
    assert got == "A_seq\t10\t15\nA_seq\t10\t15\n"


def test_anc_to_leaf(aln):
    got = _lift(aln, "Anc", "A", "Anc_seq\t0\t30\n")
    assert got == ("A_seq\t0\t5\n"
                   "A_seq\t5\t10\n"
                   "A_seq\t10\t15\n"
                   "A_seq\t20\t25\n")


def test_leaf_to_anc_inversion_coords(aln):
    got = _lift(aln, "A", "Anc", "A_seq\t6\t9\tiv\t0\t+\n")
    # A[6,9) is inside inverted T1 -> Anc B1: positions 5..9 reversed
    # A 6,7,8 -> Anc 8,7,6 => interval [6,9) strand '-'
    assert got == "Anc_seq\t6\t9\tiv\t0\t-\n"


def test_unknown_sequence_skipped(aln, capsys):
    got = _lift(aln, "A", "B", "nope\t0\t5\n")
    assert got == ""


def test_interval_past_end_skipped(aln):
    got = _lift(aln, "A", "B", "A_seq\t0\t26\n")
    assert got == ""


def test_bed12_blocks(aln):
    # blocks [0,5) and [10,15) of A: map to B T0 and the B dupes
    bed = "A_seq\t0\t15\tgene\t0\t+\t0\t0\t0\t2\t5,5\t0,10\n"
    got = _lift(aln, "A", "B", bed)
    lines = got.splitlines()
    assert len(lines) >= 1
    first = lines[0].split("\t")
    assert first[0] == "B_seq"
    assert first[3] == "gene"
    assert int(first[9]) >= 1  # block count present


def test_psl_output(aln):
    got = _lift(aln, "A", "B", "A_seq\t0\t5\n", out_psl=True)
    lines = got.splitlines()
    assert len(lines) == 1
    f = lines[0].split("\t")
    # matches+misMatches+repMatches+nCount == total block length 5
    assert sum(int(x) for x in f[0:4]) == 5
    assert f[8] == "++"
    assert f[9] == "A_seq" and f[13] == "B_seq"
    assert f[10] == "25" and f[14] == "25"
    assert (f[11], f[12]) == ("0", "5")
    assert (f[15], f[16]) == ("0", "5")
    assert f[17] == "1"
    assert f[18] == "5,"


def test_random_alignment_coverage_matches_oracle():
    """Output BED target coverage equals the per-base oracle's target set."""
    from hal_tpu.randgen import create_random_alignment

    aln = create_random_alignment(seed=13, max_genomes=6, min_segments=4,
                                  max_segments=30, min_segment_length=3,
                                  max_segment_length=12)
    names = aln.genome_names()
    leaves = [n for n in names if aln.tree.is_leaf(n)]
    src = leaves[0]
    tgt = leaves[-1] if leaves[-1] != src else names[-1]
    g = aln.open_genome(src)
    if g.length < 10:
        pytest.skip("fixture too small")
    seq = g.seq_names[0]
    lo_, hi_ = 0, min(g.length, 200)
    got = _lift(aln, src, tgt, f"{seq}\t{lo_}\t{hi_}\n")
    tg = aln.open_genome(tgt)
    covered = set()
    for line in got.splitlines():
        chrom, s, e = line.split("\t")[:3]
        si = tg.sequence_index(chrom)
        base = int(tg.seq_start[si])
        for p in range(int(s), int(e)):
            covered.add(base + p)
    want = {tp for (_, tp, _) in naive_map_interval(aln, src, lo_, hi_, tgt)}
    assert covered == want
