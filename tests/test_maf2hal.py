import io

import numpy as np

from fixtures import three_genome_alignment
from hal_tpu.io.maf_io import MafBlockBuilder, write_header
from hal_tpu.ops.column import compute_scope, iter_slices, window_fragments
from hal_tpu.ops.validate import validate_alignment
from hal_tpu.tools.maf2hal import import_maf


def _export_maf(aln, ref):
    g = aln.open_genome(ref)
    scope, root = compute_scope(aln, ref)
    frags = window_fragments(aln, ref, 0, g.length, scope, root)
    slices = iter_slices(aln, ref, 0, g.length, frags)
    b = MafBlockBuilder(aln, ref, ucsc_names=True)
    out = io.StringIO()
    write_header(out, aln)
    for blk in b.feed(slices):
        out.write(blk + "\n")
    return out.getvalue()


def test_round_trip_star():
    aln = three_genome_alignment()
    maf = _export_maf(aln, "Anc")
    back = import_maf(io.StringIO(maf))
    validate_alignment(back)
    assert back.root_name == "Anc"
    assert set(back.genome_names()) == {"Anc", "A", "B"}

    # covered DNA must round-trip exactly
    for name in ("Anc", "A", "B"):
        g0 = aln.open_genome(name)
        g1 = back.open_genome(name)
        assert g1.length == g0.length
        s0 = g0.get_dna_string(0, g0.length)
        s1 = g1.get_dna_string(0, g1.length)
        for a, b in zip(s0, s1):
            assert b == a or b == "N"  # uncovered regions become N

    # homology structure: A<->B columns must be identical through the
    # reimported alignment (compare via per-base oracle)
    import sys

    sys.path.insert(0, "tests")
    from naive_oracle import naive_map_interval

    want = naive_map_interval(aln, "A", 0, 25, "B")
    got = naive_map_interval(back, "A", 0, 25, "B")
    assert got == want


def test_import_dup_rows_make_rings():
    aln = three_genome_alignment()
    maf = _export_maf(aln, "Anc")
    back = import_maf(io.StringIO(maf))
    b = back.open_genome("B")
    assert (b.top_paralogy != -1).sum() == 2  # the two B dupes ring-linked


def test_import_respects_ref_choice():
    aln = three_genome_alignment()
    maf = _export_maf(aln, "Anc")
    back = import_maf(io.StringIO(maf), ref_genome="Anc")
    assert back.root_name == "Anc"
