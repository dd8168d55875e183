import os
import subprocess
import sys

import numpy as np

from fixtures import three_genome_alignment
from hal_tpu.alignment import Alignment
from hal_tpu.genome import GenomeArrays, SequenceInfo
from hal_tpu.ops.validate import validate_alignment
from hal_tpu.storage import save_alignment
from hal_tpu import open_alignment


def run_tool(tool, *args):
    return subprocess.run([sys.executable, "-m", "hal_tpu.tools." + tool,
                           *[str(a) for a in args]],
                          capture_output=True, text=True, timeout=300)


def _append_alignment():
    """A as root (5 bottoms over 25bp) with child A1 mapping 1:1."""
    ap = Alignment()
    ap.add_root_genome("A", [SequenceInfo("A_seq", 25, 0, 5)])
    ap.tree.add_child("A", "A1", 0.05)
    a = ap.open_genome("A")
    a.bot_start[:-1] = np.arange(5) * 5
    a.bot_child = np.arange(5, dtype=np.int64).reshape(5, 1)
    a.bot_child_reversed = np.zeros((5, 1), np.uint8)
    a1 = GenomeArrays.create("A1", [SequenceInfo("A1_seq", 25, 5, 0)])
    a1.top_start[:-1] = np.arange(5) * 5
    a1.top_parent = np.arange(5, dtype=np.int64)
    aln0 = three_genome_alignment()
    src = aln0.open_genome("A")
    a.set_dna(0, src.get_dna(0, 25))
    a1.set_dna(0, src.get_dna(0, 25))
    ap.set_genome(a1)
    return ap


def test_append_subtree(tmp_path):
    main_p = str(tmp_path / "main.halz")
    app_p = str(tmp_path / "app.halz")
    save_alignment(three_genome_alignment(), main_p, fmt="halz")
    save_alignment(_append_alignment(), app_p, fmt="halz")
    r = run_tool("halAppendSubtree", main_p, app_p, "Anc", "A")
    assert r.returncode == 0, r.stderr
    out = open_alignment(main_p)
    validate_alignment(out)
    assert "A1" in out.tree
    assert out.tree.parent("A1") == "A"
    # homology now flows Anc -> A -> A1
    sys.path.insert(0, "tests")
    from naive_oracle import naive_map_base

    hits = naive_map_base(out, "A1", 2, "Anc")
    assert hits == {(2, False)}
    # ancestors marked dirty
    assert out.open_genome("Anc").metadata.get("needsUpdate") == "true"


def test_replace_genome_roundtrip(tmp_path):
    """Replacing a genome's tops from an identical donor is a no-op that
    still validates (exercises the transplant machinery)."""
    main_p = str(tmp_path / "m.halz")
    donor_p = str(tmp_path / "d.halz")
    aln = three_genome_alignment()
    save_alignment(aln, main_p, fmt="halz")
    save_alignment(aln, donor_p, fmt="halz")
    r = run_tool("halReplaceGenome", main_p, "A",
                 "--topAlignmentFile", donor_p)
    assert r.returncode == 0, r.stderr
    out = open_alignment(main_p)
    validate_alignment(out)
    g0 = aln.open_genome("A")
    g1 = out.open_genome("A")
    assert np.array_equal(g0.top_parent, g1.top_parent)
