import subprocess
import sys

import numpy as np
import pytest

from fixtures import three_genome_alignment
from hal_tpu.ops.lod import extract_lod
from hal_tpu.ops.validate import validate_alignment
from hal_tpu import blockviz as bv


def run_tool(tool, *args):
    return subprocess.run([sys.executable, "-m", "hal_tpu.tools." + tool, *args],
                          capture_output=True, text=True, timeout=300)


def test_lod_extract_validates_and_coarsens():
    from hal_tpu.randgen import create_random_alignment

    aln = create_random_alignment(seed=17, max_genomes=6, min_segments=20,
                                  max_segments=60, min_segment_length=5,
                                  max_segment_length=20)
    lod = extract_lod(aln, scale=50)
    validate_alignment(lod)
    for n in aln.genome_names():
        g0 = aln.open_genome(n)
        g1 = lod.open_genome(n)
        assert g1.length == g0.length
        assert g1.num_top_segments <= g0.num_top_segments + 2
        assert not g1.has_dna or g1.length == 0


def test_lod_retains_paralogy():
    """Default extract_lod keeps paralogous copies as valid coarse rings
    and strictly beats the --onlyOrthologs mode's aligned-base coverage
    (reference LodExtract carries duplications through its LodGraph,
    lod/impl/halLodExtract.cpp)."""
    from hal_tpu.constants import NULL_INDEX
    from hal_tpu.randgen import create_random_alignment

    def aligned_total(a):
        tot = 0
        for n in a.genome_names():
            g = a.open_genome(n)
            if a.tree.parent(n) is None or g.num_top_segments == 0:
                continue
            idx = np.flatnonzero(g.top_parent != NULL_INDEX)
            tot += int(np.diff(g.top_start)[idx].sum())
        return tot

    aln = create_random_alignment(seed=17, max_genomes=6, min_segments=40,
                                  max_segments=120, min_segment_length=10,
                                  max_segment_length=40)
    lod = extract_lod(aln, scale=20)
    validate_alignment(lod)  # rings must satisfy validateDuplications
    lod_ortho = extract_lod(aln, scale=20, only_orthologs=True)
    validate_alignment(lod_ortho)
    assert aligned_total(lod) > aligned_total(lod_ortho)

    rings = 0
    for n in lod.genome_names():
        g = lod.open_genome(n)
        members = np.flatnonzero(g.top_paralogy != NULL_INDEX)
        rings += len(members)
        if len(members) == 0:
            continue
        # ring members share a parent tile and exactly one is canonical
        parent = lod.tree.parent(n)
        pg = lod.open_genome(parent)
        slot = lod.tree.child_index(parent, n)
        for ti in members:
            pi = g.top_parent[ti]
            assert pi == g.top_parent[g.top_paralogy[ti]]
            back = pg.bot_child[pi, slot]
            assert back in members or back == ti
        og = lod_ortho.open_genome(n)
        assert (og.top_paralogy == NULL_INDEX).all()
    assert rings > 0


def test_lod_interpolate_manifest(tmp_path):
    p = str(tmp_path / "x.halz")
    assert run_tool("halRandGen", p, "--seed", "4", "--maxGenomes", "4",
                    "--maxSegments", "40", "--maxSegmentLength", "30").returncode == 0
    manifest = str(tmp_path / "lod.txt")
    r = run_tool("halLodInterpolate", p, manifest, "--maxBlock", "50")
    assert r.returncode == 0, r.stderr
    lines = open(manifest).read().splitlines()
    assert lines[0].startswith("0 ")
    assert len(lines) >= 1
    # manager picks lod0 for small queries
    mgr = bv.LodManager(manifest)
    assert mgr.path_for(1).endswith(".halz")


def test_blockviz_blocks_match_liftover():
    aln = three_genome_alignment()
    import io, tempfile, os
    from hal_tpu.storage import save_alignment

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "f.halz")
        save_alignment(aln, p, fmt="halz")
        h = bv.hal_open(p)
        assert set(bv.get_genome_names(h)) == {"Anc", "A", "B"}
        assert bv.get_chroms(h, "A") == [("A_seq", 25)]
        blocks, dupes = bv.get_blocks_in_target_range(
            h, "B", "A", "A_seq", 0, 25, seq_mode=bv.HAL_LOD0_SEQUENCE)
        cover = sorted((b.t_start, b.t_start + b.size, b.strand) for b in blocks)
        # A[0,5)->B fwd, A[5,10)->B rev(+rev=fwd in B?), A[10,15)->two dupes
        assert (0, 5, "+") in cover
        assert any(a == 10 for a, _, _ in cover)
        for b in blocks:
            assert len(b.q_sequence) == b.size
            assert len(b.t_sequence) == b.size
        dna = bv.get_dna(h, "A", "A_seq", 0, 10)
        assert len(dna) == 10


def test_hal2chain_cli(tmp_path):
    p = str(tmp_path / "c.halz")
    assert run_tool("halRandGen", p, "--seed", "6", "--maxGenomes", "4",
                    "--maxSegments", "30", "--maxSegmentLength", "25").returncode == 0
    genomes = run_tool("halStats", p, "--genomes").stdout.split()
    child = [g for g in genomes if run_tool("halStats", p, "--parent", g).stdout.strip()][0]
    r = run_tool("hal2chain", p, child, "--maxGap", "1000")
    assert r.returncode == 0, r.stderr
    if r.stdout:
        assert r.stdout.startswith("chain ")
