"""Tests for the assembly-hub family: track generators (native GC /
mask signals), hal2assemblyHub artifacts, halGenerateComparisonHub,
halCoverageTable, blockVizBenchmark, halLodBenchmark."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest


def run_tool(tool, *args):
    return subprocess.run(
        [sys.executable, "-m", "hal_tpu.tools." + tool, *args],
        capture_output=True, text=True, timeout=600,
    )


@pytest.fixture(scope="module")
def hal(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("hub") / "t.halz")
    r = run_tool("halRandGen", p, "--seed", "2", "--maxGenomes", "5",
                 "--maxSegments", "40", "--maxSegmentLength", "25")
    assert r.returncode == 0, r.stderr
    return p


def test_gc_percent_wig_known_sequence():
    from hal_tpu.assemblyhub import gc_percent_wig
    from hal_tpu.genome import GenomeArrays, SequenceInfo
    from hal_tpu.dna import pack_dna

    g = GenomeArrays.create("g", [SequenceInfo("s", 10)])
    g.dna = pack_dna("GGGGGAATTC")
    out = io.StringIO()
    gc_percent_wig(g, out, win=5)
    lines = out.getvalue().splitlines()
    assert lines[0] == "fixedStep chrom=s start=1 step=5 span=5"
    assert lines[1:] == ["100", "20"]


def test_masked_bed_runs():
    from hal_tpu.assemblyhub import masked_bed
    from hal_tpu.genome import GenomeArrays, SequenceInfo
    from hal_tpu.dna import pack_dna

    g = GenomeArrays.create("g", [SequenceInfo("s", 12)])
    g.dna = pack_dna("AAacgtACGTtt")
    out = io.StringIO()
    n = masked_bed(g, out)
    assert n == 2
    assert out.getvalue() == "s\t2\t6\ns\t10\t12\n"


def test_hal2assemblyhub(hal, tmp_path):
    out = str(tmp_path / "hub")
    r = run_tool("hal2assemblyHub", hal, out, "--gcContent", "--rmsk")
    assert r.returncode == 0, r.stderr
    assert os.path.exists(os.path.join(out, "hub.txt"))
    assert os.path.exists(os.path.join(out, "genomes.txt"))
    gdirs = [d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))]
    assert gdirs
    g = gdirs[0]
    tdb = open(os.path.join(out, g, "trackDb.txt")).read()
    assert "type halSnake" in tdb
    assert "track gcPercent" in tdb
    assert "track repeatMasker" in tdb
    assert os.path.exists(os.path.join(out, g, g + ".gc.wig"))
    assert os.path.exists(os.path.join(out, g, "chrom.sizes"))
    # kent binaries are absent in this environment: the hub still gets
    # real bigWig/bigBed via the native writers (hal_tpu.io.bbi)
    import struct

    from hal_tpu.io import bbi
    bw = os.path.join(out, g, g + ".gc.bw")
    bb = os.path.join(out, g, g + ".rmsk.bb")
    assert os.path.exists(bw) and os.path.exists(bb)
    assert struct.unpack_from("<I", open(bw, "rb").read(4))[0] == \
        bbi.BIGWIG_MAGIC
    assert struct.unpack_from("<I", open(bb, "rb").read(4))[0] == \
        bbi.BIGBED_MAGIC
    assert "type bigWig" in tdb and "type bigBed" in tdb


def test_hal2assemblyhub_lod_manifest(hal, tmp_path):
    """--lod wires the LOD series into the hub with the browser-contract
    manifest (blockViz/inc/halBlockViz.h:108-125): hub-relative paths,
    '0 <hal>' first, 'N lod/...' after; snakes point at ../lod.txt."""
    out = str(tmp_path / "hub_lod")
    r = run_tool("hal2assemblyHub", hal, out, "--lod", "--maxBlock", "10",
                 "--numProc", "2", "--alignability")
    assert r.returncode == 0, r.stderr
    lod = open(os.path.join(out, "lod.txt")).read().splitlines()
    assert lod[0] == "0 " + os.path.basename(hal)
    assert len(lod) > 1 and all(ln.split()[1].startswith("lod/")
                                for ln in lod[1:])
    for ln in lod[1:]:
        assert os.path.exists(os.path.join(out, ln.split()[1]))
    assert os.path.exists(os.path.join(out, os.path.basename(hal)))
    assert os.path.exists(os.path.join(out, "groups.txt"))
    assert os.path.exists(os.path.join(out, "documentation", "hub.html"))
    gtxt = open(os.path.join(out, "genomes.txt")).read()
    assert "htmlPath" in gtxt and "groups groups.txt" in gtxt
    gdirs = [d for d in os.listdir(out)
             if os.path.isdir(os.path.join(out, d)) and d not in
             ("lod", "documentation")]
    g = gdirs[0]
    tdb = open(os.path.join(out, g, "trackDb.txt")).read()
    assert "bigDataUrl ../lod.txt" in tdb
    assert "track alignability" in tdb
    assert os.path.exists(os.path.join(out, g, g + ".alignability.wig"))
    assert os.path.exists(os.path.join(out, g, "description.html"))


def test_comparison_hub(hal, tmp_path):
    out = str(tmp_path / "chub")
    r = run_tool("halGenerateComparisonHub", out, hal, hal, "--labels", "x,y")
    assert r.returncode == 0, r.stderr
    hub = open(os.path.join(out, "hub.txt")).read()
    assert "hub x_vs_y" in hub
    assert os.path.islink(os.path.join(out, "input_0.hal"))
    gtxt = open(os.path.join(out, "genomes.txt")).read()
    assert "defaultPos" in gtxt
    gdir = next(d for d in os.listdir(out)
                if os.path.isdir(os.path.join(out, d))
                and not os.path.islink(os.path.join(out, d)))
    tdb = open(os.path.join(out, gdir, "trackDb.txt")).read()
    assert "compositeTrack on" in tdb
    assert "snake%s_x" % gdir in tdb or "snake" in tdb


def test_coverage_table(hal, tmp_path):
    cov = str(tmp_path / "c.txt")
    r = run_tool("halCoverage", hal, "Genome_3", "--numSamples", "5000")
    assert r.returncode == 0, r.stderr
    open(cov, "w").write(r.stdout)
    r2 = run_tool("halCoverageTable", "--input", cov, "--reference", "Genome_3")
    assert r2.returncode == 0, r2.stderr
    assert "Total\tc" in r2.stdout
    assert "100.00%" in r2.stdout
    r3 = run_tool("halCoverageTable", "--input", cov, "--reference", "Genome_3",
                  "--counts")
    assert "%" not in r3.stdout.replace("100.00%", "")


def test_blockviz_benchmark(hal):
    r = run_tool("blockVizBenchmark", hal, "Genome_1", "--maxLength", "100",
                 "--queriesPerLevel", "2")
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0].startswith("length, target")
    assert len(lines) > 1


def test_lod_benchmark_blockviz_fidelity(hal, tmp_path):
    """--doBlockViz adds the browser-query fidelity column (reference
    blockVizBenchmark.py quality check): fidelity <= 1, fine steps high."""
    out = str(tmp_path / "lodb")
    r = run_tool("halLodBenchmark", hal, out, "--steps", "4",
                 "--keepSequences", "--doBlockViz")
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln and not ln.startswith("#")]
    assert "queryFidelity" in lines[0]
    vals = lines[1].split(", ")
    fid = float(vals[lines[0].split(", ").index("queryFidelity")])
    assert 0.0 <= fid <= 1.0


def test_maf_mutations_counts():
    import io

    from hal_tpu.tools.mafMutations import count_maf

    maf = ("a\ns\tr.c\t0\t5\t+\t10\tACG-TA\ns\tq.c\t0\t5\t+\t10\tACC-TG\n"
           "s\tp.c\t2\t4\t-\t10\tA-GGTC\n\n"
           "a\ns\tr.c\t5\t3\t+\t10\tAAA\ns\tq.c\t5\t3\t+\t10\taaG\n")
    assert count_maf(io.StringIO(maf)) == 7
