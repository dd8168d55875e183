import shutil
import subprocess
import sys

import numpy as np
import pytest


def run_tool(tool, *args):
    return subprocess.run([sys.executable, "-m", "hal_tpu.tools." + tool, *args],
                          capture_output=True, text=True, timeout=300)


@pytest.fixture()
def halz(tmp_path):
    p = str(tmp_path / "m.halz")
    r = run_tool("halRandGen", p, "--seed", "3", "--maxGenomes", "5",
                 "--maxSegments", "20", "--maxSegmentLength", "25")
    assert r.returncode == 0, r.stderr
    return p


def test_set_metadata_and_rename(halz):
    assert run_tool("halSetMetadata", halz, "k1", "v1").returncode == 0
    r = run_tool("halStats", halz, "--metaData")
    assert "k1\tv1" in r.stdout
    assert run_tool("halSetMetadata", halz, "gk", "gv", "--genome", "Genome_0").returncode == 0
    r = run_tool("halStats", halz, "--genomeMetaData", "Genome_0")
    assert "gk\tgv" in r.stdout


def test_remove_genome_marks_ancestors(halz):
    r = run_tool("halStats", halz, "--genomes")
    names = r.stdout.split()
    leaf = [n for n in names if run_tool("halStats", halz, "--children", n).stdout.strip() == ""][0]
    assert run_tool("halRemoveGenome", halz, leaf).returncode == 0
    assert run_tool("halValidate", halz).returncode == 0
    r = run_tool("halStats", halz, "--genomes")
    assert leaf not in r.stdout.split()


def test_update_branch_lengths(halz):
    tree = run_tool("halStats", halz, "--tree").stdout.strip()
    import re

    newtree = re.sub(r":[0-9.eE+-]+", ":2.5", tree)
    assert run_tool("halUpdateBranchLengths", halz, newtree).returncode == 0
    r = run_tool("halStats", halz, "--tree")
    assert ":2.5" in r.stdout


def test_write_nucleotides(halz, tmp_path):
    r = run_tool("hal2fasta", halz, "Genome_0", "--lineWidth", "1000000")
    seq = "".join(l for l in r.stdout.splitlines() if not l.startswith(">"))
    old = seq[5].upper()
    new = "A" if old != "A" else "C"
    tsv = str(tmp_path / "edit.tsv")
    open(tsv, "w").write("Genome_0\t5\t%s\t%s\n" % (old, new))
    assert run_tool("halWriteNucleotides", halz, tsv).returncode == 0
    r = run_tool("hal2fasta", halz, "Genome_0", "--lineWidth", "1000000")
    seq2 = "".join(l for l in r.stdout.splitlines() if not l.startswith(">"))
    assert seq2[5] == new


def test_aligned_extract_complement_partition(halz):
    r1 = run_tool("halStats", halz, "--genomes")
    leafs = [n for n in r1.stdout.split()
             if run_tool("halStats", halz, "--children", n).stdout.strip() == ""]
    leaf = leafs[0]
    a = run_tool("halAlignedExtract", halz, leaf).stdout
    c = run_tool("halAlignedExtract", halz, leaf, "--complement").stdout

    def total(bed):
        return sum(int(l.split("\t")[2]) - int(l.split("\t")[1])
                   for l in bed.splitlines() if l)

    row = [l for l in run_tool("halStats", halz).stdout.splitlines()
           if l.startswith(leaf + ",")][0]
    length = int(row.split(", ")[2])
    assert total(a) + total(c) == length


def test_4d_extract(tmp_path):
    # build an alignment then a fake gene covering the first 30bp
    p = str(tmp_path / "g.halz")
    assert run_tool("halRandGen", p, "--seed", "9", "--maxGenomes", "3",
                    "--maxSegments", "10", "--minSegmentLength", "30",
                    "--maxSegmentLength", "40").returncode == 0
    genomes = run_tool("halStats", p, "--genomes").stdout.split()
    g = genomes[0]
    seqs = run_tool("halStats", p, "--sequences", g).stdout.strip().split(",")
    bed = str(tmp_path / "gene.bed")
    open(bed, "w").write("%s\t0\t30\tgene1\t0\t+\t0\t30\t0\t1\t30\t0\n" % seqs[0])
    r = run_tool("hal4dExtract", p, g, bed, "stdout")
    assert r.returncode == 0, r.stderr
    fasta = run_tool("hal2fasta", p, g, "--lineWidth", "1000000").stdout
    seq = "".join(l for l in fasta.splitlines() if not l.startswith(">"))[:30].upper()
    want = []
    FOURFOLD = {"CT", "GT", "TC", "CC", "AC", "GC", "CG", "GG"}
    for c0 in range(0, 30, 3):
        if seq[c0:c0 + 2] in FOURFOLD:
            want.append(c0 + 2)
    got = [int(l.split("\t")[1]) for l in r.stdout.splitlines()]
    assert got == want
