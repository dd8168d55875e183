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
