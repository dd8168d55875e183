"""Bulk liftover must produce byte-identical BED3 output to the per-line
Liftover path (which itself is oracle-verified)."""

import io

import numpy as np
import pytest

from hal_tpu.ops.liftover import Liftover
from hal_tpu.ops.liftover_bulk import bulk_liftover_bed3
from hal_tpu.randgen import create_random_alignment


def _per_line(aln, src, tgt, chroms, starts, ends):
    lo = Liftover(aln, src, tgt)
    text = "".join("%s\t%d\t%d\n" % (c, s, e) for c, s, e in zip(chroms, starts, ends))
    out = io.StringIO()
    lo.convert(io.StringIO(text), out, 0)
    return out.getvalue()


@pytest.mark.parametrize("seed", [0, 5, 13, 21])
def test_bulk_equals_per_line(seed):
    aln = create_random_alignment(seed=seed, max_genomes=6, min_segments=4,
                                  max_segments=30, min_segment_length=3,
                                  max_segment_length=14)
    names = aln.genome_names()
    leaves = [n for n in names if aln.tree.is_leaf(n)]
    src = leaves[0]
    tgt = leaves[-1] if leaves[-1] != src else names[-1]
    g = aln.open_genome(src)
    if g.length < 20:
        pytest.skip("fixture too small")
    rng = np.random.default_rng(seed + 7)
    n = 40
    starts, ends, chroms = [], [], []
    # disjoint intervals within the first sequence
    pos = 0
    seq_len = g.seq_length(0)
    while len(starts) < n and pos < seq_len - 2:
        ln = int(rng.integers(1, 30))
        gap = int(rng.integers(0, 10))
        s = pos + gap
        e = min(s + ln, seq_len)
        if e <= s:
            break
        starts.append(s)
        ends.append(e)
        chroms.append(g.seq_names[0])
        pos = e
    want = _per_line(aln, src, tgt, chroms, starts, ends)
    got = bulk_liftover_bed3(aln, src, tgt, chroms, starts, ends)
    assert got == want


def test_bulk_device_equals_per_line():
    aln = create_random_alignment(seed=3, max_genomes=5, min_segments=5,
                                  max_segments=25, min_segment_length=4,
                                  max_segment_length=12)
    names = aln.genome_names()
    leaves = [n for n in names if aln.tree.is_leaf(n)]
    src = leaves[0]
    tgt = leaves[-1] if leaves[-1] != src else names[-1]
    g = aln.open_genome(src)
    chroms, starts, ends = [], [], []
    pos = 0
    while pos + 12 < g.seq_length(0) and len(starts) < 15:
        starts.append(pos)
        ends.append(pos + 10)
        chroms.append(g.seq_names[0])
        pos += 17
    if not starts:
        pytest.skip("fixture too small")
    want = _per_line(aln, src, tgt, chroms, starts, ends)
    got = bulk_liftover_bed3(aln, src, tgt, chroms, starts, ends, use_device=True)
    assert got == want


def test_bulk_device_runs_path_matches_host():
    """use_device routes through bulk_runs_device (device-side merge +
    wire download); output text must equal the host pipeline's exactly."""
    from hal_tpu.ops.liftover_bulk import bulk_liftover_bed3, bulk_runs_device
    from hal_tpu.randgen import create_random_alignment

    aln = create_random_alignment(seed=27, max_genomes=7, min_genomes=5,
                                  mean_degree=1.4, min_segment_length=5,
                                  max_segment_length=30, min_segments=20,
                                  max_segments=90, store_dna=False)
    leaves = [n for n in sorted(aln.genome_names()) if aln.tree.is_leaf(n)
              and aln.open_genome(n).length > 40]
    if len(leaves) < 2:
        pytest.skip("fixture too small")
    src, tgt = leaves[0], leaves[-1]
    sg = aln.open_genome(src)
    tg = aln.open_genome(tgt)
    rng = np.random.default_rng(5)
    n = 128
    lo = rng.integers(0, max(sg.length - 20, 1), n).astype(np.int64)
    hi = np.minimum(lo + rng.integers(1, 20, n), sg.length)
    # the gate must actually take the device-runs path on this fixture
    assert bulk_runs_device(aln, src, tgt, lo, hi, tg) is not None
    chroms = [sg.seq_names[int(np.searchsorted(sg.seq_start, p, side="right")) - 1]
              for p in lo]
    base = np.array([sg.seq_start[sg.sequence_index(c)] for c in chroms])
    dev = bulk_liftover_bed3(aln, src, tgt, chroms, lo - base, hi - base,
                             use_device=True)
    host = bulk_liftover_bed3(aln, src, tgt, chroms, lo - base, hi - base,
                              use_device=False)
    assert dev == host


def test_convert_batched_device_pipelined_bytes_equal():
    """convert_batched(use_device=True) — the pipelined BatchMapper
    schedule — emits byte-identical output to the serial convert() across
    multiple chunks."""
    import io

    from hal_tpu.ops.liftover import Liftover
    from hal_tpu.randgen import create_random_alignment

    aln = create_random_alignment(seed=5, max_genomes=6, min_genomes=5,
                                  min_segments=10, max_segments=40,
                                  min_segment_length=4, max_segment_length=12)
    leaves = [n for n in aln.genome_names() if aln.tree.is_leaf(n)]
    src, tgt = leaves[0], leaves[-1]
    g = aln.open_genome(src)
    rng = np.random.default_rng(2)
    lines = []
    name = g.seq_names[0]
    slen = g.seq_length(0)
    for i in range(300):
        a = int(rng.integers(0, max(slen - 10, 1)))
        b = min(a + int(rng.integers(1, 12)), slen)
        lines.append("%s\t%d\t%d\n" % (name, a, b))
    bed = "".join(lines)
    lift = Liftover(aln, src, tgt)
    o1, o2 = io.StringIO(), io.StringIO()
    lift.convert(io.StringIO(bed), o1)
    lift2 = Liftover(aln, src, tgt)
    lift2.convert_batched(io.StringIO(bed), o2, batch_size=64,
                          use_device=True)
    assert o1.getvalue() == o2.getvalue()
