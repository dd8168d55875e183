"""Cross-check the vectorized segment mapper against the per-base oracle
on random alignments — the core correctness contract of the framework
(reference equivalents: api/tests/halMappedSegmentTest.cpp, 875 LoC)."""

import numpy as np
import pytest

from hal_tpu.randgen import create_random_alignment
from hal_tpu.ops import segmap_host as sm
from naive_oracle import fragments_to_base_pairs, naive_map_base, naive_map_interval


def _rand_intervals(rng, length, n, max_len=40):
    lo = rng.integers(0, max(1, length - 1), n)
    ln = rng.integers(1, max_len, n)
    hi = np.minimum(lo + ln, length)
    keep = hi > lo
    return lo[keep], hi[keep]


def _check_pair(aln, src, tgt, rng, n_intervals=12, do_dupes=True):
    g = aln.open_genome(src)
    if g.length == 0:
        return 0
    lo, hi = _rand_intervals(rng, g.length, n_intervals)
    checked = 0
    for l, h in zip(lo, hi):
        frags = sm.map_source(aln, src, np.array([l]), np.array([h]), tgt,
                              do_dupes=do_dupes)
        got = fragments_to_base_pairs(frags)
        want = naive_map_interval(aln, src, int(l), int(h), tgt, do_dupes=do_dupes)
        assert got == want, (
            f"{src}->{tgt} [{l},{h}) dupes={do_dupes}: "
            f"extra={sorted(got - want)[:5]} missing={sorted(want - got)[:5]}")
        checked += 1
    return checked


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_mapper_matches_oracle_all_pairs(seed):
    aln = create_random_alignment(seed=seed, max_genomes=6, min_segments=3,
                                  max_segments=25, min_segment_length=2,
                                  max_segment_length=12)
    rng = np.random.default_rng(seed + 100)
    names = aln.genome_names()
    total = 0
    for src in names:
        for tgt in names:
            if src == tgt:
                continue
            total += _check_pair(aln, src, tgt, rng, n_intervals=6)
    assert total > 0


def test_mapper_no_dupes():
    aln = create_random_alignment(seed=9, max_genomes=6, min_segments=5,
                                  max_segments=30, min_segment_length=2,
                                  max_segment_length=10)
    rng = np.random.default_rng(5)
    names = aln.genome_names()
    leaves = [n for n in names if aln.tree.is_leaf(n)]
    total = 0
    for src in leaves:
        for tgt in names:
            if src != tgt:
                total += _check_pair(aln, src, tgt, rng, n_intervals=4, do_dupes=False)
    assert total > 0


def test_batched_equals_per_interval():
    """Mapping a batch of intervals at once must equal interval-by-interval."""
    aln = create_random_alignment(seed=4, max_genomes=5, min_segments=5,
                                  max_segments=40, min_segment_length=3,
                                  max_segment_length=15)
    names = aln.genome_names()
    src = [n for n in names if aln.tree.is_leaf(n)][0]
    tgt = [n for n in names if n != src][-1]
    g = aln.open_genome(src)
    rng = np.random.default_rng(7)
    lo, hi = _rand_intervals(rng, g.length, 20)
    batch = sm.map_source(aln, src, lo, hi, tgt)
    got = fragments_to_base_pairs(batch)
    want = set()
    for l, h in zip(lo, hi):
        f = sm.map_source(aln, src, np.array([l]), np.array([h]), tgt)
        want |= fragments_to_base_pairs(f)
    assert got == want


def test_atomize_disjoint_or_equal():
    aln = create_random_alignment(seed=2, max_genomes=5, min_segments=5,
                                  max_segments=40, min_segment_length=3,
                                  max_segment_length=15)
    names = aln.genome_names()
    src = [n for n in names if aln.tree.is_leaf(n)][0]
    tgt = [n for n in names if n != src][-1]
    g = aln.open_genome(src)
    frags = sm.map_source(aln, src, np.array([0]), np.array([g.length]), tgt)
    ivs = sorted(set(zip(frags.tgt_lo.tolist(), frags.tgt_hi.tolist())))
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ivs, ivs[1:]):
        # sorted unique intervals must not partially overlap
        assert b_lo >= a_hi or (a_lo, a_hi) == (b_lo, b_hi)


def test_self_mapping_identity():
    """src == tgt with default coalescence limit: identity fragments."""
    aln = create_random_alignment(seed=0, max_genomes=5, min_segments=3,
                                  max_segments=20)
    src = [n for n in aln.genome_names() if aln.tree.is_leaf(n)][0]
    frags = sm.map_source(aln, src, np.array([5]), np.array([25]), src)
    got = fragments_to_base_pairs(frags)
    assert got == {(p, p, False) for p in range(5, 25)}


def test_merge_colinear_roundtrip():
    """atomize + merge back must preserve the base-pair set."""
    aln = create_random_alignment(seed=6, max_genomes=5, min_segments=5,
                                  max_segments=30, min_segment_length=3,
                                  max_segment_length=12)
    names = aln.genome_names()
    src = [n for n in names if aln.tree.is_leaf(n)][0]
    tgt = names[-1] if names[-1] != src else names[0]
    g = aln.open_genome(src)
    frags = sm.map_source(aln, src, np.array([0]), np.array([g.length]), tgt)
    merged = sm.merge_colinear(frags)
    assert fragments_to_base_pairs(merged) == fragments_to_base_pairs(frags)
    assert len(merged) <= len(frags)


def test_coalescence_limit_paralogies():
    """Mapping with a coalescence limit above the MRCA discovers paralogs
    (reference mapRecursiveParalogies, halSegmentMapper.cpp:525)."""
    aln = create_random_alignment(seed=21, max_genomes=6, min_segments=4,
                                  max_segments=25, min_segment_length=3,
                                  max_segment_length=12)
    root = aln.root_name
    names = aln.genome_names()
    leaves = [n for n in names if aln.tree.is_leaf(n)]
    checked = 0
    rng = np.random.default_rng(3)
    for src in leaves:
        g = aln.open_genome(src)
        if g.length < 4:
            continue
        for tgt in names:
            lo, hi = _rand_intervals(rng, g.length, 5)
            for l, h in zip(lo, hi):
                frags = sm.map_source(aln, src, np.array([l]), np.array([h]), tgt,
                                      do_dupes=True, coalescence_limit=root)
                got = fragments_to_base_pairs(frags)
                want = set()
                for p in range(int(l), int(h)):
                    for tp, rev in naive_map_base(aln, src, p, tgt,
                                                  coalescence_limit=root):
                        want.add((p, tp, rev))
                assert got == want, (src, tgt, l, h)
                checked += 1
    assert checked > 0
