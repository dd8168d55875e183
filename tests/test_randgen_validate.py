import numpy as np
import pytest

from hal_tpu.randgen import create_random_alignment, create_preset_alignment
from hal_tpu.ops.validate import validate_alignment, ValidationError
from hal_tpu.constants import NULL_INDEX


@pytest.mark.parametrize("seed", [0, 1, 2, 7])
def test_random_alignment_validates(seed):
    aln = create_random_alignment(seed=seed, max_genomes=8, min_segments=2,
                                  max_segments=30, min_segment_length=2,
                                  max_segment_length=20)
    assert aln.num_genomes >= 2
    validate_alignment(aln)


def test_random_alignment_deterministic():
    a = create_random_alignment(seed=42, max_genomes=6)
    b = create_random_alignment(seed=42, max_genomes=6)
    assert a.genome_names() == b.genome_names()
    for n in a.genome_names():
        ga, gb = a.open_genome(n), b.open_genome(n)
        assert np.array_equal(ga.top_start, gb.top_start)
        assert np.array_equal(ga.top_parent, gb.top_parent)
        assert np.array_equal(ga.dna, gb.dna)


def test_preset_small_validates():
    aln = create_preset_alignment("small", seed=0)
    validate_alignment(aln)
    assert 2 <= aln.num_genomes <= 5


def test_homolog_dna_similarity():
    """Mapped child segments should mostly match parent DNA (low mutation rate)."""
    aln = create_random_alignment(seed=3, max_genomes=4, max_branch_length=0.05,
                                  min_segments=10, max_segments=30,
                                  min_segment_length=50, max_segment_length=100)
    validate_alignment(aln)
    checked = 0
    for name in aln.genome_names():
        parent = aln.tree.parent(name)
        if parent is None:
            continue
        g, pg = aln.open_genome(name), aln.open_genome(parent)
        for i in range(g.num_top_segments):
            p = g.top_parent[i]
            if p == NULL_INDEX:
                continue
            ln = int(g.top_start[i + 1] - g.top_start[i])
            child_seq = g.get_dna(int(g.top_start[i]), ln)
            par_seq = pg.get_dna(int(pg.bot_start[p]), ln,
                                 reversed_=bool(g.top_parent_reversed[i]))
            frac = np.mean(child_seq == par_seq)
            assert frac > 0.7
            checked += 1
    assert checked > 0


def test_validator_catches_corruption():
    aln = create_random_alignment(seed=0, max_genomes=5, min_segments=5, max_segments=20)
    validate_alignment(aln)
    # corrupt a parent link
    for name in aln.genome_names():
        g = aln.open_genome(name)
        if g.num_top_segments and (g.top_parent != NULL_INDEX).any():
            i = int(np.flatnonzero(g.top_parent != NULL_INDEX)[0])
            g.top_parent[i] = 10 ** 9
            with pytest.raises(ValidationError):
                validate_alignment(aln)
            return
    pytest.skip("no mapped segment found")
