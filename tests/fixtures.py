"""Hand-built alignments with known structure for exact-output tests
(the reference does the same in liftover/tests/halLiftoverTests.cpp:272-441)."""

import numpy as np

from hal_tpu.alignment import Alignment
from hal_tpu.genome import GenomeArrays, SequenceInfo


def three_genome_alignment():
    """Root 'Anc' (30 bp, 6 bottom segments of 5) with children A and B (25 bp,
    5 top segments of 5):

      A: T0->B0 fwd, T1->B1 REV, T2->B2 fwd, T3 inserted, T4->B4 fwd
      B: T0->B0 fwd, T1->B1 fwd, T2->B2 fwd, T3->B2 fwd (duplication ring,
         canonical = T3), T4->B5 REV
      deletions: B3 (in A: also B5; in B: also B4)
    """
    aln = Alignment()
    aln.add_root_genome("Anc", [SequenceInfo("Anc_seq", 30, 0, 6)])
    aln.tree.add_child("Anc", "A", 0.1)
    aln.tree.add_child("Anc", "B", 0.2)

    anc = aln.open_genome("Anc")
    anc.bot_start[:-1] = np.arange(6) * 5
    anc.bot_child = np.full((6, 2), -1, np.int64)
    anc.bot_child_reversed = np.zeros((6, 2), np.uint8)

    a = GenomeArrays.create("A", [SequenceInfo("A_seq", 25, 5, 0)], num_children=0)
    a.top_start[:-1] = np.arange(5) * 5
    a.top_parent = np.array([0, 1, 2, -1, 4], np.int64)
    a.top_parent_reversed = np.array([0, 1, 0, 0, 0], np.uint8)
    aln.set_genome(a)

    b = GenomeArrays.create("B", [SequenceInfo("B_seq", 25, 5, 0)], num_children=0)
    b.top_start[:-1] = np.arange(5) * 5
    b.top_parent = np.array([0, 1, 2, 2, 5], np.int64)
    b.top_parent_reversed = np.array([0, 0, 0, 0, 1], np.uint8)
    b.top_paralogy = np.array([-1, -1, 3, 2, -1], np.int64)
    aln.set_genome(b)

    # parent child links (slot 0 = A, slot 1 = B); canonical dup = last writer
    anc.bot_child[:, 0] = [0, 1, 2, -1, 4, -1]
    anc.bot_child_reversed[:, 0] = [0, 1, 0, 0, 0, 0]
    anc.bot_child[:, 1] = [0, 1, 3, -1, -1, 4]
    anc.bot_child_reversed[:, 1] = [0, 0, 0, 0, 0, 1]

    # deterministic DNA
    rng = np.random.default_rng(0)
    DNA = np.frombuffer(b"ACGT", dtype=np.uint8)
    anc.set_dna(0, DNA[rng.integers(0, 4, 30)])
    from hal_tpu import dna as dnacodec

    for child, g in (("A", a), ("B", b)):
        out = np.empty(25, np.uint8)
        for i in range(5):
            p = g.top_parent[i]
            if p == -1:
                out[i * 5:(i + 1) * 5] = DNA[rng.integers(0, 4, 5)]
            else:
                out[i * 5:(i + 1) * 5] = anc.get_dna(int(p) * 5, 5,
                                                     reversed_=bool(g.top_parent_reversed[i]))
        g.set_dna(0, out)
    return aln
