"""Shard-local table traversal (parallel/ring_sharded.py) vs the host
oracle: no device ever materializes a full level table — fragments are
all_to_all-routed to the shard owning their segment range — and the
resulting mapping must equal the host mapper's base-pair set exactly."""

import numpy as np
import pytest

from hal_tpu.ops import segmap_host as sm
from hal_tpu.ops import segmap_jax as sj
from hal_tpu.randgen import create_random_alignment

from naive_oracle import fragments_to_base_pairs


def _pairs_from_F(F):
    M = np.asarray(F).astype(np.int64)
    M = M[:, M[sj.C_VALID].astype(bool)]
    out = set()
    for c in range(M.shape[1]):
        s_lo, s_hi = M[sj.C_SLO, c], M[sj.C_SHI, c]
        t_lo, t_hi = M[sj.C_TLO, c], M[sj.C_THI, c]
        rev = bool(M[sj.C_REV, c])
        for o in range(s_hi - s_lo):
            out.add((int(s_lo + o),
                     int(t_hi - 1 - o) if rev else int(t_lo + o), rev))
    return out


def _host_pairs(aln, src, tgt, lo, hi):
    out = set()
    for i in range(len(lo)):
        frags = sm.map_source(aln, src, lo[i:i + 1], hi[i:i + 1], tgt)
        out |= fragments_to_base_pairs(frags)
    return out


@pytest.mark.parametrize("seed", [5, 23])
def test_ring_sharded_matches_oracle(seed):
    import jax

    from hal_tpu.parallel.ring_sharded import (build_ring_path,
                                               make_ring_sharded_step)
    from hal_tpu.parallel.sharded import make_mesh, shard_batch

    aln = create_random_alignment(seed=seed, max_genomes=6, min_genomes=5,
                                  min_segments=48, max_segments=96,
                                  min_segment_length=4, max_segment_length=9,
                                  store_dna=False)
    leaves = [n for n in aln.genome_names() if aln.tree.is_leaf(n)]
    src = leaves[0]
    tgt = leaves[-1] if leaves[-1] != src else aln.root_name
    g = aln.open_genome(src)

    D = 8
    mesh = make_mesh(D, 1)
    path = sj.PathData.build(aln, src, tgt)
    rls = build_ring_path(path, D)
    # no device slab holds more than ~1/D of a level's segment columns
    for rl, lv in zip(rls, path.levels):
        assert rl.seg_sh.shape[2] <= (lv.seg_table.shape[1] + D - 1) // D + 1

    n = 64
    rng = np.random.default_rng(3)
    lo = rng.integers(0, max(g.length - 16, 1), n).astype(np.int64)
    hi = np.minimum(lo + rng.integers(1, 16, n), g.length).astype(np.int64)

    caps = tuple((512, 256, 1024, 1024) for _ in path.levels)
    step = make_ring_sharded_step(rls, caps, mesh)
    args = shard_batch(mesh, lo, hi, np.arange(n, dtype=np.int64))
    F, ovf = step(*args)
    jax.block_until_ready(F)
    assert not np.asarray(ovf).any(), "capacity overflow"

    assert _pairs_from_F(F) == _host_pairs(aln, src, tgt, lo, hi)


def test_ring_sharded_owner_preserved():
    """Owners survive the all_to_all routing: per-owner mappings equal the
    per-interval host mapper."""
    import jax

    from hal_tpu.parallel.ring_sharded import (build_ring_path,
                                               make_ring_sharded_step)
    from hal_tpu.parallel.sharded import make_mesh, shard_batch

    aln = create_random_alignment(seed=11, max_genomes=5, min_genomes=4,
                                  min_segments=32, max_segments=64,
                                  min_segment_length=5,
                                  max_segment_length=12, store_dna=False)
    leaves = [n for n in aln.genome_names() if aln.tree.is_leaf(n)]
    src = leaves[0]
    tgt = leaves[-1] if leaves[-1] != src else aln.root_name
    g = aln.open_genome(src)
    D = 4
    mesh = make_mesh(D, 1)
    path = sj.PathData.build(aln, src, tgt)
    rls = build_ring_path(path, D)
    n = 16
    rng = np.random.default_rng(9)
    lo = rng.integers(0, max(g.length - 10, 1), n).astype(np.int64)
    hi = np.minimum(lo + rng.integers(1, 10, n), g.length).astype(np.int64)
    caps = tuple((256, 256, 512, 512) for _ in path.levels)
    step = make_ring_sharded_step(rls, caps, mesh)
    F, ovf = step(*shard_batch(mesh, lo, hi, np.arange(n, dtype=np.int64)))
    jax.block_until_ready(F)
    assert not np.asarray(ovf).any()
    M = np.asarray(F).astype(np.int64)
    M = M[:, M[sj.C_VALID].astype(bool)]
    for o in range(n):
        got = set()
        cols = np.flatnonzero(M[sj.C_OWN] == o)
        for c in cols:
            s_lo, s_hi = M[sj.C_SLO, c], M[sj.C_SHI, c]
            t_lo, t_hi = M[sj.C_TLO, c], M[sj.C_THI, c]
            rev = bool(M[sj.C_REV, c])
            for q in range(s_hi - s_lo):
                got.add((int(s_lo + q),
                         int(t_hi - 1 - q) if rev else int(t_lo + q),
                         bool(rev)))
        frags = sm.map_source(aln, src, lo[o:o + 1], hi[o:o + 1], tgt)
        want = fragments_to_base_pairs(frags)
        assert got == want, o
