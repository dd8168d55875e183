"""Device run extraction (_runs_packed_jit) vs the host oracle
(ops.liftover.extract_runs over atomize): decoded merged runs must equal
the host's exactly — clean owners merge on device, dupe-flagged owners are
refined on host with the full class-merge + query-cut rules."""

import numpy as np
import pytest

from hal_tpu.ops import segmap_host as sm
from hal_tpu.ops import segmap_jax as sj
from hal_tpu.ops.liftover import extract_runs

LEN_BITS = 8


def _host_runs(aln, src, tgt, lo, hi):
    """extract_runs per owner: (owner, s_lo, s_hi, t_lo, t_hi, rev) rows."""
    tg = aln.open_genome(tgt)
    seqst = tg.seq_start

    def seq_of(p):
        return int(np.searchsorted(seqst, p, side="right")) - 1

    rows = []
    for i in range(len(lo)):
        frags = sm.map_source(aln, src, lo[i:i + 1], hi[i:i + 1], tgt,
                              do_dupes=True)
        frags = sm.atomize(frags)
        for run in extract_runs(frags, seq_of):
            s_lo = min(f.src_lo for f in run)
            s_hi = max(f.src_hi for f in run)
            t_lo = run[0].tgt_lo
            t_hi = run[-1].tgt_hi
            rows.append((i, s_lo, s_hi, t_lo, t_hi, int(run[0].rev)))
    return sorted(rows)


def _device_runs(aln, src, tgt, lo, hi):
    import jax.numpy as jnp

    path = sj.PathData.build(aln, src, tgt)
    dtype = path.levels[0].grid.dtype
    n = len(lo)
    lo_d = jnp.asarray(lo, dtype)
    hi_d = jnp.asarray(hi, dtype)
    own_d = jnp.arange(n, dtype=dtype)
    totals, final = sj.host_path_totals(aln, src, tgt, lo, hi)
    caps = sj.caps_from_totals(path, totals)
    F, bound, ovf, _ = sj._map_batch_jit(path, lo_d, hi_d, own_d, caps)
    assert not bool(np.asarray(ovf.reshape(1))[0])
    tg = aln.open_genome(tgt)
    seq_grid = sj.target_seq_grid(tg)
    out_cols = sj._bucket_cap(final)
    wire, total, ovf2 = sj._runs_packed_jit(F, lo_d, seq_grid, out_cols,
                                            LEN_BITS)
    assert not bool(np.asarray(ovf2.reshape(1))[0]), "packed overflow"
    assert wire.shape[0] == sj.wire_words(out_cols, n)
    s_lo, s_hi, t_lo, t_hi, rev, own, dupes = sj.decode_runs_packed(
        wire, int(np.asarray(total)), lo, out_cols, LEN_BITS)

    seqst = tg.seq_start

    def seq_of(p):
        return int(np.searchsorted(seqst, p, side="right")) - 1

    rows = []
    for i in range(len(s_lo)):
        o = int(own[i])
        if dupes[o]:
            continue  # handled below from the raw fragments
        rows.append((o, int(s_lo[i]), int(s_hi[i]), int(t_lo[i]),
                     int(t_hi[i]), int(rev[i])))
    # dupe-flagged owners: host-exact merge over their (unmerged) fragments
    for o in np.flatnonzero(dupes):
        m = own == o
        # device fragments are un-deduped (the reference's set semantics
        # dedupe, halSegmentMapper.cpp:475); unique first
        rows_m = np.unique(np.stack([s_lo[m], s_hi[m], t_lo[m], t_hi[m],
                                     rev[m]], axis=1), axis=0)
        frags = sm.Fragments(rows_m[:, 0], rows_m[:, 1], rows_m[:, 2],
                             rows_m[:, 3], rows_m[:, 4].astype(np.uint8))
        frags = sm.atomize(frags)
        for run in extract_runs(frags, seq_of):
            rows.append((int(o), min(f.src_lo for f in run),
                         max(f.src_hi for f in run), run[0].tgt_lo,
                         run[-1].tgt_hi, int(run[0].rev)))
    return sorted(rows)


@pytest.mark.parametrize("seed", [3, 17, 29])
def test_device_runs_equal_host(seed):
    from hal_tpu.randgen import create_random_alignment

    aln = create_random_alignment(seed=seed, max_genomes=8, min_genomes=5,
                                  mean_degree=1.4, max_branch_length=0.5,
                                  min_segment_length=5, max_segment_length=40,
                                  min_segments=10, max_segments=80,
                                  store_dna=False)
    leaves = [n for n in sorted(aln.genome_names()) if aln.tree.is_leaf(n)
              and aln.open_genome(n).length > 30]
    if len(leaves) < 2:
        pytest.skip("fixture too small")
    src, tgt = leaves[0], leaves[-1]
    g = aln.open_genome(src)
    rng = np.random.default_rng(seed)
    n = 64
    lo = rng.integers(0, max(g.length - 30, 1), n).astype(np.int64)
    hi = lo + rng.integers(1, 30, n)
    assert _device_runs(aln, src, tgt, lo, hi) == _host_runs(aln, src, tgt,
                                                             lo, hi)


def test_device_runs_multi_sequence_boundary():
    """A target with multiple sequences: abutting coordinates across the
    sequence boundary must NOT merge (extract_runs seq_index_of rule)."""
    from fixtures import three_genome_alignment

    aln = three_genome_alignment()
    g = aln.open_genome("A")
    lo = np.array([0, 5, 10], np.int64)
    hi = np.array([25, 22, 18], np.int64)
    assert _device_runs(aln, "A", "B", lo, hi) == _host_runs(aln, "A", "B",
                                                             lo, hi)
