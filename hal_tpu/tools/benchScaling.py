"""benchScaling — multi-device scaling-efficiency harness
(BASELINE.json config #5: "segment arrays sharded across N hosts with
collective block merge"; SURVEY.md milestone M3).

Runs the sharded liftover+depth SPMD step (hal_tpu.parallel.sharded) over
meshes of 1, 2, ..., N devices and reports intervals/s and scaling
efficiency vs the single-device rate.  On a machine without multiple
accelerators, run on the virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python -m hal_tpu.tools.benchScaling --devices 1,2,4,8

(virtual-CPU numbers validate the collective plumbing and shard balance,
not absolute speed).  Emits one JSON line per mesh size plus a summary.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from hal_tpu.tools import make_parser, tool_main


def run(argv=None):
    p = make_parser("benchScaling", "Sharded-step scaling benchmark")
    p.add_argument("--devices", default="",
                   help="comma list of mesh sizes (default: 1..all)")
    p.add_argument("--nIntervals", type=int, default=1 << 16)
    p.add_argument("--nGenomes", type=int, default=6)
    p.add_argument("--nSegments", type=int, default=800)
    p.add_argument("--fixtureSizes", default="",
                   help="comma list of nSegments values to sweep (VERDICT "
                        "r4 weak #5: ring vs table compared at multiple "
                        "fixture sizes); default: just --nSegments")
    p.add_argument("--column", action="store_true",
                   help="also time the sharded device COLUMN step "
                        "(hal2maf structure discovery) per mesh size")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--seed", type=int, default=7)
    o = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from hal_tpu.randgen import create_random_alignment
    from hal_tpu.ops.segmap_jax import PathData
    from hal_tpu.parallel.sharded import make_mesh, make_sharded_step, shard_batch

    sizes = [int(x) for x in o.devices.split(",") if x]
    if sizes:
        # must run before the first backend init (XLA_FLAGS parse is
        # once-per-process)
        from hal_tpu.parallel.sharded import ensure_virtual_devices

        ensure_virtual_devices(max(sizes))
    all_dev = jax.devices()
    sizes = sizes or [d for d in (1, 2, 4, 8, 16) if d <= len(all_dev)]
    sys.stderr.write("devices available: %d (%s)\n"
                     % (len(all_dev), all_dev[0].platform))

    fixture_sizes = ([int(x) for x in o.fixtureSizes.split(",") if x]
                     or [o.nSegments])
    all_rows = []
    for n_segments in fixture_sizes:
        _sweep_fixture(o, n_segments, sizes, all_dev, all_rows)
    if all_rows:
        print(json.dumps({"metric": "sharded_scaling", "results": all_rows}))


def _sweep_fixture(o, n_segments, sizes, all_dev, all_rows):
    import jax
    import numpy as np

    from hal_tpu.randgen import create_random_alignment
    from hal_tpu.ops.segmap_jax import PathData
    from hal_tpu.parallel.sharded import (make_mesh, make_sharded_step,
                                          make_table_sharded_step,
                                          shard_batch, shard_path_tables)
    import json
    import sys
    import time

    aln = create_random_alignment(
        seed=o.seed, max_genomes=o.nGenomes, min_genomes=o.nGenomes - 1,
        min_segment_length=40, max_segment_length=60,
        min_segments=n_segments // 2, max_segments=n_segments)
    leaves = [n for n in aln.genome_names() if aln.tree.is_leaf(n)
              and aln.open_genome(n).length > 0]
    src, tgt = leaves[0], leaves[-1]
    sg, tg = aln.open_genome(src), aln.open_genome(tgt)
    path = PathData.build(aln, src, tgt)

    rng = np.random.default_rng(0)
    n = o.nIntervals
    lo = rng.integers(0, max(sg.length - 100, 1), n).astype(np.int64)
    hi = np.minimum(lo + rng.integers(1, 100, n), sg.length).astype(np.int64)
    owner = np.arange(n, dtype=np.int64)

    base_rate = None
    rows = []
    for nd in sizes:
        if nd > len(all_dev):
            continue
        mesh = make_mesh(nd, 1)
        per_dev = -(-n // nd)
        caps = tuple((int(per_dev * 8), int(per_dev * 8)) if
                     (l.kind == "down" and l.max_ring) else int(per_dev * 8)
                     for l in path.levels)
        step = make_sharded_step(path, caps, tg.length, 16, mesh)
        args = shard_batch(mesh, lo, hi, owner)
        F, cov = step(*args)          # compile + warmup
        _ = np.asarray(cov[:1])       # honest sync (fetch)
        t0 = time.time()
        for _i in range(o.iters):
            F, cov = step(*args)
        _ = np.asarray(cov[:1])
        dt = (time.time() - t0) / o.iters
        rate = n / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * nd)
        row = {"devices": nd, "fixture_segments": n_segments,
               "intervals_per_s": round(rate, 1),
               "scaling_efficiency": round(eff, 3)}
        # table-sharded variant (tables rest 1/D per device, all-gathered
        # per hop): the ring-vs-table decision a real pod needs per scale
        if nd > 1:
            path_sh = shard_path_tables(path, make_mesh(nd, 1))
            tstep = make_table_sharded_step(path_sh, caps, make_mesh(nd, 1))
            Ft, ovt = tstep(*args)
            _ = np.asarray(ovt[:1])
            t0 = time.time()
            for _i in range(o.iters):
                Ft, ovt = tstep(*args)
            _ = np.asarray(ovt[:1])
            tdt = (time.time() - t0) / o.iters
            if not np.asarray(ovt).any():
                row["table_sharded_intervals_per_s"] = round(n / tdt, 1)
        # sharded device column engine (hal2maf structure discovery,
        # window data-parallel over the mesh — ops/column_jax)
        if o.column:
            from hal_tpu.ops import column_jax as cj

            eng = cj.DeviceColumnEngine(aln, src)
            W = min(int(sg.length), 1 << 14)
            edges = np.linspace(0, W, nd + 1).astype(np.int64)
            caps_all, oc_all = cj.size_sharded_caps(eng, edges)
            cstep = cj.make_sharded_column_step(eng, caps_all, oc_all, mesh)
            from jax.sharding import NamedSharding, PartitionSpec as _P

            shd = NamedSharding(mesh, _P("data"))
            lo_sh = jax.device_put(edges[:-1].copy(), shd)
            hi_sh = jax.device_put(edges[1:].copy(), shd)
            outs = cstep(lo_sh, hi_sh)
            _ = np.asarray(outs[0][1])
            t0 = time.time()
            for _i in range(o.iters):
                outs = cstep(lo_sh, hi_sh)
            _ = np.asarray(outs[0][1])
            cdt = (time.time() - t0) / o.iters
            row["column_cols_per_s"] = round(W / cdt, 1)
            row["column_programs"] = len(eng.jobs)
        # shard-local variant (parallel/ring_sharded): tables never
        # rematerialize; reports the all_to_all routing overhead
        if nd > 1 and not path.para:
            from hal_tpu.parallel.ring_sharded import (build_ring_path,
                                                       make_ring_sharded_step)

            rls = build_ring_path(path, nd)
            rcaps = tuple((int(per_dev * 8), int(per_dev * 8),
                           int(per_dev * 16), int(per_dev * 16))
                          for _ in path.levels)
            rstep = make_ring_sharded_step(rls, rcaps, mesh)
            Fr, ovf = rstep(*args)
            _ = np.asarray(ovf[:1])
            t0 = time.time()
            for _i in range(o.iters):
                Fr, ovf = rstep(*args)
            _ = np.asarray(ovf[:1])
            rdt = (time.time() - t0) / o.iters
            if not np.asarray(ovf).any():
                row["ring_intervals_per_s"] = round(n / rdt, 1)
        rows.append(row)
        all_rows.append(row)
        print(json.dumps(row))


def main(argv=None):
    return tool_main(run, argv)


if __name__ == "__main__":
    sys.exit(main())
