"""halLodBenchmark — sweep LOD extraction step sizes and report size /
segment-count reduction and extraction time (reference
lod/halLodBenchmark.py; the reference's optional mafComparator accuracy
step needed external mafTools — here the accuracy proxy is column counts
from hal2maf when --doMaf is given)."""

from __future__ import annotations

import os
import subprocess
import sys
import time

from hal_tpu.parallel.mp import get_hal_genomes, get_hal_num_segments
from hal_tpu.tools import make_parser, tool_main


def total_segments(hal: str) -> tuple:
    tot_top = tot_bot = 0
    for g in get_hal_genomes(hal):
        t, b = get_hal_num_segments(hal, g)
        tot_top += t
        tot_bot += b
    return tot_top, tot_bot


def run(argv=None):
    p = make_parser("halLodBenchmark",
                    "Benchmark halLodExtract across step sizes")
    p.add_argument("hal")
    p.add_argument("outDir")
    p.add_argument("--steps", default="2,4,8,16",
                   help="comma list of scale steps")
    p.add_argument("--doMaf", action="store_true",
                   help="also export MAF per level and count columns")
    p.add_argument("--keepSequences", action="store_true")
    o = p.parse_args(argv)

    os.makedirs(o.outDir, exist_ok=True)
    base_top, base_bot = total_segments(o.hal)
    base_size = os.path.getsize(o.hal)
    out = sys.stdout
    out.write("step, time(s), fileSize, sizeRatio, topSegs, botSegs, segRatio")
    if o.doMaf:
        out.write(", mafLines")
    out.write("\n")
    for step in [int(s) for s in o.steps.split(",") if s]:
        lod = os.path.join(o.outDir, "lod%d.hal" % step)
        t0 = time.time()
        cmd = [sys.executable, "-m", "hal_tpu.tools.halLodExtract",
               o.hal, lod, str(step)]
        if o.keepSequences:
            cmd.append("--keepSequences")
        subprocess.run(cmd, check=True)
        dt = time.time() - t0
        top, bot = total_segments(lod)
        size = os.path.getsize(lod)
        row = "%d, %.2f, %d, %.3f, %d, %d, %.3f" % (
            step, dt, size, size / max(base_size, 1), top, bot,
            (top + bot) / max(base_top + base_bot, 1))
        if o.doMaf:
            maf = os.path.join(o.outDir, "lod%d.maf" % step)
            with open(maf, "w") as f:
                subprocess.run([sys.executable, "-m", "hal_tpu.tools.hal2maf",
                                lod, "/dev/stdout"], stdout=f, check=True)
            with open(maf) as f:
                row += ", %d" % sum(1 for _ in f)
        out.write(row + "\n")


def main(argv=None):
    return tool_main(run, argv)


if __name__ == "__main__":
    sys.exit(main())
