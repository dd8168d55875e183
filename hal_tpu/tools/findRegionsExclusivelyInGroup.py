"""findRegionsExclusivelyInGroup — BED of reference regions aligned to the
ingroup but (mostly) not the outgroup
(reference modify/findRegionsExclusivelyInGroup.cpp)."""

from __future__ import annotations

import sys

import numpy as np

from hal_tpu import open_alignment
from hal_tpu.ops import segmap_host as sm
from hal_tpu.tools import HalError, add_storage_options, make_parser, tool_main

WINDOW = 1 << 20


def run(argv=None):
    p = make_parser("findRegionsExclusivelyInGroup",
                    "Output BED of regions aligned only within the ingroup")
    p.add_argument("halFile")
    p.add_argument("referenceGenome")
    p.add_argument("ingroupGenomes", help="comma-separated ingroup genomes")
    p.add_argument("--minIngroupGenomes", type=int, default=None,
                   help="minimum ingroup genomes aligned (default: all)")
    p.add_argument("--maxOutgroupGenomes", type=int, default=0)
    add_storage_options(p)
    o = p.parse_args(argv)
    aln = open_alignment(o.halFile)
    ref = o.referenceGenome
    g = aln.open_genome(ref)
    ingroup = [t for t in o.ingroupGenomes.split(",") if t]
    for t in ingroup:
        if t not in aln.tree:
            raise HalError("Genome %s not found" % t)
    leaves = [n for n in aln.genome_names() if aln.tree.is_leaf(n)]
    outgroup = [n for n in leaves if n not in ingroup and n != ref]
    min_in = o.minIngroupGenomes if o.minIngroupGenomes is not None else len(ingroup)

    pos = 0
    while pos < g.length:
        end = min(pos + WINDOW, g.length)
        n = end - pos

        def coverage(t):
            frags = sm.map_source(aln, ref, np.array([pos]), np.array([end]), t,
                                  do_dupes=True)
            c = np.zeros(n, bool)
            for i in range(len(frags)):
                c[int(frags.src_lo[i]) - pos:int(frags.src_hi[i]) - pos] = True
            return c

        in_count = np.zeros(n, np.int64)
        for t in ingroup:
            in_count += coverage(t)
        out_count = np.zeros(n, np.int64)
        for t in outgroup:
            out_count += coverage(t)
        ok = (in_count >= min_in) & (out_count <= o.maxOutgroupGenomes)
        d = np.diff(np.concatenate([[0], ok.astype(np.int8), [0]]))
        for a, b in zip(np.flatnonzero(d == 1), np.flatnonzero(d == -1)):
            ga, gb = pos + int(a), pos + int(b)
            si = int(np.searchsorted(g.seq_start, ga, side="right")) - 1
            base = int(g.seq_start[si])
            sys.stdout.write("%s\t%d\t%d\n" % (g.seq_names[si], ga - base, gb - base))
        pos = end


def main(argv=None):
    return tool_main(run, argv)


if __name__ == "__main__":
    sys.exit(main())
