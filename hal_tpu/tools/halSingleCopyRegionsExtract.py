"""halSingleCopyRegionsExtract — BED of single-copy regions
(reference extract/impl/halSingleCopyRegionsExtract.cpp)."""

from __future__ import annotations

import sys

import numpy as np

from hal_tpu import open_alignment
from hal_tpu.ops import segmap_host as sm
from hal_tpu.tools import HalError, add_storage_options, make_parser, tool_main

WINDOW = 1 << 20


def run(argv=None):
    p = make_parser("halSingleCopyRegionsExtract",
                    "Extract single-copy regions of a genome into BED")
    p.add_argument("halFile")
    p.add_argument("referenceGenome")
    p.add_argument("--targetGenomes", default="",
                   help="genomes to check (default: all leaves)")
    p.add_argument("--refSequence", default="")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--length", type=int, default=0)
    p.add_argument("--requireAllTargets", action="store_true")
    add_storage_options(p)
    o = p.parse_args(argv)
    aln = open_alignment(o.halFile)
    ref = o.referenceGenome
    if ref not in aln.tree:
        raise HalError("Genome %s not found" % ref)
    g = aln.open_genome(ref)
    targets = [t for t in o.targetGenomes.split(",") if t] or \
        [n for n in aln.genome_names() if aln.tree.is_leaf(n) and n != ref]

    if o.refSequence:
        si = g.sequence_index(o.refSequence)
        gs = int(g.seq_start[si]) + o.start
        ge = gs + (o.length or (g.seq_length(si) - o.start))
    else:
        gs = o.start
        ge = gs + (o.length or (g.length - gs))

    pos = gs
    while pos < ge:
        end = min(pos + WINDOW, ge)
        n = end - pos
        ok = np.ones(n, bool)
        # reference itself must be single-copy
        rfr = sm.map_source(aln, ref, np.array([pos]), np.array([end]), ref,
                            do_dupes=True, coalescence_limit=aln.root_name)
        rc = np.zeros(n, np.int64)
        for i in range(len(rfr)):
            rc[int(rfr.src_lo[i]) - pos:int(rfr.src_hi[i]) - pos] += 1
        ok &= rc == 1
        for t in targets:
            frags = sm.map_source(aln, ref, np.array([pos]), np.array([end]), t,
                                  do_dupes=True)
            c = np.zeros(n, np.int64)
            for i in range(len(frags)):
                c[int(frags.src_lo[i]) - pos:int(frags.src_hi[i]) - pos] += 1
            if o.requireAllTargets:
                ok &= c == 1
            else:
                ok &= c <= 1
        # emit runs
        d = np.diff(np.concatenate([[0], ok.astype(np.int8), [0]]))
        starts = np.flatnonzero(d == 1)
        ends = np.flatnonzero(d == -1)
        for a, b in zip(starts, ends):
            ga, gb = pos + int(a), pos + int(b)
            si = int(np.searchsorted(g.seq_start, ga, side="right")) - 1
            base = int(g.seq_start[si])
            sys.stdout.write("%s\t%d\t%d\n" % (g.seq_names[si], ga - base, gb - base))
        pos = end


def main(argv=None):
    return tool_main(run, argv)


if __name__ == "__main__":
    sys.exit(main())
