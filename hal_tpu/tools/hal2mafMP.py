"""hal2mafMP — process-parallel hal2maf (reference maf/hal2mafMP.py).

Slices the reference genome into windows (or splits by sequence / BED
targets), runs one hal2maf --unique per slice in a process pool, and
concatenates the results.  Note: on a single TPU host the sharded device
path is usually faster; this driver exists for workflow parity."""

from __future__ import annotations

import os
import sys
import tempfile

from hal_tpu.parallel.mp import (get_hal_genome_length, get_hal_root_name,
                                 get_hal_sequences, run_parallel_shell_commands)
from hal_tpu.tools import HalError, make_parser, tool_main

PASS_THROUGH = ["refSequence", "rootGenome", "targetGenomes", "maxRefGap",
                "maxBlockLen"]
PASS_FLAGS = ["noDupes", "noAncestors", "onlySequenceNames", "onlyOrthologs",
              "keepEmptyRefBlocks"]


def compute_slices(length: int, slice_size: int):
    """reference computeSlices (maf/hal2mafMP.py:63-80)."""
    pos = 0
    while pos < length:
        yield pos, min(slice_size, length - pos)
        pos += slice_size


def run(argv=None):
    p = make_parser("hal2mafMP", "Multi-process wrapper for hal2maf")
    p.add_argument("halFile")
    p.add_argument("mafFile")
    p.add_argument("--numProc", type=int, default=1)
    p.add_argument("--sliceSize", type=int, default=None)
    p.add_argument("--splitBySequence", action="store_true")
    p.add_argument("--refGenome", default="")
    p.add_argument("--refTargets", default="")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--length", type=int, default=0)
    for opt in PASS_THROUGH:
        p.add_argument("--" + opt, default=None)
    for flag in PASS_FLAGS:
        p.add_argument("--" + flag, action="store_true")
    o = p.parse_args(argv)

    ref = o.refGenome or get_hal_root_name(o.halFile)
    extra = []
    for opt in PASS_THROUGH:
        v = getattr(o, opt)
        if v is not None:
            extra.append("--%s %s" % (opt, v))
    for flag in PASS_FLAGS:
        if getattr(o, flag):
            extra.append("--" + flag)
    extra = " ".join(extra)

    tmpdir = tempfile.mkdtemp(prefix="hal2mafMP_")
    cmds = []
    parts = []

    def add(i, args):
        out = os.path.join(tmpdir, "part_%05d.maf" % i)
        parts.append(out)
        cmds.append("%s -m hal_tpu.tools.hal2maf %s %s --refGenome %s --unique %s"
                    % (sys.executable, o.halFile, out, ref, args))

    if o.refTargets:
        # split BED lines across processes (hal2mafMP.py:102-124)
        lines = [l for l in open(o.refTargets) if l.strip() and not l.startswith("#")]
        chunk = max(len(lines) // max(o.numProc, 1), 1)
        for i in range(0, len(lines), chunk):
            bed = os.path.join(tmpdir, "targets_%05d.bed" % i)
            open(bed, "w").writelines(lines[i:i + chunk])
            add(i, "%s --refTargets %s" % (extra, bed))
    elif o.splitBySequence:
        for i, seq in enumerate(get_hal_sequences(o.halFile, ref)):
            add(i, "%s --refSequence %s" % (extra, seq))
    else:
        length = o.length or get_hal_genome_length(o.halFile, ref)
        slice_size = o.sliceSize or max(length // max(o.numProc, 1), 1)
        if o.refSequence is None and not o.sliceSize and o.numProc <= 1:
            add(0, extra)
        else:
            seqs = get_hal_sequences(o.halFile, ref)
            if len(seqs) != 1:
                # slice per sequence to keep --refSequence windows valid
                for i, seq in enumerate(seqs):
                    add(i, "%s --refSequence %s" % (extra, seq))
            else:
                i = 0
                for s, ln in compute_slices(length, slice_size):
                    add(i, "%s --refSequence %s --start %d --length %d"
                        % (extra, seqs[0], s, ln))
                    i += 1

    run_parallel_shell_commands(cmds, o.numProc)

    out = sys.stdout if o.mafFile in ("stdout", "-") else open(o.mafFile, "w")
    wrote_header = False
    for part in parts:
        if not os.path.exists(part):
            continue
        with open(part) as fh:
            for line in fh:
                if line.startswith("#"):
                    if not wrote_header:
                        out.write(line)
                    continue
                out.write(line)
        wrote_header = True
        os.unlink(part)
    if out is not sys.stdout:
        out.close()


def main(argv=None):
    return tool_main(run, argv)


if __name__ == "__main__":
    sys.exit(main())
