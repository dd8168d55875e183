"""halPhyloP — per-base phyloP constraint scores
(reference phyloP/impl/halPhyloP.cpp; requires the external `phast`
library, gated behind ENABLE_PHYLOP in the reference build).

hal_tpu gates the same way: the column extraction runs natively (MSAs per
window come from the column engine), but the phyloP likelihood-ratio
scoring calls phast's `phyloP` binary.  When phast is not installed this
tool reports the same capability error the reference build emits without
ENABLE_PHYLOP."""

from __future__ import annotations

import shutil
import subprocess
import sys
import tempfile

from hal_tpu import open_alignment
from hal_tpu.tools import HalError, add_storage_options, make_parser, tool_main


def phast_available() -> bool:
    return shutil.which("phyloP") is not None


def run(argv=None):
    p = make_parser("halPhyloP", "Make PhyloP wiggle of conservation scores for a genome")
    p.add_argument("halPath")
    p.add_argument("refGenome")
    p.add_argument("modFile", help="phast model file (.mod)")
    p.add_argument("wigFile", help="output wiggle (or stdout)")
    p.add_argument("--refSequence", default="")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--length", type=int, default=0)
    p.add_argument("--dupType", choices=["all", "ambiguous"], default="ambiguous")
    p.add_argument("--dupMask", choices=["soft", "hard"], default="soft")
    p.add_argument("--step", type=int, default=1)
    p.add_argument("--subtree", default="")
    p.add_argument("--prec", type=int, default=3)
    add_storage_options(p)
    o = p.parse_args(argv)

    if not phast_available():
        raise HalError(
            "halPhyloP requires the phast package (phyloP binary not found on "
            "PATH).  The reference builds this tool only with ENABLE_PHYLOP=1 "
            "and phast+CLAPACK installed (README.md:138-163); install phast "
            "and re-run.")

    # phast is present: export windows as MAF and drive phast's phyloP
    aln = open_alignment(o.halPath)
    from hal_tpu.io.maf_io import MafBlockBuilder
    from hal_tpu.ops.column import compute_scope, iter_slices, window_fragments

    g = aln.open_genome(o.refGenome)
    scope, root = compute_scope(aln, o.refGenome)
    out = sys.stdout if o.wigFile in ("stdout", "-") else open(o.wigFile, "w")
    with tempfile.NamedTemporaryFile("w", suffix=".maf", delete=False) as tmp:
        builder = MafBlockBuilder(aln, o.refGenome, ucsc_names=False)
        if o.refSequence:
            si = g.sequence_index(o.refSequence)
            gs = int(g.seq_start[si]) + o.start
            ge = gs + (o.length or (g.seq_length(si) - o.start))
        else:
            gs, ge = 0, g.length
        frags = window_fragments(aln, o.refGenome, gs, ge, scope, root)
        for block in builder.feed(iter_slices(aln, o.refGenome, gs, ge, frags)):
            tmp.write(block + "\n")
        maf_path = tmp.name
    cmd = ["phyloP", "--method", "LRT", "--mode", "CONACC", "--wig-scores",
           "--msa-format", "MAF", o.modFile, maf_path]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise HalError("phast phyloP failed: " + proc.stderr)
    out.write(proc.stdout)


def main(argv=None):
    return tool_main(run, argv)


if __name__ == "__main__":
    sys.exit(main())
