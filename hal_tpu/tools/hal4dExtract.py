"""hal4dExtract — four-fold degenerate codon sites from BED12 genes
(reference extract/impl/hal4dExtract.cpp, extract/inc/hal4dExtract.h:20-35)."""

from __future__ import annotations

import sys

import numpy as np

from hal_tpu import open_alignment
from hal_tpu import dna as dnacodec
from hal_tpu.io.bed import BedLine, read_bed
from hal_tpu.tools import HalError, add_storage_options, make_parser, out_stream, tool_main

# codon prefixes whose third position is 4-fold degenerate
# (standard genetic code: Leu CTN, Val GTN, Ser TCN, Pro CCN, Thr ACN,
#  Ala GCN, Arg CGN, Gly GGN)
FOURFOLD_PREFIXES = {"CT", "GT", "TC", "CC", "AC", "GC", "CG", "GG"}


def _is_4d_site(aln, genome_name, pos, conserved):
    """conserved mode: the codon prefix must be 4d in every leaf genome's
    aligned copy (reference --conserved)."""
    if not conserved:
        return True
    from hal_tpu.ops import segmap_host as sm

    g = aln.open_genome(genome_name)
    for leaf in aln.genome_names():
        if leaf == genome_name or not aln.tree.is_leaf(leaf):
            continue
        for k in (0, 1):
            frags = sm.map_source(aln, genome_name, np.array([pos + k]),
                                  np.array([pos + k + 1]), leaf, do_dupes=False)
            for i in range(len(frags)):
                lg = aln.open_genome(leaf)
                b = lg.get_dna_string(int(frags.tgt_lo[i]), 1,
                                      reversed_=bool(frags.rev[i])).upper()
                gb = g.get_dna_string(pos + k, 1).upper()
                if b != gb:
                    return False
    return True


def extract_4d(aln, genome_name, bed_lines, os_, conserved=False):
    g = aln.open_genome(genome_name)
    for bed in bed_lines:
        if bed.bed_type < 12 or not bed.blocks:
            raise HalError("hal4dExtract requires BED12 input with blocks")
        si = g.sequence_index(bed.chrom)
        base = int(g.seq_start[si])
        # concatenate exon bases in transcription order
        blocks = sorted(bed.blocks)
        coords = []
        for bs, bl in blocks:
            s = base + bed.start + bs
            coords.extend(range(s, s + bl))
        seq = "".join(g.get_dna_string(c, 1) for c in coords).upper()
        if bed.strand == "-":
            seq = dnacodec.reverse_complement(seq.encode()).tobytes().decode().upper()
            coords = coords[::-1]
        out_positions = []
        for c0 in range(0, len(seq) - 2, 3):
            prefix = seq[c0:c0 + 2]
            if prefix in FOURFOLD_PREFIXES:
                gpos = coords[c0 + 2]
                # codon-prefix genome positions for the conserved check
                p0 = min(coords[c0], coords[c0 + 1])
                if _is_4d_site(aln, genome_name, p0, conserved):
                    out_positions.append(gpos)
        for gp in sorted(out_positions):
            rel = gp - base
            line = BedLine(chrom=bed.chrom, start=rel, end=rel + 1, bed_type=min(bed.bed_type, 6),
                           name=bed.name, score=bed.score, strand=bed.strand)
            os_.write(line.write())


def run(argv=None):
    p = make_parser("hal4dExtract", "Extract Fourfold-Degenerate codon positions from BED12 genes")
    p.add_argument("halPath")
    p.add_argument("refGenome")
    p.add_argument("inBed")
    p.add_argument("outBed")
    p.add_argument("--append", action="store_true")
    p.add_argument("--conserved", action="store_true")
    add_storage_options(p)
    o = p.parse_args(argv)
    aln = open_alignment(o.halPath)
    stream = sys.stdin if o.inBed in ("stdin", "-") else open(o.inBed)
    if o.outBed in ("stdout", "-"):
        os_ = sys.stdout
    else:
        os_ = open(o.outBed, "a" if o.append else "w")
    extract_4d(aln, o.refGenome, read_bed(stream, 12), os_, o.conserved)


def main(argv=None):
    return tool_main(run, argv)


if __name__ == "__main__":
    sys.exit(main())
