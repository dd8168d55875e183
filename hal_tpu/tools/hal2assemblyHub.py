"""hal2assemblyHub — build a UCSC comparative assembly hub
(reference assemblyHub/hal2assemblyHub.py:12-36, a 3k-LoC Toil pipeline
with per-track job modules assemblyHub/*Track.py).

hal_tpu's version runs sequentially (no Toil dependency) and produces the
full hub artifact set: hub.txt / genomes.txt, per-genome directories with
chrom.sizes, FASTA (2bit when kent faToTwoBit exists), optional LOD
series, snake trackDb entries for every other genome, and the signal
tracks — GC percent, alignability (alignment depth), conservation
(phyloP), repeat-mask BED — computed natively from the columnar arrays
(hal_tpu.assemblyhub) instead of shelling to hgGcPercent etc.  BigWig /
bigBed conversion is attempted only when the kent binaries are present —
the same external-tool dependency posture as the reference."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

from hal_tpu import assemblyhub as ah
from hal_tpu.parallel.mp import get_hal_child_names, get_hal_genomes, get_hal_sequences
from hal_tpu.tools import HalError, make_parser, tool_main


def _sig_tracks(o, aln, g, gdir, chromsizes, trackdb, n_genomes):
    genome = aln.open_genome(g)
    if o.gcContent:
        wig = os.path.join(gdir, g + ".gc.wig")
        with open(wig, "w") as f:
            ah.gc_percent_wig(genome, f)
        big = ah.try_wig_to_bigwig(wig, chromsizes, os.path.join(gdir, g + ".gc.bw"))
        ah.trackdb_gc(trackdb, g, big)
    if o.alignability:
        wig = os.path.join(gdir, g + ".alignability.wig")
        with open(wig, "w") as f:
            subprocess.run([sys.executable, "-m", "hal_tpu.tools.halAlignmentDepth",
                            o.halFile, g], stdout=f, check=True)
        big = ah.try_wig_to_bigwig(wig, chromsizes,
                                   os.path.join(gdir, g + ".alignability.bw"))
        ah.trackdb_alignability(trackdb, g, n_genomes, big)
    if o.conservation:
        wig = os.path.join(gdir, g + ".conservation.wig")
        with open(wig, "w") as f:
            subprocess.run([sys.executable, "-m", "hal_tpu.tools.halPhyloP",
                            o.halFile, g, o.conservation], stdout=f, check=True)
        big = ah.try_wig_to_bigwig(wig, chromsizes,
                                   os.path.join(gdir, g + ".conservation.bw"))
        ah.trackdb_conservation(trackdb, g, big)
    if o.rmsk:
        bed = os.path.join(gdir, g + ".rmsk.bed")
        with open(bed, "w") as f:
            ah.masked_bed(genome, f)
        big = ah.try_bed_to_bigbed(bed, chromsizes, os.path.join(gdir, g + ".rmsk.bb"))
        ah.trackdb_rmsk(trackdb, g, big)


def _dir_tracks(o, g, gdir, chromsizes, trackdb):
    """--bedDirs/--wigDirs: each directory holds per-genome subdirs of
    annotation files (reference bedTrack.py/wigTrack.py layout)."""
    for spec, is_bed in ((o.bedDirs, True), (o.wigDirs, False)):
        for d in (spec.split(",") if spec else []):
            src = os.path.join(d, g)
            if not os.path.isdir(src):
                continue
            track = os.path.basename(os.path.normpath(d))
            for fn in sorted(os.listdir(src)):
                dst = os.path.join(gdir, fn)
                shutil.copyfile(os.path.join(src, fn), dst)
                if is_bed:
                    big = ah.try_bed_to_bigbed(dst, chromsizes, dst + ".bb")
                    ah.trackdb_bed(trackdb, "%s_%s" % (track, os.path.splitext(fn)[0]),
                                   fn + ".bb" if big else fn, big)
                else:
                    big = ah.try_wig_to_bigwig(dst, chromsizes, dst + ".bw")
                    ah.trackdb_wig(trackdb, "%s_%s" % (track, os.path.splitext(fn)[0]),
                                   fn + ".bw" if big else fn, big)


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
    p.add_argument("--gcContent", action="store_true",
                   help="GC-percent signal track (native; ref gcPercentTrack.py)")
    p.add_argument("--alignability", action="store_true",
                   help="alignment-depth signal track (ref alignabilityTrack.py)")
    p.add_argument("--conservation", default="",
                   help="phyloP model file -> conservation track (ref conservationTrack.py)")
    p.add_argument("--rmsk", action="store_true",
                   help="soft-mask BED track (ref rmskTrack.py)")
    p.add_argument("--bedDirs", default="",
                   help="comma list of dirs with per-genome BED subdirs (ref bedTrack.py)")
    p.add_argument("--wigDirs", default="",
                   help="comma list of dirs with per-genome wig subdirs (ref wigTrack.py)")
    o = p.parse_args(argv)

    os.makedirs(o.outDir, exist_ok=True)
    genomes = o.genomes.split(",") if o.genomes else get_hal_genomes(o.halFile)
    leaves = [g for g in genomes if not get_hal_child_names(o.halFile, g)]

    from hal_tpu.storage import open_alignment

    aln = open_alignment(o.halFile)

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
        chromsizes = os.path.join(gdir, "chrom.sizes")
        with open(chromsizes, "w") as fh:
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
            ah.note("faToTwoBit not found; leaving FASTA for %s" % g)
        first_chrom = (get_hal_sequences(o.halFile, g) or ["chr"])[0]
        glines.append("genome %s\ntrackDb %s/trackDb.txt\ntwoBitPath %s/%s\n"
                      "organism %s\ndescription %s\ndefaultPos %s:1-1000\n\n"
                      % (g, g, g, twobit or (g + ".fa"), g, g, first_chrom))
        # per-genome trackDb: snakes + signal + annotation dirs
        with open(os.path.join(gdir, "trackDb.txt"), "w") as fh:
            if not o.noSnakes:
                for other in genomes:
                    if other != g:
                        ah.trackdb_snake(fh, other, hal_rel)
            _sig_tracks(o, aln, g, gdir, chromsizes, fh, len(genomes))
            _dir_tracks(o, g, gdir, chromsizes, fh)
    with open(os.path.join(o.outDir, "genomes.txt"), "w") as fh:
        fh.writelines(glines)


def main(argv=None):
    return tool_main(run, argv)


if __name__ == "__main__":
    sys.exit(main())
