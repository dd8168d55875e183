"""Native bigWig / bigBed writers — no kent binaries.

The reference's assemblyHub pipeline shells out to wigToBigWig /
bedToBigBed (reference assemblyHub/*Track.py; hal2assemblyHub.py requires
the kent userApps on PATH), so a hub build fails without UCSC's binaries.
hal_tpu writes the BBI container directly (format per the BigWig/BigBed
paper, Kent et al. 2010, and kent/src/inc/bbiFile.h):

    [common header][zoom headers][total summary][chrom B+ tree]
    [full data: u64 count + sections/items][full R-tree index]
    [per zoom level: u64 count + summary records + R-tree]

Layout choices (all spec-legal, favoring simplicity):
  * uncompressBufSize = 0 — sections stored uncompressed (readers branch
    on this field; kent tools accept it).
  * bigWig sections are bedGraph-typed (type 1) — the general encoding;
    fixedStep inputs are expressed as runs.
  * one zoom level, reduction chosen so ~<=10k records genome-wide
    (browsers use it for coarse views; finer views read full data).
  * chromIds are ranks in lexicographic chrom-name order, matching the
    B+ tree's key order; data blocks are written sorted by
    (chromId, start) as the R-tree requires.

tests/test_bbi.py decodes the emitted files with an independent
struct-level reader (the test_mmap_struct_decode pattern) and checks
values, summaries and R-tree bounds against the inputs.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

BIGWIG_MAGIC = 0x888FFC26
BIGBED_MAGIC = 0x8789F2EB
BPT_MAGIC = 0x78CA8C91
CIR_MAGIC = 0x2468ACE0
BBI_VERSION = 4
BLOCK_SIZE = 256        # B+ / R-tree fanout
ITEMS_PER_SLOT = 512    # data items per block
ZOOM_PER_SLOT = 512     # zoom records per indexed block


@dataclass
class _Block:
    """Bounds + extent of one written data block (R-tree leaf entry)."""

    start_chrom: int
    start: int
    end_chrom: int
    end: int
    offset: int
    size: int


def _chrom_ids(chrom_sizes: dict) -> dict:
    return {name: i for i, name in enumerate(sorted(chrom_sizes))}


# ------------------------------------------------------------- B+ tree

def _write_chrom_bpt(f, chrom_sizes: dict) -> None:
    names = sorted(chrom_sizes)
    key_size = max(len(n) for n in names) if names else 1
    f.write(struct.pack("<IIIIQQ", BPT_MAGIC, BLOCK_SIZE, key_size, 8,
                        len(names), 0))
    # single leaf holds all chroms (hub genomes have << BLOCK_SIZE seqs;
    # callers with more get a still-valid multi-entry leaf chain via the
    # same encoding as long as count fits u16)
    assert len(names) < (1 << 16), "chrom count exceeds single-leaf B+ tree"
    f.write(struct.pack("<BBH", 1, 0, len(names)))
    for i, n in enumerate(names):
        key = n.encode()
        f.write(key + b"\x00" * (key_size - len(key)))
        f.write(struct.pack("<II", i, int(chrom_sizes[n])))


# -------------------------------------------------------------- R-tree

def _span_bounds(blocks):
    s_cix = min(b.start_chrom for b in blocks)
    e_cix = max(b.end_chrom for b in blocks)
    s_base = min(b.start for b in blocks if b.start_chrom == s_cix)
    e_base = max(b.end for b in blocks if b.end_chrom == e_cix)
    return s_cix, s_base, e_cix, e_base


def _write_rtree(f, blocks: list, end_file_offset: int) -> None:
    n = len(blocks)
    if n:
        s_cix, s_base, e_cix, e_base = _span_bounds(blocks)
    else:
        s_cix = e_cix = s_base = e_base = 0
    # itemsPerSlot = 1: the tree's items ARE the blocks (kent bbiWrite.c
    # passes 1 to cirTreeFileCreate; readers treat it as informational)
    f.write(struct.pack("<IIQIIIIQII", CIR_MAGIC, BLOCK_SIZE, n, s_cix,
                        s_base, e_cix, e_base, end_file_offset, 1, 0))

    def write_level(level_blocks):
        """Write one tree level; returns per-group (bounds, node_offset)
        placeholders resolved bottom-up."""
        # leaves: groups of <= BLOCK_SIZE blocks
        groups = [level_blocks[i:i + BLOCK_SIZE]
                  for i in range(0, len(level_blocks), BLOCK_SIZE)] or [[]]
        if len(groups) == 1:
            g = groups[0]
            f.write(struct.pack("<BBH", 1, 0, len(g)))
            for b in g:
                f.write(struct.pack("<IIIIQQ", b.start_chrom, b.start,
                                    b.end_chrom, b.end, b.offset, b.size))
            return
        # two levels: internal root pointing at leaf nodes
        root_pos = f.tell()
        root_size = 4 + 24 * len(groups)
        f.write(b"\x00" * root_size)  # placeholder
        child_offsets = []
        for g in groups:
            child_offsets.append(f.tell())
            f.write(struct.pack("<BBH", 1, 0, len(g)))
            for b in g:
                f.write(struct.pack("<IIIIQQ", b.start_chrom, b.start,
                                    b.end_chrom, b.end, b.offset, b.size))
        end = f.tell()
        f.seek(root_pos)
        f.write(struct.pack("<BBH", 0, 0, len(groups)))
        for g, off in zip(groups, child_offsets):
            s_cix, s_base, e_cix, e_base = _span_bounds(g)
            f.write(struct.pack("<IIIIQ", s_cix, s_base, e_cix, e_base,
                                off))
        f.seek(end)

    write_level(blocks)


# ---------------------------------------------------------------- zoom

def _zoom_records(data_by_chrom, ids, reduction, chrom_sizes):
    """(chromId, start, end, valid, min, max, sum, sumsq) per window with
    any covered base, per chrom; window ends clip to the chrom length."""
    out = []
    for name in sorted(data_by_chrom):
        cid = ids[name]
        size = int(chrom_sizes[name])
        for w0, stats in sorted(_windows(data_by_chrom[name],
                                         reduction).items()):
            out.append((cid, w0 * reduction,
                        min((w0 + 1) * reduction, size)) + stats)
    return out


def _windows(runs, reduction):
    wins = {}
    for s, e, v in runs:
        w = s // reduction
        while w * reduction < e:
            lo = max(s, w * reduction)
            hi = min(e, (w + 1) * reduction)
            n = hi - lo
            c, mn, mx, sm, sq = wins.get(w, (0, np.inf, -np.inf, 0.0, 0.0))
            wins[w] = (c + n, min(mn, v), max(mx, v), sm + n * v,
                       sq + n * v * v)
            w += 1
    return wins


def _write_zoom(f, records):
    """Zoom data (u64 count + 32-byte summary records) + its R-tree.
    Returns (data_offset, index_offset)."""
    data_offset = f.tell()
    f.write(struct.pack("<Q", len(records)))
    blocks = []
    for i in range(0, len(records), ZOOM_PER_SLOT):
        grp = records[i:i + ZOOM_PER_SLOT]
        off = f.tell()
        for r in grp:
            f.write(struct.pack("<IIIIffff", r[0], r[1], r[2], r[3],
                                r[4], r[5], r[6], r[7]))
        blocks.append(_Block(grp[0][0], grp[0][1], grp[-1][0],
                             max(r[2] for r in grp), off, f.tell() - off))
    index_offset = f.tell()
    _write_rtree(f, blocks, index_offset)
    return data_offset, index_offset


# ------------------------------------------------------------- summary

def _total_summary(data_by_chrom):
    c, mn, mx, sm, sq = 0, np.inf, -np.inf, 0.0, 0.0
    for runs in data_by_chrom.values():
        for s, e, v in runs:
            n = e - s
            c += n
            mn = min(mn, v)
            mx = max(mx, v)
            sm += n * v
            sq += n * v * v
    if c == 0:
        mn = mx = 0.0
    return c, mn, mx, sm, sq


def _pick_reduction(chrom_sizes):
    total = sum(int(v) for v in chrom_sizes.values()) or 1
    red = 1
    while total // red > 10000:
        red *= 4
    return max(red, 16)


# ------------------------------------------------------------- bigWig

def write_bigwig(path: str, chrom_sizes: dict, data_by_chrom: dict) -> None:
    """data_by_chrom: chrom -> iterable of (start, end, value) runs
    (0-based half-open, non-overlapping, sorted)."""
    ids = _chrom_ids(chrom_sizes)
    data_by_chrom = {c: [(int(s), int(e), float(v))
                         for s, e, v in runs if e > s]
                     for c, runs in data_by_chrom.items()}
    for c, runs in data_by_chrom.items():
        runs.sort()
        for (s0, e0, _v0), (s1, _e1, _v1) in zip(runs, runs[1:]):
            if s1 < e0:
                # overlaps would corrupt the R-tree bounds and the
                # summaries; kent's wigToBigWig rejects them the same way
                raise ValueError(
                    "overlapping wiggle runs on %s at %d < %d" % (c, s1, e0))
    reduction = _pick_reduction(chrom_sizes)
    with open(path, "wb") as f:
        f.write(b"\x00" * (64 + 24))     # header + 1 zoom header
        summary_offset = f.tell()
        f.write(b"\x00" * 40)
        chrom_tree_offset = f.tell()
        _write_chrom_bpt(f, chrom_sizes)
        # full data: u64 section count, then bedGraph sections
        full_data_offset = f.tell()
        sections = []
        for name in sorted(data_by_chrom):
            runs = data_by_chrom[name]
            for i in range(0, len(runs), ITEMS_PER_SLOT):
                sections.append((ids[name], runs[i:i + ITEMS_PER_SLOT]))
        f.write(struct.pack("<Q", len(sections)))
        blocks = []
        for cid, runs in sections:
            off = f.tell()
            f.write(struct.pack("<IIIIIBBH", cid, runs[0][0], runs[-1][1],
                                0, 0, 1, 0, len(runs)))  # type 1 bedGraph
            for s, e, v in runs:
                f.write(struct.pack("<IIf", s, e, v))
            blocks.append(_Block(cid, runs[0][0], cid, runs[-1][1], off,
                                 f.tell() - off))
        full_index_offset = f.tell()
        _write_rtree(f, blocks, full_index_offset)
        zd, zi = _write_zoom(f, _zoom_records(data_by_chrom, ids, reduction,
                                        chrom_sizes))
        # rewrite header + zoom header + summary
        f.seek(0)
        f.write(struct.pack("<IHHQQQHHQQIQ", BIGWIG_MAGIC, BBI_VERSION, 1,
                            chrom_tree_offset, full_data_offset,
                            full_index_offset, 0, 0, 0, summary_offset,
                            0, 0))
        f.write(struct.pack("<IIQQ", reduction, 0, zd, zi))
        f.seek(summary_offset)
        c, mn, mx, sm, sq = _total_summary(data_by_chrom)
        f.write(struct.pack("<Qdddd", c, mn, mx, sm, sq))


# ------------------------------------------------------------- bigBed

def write_bigbed(path: str, chrom_sizes: dict, beds: list,
                 field_count: int = 3) -> None:
    """beds: (chrom, start, end[, rest-string]) tuples; rest joins the
    extra bed columns tab-separated (stored null-terminated per spec)."""
    ids = _chrom_ids(chrom_sizes)
    items = []
    for b in beds:
        chrom, s, e = b[0], int(b[1]), int(b[2])
        rest = b[3] if len(b) > 3 else ""
        items.append((ids[chrom], s, e, rest))
    items.sort(key=lambda t: (t[0], t[1], t[2]))
    # zoom over coverage (value = 1 per covered base); overlapping
    # features are routine in BED, so take the interval UNION — kent's
    # bedToBigBed summarizes union coverage, and validCount must never
    # exceed the chrom/window span
    cov = {}
    inv = {v: k for k, v in ids.items()}
    for cid, s, e, _ in items:
        cov.setdefault(inv[cid], []).append((s, e))
    for c, ivs in cov.items():
        merged = []
        for s, e in sorted(ivs):
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        cov[c] = [(s, e, 1.0) for s, e in merged]
    reduction = _pick_reduction(chrom_sizes)
    with open(path, "wb") as f:
        f.write(b"\x00" * (64 + 24))
        summary_offset = f.tell()
        f.write(b"\x00" * 40)
        chrom_tree_offset = f.tell()
        _write_chrom_bpt(f, chrom_sizes)
        full_data_offset = f.tell()
        f.write(struct.pack("<Q", len(items)))
        blocks = []
        i = 0
        while i < len(items):
            j = i
            cid = items[i][0]
            while (j < len(items) and items[j][0] == cid
                   and j - i < ITEMS_PER_SLOT):
                j += 1
            grp = items[i:j]
            off = f.tell()
            for _, s, e, rest in grp:
                f.write(struct.pack("<III", cid, s, e))
                f.write(rest.encode() + b"\x00")
            blocks.append(_Block(cid, grp[0][1], cid,
                                 max(g[2] for g in grp), off,
                                 f.tell() - off))
            i = j
        full_index_offset = f.tell()
        _write_rtree(f, blocks, full_index_offset)
        zd, zi = _write_zoom(f, _zoom_records(cov, ids, reduction, chrom_sizes))
        f.seek(0)
        f.write(struct.pack("<IHHQQQHHQQIQ", BIGBED_MAGIC, BBI_VERSION, 1,
                            chrom_tree_offset, full_data_offset,
                            full_index_offset, field_count,
                            min(field_count, 12), 0, summary_offset, 0, 0))
        f.write(struct.pack("<IIQQ", reduction, 0, zd, zi))
        f.seek(summary_offset)
        c, mn, mx, sm, sq = _total_summary(cov)
        f.write(struct.pack("<Qdddd", c, mn, mx, sm, sq))


# ------------------------------------------------- wiggle-file frontend

def wig_to_bigwig(wig_path: str, chrom_sizes: dict, bw_path: str) -> None:
    """Parse fixedStep/variableStep/bedGraph wiggle text and write the
    bigWig (the wigToBigWig command-line contract)."""
    data: dict = {}
    chrom, span, step, pos, mode = None, 1, 1, 0, None
    with open(wig_path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith(("#", "track", "browser")):
                continue
            if line.startswith("fixedStep"):
                kv = dict(p.split("=", 1) for p in line.split()[1:])
                chrom = kv["chrom"]
                pos = int(kv["start"]) - 1
                step = int(kv.get("step", 1))
                span = int(kv.get("span", 1))
                mode = "fixed"
                continue
            if line.startswith("variableStep"):
                kv = dict(p.split("=", 1) for p in line.split()[1:])
                chrom = kv["chrom"]
                span = int(kv.get("span", 1))
                mode = "var"
                continue
            parts = line.split()
            if mode == "fixed":
                data.setdefault(chrom, []).append(
                    (pos, pos + span, float(parts[0])))
                pos += step
            elif mode == "var":
                s = int(parts[0]) - 1
                data.setdefault(chrom, []).append(
                    (s, s + span, float(parts[1])))
            else:  # bedGraph line
                data.setdefault(parts[0], []).append(
                    (int(parts[1]), int(parts[2]), float(parts[3])))
    for runs in data.values():
        runs.sort()
    write_bigwig(bw_path, chrom_sizes, data)


def bed_to_bigbed(bed_path: str, chrom_sizes: dict, bb_path: str) -> None:
    beds = []
    field_count = 3
    with open(bed_path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith(("#", "track", "browser")):
                continue
            p = line.split("\t") if "\t" in line else line.split()
            field_count = max(field_count, len(p))
            beds.append((p[0], int(p[1]), int(p[2]), "\t".join(p[3:])))
    write_bigbed(bb_path, chrom_sizes, beds, field_count=field_count)
