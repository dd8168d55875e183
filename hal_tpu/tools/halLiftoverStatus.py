"""halLiftoverStatus — per-BED-entry report of how a region maps to a target
genome (reference liftover/halLiftoverStatus.py): mapped proportion,
insertions/deletions, out-of-order (rearrangement) flag and frame
preservation.

The reference runs one `halLiftover --outPSL` subprocess per BED line under
jobTree; here the liftover runs in-process and lines are processed
sequentially (the status math is identical:
liftover/halLiftoverStatus.py:196-470)."""

from __future__ import annotations

import io
import sys

from hal_tpu import open_alignment
from hal_tpu.tools import add_storage_options, make_parser, tool_main


class Psl:
    def __init__(self, line: str):
        t = line.rstrip("\n").split("\t")
        if len(t) != 21:
            raise ValueError("Psl format requires 21 fields: %r" % line)
        (self.matches, self.mis, self.rep, self.ncount, self.q_num_insert,
         self.q_base_insert, self.t_num_insert, self.t_base_insert) = map(int, t[:8])
        self.strand = t[8]
        self.q_name = t[9]
        self.q_size, self.q_start, self.q_end = map(int, t[10:13])
        self.t_name = t[13]
        self.t_size, self.t_start, self.t_end = map(int, t[14:17])
        self.block_count = int(t[17])
        self.block_sizes = [int(x) for x in t[18].rstrip(",").split(",")]
        self.q_starts = [int(x) for x in t[19].rstrip(",").split(",")]
        self.t_starts = [int(x) for x in t[20].rstrip(",").split(",")]

    def sort_key(self):
        return (self.q_name, self.q_start, self.q_end)


def psl_pos_target(psl: Psl) -> Psl:
    """Flip so the target is on the + strand (halLiftoverStatus.py:165-184)."""
    if len(psl.strand) != 2 or psl.strand[1] != "-":
        return psl
    rv = {"-": "+", "+": "-"}
    psl.strand = rv[psl.strand[0]] + rv[psl.strand[1]]
    sizes, qstarts, tstarts = [], [], []
    for i in range(psl.block_count - 1, -1, -1):
        size = psl.block_sizes[i]
        sizes.append(size)
        qstarts.append(psl.q_size - (psl.q_starts[i] + size))
        tstarts.append(psl.t_size - (psl.t_starts[i] + size))
    psl.block_sizes, psl.q_starts, psl.t_starts = sizes, qstarts, tstarts
    return psl


def psl_pos_coords(psl: Psl):
    """Query-positive coordinates (halLiftoverStatus.py:196-221)."""
    assert len(psl.strand) < 2 or psl.strand[1] != "-"
    strand = psl.strand
    if psl.strand[0] == "-":
        qstarts, tstarts, sizes = [], [], []
        for i in range(psl.block_count - 1, -1, -1):
            qstarts.append(psl.q_size - (psl.q_starts[i] + psl.block_sizes[i]))
            tstarts.append(psl.t_size - (psl.t_starts[i] + psl.block_sizes[i]))
            sizes.append(psl.block_sizes[i])
        strand = "+-"
    else:
        qstarts, tstarts, sizes = psl.q_starts, psl.t_starts, psl.block_sizes
    return qstarts, tstarts, sizes, strand


def query_overlap(p1: Psl, p2: Psl) -> int:
    if p1.q_name != p2.q_name or p1.q_end <= p2.q_start or p2.q_end <= p1.q_start:
        return 0
    s1, _t1, z1, _ = psl_pos_coords(p1)
    s2, _t2, z2, _ = psl_pos_coords(p2)
    overlap = 0
    for i1, a in enumerate(s1):
        e1 = a + z1[i1]
        for i2, b in enumerate(s2):
            e2 = b + z2[i2]
            if b < e1 and a < e2:
                overlap += min(e1, e2) - max(a, b)
    return overlap


def non_overlap_sets(psls: list[Psl]) -> list[list[int]]:
    """All maximal sets of PSLs whose query ranges are disjoint
    (halLiftoverStatus.py:244-287)."""
    def extend(sets):
        new_sets = []
        for indices, i in sets:
            added = 0
            for j in range(i + 1, len(psls)):
                if any(query_overlap(psls[j], psls[k]) > 0 for k in indices):
                    continue
                added += 1
                new_sets.extend(extend([(indices + [j], j)]))
            if added == 0:
                new_sets.append((indices, len(psls)))
        return new_sets

    sets: list[list[int]] = []
    for i in range(len(psls)):
        for s, _last in extend([([i], i)]):
            if not any(set(s).issubset(set(s0)) for s0 in sets):
                sets.append(s)
    return sets


def _tpos(qstarts, tstarts, sizes, qpos):
    for i, qs in enumerate(qstarts):
        if qs <= qpos <= qs + sizes[i]:
            return tstarts[i] + (qpos - qs)
    return -1


class _Reg:
    def __init__(self, name, start, end, strand, size, qstart, qend):
        self.name, self.start, self.end = name, start, end
        self.strand, self.size = strand, size
        self.qstart, self.qend = qstart, qend


def block_status(indices, psls, start, end, edge):
    """Status of one BED block (halLiftoverStatus.py:325-407)."""
    ins, dels = [], []
    oo = False
    tregs = []
    pos = start
    blocksize = end - start
    assert blocksize > 0
    for index in indices:
        qstarts, tstarts, sizes, strand = psl_pos_coords(psls[index])
        for i, qstart in enumerate(qstarts):
            qend = qstart + sizes[i]
            if qend < pos:
                continue
            if end < qstart:
                break
            oqs, oqe = max(pos, qstart), min(end, qend)
            ots = _tpos(qstarts, tstarts, sizes, oqs)
            ote = _tpos(qstarts, tstarts, sizes, oqe)
            if len(strand) > 1 and strand[1] == "-":
                ots, ote = psls[index].t_size - ote, psls[index].t_size - ots
            assert ote >= ots
            tregs.append(_Reg(psls[index].t_name, ots, ote,
                              strand[1] if len(strand) > 1 else "+",
                              psls[index].t_size, oqs, oqe))
            if float(oqs - start) / blocksize > edge:
                if oqs - pos > 0:
                    dels.append(oqs - pos)
            pos = oqe
    if float(end - pos) / blocksize > edge and pos < end:
        dels.append(end - pos)

    if len(tregs) > 1:
        for i in range(1, len(tregs)):
            treg, prev = tregs[i], tregs[i - 1]
            if (float(treg.qstart - start) / blocksize <= edge or
                    float(end - treg.qend) / blocksize <= edge):
                continue
            if treg.name == prev.name:
                if treg.strand == prev.strand:
                    if treg.strand == "+":
                        if prev.end < treg.start:
                            ins.append(treg.start - prev.end)
                        elif prev.end > treg.start:
                            oo = True
                    else:
                        if treg.end < prev.start:
                            ins.append(prev.start - treg.end)
                        elif treg.end > prev.start:
                            oo = True
                else:
                    oo = True
            else:
                oo = True

    strands = [r.strand for r in tregs]
    tstart = min([r.start for r in tregs]) if tregs else -1
    tend = max([r.end for r in tregs]) if tregs else -1
    tname = tregs[0].name if tregs else ""
    return ins, dels, oo, strands, tstart, tend, tname


class Status:
    def __init__(self, name):
        self.name = name
        self.length = -1
        self.map = 0
        self.ins = []
        self.dels = []
        self.oo = False
        self.inframe = True


def _parse_bed_line(line: str):
    """(name, start, blockStarts, blockSizes) with the reference's BED12
    normalization (halLiftoverStatus.py:87-139)."""
    t = line.split()
    chrom, start, end = t[0], int(t[1]), int(t[2])
    name = t[3] if len(t) > 3 else ""
    if len(t) >= 12:
        sizes = [int(x) for x in t[10].rstrip(",").split(",")]
        starts = [int(x) for x in t[11].rstrip(",").split(",")]
        if starts and (starts[0] != 0 or end != start + starts[-1] + sizes[-1]):
            off = starts[0]
            start += off
            starts = [s - off for s in starts]
            end = start + starts[-1] + sizes[-1]
    else:
        sizes = [end - start]
        starts = [0]
    return chrom, name, start, end, starts, sizes


def status_for_line(aln, src, tgt, line: str, edge: float) -> Status:
    from hal_tpu.ops.liftover import Liftover

    chrom, name, start, end, bstarts, bsizes = _parse_bed_line(line)
    status = Status(name)
    status.length = sum(bsizes)

    out = io.StringIO()
    Liftover(aln, src, tgt, out_psl=True).convert(io.StringIO(line + "\n"), out)
    psls = [psl_pos_target(Psl(l)) for l in out.getvalue().splitlines() if l.strip()]
    if not psls:
        return status
    psls.sort(key=Psl.sort_key)
    sets = non_overlap_sets(psls)
    if not sets:
        return status
    best, qcov = max(((s, sum(sum(psls[i].block_sizes) for i in s)) for s in sets),
                     key=lambda x: x[1])
    status.map = qcov

    currstrand, currtstart, currtend, currtname = "", -1, -1, ""
    for i, bs in enumerate(bstarts):
        qs = start + bs
        qe = qs + bsizes[i]
        b_ins, b_dels, b_oo, strands, ts, te, tn = block_status(
            best, psls, qs, qe, edge)
        status.ins.extend(b_ins)
        status.dels.extend(b_dels)
        if b_oo:
            status.oo = True
        elif strands:
            tstrand = strands[0]
            if currstrand:
                if currstrand != tstrand and not status.oo:
                    status.oo = True
                elif currtname and tn and tn != currtname and not status.oo:
                    status.oo = True
                elif ((tstrand == "+" and currtend > ts) or
                      (tstrand == "-" and currtstart < te)):
                    status.oo = True
            currstrand = tstrand
        if ts > -1 and te > -1:
            currtstart, currtend, currtname = ts, te, tn

    if status.oo or abs(sum(status.ins) - sum(status.dels)) % 3 > 0:
        status.inframe = False
    return status


def run(argv=None):
    p = make_parser("halLiftoverStatus",
                    "Report mapping status of each BED entry in a target genome")
    p.add_argument("bedFile")
    p.add_argument("halFile")
    p.add_argument("queryGenome")
    p.add_argument("targetGenome")
    p.add_argument("outFile")
    p.add_argument("--edge", type=float, default=0.0,
                   help="proportion of block at each edge allowed to have errors")
    add_storage_options(p)
    o = p.parse_args(argv)

    aln = open_alignment(o.halFile)
    out = sys.stdout if o.outFile in ("stdout", "-") else open(o.outFile, "w")
    out.write("#Name\tLength\tMap\tIns\tDels\tOO\tInframe\n")
    with open(o.bedFile) as f:
        for line in f:
            line = line.strip()
            if not line or line[0] == "#":
                continue
            st = status_for_line(aln, o.queryGenome, o.targetGenome, line, o.edge)
            ins = ",".join(str(x) for x in st.ins)
            dels = ",".join(str(x) for x in st.dels)
            if st.map > 0:
                out.write("%s\t%d\t%d\t%s\t%s\t%s\t%s\n" % (
                    st.name, st.length, st.map, ins, dels, st.oo, st.inframe))
            else:
                out.write("%s\t%d\t%d\t%s\t%s\tNA\tNA\n" % (
                    st.name, st.length, st.map, ins, dels))
    if out is not sys.stdout:
        out.close()


def main(argv=None):
    return tool_main(run, argv)


if __name__ == "__main__":
    sys.exit(main())
