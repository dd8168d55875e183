"""syntenyRates — gene-pair synteny preservation rate between two genomes
(reference analysis/syntenyRates.py): for each pair of consecutive BED
entries on a query chromosome, lift both to the target and check that
relative order and orientation are preserved.

The reference shells out one halLiftover per BED line
(analysis/syntenyRates.py:59-66); here the liftover runs in-process.
"""

from __future__ import annotations

import io
import sys

from hal_tpu import open_alignment
from hal_tpu.tools import add_storage_options, make_parser, tool_main


def sort_bed_entries(stream):
    """Sort BED6 entries, discarding overlapping ones
    (analysis/syntenyRates.py:27-57)."""
    entries = [x.split() for x in stream.read().split("\n") if x != ""]
    if not entries:
        return []
    if len(entries[0]) < 6:
        raise RuntimeError("BED file must have strand information")
    entries.sort(key=lambda x: int(x[1]))
    entries.sort(key=lambda x: x[0])
    to_delete = []
    prev_valid_end = int(entries[0][2])
    for i, j in zip(entries, entries[1:]):
        if i[0] != j[0]:
            prev_valid_end = int(j[1])
            continue
        if int(i[2]) >= int(j[1]) or prev_valid_end > int(j[1]):
            sys.stderr.write("WARNING: discarding overlapping lines %s,\n%s\n"
                             % ("\t".join(i), "\t".join(j)))
            to_delete.append(i)
            to_delete.append(j)
        else:
            prev_valid_end = int(i[2])
    for d in to_delete:
        if d in entries:
            entries.remove(d)
    return entries


def lift_line(lifter, bed_line, merge_bed_lines):
    """Lift one BED entry; dict of target lines keyed by target sequence
    (analysis/syntenyRates.py:59-94)."""
    out = io.StringIO()
    lifter.convert(io.StringIO("\t".join(map(str, bed_line)) + "\n"), out)
    out_lines = [x.split() for x in out.getvalue().split("\n") if x != ""]
    result = {}
    if len(out_lines) > 1:
        chrs = set(x[0] for x in out_lines)
        for c in chrs:
            lines = [x for x in out_lines if x[0] == c]
            strands = set(x[5] for x in lines)
            if len(strands) != 1:
                print("POSSIBLYBAD: maps to two different strands on chr")
            elif merge_bed_lines:
                lo = min(int(x[1]) for x in lines)
                hi = max(int(x[2]) for x in lines)
                print("MERGED on chr %s -- distance %d" % (c, hi - lo))
                result[c] = [lines[0][0], lo, hi, lines[0][3], lines[0][4],
                             lines[0][5]]
    elif len(out_lines) == 0:
        print("INVALID: no map to target")
    else:
        result[out_lines[0][0]] = out_lines[0]
    return result


def compare_lines(i, i_lift, j, j_lift) -> bool:
    """True when the pair keeps order+orientation in the target
    (analysis/syntenyRates.py:96-132)."""
    for x in (i, i_lift, j, j_lift):
        x[1], x[2] = int(x[1]), int(x[2])
    assert i[0] == j[0] and i_lift[0] == j_lift[0] and i[1] <= j[1]
    if (i[5] == j[5]) != (i_lift[5] == j_lift[5]):
        print("BREAK: Relative orientations not equal in source v. target")
        return False
    if (j_lift[1] <= i_lift[2] <= j_lift[2] or
            j_lift[1] <= i_lift[1] <= j_lift[2] or
            (i_lift[1] <= j_lift[1] and i_lift[2] >= j_lift[2])):
        print("BREAK: Overlap detected")
        return False
    inverted = i[5] != i_lift[5]
    ordered = i_lift[1] > j_lift[1] if inverted else i_lift[1] < j_lift[1]
    if not ordered:
        print("BREAK: Order changed")
    return ordered


def run(argv=None):
    from hal_tpu.ops.liftover import Liftover

    p = make_parser("syntenyRates", "Gene-pair synteny rate between genomes")
    p.add_argument("halFile")
    p.add_argument("srcGenome")
    p.add_argument("bedFile")
    p.add_argument("destGenome")
    p.add_argument("--mergeBedLines", action="store_true", default=False)
    add_storage_options(p)
    o = p.parse_args(argv)

    aln = open_alignment(o.halFile)
    lifter = Liftover(aln, o.srcGenome, o.destGenome)
    with open(o.bedFile) as f:
        bed_lines = sort_bed_entries(f)

    num_valid = 0
    num_synt = 0
    for i, j in zip(bed_lines, bed_lines[1:]):
        if i[0] != j[0]:
            print("INVALID: on different query chr")
            continue
        i_dict = lift_line(lifter, i, o.mergeBedLines)
        j_dict = lift_line(lifter, j, o.mergeBedLines)
        chrs = [c for c in i_dict if c in j_dict]
        if len(chrs) > 1:
            print("INVALID: multiple possible target chrs")
            continue
        if len(chrs) == 0:
            print("INVALID: on different target chr")
            continue
        num_valid += 1
        if compare_lines(i, i_dict[chrs[0]], j, j_dict[chrs[0]]):
            num_synt += 1
        else:
            print("synteny break:")
            print(i)
            print(i_dict[chrs[0]])
            print(j)
            print(j_dict[chrs[0]])
    rate = float(num_synt) / num_valid if num_valid else 0.0
    print("gene pair synteny rate: %f, num syntenies: %d, num pairs: %d"
          % (rate, num_synt, num_valid))


def main(argv=None):
    return tool_main(run, argv)


if __name__ == "__main__":
    sys.exit(main())
