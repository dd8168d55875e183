"""Alignment depth: per-position aligned-genome counts, fully vectorized.

Replaces the reference's per-column ColumnIterator loop
(alignmentDepth/halAlignmentDepth.cpp:216-281) with per-genome window
mapping + interval stabbing via diff/cumsum — no per-position work at all.
"""

from __future__ import annotations

import numpy as np

from hal_tpu.alignment import Alignment
from hal_tpu.ops import segmap_host as sm


def depth_counts(aln: Alignment, ref: str, gs: int, ge: int, scope, scope_root,
                 count_dupes: bool = False, no_ancestors: bool = False) -> np.ndarray:
    """Counts over the reference window [gs, ge) in genome coordinates.

    count = (unique genomes aligned | total aligned positions) - 1, matching
    the reference's `--count` (which removes the reference's own
    contribution, halAlignmentDepth.cpp:258-280).
    """
    n = ge - gs
    diff = np.zeros(n + 1, np.int64)
    tree = aln.tree
    for g in sorted(scope):
        if no_ancestors and not tree.is_leaf(g):
            continue
        frags = sm.map_source(aln, ref, np.array([gs]), np.array([ge]), g,
                              do_dupes=True, coalescence_limit=scope_root)
        if len(frags) == 0:
            continue
        if count_dupes:
            np.add.at(diff, frags.src_lo - gs, 1)
            np.add.at(diff, frags.src_hi - gs, -1)
        else:
            # unique-genome indicator: union of fragment src intervals
            iv = np.stack([frags.src_lo, frags.src_hi], axis=1)
            iv = iv[np.argsort(iv[:, 0])]
            cur_lo, cur_hi = None, None
            for lo, hi in iv:
                if cur_hi is None or lo > cur_hi:
                    if cur_hi is not None:
                        diff[cur_lo - gs] += 1
                        diff[cur_hi - gs] -= 1
                    cur_lo, cur_hi = lo, hi
                else:
                    cur_hi = max(cur_hi, hi)
            if cur_hi is not None:
                diff[cur_lo - gs] += 1
                diff[cur_hi - gs] -= 1
    counts = np.cumsum(diff[:-1])
    return counts - 1  # remove the reference's own contribution


def write_wiggle(out, seq_name: str, start: int, counts: np.ndarray, step: int = 1) -> None:
    """fixedStep wiggle emission (reference halAlignmentDepth.cpp:247-280)."""
    out.write("fixedStep chrom=%s start=%d step=%d\n" % (seq_name, start + 1, step))
    vals = counts[::step] if step > 1 else counts
    out.write("\n".join(str(int(v)) for v in vals))
    out.write("\n")
