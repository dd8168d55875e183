"""Column engine: multiple-alignment columns relative to a reference window.

Re-designs the reference's ColumnIterator (api/impl/halColumnIterator.cpp,
832 LoC of recursive per-column tree spreading with an explicit stack) as a
*block-parallel* computation:

  1. for every genome in scope, map the whole reference window to it with
     the batched segment mapper (dupes follow paralogy rings coalescing
     anywhere under the scope root — equivalent to the recursive
     updateParent/updateChild/updateNextTopDup spreading),
  2. cut all fragments at the union of their reference-coordinate
     boundaries: between consecutive breakpoints every row advances
     contiguously, so each atomic slice is a run of identical columns,
  3. stream slices through a MafBlock builder that reproduces the
     reference's entry persistence/gap/break rules
     (maf/impl/halMafBlock.cpp: initBlock :294, appendColumn :370,
     canAppendColumn :401, printBlock :499).

Row order inside a column follows the reference's SequenceLess (genome
name, then sequence index — api/inc/halColumnIterator.h:45-50); dupe rows
within one sequence are ordered by forward target position (the reference's
order there is traversal-dependent; ours is the deterministic equivalent).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from hal_tpu.alignment import Alignment
from hal_tpu.ops import segmap_host as sm


@dataclass
class Row:
    """One aligned run within a slice (a future MAF 's' entry chunk)."""

    genome: str
    seq_idx: int
    tgt_lo: int
    tgt_hi: int
    rev: bool
    is_ref: bool = False


@dataclass
class Slice:
    """Atomic reference slice [lo, hi) with its aligned rows."""

    lo: int
    hi: int
    rows: list = field(default_factory=list)


def compute_scope(aln: Alignment, ref: str, targets=None, root: str | None = None):
    """Genomes participating in column construction + the scope root
    (reference getGenomesInSpanningTree usage, halColumnIterator.h:117)."""
    tree = aln.tree
    if root is not None:
        scope = set(tree.postorder(root))
        if ref not in scope:
            raise ValueError("reference genome %s not under root %s" % (ref, root))
    elif targets:
        scope = tree.spanning_tree(sorted(set(targets) | {ref}))
    else:
        scope = set(tree.names())
    scope_root = min(scope, key=lambda n: tree.depth(n))
    return scope, scope_root


def window_fragments(aln: Alignment, ref: str, gs: int, ge: int, scope, scope_root,
                     do_dupes: bool = True):
    """Per-genome fragments of the reference window (ref coords in src)."""
    out = {}
    for g in sorted(scope):
        frags = sm.map_source(aln, ref, np.array([gs]), np.array([ge]), g,
                              do_dupes=do_dupes,
                              coalescence_limit=scope_root)
        if len(frags):
            out[g] = frags
    return out


def iter_slices(aln: Alignment, ref: str, gs: int, ge: int,
                frags_by_genome: dict, no_ancestors: bool = False,
                unique_start: int | None = None):
    """Yield atomic Slices over [gs, ge).

    unique_start: when set (--unique), positions whose column's leftmost
    ref-genome coordinate is < unique_start are skipped (reference
    isCanonicalOnRef, halColumnIterator.cpp:208)."""
    tree = aln.tree
    # global breakpoint set in ref coords
    cuts = {gs, ge}
    for g, f in frags_by_genome.items():
        cuts.update(f.src_lo.tolist())
        cuts.update(f.src_hi.tolist())
    bounds = sorted(c for c in cuts if gs <= c <= ge)

    # canonical mask for --unique: per ref position, the leftmost ref-genome
    # position among its ref-genome rows
    ref_frags = frags_by_genome.get(ref)

    for a, b in zip(bounds, bounds[1:]):
        if b <= a:
            continue
        rows = []
        for g, f in frags_by_genome.items():
            if no_ancestors and not tree.is_leaf(g):
                continue
            gen = aln.open_genome(g)
            cover = (f.src_lo <= a) & (f.src_hi >= b)
            for i in np.flatnonzero(cover):
                rev = bool(f.rev[i])
                if rev:
                    t_hi = int(f.tgt_hi[i]) - (a - int(f.src_lo[i]))
                    t_lo = t_hi - (b - a)
                else:
                    t_lo = int(f.tgt_lo[i]) + (a - int(f.src_lo[i]))
                    t_hi = t_lo + (b - a)
                si = int(np.searchsorted(gen.seq_start, t_lo, side="right")) - 1
                is_ref = (g == ref) and not rev and t_lo == a
                rows.append(Row(g, si, t_lo, t_hi, rev, is_ref))
        if not any(r.is_ref for r in rows):
            # ensure the reference's own position is present even when the
            # ref genome mapping lost it (shouldn't happen; identity row)
            gen = aln.open_genome(ref)
            si = int(np.searchsorted(gen.seq_start, a, side="right")) - 1
            rows.append(Row(ref, si, a, b, False, True))
        if unique_start is not None and ref_frags is not None:
            # leftmost ref-genome position of the column at slice start
            ref_rows = [r for r in rows if r.genome == ref]
            leftmost = min((r.tgt_hi - 1) if r.rev else r.tgt_lo for r in ref_rows)
            if leftmost < unique_start:
                continue
        # deterministic row order: SequenceLess + forward position
        names = {g: g for g in frags_by_genome}
        rows.sort(key=lambda r: (not r.is_ref, r.genome, r.seq_idx, r.tgt_lo, r.rev))
        yield Slice(a, b, rows)
