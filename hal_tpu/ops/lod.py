"""Levels of detail: generate a coarser alignment for browser-scale queries.

Re-design of the reference's LodExtract/LodGraph/LodBlock
(lod/impl/halLod*.cpp, ~2.3k LoC of sampled-column graph building) on top
of the gapped-run machinery: per branch, matched top segments are chained
into runs that absorb indels < scale (the same coarsening the reference
achieves by sampling probe columns every `scale` bases), runs shorter than
the scale are dropped, child/parent lengths are equalized by trimming to
the shorter side (LOD alignments are approximate by design), and the
result is rebuilt into a fully valid alignment (fillers, canonical links,
no paralogy — LOD output is ortholog-only here, a documented
simplification).  DNA is omitted unless keep_sequences (reference
--keepSequences; Genome::setDimensions(storeDNAArrays=false),
api/inc/halGenome.h:53-57).
"""

from __future__ import annotations

import numpy as np

from hal_tpu.alignment import Alignment
from hal_tpu.constants import NULL_INDEX
from hal_tpu.genome import GenomeArrays, SequenceInfo
from hal_tpu.ops.rearrangement import analyze_branch


def _branch_runs(aln, child: str, scale: int):
    """(child_lo, child_hi, parent_lo, parent_hi, rev) runs with indels
    below `scale` absorbed; runs shorter than scale dropped; lengths
    equalized by trimming."""
    g = aln.open_genome(child)
    parent = aln.tree.parent(child)
    pg = aln.open_genome(parent)
    slot = aln.tree.child_index(parent, child)

    t_idx = np.flatnonzero(g.top_parent != NULL_INDEX)
    out = []
    if len(t_idx) == 0:
        return out
    p_idx = g.top_parent[t_idx]
    rev = g.top_parent_reversed[t_idx].astype(bool)
    canon = pg.bot_child[p_idx, slot] == t_idx
    t_seq = g.seq_index_at(g.top_start[t_idx])
    p_seq = pg.seq_index_at(pg.bot_start[p_idx])

    # keep canonical matches only (no paralogy in LOD output)
    keep = canon
    t_idx, p_idx, rev = t_idx[keep], p_idx[keep], rev[keep]
    t_seq, p_seq = t_seq[keep], p_seq[keep]
    n = len(t_idx)
    if n == 0:
        return out
    same = (t_seq[:-1] == t_seq[1:]) & (p_seq[:-1] == p_seq[1:]) & (rev[:-1] == rev[1:])
    child_gap = (g.top_start[t_idx[1:]] - g.top_start[t_idx[:-1] + 1]).astype(np.int64)
    plo = np.where(rev[:-1], p_idx[1:], p_idx[:-1]) + 1
    phi = np.where(rev[:-1], p_idx[:-1], p_idx[1:])
    par_gap = np.where(phi >= plo,
                       pg.bot_start[np.minimum(phi, pg.num_bottom_segments)] -
                       pg.bot_start[np.minimum(plo, pg.num_bottom_segments)], -1)
    ordered = np.where(rev[:-1], p_idx[1:] <= p_idx[:-1], p_idx[1:] >= p_idx[:-1])
    chain = same & ordered & (child_gap >= 0) & (child_gap < scale) & \
        (par_gap >= 0) & (par_gap < scale)

    starts = np.concatenate([[True], ~chain])
    run_id = np.cumsum(starts) - 1
    first = np.flatnonzero(starts)
    last = np.append(first[1:] - 1, n - 1)
    for a, b in zip(first, last):
        c_lo = int(g.top_start[t_idx[a]])
        c_hi = int(g.top_start[t_idx[b] + 1])
        pmin = int(min(pg.bot_start[p_idx[a]], pg.bot_start[p_idx[b]]))
        pmax = int(max(pg.bot_start[p_idx[a] + 1], pg.bot_start[p_idx[b] + 1]))
        ln = min(c_hi - c_lo, pmax - pmin)
        if ln < scale:
            continue
        r = bool(rev[a])
        # trim to equal lengths, anchored to preserve the run's leading edge
        c_hi = c_lo + ln
        if r:
            pmin = pmax - ln
        else:
            pmax = pmin + ln
        out.append((c_lo, c_hi, pmin, pmax, r))
    return out


def extract_lod(aln: Alignment, scale: int, root: str | None = None,
                keep_sequences: bool = False) -> Alignment:
    root = root or aln.root_name
    names = list(aln.tree.preorder(root))
    out = Alignment()
    from hal_tpu.tree import Tree

    t = Tree()
    t.add_root(root)
    for n in names:
        for c in aln.tree.children(n):
            t.add_child(n, c, aln.tree.branch_length(c))
    out.tree = t
    out.metadata = dict(aln.metadata)
    out.metadata["lodScale"] = str(scale)

    runs_by_child = {c: _branch_runs(aln, c, scale) for c in names if c != root}

    # bottom cut sets first (union of children's parent-side run bounds) so
    # each child can refine its top cuts against its parent's bottom grid
    bot_cuts_by_genome = {}
    for name in names:
        cuts = set()
        for c in t.children(name):
            for (_cl, _ch, pl, ph, _r) in runs_by_child[c]:
                cuts.add(pl)
                cuts.add(ph)
        bot_cuts_by_genome[name] = cuts

    for name in names:
        src = aln.open_genome(name)
        children = t.children(name)
        bot_cuts = bot_cuts_by_genome[name]
        # top breakpoints: own run bounds + projections of the parent's
        # bottom cuts falling inside each run (keeps links 1:1)
        my_runs = runs_by_child.get(name, [])
        top_cuts = set()
        parent_name = t.parent(name)
        parent_cuts = sorted(bot_cuts_by_genome.get(parent_name, set()))
        for (cl, ch, pl, ph, r) in my_runs:
            top_cuts.add(cl)
            top_cuts.add(ch)
            for pc in parent_cuts:
                if pl < pc < ph:
                    top_cuts.add(cl + (ph - pc) if r else cl + (pc - pl))
        seq_bounds = src.seq_start.tolist()

        def tiles_from(cuts):
            cuts = sorted(set(cuts) | set(seq_bounds))
            return [(a, b) for a, b in zip(cuts, cuts[1:]) if b > a]

        bot_tiles = tiles_from(bot_cuts) if children else []
        top_tiles = tiles_from(top_cuts) if name != root else []

        n_seq = src.num_sequences
        infos = []
        bt = np.array([x[0] for x in bot_tiles], np.int64)
        tt = np.array([x[0] for x in top_tiles], np.int64)
        for si in range(n_seq):
            lo, hi = int(src.seq_start[si]), int(src.seq_start[si + 1])
            infos.append(SequenceInfo(
                src.seq_names[si], hi - lo,
                int(((tt >= lo) & (tt < hi)).sum()) if len(tt) else 0,
                int(((bt >= lo) & (bt < hi)).sum()) if len(bt) else 0))
        g = GenomeArrays.create(name, infos, num_children=len(children),
                                store_dna=keep_sequences)
        for i, (a, b) in enumerate(top_tiles):
            g.top_start[i] = a
        for i, (a, b) in enumerate(bot_tiles):
            g.bot_start[i] = a
        if keep_sequences and src.has_dna and src.length:
            g.dna = np.array(src.dna, copy=True)
        g.metadata = dict(src.metadata)
        out._genomes[name] = g

    # ---- links -------------------------------------------------------
    for name in names:
        if name == root:
            continue
        parent = t.parent(name)
        g = out._genomes[name]
        pg = out._genomes[parent]
        slot = t.child_index(parent, name)
        for (cl, ch, pl, ph, r) in runs_by_child[name]:
            # the run may have been refined by sibling cuts on the parent
            # side: split into pieces per parent tile
            p0 = int(np.searchsorted(pg.bot_start, pl, side="right")) - 1
            p1 = int(np.searchsorted(pg.bot_start, ph - 1, side="right")) - 1
            for pi in range(p0, p1 + 1):
                blo = max(pl, int(pg.bot_start[pi]))
                bhi = min(ph, int(pg.bot_start[pi + 1]))
                if r:
                    tlo = cl + (ph - bhi)
                else:
                    tlo = cl + (blo - pl)
                ti = int(np.searchsorted(g.top_start, tlo, side="right")) - 1
                # refine child tops at these positions too
                g_ok = (int(g.top_start[ti]) == tlo and
                        int(g.top_start[ti + 1]) == tlo + (bhi - blo))
                if not g_ok:
                    continue  # piece boundary not representable; drop link
                bp_ok = (int(pg.bot_start[pi]) == blo and
                         int(pg.bot_start[pi + 1]) == bhi)
                if not bp_ok:
                    continue
                g.top_parent[ti] = pi
                g.top_parent_reversed[ti] = 1 if r else 0
                pg.bot_child[pi, slot] = ti
                pg.bot_child_reversed[pi, slot] = 1 if r else 0

    # ---- parse links by position ------------------------------------
    for name in names:
        g = out._genomes[name]
        if g.num_top_segments and g.num_bottom_segments:
            g.top_bottom_parse = np.searchsorted(
                g.bot_start, g.top_start[:-1], side="right").astype(np.int64) - 1
            g.bot_top_parse = np.searchsorted(
                g.top_start, g.bot_start[:-1], side="right").astype(np.int64) - 1
    return out
