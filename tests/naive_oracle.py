"""Per-base homology oracle: an independent, deliberately naive
implementation of segment mapping used to cross-check the vectorized
mapper.  Follows the reference traversal semantics position by position
(api/impl/halSegmentMapper.cpp) with Python loops over single bases."""

from __future__ import annotations

import numpy as np

NULL = -1


def _top_seg_at(g, p):
    return int(np.searchsorted(g.top_start, p, side="right") - 1)


def _bot_seg_at(g, p):
    return int(np.searchsorted(g.bot_start, p, side="right") - 1)


def _up_base(g, pg, p):
    """One base up: (pos in parent, flipped?) or None if unaligned."""
    i = _top_seg_at(g, p)
    par = int(g.top_parent[i])
    if par == NULL:
        return None
    ts, te = int(g.top_start[i]), int(g.top_start[i + 1])
    bs = int(pg.bot_start[par])
    if g.top_parent_reversed[i]:
        return bs + (te - 1 - p), True
    return bs + (p - ts), False


def _down_base(g, cg, slot, p):
    j = _bot_seg_at(g, p)
    c = int(g.bot_child[j, slot])
    if c == NULL:
        return None
    bs, be = int(g.bot_start[j]), int(g.bot_start[j + 1])
    ts = int(cg.top_start[c])
    if g.bot_child_reversed[j, slot]:
        return ts + (be - 1 - p), True
    return ts + (p - bs), False


def _ring_members(g, p):
    """All paralogy-ring positions homologous to top position p (incl. p)."""
    i = _top_seg_at(g, p)
    ts, te = int(g.top_start[i]), int(g.top_start[i + 1])
    o = p - ts
    out = [(p, False)]
    orig_rev = bool(g.top_parent_reversed[i])
    cur = int(g.top_paralogy[i])
    while cur != NULL and cur != i:
        cts, cte = int(g.top_start[cur]), int(g.top_start[cur + 1])
        flip = bool(g.top_parent_reversed[cur]) != orig_rev
        if flip:
            out.append((cte - 1 - o, True))
        else:
            out.append((cts + o, False))
        cur = int(g.top_paralogy[cur])
    return out


def _down_positions(aln, positions, cur, tgt, do_dupes):
    """Map a set of (pos, rev) from genome `cur` down to descendant `tgt`."""
    tree = aln.tree
    if cur == tgt:
        return set(positions)
    for nxt_name in tree.path(cur, tgt)[1:]:
        g = aln.open_genome(cur)
        cg = aln.open_genome(nxt_name)
        slot = tree.child_index(cur, nxt_name)
        nxt = set()
        for pos, rev in positions:
            r = _down_base(g, cg, slot, pos)
            if r is None:
                continue
            base = (r[0], rev ^ r[1])
            if do_dupes:
                for rp, rf in _ring_members(cg, base[0]):
                    nxt.add((rp, base[1] ^ rf))
            else:
                nxt.add(base)
        positions = nxt
        cur = nxt_name
    return positions


def naive_map_base(aln, src_genome, p, tgt_genome, do_dupes=True,
                   coalescence_limit=None):
    """Map one source base to the target genome.

    Returns a set of (target_pos, reversed) pairs; reversed means the target
    runs opposite to the source.  coalescence_limit (an ancestor of the
    mrca) enables paralogy discovery above the mrca, mirroring
    mapRecursiveParalogies (halSegmentMapper.cpp:525).
    """
    tree = aln.tree
    mrca = tree.lca(src_genome, tgt_genome)
    limit = coalescence_limit or mrca

    # up phase
    positions = {(p, False)}
    cur = src_genome
    while cur != mrca:
        g = aln.open_genome(cur)
        parent = tree.parent(cur)
        pg = aln.open_genome(parent)
        nxt = set()
        for pos, rev in positions:
            r = _up_base(g, pg, pos)
            if r is not None:
                nxt.add((r[0], rev ^ r[1]))
        positions = nxt
        cur = parent

    # paralogies above the mrca
    if do_dupes and limit != mrca:
        results = set(positions)
        cur_positions = positions
        cur_g = mrca
        while cur_g != limit:
            g = aln.open_genome(cur_g)
            paralogs = set()
            for pos, rev in cur_positions:
                if g.num_top_segments:
                    for rp, rf in _ring_members(g, pos):
                        paralogs.add((rp, rev ^ rf))
            results |= _down_positions(aln, paralogs, cur_g, mrca, False)
            parent = tree.parent(cur_g)
            if parent is None or parent == limit:
                break
            pg = aln.open_genome(parent)
            nxt = set()
            for pos, rev in cur_positions:
                r = _up_base(g, pg, pos)
                if r is not None:
                    nxt.add((r[0], rev ^ r[1]))
            cur_positions = nxt
            cur_g = parent
        positions = results

    # down phase
    positions = _down_positions(aln, positions, mrca, tgt_genome, do_dupes)
    return positions


def naive_map_interval(aln, src_genome, lo, hi, tgt_genome, do_dupes=True):
    """Set of (src_pos, tgt_pos, reversed) triples for a source interval."""
    out = set()
    for p in range(lo, hi):
        for tp, rev in naive_map_base(aln, src_genome, p, tgt_genome, do_dupes):
            out.add((p, tp, rev))
    return out


def fragments_to_base_pairs(frags):
    """Expand mapper Fragments into the same triple set."""
    out = set()
    for i in range(len(frags)):
        sl, sh = int(frags.src_lo[i]), int(frags.src_hi[i])
        tl, th = int(frags.tgt_lo[i]), int(frags.tgt_hi[i])
        rev = bool(frags.rev[i])
        for k in range(sh - sl):
            tp = (th - 1 - k) if rev else (tl + k)
            out.add((sl + k, tp, rev))
    return out
