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
from hal_tpu.constants import NULL_INDEX
from hal_tpu.ops import segmap_host as sm


@dataclass(slots=True)
class Row:
    """One aligned run within a slice (a future MAF 's' entry chunk)."""

    genome: str
    seq_idx: int
    tgt_lo: int
    tgt_hi: int
    rev: bool
    is_ref: bool = False


def _row_key(r: Row):
    """SequenceLess (halColumnIterator.h:45-50); python sorts are stable so
    duplicate rows keep DFS insertion order."""
    return (r.genome, r.seq_idx)


@dataclass(slots=True)
class Slice:
    """Atomic reference slice [lo, hi) with its aligned rows.

    width: number of alignment columns.  Normally hi - lo; insertion
    slices (maxRefGap > 0) have lo == hi and width == inserted bases —
    the reference row shows '-' there (reference handleInsertion,
    halColumnIterator.cpp:382-440).
    sorted_rows: rows are already in SequenceLess order (builders skip the
    per-slice re-sort)."""

    lo: int
    hi: int
    rows: list = field(default_factory=list)
    width: int = -1
    sorted_rows: bool = False

    def __post_init__(self):
        if self.width < 0:
            self.width = self.hi - self.lo


@dataclass
class TreeNode:
    """Gene-tree node for --printTree (reference MafBlock::buildTreeR,
    maf/impl/halMafBlock.cpp:203-237): one node per segment visited by the
    root-down spread; label = entry name when a block row matches, else the
    genome name (ancestor without sequence output)."""

    genome: str
    pos: int        # genome coordinate of the column base
    rev: bool
    label: str = ""
    row_key: tuple | None = None   # (genome, seq_idx, fwd_pos, rev) of matched row
    children: list = field(default_factory=list)

    def newick(self) -> str:
        if self.children:
            return "(%s)%s" % (",".join(c.newick() for c in self.children),
                               self.label)
        return self.label

    def same_shape(self, other: "TreeNode") -> bool:
        """Topology+label equality (stTree_equals in canAppendColumn,
        halMafBlock.cpp:443-448); positions excluded — labels carry
        genome/sequence identity only."""
        if self.label != other.label or len(self.children) != len(other.children):
            return False
        return all(a.same_shape(b) for a, b in zip(self.children, other.children))


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


def _column_root(aln: Alignment, genome: str, pos: int):
    """Walk up from (genome, pos) to the column's root segment
    (reference MafBlock::buildTree up-walk, halMafBlock.cpp:258-281).
    Returns (root_genome_name, root_pos, rev)."""
    tree = aln.tree
    rev = False
    while True:
        g = aln.open_genome(genome)
        if g.num_top_segments == 0:
            return genome, pos, rev
        i = int(g.top_index_at(pos))
        pi = int(g.top_parent[i])
        if pi < 0:
            return genome, pos, rev
        parent = tree.parent(genome)
        pg = aln.open_genome(parent)
        off = pos - int(g.top_start[i])
        seg_len = int(g.top_start[i + 1] - g.top_start[i])
        prev = bool(g.top_parent_reversed[i])
        ppos = (int(pg.bot_start[pi]) + (seg_len - 1 - off) if prev
                else int(pg.bot_start[pi]) + off)
        genome, pos, rev = parent, ppos, rev ^ prev


def _tree_node(aln, genome, pos, rev) -> TreeNode:
    g = aln.open_genome(genome)
    si = int(np.searchsorted(g.seq_start, pos, side="right")) - 1
    fwd = pos  # single base; forward coordinate
    return TreeNode(genome=genome, pos=pos, rev=rev,
                    row_key=(genome, si, fwd, rev))


def _build_tree_down(aln, node: TreeNode) -> None:
    """Recursive down-spread mirroring MafBlock::buildTreeR
    (halMafBlock.cpp:203-237): canonical child + its paralogy-ring
    members, each recursed into."""
    tree = aln.tree
    g = aln.open_genome(node.genome)
    if g.num_bottom_segments == 0:
        return
    bi = int(g.bot_index_at(node.pos))
    off = node.pos - int(g.bot_start[bi])
    seg_len = int(g.bot_start[bi + 1] - g.bot_start[bi])
    for slot, child in enumerate(tree.children(node.genome)):
        j = int(g.bot_child[bi, slot])
        if j < 0:
            continue
        cg = aln.open_genome(child)
        crev = bool(g.bot_child_reversed[bi, slot])
        cpos = (int(cg.top_start[j]) + (seg_len - 1 - off) if crev
                else int(cg.top_start[j]) + off)
        cn = _tree_node(aln, child, cpos, node.rev ^ crev)
        node.children.append(cn)
        _build_tree_down(aln, cn)
        # paralogy ring of the canonical child segment
        if cg.top_paralogy.shape[0] and int(cg.top_paralogy[j]) >= 0:
            coff = cpos - int(cg.top_start[j])
            m = int(cg.top_paralogy[j])
            while m != j and m >= 0:
                mlen = int(cg.top_start[m + 1] - cg.top_start[m])
                flip = bool(cg.top_parent_reversed[m]) != bool(cg.top_parent_reversed[j])
                mpos = (int(cg.top_start[m]) + (mlen - 1 - coff) if flip
                        else int(cg.top_start[m]) + coff)
                mn = _tree_node(aln, child, mpos, cn.rev ^ flip)
                node.children.append(mn)
                _build_tree_down(aln, mn)
                m = int(cg.top_paralogy[m])


def build_gene_tree(aln: Alignment, ref: str, pos: int) -> TreeNode:
    """Per-column gene tree rooted at the column's root segment
    (reference MafBlock::buildTree, halMafBlock.cpp:239-293).  Node
    row_keys identify the slice row (genome, seq_idx, fwd position, rev)
    so the MAF builder can label nodes with entry names and print s-lines
    in tree post-order."""
    genome, rpos, rev = _column_root(aln, ref, pos)
    root = _tree_node(aln, genome, rpos, rev)
    _build_tree_down(aln, root)
    return root


# ------------------------------------------------------------- exact DFS
#
# Byte-exact MAF output needs the reference ColumnIterator's *insertion
# order* of duplicate rows within a sequence (the MafBlock multimap keeps
# per-sequence entries in insertion order, halMafBlock.cpp:294-368).  The
# recursion below mirrors recursiveUpdate/updateParent/updateChild/
# updateNextTopDup/updateParseUp/updateParseDown
# (api/impl/halColumnIterator.cpp:246-356, 557-745) exactly, hoisted from
# per-column to per-run: within a run no visited segment boundary is
# crossed, so the DFS shape — and therefore row order — is constant.

class _GT:
    """Per-genome tables as plain Python lists: the DFS reads scalar fields
    tens of times per run; list indexing (~40 ns) beats numpy scalar access
    (~250 ns per int(arr[i])) ~6x, which is the difference between the
    exact column path streaming at mammal density or not.  Memory is
    ~300 B/segment transient per genome — bounded by the scope, freed with
    the DFS object."""

    __slots__ = ("top_start", "top_parent", "top_rev", "top_para",
                 "bot_start", "bot_child", "bot_crev", "bot_tparse",
                 "top_bparse", "seq_start", "n_top", "n_bot", "single_seq",
                 "children", "parent", "gen")

    def __init__(self, aln, tree, name):
        gen = aln.open_genome(name)
        self.gen = gen
        nt = gen.num_top_segments
        nb = gen.num_bottom_segments
        self.n_top = nt
        self.n_bot = nb
        self.top_start = gen.top_start[:nt + 1].tolist()
        self.top_parent = gen.top_parent[:nt].tolist()
        self.top_rev = gen.top_parent_reversed[:nt].tolist()
        self.top_para = (gen.top_paralogy[:nt].tolist()
                         if gen.top_paralogy.shape[0] else [])
        self.bot_start = gen.bot_start[:nb + 1].tolist()
        self.bot_child = [gen.bot_child[:nb, s].tolist()
                          for s in range(gen.bot_child.shape[1])] if nb else []
        self.bot_crev = [gen.bot_child_reversed[:nb, s].tolist()
                         for s in range(gen.bot_child.shape[1])] if nb else []
        self.bot_tparse = (gen.bot_top_parse[:nb].tolist()
                           if gen.bot_top_parse.shape[0] else [])
        self.top_bparse = (gen.top_bottom_parse[:nt].tolist()
                           if gen.top_bottom_parse.shape[0] else [])
        self.seq_start = gen.seq_start.tolist()
        self.single_seq = gen.num_sequences <= 1
        self.parent = tree.parent(name)
        self.children = tree.children(name)


class ColumnDFS:
    """One reference column's tree spreading, with run-length tracking."""

    def __init__(self, aln: Alignment, ref: str, scope=None, targets=None,
                 no_dupes=False, no_ancestors=False, only_orthologs=False):
        self.aln = aln
        self.tree = aln.tree
        self.ref = ref
        self.scope = scope          # None/empty = everything in scope
        self.targets = targets      # None/empty = insert everything
        self.no_dupes = no_dupes
        self.no_ancestors = no_ancestors
        self.only_orthologs = only_orthologs
        self._g = {}
        self._t = {}
        self._leaf = {}
        self._slot = {}

    def g(self, name):
        gen = self._g.get(name)
        if gen is None:
            gen = self._g[name] = self.aln.open_genome(name)
        return gen

    def t(self, name) -> _GT:
        tab = self._t.get(name)
        if tab is None:
            tab = self._t[name] = _GT(self.aln, self.tree, name)
        return tab

    def is_leaf(self, name):
        v = self._leaf.get(name)
        if v is None:
            v = self._leaf[name] = self.tree.is_leaf(name)
        return v

    def _parent_in_scope(self, gname):
        return not self.scope or self.tree.parent(gname) in self.scope

    def _child_in_scope(self, gname, child):
        return not self.scope or child in self.scope

    # ---- one column -----------------------------------------------------
    def run(self, pos: int):
        """DFS from reference position `pos` (genome coords, forward).

        Returns (rows, run_limit, ref_positions) where rows is the ordered
        list of (genome, pos, rev) inserted into the column, run_limit the
        number of columns before any visited segment boundary, and
        ref_positions every visited reference-genome base as (pos, rev)
        (the _leftmostRefPos feed, halColumnIterator.cpp:812-815)."""
        from bisect import bisect_right

        self.rows = []
        self.ref_pos = []
        t = self.t(self.ref)
        gen = t.gen
        si = 0 if t.single_seq else int(gen.seq_index_at(pos))
        seq_has_tops = int(gen.seq_top[si + 1] - gen.seq_top[si]) > 0
        # clamp the run at the reference sequence end (toRight jumps
        # sequences, re-initializing iterators)
        self.limit = t.seq_start[si + 1] - pos
        if seq_has_tops:
            i = bisect_right(t.top_start, pos) - 1
            self._limit_fwd(t.top_start, i, pos)
            self._insert(self.ref, pos, False)
            self._update_parent(self.ref, t, i, pos, False)
            if not self.only_orthologs:
                self._next_top_dup(self.ref, t, i, pos, False)
            self._parse_down(self.ref, t, i, pos, False)
        else:
            b = bisect_right(t.bot_start, pos) - 1
            self._limit_fwd(t.bot_start, b, pos)
            self._insert(self.ref, pos, False)
            for slot, child in enumerate(t.children):
                self._update_child(self.ref, t, b, pos, False, slot, child)
        return self.rows, self.limit, self.ref_pos

    # ---- helpers ----------------------------------------------------------
    def _limit_fwd(self, starts, i, pos):
        rem = starts[i + 1] - pos
        if rem < self.limit:
            self.limit = rem

    def _limit_seg(self, starts, i, pos, rev):
        rem = (pos - starts[i] + 1) if rev else (starts[i + 1] - pos)
        if rem < self.limit:
            self.limit = rem

    def _insert(self, gname, pos, rev):
        if gname == self.ref:
            self.ref_pos.append((pos, rev))
        if self.no_ancestors and not self.is_leaf(gname):
            return
        if self.targets and gname not in self.targets:
            return
        self.rows.append((gname, pos, rev))

    def _is_canonical(self, gname, t, i):
        pi = t.top_parent[i]
        if pi < 0:
            return False
        slot = self._slot_of(t.parent, gname)
        return self.t(t.parent).bot_child[slot][pi] == i

    def _slot_of(self, parent, child):
        key = (parent, child)
        s = self._slot.get(key)
        if s is None:
            s = self._slot[key] = self.tree.child_index(parent, child)
        return s

    # ---- recursion (halColumnIterator.cpp:557-745) -------------------------
    def _update_parent(self, gname, t, i, pos, rev):
        pi = t.top_parent[i]
        if pi < 0 or not self._parent_in_scope(gname):
            return
        if self.no_dupes and not self._is_canonical(gname, t, i):
            return
        parent = t.parent
        pt = self.t(parent)
        prev = t.top_rev[i] != 0
        off = pos - t.top_start[i]
        seg_len = t.top_start[i + 1] - t.top_start[i]
        ppos = pt.bot_start[pi] + ((seg_len - 1 - off) if prev else off)
        nrev = rev ^ prev
        self._limit_seg(pt.bot_start, pi, ppos, nrev)
        self._insert(parent, ppos, nrev)
        self._parse_up(parent, pt, pi, ppos, nrev)
        my_slot = self._slot_of(parent, gname)
        for slot, child in enumerate(pt.children):
            if slot != my_slot:
                self._update_child(parent, pt, pi, ppos, nrev, slot, child)

    def _update_child(self, gname, t, b, pos, rev, slot, child):
        j = t.bot_child[slot][b]
        if j < 0 or not self._child_in_scope(gname, child):
            return
        ct = self.t(child)
        crev = t.bot_crev[slot][b] != 0
        off = pos - t.bot_start[b]
        seg_len = t.bot_start[b + 1] - t.bot_start[b]
        cpos = ct.top_start[j] + ((seg_len - 1 - off) if crev else off)
        nrev = rev ^ crev
        self._limit_seg(ct.top_start, j, cpos, nrev)
        self._insert(child, cpos, nrev)
        self._next_top_dup(child, ct, j, cpos, nrev)
        self._parse_down(child, ct, j, cpos, nrev)

    def _next_top_dup(self, gname, t, i, pos, rev):
        if (self.no_dupes or not t.top_para or t.top_para[i] < 0
                or t.parent is None or not self._parent_in_scope(gname)):
            return
        first = i
        para = t.top_para
        starts = t.top_start
        trev = t.top_rev
        cur, cpos, crev = i, pos, rev
        while True:
            m = para[cur]
            flip = trev[cur] != trev[m]
            off = cpos - starts[cur]
            seg_len = starts[cur + 1] - starts[cur]
            mpos = starts[m] + ((seg_len - 1 - off) if flip else off)
            mrev = crev ^ flip
            self._limit_seg(starts, m, mpos, mrev)
            self._insert(gname, mpos, mrev)
            self._parse_down(gname, t, m, mpos, mrev)
            cur, cpos, crev = m, mpos, mrev
            nxt = para[cur]
            if nxt < 0 or nxt == first:
                break

    def _parse_up(self, gname, t, b, pos, rev):
        if not t.bot_tparse or t.bot_tparse[b] < 0:
            return
        from bisect import bisect_right

        i = bisect_right(t.top_start, pos) - 1
        self._limit_seg(t.top_start, i, pos, rev)
        self._update_parent(gname, t, i, pos, rev)
        if not self.only_orthologs:
            self._next_top_dup(gname, t, i, pos, rev)

    def _parse_down(self, gname, t, i, pos, rev):
        if not t.top_bparse or t.top_bparse[i] < 0:
            return
        from bisect import bisect_right

        b = bisect_right(t.bot_start, pos) - 1
        self._limit_seg(t.bot_start, b, pos, rev)
        for slot, child in enumerate(t.children):
            self._update_child(gname, t, b, pos, rev, slot, child)


def iter_slices_exact(aln: Alignment, ref: str, gs: int, ge: int,
                      scope=None, targets=None, no_dupes=False,
                      no_ancestors=False, only_orthologs=False,
                      unique=False):
    """Yield Slices over [gs, ge) with reference-exact row order.

    Rows come back sorted by SequenceLess (genome name, sequence index —
    halColumnIterator.h:45-50) with duplicates within a sequence in DFS
    insertion order (stable sort).  unique implements the visit-cache
    semantics: a column is emitted iff the current reference position is
    the leftmost reference-genome base the traversal touches
    (colMapInsert cache + isCanonicalOnRef, halColumnIterator.cpp:146-245,
    halMafExport.cpp:52-62)."""
    from bisect import bisect_right

    dfs = ColumnDFS(aln, ref, scope=scope, targets=targets, no_dupes=no_dupes,
                    no_ancestors=no_ancestors, only_orthologs=only_orthologs)
    pos = gs
    while pos < ge:
        rows, limit, ref_positions = dfs.run(pos)
        run = min(limit, ge - pos)
        kemit = run
        if unique:
            for (p0, rev) in ref_positions:
                if rev:
                    if p0 < pos:
                        kemit = 0
                    elif p0 > pos:
                        kemit = min(kemit, (p0 - pos) // 2 + 1)
                elif p0 < pos:
                    kemit = 0
        if kemit > 0:
            out_rows = []
            for (gname, p, rev) in rows:
                t = dfs.t(gname)
                si = 0 if t.single_seq else bisect_right(t.seq_start, p) - 1
                if rev:
                    out_rows.append(Row(gname, si, p - kemit + 1, p + 1, True))
                else:
                    out_rows.append(Row(gname, si, p, p + kemit, False))
            if out_rows:
                out_rows[0].is_ref = True
            # stable: keeps DFS order within a sequence
            out_rows.sort(key=_row_key)
            yield Slice(pos, pos + kemit, out_rows, sorted_rows=True)
        pos += run


def _unaligned_run(gen, lo: int, hi: int) -> bool:
    """True iff every top segment covering [lo, hi) has no parent — the
    Rearrangement::identifyInsertionFromLeftBreakpoint criterion (an
    aligned-elsewhere run is a translocation, not an insertion)."""
    if gen.num_top_segments == 0:
        return False
    i = int(gen.top_index_at(lo))
    while i < gen.num_top_segments and int(gen.top_start[i]) < hi:
        if int(gen.top_parent[i]) != NULL_INDEX:
            return False
        i += 1
    return True


def insertion_slices(aln: Alignment, frags_by_genome: dict,
                     max_ref_gap: int) -> dict:
    """{ref anchor -> [Slice]} of insertion columns: a run of target-genome
    bases between two target-ADJACENT mapped fragments, unaligned to the
    target's parent, of length <= max_ref_gap (reference
    ColumnIterator::handleInsertion, halColumnIterator.cpp:382-401;
    enabled by hal2maf --maxRefGap).  The anchor is the reference-side end
    of the ref-earlier flank — where the left-to-right scan crosses the
    breakpoint and the reference's insertion stack is emitted."""
    out: dict = {}
    for gname, f in frags_by_genome.items():
        gen = aln.open_genome(gname)
        if gen.num_top_segments == 0:
            continue
        by_key: dict = {}
        for i in range(len(f.src_lo)):
            si = int(np.searchsorted(gen.seq_start, int(f.tgt_lo[i]), side="right")) - 1
            by_key.setdefault((si, bool(f.rev[i])), []).append(
                (int(f.tgt_lo[i]), int(f.tgt_hi[i]), int(f.src_lo[i]), int(f.src_hi[i])))
        for (si, rev), lst in by_key.items():
            lst.sort()
            for (t0, u0, s0, e0), (t1, u1, s1, e1) in zip(lst, lst[1:]):
                gap = t1 - u0
                if not (0 < gap <= max_ref_gap):
                    continue
                if not _unaligned_run(gen, u0, t1):
                    continue
                anchor = min(e0, e1)
                row = Row(gname, si, u0, t1, rev)
                out.setdefault(anchor, []).append(
                    Slice(anchor, anchor, [row], width=gap))
    for b, sls in out.items():
        sls.sort(key=lambda s: (s.rows[0].genome, s.rows[0].seq_idx,
                                s.rows[0].tgt_lo))
    return out


def deletion_slices(aln: Alignment, ref: str, gs: int, ge: int,
                    frags_by_genome: dict, max_ref_gap: int,
                    no_ancestors: bool = False) -> dict:
    """{ref anchor -> [Slice]} of deletion columns: bases of the reference's
    PARENT genome deleted between two adjacent reference top segments
    (reference ColumnIterator::handleDeletion, halColumnIterator.cpp:357-381
    + the deletion stack drained in toRight :122-126).  The deleted parent
    window is spread to the rest of the scope by recursing the slice engine
    with the parent as reference; the original reference contributes no
    base, so these render as ref-gap columns like insertions."""
    out: dict = {}
    tree = aln.tree
    parent = tree.parent(ref)
    if parent is None:
        return out
    g = aln.open_genome(ref)
    pg = aln.open_genome(parent)
    if g.num_top_segments == 0:
        return out
    i0 = int(g.top_index_at(max(gs, 0)))
    i1 = int(g.top_index_at(min(ge, g.length) - 1))
    scope = set(frags_by_genome) | {parent}
    scope_root = min(scope, key=lambda n: tree.depth(n))
    for i in range(i0, i1):
        pa, pb = int(g.top_parent[i]), int(g.top_parent[i + 1])
        if pa < 0 or pb < 0:
            continue
        ra, rb = bool(g.top_parent_reversed[i]), bool(g.top_parent_reversed[i + 1])
        if ra != rb:
            continue
        if ra:
            d0, d1 = int(pg.bot_start[pb + 1]), int(pg.bot_start[pa])
        else:
            d0, d1 = int(pg.bot_start[pa + 1]), int(pg.bot_start[pb])
        gap = d1 - d0
        if not (0 < gap <= max_ref_gap):
            continue
        # parent range must be a real deletion: nothing in it maps to ref
        slot = tree.child_index(parent, ref)
        b0 = int(pg.bot_index_at(d0))
        deleted = True
        b = b0
        while b < pg.num_bottom_segments and int(pg.bot_start[b]) < d1:
            if int(pg.bot_child[b, slot]) != NULL_INDEX:
                deleted = False
                break
            b += 1
        if not deleted:
            continue
        anchor = int(g.top_start[i + 1])
        if not (gs <= anchor <= ge):
            continue
        sub_frags = window_fragments(aln, parent, d0, d1, scope, scope_root)
        for sub in iter_slices(aln, parent, d0, d1, sub_frags,
                               no_ancestors=no_ancestors):
            rows = []
            for r in sub.rows:
                rows.append(Row(r.genome, r.seq_idx, r.tgt_lo, r.tgt_hi, r.rev))
            out.setdefault(anchor, []).append(
                Slice(anchor, anchor, rows, width=sub.width))
    return out


def iter_slices(aln: Alignment, ref: str, gs: int, ge: int,
                frags_by_genome: dict, no_ancestors: bool = False,
                unique_start: int | None = None,
                max_ref_gap: int = 0):
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

    inserts = (insertion_slices(aln, frags_by_genome, max_ref_gap)
               if max_ref_gap > 0 else {})
    deletes = (deletion_slices(aln, ref, gs, ge, frags_by_genome, max_ref_gap,
                               no_ancestors)
               if max_ref_gap > 0 else {})

    # ---- vectorized (fragment x slice) expansion ------------------------
    # every fragment boundary is a cut, so a fragment covers slices
    # [searchsorted(bnd, src_lo), searchsorted(bnd, src_hi)) exactly; the
    # per-slice python double loop this replaces was the hal2maf hot spot
    bnd = np.asarray(bounds, np.int64)
    nsl = max(len(bnd) - 1, 0)
    genome_names = sorted(frags_by_genome)
    cols = {k: [] for k in ("sl", "gid", "seq", "tlo", "thi", "rev", "isref")}
    for gid, g in enumerate(genome_names):
        if no_ancestors and not tree.is_leaf(g):
            continue
        f = frags_by_genome[g]
        gen = aln.open_genome(g)
        lo_i = np.searchsorted(bnd, f.src_lo, side="left")
        hi_i = np.searchsorted(bnd, f.src_hi, side="left")
        count = np.maximum(hi_i - lo_i, 0)
        total = int(count.sum())
        if not total:
            continue
        rep = np.repeat(np.arange(len(count)), count)
        offs = np.cumsum(count) - count
        sl = lo_i[rep] + (np.arange(total) - offs[rep])
        a = bnd[sl]
        b = bnd[sl + 1]
        rev = f.rev[rep].astype(bool)
        adv = a - f.src_lo[rep]
        t_hi_r = f.tgt_hi[rep] - adv
        t_lo_f = f.tgt_lo[rep] + adv
        t_lo = np.where(rev, t_hi_r - (b - a), t_lo_f)
        t_hi = np.where(rev, t_hi_r, t_lo_f + (b - a))
        seq = np.searchsorted(gen.seq_start, f.tgt_lo[rep], side="right") - 1
        isref = (g == ref) & ~rev & (t_lo == a)
        cols["sl"].append(sl)
        cols["gid"].append(np.full(total, gid))
        cols["seq"].append(seq)
        cols["tlo"].append(t_lo)
        cols["thi"].append(t_hi)
        cols["rev"].append(rev)
        cols["isref"].append(isref)
    if cols["sl"]:
        sl = np.concatenate(cols["sl"])
        gid = np.concatenate(cols["gid"])
        seq = np.concatenate(cols["seq"])
        tlo = np.concatenate(cols["tlo"])
        thi = np.concatenate(cols["thi"])
        rev = np.concatenate(cols["rev"])
        isref = np.concatenate(cols["isref"])
    else:
        sl = gid = seq = tlo = thi = np.zeros(0, np.int64)
        rev = isref = np.zeros(0, bool)
    # deterministic row order within a slice: ref first, then SequenceLess +
    # forward position (genome_names is sorted, so gid order == name order)
    order = np.lexsort((rev, tlo, seq, gid, ~isref, sl))
    sl, gid, seq, tlo, thi, rev, isref = (x[order] for x in
                                          (sl, gid, seq, tlo, thi, rev, isref))
    starts = np.searchsorted(sl, np.arange(nsl), side="left")
    ends = np.searchsorted(sl, np.arange(nsl), side="right")

    # --unique: leftmost ref-genome position per slice
    skip = np.zeros(nsl, bool)
    if unique_start is not None and ref_frags is not None:
        ref_gid = genome_names.index(ref) if ref in genome_names else -1
        leftpos = np.where(rev, thi - 1, tlo)
        skip_all = np.full(nsl, np.iinfo(np.int64).max)
        m = gid == ref_gid
        if m.any():
            np.minimum.at(skip_all, sl[m], leftpos[m])
        skip = skip_all < unique_start

    ref_gen = aln.open_genome(ref)
    for i in range(nsl):
        a, b = int(bnd[i]), int(bnd[i + 1])
        if b <= a:
            continue
        # indel columns anchored at this breakpoint come first: insertions,
        # then deletions (the reference drains the insertion stack before
        # the reversed-pushed deletion stack, halColumnIterator.cpp:122-126)
        for ins in inserts.pop(a, []):
            if no_ancestors and not tree.is_leaf(ins.rows[0].genome):
                continue
            yield ins
        for dl in deletes.pop(a, []):
            yield dl
        if skip[i]:
            continue
        rows = [Row(genome_names[gid[k]], int(seq[k]), int(tlo[k]),
                    int(thi[k]), bool(rev[k]), bool(isref[k]))
                for k in range(starts[i], ends[i])]
        if not (rows and rows[0].is_ref):
            # ensure the reference's own position is present even when the
            # ref genome mapping lost it (shouldn't happen; identity row)
            si = int(np.searchsorted(ref_gen.seq_start, a, side="right")) - 1
            rows.append(Row(ref, si, a, b, False, True))
            rows.sort(key=lambda r: (not r.is_ref, r.genome, r.seq_idx,
                                     r.tgt_lo, r.rev))
        yield Slice(a, b, rows)
    # insertions anchored at (or clipped to) the window end
    for anchor in sorted(inserts):
        for ins in inserts[anchor]:
            if no_ancestors and not tree.is_leaf(ins.rows[0].genome):
                continue
            yield ins
