"""Batched segment mapper on device (JAX) — the TPU liftover kernel.

Same fragment algebra as hal_tpu.ops.segmap_host (the correctness oracle)
but jit-compiled with static capacities so the whole genome-path traversal
is one fused XLA program of gathers + scans:

  * the tree path (src -> mrca -> tgt) is precomputed on host and baked
    into the trace as an unrolled loop over levels (PathData),
  * raggedness (a fragment splitting at segment boundaries, paralogy rings)
    is handled with bounded-capacity expansion + mask compaction — the
    standard segmented-scan/expansion pattern (searchsorted over cumulative
    counts), no data-dependent shapes anywhere,
  * an overflow flag is returned; the host wrapper doubles capacity and
    retries (compile cache per capacity).

Fragments carry an `owner` id so one kernel call lifts an entire batch of
BED intervals while preserving per-interval semantics downstream.

Reference equivalents: api/impl/halSegmentMapper.cpp (mapUp :25, mapDown
:128, mapSelf :263, mapRecursive* :85/:191/:525).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# genome coordinates exceed int32 (human ~3.1e9); index math must be 64-bit
jax.config.update("jax_enable_x64", True)

from hal_tpu.constants import NULL_INDEX
from hal_tpu.alignment import Alignment

TOP = 0
BOTTOM = 1

# grids up to this many entries use the Pallas compare-count searchsorted
# (hal_tpu.ops.pallas_kernels); larger grids or non-TPU backends fall back
# to jnp.searchsorted(method='sort')
_PALLAS_GRID_LIMIT = 65536


def _searchsorted_right(grid, q):
    if (grid.dtype == jnp.int32 and q.dtype == jnp.int32
            and grid.shape[0] <= _PALLAS_GRID_LIMIT
            and jax.default_backend() != "cpu"):
        from hal_tpu.ops import pallas_kernels as pk

        gp, n_pad = pk.pad_grid(grid)
        return pk.searchsorted_right(gp, n_pad, q)
    return jnp.searchsorted(grid, q, side="right", method="sort")


@dataclass(frozen=True)
class Level:
    """One traversal level's device arrays (padded to genome sizes)."""

    kind: str  # 'up' | 'down'
    # grid to split fragment targets on (top_start for up, bot_start for down)
    grid: jnp.ndarray
    # up: parent index / reversed per top segment; parent bot_start for coords
    # down: child index / reversed per bottom segment; child top_start
    link: jnp.ndarray
    link_reversed: jnp.ndarray
    seg_start: jnp.ndarray   # == grid (start of each segment, sentinel incl.)
    dst_start: jnp.ndarray   # parent bot_start / child top_start
    # paralogy dup table of the DESTINATION genome (down only; empty if
    # unused): CSR over top segments -> other ring members
    ring_counts: jnp.ndarray    # [n_top] number of OTHER ring members
    ring_offsets: jnp.ndarray   # [n_top] CSR start into ring_members
    ring_members: jnp.ndarray   # [nnz] member segment index
    ring_flip: jnp.ndarray      # [nnz] 1 if member parent-orientation differs
    dst_grid: jnp.ndarray       # destination top_start (for ring offsets)
    max_ring: int


@dataclass(frozen=True)
class PathData:
    levels: tuple
    n_up: int

    @classmethod
    def build(cls, aln: Alignment, src: str, tgt: str, do_dupes: bool = True,
              dtype=None) -> "PathData":
        """dtype: coordinate dtype for device arrays; defaults to int32 when
        every genome on the path fits (TPU-friendly), else int64."""
        tree = aln.tree
        mrca = tree.lca(src, tgt)
        if dtype is None:
            max_len = max(aln.open_genome(n).length for n in tree.path(src, tgt))
            max_seg = max(max(aln.open_genome(n).num_top_segments,
                              aln.open_genome(n).num_bottom_segments)
                          for n in tree.path(src, tgt))
            dtype = jnp.int32 if max(max_len, max_seg) < 2 ** 31 - 2 else jnp.int64
        def A(x):
            return jnp.asarray(np.ascontiguousarray(x), dtype)
        levels = []
        cur = src
        # ---- up levels -------------------------------------------------
        while cur != mrca:
            g = aln.open_genome(cur)
            parent = tree.parent(cur)
            pg = aln.open_genome(parent)
            slot = tree.child_index(parent, cur)
            levels.append(Level(
                kind="up",
                grid=A(g.top_start),
                link=A(g.top_parent),
                link_reversed=jnp.asarray(g.top_parent_reversed),
                seg_start=A(g.top_start),
                dst_start=A(pg.bot_start),
                ring_counts=jnp.zeros(0, dtype),
                ring_offsets=jnp.zeros(0, dtype),
                ring_members=jnp.zeros(0, dtype),
                ring_flip=jnp.zeros(0, jnp.uint8),
                dst_grid=jnp.zeros(0, dtype),
                max_ring=0,
            ))
            cur = parent
        n_up = len(levels)
        # ---- down levels -----------------------------------------------
        if cur != tgt:
            for nxt in tree.path(cur, tgt)[1:]:
                g = aln.open_genome(cur)
                cg = aln.open_genome(nxt)
                slot = tree.child_index(cur, nxt)
                max_ring = 0
                rc = np.zeros(0, np.int64)
                ro = np.zeros(0, np.int64)
                rm = np.zeros(0, np.int64)
                rf = np.zeros(0, np.uint8)
                if do_dupes and (cg.top_paralogy != NULL_INDEX).any():
                    rc, ro, rm, rf = _build_ring_csr(cg.top_paralogy, cg.top_parent_reversed)
                    max_ring = int(rc.max()) + 1
                levels.append(Level(
                    kind="down",
                    grid=A(g.bot_start),
                    link=A(g.bot_child[:, slot])
                    if g.num_bottom_segments else jnp.full((0,), NULL_INDEX, dtype),
                    link_reversed=jnp.asarray(np.ascontiguousarray(g.bot_child_reversed[:, slot]))
                    if g.num_bottom_segments else jnp.zeros(0, jnp.uint8),
                    seg_start=A(g.bot_start),
                    dst_start=A(cg.top_start),
                    ring_counts=A(rc),
                    ring_offsets=A(ro),
                    ring_members=A(rm),
                    ring_flip=jnp.asarray(rf),
                    dst_grid=A(cg.top_start),
                    max_ring=max_ring,
                ))
                cur = nxt
        return cls(levels=tuple(levels), n_up=n_up)



def _level_flatten(lv: Level):
    children = (lv.grid, lv.link, lv.link_reversed, lv.seg_start, lv.dst_start,
                lv.ring_counts, lv.ring_offsets, lv.ring_members, lv.ring_flip,
                lv.dst_grid)
    aux = (lv.kind, lv.max_ring)
    return children, aux


def _level_unflatten(aux, children):
    return Level(kind=aux[0], max_ring=aux[1],
                 grid=children[0], link=children[1], link_reversed=children[2],
                 seg_start=children[3], dst_start=children[4], ring_counts=children[5],
                 ring_offsets=children[6], ring_members=children[7],
                 ring_flip=children[8], dst_grid=children[9])


jax.tree_util.register_pytree_node(Level, _level_flatten, _level_unflatten)


def _path_flatten(p: PathData):
    return (p.levels,), (p.n_up,)


def _path_unflatten(aux, children):
    return PathData(levels=children[0], n_up=aux[0])


jax.tree_util.register_pytree_node(PathData, _path_flatten, _path_unflatten)


def _build_ring_csr(ring: np.ndarray, reversed_: np.ndarray):
    """Host precompute: per top segment, the OTHER members of its paralogy
    ring (ring order starting after the segment) plus an orientation-flip
    bit per member (TopSegmentIterator::toNextParalogy semantics)."""
    n = len(ring)
    counts = np.zeros(n, np.int64)
    members: list[int] = []
    flips: list[int] = []
    offsets = np.zeros(n, np.int64)
    for i in np.flatnonzero(ring != NULL_INDEX):
        offsets[i] = len(members)
        j = int(ring[i])
        c = 0
        while j != i and j != NULL_INDEX:
            members.append(j)
            flips.append(1 if reversed_[j] != reversed_[i] else 0)
            c += 1
            j = int(ring[j])
        counts[i] = c
    return (counts, offsets, np.asarray(members, np.int64),
            np.asarray(flips, np.uint8))


# --------------------------------------------------------------------------
# jit building blocks (all fixed-capacity)
# --------------------------------------------------------------------------

def _split_by_grid(grid, src_lo, src_hi, tgt_lo, tgt_hi, rev, owner, valid, cap_out):
    """Split targets at grid boundaries; output capacity cap_out."""
    i0 = _searchsorted_right(grid, tgt_lo) - 1
    i1 = _searchsorted_right(grid, tgt_hi - 1) - 1
    counts = jnp.where(valid, i1 - i0 + 1, 0)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]
    j = jnp.arange(cap_out, dtype=tgt_lo.dtype)
    own = jnp.searchsorted(offsets + counts, j, side="right", method="sort")
    own = jnp.minimum(own, counts.shape[0] - 1)
    k = j - offsets[own]
    v = j < total
    seg = jnp.clip(i0[own] + k, 0, grid.shape[0] - 2)
    p_lo = jnp.maximum(tgt_lo[own], grid[seg])
    p_hi = jnp.minimum(tgt_hi[own], grid[seg + 1])
    r = rev[own]
    adv = jnp.where(r.astype(bool), tgt_hi[own] - p_hi, p_lo - tgt_lo[own])
    s_lo = src_lo[own] + adv
    s_hi = s_lo + (p_hi - p_lo)
    v = v & (p_hi > p_lo)
    overflow = total > cap_out
    return (s_lo, s_hi, p_lo, p_hi, r, owner[own], v, seg), overflow


def _hop(level: Level, s_lo, s_hi, t_lo, t_hi, rev, owner, valid, seg):
    """seg-indexed link hop (up: top->parent bottom; down: bottom->child top)."""
    link = level.link[jnp.clip(seg, 0, level.link.shape[0] - 1)] if level.link.shape[0] else jnp.full_like(seg, NULL_INDEX)
    lrev = level.link_reversed[jnp.clip(seg, 0, level.link_reversed.shape[0] - 1)] if level.link_reversed.shape[0] else jnp.zeros_like(seg, dtype=jnp.uint8)
    has = valid & (link != NULL_INDEX)
    ss = level.seg_start[jnp.clip(seg, 0, level.seg_start.shape[0] - 2)]
    se = level.seg_start[jnp.clip(seg + 1, 1, level.seg_start.shape[0] - 1)]
    ds = level.dst_start[jnp.clip(link, 0, level.dst_start.shape[0] - 2)]
    off = t_lo - ss
    ln = t_hi - t_lo
    mirrored = se - t_hi
    new_lo = jnp.where(lrev.astype(bool), ds + mirrored, ds + off)
    new_rev = rev ^ lrev
    return s_lo, s_hi, new_lo, new_lo + ln, new_rev, owner, has, link


def _ring_expand(level: Level, s_lo, s_hi, t_lo, t_hi, rev, owner, valid, seg, cap_out):
    """Append all paralogy-ring members via one CSR expansion (bounded by
    the true number of dupes, not max_ring x capacity)."""
    grid = level.dst_grid
    nseg = level.ring_counts.shape[0]
    segc = jnp.clip(seg, 0, max(nseg - 1, 0))
    counts = jnp.where(valid, level.ring_counts[segc], 0)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]
    j = jnp.arange(cap_out, dtype=s_lo.dtype)
    own = jnp.searchsorted(offsets + counts, j, side="right", method="sort")
    own = jnp.minimum(own, counts.shape[0] - 1)
    k = j - offsets[own]
    v = j < total
    nnz = max(level.ring_members.shape[0], 1)
    midx = jnp.clip(level.ring_offsets[jnp.clip(seg[own], 0, max(nseg - 1, 0))] + k, 0, nnz - 1)
    member = level.ring_members[midx]
    flip = level.ring_flip[midx].astype(bool)
    off = t_lo[own] - grid[jnp.clip(seg[own], 0, grid.shape[0] - 2)]
    ln = t_hi[own] - t_lo[own]
    mi = jnp.clip(member, 0, grid.shape[0] - 2)
    ts = grid[mi]
    te = grid[jnp.clip(mi + 1, 1, grid.shape[0] - 1)]
    nlo = jnp.where(flip, te - off - ln, ts + off)
    cat = (jnp.concatenate([s_lo, s_lo[own]]),
           jnp.concatenate([s_hi, s_hi[own]]),
           jnp.concatenate([t_lo, nlo]),
           jnp.concatenate([t_hi, nlo + ln]),
           jnp.concatenate([rev, rev[own] ^ flip.astype(jnp.uint8)]),
           jnp.concatenate([owner, owner[own]]),
           jnp.concatenate([valid, v]))
    return cat, total > cap_out


def _final_compact(arrs):
    """Valid entries are already prefix-dense up to scattered hop/ring
    holes (each split repacks densely), so no sort is needed: compute the
    last-valid bound with a max-reduce; the host transfers [:bound] and
    filters by mask (much cheaper than an argsort compaction on TPU)."""
    s_lo, s_hi, t_lo, t_hi, rev, owner, valid = arrs
    idx = jnp.arange(valid.shape[0], dtype=jnp.int32)
    bound = jnp.max(jnp.where(valid, idx + 1, 0))
    return (s_lo, s_hi, t_lo, t_hi, rev, owner, valid), bound


def _run_path(path: PathData, lo, hi, owner, caps):
    """Trace the whole path; returns padded fragment arrays + overflow flag."""
    n = lo.shape[0]
    s_lo, s_hi = lo, hi
    t_lo, t_hi = lo, hi
    rev = jnp.zeros(n, jnp.uint8)
    own = owner
    valid = hi > lo
    overflow = jnp.asarray(False)
    level_totals = []
    for li, level in enumerate(path.levels):
        cap = caps[li]
        (s_lo, s_hi, t_lo, t_hi, rev, own, valid, seg), ov1 = _split_by_grid(
            level.grid, s_lo, s_hi, t_lo, t_hi, rev, own, valid, cap)
        overflow |= ov1
        s_lo, s_hi, t_lo, t_hi, rev, own, valid, link = _hop(
            level, s_lo, s_hi, t_lo, t_hi, rev, own, valid, seg)
        if level.kind == "down" and level.max_ring > 0:
            (s_lo, s_hi, t_lo, t_hi, rev, own, valid), ov2 = _ring_expand(
                level, s_lo, s_hi, t_lo, t_hi, rev, own, valid, link, cap)
            overflow |= ov2
        level_totals.append(jnp.sum(valid.astype(jnp.int32)))
    compacted, total = _final_compact((s_lo, s_hi, t_lo, t_hi, rev, own, valid))
    return compacted, total, overflow, jnp.stack(level_totals) if level_totals else jnp.zeros(0, jnp.int32)


@functools.partial(jax.jit, static_argnames=("caps",))
def _map_batch_jit(path: PathData, lo, hi, owner, caps):
    return _run_path(path, lo, hi, owner, caps)


def map_batch(path: PathData, lo, hi, owner=None, cap_mult: int = 4):
    """Host wrapper: run the jitted path, growing capacity on overflow.

    Returns numpy (src_lo, src_hi, tgt_lo, tgt_hi, rev, owner) of valid
    fragments (un-atomized, un-deduped — feed to segmap_host.atomize or the
    bulk liftover emitter)."""
    dtype = path.levels[0].grid.dtype if path.levels else jnp.int64
    lo = jnp.asarray(lo, dtype)
    hi = jnp.asarray(hi, dtype)
    n = int(lo.shape[0])
    if owner is None:
        owner = jnp.arange(n, dtype=dtype)
    else:
        owner = jnp.asarray(owner, dtype)
    mult = cap_mult
    while True:
        caps = []
        base = max(n, 16)
        for level in path.levels:
            c = base * mult
            if level.kind == "down" and level.max_ring:
                c = c * min(level.max_ring + 1, 4)
            caps.append(int(c))
        out, bound, overflow, level_totals = _map_batch_jit(path, lo, hi, owner, tuple(caps))
        if not bool(np.asarray(overflow.reshape(1))[0]):
            # transfer only up to the last valid slot (device->host may
            # cross a network tunnel; the padded capacity stays on device)
            k = int(np.asarray(bound.reshape(1))[0])
            arrs = [np.asarray(x[:k]) for x in out[:6]]
            mask = np.asarray(out[6][:k]).astype(bool)
            s_lo, s_hi, t_lo, t_hi, rev, own = [a[mask] for a in arrs]
            return (s_lo, s_hi, t_lo, t_hi, rev, own)
        mult *= 2
        if mult > 4096:
            raise RuntimeError("segment-map capacity blowup")
