"""Pallas TPU kernels for the segment-mapping hot loop.

The mapper's inner operation is `searchsorted(segment_starts, positions)`
— executed several times per traversal level over hundreds of thousands
of positions.  XLA's lowering either binary-searches (log2(n) serial
gather rounds) or co-sorts queries (method='sort': a full bitonic sort per
call).  For genome-scale segment arrays that fit VMEM (up to ~1M starts),
a compare-count formulation is faster and fully vectorized:

    out[i] = sum_j (grid[j] <= q[i])        (side='right')

The kernel keeps the grid resident in VMEM and streams query tiles over
it, accumulating the per-query count with VPU compares — no sort, no
serial rounds, one pass of grid x tile traffic that stays on-chip.

Used by segmap_jax when the level's grid fits (hal_tpu.ops.segmap_jax
`_searchsorted`); falls back to jnp.searchsorted otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# query tile (sublane-friendly) and grid block (lane-friendly)
TILE_Q = 1024
BLOCK_G = 2048

_INT32_MAX = np.int32(2 ** 31 - 1)


def _kernel(grid_ref, q_ref, out_ref):
    q = q_ref[:]  # (TILE_Q, 1)
    npad = grid_ref.shape[1]
    acc = jnp.zeros((q.shape[0], 1), jnp.int32)

    def body(b, acc):
        g = grid_ref[0, pl.ds(b * jnp.int32(BLOCK_G), BLOCK_G)]  # (BLOCK_G,)
        cmp = (g[None, :] <= q).astype(jnp.int32)                # (TILE_Q, BLOCK_G)
        return acc + jnp.sum(cmp, axis=1, keepdims=True, dtype=jnp.int32)

    acc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(npad // BLOCK_G), body, acc)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("n_pad",))
def _searchsorted_right_p(grid_padded, queries, n_pad):
    nq = queries.shape[0]
    q2 = queries.reshape(nq, 1)
    # trace the kernel with x64 off: Mosaic rejects the i64 index-map values
    # that jax_enable_x64 (needed elsewhere for genome coords) would emit
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel,
            grid=(nq // TILE_Q,),
            in_specs=[
                pl.BlockSpec((1, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_Q, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_Q, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nq, 1), jnp.int32),
        )(grid_padded.reshape(1, n_pad), q2)
    return out.reshape(nq)


def pad_grid(grid: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    """Pad a sorted int32 grid to a BLOCK_G multiple with INT32_MAX."""
    n = grid.shape[0]
    n_pad = max(-(-n // BLOCK_G) * BLOCK_G, BLOCK_G)
    g = jnp.full((n_pad,), _INT32_MAX, jnp.int32)
    g = g.at[:n].set(grid.astype(jnp.int32))
    return g, n_pad


def searchsorted_right(grid_padded: jnp.ndarray, n_pad: int, queries: jnp.ndarray):
    """searchsorted(grid, queries, side='right') via the compare-count
    kernel.  `grid_padded` from pad_grid.  Queries padded internally."""
    nq = queries.shape[0]
    nq_pad = max(-(-nq // TILE_Q) * TILE_Q, TILE_Q)
    if nq_pad != nq:
        q = jnp.zeros((nq_pad,), jnp.int32).at[:nq].set(queries.astype(jnp.int32))
    else:
        q = queries.astype(jnp.int32)
    out = _searchsorted_right_p(grid_padded, q, n_pad)
    return out[:nq]


# --------------------------------------------------------------------------
# blocked inclusive scans (cummax / cumsum)
#
# XLA lowers lax.cummax/cumsum as O(log n) full-array passes; for the
# mapper's multi-million-slot owner expansion that is ~20 materialized
# sweeps of the slot array per level.  The TPU grid executes sequentially
# on a core, so a single-pass blocked scan with a carry in SMEM does it in
# one sweep of HBM traffic.
# --------------------------------------------------------------------------

CM_ROWS = 64
CM_COLS = 1024
_CM_BLOCK = CM_ROWS * CM_COLS

_CM_MIN = -(2 ** 31) + 1


def _shift_scan(x, axis, op, ident):
    """Inclusive running op via Hillis-Steele log-shift.  lax.cummax/cumsum
    have no Pallas TPU lowering and concat of sublane-offset slices doesn't
    compile, so the shift is a roll (tpu.rotate) with wrapped lanes masked
    to the identity."""
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    s = 1
    while s < n:
        shifted = jnp.where(idx < s, ident, jnp.roll(x, s, axis=axis))
        x = op(x, shifted)
        s *= 2
    return x


def _scan_kernel(x_ref, out_ref, carry_ref, *, op, ident, reduce_fn):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0] = jnp.int32(ident)

    x = x_ref[:]  # (CM_ROWS, CM_COLS); flat order = row-major
    cm = _shift_scan(x, 1, op, ident)
    # cross-row propagation: per-row totals, inclusive scan over rows,
    # shifted down one row (exclusive) with the running carry for row 0
    last = reduce_fn(cm, axis=1, keepdims=True)        # (R, 1)
    rows = _shift_scan(last, 0, op, ident)             # (R, 1) inclusive
    ridx = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0)
    excl = jnp.where(ridx < 1, ident, jnp.roll(rows, 1, axis=0))
    carry_in = carry_ref[0]
    prev = op(excl, carry_in)                          # (R, 1)
    out_ref[:] = op(cm, prev)
    carry_ref[0] = op(carry_in, reduce_fn(rows))


def _cummax_body(x_ref, out_ref, carry_ref):
    _scan_kernel(x_ref, out_ref, carry_ref,
                 op=jnp.maximum, ident=_CM_MIN, reduce_fn=jnp.max)


def _cumsum_body(x_ref, out_ref, carry_ref):
    # per-row total = last element of the within-row inclusive scan
    def last_col(v, axis=1, keepdims=True):
        if v.ndim == 2 and v.shape[1] > 1:
            lanes = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
            return jnp.max(jnp.where(lanes == v.shape[1] - 1, v, _CM_MIN),
                           axis=1, keepdims=True)
        return jnp.max(jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) == v.shape[0] - 1,
            v, _CM_MIN))

    _scan_kernel(x_ref, out_ref, carry_ref,
                 op=jnp.add, ident=0, reduce_fn=last_col)


def _make_scan(body):
    @jax.jit
    def scan_p(x2):
        n_blocks = x2.shape[0] // CM_ROWS
        with jax.enable_x64(False):
            return pl.pallas_call(
                body,
                grid=(n_blocks,),
                in_specs=[pl.BlockSpec((CM_ROWS, CM_COLS), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((CM_ROWS, CM_COLS), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.int32),
                scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            )(x2)

    return scan_p


_cummax_i32_p = _make_scan(_cummax_body)
_cumsum_i32_p = _make_scan(_cumsum_body)


def _blocked_scan(x, scan_p, pad_value):
    n = x.shape[0]
    n_pad = max(-(-n // _CM_BLOCK) * _CM_BLOCK, _CM_BLOCK)
    if n_pad != n:
        xp = jnp.full((n_pad,), pad_value, jnp.int32).at[:n].set(
            x.astype(jnp.int32))
    else:
        xp = x.astype(jnp.int32)
    out = scan_p(xp.reshape(n_pad // CM_COLS, CM_COLS))
    return out.reshape(n_pad)[:n]


def cummax_i32(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running max of a 1-D int32 array, single-sweep on TPU."""
    return _blocked_scan(x, _cummax_i32_p, _CM_MIN)


def cumsum_i32(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running sum of a 1-D int32 array, single-sweep on TPU."""
    return _blocked_scan(x, _cumsum_i32_p, 0)
