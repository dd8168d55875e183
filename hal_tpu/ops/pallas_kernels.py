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
