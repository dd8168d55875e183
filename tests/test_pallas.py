"""Pallas searchsorted kernel correctness (runs on CPU via fallback check +
on TPU in the bench; here we verify the dispatch wrapper semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_searchsorted_dispatch_matches_numpy():
    from hal_tpu.ops.segmap_jax import _searchsorted_right

    rng = np.random.default_rng(0)
    grid = np.sort(rng.integers(0, 10000, 500)).astype(np.int32)
    q = rng.integers(-5, 10005, 4096).astype(np.int32)
    out = np.asarray(_searchsorted_right(jnp.asarray(grid), jnp.asarray(q)))
    want = np.searchsorted(grid, q, side="right")
    assert np.array_equal(out, want)


@pytest.mark.skipif(jax.default_backend() == "cpu", reason="pallas kernel needs TPU")
def test_pallas_kernel_direct():
    from hal_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(1)
    grid = np.sort(rng.integers(0, 100000, 3000)).astype(np.int32)
    q = rng.integers(0, 100000, 8192).astype(np.int32)
    gp, n_pad = pk.pad_grid(jnp.asarray(grid))
    out = np.asarray(pk.searchsorted_right(gp, n_pad, jnp.asarray(q)))
    assert np.array_equal(out, np.searchsorted(grid, q, side="right"))
