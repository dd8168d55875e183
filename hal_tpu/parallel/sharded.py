"""Sharded liftover/depth step over a device mesh.

The canonical multi-chip workload (BASELINE.json config #5): a batch of
query intervals is sharded over the 'data' mesh axis, each device maps its
shard through the genome path (the jit segment-map kernel), computes a
local coverage histogram over the target coordinate space, and the
histograms are reduced across 'data' and sharded over 'coord'
(reduce_scatter semantics) — the collective replacing hal2mafMP.py's
"concatenate partial files on a shared filesystem".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hal_tpu.ops.segmap_jax import (PathData, _run_path,
                                    C_TLO, C_THI, C_VALID)


def ensure_virtual_devices(n: int) -> None:
    """Force an n-device virtual CPU backend when fewer real devices exist.
    JAX_PLATFORMS=cpu alone is unreliable when a TPU platform plugin is
    installed (the plugin can win the backend race); jax.config is
    authoritative.  Must run before heavy device use."""
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=%d" % n).strip()
    if jax.device_count() < n:
        from jax.extend import backend as _jexb

        _jexb.clear_backends()
        jax.config.update("jax_platforms", "cpu")
        assert jax.device_count() >= n, (
            "need %d devices, have %d" % (n, jax.device_count()))


def make_mesh(n_data: int, n_coord: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_coord, "not enough devices"
    dev = np.asarray(devices[: n_data * n_coord]).reshape(n_data, n_coord)
    return Mesh(dev, ("data", "coord"))


def make_sharded_step(path: PathData, caps: tuple, tgt_len: int, n_bins: int, mesh: Mesh):
    """Returns a jitted SPMD step: (lo, hi, owner) sharded over 'data' ->
    (fragment arrays sharded over 'data', depth histogram sharded over 'coord')."""

    n_coord = mesh.shape["coord"]
    assert n_bins % n_coord == 0

    def local_step(lo, hi, owner):
        F, _bound, _ovf, _lt = _run_path(path, lo, hi, owner, caps)
        t_lo = F[C_TLO]
        t_hi = F[C_THI]
        valid = F[C_VALID] > 0
        # local coverage histogram over target bins (alignment-depth shape;
        # exact per-base depth uses diff+cumsum in ops/depth)
        bin_of = jnp.clip(t_lo * n_bins // max(tgt_len, 1), 0, n_bins - 1)
        cov = jnp.zeros((n_bins,), jnp.int64)
        cov = cov.at[bin_of].add(jnp.where(valid, t_hi - t_lo, 0))
        # merge across data shards, scatter across coord shards (ICI collective)
        cov = jax.lax.psum(cov, "data")
        k = n_bins // n_coord
        ci = jax.lax.axis_index("coord")
        cov_shard = jax.lax.dynamic_slice(cov, (ci * k,), (k,))
        return F, cov_shard

    step = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=(P(None, "data"), P("coord")),
        check_vma=False,
    )
    return jax.jit(step)


def shard_batch(mesh: Mesh, lo: np.ndarray, hi: np.ndarray, owner: np.ndarray):
    """Pad a host batch to a multiple of the data-axis size and device_put
    with a 'data' sharding."""
    n_data = mesh.shape["data"]
    n = len(lo)
    pad = (-n) % n_data
    if pad:
        lo = np.concatenate([lo, np.zeros(pad, lo.dtype)])
        hi = np.concatenate([hi, np.zeros(pad, hi.dtype)])  # hi==lo -> invalid
        owner = np.concatenate([owner, np.full(pad, -1, owner.dtype)])
    sh = NamedSharding(mesh, P("data"))
    return (jax.device_put(lo, sh), jax.device_put(hi, sh), jax.device_put(owner, sh))
