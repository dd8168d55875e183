"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

Note: the JAX_PLATFORMS env var alone is NOT reliable when a TPU platform
plugin is installed (the plugin can win the backend race); jax.config.update
is authoritative, so set both."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The TPU PJRT plugin registers itself in EVERY python process via
# sitecustomize (PALLAS_AXON_POOL_IPS gates it) and performs a network
# handshake during registration even when JAX_PLATFORMS=cpu — a wedged
# tunnel then hangs every jax process at import.  Tests are CPU-only by
# design, so scrub the gate here; subprocesses spawned by tests inherit
# the scrubbed environment.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
