"""Test configuration.

Tests run on CPU with an 8-device virtual topology so data-parallel /
collective code paths are exercised without TPU hardware (the driver
dry-runs the real multi-chip path separately via ``__graft_entry__``).

NOTE: this environment's ``sitecustomize`` pre-imports jax with
``JAX_PLATFORMS=axon`` (the TPU relay), so setting the env var here is too
late — we must go through ``jax.config.update`` before the backend
initializes.  ``XLA_FLAGS`` is still read lazily at backend init, so the
host-device-count flag works from here.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# keep per-flush matplotlib curve rendering out of the hot test loops
# (individual tests opt back in with render_curves=True)
os.environ.setdefault("GGAN_RENDER_CURVES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
