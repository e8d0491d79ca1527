"""Test env: force CPU with 8 fake devices so mesh/shard_map/psum/all_to_all
tests run in one process (SURVEY.md §4 item 4).

Note: this machine's axon sitecustomize force-registers the (tunneled) TPU
platform at interpreter startup and overrides JAX_PLATFORMS, so env vars
alone are not enough — we must also update jax.config after import. Tests
that need the real TPU opt in via the ``tpu`` marker and are skipped here.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
