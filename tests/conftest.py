"""Test harness: force CPU with an 8-device virtual mesh.

Tests run the exact TPU code paths on CPU (XLA host platform) so the
sharded/multi-chip logic is exercised without TPU hardware, per the
project testing strategy (SURVEY.md section 4).

Note: some environments pre-import jax via pytest plugins and export
JAX_PLATFORMS=<tpu platform>, so setting os.environ alone is not
enough — we also override the jax config directly (safe as long as no
backend has been initialized yet, which holds at conftest time).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
