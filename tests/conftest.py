"""Test configuration: CPU backend with a virtual 8-device mesh and x64 on.

Multi-chip sharding tests run on `--xla_force_host_platform_device_count=8`
CPU devices so no TPU pod is required (SURVEY.md §4). x64 is enabled so tests
can hold float64 oracle implementations next to the float32 TPU path.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (remote TPU
# tunnel) via a sitecustomize hook, so the env var alone is not enough —
# jax.config.update below is what actually wins.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
