"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars BEFORE jax is imported anywhere (SURVEY.md §4
"Distributed without a cluster"). Bench/production code uses the real TPU;
tests are CPU-only so they run anywhere and exercise multi-device sharding
via --xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize registers the axon TPU plugin and forces
# jax_platforms="axon,cpu" regardless of the env var; override it back
# to CPU before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
