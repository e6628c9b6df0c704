"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend at interpreter
boot with JAX_PLATFORMS=axon exported, so plain env-var overrides are too
late; instead we flip jax_platforms before the (lazy) backend initialization
and force 8 host devices (SURVEY.md §4: fake-pod CPU simulation). A
persistent compilation cache keeps repeated pytest runs fast.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu"
