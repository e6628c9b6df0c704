"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend at interpreter
boot with JAX_PLATFORMS=axon exported, so plain env-var overrides are too
late; instead we flip jax_platforms before the (lazy) backend initialization
and force 8 host devices (SURVEY.md §4: fake-pod CPU simulation).

No persistent compilation cache: the cache's executable-serialization path
(compilation_cache.put_executable_and_time) segfaults intermittently on the
larger e2e programs in this image, killing the whole pytest process.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.devices()[0].platform == "cpu"
