"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend at interpreter
boot with JAX_PLATFORMS=axon exported, so plain env-var overrides are too
late; instead we flip jax_platforms before the (lazy) backend initialization
and force 8 host devices (SURVEY.md §4: fake-pod CPU simulation).

Persistent compilation cache: still broken in this image — re-verified this
round: enabling jax_compilation_cache_dir segfaults the pytest process in the
executable-serialization path (compilation_cache.put_executable_and_time) on
the larger e2e programs, same as round 1. Opt back in with
BAYESNMF_TEST_CACHE=1 to re-test on a newer jaxlib.

Suite wall-clock: dominated by XLA:CPU compiles of the many (spec, shape)
program variants. pytest-xdist was measured NOT to help on this host
(16:13 with -n 4 vs 16:42 sequential — only 2 physical cores, already
saturated); on a many-core CI box ``-n auto`` should parallelize the
compiles across workers.
"""

import os

import pytest

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables + tracing caches after every test module.

    The monolithic fast-suite run used to segfault deterministically inside
    XLA:CPU's backend_compile_and_load after ~77 programs had accumulated in
    one process (any single file passed in isolation) — an in-process
    compiler-state buildup, not a bug in any one program. Clearing JAX's
    executable/tracing caches at module boundaries bounds the accumulation;
    each module recompiles its own programs, which it would have had to do
    under per-file isolation anyway.
    """
    yield
    jax.clear_caches()

# BAYESNMF_TEST_TPU=1 keeps the axon TPU backend so the statistical gates
# (e.g. the fused-kernel Geweke tests) can run compiled on the real chip
# instead of interpret mode:
#   BAYESNMF_TEST_TPU=1 python -m pytest tests/test_geweke.py -k fused
_USE_TPU = os.environ.get("BAYESNMF_TEST_TPU", "0") == "1"
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

if os.environ.get("BAYESNMF_TEST_CACHE", "0") == "1":
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert _USE_TPU or jax.devices()[0].platform == "cpu"
