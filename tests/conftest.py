"""Test config: force CPU with 8 virtual devices so multi-chip sharding
tests run anywhere (the TPU-native analog of testing multi-node without a
cluster — see SURVEY.md §4).

Note: this environment's axon sitecustomize programmatically sets
``jax_platforms="axon,cpu"`` in every interpreter, overriding the
JAX_PLATFORMS env var — so we must override via jax.config *after* import
(backends are not yet initialized at conftest time, so this wins)."""
import os
import tempfile

# isolate the persisted bad-fused-sizes cache (train/model.py) from the
# user's real cache: tests synthesize compiler crashes
os.environ["XDG_CACHE_HOME"] = tempfile.mkdtemp(prefix="ia_tpu_cache_")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env is set)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# XLA:CPU executable (de)serialization aborts on this host (AOT
# machine-feature mismatch — "+prefer-no-scatter is not supported on the
# host machine" → Fatal Python error in put_executable_and_time, seen
# 2026-08-19 in test_cli_pipeline). The persistent compile cache is a
# TPU-side optimization; keep it off for the CPU test matrix.
jax.config.update("jax_enable_compilation_cache", False)

assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")
assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()}")
