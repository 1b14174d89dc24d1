"""Test environment: force a virtual 8-device CPU mesh.

This is the standard way to exercise pjit/Mesh code without TPU hardware
(SURVEY.md §4e). The container's sitecustomize registers the remote axon TPU
backend at interpreter startup and forces jax_platforms="axon,cpu", so we
(a) request 8 virtual CPU devices via XLA_FLAGS before backends initialize
and (b) re-pin jax_platforms to cpu.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: this container has a single CPU core and
# cold XLA compiles dominate test time; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
