"""Test config.

Backend: the axon sitecustomize registers the TPU backend for every Python
process and pins ``JAX_PLATFORMS=axon`` — setting it later has no effect, so
tests run on the real TPU chip when present (the actual target hardware)
and plain CPU otherwise.

Sharding tests use a *virtual 8-device CPU mesh* that coexists with the TPU
default backend: ``--xla_force_host_platform_device_count=8`` makes
``jax.devices("cpu")`` return 8 devices (SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, "/root/reference")  # reference (read-only) for parity tests

import jax
# VYOMAI_JAX_CACHE: point a concurrent run (e.g. CPU-backend tests next to
# a TPU bench) at its own cache dir — two processes sharing one dir can
# segfault when a cache read races a concurrent write (observed: SIGSEGV in
# jax compilation_cache.get_executable_and_time during a parallel run).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("VYOMAI_JAX_CACHE", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
