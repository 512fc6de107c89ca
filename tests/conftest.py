"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Unit tests want exact host numerics and no per-test TPU-tunnel dial latency;
multi-chip sharding tests use XLA's host platform with 8 virtual devices (the
TPU analog of a fake backend — SURVEY.md §4d).

Note: the container's sitecustomize imports jax and registers the remote-TPU
(axon) backend at interpreter start, before conftest runs — so setting
JAX_PLATFORMS in os.environ here is too late.  We must go through
jax.config.update, and the host-device-count flag must be injected before the
CPU backend is first initialized (it is lazy, so this works from conftest).
"""

import os
import re

# The suite requires EXACTLY 8 virtual CPU devices; a pre-existing flag with
# any other value would make every multi-device test fail with errors that
# look like product bugs, so rewrite it rather than merely append.
xla_flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", "")).strip()
os.environ["XLA_FLAGS"] = (
    xla_flags + " --xla_force_host_platform_device_count=8").strip()

# In-process CLI tests call train.main(), which enables the persistent XLA
# compile cache by default; keep the suite from writing cache entries into
# the user's home dir (the dedicated cache test runs subprocesses with its
# own env).
os.environ.setdefault("MMTX_COMPILE_CACHE", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
