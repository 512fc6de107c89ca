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

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
