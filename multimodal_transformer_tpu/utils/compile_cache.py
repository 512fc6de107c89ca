"""Persistent XLA compilation cache wiring.

On this hardware every fresh process pays a 10-40 s REMOTE compile per
jitted shape (one TPU chip behind an HTTP tunnel), so CLI runs were
compile-dominated: the round-2 2-epoch MFT smoke spent ~1,100 of 1,167 s
compiling.  The persistent cache keys the serialized computation and
replays the compiled executable on the next identical (program, backend)
pair — verified working against both the local CPU backend and the
tunneled axon TPU backend (jax 0.9.0).

Knobs (env):
  MMTX_COMPILE_CACHE=0       disable entirely
  MMTX_COMPILE_CACHE=<dir>   cache directory (default
                             ~/.cache/multimodal_transformer_tpu/xla)

Call enable_compile_cache() before the first jit of the process; callers
are the CLI (train.py), bench.py, serve.py and parity_replay.py.  Safe to
call more than once.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "multimodal_transformer_tpu", "xla")

_enabled_dir: str | None = None


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at a durable directory.

    Returns the directory in use, or None when disabled via
    MMTX_COMPILE_CACHE=0.  Idempotent.
    """
    global _enabled_dir
    env = os.environ.get("MMTX_COMPILE_CACHE")
    if env == "0":
        return None
    if _enabled_dir is not None:
        return _enabled_dir
    target = cache_dir or (env if env else _DEFAULT_DIR)
    os.makedirs(target, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", target)
    # Remote compiles are worth caching no matter how quick they look to
    # the client, and the entries are small next to the 10-40 s they save.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled_dir = target
    return target
