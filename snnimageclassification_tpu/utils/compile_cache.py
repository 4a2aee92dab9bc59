"""Persistent XLA compilation cache setup.

First compiles of the T=100 fused-kernel programs cost minutes on
relay-attached TPUs; the persistent cache makes every later process
start warm.  Entry points call :func:`enable_compilation_cache` once;
explicit ``JAX_COMPILATION_CACHE_DIR`` / ``jax_compilation_cache_dir``
settings always win.
"""
from __future__ import annotations

import os
import pathlib

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Point JAX's persistent compilation cache at a writable directory.

    No-op if the user already configured one (env var or jax.config).
    Never raises: a read-only filesystem just leaves caching off.
    """
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    if getattr(jax.config, "jax_compilation_cache_dir", None):
        return
    path = pathlib.Path(
        cache_dir
        or os.environ.get("XDG_CACHE_HOME", str(pathlib.Path.home() / ".cache"))
    )
    if cache_dir is None:
        path = path / "snn_tpu_xla"
    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        # Cache EVERY program, including micro-programs (jit-dispatched
        # slices/gathers around checkpoint snapshot fetches).  JAX's
        # default 1 s threshold measures its local compile time, which
        # misses the relay round trips that dominate on tunneled TPUs --
        # measured ~3 s per first-use micro-program there (round 4),
        # which poisons every fresh process's first fit block.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - unwritable FS: stay cold
        pass
