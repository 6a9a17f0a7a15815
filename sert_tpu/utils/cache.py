"""Persistent XLA compilation cache wiring.

Every CLI invocation of this framework jit-compiles the same handful of
programs (train step, scoring engine, eval helpers); on the remote-compile
TPU platform those compiles cost 20-270 s at the 1M-entity scale — per
PROCESS, since jit caches die with the interpreter. JAX's persistent
compilation cache survives processes, and it is measured working through
the remote-compile tunnel (fresh-process recompile of a cached program:
0.01 s vs 1.2 s for a toy matmul; the stress-scale train step saves its
full compile — benchmarks/NOTES.md round 4).

The CLI enables it by default (``main`` calls
:func:`enable_compilation_cache`); library users call it explicitly.
Opt out with ``SERT_NO_COMPILE_CACHE=1``. An existing
``JAX_COMPILATION_CACHE_DIR`` (or an already-configured
``jax_compilation_cache_dir``) is respected, never overridden.
"""

from __future__ import annotations

import os
from typing import Optional

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "sert_tpu",
                           "jax_cache")


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``~/.cache/sert_tpu/jax_cache``). Returns the directory in effect, or
    None when disabled/unavailable. Safe to call repeatedly and before or
    after backend initialization (the cache is consulted per compile).
    JAX's own entry thresholds (min compile time) stay at their defaults,
    so trivial programs are not cached."""
    if os.environ.get("SERT_NO_COMPILE_CACHE"):
        return None
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except (OSError, AttributeError):  # read-only home / exotic jax build
        return None
    return path
