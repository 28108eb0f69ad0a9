"""Persistent XLA compilation cache.

The fused engine programs (frontend+association+ingest; LM+marginals+sync)
are large; compiling them through a remote-compile TPU tunnel costs minutes.
The persistent cache makes that a once-per-machine cost instead of
once-per-process.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    d = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/semantic_slam_tpu/xla")
    )
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:
        pass  # older jax without the knobs: non-fatal
