"""Framework runtime configuration.

enable_compilation_cache() plays the role of the reference's
CachingOptimizingCompiler on-disk cache (nnet-optimize.h:242
--read-cache/--write-cache): jitted programs persist across processes,
which matters on TPU where cold compiles dominate CLI startup."""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(cache_dir: str = "") -> None:
    global _enabled
    if _enabled:
        return
    import jax
    cache_dir = cache_dir or os.environ.get(
        "KALDI_TPU_CACHE", os.path.expanduser("~/.cache/kaldi_tpu/xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
