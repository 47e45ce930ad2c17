"""Persistent XLA compile cache for every production entry point.

On this platform a cold compile of a full train step or a batched decode
graph is a multi-minute REMOTE compilation; without a persistent cache each
CLI invocation re-pays it (measured: 15 min to decode 4 utterances cold vs
seconds warm). bench.py always enabled the cache; the CLIs must too so the
shipped tools see the same steady-state performance the bench reports.

The reference has no analogue (torch eager pays no compile), so this is
TPU-native plumbing: jax persistent compilation cache keyed by HLO, shared
across processes, safe to enable unconditionally.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "~/.cache/parallelwavegan_tpu/xla"


def enable_persistent_compile_cache(cache_dir: str | None = None) -> str:
    """Idempotently point JAX at the on-disk compile cache.

    Honors $PARALLELWAVEGAN_TPU_CACHE_DIR; set it to an empty string to
    disable (e.g. for compile-time measurements).
    """
    import jax

    env = os.environ.get("PARALLELWAVEGAN_TPU_CACHE_DIR")
    if env == "":
        return ""
    path = os.path.expanduser(cache_dir or env or _DEFAULT_DIR)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    return path
