"""Persistent XLA compilation cache for the CLIs.

Each CLI invocation is a fresh process, so JAX's in-memory jit cache never
helps across runs: transcribing a second file re-pays the full trace+compile
(minutes on a tunnel-attached TPU).  Enabling the persistent cache writes
compiled executables to disk keyed on (HLO, compiler version, platform);
together with the CLIs' power-of-two length bucketing this makes repeat
invocations start in seconds.

The reference had no equivalent concern (TF's graph cache lived and died
with the process too) — this is TPU-serving hygiene.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (idempotent, best-effort)."""
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # already configured (user env wins)
    cache_dir = cache_dir or os.environ.get(
        "RNNT_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "rnnt_tpu", "xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took noticeable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never fail the CLI over it
