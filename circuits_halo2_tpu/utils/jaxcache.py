"""Persistent JAX compilation cache setup (explicit config — the env var
is not reliably honored across JAX versions)."""

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        ),
    )
    # keep per-platform subdirectories: entries produced by the remote
    # (axon) compile service fail to load on the local CPU and vice versa.
    try:
        platform = jax.default_backend()
    except Exception:
        platform = "unknown"
    cache_dir = os.path.join(cache_dir, platform)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
