"""Persistent JAX compilation cache setup (explicit config — the env var
is not reliably honored across JAX versions).

The CPU cache directory is keyed by a fingerprint of the host's CPU
features: XLA:CPU persists AOT-compiled machine code, and an entry
compiled on a machine with different ISA extensions fails its feature
check at load time (or worse, SIGILLs) — every graph then silently
recompiles while the loader spams feature-mismatch errors. Round 1's
driver multichip gate timed out exactly this way (MULTICHIP_r01.json
rc=124). A per-machine subdirectory makes a foreign cache invisible
instead of poisonous."""

import hashlib
import os


def _machine_tag() -> str:
    """Stable fingerprint of the host CPU's ISA feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.blake2b(
                        flags.encode(), digest_size=6
                    ).hexdigest()
    except OSError:
        pass
    return "generic"


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        ),
    )
    # Per-platform subdirectories: entries produced by the remote (axon)
    # compile service fail to load on the local CPU and vice versa. The
    # CPU dir is additionally keyed per-machine (see module docstring).
    try:
        platform = jax.default_backend()
    except Exception:
        platform = "unknown"
    if platform == "cpu":
        platform = f"cpu-{_machine_tag()}"
    cache_dir = os.path.join(cache_dir, platform)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
