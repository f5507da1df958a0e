import os

from cpfn_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint, latest_step
from cpfn_tpu.utils.logging import MetricsLogger
from cpfn_tpu.utils.profiling import PhaseTimer, maybe_profile


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache: restarts of long jobs (and retries
    after backend loss) skip the multi-minute recompile. Call early in
    drivers, before the first jit execution."""
    import jax

    # Default inside the repo: the repo working tree persists across driver
    # rounds/sessions while $HOME caches may not, so a bench or eval run in a
    # fresh session reuses executables compiled in earlier ones.
    default_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ".xla_cache",
    )
    base = path or os.environ.get("CPFN_COMPILATION_CACHE", default_dir)
    try:
        backend = jax.default_backend()
        if backend not in ("tpu", "axon"):
            return  # CPU AOT reload is unreliable in this image; TPU-only
        path = os.path.join(base, backend)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax or unsupported backend: harmless

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
    "MetricsLogger",
    "PhaseTimer",
    "maybe_profile",
]
