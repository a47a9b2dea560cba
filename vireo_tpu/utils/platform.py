"""JAX platform / compile-cache selection shared by every entry point.

Site configs may pin a default platform (e.g. a remote-TPU plugin) by
importing jax at interpreter start, which makes JAX_PLATFORMS set later
a no-op. ``jax.config.update`` still works post-import, so entry points
route backend choice through the VIREO_PLATFORM env var instead:

    VIREO_PLATFORM=cpu vireo -c ... -o ...     # force host CPU
    VIREO_PLATFORM=axon python bench.py        # force the TPU plugin

VIREO_COMPILE_CACHE=<dir> additionally enables JAX's persistent
compilation cache (first TPU compiles can take minutes through a
remote-compile service; cached binaries load in ~1s).
"""

import os

__all__ = ["apply_platform_env"]


def default_compile_cache():
    """Per-user persistent compile-cache directory (the CLI default:
    accelerator compiles can cost minutes through a remote-compile
    service, and a 100k-cell warm-restart program recompiled per run
    dominated end-to-end wall clock). VIREO_COMPILE_CACHE overrides;
    VIREO_COMPILE_CACHE="" disables."""
    return os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "vireo_tpu", "jax_cache")


def apply_platform_env(default_cache=False):
    """Apply VIREO_PLATFORM / VIREO_COMPILE_CACHE if set. Call before
    the first computation (config updates are ignored by any backend
    that is already initialized). `default_cache=True` (the CLIs)
    enables the per-user persistent cache when the env var is unset."""
    plat = os.environ.get("VIREO_PLATFORM")
    cache_dir = os.environ.get("VIREO_COMPILE_CACHE")
    if cache_dir is None and default_cache:
        cache_dir = default_compile_cache()
    if not (plat or cache_dir):
        return
    import jax
    if plat:
        jax.config.update("jax_platforms", plat)
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
