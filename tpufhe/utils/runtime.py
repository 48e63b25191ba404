"""Process-level JAX runtime knobs shared by CLI entry points.

On this stack the JAX_PLATFORMS env var alone does not stop an
already-registered platform plugin from initializing; the config update
after import is what actually selects the backend (see tests/conftest.py
and CLAUDE.md). CLIs call `configure()` before their first jax op.
"""

from __future__ import annotations

import os


def apply_env_platform() -> None:
    """Honor JAX_PLATFORMS (e.g. =cpu to run a CLI off-TPU)."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def enable_compile_cache() -> None:
    """Persistent compilation cache (fused pipelines are expensive)."""
    import jax

    cache_dir = os.path.expanduser("~/.cache/tpufhe_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def configure() -> None:
    apply_env_platform()
    enable_compile_cache()
