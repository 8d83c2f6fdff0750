"""Shared CLI helpers."""

from __future__ import annotations

import os
import sys


def setup_jax(enable_x64: bool = True) -> None:
    """Initialize JAX.  On this container a TPU backend may be injected by
    sitecustomize; honor EMSAR_TPU_PLATFORM=cpu to force CPU."""
    import jax

    plat = os.environ.get("EMSAR_TPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    if enable_x64:
        jax.config.update("jax_enable_x64", True)
    # multi-host runs: jax.distributed must initialize before any backend
    # use (no-op without EMSAR_TPU_COORDINATOR)
    from ..parallel import dist
    dist.maybe_init_from_env()
    # persistent compile cache: kernel executables are reused across CLI
    # invocations (EMSAR_TPU_JIT_CACHE=\"\" disables)
    cache = os.environ.get(
        "EMSAR_TPU_JIT_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "emsar_tpu",
                     "jit_cache"))
    if cache:
        from ..utils import jitcache
        jitcache.enable(cache)


def die(msg: str) -> None:
    print(msg, file=sys.stderr)
    raise SystemExit(1)
