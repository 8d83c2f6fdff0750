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


def die(msg: str) -> None:
    print(msg, file=sys.stderr)
    raise SystemExit(1)
