"""Persistent-compile-cache setup shared by the CLIs, bench, and tools.

On the remote-compile relay even a trivial kernel (an out-of-jit
``dynamic_slice``, a ``squeeze``) costs a multi-second round trip, but
XLA reports its *compile* time as near zero — below the persistent
cache's default 1 s write threshold — so those kernels were re-relayed
once per process forever.  Zeroing the write thresholds makes every
compiled executable persist, which removes ~10 s of per-process
cold-start on the PE build path (BASELINE_MEASURED.md round-3: of the
measured ~31 s rep0-vs-rep1 gap, ~10 s was these never-cached trivial
kernels; the remaining ~14 s is retracing + relay session setup, which
no cache knob addresses).
"""

from __future__ import annotations

import os


def enable(cache_dir: str) -> None:
    """Point JAX's persistent compilation cache at ``cache_dir`` and make
    it keep everything, however cheap XLA claims the compile was."""
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except OSError:
        return
    for flag, val in (("jax_persistent_cache_min_compile_time_secs", 0.0),
                      ("jax_persistent_cache_min_entry_size_bytes", -1)):
        try:
            jax.config.update(flag, val)
        except Exception:  # older jaxlib without the knob
            pass
