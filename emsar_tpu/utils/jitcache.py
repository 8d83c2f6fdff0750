"""Persistent-compile-cache setup shared by the CLIs, bench, and tools.

On the remote-compile relay even a trivial kernel (an out-of-jit
``dynamic_slice``, a ``squeeze``) costs a multi-second round trip, but
XLA reports its *compile* time as near zero — below the persistent
cache's default 1 s write threshold — so those kernels were re-relayed
once per process forever.  Zeroing the write thresholds makes every
compiled executable persist, which removes ~30 s of per-process
cold-start on the PE build path (measured: rep0 53.9 s -> rep1 22.3 s
was mostly these never-cached trivial kernels, not the big ones).
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
