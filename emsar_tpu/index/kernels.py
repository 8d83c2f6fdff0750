"""Device kernels for index construction.

The hot operation is "sort N windows by their multi-word keys and find runs
of identical keys" — the TPU-native replacement for the reference's
strncmp quicksort + linear scan (reference src/emsar_functions.c:1108-1149,
1758-1819).  Implemented with ``jax.lax.sort`` (lexicographic multi-operand
sort) plus adjacent-difference run detection.

Inputs are padded to the next power of two with a leading pad-flag key
column so jit traces are reused across chunk sizes and padding rows sort
strictly after all real rows.

A NumPy implementation with identical semantics is kept for differential
testing and as a host fallback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


@functools.partial(jax.jit, static_argnames=("n_key_cols",))
def _sort_runs_jax(flag: jnp.ndarray, words: jnp.ndarray, aux: jnp.ndarray,
                   n_key_cols: int):
    """Lexicographic sort by (flag, words[:, :n_key_cols]); returns sorted
    words, sorted aux and run ids of identical keys (flag included)."""
    operands = (flag,) + tuple(words[:, w] for w in range(words.shape[1])) + tuple(
        aux[:, a] for a in range(aux.shape[1])
    )
    out = jax.lax.sort(operands, num_keys=1 + n_key_cols, is_stable=True)
    W = words.shape[1]
    sw = jnp.stack(out[1:1 + W], axis=1)
    sa = jnp.stack(out[1 + W:], axis=1) if aux.shape[1] else aux
    key = sw[:, :n_key_cols]
    diff = jnp.any(key[1:] != key[:-1], axis=1) | (out[0][1:] != out[0][:-1])
    run_id = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(diff.astype(jnp.int32))])
    return sw, sa, run_id


def sort_runs(words: np.ndarray, aux: np.ndarray, n_key_cols: int,
              backend: str = "jax") -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sort + run-detect.  ``words`` [N, W] uint32 keys (first ``n_key_cols``
    columns are the key; the rest are carried), ``aux`` [N, A] int32 payload.
    Returns (sorted_words, sorted_aux, run_id) as NumPy arrays, run ids
    0-based and increasing over runs of identical keys.
    """
    N = words.shape[0]
    if N == 0:
        return words, aux, np.zeros(0, dtype=np.int32)
    if backend == "jax":
        Np = _next_pow2(N)
        flag = np.zeros(Np, dtype=np.uint32)
        flag[N:] = 1
        wpad = np.zeros((Np, words.shape[1]), dtype=np.uint32)
        wpad[:N] = words
        apad = np.zeros((Np, aux.shape[1]), dtype=aux.dtype)
        apad[:N] = aux
        sw, sa, rid = _sort_runs_jax(jnp.asarray(flag), jnp.asarray(wpad),
                                     jnp.asarray(apad), n_key_cols)
        return (np.asarray(sw)[:N], np.asarray(sa)[:N],
                np.asarray(rid)[:N].astype(np.int32))
    # NumPy reference path
    order = np.lexsort(tuple(words[:, w] for w in range(n_key_cols - 1, -1, -1)))
    sw = words[order]
    sa = aux[order]
    key = sw[:, :n_key_cols]
    diff = np.any(key[1:] != key[:-1], axis=1)
    run_id = np.concatenate([np.zeros(1, np.int32),
                             np.cumsum(diff.astype(np.int32))]).astype(np.int32)
    return sw, sa, run_id


def run_lengths(run_id: np.ndarray) -> np.ndarray:
    """Lengths of each run given 0-based increasing run ids."""
    if run_id.shape[0] == 0:
        return np.zeros(0, dtype=np.int64)
    return np.bincount(run_id, minlength=int(run_id[-1]) + 1).astype(np.int64)
