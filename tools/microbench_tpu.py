"""One-off TPU microbenchmarks that size the PE-build redesign.

The axon tunnel's block_until_ready does not synchronize, so every timing
forces a 1-element d2h fetch; the fetch round-trip is measured separately
and subtracted.
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from emsar_tpu.utils import jitcache
jitcache.enable(os.path.join(REPO, "bench_cache", "jit_cache"))

N = 1 << 24  # 16M


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[:1])


rng = np.random.default_rng(0)
ready = jnp.zeros(8, jnp.int32)
sync(ready)
t0 = time.perf_counter()
for _ in range(10):
    sync(ready)
RTT = (time.perf_counter() - t0) / 10
print(f"RTT (1-elem fetch): {RTT*1e3:.1f} ms", flush=True)


def timeit(name, fn, *args, reps=3, n=N):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        sync(out)
    dt = (time.perf_counter() - t0) / reps - RTT
    print(f"{name}: {dt*1e3:.1f} ms  ({n/max(dt,1e-9)/1e6:.1f} M elems/s)",
          flush=True)


keys1 = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint32))
keys2 = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint32))
keys3 = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint32))
idx32 = jnp.asarray(np.arange(N, dtype=np.int32))


@jax.jit
def sort3(a, b, c):
    return jax.lax.sort((a, b, c), num_keys=2, is_stable=True)


timeit("sort3 16M (2keys+payload)", sort3, keys1, keys2, idx32)


@jax.jit
def sort6(a, b, c, d, e, f):
    return jax.lax.sort((a, b, c, d, e, f), num_keys=5, is_stable=True)


timeit("sort6 16M (5keys+payload)", sort6, keys1, keys2, keys3, keys1,
       keys2, idx32)

rk = keys1.reshape(-1, 64)
rp = idx32.reshape(-1, 64)


@jax.jit
def rowsort64(a, b):
    return jax.lax.sort((a, b), dimension=1, num_keys=1, is_stable=True)


timeit("rowsort 16M as [256Ki,64]", rowsort64, rk, rp)

rk2 = keys1.reshape(-1, 512)
rp2 = idx32.reshape(-1, 512)


@jax.jit
def rowsort512(a, b):
    return jax.lax.sort((a, b), dimension=1, num_keys=1, is_stable=True)


timeit("rowsort 16M as [32Ki,512]", rowsort512, rk2, rp2)

K = 600_000
tgt = jnp.zeros(K, jnp.int32)
sidx = jnp.asarray(rng.integers(0, K, N, dtype=np.int32))


@jax.jit
def scat(t, i):
    return t.at[i].add(1)


timeit("scatter-add 16M -> 600k", scat, tgt, sidx)

perm = jnp.asarray(rng.permutation(N).astype(np.int32))
vals = jnp.asarray(rng.integers(0, 2, N, dtype=np.int8))


@jax.jit
def unsort(p, v):
    return jnp.zeros(N, jnp.int8).at[p].set(v, unique_indices=True)


timeit("perm-scatter 16M int8", unsort, perm, vals)

table = jnp.asarray(rng.integers(0, 1 << 31, 30_000_000, dtype=np.int32))
gidx = jnp.asarray(rng.integers(0, 30_000_000, N, dtype=np.int32))


@jax.jit
def gath(t, i):
    return t[i]


timeit("gather 16M from 30M table", gath, table, gidx)

# h2d bandwidth
host64 = rng.integers(0, 1 << 31, N, dtype=np.int32)  # 64MB
t0 = time.perf_counter()
d = jnp.asarray(host64)
sync(d)
dt = time.perf_counter() - t0 - RTT
print(f"h2d 64MB: {dt*1e3:.1f} ms ({64/dt:.0f} MB/s)", flush=True)

# d2h again (steady state)
for sz_mb, arr in ((16, jnp.asarray(rng.integers(0, 255, N, dtype=np.uint8))),
                   (64, jnp.asarray(host64))):
    sync(arr)
    t0 = time.perf_counter()
    _ = np.asarray(arr)
    dt = time.perf_counter() - t0
    print(f"d2h {sz_mb}MB: {dt*1e3:.1f} ms ({sz_mb/dt:.0f} MB/s)", flush=True)

print("done", flush=True)
