"""Cost decomposition of one PE expansion chunk at F1-400 shapes.

Times the PRODUCTION chunk kernels (_pe_expand_sort, _pe_chunk_accum,
_pe_single_chunk) on synthetic full-scale tables (Lp ~ 678 M rows, the
human-fixture size) at three shapes:

  A: nfl=11,  MV=1.5M  (the measured F290-300 human chunk: 3.11 s steady)
  B: nfl=300, MV=56K   (F1-400 at the current 16.7M-candidate budget)
  C: nfl=300, MV=224K  (F1-400 at a 4x budget)

plus isolated probes: the [MV, nfl] row-contiguous rank gather with
position-SORTED vs SHUFFLED member positions (locality), the flat E
gather, and the 3-operand sort.  Answers where the 3.11 s goes and what
the F1-400 per-candidate rate will be.
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

from emsar_tpu.index import device_build as db  # noqa: E402

LP = 678_000_000
RL = 101
D0 = 0          # fl_min = rl -> d0 = 0 (F1-400); F290-300 uses d0=189
NTID = 167_490
SEQLEN = LP - 8
BORDER = LP // 2


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return np.asarray(leaves[0].ravel()[:1])


rng = np.random.default_rng(0)
ready = jnp.zeros(8, jnp.int32)
sync(ready)
t0 = time.perf_counter()
for _ in range(10):
    sync(ready)
RTT = (time.perf_counter() - t0) / 10
print(f"RTT: {RTT*1e3:.1f} ms", flush=True)


def timeit(name, fn, *args, reps=3, n=1, **kw):
    t0 = time.perf_counter()
    sync(fn(*args, **kw))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
        sync(out)
    dt = (time.perf_counter() - t0) / reps - RTT
    print(f"{name}: {dt*1e3:.1f} ms ({n/max(dt,1e-9)/1e6:.1f} M/s) "
          f"[first {tc:.1f}s]", flush=True)
    return dt


print("building tables...", flush=True)


@jax.jit
def _dev_tables():
    # device-side pseudo-random tables (h2d of 5.4 GB over the tunnel
    # would cost ~4 min; a hashed iota is free)
    i = jax.lax.iota(jnp.uint32, LP)
    h = i * jnp.uint32(0x9E3779B1)
    h ^= h >> jnp.uint32(13)
    h *= jnp.uint32(0x85EBCA6B)
    rw = (h ^ (h >> jnp.uint32(11))) & jnp.uint32((1 << 28) - 1)
    t32 = (h % jnp.uint32(NTID)).astype(jnp.int32)
    return rw, t32


RW, T32 = _dev_tables()
# next-separator table: always far away (validity guards pass)
NS = (jnp.arange(LP, dtype=jnp.int32) + 20_000)
RF32 = jnp.zeros(8, jnp.int32)  # stranded: never read
sync(NS)
print("tables up", flush=True)


def make_m1(MV, V, avg_cluster=3, sort_pos=False, seed=1):
    r = np.random.default_rng(seed)
    ncl = MV // avg_cluster
    sizes = r.integers(2, 2 * avg_cluster, ncl)
    cl = np.repeat(np.arange(ncl, dtype=np.int32), sizes)[:MV]
    if len(cl) < MV:
        cl = np.concatenate([cl, np.arange(len(cl), MV, dtype=np.int32)])
    rank = np.sort(cl).astype(np.int32)
    pos = r.integers(0, LP - 25_000, MV, dtype=np.int32)
    if sort_pos:
        # position-sorted WITHIN the stream (locality probe; breaks the
        # rank-run grouping so only use for gather timing)
        pos = np.sort(pos)
    m1pos = np.concatenate([[0], pos, np.zeros(MV + 1, np.int32)])
    m1rank = np.concatenate([[-1], rank,
                             np.full(MV + 1, db.BIG_RANK, np.int32)])
    return jnp.asarray(m1pos.astype(np.int32)), jnp.asarray(
        m1rank.astype(np.int32))


def run_expand(MV, V, nfl, label, sort_pos=False):
    M = MV - V
    E = MV * nfl
    m1pos, m1rank = make_m1(MV, V, sort_pos=sort_pos)
    sync(m1pos)

    def call():
        return db._pe_expand_sort(
            RW, RF32, T32, NS, m1pos, m1rank, jnp.int32(1), jnp.int32(D0),
            M=M, V=V, nfl=nfl, max_repeat=100, unstranded=False,
            borderpos=BORDER, seqlength=SEQLEN, readlength=RL, Lp=LP)

    dt = timeit(f"expand {label} E={E/1e6:.1f}M"
                f"{' sortedpos' if sort_pos else ''}", call, n=E)
    return call(), E, dt


def synth_sorted_stream(E, rec_frac=0.28, avg_run=2.7, seed=2):
    """Synthetic sorted (ckey, rkey, payload) stream at the measured
    F290-300 run-density (28% of rows start records, 74% of rows inside
    multi runs)."""
    r = np.random.default_rng(seed)
    # run lengths: mix of 1s and geometric-ish multi runs
    n_multi = int(E * 0.74 / avg_run)
    lm = r.integers(2, 5, n_multi)
    n_single = E - int(lm.sum())
    lens = np.concatenate([np.ones(max(n_single, 0), np.int64), lm])
    r.shuffle(lens)
    run_id = np.repeat(np.arange(len(lens)), lens)[:E]
    sck = (run_id >> 10).astype(np.uint32)
    srk = (run_id & 1023).astype(np.uint32)
    d = r.integers(0, 300, len(lens))
    spay = ((r.integers(0, NTID, E).astype(np.uint32) << 9)
            | d[run_id].astype(np.uint32))
    return (jnp.asarray(sck), jnp.asarray(srk), jnp.asarray(spay))


def run_accum(E, nfl, label):
    sck, srk, spay = synth_sorted_stream(E)
    sync(spay)
    U = db._next_pow2(int(E * 0.30))
    caps = db._caps_partitioned(E * 200)
    state = db._init_state(NTID, nfl, caps)
    sync(state["dense"])

    def call(st):
        return db._pe_chunk_accum(st, sck, srk, spay, jnp.int32(0),
                                  jnp.int32(0), nfl=nfl, max_repeat=100,
                                  U=U)

    # accum donates state; rebuild per rep (cost excluded by timing the
    # inner only via pre-created states)
    states = [db._init_state(NTID, nfl, caps) for _ in range(4)]
    sync(states[-1]["dense"])
    t0 = time.perf_counter()
    out = call(states[0])
    sync(out[0]["dense"])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for st in states[1:]:
        out = call(st)
        sync(out[0]["dense"])
    dt = (time.perf_counter() - t0) / 3 - RTT
    print(f"accum {label} E={E/1e6:.1f}M U={U/1e6:.1f}M: {dt*1e3:.1f} ms "
          f"({E/max(dt,1e-9)/1e6:.1f} M/s) [first {tc:.1f}s]", flush=True)
    return dt


def run_single(Ss, nfl, label, sort_pos=False):
    r = np.random.default_rng(3)
    pos = r.integers(0, LP - 25_000, Ss, dtype=np.int32)
    if sort_pos:
        pos = np.sort(pos)
    SPs = jnp.asarray(np.concatenate([pos, np.full(Ss, -1, np.int32)]))
    RKs = jnp.asarray(
        np.concatenate([np.arange(Ss, dtype=np.int32),
                        np.full(Ss, db.BIG_RANK, np.int32)]))
    E = Ss * nfl
    sync(SPs)

    def call(dense):
        return db._pe_single_chunk(
            dense, SPs, RKs, RW, RF32, T32, NS, jnp.int32(0), jnp.int32(D0),
            Ss=Ss, nfl=nfl, unstranded=False, borderpos=BORDER,
            seqlength=SEQLEN, readlength=RL, Lp=LP)

    denses = [jnp.zeros(NTID * nfl, jnp.int32) for _ in range(4)]
    sync(denses[-1])
    t0 = time.perf_counter()
    sync(call(denses[0]))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for d_ in denses[1:]:
        sync(call(d_))
    dt = (time.perf_counter() - t0) / 3 - RTT
    print(f"single {label} E={E/1e6:.1f}M"
          f"{' sortedpos' if sort_pos else ''}: {dt*1e3:.1f} ms "
          f"({E/max(dt,1e-9)/1e6:.1f} M/s) [first {tc:.1f}s]", flush=True)


# ---- isolated gather probes -------------------------------------------
def probe_gather(MV, nfl, label, sort_pos):
    r = np.random.default_rng(4)
    base = r.integers(0, LP - 1000, MV, dtype=np.int32)
    if sort_pos:
        base = np.sort(base)
    base = jnp.asarray(base)
    dd = jnp.arange(nfl, dtype=jnp.int32)
    sync(base)

    @jax.jit
    def g(RW, base):
        return RW[base[:, None] + dd[None, :]]

    timeit(f"gather2d {label} [{MV},{nfl}]"
           f"{' sorted' if sort_pos else ' shuffled'}", g, RW, base,
           n=MV * nfl)


which = sys.argv[1:] or ["gather", "A", "B", "C", "single", "accum"]

if "gather" in which:
    probe_gather(1_526_784, 11, "A", False)
    probe_gather(1_526_784, 11, "A", True)
    probe_gather(55_924, 300, "B", False)
    probe_gather(55_924, 300, "B", True)
    probe_gather(223_696, 300, "C", True)

if "A" in which:
    run_expand(1_526_784, 16, 11, "A(nfl=11)")
    run_expand(1_526_784, 16, 11, "A(nfl=11)", sort_pos=True)
if "B" in which:
    run_expand(55_924, 16, 300, "B(nfl=300)")
    run_expand(55_924, 16, 300, "B(nfl=300)", sort_pos=True)
if "C" in which:
    run_expand(223_696, 16, 300, "C(nfl=300,4x)", sort_pos=True)

if "single" in which:
    run_single(1_526_784, 11, "A(nfl=11)")
    run_single(55_924, 300, "B(nfl=300)")
    run_single(55_924, 300, "B(nfl=300)", sort_pos=True)

if "accum" in which:
    run_accum(16_777_216 // 11 * 11, 11, "A(nfl=11)")
    run_accum(55_924 * 300, 300, "B(nfl=300)")

print("done", flush=True)
