"""SPMD distribution layer: sharded multi-sample EM over a device mesh.

The reference has no distribution story at all (single process + pthreads,
SURVEY §2 C23); this layer is new TPU-first design:

* mesh axes: ``dp`` (samples — data parallel) x ``tp`` (likelihood edges —
  model parallel);
* the signature->transcript edge list is sharded over ``tp``; per-sample
  read counts are sharded over ``dp``; theta is replicated within ``tp``;
* each EM iteration computes partial segment-sums over the local edge
  shard and merges them with ``jax.lax.psum`` over ``tp`` — sufficient
  statistics ride the ICI, matching the north-star design
  (BASELINE.json: "per-shard sufficient statistics merged each EM
  iteration via jax.lax.psum").

Multi-sample batching (-M) vmaps the same update over the sample axis,
turning the solve into dense [S, …] work that feeds the MXU.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..model.solver import SolverProblem


def make_mesh(n_devices: Optional[int] = None, dp: int = 1,
              devices=None) -> Mesh:
    """1-D or 2-D mesh (dp, tp) over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if n_devices % dp != 0:
        raise ValueError(f"n_devices {n_devices} not divisible by dp {dp}")
    tp = n_devices // dp
    return Mesh(devices.reshape(dp, tp), ("dp", "tp"))


@dataclasses.dataclass
class ShardedProblem:
    """Edge arrays padded to a multiple of the tp axis; reads [S, C].

    ``eumaps`` / ``denom`` may be per-sample ([S, C] / [S, T], sharded like
    reads) — multisample batches have per-sample fragment-length weights —
    or shared ([C] / [T], replicated)."""

    n_transcripts: int
    n_segments: int
    edge_cid: jax.Array  # int32 [Ep] sharded P('tp')
    edge_tid: jax.Array
    edge_mult: jax.Array
    eumaps: jax.Array  # [S, C] sharded P('dp', None) (or [C] replicated)
    reads: jax.Array  # [S, C] sharded P('dp', None)
    denom: jax.Array  # [S, T] sharded P('dp', None) (or [T] replicated)
    mesh: Mesh


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for multi-host runs (no-op when already
    initialized or single-host).  Per-host alignment shards then feed the
    same sharded solve; cross-host merges ride the same psum collectives
    over DCN."""
    import jax

    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized


def shard_problem(problem: SolverProblem, reads_per_sample: np.ndarray,
                  mesh: Mesh, dtype=np.float32,
                  shard_by: str = "edges",
                  eumaps_per_sample: Optional[np.ndarray] = None,
                  denom_per_sample: Optional[np.ndarray] = None
                  ) -> ShardedProblem:
    """Pad + device_put the edge arrays and per-sample read counts.

    ``reads_per_sample``: [S, C_active] float array (one row per sample).
    Padding edges carry mult=0 so they contribute nothing.

    ``eumaps_per_sample`` / ``denom_per_sample``: optional [S, C] / [S, T]
    per-sample EUMAps and denominators (multisample batches weight EUMA by
    per-sample fragment-length distributions); defaults to the shared
    values in ``problem``.

    ``shard_by``: 'edges' (arbitrary balanced split) or 'transcript'
    (edges regrouped by tid so each tp shard owns contiguous transcript
    blocks — the transcript-sharded index layout for very large
    transcriptomes; identical results, different locality).
    """
    if shard_by == "transcript":
        order = np.argsort(problem.edge_tid, kind="stable")
        problem = SolverProblem(
            n_transcripts=problem.n_transcripts,
            edge_cid=problem.edge_cid[order],
            edge_tid=problem.edge_tid[order],
            edge_mult=problem.edge_mult[order],
            eumaps=problem.eumaps, reads=problem.reads, denom=problem.denom)
    elif shard_by != "edges":
        raise ValueError(f"unknown shard_by {shard_by!r}")
    tp = mesh.shape["tp"]
    dp = mesh.shape["dp"]
    E = len(problem.edge_cid)
    Ep = -(-E // tp) * tp
    S = reads_per_sample.shape[0]
    Sp = -(-S // dp) * dp

    def pad_e(a, fill=0):
        out = np.full(Ep, fill, dtype=a.dtype)
        out[:E] = a
        return out

    def pad_s(rows, ncol):
        out = np.zeros((Sp, ncol), dtype=dtype)
        out[:S] = rows
        return out

    reads = pad_s(reads_per_sample, reads_per_sample.shape[1])
    if eumaps_per_sample is None:
        eumaps_per_sample = np.broadcast_to(problem.eumaps,
                                            (S, len(problem.eumaps)))
    if denom_per_sample is None:
        denom_per_sample = np.broadcast_to(problem.denom,
                                           (S, problem.n_transcripts))
    eumaps = pad_s(eumaps_per_sample, len(problem.eumaps))
    denom = pad_s(denom_per_sample, problem.n_transcripts)

    e_sh = NamedSharding(mesh, P("tp"))
    r_sh = NamedSharding(mesh, P("dp", None))
    return ShardedProblem(
        n_transcripts=problem.n_transcripts,
        n_segments=len(problem.eumaps),
        edge_cid=jax.device_put(pad_e(problem.edge_cid), e_sh),
        edge_tid=jax.device_put(pad_e(problem.edge_tid), e_sh),
        edge_mult=jax.device_put(pad_e(problem.edge_mult.astype(dtype)), e_sh),
        eumaps=jax.device_put(eumaps, r_sh),
        reads=jax.device_put(reads, r_sh),
        denom=jax.device_put(denom, r_sh),
        mesh=mesh)


def _em_block_local(edge_cid, edge_tid, edge_mult, eumaps, reads, inv_denom,
                    theta, n_transcripts, n_segments, block_iters):
    """One block of EM iterations on local shards; psums over 'tp'.

    reads/eumaps/theta/inv_denom: [S_local, C] / [S_local, C] /
    [S_local, T] / [S_local, T]; edges: local [E_local].
    """

    def seg_c(vals_sxe):
        part = jax.vmap(lambda v: jax.ops.segment_sum(
            v, edge_cid, num_segments=n_segments))(vals_sxe)
        return jax.lax.psum(part, "tp")

    def seg_t(vals_sxe):
        part = jax.vmap(lambda v: jax.ops.segment_sum(
            v, edge_tid, num_segments=n_transcripts))(vals_sxe)
        return jax.lax.psum(part, "tp")

    def em_iter(th):
        s = seg_c(edge_mult[None, :] * th[:, edge_tid])  # [S, C]
        ratio = jnp.where(s > 0, reads / jnp.where(s > 0, s, 1.0), 0.0)
        num = seg_t(edge_mult[None, :] * ratio[:, edge_cid])  # [S, T]
        return th * num * inv_denom

    def intensities(th):
        return seg_c(edge_mult[None, :] * th[:, edge_tid])  # [S, C]

    def ll_of(s):
        lam = eumaps * s
        safe = jnp.where(lam > 0, lam, 1.0)
        return jnp.sum(jnp.where(lam > 0, reads * jnp.log(safe) - lam,
                                 jnp.where(reads > 0, -1e30, 0.0)), axis=1)

    def gain_of(s_old, s_new):
        """Per-sample logL delta from intensity deltas (float32-accurate;
        see model/solver.py)."""
        both = (s_old > 0) & (s_new > 0)
        safe_old = jnp.where(both, s_old, 1.0)
        ratio = jnp.log1p(jnp.where(both, (s_new - s_old) / safe_old, 0.0))
        died = (s_old > 0) & (s_new <= 0) & (reads > 0)
        born = (s_old <= 0) & (s_new > 0) & (reads > 0)
        term = jnp.where(both, reads * ratio,
                         jnp.where(died, -1e30,
                                   jnp.where(born, 1e30, 0.0)))
        return jnp.sum(term - eumaps * (s_new - s_old), axis=1)

    def squarem_cycle(th):
        # per-sample SQUAREM extrapolation (see model/solver.py); the
        # steplength and the likelihood safeguard are per dp-local sample
        t1 = em_iter(th)
        t2 = em_iter(t1)
        r = t1 - th
        v = t2 - t1 - r
        rn = jnp.sqrt(jnp.sum(r * r, axis=1, keepdims=True))
        vn = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
        alpha = jnp.where(vn > 0, -rn / jnp.where(vn > 0, vn, 1.0), -1.0)
        alpha = jnp.minimum(alpha, -1.0)
        # zero-crossing coordinates fall back to the plain double-EM value
        # (exact 0 is absorbing for multiplicative EM)
        extrap = th - 2.0 * alpha * r + (alpha * alpha) * v
        cand = em_iter(jnp.where(extrap > 0, extrap, t2))
        better = (gain_of(intensities(t2), intensities(cand)) >= 0)[:, None]
        return jnp.where(better, cand, t2)

    theta = jax.lax.fori_loop(0, block_iters,
                              lambda _, th: squarem_cycle(th), theta)
    s_new = intensities(theta)
    return theta, s_new, ll_of(s_new), gain_of


def solve_sharded(sp: ShardedProblem, epsilon: float = 1e-6,
                  max_blocks: int = 4096, block_iters: int = 32
                  ) -> Tuple[np.ndarray, float, int]:
    """Full sharded EM solve: jitted while_loop of psum-merged blocks.

    Returns (theta [S, T], logL, n_blocks).
    """
    mesh = sp.mesh
    S = sp.reads.shape[0]
    dtype = sp.reads.dtype
    theta0 = jnp.where(sp.denom > 0, jnp.asarray(1.0, dtype), 0.0)
    theta0 = jax.device_put(theta0, NamedSharding(mesh, P("dp", None)))
    inv_denom = jnp.where(sp.denom > 0, 1.0 / jnp.where(sp.denom > 0,
                                                        sp.denom, 1.0), 0.0)

    n_t, n_s = sp.n_transcripts, sp.n_segments

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("tp"), P("tp"), P("tp"), P("dp", None), P("dp", None),
                  P("dp", None), P("dp", None)),
        out_specs=(P("dp", None), P(), P()),
        check_vma=False)
    def run(edge_cid, edge_tid, edge_mult, eumaps, reads, inv_den, th0):
        def step(th):
            return _em_block_local(edge_cid, edge_tid, edge_mult, eumaps,
                                   reads, inv_den, th, n_t, n_s, block_iters)

        def block(state):
            th, s_prev, _, it, _ = state
            th_new, s_new, ll_new, gain_of = step(th)
            gain = jax.lax.psum(jnp.sum(gain_of(s_prev, s_new)), "dp")
            return th_new, s_new, ll_new, it + 1, gain

        def cond(state):
            _, _, _, it, gain = state
            return (gain >= epsilon) & (it < max_blocks)

        th, s, ll, _ = step(th0)
        state = (th, s, ll, jnp.zeros((), jnp.int32),
                 jnp.asarray(jnp.inf, th.dtype))
        th, _, ll, it, _ = jax.lax.while_loop(cond, block, state)
        ll_tot = jax.lax.psum(jnp.sum(ll), "dp")
        return th, ll_tot[None], it[None]

    theta, ll, it = jax.jit(run)(sp.edge_cid, sp.edge_tid, sp.edge_mult,
                                 sp.eumaps, sp.reads, inv_denom, theta0)
    return np.asarray(theta), float(np.asarray(ll)[0]), int(np.asarray(it)[0])
