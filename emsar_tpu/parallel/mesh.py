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
    """Edge arrays padded to a multiple of the tp axis; reads [S, C]."""

    n_transcripts: int
    n_segments: int
    edge_cid: jax.Array  # int32 [Ep] sharded P('tp')
    edge_tid: jax.Array
    edge_mult: jax.Array
    eumaps: jax.Array  # [C] replicated
    reads: jax.Array  # [S, C] sharded P('dp', None)
    denom: jax.Array  # [T] replicated
    mesh: Mesh


def shard_problem(problem: SolverProblem, reads_per_sample: np.ndarray,
                  mesh: Mesh, dtype=np.float32) -> ShardedProblem:
    """Pad + device_put the edge arrays and per-sample read counts.

    ``reads_per_sample``: [S, C_active] float array (one row per sample).
    Padding edges carry mult=0 so they contribute nothing.
    """
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

    reads = np.zeros((Sp, reads_per_sample.shape[1]), dtype=dtype)
    reads[:S] = reads_per_sample

    e_sh = NamedSharding(mesh, P("tp"))
    r_sh = NamedSharding(mesh, P("dp", None))
    rep = NamedSharding(mesh, P())
    return ShardedProblem(
        n_transcripts=problem.n_transcripts,
        n_segments=len(problem.eumaps),
        edge_cid=jax.device_put(pad_e(problem.edge_cid), e_sh),
        edge_tid=jax.device_put(pad_e(problem.edge_tid), e_sh),
        edge_mult=jax.device_put(pad_e(problem.edge_mult.astype(dtype)), e_sh),
        eumaps=jax.device_put(problem.eumaps.astype(dtype), rep),
        reads=jax.device_put(reads, r_sh),
        denom=jax.device_put(problem.denom.astype(dtype), rep),
        mesh=mesh)


def _em_block_local(edge_cid, edge_tid, edge_mult, eumaps, reads, inv_denom,
                    theta, n_transcripts, n_segments, block_iters):
    """One block of EM iterations on local shards; psums over 'tp'.

    reads/theta: [S_local, C] / [S_local, T]; edges: local [E_local].
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
        return th * num * inv_denom[None, :]

    def ll_per_sample(th):
        s = seg_c(edge_mult[None, :] * th[:, edge_tid])
        lam = eumaps[None, :] * s
        safe = jnp.where(lam > 0, lam, 1.0)
        return jnp.sum(jnp.where(lam > 0, reads * jnp.log(safe) - lam,
                                 jnp.where(reads > 0, -1e30, 0.0)), axis=1)

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
        cand = jnp.maximum(th - 2.0 * alpha * r + (alpha * alpha) * v, 0.0)
        cand = em_iter(cand)
        better = (ll_per_sample(cand) >= ll_per_sample(t2))[:, None]
        return jnp.where(better, cand, t2)

    theta = jax.lax.fori_loop(0, block_iters,
                              lambda _, th: squarem_cycle(th), theta)
    ll = jnp.sum(ll_per_sample(theta))
    ll = jax.lax.psum(ll, "dp")  # dp shards hold disjoint samples
    return theta, ll


def solve_sharded(sp: ShardedProblem, epsilon: float = 1e-6,
                  max_blocks: int = 4096, block_iters: int = 32
                  ) -> Tuple[np.ndarray, float, int]:
    """Full sharded EM solve: jitted while_loop of psum-merged blocks.

    Returns (theta [S, T], logL, n_blocks).
    """
    mesh = sp.mesh
    S = sp.reads.shape[0]
    dtype = sp.reads.dtype
    theta0 = jnp.broadcast_to(
        jnp.where(sp.denom > 0, jnp.asarray(1.0, dtype), 0.0)[None, :],
        (S, sp.n_transcripts))
    theta0 = jax.device_put(theta0, NamedSharding(mesh, P("dp", None)))
    inv_denom = jnp.where(sp.denom > 0, 1.0 / jnp.where(sp.denom > 0,
                                                        sp.denom, 1.0), 0.0)

    n_t, n_s = sp.n_transcripts, sp.n_segments

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("tp"), P("tp"), P("tp"), P(), P("dp", None), P(),
                  P("dp", None)),
        out_specs=(P("dp", None), P(), P()),
        check_vma=False)
    def run(edge_cid, edge_tid, edge_mult, eumaps, reads, inv_den, th0):
        def block(state):
            th, ll, it, _ = state
            th_new, ll_new = _em_block_local(
                edge_cid, edge_tid, edge_mult, eumaps, reads, inv_den, th,
                n_t, n_s, block_iters)
            return th_new, ll_new, it + 1, ll_new - ll

        def cond(state):
            _, _, it, gain = state
            return (gain >= epsilon) & (it < max_blocks)

        th, ll = _em_block_local(edge_cid, edge_tid, edge_mult, eumaps,
                                 reads, inv_den, th0, n_t, n_s, block_iters)
        state = (th, ll, jnp.zeros((), jnp.int32),
                 jnp.asarray(jnp.inf, th.dtype))
        th, ll, it, _ = jax.lax.while_loop(cond, block, state)
        return th, ll[None], it[None]

    theta, ll, it = jax.jit(run)(sp.edge_cid, sp.edge_tid, sp.edge_mult,
                                 sp.eumaps, sp.reads, inv_denom, theta0)
    return np.asarray(theta), float(np.asarray(ll)[0]), int(np.asarray(it)[0])
