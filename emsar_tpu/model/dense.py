"""Dense-batched module solver: the MXU path.

Most sequence-sharing modules are small (a gene family: tens of segments x
a handful of isoforms).  Instead of the global CSR edge list, modules are
bucketed into padded size classes and solved as batched dense EM:

    s     = einsum('bct,bt->bc', M, theta)          (segment intensities)
    num   = einsum('bct,bc->bt', M, R / s)
    theta = theta * num / denom

which XLA maps onto the MXU, replacing the CSR path's gather/scatter.
Oversized modules fall back to the CSR solver (model/solver.py).

A Pallas kernel (``use_pallas=True``) runs a whole block of EM iterations
with the module batch resident in VMEM — zero HBM traffic between
iterations — with the same semantics.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .modules import ModuleDecomposition, SegmentGraph

# (max segments, max transcripts) per class; larger modules -> CSR
SIZE_CLASSES: Tuple[Tuple[int, int], ...] = ((32, 8), (128, 32), (512, 128))


@dataclasses.dataclass
class DenseBatch:
    """One padded size class of modules."""

    m: np.ndarray  # [B, C, T] float membership multiplicities
    eumaps: np.ndarray  # [B, C]
    reads: np.ndarray  # [B, C]
    denom: np.ndarray  # [B, T]
    tid_map: np.ndarray  # int32 [B, T], -1 padding
    sids: np.ndarray  # int64 [B]


@dataclasses.dataclass
class DensePartition:
    batches: List[DenseBatch]
    csr_sids: np.ndarray  # modules left to the CSR solver


def partition_modules(graph: SegmentGraph, modules: ModuleDecomposition,
                      eumaps: np.ndarray, read_count: np.ndarray,
                      classes: Tuple[Tuple[int, int], ...] = SIZE_CLASSES,
                      dtype=np.float32) -> DensePartition:
    """Bucket modules into dense size classes.

    Active segments are those with sid >= 0 and EUMAps > 0 (reference
    skips E==0 segments in the likelihood); transcripts are those
    appearing in a module's active segments."""
    n_cid = graph.n_cid
    off, tids = graph.ct_offsets, graph.ct_tids
    sizes = np.diff(off)
    active = (modules.cs >= 0) & (eumaps > 0)

    # per-module active segment lists
    n_sets = modules.n_sets
    act_cids = np.flatnonzero(active)
    cid_sid = modules.cs[act_cids]
    order = np.argsort(cid_sid, kind="stable")
    act_cids = act_cids[order]
    cid_sid = cid_sid[order]
    seg_starts = np.searchsorted(cid_sid, np.arange(n_sets + 1))

    batches: List[List[int]] = [[] for _ in classes]
    csr_sids: List[int] = []
    mod_tids: List[Optional[np.ndarray]] = [None] * n_sets
    mod_c: np.ndarray = np.diff(seg_starts)

    for sid in range(n_sets):
        cids = act_cids[seg_starts[sid]:seg_starts[sid + 1]]
        if len(cids) == 0:
            continue
        t = np.unique(np.concatenate(
            [tids[off[c]:off[c + 1]] for c in cids]))
        mod_tids[sid] = t
        placed = False
        for k, (cmax, tmax) in enumerate(classes):
            if len(cids) <= cmax and len(t) <= tmax:
                batches[k].append(sid)
                placed = True
                break
        if not placed:
            csr_sids.append(sid)

    out: List[DenseBatch] = []
    for k, (cmax, tmax) in enumerate(classes):
        sids = batches[k]
        if not sids:
            continue
        B = len(sids)
        m = np.zeros((B, cmax, tmax), dtype=dtype)
        E = np.zeros((B, cmax), dtype=dtype)
        R = np.zeros((B, cmax), dtype=dtype)
        tid_map = np.full((B, tmax), -1, dtype=np.int32)
        for b, sid in enumerate(sids):
            cids = act_cids[seg_starts[sid]:seg_starts[sid + 1]]
            t = mod_tids[sid]
            tid_map[b, :len(t)] = t
            t_index = {int(x): i for i, x in enumerate(t)}
            E[b, :len(cids)] = eumaps[cids]
            R[b, :len(cids)] = read_count[cids]
            for ci, c in enumerate(cids):
                for x in tids[off[c]:off[c + 1]]:
                    m[b, ci, t_index[int(x)]] += 1.0
        denom = np.einsum("bct,bc->bt", m, E).astype(dtype)
        out.append(DenseBatch(m=m, eumaps=E, reads=R, denom=denom,
                              tid_map=tid_map,
                              sids=np.asarray(sids, dtype=np.int64)))
    return DensePartition(batches=out, csr_sids=np.asarray(csr_sids,
                                                           dtype=np.int64))


def _em_iter_dense(m, reads, inv_denom, theta):
    s = jnp.einsum("bct,bt->bc", m, theta,
                   preferred_element_type=theta.dtype)
    ratio = jnp.where(s > 0, reads / jnp.where(s > 0, s, 1.0), 0.0)
    num = jnp.einsum("bct,bc->bt", m, ratio,
                     preferred_element_type=theta.dtype)
    return theta * num * inv_denom


@functools.partial(jax.jit, static_argnames=("block_iters", "max_blocks"))
def _dense_solve_jax(m, eumaps, reads, denom, theta0, epsilon,
                     block_iters: int, max_blocks: int):
    """Batched dense SQUAREM EM with the same convergence semantics as the
    CSR solver (termwise likelihood gains)."""
    inv_denom = jnp.where(denom > 0, 1.0 / jnp.where(denom > 0, denom, 1.0),
                          0.0)

    def intens(th):
        return jnp.einsum("bct,bt->bc", m, th,
                          preferred_element_type=th.dtype)

    def gain_rows(s_old, s_new):
        both = (s_old > 0) & (s_new > 0)
        ratio = jnp.log1p(jnp.where(both, (s_new - s_old) /
                                    jnp.where(both, s_old, 1.0), 0.0))
        died = (s_old > 0) & (s_new <= 0) & (reads > 0)
        born = (s_old <= 0) & (s_new > 0) & (reads > 0)
        term = jnp.where(both, reads * ratio,
                         jnp.where(died, -1e30,
                                   jnp.where(born, 1e30, 0.0)))
        return jnp.sum(term - eumaps * (s_new - s_old), axis=1)

    def cycle(th):
        t1 = _em_iter_dense(m, reads, inv_denom, th)
        t2 = _em_iter_dense(m, reads, inv_denom, t1)
        r = t1 - th
        v = t2 - t1 - r
        rn = jnp.sqrt(jnp.sum(r * r, axis=1, keepdims=True))
        vn = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
        alpha = jnp.where(vn > 0, -rn / jnp.where(vn > 0, vn, 1.0), -1.0)
        alpha = jnp.minimum(alpha, -1.0)
        cand = jnp.maximum(th - 2.0 * alpha * r + alpha * alpha * v, 0.0)
        cand = _em_iter_dense(m, reads, inv_denom, cand)
        better = (gain_rows(intens(t2), intens(cand)) >= 0)[:, None]
        return jnp.where(better, cand, t2)

    def block(state):
        th, s_prev, it, _ = state
        th = jax.lax.fori_loop(0, block_iters, lambda _, x: cycle(x), th)
        s_new = intens(th)
        return th, s_new, it + 1, jnp.sum(gain_rows(s_prev, s_new))

    def cond(state):
        _, _, it, gain = state
        return (gain >= epsilon) & (it < max_blocks)

    state = (theta0, intens(theta0), jnp.int32(0),
             jnp.asarray(jnp.inf, theta0.dtype))
    th, _, it, _ = jax.lax.while_loop(cond, block, block(state))
    return th, it


# --------------------------------------------------------------------------
# Pallas kernel: one block of EM iterations fully resident in VMEM
# --------------------------------------------------------------------------


def _pallas_block(m, eumaps, reads, inv_denom, theta, n_iters: int,
                  tile_b: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, C, T = m.shape

    def kernel5(m_ref, e_ref2, r_ref, inv_ref, th_ref, out_ref):
        mm = m_ref[:]
        ee = e_ref2[:]
        rr = r_ref[:]
        inv = inv_ref[:]

        # Mosaic does not lower batched dot_general; the tiles are
        # VMEM-resident so elementwise-multiply + axis reduction on the
        # VPU is the right formulation (no HBM traffic either way).
        def intens(th):
            return jnp.sum(mm * th[:, None, :], axis=2)

        def em(th):
            s = intens(th)
            ratio = jnp.where(s > 0, rr / jnp.where(s > 0, s, 1.0), 0.0)
            num = jnp.sum(mm * ratio[:, :, None], axis=1)
            return th * num * inv

        def body(_, th):
            t1 = em(th)
            t2 = em(t1)
            r = t1 - th
            v = t2 - t1 - r
            rn = jnp.sqrt(jnp.sum(r * r, axis=1, keepdims=True))
            vn = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
            alpha = jnp.minimum(
                jnp.where(vn > 0, -rn / jnp.where(vn > 0, vn, 1.0), -1.0),
                -1.0)
            cand = jnp.maximum(th - 2.0 * alpha * r + alpha * alpha * v, 0.0)
            cand = em(cand)
            lam2 = intens(t2)
            lamc = intens(cand)
            both = (lam2 > 0) & (lamc > 0)
            ratio = jnp.log1p(jnp.where(both, (lamc - lam2) /
                                        jnp.where(both, lam2, 1.0), 0.0))
            died = (lam2 > 0) & (lamc <= 0) & (rr > 0)
            born = (lam2 <= 0) & (lamc > 0) & (rr > 0)
            term = jnp.where(both, rr * ratio,
                             jnp.where(died, -1e30,
                                       jnp.where(born, 1e30, 0.0)))
            gain = jnp.sum(term - ee * (lamc - lam2), axis=1, keepdims=True)
            return jnp.where(gain >= 0, cand, t2)

        out_ref[:] = jax.lax.fori_loop(0, n_iters, body, th_ref[:])

    grid = (B // tile_b,)
    spec3 = pl.BlockSpec((tile_b, C, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((tile_b, C), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_t = pl.BlockSpec((tile_b, T), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel5,
        grid=grid,
        in_specs=[spec3, spec_c, spec_c, spec_t, spec_t],
        out_specs=spec_t,
        out_shape=jax.ShapeDtypeStruct(theta.shape, theta.dtype),
        interpret=jax.default_backend() != "tpu",
    )(m, eumaps, reads, inv_denom, theta)


def solve_dense_batch(batch: DenseBatch, epsilon: float,
                      block_iters: int = 8, max_blocks: int = 2048,
                      use_pallas: bool = False
                      ) -> Tuple[np.ndarray, int]:
    """Solve one dense size class; returns (theta [B, T], n_blocks)."""
    m = jnp.asarray(batch.m)
    E = jnp.asarray(batch.eumaps)
    R = jnp.asarray(batch.reads)
    denom = jnp.asarray(batch.denom)
    theta0 = jnp.where(denom > 0, jnp.ones_like(denom), 0.0)
    if not use_pallas:
        th, it = _dense_solve_jax(m, E, R, denom, theta0,
                                  jnp.asarray(epsilon, theta0.dtype),
                                  block_iters, max_blocks)
        return np.asarray(th), int(it)
    # Pallas path: host convergence loop over VMEM-resident blocks
    inv_denom = jnp.where(denom > 0, 1.0 / jnp.where(denom > 0, denom, 1.0),
                          0.0)
    B, C, T = batch.m.shape
    # VMEM budget ~2MB for the membership tile
    tile_b = max(1, min(B, (1 << 19) // max(C * T * 4, 1)))
    while B % tile_b:
        tile_b -= 1
    th = theta0
    s_prev = jnp.einsum("bct,bt->bc", m, th)
    blocks = 0
    run = jax.jit(functools.partial(_pallas_block, n_iters=block_iters,
                                    tile_b=tile_b))
    for blocks in range(1, max_blocks + 1):
        th = run(m, E, R, inv_denom, th)
        s_new = jnp.einsum("bct,bt->bc", m, th)
        both = (s_prev > 0) & (s_new > 0)
        ratio = jnp.log1p(jnp.where(both, (s_new - s_prev) /
                                    jnp.where(both, s_prev, 1.0), 0.0))
        died = (s_prev > 0) & (s_new <= 0) & (R > 0)
        born = (s_prev <= 0) & (s_new > 0) & (R > 0)
        term = jnp.where(both, R * ratio,
                         jnp.where(died, -1e30, jnp.where(born, 1e30, 0.0)))
        gain = float(jnp.sum(term - E * (s_new - s_prev)))
        s_prev = s_new
        if gain < epsilon:
            break
    return np.asarray(th), blocks
