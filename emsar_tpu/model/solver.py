"""Device EM solver for the per-module Poisson likelihood.

The reference maximizes, per module, F = sum_cid R_cid * log(lambda_cid) -
lambda_cid with lambda_cid = EUMAps_cid * sum_{tid in CT[cid]} FPKM_tid
(duplicate tids summed with multiplicity) using a sequential per-transcript
pattern search (MLE, src/emsar_functions.c:3033-3126).  The objective is
concave in FPKM over the nonnegative orthant, so its maximizer is what the
output captures; here it is found with multiplicative EM fixed-point
updates on the identical objective:

    s_c     = sum_t m_ct * theta_t          (segment intensity)
    theta_t <- theta_t * (sum_c m_ct R_c / s_c) / (sum_c m_ct E_c)

whose fixed points are exactly the KKT points of F.  Because modules are
disjoint, ALL modules are solved jointly as one global edge list —
segment-sums and gathers over flat (cid, tid, multiplicity) edges, jitted
as a lax.while_loop of fused iteration blocks.  This replaces the
reference's pthread fan-out over sid ranges (run_MLE_threads :2977) with
one XLA program.

Segments with EUMAps == 0 are excluded (the reference skips them in Fp
:2952); segments excluded by EUMAcut (sid == -1) are excluded too.
Transcripts with no active positive-EUMA segment get FPKM = 0 (the
reference leaves them at a random init in [0,100] because the likelihood
does not depend on them; deterministic 0 is the documented divergence).

Edge cases preserved: modules with zero reads converge to 0 in one step;
single-transcript modules converge to R/E in one step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .modules import ModuleDecomposition, SegmentGraph


@dataclasses.dataclass
class SolverProblem:
    """Flat edge-list formulation of the global likelihood.

    Edges connect active segments (EUMAps > 0, sid != -1) to transcripts
    with integer multiplicities.  ``eumaps``/``reads`` are per active
    segment; ``denom`` is sum_c m_ct E_c per transcript.
    """

    n_transcripts: int
    edge_cid: np.ndarray  # int32 [E] (active-segment local index)
    edge_tid: np.ndarray  # int32 [E]
    edge_mult: np.ndarray  # float [E]
    eumaps: np.ndarray  # float [C_active]
    reads: np.ndarray  # float [C_active]
    denom: np.ndarray  # float [ntid]


def build_problem(graph: SegmentGraph, modules: ModuleDecomposition,
                  eumaps: np.ndarray, read_count: np.ndarray,
                  dtype=np.float64) -> SolverProblem:
    """Compress the CSR graph to the active edge list with multiplicities."""
    ntid = graph.n_transcripts
    active = (modules.cs >= 0) & (eumaps > 0)
    act_cids = np.flatnonzero(active)
    n_active = len(act_cids)
    # local renumbering of active cids
    local = np.full(graph.n_cid, -1, dtype=np.int64)
    local[act_cids] = np.arange(n_active)

    off = graph.ct_offsets
    sizes = np.diff(off)
    # expand active cids' tid lists
    rep = np.repeat(active, sizes)
    flat_cid = np.repeat(np.arange(graph.n_cid, dtype=np.int64), sizes)[rep]
    flat_tid = graph.ct_tids[rep].astype(np.int64)
    # merge duplicates into multiplicities
    key = flat_cid * ntid + flat_tid
    uniq, inv, mult = np.unique(key, return_inverse=True, return_counts=True)
    e_cid = local[(uniq // ntid)].astype(np.int32)
    e_tid = (uniq % ntid).astype(np.int32)
    e_mult = mult.astype(dtype)

    E = eumaps[act_cids].astype(dtype)
    R = read_count[act_cids].astype(dtype)
    denom = np.zeros(ntid, dtype=dtype)
    np.add.at(denom, e_tid, e_mult * E[e_cid])
    return SolverProblem(n_transcripts=ntid, edge_cid=e_cid, edge_tid=e_tid,
                         edge_mult=e_mult, eumaps=E, reads=R, denom=denom)


@functools.partial(jax.jit,
                   static_argnames=("n_transcripts", "n_segments",
                                    "block_iters", "max_iters"))
def _em_solve(edge_cid, edge_tid, edge_mult, eumaps, reads, denom,
              theta0, n_transcripts: int, n_segments: int,
              block_iters: int, max_iters: int, epsilon):
    """Run SQUAREM-accelerated EM until the log-likelihood gain over a
    block drops below epsilon.  Returns (theta, logL, n_blocks).

    Each SQUAREM cycle (Varadhan & Roland 2008, stabilized) extrapolates
    two EM steps along the fixed-point residual and falls back to the
    plain EM result whenever the extrapolation loses likelihood, so
    monotone convergence to the same maximizer is preserved.
    """

    inv_denom = jnp.where(denom > 0, 1.0 / jnp.where(denom > 0, denom, 1.0), 0.0)

    def em_iter(theta):
        s = jax.ops.segment_sum(edge_mult * theta[edge_tid], edge_cid,
                                num_segments=n_segments)
        ratio = jnp.where(s > 0, reads / jnp.where(s > 0, s, 1.0), 0.0)
        num = jax.ops.segment_sum(edge_mult * ratio[edge_cid], edge_tid,
                                  num_segments=n_transcripts)
        return theta * num * inv_denom

    def intensities(theta):
        return jax.ops.segment_sum(edge_mult * theta[edge_tid], edge_cid,
                                   num_segments=n_segments)

    def loglik_of(s):
        lam = eumaps * s
        safe = jnp.where(lam > 0, lam, 1.0)
        return jnp.sum(jnp.where(lam > 0, reads * jnp.log(safe) - lam,
                                 jnp.where(reads > 0, -1e30, 0.0)))

    def loglik(theta):
        return loglik_of(intensities(theta))

    def gain_of(s_old, s_new):
        """logL(s_new) - logL(s_old) computed termwise from the intensity
        deltas — resolves tiny gains even in float32, where differencing
        two O(1e6) log-likelihoods cannot."""
        both = (s_old > 0) & (s_new > 0)
        safe_old = jnp.where(both, s_old, 1.0)
        ratio = jnp.log1p(jnp.where(both, (s_new - s_old) / safe_old, 0.0))
        # a read-bearing segment whose intensity collapses to 0 is a
        # likelihood collapse (-inf), NOT a gain; the reverse is +inf
        died = (s_old > 0) & (s_new <= 0) & (reads > 0)
        born = (s_old <= 0) & (s_new > 0) & (reads > 0)
        term = jnp.where(both, reads * ratio,
                         jnp.where(died, -1e30,
                                   jnp.where(born, 1e30, 0.0)))
        return jnp.sum(term - eumaps * (s_new - s_old))

    def squarem_cycle(theta):
        t1 = em_iter(theta)
        t2 = em_iter(t1)
        r = t1 - theta
        v = t2 - t1 - r
        rnorm = jnp.sqrt(jnp.sum(r * r))
        vnorm = jnp.sqrt(jnp.sum(v * v))
        alpha = jnp.where(vnorm > 0, -rnorm / jnp.where(vnorm > 0, vnorm, 1.0),
                          -1.0)
        alpha = jnp.minimum(alpha, -1.0)  # never shorter than a plain step
        # zero-crossing coordinates fall back to the plain double-EM value:
        # an exact 0 is an absorbing boundary for multiplicative EM and can
        # freeze a suboptimal KKT point
        extrap = theta - 2.0 * alpha * r + (alpha * alpha) * v
        cand = em_iter(jnp.where(extrap > 0, extrap, t2))  # stabilization
        better = gain_of(intensities(t2), intensities(cand)) >= 0
        return jnp.where(better, cand, t2)

    def block(state):
        theta, s_prev, it, _ = state
        theta = jax.lax.fori_loop(0, block_iters,
                                  lambda _, th: squarem_cycle(th), theta)
        s_new = intensities(theta)
        return theta, s_new, it + 1, gain_of(s_prev, s_new)

    def cond(state):
        _, _, it, gain = state
        return (gain >= epsilon) & (it * block_iters * 3 < max_iters)

    s0 = intensities(theta0)
    state = (theta0, s0, jnp.int32(0), jnp.asarray(jnp.inf, theta0.dtype))
    theta, s_fin, it, _ = jax.lax.while_loop(cond, block, block(state))
    return theta, loglik_of(s_fin), it


def polish_host_f64(problem: SolverProblem, theta: np.ndarray,
                    epsilon: float = 1e-9, max_cycles: int = 200,
                    native: Optional[bool] = None) -> np.ndarray:
    """Short float64 SQUAREM polish on the host.

    Used after a float32 device solve to close the float32 convergence
    floor; starts at the device solution so only a handful of cycles run.
    Runs in the C++ extension (csrc/solver.cc, same update rule) when
    available; ``native=False`` forces the NumPy path (the differential
    test pins the two against each other).
    """
    if native is not False:
        try:
            from ..ingest import native as native_mod
            th = np.ascontiguousarray(theta, dtype=np.float64).copy()
            denom = problem.denom.astype(np.float64)
            inv_denom = np.where(denom > 0, 1.0 /
                                 np.where(denom > 0, denom, 1.0), 0.0)
            native_mod.polish_squarem(
                problem.edge_cid, problem.edge_tid, problem.edge_mult,
                problem.eumaps, problem.reads, inv_denom, th,
                epsilon, max_cycles)
            return th
        except RuntimeError:
            if native:
                raise

    e_cid = problem.edge_cid.astype(np.int64)
    e_tid = problem.edge_tid.astype(np.int64)
    mult = problem.edge_mult.astype(np.float64)
    E = problem.eumaps.astype(np.float64)
    R = problem.reads.astype(np.float64)
    denom = problem.denom.astype(np.float64)
    n_seg = len(E)
    ntid = problem.n_transcripts
    inv_denom = np.where(denom > 0, 1.0 / np.where(denom > 0, denom, 1.0), 0.0)

    def em(th):
        s = np.bincount(e_cid, weights=mult * th[e_tid], minlength=n_seg)
        ratio = np.where(s > 0, R / np.where(s > 0, s, 1.0), 0.0)
        num = np.bincount(e_tid, weights=mult * ratio[e_cid], minlength=ntid)
        return th * num * inv_denom

    def gain(s_old, s_new):
        both = (s_old > 0) & (s_new > 0)
        ratio = np.log1p(np.where(both, (s_new - s_old) /
                                  np.where(both, s_old, 1.0), 0.0))
        died = (s_old > 0) & (s_new <= 0) & (R > 0)
        born = (s_old <= 0) & (s_new > 0) & (R > 0)
        term = np.where(both, R * ratio,
                        np.where(died, -1e30, np.where(born, 1e30, 0.0)))
        return float(np.sum(term - E * (s_new - s_old)))

    def intens(th):
        return np.bincount(e_cid, weights=mult * th[e_tid], minlength=n_seg)

    th = theta.astype(np.float64)
    s_prev = intens(th)
    for _ in range(max_cycles):
        t1 = em(th)
        t2 = em(t1)
        r = t1 - th
        v = t2 - t1 - r
        vn = float(np.sqrt(np.sum(v * v)))
        alpha = -float(np.sqrt(np.sum(r * r))) / vn if vn > 0 else -1.0
        alpha = min(alpha, -1.0)
        extrap = th - 2.0 * alpha * r + alpha * alpha * v
        cand = em(np.where(extrap > 0, extrap, t2))
        th = cand if gain(intens(t2), intens(cand)) >= 0 else t2
        s_new = intens(th)
        if gain(s_prev, s_new) < epsilon:
            break
        s_prev = s_new
    return th


def solve_restart_rounds(problem: SolverProblem, n_rounds: int,
                         epsilon: float = 1e-9, max_iters: int = 200000,
                         block_iters: int = 8, dtype=np.float32,
                         seed: int = 0, polish: bool = True) -> np.ndarray:
    """``n_rounds`` EM solves from independent uniform(0,100) inits, vmapped
    into one device program.

    This gives ``-n``/sd.of.FPKM its reference semantics: the reference
    re-runs the full MLE NUM_ROUND times from fresh ``rand()`` inits in
    [0,100) (src/emsar_functions.c:3077-3080; round loop
    src/emsar_main.c:441-450) purely to estimate estimator variance — on
    non-identifiable collinear modules different inits land on different
    points of the flat maximizer manifold, and the sd column reports that
    spread.  Unlike the reference (srand(time)), inits here are seeded
    deterministically so runs are reproducible.

    Returns theta [n_rounds, ntid] (float64).
    """
    ntid = problem.n_transcripts
    n_seg = len(problem.eumaps)
    rng = np.random.default_rng(np.uint64(0x5EED_0000) + np.uint64(seed))
    inits = rng.uniform(0.0, 100.0, size=(n_rounds, ntid))
    inits = np.where(problem.denom[None, :] > 0, inits, 0.0).astype(dtype)
    if n_seg == 0 or n_rounds == 0:
        return np.zeros((n_rounds, ntid), dtype=np.float64)
    if np.dtype(dtype) == np.float32:
        epsilon = max(epsilon, 1e-5)

    run = jax.vmap(
        lambda th0: _em_solve(
            jnp.asarray(problem.edge_cid), jnp.asarray(problem.edge_tid),
            jnp.asarray(problem.edge_mult.astype(dtype)),
            jnp.asarray(problem.eumaps.astype(dtype)),
            jnp.asarray(problem.reads.astype(dtype)),
            jnp.asarray(problem.denom.astype(dtype)), th0,
            n_transcripts=ntid, n_segments=n_seg,
            block_iters=block_iters, max_iters=max_iters,
            epsilon=jnp.asarray(epsilon, dtype)))
    theta, _, _ = run(jnp.asarray(inits))
    theta = np.asarray(theta).astype(np.float64)
    if polish and np.dtype(dtype) == np.float32:
        for r in range(n_rounds):
            theta[r] = polish_host_f64(problem, theta[r],
                                       epsilon=1e-9, max_cycles=200)
    return theta


def solve(problem: SolverProblem, epsilon: float = 1e-9,
          max_iters: int = 200000, block_iters: int = 8,
          dtype=None, theta0: Optional[np.ndarray] = None
          ) -> Tuple[np.ndarray, float, int]:
    """Solve the global EM problem; returns (fpkm [ntid], logL, n_blocks)."""
    ntid = problem.n_transcripts
    n_seg = len(problem.eumaps)
    if dtype is None:
        dtype = problem.eumaps.dtype
    if n_seg == 0:
        return np.zeros(ntid, dtype=dtype), 0.0, 0
    if np.dtype(dtype) == np.float32:
        # float32 cannot resolve likelihood gains below its noise floor;
        # iterating past it wastes blocks without moving the estimate
        epsilon = max(epsilon, 1e-5)
    if theta0 is None:
        # read-attribution start: every segment's reads granted fully to
        # each member transcript (upper-bound scale).  Halves the cycle
        # count vs. all-ones; a transcript whose segments all have zero
        # reads starts (and stays) at its optimum, zero.
        num0 = np.zeros(ntid, dtype=np.float64)
        np.add.at(num0, problem.edge_tid,
                  problem.edge_mult * problem.reads[problem.edge_cid])
        theta0 = num0 / np.where(problem.denom > 0, problem.denom, 1.0)
    theta0 = np.where(problem.denom > 0, theta0, 0.0).astype(dtype)

    theta, ll, it = _em_solve(
        jnp.asarray(problem.edge_cid), jnp.asarray(problem.edge_tid),
        jnp.asarray(problem.edge_mult.astype(dtype)),
        jnp.asarray(problem.eumaps.astype(dtype)),
        jnp.asarray(problem.reads.astype(dtype)),
        jnp.asarray(problem.denom.astype(dtype)),
        jnp.asarray(theta0),
        n_transcripts=ntid, n_segments=n_seg,
        block_iters=block_iters, max_iters=max_iters,
        epsilon=jnp.asarray(epsilon, dtype))
    return np.asarray(theta), float(ll), int(it)
