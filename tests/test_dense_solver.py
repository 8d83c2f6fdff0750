"""The dense-batched (MXU) module solver and the Pallas VMEM kernel must
match the CSR solver."""

import numpy as np
import pytest

from emsar_tpu.model.dense import (partition_modules, solve_dense_batch,
                                   SIZE_CLASSES)
from emsar_tpu.model.modules import build_segment_graph, decompose_modules
from emsar_tpu.model.solver import build_problem, solve
from emsar_tpu.config import BuildConfig
from emsar_tpu.index.build import build_se_index
from emsar_tpu.io.fasta import build_transcriptome
from emsar_tpu.sim import gene_family_transcriptome
from tests.util import random_transcriptome


def _problem(seed=0, gene_family=True):
    rng = np.random.default_rng(seed)
    if gene_family:
        names, seqs, _ = gene_family_transcriptome(rng, 25, n_exons=6,
                                                   min_exon=40, max_exon=150)
    else:
        names, seqs = random_transcriptome(rng, 50, shared_frac=0.6)
    tx = build_transcriptome(names, seqs)
    idx = build_se_index(tx, 20, 20, BuildConfig(verbose=0))
    adj = np.concatenate([idx.single_euma[:, 0],
                          idx.multi_euma[:, 0]]).astype(np.float64)
    rc = rng.poisson(adj * 1.5).astype(np.int64)
    total = max(int(rc.sum()), 1)
    graph = build_segment_graph(idx, adj, rc)
    modules = decompose_modules(graph)
    eumaps = adj / 1e3 * (total / 1e6)
    return graph, modules, eumaps, rc


def _fpkm_dense(graph, modules, eumaps, rc, use_pallas, dtype=np.float64):
    part = partition_modules(graph, modules, eumaps, rc, dtype=dtype)
    assert part.batches, "expected at least one dense batch"
    fpkm = np.zeros(graph.n_transcripts)
    for batch in part.batches:
        theta, _ = solve_dense_batch(batch, 1e-12, use_pallas=use_pallas)
        mask = batch.tid_map >= 0
        fpkm[batch.tid_map[mask]] = theta[mask]
    return fpkm, part


def _loglik(problem, theta):
    s = np.zeros(len(problem.eumaps))
    np.add.at(s, problem.edge_cid,
              problem.edge_mult * theta[problem.edge_tid])
    lam = problem.eumaps * s
    m = lam > 0
    assert not ((~m) & (problem.reads > 0)).any()
    return float(np.sum(problem.reads[m] * np.log(lam[m]) - lam[m]))


def test_dense_matches_csr():
    """Same maximizer quality: the dense and CSR solvers must reach the
    same optimum (theta may differ along non-identifiable collinear
    directions, so compare the likelihood, not coordinates)."""
    graph, modules, eumaps, rc = _problem()
    problem = build_problem(graph, modules, eumaps, rc)
    ref, _, _ = solve(problem, epsilon=1e-12)
    fpkm, part = _fpkm_dense(graph, modules, eumaps, rc, use_pallas=False)
    # merge: CSR covers any modules the dense classes didn't
    covered = np.zeros(graph.n_transcripts, dtype=bool)
    for b in part.batches:
        covered[b.tid_map[b.tid_map >= 0]] = True
    merged = np.where(covered, fpkm, ref)
    ll_ref = _loglik(problem, ref)
    ll_dense = _loglik(problem, merged)
    assert ll_dense >= ll_ref - 1e-6 * abs(ll_ref), (ll_dense, ll_ref)
    # identifiable quantity: expected reads per segment must agree
    def seg_intensity(th):
        s = np.zeros(len(problem.eumaps))
        np.add.at(s, problem.edge_cid,
                  problem.edge_mult * th[problem.edge_tid])
        return problem.eumaps * s
    np.testing.assert_allclose(seg_intensity(merged), seg_intensity(ref),
                               rtol=1e-4, atol=1e-6)


def test_pallas_kernel_matches_jax_dense():
    graph, modules, eumaps, rc = _problem(seed=1)
    problem = build_problem(graph, modules, eumaps, rc)
    f_jax, _ = _fpkm_dense(graph, modules, eumaps, rc, use_pallas=False,
                           dtype=np.float32)
    f_pl, _ = _fpkm_dense(graph, modules, eumaps, rc, use_pallas=True,
                          dtype=np.float32)
    # both reach the same optimum; coordinates may differ along collinear
    # directions, so compare likelihood + identifiable intensities
    ll_jax = _loglik(problem, f_jax)
    ll_pl = _loglik(problem, f_pl)
    assert abs(ll_pl - ll_jax) <= 1e-5 * abs(ll_jax)

    def seg_intensity(th):
        s = np.zeros(len(problem.eumaps))
        np.add.at(s, problem.edge_cid,
                  problem.edge_mult * th[problem.edge_tid])
        return problem.eumaps * s
    np.testing.assert_allclose(seg_intensity(f_pl), seg_intensity(f_jax),
                               rtol=5e-3, atol=1e-3)


def test_quantify_auto_mode_matches_csr():
    from emsar_tpu.config import QuantConfig
    from emsar_tpu.model.quantify import quantify_sample
    from emsar_tpu.ingest.collapse import SampleCounts
    graph, modules, eumaps, rc = _problem(seed=2)
    # fabricate an index-shaped SampleCounts through the pipeline instead:
    # run quantify_sample twice with different solver modes
    rng = np.random.default_rng(3)
    names, seqs, _ = gene_family_transcriptome(rng, 20, n_exons=5,
                                               min_exon=40, max_exon=120)
    tx = build_transcriptome(names, seqs)
    idx = build_se_index(tx, 20, 20, BuildConfig(verbose=0))
    adj = np.concatenate([idx.single_euma[:, 0], idx.multi_euma[:, 0]])
    counts = SampleCounts(
        single_counts=rng.poisson(np.maximum(idx.single_euma[:, 0], 0) * 2.0),
        multi_counts=rng.poisson(np.maximum(idx.multi_euma[:, 0], 0) * 2.0),
        fraglength_counts=np.bincount([20], minlength=401) * 1000,
        total_read_count=1000)
    cfg_csr = QuantConfig(verbose=0, solver_mode="csr")
    cfg_auto = QuantConfig(verbose=0, solver_mode="auto")
    r1 = quantify_sample(idx, counts, cfg_csr)
    r2 = quantify_sample(idx, counts, cfg_auto)
    # same optimum (theta can differ along collinear isoform directions)
    assert abs(r2.loglik - r1.loglik) <= 1e-6 * abs(r1.loglik)
    # identifiable totals agree
    irc1 = (r1.ieuma / 1e3) * r1.fpkm
    irc2 = (r2.ieuma / 1e3) * r2.fpkm
    np.testing.assert_allclose(irc2.sum(), irc1.sum(), rtol=1e-8)
