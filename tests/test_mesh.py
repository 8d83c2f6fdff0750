"""Sharded EM must match the single-device solver on an 8-device CPU mesh."""

import numpy as np

from emsar_tpu.model.modules import build_segment_graph, decompose_modules
from emsar_tpu.model.solver import build_problem, solve
from emsar_tpu.parallel.mesh import make_mesh, shard_problem, solve_sharded
from emsar_tpu.config import BuildConfig
from emsar_tpu.index.build import build_se_index
from emsar_tpu.io.fasta import build_transcriptome
from tests.util import random_transcriptome


def _toy_problem(seed=0, n=40):
    rng = np.random.default_rng(seed)
    names, seqs = random_transcriptome(rng, n, min_len=60, max_len=300,
                                       shared_frac=0.6)
    tx = build_transcriptome(names, seqs)
    idx = build_se_index(tx, 20, 20, BuildConfig(verbose=0))
    # synthetic counts proportional to EUMA + noise
    adj = np.concatenate([idx.single_euma[:, 0], idx.multi_euma[:, 0]]) \
        .astype(np.float64)
    rc = rng.poisson(adj * 2.0).astype(np.int64)
    total = int(rc.sum())
    graph = build_segment_graph(idx, adj, rc)
    modules = decompose_modules(graph)
    eumaps = adj / 1e3 * (total / 1e6)
    problem = build_problem(graph, modules, eumaps, rc)
    return problem, rc


def test_sharded_solver_matches_single(tmp_path):
    problem, rc = _toy_problem()
    fpkm, ll, _ = solve(problem, epsilon=1e-12)

    for dp in (1, 2, 8):
        mesh = make_mesh(8, dp=dp)
        reads = problem.reads[None, :].astype(np.float64)
        if dp > 1:
            reads = np.repeat(reads, dp, axis=0)  # identical samples per shard
        sp = shard_problem(problem, reads, mesh, dtype=np.float64)
        theta, ll_s, _ = solve_sharded(sp, epsilon=1e-12)
        for s in range(reads.shape[0]):
            np.testing.assert_allclose(theta[s], fpkm, rtol=1e-8, atol=1e-8)


def test_multisample_sharded_independent():
    """Different samples on the dp axis are solved independently."""
    problem, rc = _toy_problem(seed=1)
    rng = np.random.default_rng(2)
    S = 4
    reads = np.stack([rng.permutation(problem.reads) for _ in range(S)])
    mesh = make_mesh(8, dp=4)
    sp = shard_problem(problem, reads, mesh, dtype=np.float64)
    theta, _, _ = solve_sharded(sp, epsilon=1e-12)
    for s in range(S):
        p1 = type(problem)(**{**problem.__dict__, "reads": reads[s]})
        f1, _, _ = solve(p1, epsilon=1e-12)
        np.testing.assert_allclose(theta[s], f1, rtol=1e-7, atol=1e-7)
