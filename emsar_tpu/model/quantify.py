"""Quantification orchestration: index + signature counts -> FPKM/TPM.

Mirrors the reference per-sample pipeline (src/emsar_main.c:380-488):
fragment-length weighting, module decomposition with the EUMAcut loop,
EUMAps construction, the (EM) likelihood maximization, and iEUMA /
inferred read counts.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..config import QuantConfig
from ..ingest.collapse import SampleCounts
from ..io.rsh import RshIndex
from ..utils.timing import phase
from .modules import (ModuleDecomposition, SegmentGraph, build_segment_graph,
                      decompose_modules)
from .solver import build_problem, solve


@dataclasses.dataclass
class QuantResult:
    fpkm: np.ndarray  # [ntid] the ML estimate
    fpkm_rounds: np.ndarray  # [num_round, ntid] (identical rows: EM is
    # deterministic; kept for output-format parity)
    ieuma: np.ndarray  # [ntid]
    adj_euma: np.ndarray  # [n_cid]
    wf: np.ndarray  # [nFraglen]
    graph: SegmentGraph
    modules: ModuleDecomposition
    total_read_count: int
    loglik: float
    em_blocks: int


def compute_wf(index: RshIndex, fraglength_counts: np.ndarray) -> np.ndarray:
    """Empirical fragment-length sampling probability (reference:
    transfer_fraglendist_to_Wf, src/emsar_functions.c:2503-2513)."""
    nfl = index.n_fraglen
    idx = np.arange(index.fraglen_min, index.fraglen_min + nfl)
    wf = fraglength_counts[idx].astype(np.float64)
    s = wf.sum()
    return wf / s if s > 0 else wf * np.nan


def quantify_sample(index: RshIndex, counts: SampleCounts, cfg: QuantConfig
                    ) -> QuantResult:
    with phase("fragment-length weighting", cfg.verbose):
        wf = compute_wf(index, counts.fraglength_counts)
        # adjEUMA = EUMA @ Wf in f64 (the one-shot exactness-sensitive matvec)
        adj_single = index.single_euma.astype(np.float64) @ wf
        adj_multi = index.multi_euma.astype(np.float64) @ wf
        adj_euma = np.concatenate([adj_single, adj_multi])

    read_count = counts.readcount_per_cid()

    with phase("module decomposition", cfg.verbose):
        graph = build_segment_graph(index, adj_euma, read_count)
        modules = decompose_modules(graph, verbose=cfg.verbose)

    with phase("EM solve", cfg.verbose):
        # EUMAps (reference construct_EUMAps :3148-3154)
        eumaps = adj_euma / 1e3 * (counts.total_read_count / 1e6) \
            * (10.0 ** cfg.delta)
        dtype = np.float64 if cfg.solver_dtype == "float64" else np.float32
        problem = build_problem(graph, modules, eumaps, read_count,
                                dtype=dtype)
        fpkm, ll, blocks = solve(problem, epsilon=cfg.epsilon,
                                 max_iters=cfg.max_niter_mle,
                                 block_iters=cfg.solver_block_iters,
                                 dtype=dtype)
        fpkm = fpkm.astype(np.float64)

    with phase("iEUMA", cfg.verbose):
        # iEUMA[tid] = sum over ALL cids containing tid (with multiplicity),
        # regardless of module exclusion (reference compute_iEUMA :3218)
        ieuma = np.zeros(index.n_transcripts, dtype=np.float64)
        sizes = np.diff(graph.ct_offsets)
        np.add.at(ieuma, graph.ct_tids,
                  np.repeat(adj_euma, sizes))

    fpkm_rounds = np.broadcast_to(fpkm, (cfg.num_round, len(fpkm))).copy()
    return QuantResult(fpkm=fpkm, fpkm_rounds=fpkm_rounds, ieuma=ieuma,
                       adj_euma=adj_euma, wf=wf, graph=graph, modules=modules,
                       total_read_count=counts.total_read_count,
                       loglik=ll, em_blocks=blocks)
