"""Settle the Pallas-vs-XLA dense E-step question with a measured number.

Runs the bench workloads' actual module-size mix (SE 12k-transcript and
PE 7.3k-transcript fixtures from bench.py) through both dense solvers:

* XLA path: _dense_solve_jax (einsum EM inside a lax.while_loop),
* Pallas path: _dense_solve_pallas (VMEM-resident iteration blocks, the
  convergence check on device).

Both produce the same theta (pinned by tests/test_dense.py); this tool
reports wall time per size class, best of N.  Result goes into
BASELINE_MEASURED.md and decides the --solver_pallas default.
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from emsar_tpu.utils import jitcache  # noqa: E402
jitcache.enable(os.path.join(REPO, "bench_cache", "jit_cache"))

from emsar_tpu.config import QuantConfig, StrandType  # noqa: E402
from emsar_tpu.io.rsh import RshIndex  # noqa: E402
from emsar_tpu.ingest import native as native_mod  # noqa: E402
from emsar_tpu.model.quantify import compute_wf  # noqa: E402
from emsar_tpu.model.modules import (build_segment_graph,  # noqa: E402
                                     decompose_modules)
from emsar_tpu.model.dense import (partition_modules,  # noqa: E402
                                   solve_dense_batch)

CACHE = os.path.join(REPO, "bench_cache")


def load_problem(rsh, aln, fmt, pe):
    cfg = QuantConfig(verbose=0, pe=pe, aln_format=fmt)
    cfg.strand = StrandType.parse("ns", pe)
    index = RshIndex.load(rsh)
    cfg.min_fraglength = index.min_fraglength
    cfg.max_fraglength = index.max_fraglength
    nc = native_mod.NativeCollapser(index)
    counts = nc.collapse_file(aln, fmt, pe, 0, cfg.max_repeat,
                              cfg.min_fraglength, cfg.max_fraglength,
                              [index.readlength] if pe else None)
    wf = compute_wf(index, counts.fraglength_counts)
    adj = np.concatenate([index.single_euma.astype(np.float64) @ wf,
                          index.multi_euma.astype(np.float64) @ wf])
    rc = counts.readcount_per_cid()
    graph = build_segment_graph(index, adj, rc)
    modules = decompose_modules(graph)
    eumaps = adj / 1e3 * (counts.total_read_count / 1e6)
    return graph, modules, eumaps, rc


def bench_one(name, rsh, aln, fmt, pe, reps=3):
    graph, modules, eumaps, rc = load_problem(rsh, aln, fmt, pe)
    part = partition_modules(graph, modules, eumaps, rc, dtype=np.float32)
    print(f"== {name}: {len(part.batches)} size classes, "
          f"{sum(b.shape[0] for b in part.batches)} dense modules, "
          f"{len(part.csr_sids)} CSR", flush=True)
    for batch in part.batches:
        row = {}
        for use_pallas, label in ((False, "xla"), (True, "pallas")):
            ths = []
            best = float("inf")
            for r in range(reps + 1):  # rep 0 = compile
                t0 = time.perf_counter()
                th, blocks = solve_dense_batch(batch, 1e-5,
                                               use_pallas=use_pallas)
                dt = time.perf_counter() - t0
                if r:
                    best = min(best, dt)
            row[label] = (best, blocks)
            ths.append(th)
        (tx, bx), (tp_, bp) = row["xla"], row["pallas"]
        print(f"  B,C,T={batch.shape}: xla {tx*1e3:8.1f} ms ({bx} blk)  "
              f"pallas {tp_*1e3:8.1f} ms ({bp} blk)  "
              f"ratio {tp_/tx:5.2f}x", flush=True)


def main():
    bench_one("PE (7.3k tx, 500K pairs)",
              os.path.join(CACHE, "benchpe.rsh"),
              os.path.join(CACHE, "benchpe.bam"), "bam", True)
    bench_one("SE (12k tx, 1M reads)",
              os.path.join(CACHE, "bench.rsh"),
              os.path.join(CACHE, "bench.bowtieout"), "bowtie", False)


if __name__ == "__main__":
    main()
