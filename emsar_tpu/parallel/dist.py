"""Multi-host (multi-process) distribution runtime.

The reference is strictly single-process (SURVEY §2 C23); this layer is
new TPU-first design per BASELINE.json's north star: per-host alignment
shards are collapsed locally into SampleCounts, merged across hosts, and
the EM solve runs SPMD over the global device mesh with
``jax.lax.psum``-merged sufficient statistics riding ICI/DCN.

Runbook (2 processes on one machine, CPU backend):

    EMSAR_TPU_PLATFORM=cpu EMSAR_TPU_COORDINATOR=127.0.0.1:9911 \
    EMSAR_TPU_NUM_PROCS=2 EMSAR_TPU_PROCESS_ID=0 \
      emsar -q -M --dist_merge_shards -I idx.rsh out s shards.list &
    EMSAR_TPU_PLATFORM=cpu EMSAR_TPU_COORDINATOR=127.0.0.1:9911 \
    EMSAR_TPU_NUM_PROCS=2 EMSAR_TPU_PROCESS_ID=1 \
      emsar -q -M --dist_merge_shards -I idx.rsh out s shards.list &
    wait   # process 0 writes out/s.0.fpkm

``shards.list`` lists alignment shards of ONE sample (e.g. a BAM split by
read groups); process i ingests lines i, i+N, ... and the merged counts
equal the single-process run's exactly, so outputs are identical.  On a
TPU pod each host runs one process and the same flags apply (coordinator
on host 0).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def maybe_init_from_env() -> bool:
    """Initialize jax.distributed from EMSAR_TPU_{COORDINATOR,NUM_PROCS,
    PROCESS_ID}; returns True when running multi-process."""
    coord = os.environ.get("EMSAR_TPU_COORDINATOR")
    if not coord:
        return False
    import jax

    nprocs = int(os.environ["EMSAR_TPU_NUM_PROCS"])
    pid = int(os.environ["EMSAR_TPU_PROCESS_ID"])
    try:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=nprocs, process_id=pid)
    except RuntimeError:
        pass  # already initialized
    return nprocs > 1


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_main() -> bool:
    return process_index() == 0


def shard_list(items: List[str]) -> List[str]:
    """This process's strided slice of a work list."""
    return list(items[process_index()::process_count()])


def allreduce_counts(counts):
    """Sum SampleCounts across processes (cross-host collective on the
    global mesh); every process returns the identical merged counts, so
    downstream quantification is bitwise-reproducible on every host."""
    import jax

    from ..ingest.collapse import SampleCounts

    if jax.process_count() == 1:
        return counts

    from jax.experimental import multihost_utils

    def reduce_one(arr: np.ndarray) -> np.ndarray:
        # gather per-process arrays, integer-sum on host: exact
        gathered = multihost_utils.process_allgather(arr)
        return np.sum(np.asarray(gathered), axis=0).astype(np.int64)

    return SampleCounts(
        single_counts=reduce_one(counts.single_counts),
        multi_counts=reduce_one(counts.multi_counts),
        fraglength_counts=reduce_one(counts.fraglength_counts),
        total_read_count=int(reduce_one(np.asarray(
            [counts.total_read_count]))[0]))


def barrier() -> None:
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("emsar_tpu_barrier")
