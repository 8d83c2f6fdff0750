"""rsh index construction (emsar-build).

SE (reference semantics: preprocess_SE + construct_rshbucket_2,
src/emsar_functions.c:3243-3290, 1758-1819):

  for each read length: every all-ACGT window of the forward half is keyed
  by its 2-bit packed words (unstranded: the lexicographic min of the
  fw / rc window, reference initialize_suffixarray_NS_5 canonical pick at
  :1005); windows are sorted on device; each run of identical keys of
  length L contributes EUMA[sig, readlength] += 1 where sig is the sorted
  multiset of the run's transcripts (L == 1 -> single-transcript segment;
  L >= MAX_REPEAT dropped).

PE (reference semantics: preprocess_PE + process_mate1_cluster_by_mate_3 +
construct_rshbucket_PE_3, src/emsar_functions.c:3294-3348, 2823-2934,
1902-1974):

  mate1 windows (both halves when unstranded) are sorted into clusters of
  identical sequence; per cluster, every (position, d) candidate with
  d in [Fmin-rl, Fmax-rl] yields a mate2 window at p+d constrained to the
  same transcript span; unstranded candidates are kept only in canonical
  pair orientation; candidates are grouped by (cluster, mate2 sequence);
  groups spanning multiple d are dropped, size-1 groups are
  single-transcript segments, others contribute signatures at fragment
  length d + readlength.

All sorting happens on device via ``kernels.sort_runs``; the
variable-length signature canonicalization is host-side NumPy.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import BuildConfig
from ..io.fasta import Transcriptome
from ..io.rsh import RshIndex
from ..utils.timing import phase
from . import pack
from .kernels import sort_runs, run_lengths


class SignatureAccumulator:
    """Accumulates EUMA counts per (signature, fraglen index).

    Single-transcript signatures go to a dense [ntid, nFraglen] array;
    multi-transcript signatures are keyed by the bytes of their sorted
    int32 tid multiset.
    """

    def __init__(self, ntid: int, n_fraglen: int):
        self.ntid = ntid
        self.n_fraglen = n_fraglen
        self.single = np.zeros((ntid, n_fraglen), dtype=np.int64)
        self._rows: Dict[bytes, int] = {}
        self._euma: List[np.ndarray] = []

    def add_single(self, tids: np.ndarray, fl_ind, counts: Optional[np.ndarray] = None):
        """single EUMA[tid, fl_ind] += counts (default 1 each)."""
        if counts is None:
            counts = 1
        if np.isscalar(fl_ind):
            np.add.at(self.single[:, fl_ind], tids, counts)
        else:
            np.add.at(self.single, (tids, fl_ind), counts)

    def add_multi(self, sig: bytes, fl_ind: int, count: int = 1):
        row = self._rows.get(sig)
        if row is None:
            row = len(self._euma)
            self._rows[sig] = row
            self._euma.append(np.zeros(self.n_fraglen, dtype=np.int64))
        self._euma[row][fl_ind] += count

    def add_multi_runs(self, sig_flat: np.ndarray, sig_offsets: np.ndarray,
                       fl_inds: np.ndarray):
        """Add one count for each signature given as CSR (already sorted
        multisets), at per-signature fraglen indices."""
        sig_flat = np.ascontiguousarray(sig_flat, dtype=np.int32)
        for i in range(len(sig_offsets) - 1):
            s = sig_flat[sig_offsets[i]:sig_offsets[i + 1]].tobytes()
            self.add_multi(s, int(fl_inds[i]))

    def finalize(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Canonically order multi signatures by (size, tid tuple) and
        return (sig_offsets, sig_tids, multi_euma)."""
        n = len(self._euma)
        if n == 0:
            return (np.zeros(1, dtype=np.int64), np.empty(0, dtype=np.int32),
                    np.zeros((0, self.n_fraglen), dtype=np.int64))
        keys = list(self._rows.keys())
        # big-endian byte order sorts like the int tuple for non-negative tids
        order = sorted(range(n), key=lambda i: (
            len(keys[i]),
            np.frombuffer(keys[i], dtype=np.int32).astype(">i4").tobytes()))
        sigs = [np.frombuffer(keys[i], dtype=np.int32) for i in order]
        sizes = np.fromiter((len(s) for s in sigs), dtype=np.int64, count=n)
        sig_offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sizes, out=sig_offsets[1:])
        sig_tids = np.concatenate(sigs).astype(np.int32)
        multi_euma = np.stack([self._euma[self._rows[keys[i]]] for i in order])
        return sig_offsets, sig_tids, multi_euma


def _sorted_run_signatures(run_id: np.ndarray, tids: np.ndarray,
                           keep: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Given per-element run ids (sorted order) and transcript ids, build the
    sorted tid multiset for each kept run.

    Returns (sig_flat, sig_offsets, run_index) where run_index maps each CSR
    signature back to its run id.
    """
    mask = keep[run_id]
    rid = run_id[mask]
    t = tids[mask]
    order = np.lexsort((t, rid))
    rid = rid[order]
    t = t[order]
    kept_runs, counts = np.unique(rid, return_counts=True)
    offsets = np.zeros(len(kept_runs) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return t.astype(np.int32), offsets, kept_runs


# --------------------------------------------------------------------------
# SE build
# --------------------------------------------------------------------------

def _radix_buckets(p16: np.ndarray, positions: np.ndarray, readlength: int,
                   prefix_bases: int) -> Tuple[np.ndarray, np.ndarray]:
    """Partition window positions by their first ``prefix_bases`` bases so
    identical windows always share a bucket (the reference's seqtag
    partitioning, generate_seqtag :1233, generalized).

    Returns (positions sorted by bucket, bucket boundary offsets)."""
    k = min(prefix_bases, readlength, pack.WORD_BASES)
    pref = p16[positions] >> np.uint32(2 * (pack.WORD_BASES - k))
    order = np.argsort(pref, kind="stable")
    positions = positions[order]
    pref = pref[order]
    # bucket boundaries
    diff = np.flatnonzero(pref[1:] != pref[:-1]) + 1
    bounds = np.concatenate([[0], diff, [len(positions)]])
    return positions, bounds


def build_se_index(tx: Transcriptome, readlength_min: int, readlength_max: int,
                   cfg: BuildConfig, backend: str = "jax") -> RshIndex:
    """Build an SE rsh index for a read-length range."""
    # SE: fragment length range == read length range (reference:
    # parse_readlength_range, src/emsar_functions.c:2461-2469)
    fl_min, fl_max = readlength_min, readlength_max
    nfl = fl_max - fl_min + 1
    acc = SignatureAccumulator(tx.n_transcripts, nfl)

    p16 = pack.pack16(tx.codes)
    bad = pack.bad_prefix(tx.codes)
    stranded = cfg.strand.stranded

    for readlength in range(readlength_min, readlength_max + 1):
        fl_ind = readlength - fl_min
        with phase(f"SE readlength {readlength}: windows", cfg.verbose):
            cand = np.arange(0, tx.borderpos - readlength + 1, dtype=np.int64)
            cand = cand[pack.valid_windows(bad, cand, readlength)]
        if cand.size == 0:
            continue
        # partition by sequence prefix so identical windows share a chunk
        prefix_bases = 0 if cand.size <= cfg.chunk_positions else 8
        if prefix_bases:
            cand, bounds = _radix_buckets(p16, cand, readlength, prefix_bases)
        else:
            bounds = np.array([0, cand.size], dtype=np.int64)

        with phase(f"SE readlength {readlength}: sort+scan", cfg.verbose):
            # merge small buckets into chunks
            start = 0
            while start < len(bounds) - 1:
                end = start + 1
                while (end < len(bounds) - 1 and
                       bounds[end + 1] - bounds[start] <= cfg.chunk_positions):
                    end += 1
                pos = cand[bounds[start]:bounds[end]]
                _se_chunk(acc, tx, p16, pos, readlength, fl_ind, stranded,
                          cfg.max_repeat, backend)
                start = end

    sig_offsets, sig_tids, multi_euma = acc.finalize()
    return RshIndex(names=list(tx.names), readlength=-1,
                    min_fraglength=fl_min, max_fraglength=fl_max,
                    single_euma=acc.single, sig_offsets=sig_offsets,
                    sig_tids=sig_tids, multi_euma=multi_euma)


def _se_chunk(acc: SignatureAccumulator, tx: Transcriptome, p16: np.ndarray,
              pos: np.ndarray, readlength: int, fl_ind: int, stranded: bool,
              max_repeat: int, backend: str) -> None:
    fw = pack.window_words_np(p16, pos, readlength)
    if stranded:
        words = fw
    else:
        flip = tx.seqlength - pos - readlength
        rc = pack.window_words_np(p16, flip, readlength)
        _, words = pack.lexmin_words_np(fw, rc)
    tids = tx.transcript_of(pos, readlength)
    _, aux, run_id = sort_runs(words, tids[:, None].astype(np.int32),
                               words.shape[1], backend)
    tids_sorted = aux[:, 0]
    lengths = run_lengths(run_id)

    singles = lengths == 1
    if singles.any():
        smask = singles[run_id]
        acc.add_single(tids_sorted[smask], fl_ind)
    multi = (lengths > 1) & (lengths < max_repeat)
    if multi.any():
        sig_flat, sig_off, _ = _sorted_run_signatures(run_id, tids_sorted, multi)
        fl = np.full(len(sig_off) - 1, fl_ind, dtype=np.int64)
        acc.add_multi_runs(sig_flat, sig_off, fl)


# --------------------------------------------------------------------------
# PE build
# --------------------------------------------------------------------------

def build_pe_index(tx: Transcriptome, readlength: int, cfg: BuildConfig,
                   backend: str = "jax") -> RshIndex:
    """Build a PE rsh index for one read length and a fragment-length range."""
    fl_min = max(cfg.min_fraglength, readlength)
    fl_max = max(cfg.max_fraglength, fl_min)
    nfl = fl_max - fl_min + 1
    acc = SignatureAccumulator(tx.n_transcripts, nfl)

    p16 = pack.pack16(tx.codes)
    bad = pack.bad_prefix(tx.codes)
    stranded = cfg.strand.stranded
    rl = readlength

    with phase("PE: mate1 windows", cfg.verbose):
        fwpos = np.arange(0, tx.borderpos - rl + 1, dtype=np.int64)
        fwpos = fwpos[pack.valid_windows(bad, fwpos, rl)]
        if stranded:
            m1pos = fwpos
        else:
            m1pos = np.concatenate([fwpos, tx.seqlength - fwpos - rl])

    with phase("PE: mate1 sort", cfg.verbose):
        # global sort of mate1 windows into clusters; chunked by prefix
        prefix_bases = 0 if m1pos.size <= cfg.chunk_positions else 8
        if prefix_bases:
            m1pos, bounds = _radix_buckets(p16, m1pos, rl, prefix_bases)
        else:
            bounds = np.array([0, m1pos.size], dtype=np.int64)

        sorted_pos_chunks: List[np.ndarray] = []
        cluster_chunks: List[np.ndarray] = []
        next_cluster = 0
        start = 0
        while start < len(bounds) - 1:
            end = start + 1
            while (end < len(bounds) - 1 and
                   bounds[end + 1] - bounds[start] <= cfg.chunk_positions):
                end += 1
            pos = m1pos[bounds[start]:bounds[end]]
            words = pack.window_words_np(p16, pos, rl)
            # positions fit in int32 (the reference also uses 32-bit offsets)
            _, aux, run_id = sort_runs(words, pos.astype(np.int32)[:, None],
                                       words.shape[1], backend)
            sorted_pos_chunks.append(aux[:, 0].astype(np.int64))
            cluster_chunks.append(run_id.astype(np.int64) + next_cluster)
            next_cluster += int(run_id[-1]) + 1
            start = end
        m1_sorted = np.concatenate(sorted_pos_chunks)
        m1_cluster = np.concatenate(cluster_chunks)

    with phase("PE: mate2 expansion", cfg.verbose):
        _pe_expand(acc, tx, p16, bad, m1_sorted, m1_cluster, rl,
                   fl_min, fl_max, stranded, cfg, backend)

    sig_offsets, sig_tids, multi_euma = acc.finalize()
    return RshIndex(names=list(tx.names), readlength=readlength,
                    min_fraglength=fl_min, max_fraglength=fl_max,
                    single_euma=acc.single, sig_offsets=sig_offsets,
                    sig_tids=sig_tids, multi_euma=multi_euma)


def _pe_expand(acc, tx: Transcriptome, p16, bad, m1pos, m1cluster, rl,
               fl_min, fl_max, stranded, cfg: BuildConfig, backend: str):
    """Expand each mate1 cluster over fragment offsets d and group candidate
    (mate1 sequence, mate2 sequence) pairs."""
    nfl = fl_max - fl_min + 1
    d_lo = fl_min - rl  # >= 0 by clamping
    ds = np.arange(d_lo, fl_max - rl + 1, dtype=np.int64)

    # block boundaries aligned to cluster boundaries
    n = m1pos.shape[0]
    budget = max(cfg.pe_chunk_candidates // max(nfl, 1), 1)
    cluster_starts = np.concatenate(
        [[0], np.flatnonzero(m1cluster[1:] != m1cluster[:-1]) + 1, [n]])

    W = pack.n_words(rl)
    bstart = 0
    while bstart < len(cluster_starts) - 1:
        bend = bstart + 1
        while (bend < len(cluster_starts) - 1 and
               cluster_starts[bend + 1] - cluster_starts[bstart] <= budget):
            bend += 1
        lo, hi = cluster_starts[bstart], cluster_starts[bend]
        _pe_block(acc, tx, p16, bad, m1pos[lo:hi], m1cluster[lo:hi], ds, rl,
                  fl_min, stranded, cfg.max_repeat, W, backend)
        bstart = bend


def _pe_block(acc, tx: Transcriptome, p16, bad, pos, cluster, ds, rl,
              fl_min, stranded, max_repeat, W, backend):
    """Process one block of whole mate1 clusters."""
    B = pos.shape[0]
    nd = ds.shape[0]
    # candidate mate2 positions [B, nd].  The reference requires
    # p + d < seqlength and a canonical mate2 window; windows starting in
    # (seqlength - rl, seqlength) overlap the final '$' and are already
    # non-canonical, so the effective bound is p + d <= seqlength - rl.
    cand = pos[:, None] + ds[None, :]
    in_range = cand <= tx.seqlength - rl
    cand_c = np.minimum(cand, tx.seqlength - rl)
    # mate2 window must be all-ACGT ('@'/'$'-crossing windows are caught too)
    valid = in_range & (pack.valid_windows(bad, cand_c.ravel(), rl)
                        .reshape(B, nd))
    # same transcript in the same half (reference: sf_i equality + the
    # border-crossing guard, src/emsar_functions.c:2856)
    tid1 = tx.transcript_of(pos, rl)
    tid2 = tx.transcript_of(cand_c.ravel(), rl).reshape(B, nd)
    same_half = ~((pos[:, None] < tx.borderpos) & (cand_c > tx.borderpos))
    valid &= (tid2 == tid1[:, None]) & same_half

    if not stranded:
        # canonical pair orientation (reference :2863-2869): compare
        # (m1 at p, m2 at p+d) vs the flipped pair (rc(m2) at flip(p+d),
        # rc(m1) at flip(p)); ties keep the fw-half version.
        flat = cand_c.ravel()
        keep = np.zeros(B * nd, dtype=bool)
        vmask = valid.ravel()
        if vmask.any():
            p_rep = np.repeat(pos, nd)[vmask]
            c_sel = flat[vmask]
            k_m1 = pack.window_words_np(p16, p_rep, rl)
            k_m1f = pack.window_words_np(p16, tx.seqlength - c_sel - rl, rl)
            cmp = pack.lexcmp_words_np(k_m1, k_m1f)
            tie = cmp == 0
            if tie.any():
                k_m2 = pack.window_words_np(p16, c_sel[tie], rl)
                k_m2f = pack.window_words_np(
                    p16, tx.seqlength - p_rep[tie] - rl, rl)
                cmp2 = pack.lexcmp_words_np(k_m2, k_m2f)
                cmp = cmp.copy()
                cmp[tie] = cmp2
            fwhalf = p_rep < tx.borderpos
            keep_v = np.where(fwhalf, cmp <= 0, cmp < 0)
            keep[np.flatnonzero(vmask)] = keep_v
        valid = keep.reshape(B, nd)

    vmask = valid.ravel()
    if not vmask.any():
        return
    m2sel = cand_c.ravel()[vmask]
    cl_sel = np.repeat(cluster, nd)[vmask].astype(np.int64)
    d_sel = np.repeat(ds[None, :], B, axis=0).ravel()[vmask]
    tid_sel = np.repeat(tid1, nd)[vmask]

    # sort by (cluster, mate2 words); carry (d, tid)
    m2w = pack.window_words_np(p16, m2sel, rl)
    cl_lo = cl_sel - cl_sel.min()
    words = np.concatenate([cl_lo.astype(np.uint32)[:, None], m2w], axis=1)
    aux = np.stack([d_sel.astype(np.int32), tid_sel.astype(np.int32)], axis=1)
    _, saux, run_id = sort_runs(words, aux, words.shape[1], backend)
    d_sorted = saux[:, 0].astype(np.int64)
    tid_sorted = saux[:, 1]

    lengths = run_lengths(run_id)
    # fragment length index per run (first element's d)
    run_first = np.zeros(len(lengths), dtype=np.int64)
    first_mask = np.concatenate([[True], run_id[1:] != run_id[:-1]])
    run_first[run_id[first_mask]] = np.flatnonzero(first_mask)
    fl_of_run = d_sorted[run_first] + rl - fl_min

    singles = lengths == 1
    if singles.any():
        smask = singles[run_id]
        acc.add_single(tid_sorted[smask], fl_of_run[run_id[smask]])
    # multi-d runs dropped entirely (reference multi_d filter :1926)
    d_min = np.full(len(lengths), np.iinfo(np.int64).max)
    d_max = np.full(len(lengths), np.iinfo(np.int64).min)
    np.minimum.at(d_min, run_id, d_sorted)
    np.maximum.at(d_max, run_id, d_sorted)
    multi = (lengths > 1) & (lengths < max_repeat) & (d_min == d_max)
    if multi.any():
        sig_flat, sig_off, kept_runs = _sorted_run_signatures(
            run_id, tid_sorted, multi)
        acc.add_multi_runs(sig_flat, sig_off, fl_of_run[kept_runs])
