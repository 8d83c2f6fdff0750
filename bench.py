"""Benchmark: end-to-end quantification vs the reference C binary.

Workload: a synthetic transcriptome with heavy sequence sharing (the regime
the MLE phase is sensitive to), SE reads, same .rsh index (built by the
reference binary) and same bowtie-format alignment file fed to both:

  * reference: committed x86-64 `emsar` binary, best of -p1/-p2 wall time
  * ours: in-process pipeline (host ingest + device EM), steady-state
    (second run, warm jit cache)

Prints ONE JSON line:
  {"metric": "e2e_quantify_speedup_vs_ref_C", "value": X, "unit": "x",
   "vs_baseline": X}
vs_baseline == value: the baseline IS the reference binary at 1.0.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

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

    log("generating fixture (transcriptome + index + alignments)...")
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
    from emsar_tpu.io.fasta import revcomp_bytes
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


def time_reference(rsh, aln):
    best = float("inf")
    for p in ("2", "1"):
        t0 = time.perf_counter()
        subprocess.run([REF_EMSAR, "-q", "-p", p, "-I", rsh,
                        os.path.join(CACHE, "refout"), "s", aln],
                       check=True, capture_output=True)
        dt = time.perf_counter() - t0
        log(f"reference -p {p}: {dt:.2f}s")
        best = min(best, dt)
    return best


def run_ours(rsh, aln, platform):
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
        log(f"ours run {rep}: {dt:.2f}s  phases: " +
            ", ".join(f"{k.split(' ')[0]}={v:.2f}" for k, v in ph.items()))
    return min(times), outdir


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
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_enable_x64", platform == "cpu")

    fasta, rsh, aln = ensure_fixture()
    t_ref = time_reference(rsh, aln)
    t_ours, outdir = run_ours(rsh, aln, platform)
    tdiff, gdiff = tpm_maxdiff(os.path.join(CACHE, "refout", "s.0.fpkm"),
                               os.path.join(outdir, "s.0.fpkm"))
    log(f"reference: {t_ref:.2f}s  ours: {t_ours:.2f}s  TPM maxdiff: "
        f"transcript {tdiff:.2f} (non-identifiable axis), gene {gdiff:.4f}")
    speedup = t_ref / t_ours
    print(json.dumps({"metric": "e2e_quantify_speedup_vs_ref_C",
                      "value": round(speedup, 3), "unit": "x",
                      "vs_baseline": round(speedup, 3)}))


if __name__ == "__main__":
    main()
