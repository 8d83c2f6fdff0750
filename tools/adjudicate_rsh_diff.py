"""Adjudicate .rsh diffs against gene-local ground truth.

The reference's threaded PE build (-p 2) provably loses bucket
increments at human scale (its own -p 1 output differs;
BASELINE_MEASURED round-4, race analysis in the round-1 notes:
update_rshbucket rows are keyed by a signature's first tid while threads
shard clusters by min_tid % MAX_Thread, src/emsar_functions.c:2839).
When our build differs from a -p 2 golden, this tool re-derives the
ground truth for every differing row:

1. stream-diff the two .rsh files row by row (same row grid is expected
   — the race only changes EUMA values, not which signatures exist);
2. map the affected tids to their genes (fixture names are G%05dT%d and
   the gene-family generator shares sequence only within a gene, so
   per-gene EUMA decomposes exactly);
3. extract those genes' isoforms into a sub-fasta, run the reference
   binary SINGLE-THREADED on it (the trustworthy configuration), and
   compare the affected rows' EUMA vectors against both inputs.

Usage: python tools/adjudicate_rsh_diff.py ours.rsh golden.rsh fasta \
            [--pe] [--rl N] [--fmin N] [--fmax N] [-s ssfr]
Prints one verdict line per differing row and a summary.
"""
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BUILD = "/root/reference/src/emsar-build"


def stream_rows(path):
    """Yield (row_key, euma_str, raw_line) for data rows; row_key =
    (ntids, first_tid, other_tids_str)."""
    with open(path, buffering=1 << 22) as fh:
        for ln in fh:
            if ln.startswith(("#", "@", "cid")):
                continue
            f = ln.rstrip("\n").split("\t")
            yield (f[1], f[2], f[3]), f[4], ln


def load_names(path):
    names = []
    with open(path, buffering=1 << 22) as fh:
        for ln in fh:
            if ln.startswith("@"):
                names.append(ln.rstrip("\n").split("\t")[1])
            elif not ln.startswith("#"):
                break
    return names


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    ours_p, golden_p, fasta_p = args[:3]
    pe = "--pe" in sys.argv
    def opt(flag, default):
        return (sys.argv[sys.argv.index(flag) + 1]
                if flag in sys.argv else default)
    rl = opt("--rl", "101")
    fmin = opt("--fmin", "1")
    fmax = opt("--fmax", "400")
    strand = opt("-s", "ssfr")

    names = load_names(ours_p)
    diffs = []
    for (ka, ea, la), (kb, eb, lb) in zip(stream_rows(ours_p),
                                          stream_rows(golden_p)):
        if ka != kb:
            print(f"ROW GRID MISMATCH: ours={ka} golden={kb}")
            sys.exit(2)
        if ea != eb:
            diffs.append((ka, ea, eb))
    print(f"{len(diffs)} differing rows")
    if not diffs:
        return

    # affected genes
    genes = set()
    for (nt, first, others), _, _ in [(d[0], d[1], d[2]) for d in diffs]:
        tids = [int(first)] + [int(x) for x in others.split(",") if x]
        for t in tids:
            genes.add(names[t].split("T")[0])
    print(f"affected genes: {sorted(genes)}")

    # sub-fasta of those genes
    tmpd = tempfile.mkdtemp(prefix="adjudicate_")
    sub_fa = os.path.join(tmpd, "sub.fa")
    keepmap = {}
    with open(fasta_p, buffering=1 << 22) as fh, open(sub_fa, "w") as out:
        keep = False
        for ln in fh:
            if ln.startswith(">"):
                nm = ln[1:].split()[0]
                keep = nm.split("T")[0] in genes
                if keep:
                    keepmap[nm] = len(keepmap)
            if keep:
                out.write(ln)
    print(f"sub-fasta: {len(keepmap)} transcripts -> {sub_fa}")

    cmd = [REF_BUILD, "-q", "-p", "1"]
    if pe:
        cmd += ["--PE"]
    if strand != "ns":
        cmd += ["-s", strand]
    cmd += ["-f", fmin, "-F", fmax, sub_fa, rl, tmpd, "truth"]
    print("running reference -p 1 on the sub-fasta...", flush=True)
    subprocess.run(cmd, check=True)

    truth_p = os.path.join(tmpd, "truth.rsh")
    sub_names = load_names(truth_p)
    sub_of_name = {n: i for i, n in enumerate(sub_names)}
    truth_rows = {}
    for key, euma, _ in stream_rows(truth_p):
        truth_rows[key] = euma

    ours_right = golden_right = neither = 0
    for (nt, first, others), ea, eb in diffs:
        tids = [int(first)] + [int(x) for x in others.split(",") if x]
        loc = [sub_of_name[names[t]] for t in tids]
        key = (nt, str(loc[0]), "".join(f"{t}," for t in loc[1:]))
        truth = truth_rows.get(key)
        if truth is None:
            print(f"row {tids}: NOT FOUND in sub-truth (cross-gene "
                  f"sharing?)")
            neither += 1
            continue
        if truth == ea and truth != eb:
            ours_right += 1
            verdict = "OURS match truth; golden (-p2) lost counts"
        elif truth == eb and truth != ea:
            golden_right += 1
            verdict = "GOLDEN matches truth; OURS WRONG"
        elif truth == ea and truth == eb:
            verdict = "both match truth (?)"
        else:
            neither += 1
            verdict = "NEITHER matches truth"
        print(f"row ntids={nt} tids={tids}: {verdict}")
    print(f"SUMMARY: ours_right={ours_right} golden_right={golden_right} "
          f"neither={neither} of {len(diffs)} diffs")


if __name__ == "__main__":
    main()
