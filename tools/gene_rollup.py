"""Gene-level post-processing: Python equivalents of the reference's Perl
utilities (util/FPKM2gFPKM.pl, merge_gReadcount.pl, merge_gTPM.pl,
post_processing.pl), same column layouts.

Usage:
    python -m tools.gene_rollup fpkm2gfpkm  <g2tfile> <fpkmfile>
    python -m tools.gene_rollup merge-readcount <gfpkm...>
    python -m tools.gene_rollup merge-tpm       <gfpkm...>
    python -m tools.gene_rollup post-process <fpkm_dir> <g2tfile>
"""

from __future__ import annotations

import glob
import os
import sys
from typing import Dict, List


def _round_off(x: float) -> int:
    i = int(x)
    return i + 1 if x - i >= 0.5 else i


def read_g2t(path: str) -> Dict[str, str]:
    t2g = {}
    with open(path) as fh:
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2:
                t2g[parts[1]] = parts[0]
    return t2g


def fpkm2gfpkm(g2tfile: str, fpkmfile: str, out=sys.stdout) -> None:
    """Sum FPKM / iReadcount / TPM per gene (columns 1, 4, 6 of .fpkm)."""
    t2g = read_g2t(g2tfile)
    g_fpkm: Dict[str, float] = {}
    g_rc: Dict[str, float] = {}
    g_tpm: Dict[str, float] = {}
    with open(fpkmfile) as fh:
        next(fh)
        for line in fh:
            f = line.rstrip("\n").split("\t")
            g = t2g.get(f[0])
            if g is None:
                continue
            g_fpkm[g] = g_fpkm.get(g, 0.0) + float(f[1])
            g_rc[g] = g_rc.get(g, 0.0) + float(f[4])
            g_tpm[g] = g_tpm.get(g, 0.0) + float(f[6])
    out.write("geneID\tFPKM\tiReadcount\tiReadcount.int\tTPM\n")
    for g in g_fpkm:
        out.write(f"{g}\t{g_fpkm[g]}\t{g_rc[g]}\t{_round_off(g_rc[g])}\t"
                  f"{g_tpm[g]}\n")


def _common_suffix(files: List[str]) -> str:
    if len(files) == 1:
        return ""
    minlen = min(len(f) for f in files)
    k = 0
    while k < minlen and len({f[len(f) - k - 1:] for f in files}) == 1:
        k += 1
    return files[0][len(files[0]) - k:] if k else ""


def merge_column(files: List[str], col: int, out=sys.stdout) -> None:
    """Merge one column across per-sample tables (reference
    merge_gReadcount.pl col 3 / merge_gTPM.pl col 4)."""
    table: Dict[str, List[str]] = {}
    for i, path in enumerate(files):
        with open(path) as fh:
            next(fh)
            for line in fh:
                f = line.rstrip("\n").split("\t")
                table.setdefault(f[0], ["0"] * len(files))[i] = f[col]
    suffix = _common_suffix(files)
    titles = []
    for f in files:
        base = os.path.basename(f)
        titles.append(base[: len(base) - len(suffix)] if suffix and
                      base.endswith(suffix) else f)
    out.write("ID\t" + "\t".join(titles) + "\n")
    for gid, vals in table.items():
        out.write(gid + "\t" + "\t".join(vals) + "\n")


def post_process(fpkm_dir: str, g2tfile: str) -> None:
    """For each .fpkm in dir: write .gfpkm; then merge gReadcount.all and
    TPM.all (reference post_processing.pl)."""
    fpkms = sorted(glob.glob(os.path.join(fpkm_dir, "*.fpkm")))
    gfpkms = []
    for f in fpkms:
        out_path = f[: -len(".fpkm")] + ".gfpkm"
        with open(out_path, "w") as out:
            fpkm2gfpkm(g2tfile, f, out)
        gfpkms.append(out_path)
    with open(os.path.join(fpkm_dir, "gReadcount.all"), "w") as out:
        merge_column(gfpkms, 3, out)
    with open(os.path.join(fpkm_dir, "TPM.all"), "w") as out:
        merge_column(gfpkms, 4, out)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__)
        return 1
    cmd, args = argv[0], argv[1:]
    if cmd == "fpkm2gfpkm":
        fpkm2gfpkm(args[0], args[1])
    elif cmd == "merge-readcount":
        merge_column(args, 3)
    elif cmd == "merge-tpm":
        merge_column(args, 4)
    elif cmd == "post-process":
        post_process(args[0], args[1])
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
