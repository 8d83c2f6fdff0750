"""Per-transcript uniqueness / GC statistics from a .segments file.

Python equivalent of the reference util/transcript_stats.3.pl: for each
transcript, how much of its effective length is isoform-unique,
gene-unique, or shared across genes.

Usage: python -m tools.transcript_stats <fastafile> <segmentfile> <g2tfile>
"""

from __future__ import annotations

import sys
from typing import Dict

from tools.gene_rollup import read_g2t


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 3:
        print(__doc__)
        return 1
    fastafile, segmentfile, g2tfile = argv[:3]

    t2g = read_g2t(g2tfile)
    n_isoforms: Dict[str, int] = {}
    for t, g in t2g.items():
        n_isoforms[g] = n_isoforms.get(g, 0) + 1

    # transcript length + GC from the fasta (Ensembl-style headers)
    tlen: Dict[str, int] = {}
    gc: Dict[str, float] = {}
    header = None
    seqlen = gccount = 0
    with open(fastafile) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if header is not None and seqlen:
                    tlen[header] = seqlen
                    gc[header] = gccount / seqlen
                header = line[1:].split()[0]
                seqlen = gccount = 0
            else:
                seqlen += len(line)
                gccount += sum(line.count(c) for c in "CGcg")
    if header is not None and seqlen:
        tlen[header] = seqlen
        gc[header] = gccount / seqlen

    single: Dict[str, float] = {}
    multi: Dict[str, float] = {}
    unique_len: Dict[str, float] = {}
    g_euma: Dict[str, float] = {}
    with open(segmentfile) as fh:
        next(fh)
        for line in fh:
            f = line.rstrip("\n").split("\t")
            tnames = f[3].split("+")
            euma = float(f[4])
            genes = {t2g.get(t) for t in tnames}
            is_multi_gene = len(genes) > 1
            for t in tnames:
                if is_multi_gene:
                    multi[t] = multi.get(t, 0.0) + euma
                else:
                    single[t] = single.get(t, 0.0) + euma
            g0 = t2g.get(tnames[0])
            if not is_multi_gene and g0 is not None and \
                    len(tnames) == n_isoforms.get(g0, -1):
                g_euma[g0] = g_euma.get(g0, 0.0) + euma
            if len(tnames) == 1:
                unique_len[tnames[0]] = unique_len.get(tnames[0], 0.0) + euma

    print("transcript_id\tgene\ttranscript_length\tGC_content\tnIsoforms\t"
          "total_effective_length\tisoform_unique_length\t"
          "gene_unique_length\tmulti_gene_length\t"
          "gene_unique_isoform_common_length\tisoform_unique_proportion\t"
          "gene_unique_proportion\tgene_unique_isoform_common_proportion")
    for t, g in t2g.items():
        u = unique_len.get(t, 0.0)
        m = multi.get(t, 0.0)
        s = single.get(t, 0.0)
        ge = g_euma.get(g, 0.0)
        total = m + s
        if total > 0:
            props = (u / total, s / total, ge / total)
            props = "\t".join(str(p) for p in props)
        else:
            props = "NA\tNA\tNA"
        print(f"{t}\t{g}\t{tlen.get(t, 0)}\t{gc.get(t, 0)}\t"
              f"{n_isoforms.get(g, 0)}\t{total}\t{u}\t{s}\t{m}\t{ge}\t{props}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
