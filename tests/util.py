"""Test utilities: random transcriptome fixtures and reference-binary oracles."""

from __future__ import annotations

import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

REF_EMSAR = "/root/reference/src/emsar"
REF_EMSAR_BUILD = "/root/reference/src/emsar-build"

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_transcriptome(rng: np.random.Generator, n: int,
                         min_len: int = 30, max_len: int = 400,
                         n_frac: float = 0.0,
                         shared_frac: float = 0.0) -> Tuple[List[str], List[bytes]]:
    """Random transcript sequences; optionally inject shared subsequences
    (copy a slice of a previous transcript) and 'N' bases."""
    names = [f"T{i:04d}" for i in range(n)]
    seqs: List[bytes] = []
    for i in range(n):
        L = int(rng.integers(min_len, max_len + 1))
        arr = BASES[rng.integers(0, 4, size=L)]
        if i > 0 and rng.random() < shared_frac:
            src = seqs[int(rng.integers(0, i))]
            if len(src) > 20:
                a = int(rng.integers(0, len(src) - 20))
                b = int(rng.integers(a + 20, len(src) + 1))
                piece = np.frombuffer(src[a:b], dtype=np.uint8)
                at = int(rng.integers(0, max(L - len(piece), 0) + 1))
                arr = np.concatenate([arr[:at], piece, arr[at + len(piece):]])[:L] \
                    if len(piece) <= L else piece[:L]
        if n_frac > 0:
            mask = rng.random(arr.shape[0]) < n_frac
            arr = arr.copy()
            arr[mask] = ord("N")
        seqs.append(arr.tobytes())
    return names, seqs


def write_fasta(path: str, names: List[str], seqs: List[bytes],
                width: int = 60) -> None:
    with open(path, "w") as fh:
        for name, seq in zip(names, seqs):
            fh.write(f">{name}\n")
            s = seq.decode("latin-1")
            for i in range(0, len(s), width):
                fh.write(s[i:i + width] + "\n")


def run_ref_build(fasta: str, readlength: str, outdir: str, prefix: str,
                  pe: bool = False, extra: Optional[List[str]] = None) -> str:
    """Run the reference emsar-build; returns path to the .rsh file."""
    cmd = [REF_EMSAR_BUILD, "-q"]
    if pe:
        cmd.append("--PE")
    cmd += extra or []
    cmd += [fasta, str(readlength), outdir, prefix]
    subprocess.run(cmd, check=True, capture_output=True)
    return os.path.join(outdir, prefix + ".rsh")


def run_ref_emsar(args: List[str]) -> subprocess.CompletedProcess:
    return subprocess.run([REF_EMSAR] + args, check=True, capture_output=True)
