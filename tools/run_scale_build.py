"""Drive the 337 Mbp human-scale SE l76 device build against the cached
reference golden (bench_cache/scale76.rsh, reference emsar-build: 675 s)."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, "bench_cache")

import jax
from emsar_tpu.utils import jitcache
jitcache.enable(os.path.join(CACHE, "jit_cache"))
os.environ.setdefault("EMSAR_DEVBUILD_PROFILE", "1")

from emsar_tpu.io.fasta import read_fasta
from emsar_tpu.config import BuildConfig, StrandType
from emsar_tpu.index.device_build import build_se_index_device

t0 = time.perf_counter()
tx = read_fasta(os.path.join(CACHE, "scale.fa"), "E")
print(f"[scale] fasta read: {time.perf_counter()-t0:.1f}s  "
      f"{tx.n_transcripts} tx, {tx.borderpos/1e6:.0f} M fw chars", flush=True)

cfg = BuildConfig(verbose=2)
cfg.strand = StrandType.parse("ns", False)
t0 = time.perf_counter()
idx = build_se_index_device(tx, 76, 76, cfg)
t_build = time.perf_counter() - t0
print(f"[scale] device build: {t_build:.1f}s", flush=True)

ours = os.path.join(CACHE, "scale76.ours.rsh")
t0 = time.perf_counter()
idx.write_text(ours)
print(f"[scale] write: {time.perf_counter()-t0:.1f}s", flush=True)
same = open(ours, "rb").read() == open(os.path.join(CACHE, "scale76.rsh"), "rb").read()
print(f"RESULT build={t_build:.1f}s identical={same} (reference: 675s)", flush=True)
