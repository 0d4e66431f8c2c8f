"""Rebuild total_results.txt from the per-size N<k>_summary.txt files.

The run_experiments driver writes one summary per size as it goes; if a
long multi-size run dies partway (or sizes are re-run individually in
fresh processes), this re-aggregates whatever rows exist - the same
recovery the reference's bash harness performs by re-parsing per-trial
files (comparison/run_experiments.sh:122-166).

Usage: python -m benchmarks.aggregate experiment_results/kway [--algo kway]
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir")
    ap.add_argument("--algo", default=None)
    args = ap.parse_args()
    rows = []
    for f in glob.glob(os.path.join(args.dir, "N*_summary.txt")):
        with open(f) as fh:
            rows.append(json.load(fh))
    rows.sort(key=lambda r: r["N"])
    algo = args.algo or os.path.basename(os.path.normpath(args.dir))
    out = {"algo": algo, "results": rows}
    with open(os.path.join(args.dir, "total_results.txt"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
