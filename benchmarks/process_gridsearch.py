"""Aggregate gridsearch results: per-dataset (H, D) validation-nlpp tables,
the winning architecture under the reference's 10%-tolerance rule, and a
summary of how often each architecture wins.

Script equivalent of the reference's `process_gridsearch.ipynb` (the
*selection* rule itself also lives inside the gridsearch runners, which
write winners to `architectures.json`; this script reproduces the notebook's
reporting tables from the raw marker files).

Marker layout (written by run_gpsigrnn_gridsearch.py / run_gprnn_gridsearch
.py): ``<save_dir>/<dataset>_H<H>_D<0|1>.json`` with val_nlpp/val_acc.
"""

import argparse
import glob
import json
import os
import re
from collections import Counter, defaultdict

import numpy as np

_MARKER = re.compile(r"^(?P<ds>.+)_H(?P<H>\d+)_D(?P<D>[01])$")


def collect(result_dir):
    """{dataset: {(H, D): {"val_nlpp": ..., "val_acc": ...}}}"""
    grids = defaultdict(dict)
    for path in glob.glob(os.path.join(result_dir, "*.json")):
        stem = os.path.basename(path)[: -len(".json")]
        m = _MARKER.match(stem)
        if not m:
            continue
        with open(path) as f:
            res = json.load(f)
        if "val_nlpp" not in res:
            continue
        grids[m.group("ds")][(int(m.group("H")), int(m.group("D")))] = res
    return grids


def select(scores, tol=0.1):
    """Reference selection rule (`process_gridsearch.ipynb` cell 7):
    smallest architecture within ``tol`` of the best validation nlpp.
    Architectures are ordered by (H, D); ties break toward smaller."""
    best = min(scores.values())
    ok = sorted(hd for hd, v in scores.items() if v <= (1 + tol) * best)
    return ok[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("result_dirs", nargs="+",
                    help="gridsearch save dirs, e.g. ./gridsearch_GPSigLSTM")
    ap.add_argument("--tol", type=float, default=0.1,
                    help="nlpp tolerance of the selection rule")
    args = ap.parse_args()

    for rdir in args.result_dirs:
        grids = collect(rdir)
        if not grids:
            print(f"{rdir}: no gridsearch markers found")
            continue
        archs = sorted({hd for g in grids.values() for hd in g})
        print(f"== {rdir} (val nlpp; * = selected @ {args.tol:.0%} rule) ==")
        header = "dataset".ljust(24) + "".join(
            f"H{h}/D{d}".rjust(12) for h, d in archs
        )
        print(header)
        wins = Counter()
        for ds in sorted(grids):
            scores = {hd: g["val_nlpp"] for hd, g in grids[ds].items()}
            pick = select(scores, args.tol)
            wins[pick] += 1
            row = ds.ljust(24)
            for hd in archs:
                if hd in scores:
                    mark = "*" if hd == pick else " "
                    row += f"{scores[hd]:11.3f}{mark}"
                else:
                    row += f"{'—':>12}"
            print(row)
        print()
        for hd, n in wins.most_common():
            print(f"H={hd[0]} D={hd[1]}: selected for {n} dataset(s)")
        nlpps = [min(g["val_nlpp"] for g in grids[ds].values())
                 for ds in grids]
        print(f"mean best val nlpp: {np.mean(nlpps):.4f}")
        print()


if __name__ == "__main__":
    main()
