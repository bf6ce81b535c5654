"""Aggregate benchmark results: mean +/- std accuracy/nlpp tables and ranks.

Script equivalent of the reference's `process_benchmarks.ipynb`: reads the
per-experiment JSON results written by the runners and prints the summary
tables (and average ranks across models when several result dirs are given).
"""

import argparse
import glob
import json
import os
from collections import defaultdict

import numpy as np


def collect(result_dir):
    per_dataset = defaultdict(lambda: {"acc": [], "nlpp": []})
    for path in glob.glob(os.path.join(result_dir, "*.json")):
        name = os.path.basename(path).rsplit("_", 1)[0]
        with open(path) as f:
            res = json.load(f)
        if "test_acc" in res:
            per_dataset[name]["acc"].append(res["test_acc"])
            per_dataset[name]["nlpp"].append(res["test_nlpp"])
    return per_dataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("result_dirs", nargs="+",
                    help="one dir per model, e.g. ./GPSig ./GPSigLSTM")
    args = ap.parse_args()

    models = {os.path.basename(os.path.normpath(d)): collect(d)
              for d in args.result_dirs}
    datasets = sorted({k for m in models.values() for k in m})

    header = "dataset".ljust(24) + "".join(
        f"{m:>24}" for m in models
    )
    print(header)
    acc_table = {}
    for ds in datasets:
        row = ds.ljust(24)
        accs = {}
        for mname, data in models.items():
            if ds in data and data[ds]["acc"]:
                a = np.asarray(data[ds]["acc"])
                n = np.asarray(data[ds]["nlpp"])
                row += f"  {a.mean():.3f}±{a.std():.3f}/{n.mean():.3f}"
                accs[mname] = a.mean()
            else:
                row += f"{'—':>24}"
        acc_table[ds] = accs
        print(row)

    # mean and average rank over datasets (higher acc = better rank)
    print()
    for mname in models:
        vals = [acc_table[ds][mname] for ds in datasets
                if mname in acc_table[ds]]
        if vals:
            print(f"{mname}: mean acc {np.mean(vals):.4f}")
    ranks = defaultdict(list)
    for ds in datasets:
        entries = acc_table[ds]
        if len(entries) < 2:
            continue
        order = sorted(entries, key=entries.get, reverse=True)
        for r, mname in enumerate(order, start=1):
            ranks[mname].append(r)
    for mname, rs in ranks.items():
        print(f"{mname}: avg rank {np.mean(rs):.2f}")


if __name__ == "__main__":
    main()
