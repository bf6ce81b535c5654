"""GPSigRNN architecture gridsearch: H in {8, 32, 128} x dropout in {0, 0.25}.

Double hold-out as in the reference (`run_gprnn_gridsearch.py:14-16`): 20%
of train for early stopping, a further 20% for architecture selection via
validation nlpp.  Winning architectures are written to architectures.json
for the benchmark runners.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from benchmarks.models import train_gpsigrnn_classifier  # noqa: E402

_HERE = os.path.dirname(__file__)
with open(os.path.join(_HERE, "datasets.json")) as f:
    DATASETS = json.load(f)

GRID_H = [8, 32, 128]
# reference sweeps use_dropout in {False, True} (input 0.25 + recurrent
# 0.05 when on, `run_gpsigrnn_gridsearch.py:29-34`)
GRID_D = [0.0, 0.25]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", nargs="*", default=list(DATASETS))
    ap.add_argument("--rnn-type", default="lstm", choices=["lstm", "gru"])
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--epochs-cap", type=int, default=None)
    args = ap.parse_args()
    save_dir = args.save_dir or f"./gridsearch_GPSig{args.rnn_type.upper()}/"

    arch_path = os.path.join(_HERE, "architectures.json")
    arch = json.load(open(arch_path)) if os.path.exists(arch_path) else {}

    for name in args.datasets:
        scores = {}
        for D in GRID_D:
            for H in GRID_H:
                marker = os.path.join(
                    save_dir, f"{name}_H{H}_D{int(D > 0)}.json"
                )
                if os.path.exists(marker):
                    scores[(H, D)] = json.load(open(marker))["val_nlpp"]
                    continue
                res = train_gpsigrnn_classifier(
                    name, rnn_type=args.rnn_type, num_hidden=H, dropout=D,
                    val_split=0.2, test_split=0.2,  # double hold-out
                    experiment_idx=f"H{H}_D{int(D > 0)}", save_dir=save_dir,
                    epochs_cap=args.epochs_cap, seed=0,
                )
                scores[(H, D)] = res["val_nlpp"]
        # reference's selection rule, shared with the reporting script so
        # the report can never contradict the harness
        from benchmarks.process_gridsearch import select

        best_H, best_D = select(scores)
        arch.setdefault(name, {})[f"gpsig{args.rnn_type}"] = {
            "num_hidden": best_H, "dropout": best_D,
        }
        with open(arch_path, "w") as f:
            json.dump(arch, f, indent=2)
        print(f"{name}: best H={best_H} D={best_D} "
              f"(val nlpp {scores[(best_H, best_D)]:.4f})")


if __name__ == "__main__":
    main()
