"""GPRNN baseline benchmark sweep."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from benchmarks.models import train_gprnn_classifier  # noqa: E402

_HERE = os.path.dirname(__file__)
with open(os.path.join(_HERE, "datasets.json")) as f:
    DATASETS = json.load(f)


def _best_arch(name, rnn_type, default_hidden):
    """Gridsearch results first, then the reference's shipped table
    (`architectures.json`: GRU/LSTM entries with H / D flags)."""
    path = os.path.join(_HERE, "architectures.json")
    if os.path.exists(path):
        with open(path) as f:
            arch = json.load(f)
        key = f"gprnn{rnn_type}"
        if name in arch and key in arch[name]:
            return arch[name][key]
        ref_key = {"lstm": "LSTM", "gru": "GRU"}[rnn_type]
        if ref_key in arch and name in arch[ref_key]:
            hd = arch[ref_key][name]
            return {"num_hidden": int(hd["H"]),
                    "dropout": 0.25 if hd.get("D") else 0.0}
    return {"num_hidden": default_hidden, "dropout": 0.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", nargs="*", default=list(DATASETS))
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--rnn-type", default="lstm", choices=["lstm", "gru"])
    ap.add_argument("--num-hidden", type=int, default=32)
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--epochs-cap", type=int, default=None)
    args = ap.parse_args()
    save_dir = args.save_dir or f"./GP{args.rnn_type.upper()}/"

    for r in range(args.repeats):
        for name in args.datasets:
            marker = os.path.join(save_dir, f"{name}_{r}.json")
            if os.path.exists(marker):
                print(f"skip {name}_{r} (exists)")
                continue
            arch = _best_arch(name, args.rnn_type, args.num_hidden)
            train_gprnn_classifier(
                name, rnn_type=args.rnn_type,
                num_hidden=int(arch["num_hidden"]),
                dropout=float(arch.get("dropout", 0.0)),
                val_split=0.1, experiment_idx=r, save_dir=save_dir,
                epochs_cap=args.epochs_cap, seed=r,
            )


if __name__ == "__main__":
    main()
