"""GPKConv1D baseline benchmark sweep."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from benchmarks.models import train_gpkconv1d_classifier  # noqa: E402

_HERE = os.path.dirname(__file__)
with open(os.path.join(_HERE, "datasets.json")) as f:
    DATASETS = json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", nargs="*", default=list(DATASETS))
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--save-dir", default="./GPKConv1D/")
    ap.add_argument("--epochs-cap", type=int, default=None)
    args = ap.parse_args()

    for r in range(args.repeats):
        for name in args.datasets:
            marker = os.path.join(args.save_dir, f"{name}_{r}.json")
            if os.path.exists(marker):
                print(f"skip {name}_{r} (exists)")
                continue
            train_gpkconv1d_classifier(
                name, val_split=0.1, experiment_idx=r,
                save_dir=args.save_dir, epochs_cap=args.epochs_cap, seed=r,
            )


if __name__ == "__main__":
    main()
