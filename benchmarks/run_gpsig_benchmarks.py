"""GPSig benchmark sweep: 5 repeats x 16 UEA datasets.

Equivalent of the reference's `benchmarks/run_gpsig_benchmarks.py` (which
takes a GPU id from argv — device selection here is JAX's; run under the
TPU platform).  Resumes by skipping experiments whose result file exists.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from benchmarks.models import train_gpsig_classifier  # noqa: E402

with open(os.path.join(os.path.dirname(__file__), "datasets.json")) as f:
    DATASETS = json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", nargs="*", default=list(DATASETS))
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--save-dir", default="./GPSig/")
    ap.add_argument("--epochs-cap", type=int, default=None)
    ap.add_argument("--num-levels", type=int, default=4)
    ap.add_argument("--num-inducing", type=int, default=500)
    ap.add_argument("--max-len", type=int, default=500)
    ap.add_argument("--num-lags", type=int, default=1)
    ap.add_argument("--data-dir", default=None,
                    help="directory with <name>.mat files (e.g. "
                         "benchmarks/datasets after make_synthetic.py)")
    args = ap.parse_args()

    for r in range(args.repeats):
        for name in args.datasets:
            marker = os.path.join(args.save_dir, f"{name}_{r}.json")
            if os.path.exists(marker):
                print(f"skip {name}_{r} (exists)")
                continue
            train_gpsig_classifier(
                name, num_levels=args.num_levels,
                num_inducing=args.num_inducing, max_len=args.max_len,
                num_lags=args.num_lags, increments=True,
                val_split=0.1, experiment_idx=r, save_dir=args.save_dir,
                epochs_cap=args.epochs_cap, data_dir=args.data_dir, seed=r,
            )


if __name__ == "__main__":
    main()
