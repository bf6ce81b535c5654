"""Generate dataset metadata (datasets.json) from the .mat archives.

Script equivalent of the reference's `process_datasets.ipynb`: scans the
downloaded UEA archives and records train/test sizes, class counts, length
ranges and feature dims used by the runners and result tables.
"""

import argparse
import glob
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir",
                    default=os.path.join(os.path.dirname(__file__), "datasets"))
    ap.add_argument("--out",
                    default=os.path.join(os.path.dirname(__file__),
                                         "datasets.json"))
    args = ap.parse_args()

    from scipy.io import loadmat

    meta = {}
    for path in sorted(glob.glob(os.path.join(args.data_dir, "*.mat"))):
        name = os.path.splitext(os.path.basename(path))[0]
        data = loadmat(path)
        X_train = np.squeeze(data["X_train"])
        X_test = np.squeeze(data["X_test"])
        y_train = np.squeeze(data["y_train"])
        lens = [x.shape[0] for x in X_train] + [x.shape[0] for x in X_test]
        meta[name] = {
            "num_train": int(len(X_train)),
            "num_test": int(len(X_test)),
            "num_classes": int(np.unique(y_train.astype(np.int64)).size),
            "len_range": [int(min(lens)), int(max(lens))],
            "num_features": int(X_train[0].shape[1]),
        }
        print(f"{name}: {meta[name]}")

    with open(args.out, "w") as f:
        json.dump(meta, f, indent=2)
    print(f"wrote {len(meta)} entries to {args.out}")


if __name__ == "__main__":
    main()
