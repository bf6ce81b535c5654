"""Deterministic synthetic UEA-style ``.mat`` dataset generator.

The reference fetches the real UEA archive with
`benchmarks/datasets/download_data.sh` (wget from Dropbox) — not possible in
an egress-free environment.  This generator produces a LIBRAS-like dataset
(15 classes of 2-D hand-movement-style curves, 45 frames each — the shape
facts from `benchmarks/datasets.json`) in the exact ``.mat`` layout the
loaders expect (`X_train/y_train/X_test/y_test`, object arrays of (L, d)
float matrices), so the whole benchmark harness — runners, trainers, result
processing — can be driven end-to-end in-env:

    python benchmarks/datasets/make_synthetic.py            # writes here
    python benchmarks/run_gpsig_benchmarks.py --datasets SyntheticLibras \
        --data-dir benchmarks/datasets --repeats 1 --epochs-cap 2 ...
    python benchmarks/process_benchmarks.py ./GPSig

Classes are parametric curves (frequency/phase/rotation families) with
observation noise; accuracy on the full recipe should be >= ~0.9, pinned by
``tests/test_recipe_golden.py``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def make_synthetic_libras(num_classes: int = 15, per_class_train: int = 12,
                          per_class_test: int = 6, length: int = 45,
                          noise: float = 0.03, seed: int = 0):
    """Returns (X_train, y_train, X_test, y_test) as object arrays/labels."""
    rng = np.random.RandomState(seed)

    def curve(c, n_draws):
        out = []
        t = np.linspace(0.0, 1.0, length)
        freq = 1.0 + (c % 5)
        phase = 2.0 * np.pi * (c // 5) / 3.0
        for _ in range(n_draws):
            a = 0.8 + 0.4 * rng.rand()
            x = a * np.cos(2 * np.pi * freq * t + phase)
            y = a * np.sin(2 * np.pi * freq * t * (1.0 if c % 2 else 0.5))
            arc = np.stack([x, y], axis=1)
            rot = 0.1 * rng.randn()
            R = np.array([[np.cos(rot), -np.sin(rot)],
                          [np.sin(rot), np.cos(rot)]])
            out.append(arc @ R.T + noise * rng.randn(length, 2))
        return out

    def block(per_class):
        X, y = [], []
        for c in range(num_classes):
            for arr in curve(c, per_class):
                X.append(arr)
                y.append(c + 1)  # UEA labels are 1-based; loader re-indexes
        Xo = np.empty(len(X), dtype=object)
        for i, x in enumerate(X):
            Xo[i] = x
        return Xo, np.asarray(y, dtype=np.float64)

    X_train, y_train = block(per_class_train)
    X_test, y_test = block(per_class_test)
    return X_train, y_train, X_test, y_test


def write_mat(path: str, **kwargs):
    from scipy.io import savemat

    X_train, y_train, X_test, y_test = make_synthetic_libras(**kwargs)
    savemat(path, {"X_train": X_train, "y_train": y_train,
                   "X_test": X_test, "y_test": y_test})
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default=os.path.dirname(__file__) or ".")
    ap.add_argument("--name", default="SyntheticLibras")
    ap.add_argument("--classes", type=int, default=15)
    ap.add_argument("--per-class-train", type=int, default=12)
    ap.add_argument("--per-class-test", type=int, default=6)
    ap.add_argument("--length", type=int, default=45)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    path = os.path.join(args.out_dir, f"{args.name}.mat")
    write_mat(path, num_classes=args.classes,
              per_class_train=args.per_class_train,
              per_class_test=args.per_class_test, length=args.length,
              seed=args.seed)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
