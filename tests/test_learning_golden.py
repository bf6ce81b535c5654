"""A golden that demonstrably LEARNS (VERDICT r3 item 7).

The six default recipe goldens run epochs_cap=2 on 24 examples and pin the
*pipeline trajectory*, not learning (multiclass test_acc 0.667 is barely
above chance).  This mid-size recipe — 201 train examples, 3 classes,
epochs_cap=25 — reaches test accuracy 1.0 vs 0.333 chance (pinned run:
acc 1.000, nlpp 0.004, ~105 s standalone on this box's single core), so a
regression that silently breaks optimization (dead gradients, mis-masked
phases, broken minibatch stream) fails loudly here.

Marked `slow`: excluded from the default suite (pytest.ini), run with
``pytest -m slow``.
"""

import os
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(_HERE, os.pardir))
sys.path.insert(0, os.path.join(_HERE, os.pardir, "benchmarks", "datasets"))


@pytest.mark.slow
def test_gpsig_recipe_learns_on_midsize_synthetic(tmp_path):
    from make_synthetic import write_mat

    from benchmarks.models import train_gpsig_classifier

    write_mat(str(tmp_path / "SyntheticLibras.mat"), num_classes=3,
              per_class_train=67, per_class_test=20, length=24, seed=0)
    res = train_gpsig_classifier(
        "SyntheticLibras", num_levels=3, num_inducing=40, increments=True,
        minibatch_size=32, max_len=24, num_lags=None, val_split=0.2,
        data_dir=str(tmp_path), save_dir=str(tmp_path / "out"),
        epochs_cap=25, experiment_idx=0, seed=0)
    # learning claim: far above 1/3 chance, with margin (pinned: 1.000)
    assert res["test_acc"] >= 0.9, res
    # calibration claim: nlpp near the pinned 0.004 (band covers legitimate
    # numeric drift; a no-learning run sits at ~log(3) = 1.1)
    assert res["test_nlpp"] <= 0.15, res
    assert np.isfinite(res["val_nlpp"]) and res["val_acc"] >= 0.9, res


@pytest.mark.slow
def test_flagship_lags_config_learns(tmp_path):
    """The reference's flagship GPSig configuration (num_lags=1,
    incremental inducing tensors — `benchmarks/run_gpsig_benchmarks.py:
    32-33`) demonstrably learns end-to-end (pinned run: test acc 1.000,
    nlpp 0.0036)."""
    from make_synthetic import write_mat

    from benchmarks.models import train_gpsig_classifier

    write_mat(str(tmp_path / "SyntheticLibras.mat"), num_classes=3,
              per_class_train=67, per_class_test=20, length=24, seed=0)
    res = train_gpsig_classifier(
        "SyntheticLibras", num_levels=3, num_inducing=40, increments=True,
        minibatch_size=32, max_len=24, num_lags=1, val_split=0.2,
        data_dir=str(tmp_path), save_dir=str(tmp_path / "out"),
        epochs_cap=25, experiment_idx=0, seed=0)
    assert res["test_acc"] >= 0.9, res
    assert res["test_nlpp"] <= 0.15, res
