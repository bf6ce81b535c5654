"""Benchmark harness end-to-end: synthetic .mat dataset -> trainer recipes."""

import json
import os
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(_HERE, os.pardir))

from gpsig_tpu import datasets


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    """Tiny ragged 3-class dataset in the UEA .mat layout."""
    from scipy.io import savemat

    rng = np.random.RandomState(0)
    tmp = tmp_path_factory.mktemp("data")

    def make(n):
        X, y = [], []
        for i in range(n):
            c = i % 3
            L = rng.randint(6, 10)
            t = np.linspace(0, 1, L)
            base = np.stack([np.sin((c + 1) * 3 * t), t * (c - 1)], axis=1)
            X.append(base + 0.05 * rng.randn(L, 2))
            y.append(c)
        Xo = np.empty(n, dtype=object)
        for i, x in enumerate(X):
            Xo[i] = x
        return Xo, np.asarray(y, dtype=np.float64)

    X_train, y_train = make(24)
    X_test, y_test = make(12)
    savemat(
        os.path.join(tmp, "Synth.mat"),
        {"X_train": X_train, "y_train": y_train,
         "X_test": X_test, "y_test": y_test},
    )
    return str(tmp)


class TestLoadDataset:
    def test_sig_padding(self, synth_dataset):
        Xtr, ytr, Xv, yv, Xte, yte = datasets.load_dataset(
            "Synth", data_dir=synth_dataset, for_model="sig", add_time=True,
            normalize_data=True,
        )
        assert Xtr.ndim == 3 and Xtr.shape[2] == 3  # time channel added
        assert Xv is None
        assert set(np.unique(ytr)) <= {0, 1, 2}
        # repeat-last padding: last rows equal
        row_last = Xtr[0, -1]
        assert np.isfinite(Xtr).all()

    def test_val_split_stratified(self, synth_dataset):
        Xtr, ytr, Xv, yv, Xte, yte = datasets.load_dataset(
            "Synth", data_dir=synth_dataset, for_model="sig",
            val_split=0.25,
        )
        assert Xv is not None
        assert len(yv) >= 6  # 2-per-class floor
        assert set(np.unique(yv)) == {0, 1, 2}
        assert len(ytr) + len(yv) == 24

    def test_nan_padding_for_kconv(self, synth_dataset):
        Xtr, *_ = datasets.load_dataset(
            "Synth", data_dir=synth_dataset, for_model="kconv"
        )
        assert np.isnan(Xtr).any()

    def test_nn_zero_prepadding(self, synth_dataset):
        Xtr, *_ = datasets.load_dataset(
            "Synth", data_dir=synth_dataset, for_model="nn"
        )
        # shorter sequences are zero-padded at the START
        assert (Xtr[:, 0, :] == 0).any()

    def test_max_len_pooling(self, synth_dataset):
        Xtr, *_ = datasets.load_dataset(
            "Synth", data_dir=synth_dataset, for_model="sig", max_len=5
        )
        assert Xtr.shape[1] <= 5

    def test_missing_dataset_message(self, synth_dataset):
        with pytest.raises(FileNotFoundError):
            datasets.load_dataset("Nope", data_dir=synth_dataset)


TS_TRAIN = """# tiny multivariate UEA .ts fixture
@problemName SynthTS
@timeStamps false
@univariate false
@classLabel true 1 2 3
@data
1.0,2.0,3.0:10.0,20.0,30.0:1
1.5,2.5:11.0,21.0:2
0.5,1.5,2.5,3.5:5.0,6.0,7.0,8.0:3
2.0,3.0,4.0:12.0,22.0,32.0:1
2.5,3.5:13.0,23.0:2
1.0,2.0,3.0,4.0:6.0,7.0,8.0,9.0:3
"""


class TestTSFormat:
    """Native UEA .ts text-format loading (the archive's current
    distribution format; the reference only read the retired .mat
    bundle, `benchmarks/utils/datasets.py:16-25`)."""

    @pytest.fixture(scope="class")
    def ts_dataset(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("tsdata")
        sub = os.path.join(tmp, "SynthTS")
        os.makedirs(sub)
        with open(os.path.join(sub, "SynthTS_TRAIN.ts"), "w") as f:
            f.write(TS_TRAIN)
        # TEST split flat in data_dir (both layouts must resolve)
        with open(os.path.join(tmp, "SynthTS_TEST.ts"), "w") as f:
            f.write(TS_TRAIN.replace("3.0:1", "3.25:1"))
        return str(tmp)

    def test_parse_shapes_and_labels(self, ts_dataset):
        X, y = datasets._parse_ts_file(
            os.path.join(ts_dataset, "SynthTS", "SynthTS_TRAIN.ts"))
        assert len(X) == 6 and X[0].shape == (3, 2) and X[1].shape == (2, 2)
        np.testing.assert_array_equal(y, [1, 2, 3, 1, 2, 3])
        np.testing.assert_allclose(X[0][:, 1], [10.0, 20.0, 30.0])

    def test_load_dataset_end_to_end(self, ts_dataset):
        Xtr, ytr, Xv, yv, Xte, yte = datasets.load_dataset(
            "SynthTS", data_dir=ts_dataset, for_model="sig", add_time=True,
            normalize_data=True,
        )
        assert Xtr.ndim == 3 and Xtr.shape[2] == 3  # time channel added
        assert set(np.unique(ytr)) == {0, 1, 2}  # labels reindexed
        assert np.isfinite(Xtr).all()  # repeat-last padding, no NaNs
        assert Xte.shape[0] == 6

    def test_missing_values_become_nan(self, tmp_path):
        with open(tmp_path / "M_TRAIN.ts", "w") as f:
            f.write("@classLabel true a b\n@data\n1.0,?,3.0:a\n2.0,4.0,6.0:b\n")
        X, y = datasets._parse_ts_file(str(tmp_path / "M_TRAIN.ts"))
        assert np.isnan(X[0][1, 0]) and not np.isnan(X[1]).any()
        assert list(y) == ["a", "b"]  # non-numeric labels survive

    def test_timestamps_rejected(self, tmp_path):
        with open(tmp_path / "T_TRAIN.ts", "w") as f:
            f.write("@timeStamps true\n@data\n(0,1.0):1\n")
        with pytest.raises(ValueError, match="timeStamps"):
            datasets._parse_ts_file(str(tmp_path / "T_TRAIN.ts"))

    def test_missing_classlabel_header_rejected(self, tmp_path):
        with open(tmp_path / "H_TRAIN.ts", "w") as f:
            f.write("@problemName H\n@data\n1.0,2.0:1\n")
        with pytest.raises(ValueError, match="classLabel"):
            datasets._parse_ts_file(str(tmp_path / "H_TRAIN.ts"))

    def test_string_labels_and_imputation_end_to_end(self, tmp_path):
        # string class labels + '?' missing values: the loader must
        # reindex labels without an int cast and impute NaNs (ffill/bfill)
        body = ("@classLabel true walk run\n@data\n"
                "?,2.0,3.0:10.0,?,30.0:walk\n"
                "1.0,2.0,4.0:11.0,21.0,31.0:run\n"
                "2.0,3.0,5.0:12.0,22.0,32.0:walk\n"
                "3.0,4.0,6.0:13.0,23.0,33.0:run\n")
        for s in ("TRAIN", "TEST"):
            with open(tmp_path / f"S_{s}.ts", "w") as f:
                f.write(body)
        with pytest.warns(UserWarning, match="imputed"):
            Xtr, ytr, _, _, Xte, yte = datasets.load_dataset(
                "S", data_dir=str(tmp_path), for_model="sig",
                normalize_data=True,
            )
        assert np.isfinite(Xtr).all() and np.isfinite(Xte).all()
        assert set(np.unique(ytr)) == {0, 1}

    def test_impute_missing(self):
        x = np.array([[np.nan, 1.0], [2.0, np.nan], [np.nan, 3.0]])
        out = datasets._impute_missing(x)
        # ffill for interior/trailing, bfill for leading, per channel
        np.testing.assert_allclose(out, [[2.0, 1.0], [2.0, 1.0], [2.0, 3.0]])
        allnan = np.full((3, 1), np.nan)
        np.testing.assert_allclose(datasets._impute_missing(allnan), 0.0)


class TestTrainerRecipes:
    def test_gpsig_recipe_smoke(self, synth_dataset, tmp_path):
        from benchmarks.models import train_gpsig_classifier

        res = train_gpsig_classifier(
            "Synth", num_levels=2, num_inducing=6, minibatch_size=12,
            max_len=8, val_split=0.25, data_dir=synth_dataset,
            save_dir=str(tmp_path), epochs_cap=1, experiment_idx=0,
        )
        assert 0.0 <= res["test_acc"] <= 1.0
        assert np.isfinite(res["test_nlpp"])
        assert os.path.exists(tmp_path / "Synth_0.json")
        saved = json.load(open(tmp_path / "Synth_0.json"))
        assert saved == res

    def test_gpkconv1d_recipe_smoke(self, synth_dataset, tmp_path):
        from benchmarks.models import train_gpkconv1d_classifier

        res = train_gpkconv1d_classifier(
            "Synth", num_inducing=6, minibatch_size=12, max_len=8,
            len_windows=3, val_split=0.25, data_dir=synth_dataset,
            save_dir=str(tmp_path), epochs_cap=1, experiment_idx=0,
        )
        assert np.isfinite(res["test_nlpp"])

    def test_gprnn_recipe_smoke(self, synth_dataset, tmp_path):
        from benchmarks.models import train_gprnn_classifier

        res = train_gprnn_classifier(
            "Synth", num_inducing=5, num_hidden=3, minibatch_size=12,
            max_len=8, val_split=0.25, data_dir=synth_dataset,
            save_dir=str(tmp_path), epochs_cap=1, experiment_idx=0,
        )
        assert np.isfinite(res["test_nlpp"])

    def test_gpsigrnn_recipe_smoke(self, synth_dataset, tmp_path):
        from benchmarks.models import train_gpsigrnn_classifier

        res = train_gpsigrnn_classifier(
            "Synth", num_levels=2, num_inducing=5, num_hidden=3,
            minibatch_size=12, max_len=8, val_split=0.25,
            data_dir=synth_dataset, save_dir=str(tmp_path), epochs_cap=1,
            experiment_idx=0,
        )
        assert np.isfinite(res["test_nlpp"])


class TestResultAggregation:
    """Script equivalents of the reference's processing notebooks
    (`process_benchmarks.ipynb` / `process_gridsearch.ipynb`), driven on
    fake result files end-to-end."""

    def test_process_benchmarks_tables(self, tmp_path, capsys):
        import json
        import sys

        sys.path.insert(0, os.path.join(_HERE, os.pardir, "benchmarks"))
        import process_benchmarks

        for model, accs in (("GPSig", [0.9, 0.92]), ("GPLSTM", [0.8, 0.82])):
            d = tmp_path / model
            d.mkdir()
            for i, a in enumerate(accs):
                (d / f"DSetA_{i}.json").write_text(
                    json.dumps({"test_acc": a, "test_nlpp": 1.0 - a}))
        argv = sys.argv
        sys.argv = ["process_benchmarks.py", str(tmp_path / "GPSig"),
                    str(tmp_path / "GPLSTM")]
        try:
            process_benchmarks.main()
        finally:
            sys.argv = argv
        out = capsys.readouterr().out
        assert "DSetA" in out and "0.910" in out  # GPSig mean acc
        # GPSig (higher acc) must out-rank GPLSTM
        assert out.index("GPSig") < out.index("GPLSTM")

    def test_process_gridsearch_selection_rule(self, tmp_path, capsys):
        import json
        import sys

        sys.path.insert(0, os.path.join(_HERE, os.pardir, "benchmarks"))
        import process_gridsearch

        d = tmp_path / "gridsearch_GPSigLSTM"
        d.mkdir()
        # H=8 within 10% of best (H=128): the smaller architecture wins
        scores = {(8, 0): 1.05, (32, 0): 1.2, (128, 0): 1.0}
        for (h, dd), v in scores.items():
            (d / f"DSetA_H{h}_D{dd}.json").write_text(
                json.dumps({"val_nlpp": v, "val_acc": 0.9}))
        argv = sys.argv
        sys.argv = ["process_gridsearch.py", str(d)]
        try:
            process_gridsearch.main()
        finally:
            sys.argv = argv
        out = capsys.readouterr().out
        assert "H=8 D=0: selected for 1 dataset(s)" in out
        assert "1.050*" in out  # the star marks the 10%-rule pick
