"""Analysis-module tests over a synthetic sweep CSV (shape of
tr_results/results.csv, training.py:166,182-191)."""
import numpy as np
import pandas as pd
import pytest

from snnimageclassification_tpu.analysis import results as R


@pytest.fixture
def df():
    rows = []
    i = 0
    for rec in (True, False):
        for periods in (True, False):
            for hn in (64, 128):
                rows.append(
                    dict(
                        checkpoints=str(1000 + i),
                        dataset_id="DatasetId.MNIST",
                        to_spikes_use_periods=periods,
                        n_steps=100,
                        n_hidden_neurons=hn,
                        spike_func="SpikeFuncType.FastSigmoid",
                        hidden_layer_type="LayerType.ALIF",
                        use_recurrent_connection=rec,
                        learn_beta=True,
                        nb_epochs=30,
                        train_accuracy=0.9 - 0.2 * rec,
                        val_accuracy=0.88 - 0.2 * rec,
                        test_accuracy=0.87 - 0.2 * rec - 0.05 * periods,
                    )
                )
                i += 1
    return pd.DataFrame(rows)


def test_load_results_roundtrip(tmp_path, df):
    p = tmp_path / "results.csv"
    df.to_csv(p)  # reference writes with the pandas index (training.py:191)
    loaded = R.load_results(str(p))
    assert len(loaded) == len(df)
    assert "test_accuracy" in loaded.columns


def test_bar_data(df):
    labels, values = R.bar_data(df, "MNIST", "test_accuracy")
    assert len(labels) == len(values) == 8
    assert all(0 <= v <= 100 for v in values)
    assert any("ALIF" in l for l in labels)


def test_bar_data_mask(df):
    _, values = R.bar_data(
        df, "MNIST", "test_accuracy", data_mask=("use_recurrent_connection", True)
    )
    assert len(values) == 4


def test_box_plot_data(df):
    data = R.box_plot_data(df, "MNIST", "test_accuracy")
    assert "REC [Y]" in data and "REC [N]" in data
    assert len(data["REC [Y]"]) == 4
    # recurrence lowers accuracy by 20 points in the synthetic data
    assert np.mean(data["REC [N]"]) - np.mean(data["REC [Y]"]) == pytest.approx(20.0)


def test_pairwise_comparison_stats(df):
    stats = R.pairwise_comparison_stats(df, "MNIST")
    assert stats["Recurrent connections"]["mean_abs_diff"] == pytest.approx(0.2)
    assert stats["Periodic encoding"]["mean_abs_diff"] == pytest.approx(0.05)
    assert stats["Hidden layer size"]["mean_abs_diff"] == pytest.approx(0.0)
    # single-valued parameters are skipped
    assert "Learn beta" not in stats


def test_pairwise_comparison_stats_three_values(df):
    """A parameter swept over >2 values yields one entry per adjacent
    value pair instead of silently truncating to the first two."""
    extra = df[df.n_hidden_neurons == 128].copy()
    extra["n_hidden_neurons"] = 256
    extra["test_accuracy"] = extra["test_accuracy"] + 0.01
    df3 = pd.concat([df, extra], ignore_index=True)
    stats = R.pairwise_comparison_stats(df3, "MNIST")
    assert "Hidden layer size" not in stats  # no bare (truncated) entry
    assert stats[
        "Hidden layer size (n_hidden_neurons=64 -> n_hidden_neurons=128)"
    ]["mean_abs_diff"] == pytest.approx(0.0)
    assert stats[
        "Hidden layer size (n_hidden_neurons=128 -> n_hidden_neurons=256)"
    ]["mean_abs_diff"] == pytest.approx(0.01)
    # binary parameters keep their round-1 keys
    assert stats["Recurrent connections"]["mean_abs_diff"] == pytest.approx(0.2)


def test_figures_render(tmp_path, df):
    pytest.importorskip("matplotlib")
    R.plot_bar_result(
        df, "MNIST", ["test_accuracy", "val_accuracy"],
        save_path=str(tmp_path / "bar.png"),
    )
    R.box_plot_accuracy(df, "MNIST", save_path=str(tmp_path / "box.png"))
    R.pairwise_comparison(df, "MNIST", save_path=str(tmp_path / "pair.png"))
    for name in ("bar.png", "box.png", "pair.png"):
        assert (tmp_path / name).stat().st_size > 0


def test_stat_data_encoding(df):
    X, y = R.stat_data(df, "MNIST")
    assert len(y) == 8
    assert set(X) == {"to_spikes_use_periods", "hidden_layer_type",
                      "use_recurrent_connection", "n_hidden_neurons"}
    assert set(X["to_spikes_use_periods"]) == {0, 1}
    assert set(X["hidden_layer_type"]) == {1}  # all ALIF in the fixture
    assert set(X["n_hidden_neurons"]) == {0, 1}  # rank of 64/128


def test_ols_recovers_planted_effects(df):
    """The fixture plants test_acc = 0.87 - 0.2*rec - 0.05*periods; the
    OLS coefficients must recover exactly those effects (exact fit)."""
    out = R.ols_stats(df, "MNIST")
    assert out["n"] == 8
    assert out["params"]["use_recurrent_connection"] == pytest.approx(-0.2)
    assert out["params"]["to_spikes_use_periods"] == pytest.approx(-0.05)
    assert out["params"]["n_hidden_neurons"] == pytest.approx(0.0, abs=1e-9)
    assert out["r_squared"] == pytest.approx(1.0)
