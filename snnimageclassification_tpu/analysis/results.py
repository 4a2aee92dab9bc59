"""Offline analysis of sweep results.

Parity: ``result_methods.py`` -- bar charts of per-config accuracy, box
plots per parameter value, and pairwise mean-difference comparison across
parameter flips, all over the sweep CSV written by
``train.sweep.train_all_params``.  Plotly/seaborn (the reference's stack)
are optional; matplotlib is the default backend here so the module works
in slim environments.  The data-preparation functions are
backend-agnostic and unit-tested; figures are a thin layer on top.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = [
    "PARAM_DISPLAY_NAMES",
    "PARAM_SURNAMES",
    "load_results",
    "config_labels",
    "bar_data",
    "box_plot_data",
    "pairwise_data",
    "stat_data",
    "ols_stats",
    "pairwise_comparison_stats",
    "plot_bar_result",
    "box_plot_accuracy",
    "pairwise_comparison",
]

# Reference's parameter display names (result_methods.py:32-39; English
# equivalents of the French originals).
PARAM_DISPLAY_NAMES = {
    "hidden_layer_type": "Dynamics",
    "use_recurrent_connection": "Recurrent connections",
    "to_spikes_use_periods": "Periodic encoding",
    "n_hidden_neurons": "Hidden layer size",
    "nb_epochs": "Training iterations",
    "learn_beta": "Learn beta",
}

# Compact per-config label prefixes (result_methods.py:82-89).
PARAM_SURNAMES = {
    "hidden_layer_type": "",
    "use_recurrent_connection": "R ",
    "to_spikes_use_periods": "P ",
    "n_hidden_neurons": "H ",
    "nb_epochs": "I ",
    "learn_beta": "B ",
}


def load_results(file_path: str = "tr_data/results.csv"):
    """Read the sweep CSV (result_methods.py:42-46)."""
    import pandas as pd

    return pd.read_csv(file_path, index_col=0)


def _select_dataset(results, dataset_name: str):
    """Rows for one dataset; the CSV stores the enum repr
    'DatasetId.<NAME>' (training.py:182-191)."""
    return results[results["dataset_id"] == "DatasetId." + dataset_name]


def config_labels(rows, col_names: List[str]) -> List[str]:
    """Compact multi-line labels like 'ALIF / R[x] / P[ok] / H 128'
    (result_methods.py:90-106)."""
    labels = []
    for _, row in rows.iterrows():
        parts = []
        for col in col_names:
            surname = PARAM_SURNAMES.get(col)
            if surname is None:
                continue
            val = row[col]
            if val in (True, False):
                parts.append(f"{surname}{'[Y]' if val is True or val == True else '[N]'}")
            else:
                parts.append(f"{surname}{str(val).split('.')[-1]}")
        labels.append("\n".join(parts))
    return labels


def bar_data(
    results,
    dataset_name: str,
    y_axis: str,
    col_names: Optional[List[str]] = None,
    data_mask: Optional[Tuple[str, object]] = None,
):
    """(labels, accuracies-in-%) for one grouped-bar series
    (result_methods.py:49-119)."""
    cols = col_names or list(PARAM_DISPLAY_NAMES)
    rows = _select_dataset(results, dataset_name)
    sort_cols = [c for c in PARAM_DISPLAY_NAMES if c in rows.columns and c in cols]
    rows = rows.sort_values(by=sort_cols, ignore_index=True)
    if data_mask is not None:
        rows = rows[rows[data_mask[0]] == data_mask[1]]
    return config_labels(rows, cols), (rows[y_axis] * 100).tolist()


def box_plot_data(results, dataset_name: str, ydata: str) -> Dict[str, List[float]]:
    """Accuracy distribution per parameter value (result_methods.py:172-192)."""
    rows = _select_dataset(results, dataset_name)
    y = rows[ydata] * 100
    out: Dict[str, List[float]] = {}
    for param in PARAM_DISPLAY_NAMES:
        if param not in rows.columns:
            continue
        for value in rows[param].unique():
            if param == "hidden_layer_type":
                name = str(value).split(".")[-1]
            elif param == "use_recurrent_connection":
                name = "REC [Y]" if value else "REC [N]"
            elif param == "to_spikes_use_periods":
                name = "P [Y]" if value else "P [N]"
            elif param == "n_hidden_neurons":
                name = f"HN {value}"
            else:
                name = str(value)
            out[name] = y[rows[param] == value].tolist()
    return out


def pairwise_data(results, dataset_name: str, param_name: str, ydata_name: str):
    """Two aligned accuracy columns, one per value of ``param_name``, with
    all other grid parameters matched row-by-row
    (result_methods.py:248-260)."""
    rows = _select_dataset(results, dataset_name)
    other = [p for p in PARAM_DISPLAY_NAMES if p != param_name and p in rows.columns]
    rows = rows.sort_values(by=[param_name] + other, ignore_index=True)
    values = rows[param_name].unique()
    columns = {}
    for value in values:
        columns[f"{param_name}={value}"] = rows[rows[param_name] == value][
            ydata_name
        ].tolist()
    return columns


def stat_data(results, dataset_name: str, ydata: str = "test_accuracy"):
    """Design matrix + targets for statistical analysis -- the counterpart
    of ``make_data_for_stat`` (result_methods.py:230-239).

    Binary/ordinal-encodes the grid parameters: periods/recurrence map
    True/False -> 1/0, dynamics LIF/ALIF -> 0/1, and hidden sizes map to
    their rank among the sweep's sorted unique values (the reference
    hardcodes {100: 0, 200: 1} -- its grid's two sizes; rank encoding is
    the same numbers for that grid and stays defined for any other).
    Returns ``(X: dict of column lists, y: list)``.
    """
    rows = _select_dataset(results, dataset_name)
    sizes = sorted(rows["n_hidden_neurons"].unique())
    X = {
        "to_spikes_use_periods": [
            1 if v else 0 for v in rows["to_spikes_use_periods"]
        ],
        "hidden_layer_type": [
            1 if str(v).endswith("ALIF") else 0
            for v in rows["hidden_layer_type"]
        ],
        "use_recurrent_connection": [
            1 if v else 0 for v in rows["use_recurrent_connection"]
        ],
        "n_hidden_neurons": [
            sizes.index(v) for v in rows["n_hidden_neurons"]
        ],
    }
    return X, rows[ydata].tolist()


def ols_stats(results, dataset_name: str, ydata: str = "test_accuracy"):
    """Working version of the reference's commented-out OLS
    (``statistical_analysis_model``, result_methods.py:242-245): ordinary
    least squares of ``ydata`` on the :func:`stat_data` design matrix with
    an intercept, via ``numpy.linalg.lstsq`` (no statsmodels dependency).

    Returns ``{"params": {name: coef}, "r_squared": float, "n": int}`` --
    the coefficient per grid parameter quantifies its accuracy effect
    (the README ablation claims, README.md:13-16, in regression form).
    """
    X, y = stat_data(results, dataset_name, ydata)
    names = ["const"] + list(X)
    y_arr = np.asarray(y, np.float64)
    mat = np.column_stack(
        [np.ones(len(y_arr))] + [np.asarray(col, np.float64) for col in X.values()]
    )
    coef, *_ = np.linalg.lstsq(mat, y_arr, rcond=None)
    resid = y_arr - mat @ coef
    ss_tot = float(np.sum((y_arr - y_arr.mean()) ** 2))
    r2 = 1.0 - float(np.sum(resid**2)) / ss_tot if ss_tot > 0 else float("nan")
    return {
        "params": dict(zip(names, coef.tolist())),
        "r_squared": r2,
        "n": len(y_arr),
    }


def pairwise_comparison_stats(results, dataset_name: str):
    """Mean |paired difference| of test accuracy when flipping each
    parameter (result_methods.py:263-271).  Parameters with fewer than two
    values in the sweep are skipped.

    The reference grid is all-binary; for a parameter swept over k > 2
    values (e.g. three hidden sizes) every *adjacent* value pair gets its
    own entry keyed ``"<display> (<a> -> <b>)"`` instead of silently using
    only the first two values."""
    stats = {}
    for param in PARAM_DISPLAY_NAMES:
        if param not in results.columns:
            continue
        columns = pairwise_data(results, dataset_name, param, "test_accuracy")
        if len(columns) < 2:
            continue
        names = list(columns)
        series = list(columns.values())
        display = PARAM_DISPLAY_NAMES[param]
        for j in range(len(series) - 1):
            n = min(len(series[j]), len(series[j + 1]))
            if n == 0:
                continue
            diff = np.asarray(series[j + 1][:n]) - np.asarray(series[j][:n])
            key = (
                display
                if len(series) == 2
                else f"{display} ({names[j]} -> {names[j + 1]})"
            )
            stats[key] = {
                "mean_abs_diff": float(np.abs(np.mean(diff))),
                "std_third": float(np.std(diff) / 3),
            }
    return stats


# ---------------------------------------------------------------------------
# Figures (matplotlib)
# ---------------------------------------------------------------------------
def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_bar_result(
    results,
    dataset_name: str,
    list_col_names: List[str],
    data_mask: Optional[Tuple[str, object]] = None,
    list_col_names_xaxis: Optional[List[str]] = None,
    save_path: Optional[str] = None,
):
    """Grouped bars of accuracy per config (result_methods.py:122-169)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(16, 8))
    xcols = list_col_names_xaxis or list(PARAM_DISPLAY_NAMES)
    width = 0.8 / max(len(list_col_names), 1)
    for i, y_axis in enumerate(list_col_names):
        labels, values = bar_data(results, dataset_name, y_axis, xcols, data_mask)
        xs = np.arange(len(values)) + i * width
        ax.bar(xs, values, width=width, label=y_axis)
    ax.set_xticks(np.arange(len(labels)) + 0.4 - width / 2)
    ax.set_xticklabels(labels, fontsize=8)
    ax.set_ylabel("Accuracy [%]")
    ax.set_ylim(0, 100)
    ax.legend()
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=200)
    return fig


def box_plot_accuracy(results, dataset_name: str, save_path: Optional[str] = None):
    """Box plot of test accuracy per parameter value
    (result_methods.py:195-227)."""
    plt = _plt()
    data = box_plot_data(results, dataset_name, "test_accuracy")
    fig, ax = plt.subplots(figsize=(14, 8))
    ax.boxplot(list(data.values()), tick_labels=list(data.keys()))
    ax.set_ylabel("Accuracy [%]")
    ax.set_ylim(0, 100)
    plt.setp(ax.get_xticklabels(), rotation=45, ha="right")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=200)
    return fig


def pairwise_comparison(
    results, dataset_name: str, ymax: Optional[float] = None,
    save_path: Optional[str] = None,
):
    """Bar chart of mean paired accuracy differences
    (result_methods.py:263-288)."""
    plt = _plt()
    stats = pairwise_comparison_stats(results, dataset_name)
    fig, ax = plt.subplots(figsize=(12, 6))
    names = list(stats.keys())
    ax.bar(names, [s["mean_abs_diff"] for s in stats.values()], color="crimson")
    ax.set_ylabel("Mean paired difference")
    if ymax is not None:
        ax.set_ylim(0, ymax)
    plt.setp(ax.get_xticklabels(), rotation=30, ha="right")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=200)
    return fig
