"""Offline sweep-result analysis (parity with result_methods.py)."""
from .results import (
    PARAM_DISPLAY_NAMES,
    bar_data,
    box_plot_accuracy,
    box_plot_data,
    config_labels,
    load_results,
    pairwise_comparison,
    pairwise_comparison_stats,
    pairwise_data,
    plot_bar_result,
)
