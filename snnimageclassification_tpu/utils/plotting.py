"""Plotting helpers (confusion matrix).

Parity: ``src/modules/utils.py:102-126`` (``plot_confusion_matrix``).
"""
from __future__ import annotations

import itertools

import numpy as np

__all__ = ["plot_confusion_matrix"]


def plot_confusion_matrix(cm: np.ndarray, classes, save_path=None, show=False):
    """Render a confusion matrix as an annotated imshow (utils.py:102-126)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    plt.imshow(cm, interpolation="nearest", cmap=plt.cm.Blues)
    plt.title("Confusion matrix")
    plt.colorbar()
    tick_marks = np.arange(len(classes))
    plt.xticks(tick_marks, classes, rotation=45)
    plt.yticks(tick_marks, classes)

    thresh = cm.max() / 2.0
    for i, j in itertools.product(range(cm.shape[0]), range(cm.shape[1])):
        plt.text(
            j,
            i,
            format(int(cm[i, j]), "d"),
            horizontalalignment="center",
            color="white" if cm[i, j] > thresh else "black",
        )

    plt.ylabel("True label")
    plt.xlabel("Predicted label")
    plt.tight_layout()
    if save_path is not None:
        plt.savefig(save_path, dpi=300)
    if show:  # pragma: no cover - interactive only
        plt.show()
    plt.close()
