"""Render figures/head_to_head.png: per-seed trained test accuracies of
the running torch reference vs this framework on identical splits/seeds
(data: tr_results/head_to_head.jsonl via scripts/head_to_head_digits.py).

Form: strip plot (few points per group -> show every point, not a bar of
their mean).  One panel per dataset x encoding cell; within a panel, one
row per stack; a hollow diamond marks each stack's mean.
"""
import json
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

ROOT = Path(__file__).parents[1]

# Reference categorical palette, slots 1-2 (validated adjacent pair).
C_TORCH = "#2a78d6"  # blue: the reference stack
C_JAX = "#eb6834"    # orange: this framework
INK = "#0b0b0b"
INK2 = "#52514e"
SURFACE = "#fcfcfb"
GRID = "#e4e3df"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else ROOT / "tr_results/head_to_head.jsonl"
    rows = [json.loads(l) for l in open(path) if l.strip()]
    cells = [
        ("digits", "ttfs", "DIGITS · TTFS encoding"),
        ("digits", "periodic", "DIGITS · periodic encoding"),
        ("synthetic", "periodic", "synthetic sweep set · periodic"),
    ]
    stacks = [("torch", "reference (torch, CPU)", C_TORCH),
              ("jax", "this framework (TPU)", C_JAX)]

    fig, axes = plt.subplots(
        1, len(cells), figsize=(10.5, 2.9), sharex=True,
        facecolor=SURFACE, gridspec_kw=dict(wspace=0.08),
    )
    for ax, (ds, enc, title) in zip(axes, cells):
        ax.set_facecolor(SURFACE)
        for yi, (stack, label, color) in enumerate(stacks):
            acc = np.array([
                r["accuracies"]["test"] * 100 for r in rows
                if r["stack"] == stack and r.get("dataset", "digits") == ds
                and r["encoding"] == enc
            ])
            if acc.size == 0:
                continue
            y = np.full(acc.shape, 1 - yi, dtype=float)
            ax.scatter(acc, y, s=52, color=color, alpha=0.85, zorder=3,
                       edgecolors=SURFACE, linewidths=1.2,
                       label=label if ax is axes[0] else None)
            ax.scatter([acc.mean()], [1 - yi], marker="D", s=46,
                       facecolors="none", edgecolors=color, linewidths=1.6,
                       zorder=4)
            ax.annotate(f"{acc.mean():.0f}", (acc.mean(), 1 - yi),
                        xytext=(0, 9), textcoords="offset points",
                        ha="center", fontsize=8, color=INK2)
        ax.axvline(10, color=GRID, lw=1, ls=(0, (3, 3)), zorder=1)
        if ax is axes[-1]:
            ax.annotate("chance", (10, -0.52), ha="center", fontsize=7.5,
                        color=INK2)
        ax.set_title(title, fontsize=9.5, color=INK, pad=8)
        ax.set_ylim(-0.6, 1.6)
        ax.set_xlim(0, 100)
        ax.set_yticks([])
        ax.tick_params(colors=INK2, labelsize=8.5)
        for s in ("top", "right", "left"):
            ax.spines[s].set_visible(False)
        ax.spines["bottom"].set_color(GRID)
        ax.grid(axis="x", color=GRID, lw=0.7, zorder=0)
        ax.set_axisbelow(True)
    axes[1].set_xlabel("test accuracy (%) — one dot per seed, ◇ = mean",
                       fontsize=9, color=INK2)
    leg = axes[0].legend(loc="upper left", bbox_to_anchor=(0, 1.02),
                         frameon=False, fontsize=8.5, handletextpad=0.3,
                         borderaxespad=0)
    for t in leg.get_texts():
        t.set_color(INK)
    fig.suptitle(
        "Trained-accuracy parity: identical data splits & matched seeds, "
        "6 seeds per cell (3 on synthetic)",
        fontsize=10.5, color=INK, y=1.04,
    )
    out = ROOT / "figures/head_to_head.png"
    fig.savefig(out, dpi=160, bbox_inches="tight", facecolor=SURFACE)
    print(out)


if __name__ == "__main__":
    main()
