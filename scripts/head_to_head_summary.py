"""Summarize the head-to-head trained-accuracy runs (torch reference vs
this TPU stack) collected by scripts/head_to_head_digits.py into the
PARITY.md table: per-seed test accuracies, distribution overlap
(Mann-Whitney U), and the constant-predictor diagnosis for the periodic
collapse (VERDICT round-2 weak #1).

Usage: python scripts/head_to_head_summary.py [tr_results/head_to_head.jsonl]
Prints a markdown fragment.
"""
import json
import sys
from pathlib import Path

import numpy as np

try:
    from scipy.stats import mannwhitneyu
except ImportError:  # pragma: no cover
    mannwhitneyu = None


def load(path):
    rows = [json.loads(l) for l in open(path) if l.strip()]
    by = {}
    for r in rows:
        by.setdefault((r.get("dataset", "digits"), r["encoding"],
                       r["stack"]), []).append(r)
    return by


def accs(rows):
    return np.array(
        [r["accuracies"]["test"] for r in sorted(rows, key=lambda r: r["seed"])]
    ) * 100


def fmt_dist(a):
    return "[" + ", ".join(f"{v:.1f}" for v in sorted(a)) + "]"


def constant_predictor_share(rows):
    """Max share of test predictions landing on a single class, per seed."""
    out = []
    for r in sorted(rows, key=lambda r: r["seed"]):
        h = np.array(r["test_pred_hist"], dtype=float)
        out.append(h.max() / max(h.sum(), 1))
    return np.array(out)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "tr_results/head_to_head.jsonl"
    by = load(path)
    pairs = sorted({(d, e) for (d, e, _) in by})

    print("| Dataset | Encoding | Stack | Per-seed test acc (%) | mean | "
          "seeds > 50 % | U-test p |")
    print("|---|---|---|---|---|---|---|")
    for d, e in pairs:
        torch_rows = by.get((d, e, "torch"))
        jax_rows = by.get((d, e, "jax"))
        p = ""
        if torch_rows and jax_rows and mannwhitneyu is not None:
            res = mannwhitneyu(accs(torch_rows), accs(jax_rows),
                               alternative="two-sided")
            p = f"{res.pvalue:.2f}"
        for name, rows in (("torch (reference)", torch_rows),
                           ("jax (this repo)", jax_rows)):
            if not rows:
                continue
            a = accs(rows)
            print(f"| {d} | {e} | {name} | {fmt_dist(a)} | {a.mean():.1f} "
                  f"| {int((a > 50).sum())}/{len(a)} | {p} |")
            p = "〃"

    print()
    print("Constant-predictor diagnosis (max single-class share of test "
          "predictions; 1.0 = pure constant predictor):")
    for d, e in pairs:
        for stack in ("torch", "jax"):
            rows = by.get((d, e, stack))
            if not rows:
                continue
            share = constant_predictor_share(rows)
            rates = [r.get("mean_hidden_spike_rate") for r in rows]
            rates = [r for r in rates if r is not None]
            rate_s = (f", hidden spike rate "
                      f"{np.mean(rates):.2f}±{np.std(rates):.2f}"
                      if rates else "")
            print(f"  {d}/{e}/{stack}: max-class share "
                  f"{fmt_dist(share * 100)} %{rate_s}")


if __name__ == "__main__":
    main()
