"""One-command BASELINE accuracy harness.

Runs the BASELINE.json accuracy configs (#1-#4) plus the README code
example (reference ``__main__.py:58-74``) against real data on disk and
emits the parity table vs the published accuracies (MNIST 96.19 % /
FMNIST 81.94 %, reference README.md:10).

This environment has zero egress and no MNIST/FMNIST files; the harness
exists so that the moment data appears (run ``scripts/fetch_datasets.py``
where egress exists, or drop IDX/npz under ``$SNN_TPU_DATA_DIR``) the
published-parity runs are a single command:

    python scripts/run_baseline_configs.py --out tr_results/baseline.json

Without data it fails loudly (no silent synthetic substitution).  To
exercise the full harness on the real images that ARE available, use
``--digits`` (sklearn-bundled 8x8 optical digits; published MNIST/FMNIST
numbers do not apply there and the table says so).

Config list (BASELINE.json "configs"):
  1. MNIST, feedforward LIF 128, FastSigmoid, T=100
  2. MNIST, ALIF 128, learned beta + recurrent (README flagship)
  3. FMNIST, ALIF 256, periodic spike encoding
  4. RECxP ablation grid: recurrent LIF/ALIF x periodic on/off x 64/128
  5. README example: MNIST, ALIF 128 rec learn_beta, T=2, 30 epochs,
     split 0.95
"""
import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

PUBLISHED = {"MNIST": 0.9619, "FASHION_MNIST": 0.8194}
README_EXAMPLE_TEST_ACC = 0.9367  # reference README.md:132-135


def baseline_configs(epochs, digits=False):
    """(name, params) pairs for BASELINE configs #1-#4 + README example.

    ``epochs`` overrides every config's epoch count (None keeps defaults:
    15 like the reference sweep, 30 for the README example
    -- training.py:124 / __main__.py:69)."""
    from snnimageclassification_tpu.data.datasets import DatasetId
    from snnimageclassification_tpu.ops.cells import LayerType
    from snnimageclassification_tpu.ops.surrogate import SpikeFuncType

    mnist = DatasetId.DIGITS if digits else DatasetId.MNIST
    fmnist = DatasetId.DIGITS if digits else DatasetId.FASHION_MNIST
    e = lambda default: default if epochs is None else epochs
    cfgs = [
        ("1-mnist-ff-lif128", {
            "dataset_id": mnist, "to_spikes_use_periods": False,
            "n_hidden_neurons": 128, "spike_func": SpikeFuncType.FastSigmoid,
            "hidden_layer_type": LayerType.LIF,
            "use_recurrent_connection": False, "learn_beta": False,
            "n_steps": 100, "nb_epochs": e(15),
            "train_val_split_ratio": 0.85,
        }),
        ("2-mnist-alif128-rec-learnbeta", {
            "dataset_id": mnist, "to_spikes_use_periods": False,
            "n_hidden_neurons": 128, "spike_func": SpikeFuncType.FastSigmoid,
            "hidden_layer_type": LayerType.ALIF,
            "use_recurrent_connection": True, "learn_beta": True,
            "n_steps": 100, "nb_epochs": e(15),
            "train_val_split_ratio": 0.85,
        }),
        ("3-fmnist-alif256-periodic", {
            "dataset_id": fmnist, "to_spikes_use_periods": True,
            "n_hidden_neurons": 256, "spike_func": SpikeFuncType.FastSigmoid,
            "hidden_layer_type": LayerType.ALIF,
            "use_recurrent_connection": False, "learn_beta": False,
            "n_steps": 100, "nb_epochs": e(15),
            "train_val_split_ratio": 0.85,
        }),
    ]
    # 4. RECxP ablation grid (recurrent LIF/ALIF x periodic x hidden size).
    for layer in (LayerType.LIF, LayerType.ALIF):
        for periods in (False, True):
            for hidden in (64, 128):
                cfgs.append((
                    f"4-grid-{layer.name.lower()}-"
                    f"{'periodic' if periods else 'ttfs'}-h{hidden}",
                    {
                        "dataset_id": mnist,
                        "to_spikes_use_periods": periods,
                        "n_hidden_neurons": hidden,
                        "spike_func": SpikeFuncType.FastSigmoid,
                        "hidden_layer_type": layer,
                        "use_recurrent_connection": True,
                        "learn_beta": False,
                        "n_steps": 100, "nb_epochs": e(15),
                        "train_val_split_ratio": 0.85,
                    },
                ))
    # 5. README code example (reference __main__.py:58-74): note n_steps=2
    # and split 0.95.
    cfgs.append(("5-readme-example", {
        "dataset_id": mnist, "to_spikes_use_periods": False,
        "n_hidden_neurons": 128, "spike_func": SpikeFuncType.FastSigmoid,
        "hidden_layer_type": LayerType.ALIF,
        "use_recurrent_connection": True, "learn_beta": True,
        "n_steps": 2, "nb_epochs": e(30),
        "train_val_split_ratio": 0.95,
    }))
    return cfgs


def run(args) -> list:
    import time

    from snnimageclassification_tpu.data.datasets import DatasetId
    from snnimageclassification_tpu.train.sweep import (
        _result_rows,
        train_with_params,
    )

    seeds = [int(s) for s in args.seeds.split(",") if s] or None
    only = {int(c) for c in args.configs.split(",") if c} or None
    rows = []
    csv_rows = []
    for name, params in baseline_configs(args.epochs, digits=args.digits):
        if only and int(name.split("-", 1)[0]) not in only:
            continue
        t0 = time.monotonic()
        out = train_with_params(
            params, data_folder=args.data_folder, verbose=args.verbose,
            batch_size=args.batch_size, seeds=seeds,
            data_dir=args.data_dir, allow_synthetic=False,
        )
        wall_s = time.monotonic() - t0
        csv_rows.extend(_result_rows(out, params))
        accs = {
            k: (v.tolist() if hasattr(v, "tolist") else float(v))
            for k, v in out["accuracies"].items()
        }
        dataset = params["dataset_id"].name
        published = (
            README_EXAMPLE_TEST_ACC
            if name == "5-readme-example" and not args.digits
            else PUBLISHED.get(dataset)
        )
        test = accs["test"]
        best_test = max(test) if isinstance(test, list) else test
        n_train = out["n_samples"]["train"]
        epochs = params.get("nb_epochs", 15)
        row = {
            "config": name,
            "dataset": dataset,
            "data_source": out["data_source"],
            "n_samples": out["n_samples"],
            "accuracies": accs,
            "published_test_acc": published,
            "delta_vs_published": (
                round(best_test - published, 4) if published else None
            ),
            # End-to-end wall clock for the whole config: loader read,
            # fit (incl. first compiles), BEST reload, 3 accuracy evals.
            "wall_s": round(wall_s, 1),
            "train_img_per_s_incl_compile": round(
                epochs * n_train / wall_s
            ),
        }
        if args.digits:
            row["note"] = (
                "DIGITS substitute dataset: published MNIST/FMNIST numbers "
                "do not apply"
            )
        rows.append(row)
        print(json.dumps(row))
    if getattr(args, "csv", "") and csv_rows:
        # Sweep-CSV + analysis-figure leg of the rehearsal: the same
        # results.csv schema train_all_params writes (reference
        # training.py:182-191), fed through analysis/results.py to produce
        # the bar/box figures -- proving the offline-analysis subsystem at
        # this scale too.
        import pandas as pd

        os.makedirs(os.path.dirname(args.csv) or ".", exist_ok=True)
        pd.DataFrame(csv_rows).to_csv(args.csv)
        from snnimageclassification_tpu.analysis import results as R

        res = R.load_results(args.csv)
        figdir = os.path.join(os.path.dirname(args.csv) or ".", "figures")
        os.makedirs(figdir, exist_ok=True)
        for ds in {r["dataset"] for r in rows}:
            try:
                R.plot_bar_result(
                    res, ds, ["test_accuracy", "val_accuracy"],
                    save_path=os.path.join(figdir, f"{ds}_precision.png"),
                )
                R.box_plot_accuracy(
                    res, ds,
                    save_path=os.path.join(figdir, f"boxplot_{ds}.png"),
                )
            except Exception as e:  # figures are best-effort reporting
                print(f"figure generation for {ds} failed: {e}")
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=None,
                    help="override every config's epoch count")
    ap.add_argument("--seeds", type=str, default="",
                    help="comma list -> vmapped multi-seed ensemble per config")
    ap.add_argument("--configs", type=str, default="",
                    help="comma list of config numbers (1-5); default all")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--data-dir", type=str, default=None)
    ap.add_argument("--data-folder", type=str, default="tr_results/baseline")
    ap.add_argument("--digits", action="store_true",
                    help="substitute the sklearn DIGITS dataset (no real "
                         "MNIST/FMNIST files needed)")
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--csv", type=str, default="",
                    help="also write a results.csv in the sweep schema and "
                         "render the analysis figures next to it")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    from snnimageclassification_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    rows = run(args)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
    # Parity summary: best test accuracy per dataset vs published.
    for ds, pub in PUBLISHED.items():
        tests = []
        for r in rows:
            if r["dataset"] != ds:
                continue
            t = r["accuracies"]["test"]
            tests.extend(t if isinstance(t, list) else [t])
        if tests:
            best = max(tests)
            print(json.dumps({
                "dataset": ds, "best_test_acc": round(best, 4),
                "published": pub, "delta": round(best - pub, 4),
                "within_half_point": bool(best >= pub - 0.005),
            }))


if __name__ == "__main__":
    main()
