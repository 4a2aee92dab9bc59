"""Real-data accuracy run on the sklearn-bundled 8x8 digits dataset.

Zero-egress environments have no MNIST/FMNIST files, so the published
96.19/81.94 parity runs (reference README.md:10) are blocked on data.
scikit-learn ships the UCI optical-digits dataset *inside the package*,
giving a REAL handwritten-image classification task that runs anywhere.
This script trains the reference's flagship configuration (ALIF 128,
recurrent, FastSigmoid, T=100 -- __main__.py:58-74 modulo dataset) on
DIGITS through the standard train_with_params path and prints per-split
accuracies as one JSON line.

Usage:  python scripts/digits_accuracy.py [--epochs N] [--seeds a,b,...]
"""
import argparse
import json
import sys
import tempfile

sys.path.insert(0, ".")

from snnimageclassification_tpu.data.datasets import DatasetId
from snnimageclassification_tpu.ops.cells import LayerType
from snnimageclassification_tpu.ops.surrogate import SpikeFuncType
from snnimageclassification_tpu.train.sweep import train_with_params


def main() -> None:
    from snnimageclassification_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seeds", type=str, default="")
    ap.add_argument("--n-steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--use-periods", action="store_true")
    ap.add_argument("--clip", type=float, default=None,
                    help="optional max grad norm (beyond-reference "
                         "stability knob; default off = parity)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "ignores JAX_PLATFORMS)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    params = {
        "dataset_id": DatasetId.DIGITS,
        "to_spikes_use_periods": args.use_periods,
        "n_hidden_neurons": 128,
        "spike_func": SpikeFuncType.FastSigmoid,
        "hidden_layer_type": LayerType.ALIF,
        "use_recurrent_connection": True,
        "learn_beta": True,  # reference README example; Q3: beta stays frozen
        "n_steps": args.n_steps,
        "nb_epochs": args.epochs,
        **({"max_grad_norm": args.clip} if args.clip else {}),
        "train_val_split_ratio": 0.85,
    }
    seeds = [int(s) for s in args.seeds.split(",") if s] or None
    with tempfile.TemporaryDirectory() as folder:
        out = train_with_params(
            params, data_folder=folder, verbose=True,
            batch_size=args.batch_size, seeds=seeds, allow_synthetic=False,
        )
    acc = {
        k: (v.tolist() if hasattr(v, "tolist") else float(v))
        for k, v in out["accuracies"].items()
    }
    print(json.dumps({
        "dataset": "sklearn-digits",
        "config": "ALIF128-rec-FastSigmoid",
        "n_steps": args.n_steps,
        "epochs": args.epochs,
        "max_grad_norm": args.clip,
        "accuracies": acc,
    }))


if __name__ == "__main__":
    main()
