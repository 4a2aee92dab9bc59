"""Quickstart: config -> train -> evaluate -> checkpoint round trip.

Mirrors the reference's `__main__.py` flow (config dict -> SNN -> fit ->
confusion matrices) on the TPU-native stack.  Runs on CPU in ~1 min; on
a TPU the same code engages the fused Pallas kernels automatically.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import tempfile

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--n-steps", type=int, default=4, help="time steps T")
    ap.add_argument("--tpu", action="store_true",
                    help="keep the default (TPU) backend")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import snnimageclassification_tpu as st
    from snnimageclassification_tpu.data.datasets import (
        ArrayDataLoader, EncodeConfig,
    )
    from snnimageclassification_tpu.train.checkpoint import LoadCheckpointMode
    from snnimageclassification_tpu.train.trainer import Trainer

    # A learnable 10-class toy problem: class prototypes + noise.  Swap in
    # data.get_dataloaders(DatasetId.MNIST, ...) when MNIST is on disk.
    rng = np.random.default_rng(0)
    protos = rng.random((10, 64)).astype(np.float32)
    y = (np.arange(512) % 10).astype(np.int32)
    x = np.clip(protos[y] + 0.1 * rng.standard_normal((512, 64)), 0, 1).astype(
        np.float32
    )
    enc = EncodeConfig(n_steps=args.n_steps, use_periods=True)
    split = int(0.8 * len(x))
    train = ArrayDataLoader(x[:split], y[:split], 64, shuffle=True,
                            encode_config=enc, seed=0)
    val = ArrayDataLoader(x[split:], y[split:], 64, shuffle=False,
                          encode_config=enc, seed=0)

    cfg = st.SNNConfig(
        input_size=64, output_size=10, n_hidden_neurons=64,
        hidden_layer_type=st.LayerType.ALIF,
        use_recurrent_connection=True, int_time_steps=args.n_steps,
    )
    with tempfile.TemporaryDirectory() as ckpt:
        # Seed 1: the reference's no-clipping Adam regime is genuinely
        # seed-bimodal on small datasets (PARITY.md); pass
        # max_grad_norm to fit for the stabilized beyond-reference mode.
        trainer = Trainer(cfg, checkpoint_folder=ckpt, seed=1)
        hist = trainer.fit(train, val, nb_epochs=args.epochs,
                           force_overwrite=True, verbose=True)
        acc = trainer.compute_classification_accuracy(val)
        print(f"\nfinal train loss {hist['train'][-1]:.4f}, "
              f"val accuracy {acc:.3f}")

        cm = trainer.compute_confusion_matrix(
            10, {"val": val})["val"]
        print("confusion matrix (val):")
        print(np.array2string(cm.astype(int)))

        # Best-val reload (the reference's LoadCheckpointMode.BEST_EPOCH).
        trainer.load_checkpoint(LoadCheckpointMode.BEST_EPOCH)
        print(f"best-epoch accuracy {trainer.compute_classification_accuracy(val):.3f}")


if __name__ == "__main__":
    main()
