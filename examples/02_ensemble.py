"""Multi-seed ensembles: N replicas trained simultaneously (one vmapped
device program instead of the reference's N sequential runs), per-seed
accuracies, and soft/hard voting inference.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import tempfile

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import snnimageclassification_tpu as st
    from snnimageclassification_tpu.data.datasets import (
        ArrayDataLoader, EncodeConfig,
    )

    rng = np.random.default_rng(1)
    protos = rng.random((10, 64)).astype(np.float32)
    y = (np.arange(512) % 10).astype(np.int32)
    x = np.clip(protos[y] + 0.15 * rng.standard_normal((512, 64)), 0, 1).astype(
        np.float32
    )
    enc = EncodeConfig(n_steps=4, use_periods=True)
    split = int(0.8 * len(x))
    train = ArrayDataLoader(x[:split], y[:split], 64, shuffle=True,
                            encode_config=enc, seed=0)
    val = ArrayDataLoader(x[split:], y[split:], 64, shuffle=False,
                          encode_config=enc, seed=0)

    cfg = st.SNNConfig(
        input_size=64, output_size=10, n_hidden_neurons=32,
        hidden_layer_type=st.LayerType.ALIF,
        use_recurrent_connection=True, int_time_steps=4,
    )
    with tempfile.TemporaryDirectory() as ckpt:
        ens = st.EnsembleTrainer(
            cfg, seeds=list(range(args.seeds)), checkpoint_folder=ckpt
        )
        ens.fit(train, val, nb_epochs=args.epochs, force_overwrite=True,
                verbose=True)
        ens.load_best()  # per-seed best-val params

        per_seed = ens.accuracies(val)
        print("\nper-seed val accuracies:",
              np.array2string(np.asarray(per_seed), precision=3))
        print(f"soft-vote ensemble accuracy "
              f"{ens.ensemble_accuracy(val, method='mean_proba'):.3f}")
        print(f"hard-vote ensemble accuracy "
              f"{ens.ensemble_accuracy(val, method='vote'):.3f}")


if __name__ == "__main__":
    main()
