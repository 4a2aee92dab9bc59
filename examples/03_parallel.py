"""One fit, four parallelism strategies: the mesh's axis names pick the
strategy and the whole fit/eval/checkpoint surface is identical.

Run with 8 virtual devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/03_parallel.py

On a real slice the same meshes map onto chips (see
parallel/multihost.py for the one-process-per-host pod version).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import tempfile

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ) and not args.tpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import snnimageclassification_tpu as st
    from snnimageclassification_tpu.data.datasets import (
        ArrayDataLoader, EncodeConfig,
    )
    from snnimageclassification_tpu.parallel import make_mesh, pp, pp3, tp
    from snnimageclassification_tpu.train.trainer import Trainer

    rng = np.random.default_rng(2)
    protos = rng.random((10, 64)).astype(np.float32)
    y = (np.arange(256) % 10).astype(np.int32)
    x = np.clip(protos[y] + 0.1 * rng.standard_normal((256, 64)), 0, 1).astype(
        np.float32
    )
    enc = EncodeConfig(n_steps=4, use_periods=True)
    mk = lambda lo, hi, sh: ArrayDataLoader(
        x[lo:hi], y[lo:hi], 32, shuffle=sh, encode_config=enc, seed=0
    )
    train, val = mk(0, 192, True), mk(192, 256, False)

    # Pipeline meshes want one layer per "pipe" stage, so each strategy
    # gets a matching depth: 3 hidden + readout = 4 stages for the
    # 4-stage pipe, 1 hidden + readout = 2 stages for the 2-stage cube.
    def cfg(hidden):
        return st.SNNConfig(
            input_size=64, output_size=10, n_hidden_neurons=hidden,
            hidden_layer_type=st.LayerType.ALIF,
            use_recurrent_connection=True, int_time_steps=4,
        )

    runs = {
        "data-parallel (8,)": (make_mesh(), cfg([32, 24, 16])),
        "tensor-parallel (4 data x 2 model)": (
            tp.make_2d_mesh(4, 2), cfg([32, 24, 16])),
        "pipeline (2 data x 4 pipe)": (pp.make_pp_mesh(2, 4),
                                       cfg([32, 24, 16])),
        "3-D (2 data x 2 pipe x 2 model)": (pp3.make_3d_mesh(2, 2, 2),
                                            cfg(32)),
    }
    for name, (mesh, cfg_i) in runs.items():
        with tempfile.TemporaryDirectory() as ckpt:
            tr = Trainer(cfg_i, checkpoint_folder=ckpt, seed=0, mesh=mesh)
            hist = tr.fit(train, val, nb_epochs=args.epochs,
                          force_overwrite=True, verbose=False)
            acc = tr.compute_classification_accuracy(val)
            print(f"{name:<40} losses "
                  f"{[round(float(v), 4) for v in hist['train']]} "
                  f"acc {acc:.3f}")


if __name__ == "__main__":
    main()
