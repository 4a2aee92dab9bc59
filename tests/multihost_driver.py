"""Subprocess driver for the multi-controller integration test.

Each process of the simulated 2-host cluster runs this script: it wires
itself into the cluster (gloo collectives over localhost), builds the
SAME deterministic dataset, and trains a ``Trainer`` over the global
multi-host mesh.  Process 0 dumps the loss history / accuracy JSON that
``tests/test_multihost.py`` compares against a single-process 8-device
run of the identical program (GSPMD compiles the same module either
way, so histories must match).

Not named ``test_*`` -- pytest must not collect it; it only runs via
``subprocess`` from ``tests/test_multihost.py``.
"""
import json
import sys


N_FEATURES = 64


def make_loaders(seed=0, n=128, batch_size=32):
    """Deterministic learnable 10-class problem (same recipe as
    tests/test_tp_trainer.py) -- imported by the test to build the
    single-process comparison run on identical bytes."""
    import numpy as np

    from snnimageclassification_tpu.data.datasets import (
        ArrayDataLoader,
        EncodeConfig,
    )

    enc = EncodeConfig(n_steps=4, use_periods=True)
    rng = np.random.default_rng(seed)
    protos = rng.random((10, N_FEATURES)).astype(np.float32)
    y = (np.arange(n) % 10).astype(np.int32)
    x = np.clip(
        protos[y] + 0.1 * rng.standard_normal((n, N_FEATURES)).astype(np.float32),
        0,
        1,
    )
    split = int(0.75 * n)
    mk = lambda lo, hi, sh: ArrayDataLoader(
        x[lo:hi], y[lo:hi], batch_size, shuffle=sh, encode_config=enc, seed=seed
    )
    return mk(0, split, True), mk(split, n, False)


def make_cfg():
    import snnimageclassification_tpu as st

    return st.SNNConfig(
        input_size=N_FEATURES,
        output_size=10,
        n_hidden_neurons=32,
        hidden_layer_type=st.LayerType.ALIF,
        use_recurrent_connection=True,
        int_time_steps=4,
    )


def main() -> None:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    ckpt_dir = sys.argv[4]
    out_json = sys.argv[5]
    epoch_block = int(sys.argv[6]) if len(sys.argv) > 6 else 1

    from snnimageclassification_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
        local_virtual_cpu_devices=4,
    )

    import jax

    assert jax.process_count() == num_processes
    mesh = multihost.make_multihost_mesh()

    from snnimageclassification_tpu.train.trainer import Trainer

    tr = Trainer(make_cfg(), checkpoint_folder=ckpt_dir, seed=7, mesh=mesh)
    tl, vl = make_loaders()
    hist = tr.fit(
        tl,
        vl,
        nb_epochs=3,
        force_overwrite=True,
        verbose=False,
        epoch_block=epoch_block,
    )
    acc = float(tr.compute_classification_accuracy(vl))

    # Every process computes identical (replicated) history/accuracy, but
    # only process 0 may write shared files -- including this JSON, which
    # doubles as the is-writer check (the test asserts exactly one exists).
    if multihost.is_main():
        with open(out_json, "w") as f:
            json.dump(
                {
                    "train": [float(v) for v in hist["train"]],
                    "val": [float(v) for v in hist["val"]],
                    "acc": acc,
                    "process_count": jax.process_count(),
                    "mesh_shape": dict(mesh.shape),
                },
                f,
            )
    multihost.barrier("driver-done")
    print(f"[proc {process_id}] done acc={acc:.4f}", flush=True)


if __name__ == "__main__":
    main()
