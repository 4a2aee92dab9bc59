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
    n_model = int(sys.argv[7]) if len(sys.argv) > 7 else 1
    n_pipe = int(sys.argv[8]) if len(sys.argv) > 8 else 1
    mode = sys.argv[9] if len(sys.argv) > 9 else "trainer"

    from snnimageclassification_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
        local_virtual_cpu_devices=4,
    )

    import jax

    assert jax.process_count() == num_processes
    mesh = multihost.make_multihost_mesh(n_model=n_model, n_pipe=n_pipe)

    tl, vl = make_loaders()
    if mode.startswith("ens"):
        result = run_ensemble(mesh, ckpt_dir, epoch_block,
                              shard_seeds=(mode == "ens_sharded"))
    elif mode == "resume":
        result = run_resume(mesh, ckpt_dir, epoch_block)
    else:
        from snnimageclassification_tpu.train.trainer import Trainer

        tr = Trainer(make_cfg(), checkpoint_folder=ckpt_dir, seed=7,
                     mesh=mesh)
        hist = tr.fit(
            tl,
            vl,
            nb_epochs=3,
            force_overwrite=True,
            verbose=False,
            epoch_block=epoch_block,
        )
        acc = float(tr.compute_classification_accuracy(vl))
        result = {
            "train": [float(v) for v in hist["train"]],
            "val": [float(v) for v in hist["val"]],
            "acc": acc,
        }

    result["process_count"] = jax.process_count()
    result["mesh_shape"] = dict(mesh.shape)

    # Every process computes identical (replicated) history/accuracy, but
    # only process 0 may write shared files -- including this JSON, which
    # doubles as the is-writer check (the test asserts exactly one exists).
    if multihost.is_main():
        with open(out_json, "w") as f:
            json.dump(result, f)
    multihost.barrier("driver-done")
    print(f"[proc {process_id}] done", flush=True)


def ensemble_seeds(shard_seeds: bool):
    """8 seeds under seed sharding (divisible by the 8 global devices)."""
    return list(range(8)) if shard_seeds else [0, 1, 2, 3]


def run_resume(mesh, ckpt_dir, epoch_block):
    """Interrupted-fit resume across the cluster: fit 2 epochs, then a
    second fit resumes from LAST_EPOCH for 2 more.  Exercises the
    cross-process load barrier and the sharded restore placement; the
    reused loader's rng stream makes the result equal a straight 4-epoch
    fit."""
    from snnimageclassification_tpu.train.checkpoint import (
        LoadCheckpointMode,
    )
    from snnimageclassification_tpu.train.trainer import Trainer

    tl, vl = make_loaders()
    tr = Trainer(make_cfg(), checkpoint_folder=ckpt_dir, seed=7, mesh=mesh)
    tr.fit(tl, vl, nb_epochs=2, force_overwrite=True, verbose=False,
           epoch_block=epoch_block)
    hist = tr.fit(
        tl, vl, nb_epochs=4,
        load_checkpoint_mode=LoadCheckpointMode.LAST_EPOCH,
        verbose=False, epoch_block=epoch_block,
    )
    return {
        "train": [float(v) for v in hist["train"]],
        "val": [float(v) for v in hist["val"]],
        "acc": float(tr.compute_classification_accuracy(vl)),
    }


def run_ensemble(mesh, ckpt_dir, epoch_block, shard_seeds):
    """EnsembleTrainer over the global mesh: batch-sharded replicas, or
    (shard_seeds) one seed per device -- each HOST trains its own
    replicas with no cross-host collectives beyond the stat fetches."""
    from snnimageclassification_tpu.parallel.ensemble import EnsembleTrainer

    tl, vl = make_loaders()
    ens = EnsembleTrainer(
        make_cfg(), ensemble_seeds(shard_seeds), mesh=mesh,
        checkpoint_folder=ckpt_dir, shard_seeds=shard_seeds,
    )
    hists = ens.fit(
        tl, vl, nb_epochs=3, force_overwrite=True, verbose=False,
        epoch_block=epoch_block,
    )
    accs = ens.accuracies(vl)
    return {
        "train": [[float(v) for v in h["train"]] for h in hists],
        "val": [[float(v) for v in h["val"]] for h in hists],
        "accs": [float(a) for a in accs],
        "ens_acc": float(ens.ensemble_accuracy(vl)),
    }


if __name__ == "__main__":
    main()
