"""Multi-host (multi-controller) training on localhost: spawns a REAL
2-process JAX cluster (4 virtual CPU devices each, gloo collectives),
trains the production Trainer over the global ("data",) mesh, and prints
process 0's loss history.

On a TPU pod the same code runs with `multihost.initialize()` (no
arguments -- the TPU runtime supplies the topology) on every host.
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(process_id: int, num_processes: int, port: int, out_json: str,
           ckpt_dir: str):
    from snnimageclassification_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
        local_virtual_cpu_devices=4,
    )
    import numpy as np

    import snnimageclassification_tpu as st
    from snnimageclassification_tpu.data.datasets import (
        ArrayDataLoader, EncodeConfig,
    )
    from snnimageclassification_tpu.train.trainer import Trainer

    mesh = multihost.make_multihost_mesh()  # "data" axis spans processes

    rng = np.random.default_rng(0)
    protos = rng.random((10, 64)).astype(np.float32)
    y = (np.arange(256) % 10).astype(np.int32)
    x = np.clip(protos[y] + 0.1 * rng.standard_normal((256, 64)), 0, 1).astype(
        np.float32
    )
    enc = EncodeConfig(n_steps=4, use_periods=True)
    train = ArrayDataLoader(x[:192], y[:192], 32, shuffle=True,
                            encode_config=enc, seed=0)
    val = ArrayDataLoader(x[192:], y[192:], 32, shuffle=False,
                          encode_config=enc, seed=0)

    cfg = st.SNNConfig(
        input_size=64, output_size=10, n_hidden_neurons=32,
        hidden_layer_type=st.LayerType.ALIF,
        use_recurrent_connection=True, int_time_steps=4,
    )
    # The checkpoint folder MUST be shared by every process (on a real
    # pod: a network filesystem) -- process 0 writes the files, all
    # processes read them back on resume.
    tr = Trainer(cfg, checkpoint_folder=ckpt_dir, seed=1, mesh=mesh)
    hist = tr.fit(train, val, nb_epochs=12, force_overwrite=True,
                  verbose=False)
    acc = float(tr.compute_classification_accuracy(val))
    if multihost.is_main():  # shared files belong to process 0
        with open(out_json, "w") as f:
            json.dump({"train": [float(v) for v in hist["train"]],
                       "acc": acc,
                       "devices": mesh.size}, f)
    multihost.barrier("example-done")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--port", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--out", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--ckpt", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, 2, args.port, args.out, args.ckpt)
        return

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out = tempfile.mktemp(suffix=".json")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    with tempfile.TemporaryDirectory() as ckpt:  # SHARED by both workers
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", str(pid), "--port", str(port), "--out", out,
                 "--ckpt", ckpt],
                env=env,
            )
            for pid in range(2)
        ]
        for p in procs:
            p.wait()
            assert p.returncode == 0, "cluster process failed"
    with open(out) as f:
        res = json.load(f)
    os.unlink(out)
    print(f"2-process cluster over {res['devices']} global devices")
    print(f"train losses: {[round(v, 4) for v in res['train']]}")
    print(f"val accuracy: {res['acc']:.3f}")


if __name__ == "__main__":
    main()
