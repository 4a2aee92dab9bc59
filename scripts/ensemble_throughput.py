"""Multi-seed ensemble training throughput (seed-img/s).

Measures EnsembleTrainer.fit end to end -- the round-2 baseline was 56k
seed-img/s (vmapped XLA path, T=10 ff, batch 1024).  Round 3 routes
head-fusible configs through S unrolled whole-network Pallas kernel
calls per step (``fused_replicas``); this script measures both paths for
the comparison.

Usage: python scripts/ensemble_throughput.py [--t 10] [--batch 1024]
       [--epochs 14] [--seeds 6] [--rec] [--fused {auto,on,off}]
       [--epoch-block K]

``--epoch-block K`` times the full ``EnsembleTrainer.fit`` with K
train+val epochs per device dispatch (vs the per-epoch train_epoch /
eval_epoch loop the default mode times); pick ``--epochs`` a multiple of
K so no remainder block compiles inside the timed window.
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np


def main() -> None:
    from snnimageclassification_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=14)
    ap.add_argument("--seeds", type=int, default=6)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--rec", action="store_true")
    ap.add_argument("--layer", choices=["alif", "lif", "izhikevich"],
                    default="alif",
                    help="hidden dynamics family (Izhikevich exercises the "
                         "izh stacked-replica head kernel)")
    ap.add_argument("--fused", choices=["auto", "on", "off", "stacked",
                                        "unrolled"], default="auto")
    ap.add_argument("--epoch-block", type=int, default=0,
                    help="time fit(epoch_block=K) instead of the "
                         "per-epoch train_epoch/eval_epoch loop")
    args = ap.parse_args()

    import snnimageclassification_tpu as st
    from snnimageclassification_tpu.data.datasets import (
        ArrayDataLoader,
        EncodeConfig,
    )
    from snnimageclassification_tpu.parallel.ensemble import EnsembleTrainer

    rng = np.random.default_rng(0)
    protos = rng.random((10, 784)).astype(np.float32)
    y = rng.integers(0, 10, args.n).astype(np.int32)
    x = np.clip(
        protos[y] + 0.25 * rng.standard_normal((args.n, 784)).astype(np.float32),
        0, 1,
    )
    n_val = args.n // 16
    enc = EncodeConfig(n_steps=args.t)
    train = ArrayDataLoader(x[n_val:], y[n_val:], args.batch, shuffle=True,
                            encode_config=enc)
    val = ArrayDataLoader(x[:n_val], y[:n_val], args.batch, encode_config=enc)
    cfg = st.SNNConfig(
        input_size=784, output_size=10, n_hidden_neurons=128,
        hidden_layer_type={"alif": "ALIF", "lif": "LIF",
                           "izhikevich": "Izhikevich"}[args.layer],
        use_recurrent_connection=args.rec,
        int_time_steps=args.t,
    )
    fused = {"auto": None, "on": True, "off": False,
             "stacked": "stacked", "unrolled": "unrolled"}[args.fused]
    seeds = list(range(args.seeds))
    ens = EnsembleTrainer(cfg, seeds=seeds, fused_replicas=fused)
    if args.epoch_block:
        k = args.epoch_block
        # Warm fit compiles the K-epoch block program (and trains a bit;
        # only throughput matters here), then the timed fit runs with
        # every program cache-warm.
        ens.fit(train, val, nb_epochs=k, epoch_block=k, verbose=False)
        t0 = time.perf_counter()
        hists = ens.fit(train, val, nb_epochs=args.epochs, epoch_block=k,
                        verbose=False)
        wall = time.perf_counter() - t0
        # fit() resumes nothing here (no checkpoint folder): all
        # args.epochs epochs run inside the timed window.
        losses = np.asarray([h["train"][-1] for h in hists])
    else:
        # Warm epoch (compile), then timed epochs.
        ens.train_epoch(train)
        ens.eval_epoch(val)
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            losses = ens.train_epoch(train)
            ens.eval_epoch(val)
        wall = time.perf_counter() - t0
    n_train = train.n_samples
    seed_img_s = n_train * args.epochs * len(seeds) / wall
    print(json.dumps({
        "metric": "ensemble seed-img/s (train+val epochs, steady state)",
        "seed_img_per_sec": round(seed_img_s, 1),
        "seeds": len(seeds), "t": args.t, "batch": args.batch,
        "rec": args.rec, "fused": args.fused, "layer": args.layer,
        "epochs": args.epochs, "wall_sec": round(wall, 2),
        **({"epoch_block": args.epoch_block} if args.epoch_block else {}),
        "final_loss_finite": bool(np.isfinite(losses).all()),
    }))


if __name__ == "__main__":
    main()
