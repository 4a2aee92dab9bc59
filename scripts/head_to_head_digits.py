"""Head-to-head trained-accuracy parity: the RUNNING torch reference vs
this TPU stack, on provably identical data splits and matched seeds.

Round-2 parity evidence was step-level (identical weights -> identical
forwards/gradients/Adam trajectories, tests/test_reference_equivalence.py).
This script closes the remaining gap: train the reference
(`/root/reference/src/modules/snn.py` driven with the exact
`training.py:90-135` semantics -- Adam lr=1e-3 wd=1e-5, NLLLoss,
LAST_EPOCH resume + force_overwrite, BEST_EPOCH reload) and this
framework end to end on the SAME arrays, and compare per-seed
test-accuracy distributions.

Data identity: both stacks consume arrays from
``data.datasets.load_raw`` with the same split permutation
(``np.random.default_rng(split_seed).permutation`` -- the exact
`get_dataloaders` logic, datasets.py here).  The torch side receives
spike trains pre-encoded by ``ops.encoding.encode_spikes`` (bit-faithful
to the reference's ToSpikes: golden fixture + ported tests; the
reference's own encoder is unimportable here -- no torchvision), shaped
(B, T, F) exactly as its DataLoader would deliver.

Model seeds: each stack draws its own init from its own RNG with the
given seed -- the init *distributions* are machine-verified identical
(test_reference_equivalence), so the comparison is distributional across
seeds, which is the claim under test ("same training outcome").

Usage (torch runs are CPU-slow; run them in the background):

    python scripts/head_to_head_digits.py --stack torch --dataset digits \
        --seeds 0,1,2,3,4,5 --epochs 200 --out tr_results/h2h.jsonl
    python scripts/head_to_head_digits.py --stack jax --dataset digits \
        --seeds 0,1,2,3,4,5 --epochs 200 --out tr_results/h2h.jsonl

Each run appends one JSON line: accuracies (train/val/test), the val-loss
history, the test-set prediction histogram (constant-predictor
diagnosis), and the mean hidden spike rate.
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))

import numpy as np

REFERENCE_ROOT = os.environ.get("SNN_TPU_REFERENCE", "/root/reference")

FLAGSHIP = dict(
    n_hidden_neurons=128,
    use_recurrent_connection=True,
    learn_beta=True,  # Q3: beta stays frozen on both stacks
)


def make_splits(dataset: str, ratio: float = 0.85, split_seed: int = 0):
    """The exact get_dataloaders split (same rng, seed, ratio) so both
    stacks provably see identical arrays."""
    from snnimageclassification_tpu.data.datasets import DatasetId, load_raw

    if dataset == "digits":
        raw = load_raw(DatasetId.DIGITS)
    elif dataset == "synthetic":
        # The train_entry.py sweep's data in this zero-egress environment:
        # MNIST falls back (loudly) to the deterministic synthetic set.
        raw = load_raw(DatasetId.MNIST, allow_synthetic=True)
        assert raw["source"] == "synthetic", raw["source"]
    else:
        raise ValueError(dataset)
    n = raw["x_train"].shape[0]
    perm = np.random.default_rng(split_seed).permutation(n)
    n_train = int(n * ratio)
    tr, va = perm[:n_train], perm[n_train:]
    return dict(
        x_tr=raw["x_train"][tr], y_tr=raw["y_train"][tr],
        x_va=raw["x_train"][va], y_va=raw["y_train"][va],
        x_te=raw["x_test"], y_te=raw["y_test"],
        source=raw["source"],
    )


def _encode_numpy(x: np.ndarray, n_steps: int, use_periods: bool) -> np.ndarray:
    """(N, F) pixels -> (N, T, F) float32 spikes via the framework encoder
    (CPU jax; bit-faithful to the reference's ToSpikes)."""
    import jax
    import jax.numpy as jnp

    from snnimageclassification_tpu.ops.encoding import encode_spikes

    out = np.asarray(
        jax.jit(
            lambda p: encode_spikes(p, n_steps=n_steps, use_periods=use_periods),
        )(jnp.asarray(x, jnp.float32))
    ).astype(np.float32)
    return out


# ---------------------------------------------------------------------------
# torch reference runner
# ---------------------------------------------------------------------------
def run_torch(data, n_steps, use_periods, seed, epochs, batch_size, verbose):
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    # torch>=2.6 defaults torch.load(weights_only=True), which rejects the
    # reference's own checkpoints (numpy scalars in the loss dict,
    # snn.py:434-449).  These are checkpoints we just wrote ourselves.
    if not getattr(torch.load, "_h2h_patched", False):
        _orig_load = torch.load

        def _load(*a, **k):
            k.setdefault("weights_only", False)
            return _orig_load(*a, **k)

        _load._h2h_patched = True
        torch.load = _load

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from src.modules.snn import SNN as TorchSNN
    from src.modules.snn import LoadCheckpointMode as TorchLoadMode
    from src.modules.spike_funcs import HeavisideSigmoidApprox
    from src.modules.spiking_layers import LayerType as TorchLayerType

    F = data["x_tr"].shape[1]
    loaders = {}
    for split, shuffle in (("train", True), ("val", False), ("test", False)):
        key = {"train": "tr", "val": "va", "test": "te"}[split]
        spikes = _encode_numpy(data[f"x_{key}"], n_steps, use_periods)
        ds = TensorDataset(
            torch.from_numpy(spikes),
            torch.from_numpy(data[f"y_{key}"].astype(np.int64)),
        )
        loaders[split] = DataLoader(ds, batch_size=batch_size, shuffle=shuffle)

    torch.manual_seed(seed)
    t0 = time.time()
    # The reference prefixes "./" to checkpoint paths (snn.py:425), so the
    # folder must be cwd-relative.
    with tempfile.TemporaryDirectory(dir=".", prefix="h2h_torch_ck_") as folder:
        folder = os.path.basename(folder)
        # training.py:104-130 semantics, flagship __main__.py:58-74 config.
        network = TorchSNN(
            inputs_size=F,
            output_size=10,
            n_hidden_neurons=FLAGSHIP["n_hidden_neurons"],
            int_time_steps=n_steps,
            spike_func=HeavisideSigmoidApprox,
            hidden_layer_type=TorchLayerType.ALIF,
            use_recurrent_connection=FLAGSHIP["use_recurrent_connection"],
            checkpoint_folder=folder,
            learn_beta=FLAGSHIP["learn_beta"],
        )
        network.fit(
            loaders["train"], loaders["val"], nb_epochs=epochs,
            load_checkpoint_mode=TorchLoadMode.LAST_EPOCH,
            force_overwrite=True, verbose=verbose,
        )
        val_hist = [float(v) for v in network.loss_history["val"]]
        network.load_checkpoint(TorchLoadMode.BEST_EPOCH)
        accs = {
            k: float(network.compute_classification_accuracy(loaders[k]))
            for k in loaders
        }
    # Constant-predictor diagnosis: test prediction histogram + mean
    # hidden spike rate (one pass, no_grad).
    hist = np.zeros(10, dtype=int)
    spike_rates = []
    with torch.no_grad():
        for xb, _ in loaders["test"]:
            out = network.get_prediction_logits(
                xb.to(network.device), re_outputs_trace=False,
                re_hidden_states=True,
            )
            logits, hidden = out
            preds = torch.argmax(logits, dim=-1).cpu().numpy()
            hist += np.bincount(preds, minlength=10)
            z = hidden["input"][-1]  # (B, T, H) spike trace
            spike_rates.append(float(z.float().mean()))
    return dict(
        accuracies=accs, val_loss_history=val_hist,
        test_pred_hist=hist.tolist(),
        mean_hidden_spike_rate=float(np.mean(spike_rates)),
        wall_s=time.time() - t0,
    )


# ---------------------------------------------------------------------------
# JAX/TPU stack runner (all seeds at once, vmapped)
# ---------------------------------------------------------------------------
def run_jax(data, n_steps, use_periods, seeds, epochs, batch_size, verbose):
    import jax.numpy as jnp

    import snnimageclassification_tpu as st
    from snnimageclassification_tpu.data.datasets import (
        ArrayDataLoader,
        EncodeConfig,
    )
    from snnimageclassification_tpu.parallel.ensemble import EnsembleTrainer
    from snnimageclassification_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    F = data["x_tr"].shape[1]
    enc = EncodeConfig(n_steps=n_steps, use_periods=use_periods)
    mk = lambda key, sh, s: ArrayDataLoader(
        data[f"x_{key}"], data[f"y_{key}"], batch_size, shuffle=sh,
        encode_config=enc, seed=s, source=data["source"],
    )
    loaders = {"train": mk("tr", True, 1), "val": mk("va", False, 2),
               "test": mk("te", False, 3)}
    cfg = st.SNNConfig(
        input_size=F, output_size=10,
        n_hidden_neurons=FLAGSHIP["n_hidden_neurons"],
        hidden_layer_type=st.LayerType.ALIF,
        use_recurrent_connection=FLAGSHIP["use_recurrent_connection"],
        learn_beta=FLAGSHIP["learn_beta"],
        int_time_steps=n_steps,
    )
    t0 = time.time()
    ens = EnsembleTrainer(cfg, seeds=seeds)
    ens.fit(loaders["train"], loaders["val"], nb_epochs=epochs,
            verbose=verbose)
    ens.load_best()  # per-seed BEST_EPOCH reload (training.py:130)
    accs = {k: ens.accuracies(loaders[k]).tolist() for k in loaders}
    # Per-seed test prediction histograms + mean hidden spike rate.
    eval_step = ens._steps_for(enc)[1]
    hists = np.zeros((len(seeds), 10), dtype=int)
    for xb, yb, wb in ens._batches(loaders["test"]):
        _, preds = eval_step(ens.params, xb, yb, wb)
        preds = np.asarray(preds)
        mask = np.asarray(wb) > 0
        for i in range(len(seeds)):
            hists[i] += np.bincount(preds[i][mask], minlength=10)
    from snnimageclassification_tpu.models import snn as M

    rates = []
    for i in range(len(seeds)):
        import jax

        p_i = jax.tree.map(lambda a: a[i], ens.params)
        xb = jnp.asarray(data["x_te"][:256], jnp.float32)
        _, hidden = M.apply_pixels(cfg, p_i, xb, enc, return_hidden=True)
        rates.append(float(jnp.mean(hidden["input"][-1])))
    wall = time.time() - t0
    return [
        dict(
            accuracies={k: accs[k][i] for k in accs},
            val_loss_history=[float(v) for v in ens.histories[i]["val"]],
            test_pred_hist=hists[i].tolist(),
            mean_hidden_spike_rate=rates[i],
            wall_s=wall / len(seeds),  # amortized: seeds train vmapped
        )
        for i in range(len(seeds))
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stack", choices=["torch", "jax"], required=True)
    ap.add_argument("--dataset", choices=["digits", "synthetic"],
                    default="digits")
    ap.add_argument("--encoding", choices=["ttfs", "periodic"],
                    default="ttfs")
    ap.add_argument("--n-steps", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--seeds", type=str, default="0,1,2,3,4,5")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--split-ratio", type=float, default=0.85,
                    help="train/val split (the default sweep rows used "
                         "0.95 -- training.py:98)")
    ap.add_argument("--out", type=str, default="tr_results/head_to_head.jsonl")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    if args.stack == "torch":
        # Keep jax (used only for encoding) off the TPU tunnel.
        import jax

        jax.config.update("jax_platforms", "cpu")

    seeds = [int(s) for s in args.seeds.split(",") if s]
    use_periods = args.encoding == "periodic"
    data = make_splits(args.dataset, ratio=args.split_ratio)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    base = dict(
        stack=args.stack, dataset=args.dataset, encoding=args.encoding,
        n_steps=args.n_steps, epochs=args.epochs,
        batch_size=args.batch_size, source=data["source"],
        split_ratio=args.split_ratio,
        config="ALIF128-rec-FastSigmoid-learnbeta",
    )
    if args.stack == "torch":
        for seed in seeds:
            res = run_torch(data, args.n_steps, use_periods, seed,
                            args.epochs, args.batch_size, args.verbose)
            row = {**base, "seed": seed, **res}
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(json.dumps({k: row[k] for k in
                              ("stack", "encoding", "seed", "accuracies",
                               "test_pred_hist", "wall_s")}))
    else:
        results = run_jax(data, args.n_steps, use_periods, seeds,
                          args.epochs, args.batch_size, args.verbose)
        for seed, res in zip(seeds, results):
            row = {**base, "seed": seed, **res}
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(json.dumps({k: row[k] for k in
                              ("stack", "encoding", "seed", "accuracies",
                               "test_pred_hist", "wall_s")}))


if __name__ == "__main__":
    main()
