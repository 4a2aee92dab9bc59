"""Hyperparameter sweep runner.

Parity: ``src/modules/training.py`` -- grid definition, md5 param hashing
for persistent run identity, per-config training with checkpoint resume,
incremental CSV persistence with skip-completed resume at the sweep level,
and per-config exception isolation.
"""
from __future__ import annotations

import hashlib
import itertools
import logging
import os
import pickle
from typing import Any, Dict, List, Optional, Sequence

from ..data.datasets import DatasetId, get_dataloaders
from ..ops.cells import LayerType
from ..ops.surrogate import SpikeFuncType
from .checkpoint import LoadCheckpointMode

__all__ = [
    "get_training_params_space",
    "get_meta_name",
    "hash_params",
    "save_params",
    "train_with_params",
    "get_all_params_combinations",
    "train_all_params",
]

logger = logging.getLogger(__name__)


def get_training_params_space() -> Dict[str, Any]:
    """The sweep grid (training.py:20-62, active values only)."""
    return {
        "dataset_id": [DatasetId.MNIST],
        "to_spikes_use_periods": [True, False],
        "n_steps": [2, 10, 32, 100],
        "n_hidden_neurons": [128],
        "spike_func": [SpikeFuncType.FastSigmoid],
        "hidden_layer_type": [LayerType.ALIF],
        "use_recurrent_connection": [True],
        "learn_beta": [True],
        "nb_epochs": [30],
    }


def get_meta_name(params: Dict[str, Any]) -> str:
    """`k-v_` concatenation (training.py:65-69).  Depends on dict insertion
    order, exactly like the reference (quirk Q7)."""
    return "_".join(f"{k}-{v}" for k, v in params.items())


def hash_params(params: Dict[str, Any]) -> int:
    """md5 of the meta name as an int (training.py:72-78)."""
    return int(hashlib.md5(get_meta_name(params).encode("utf-8")).hexdigest(), 16)


def save_params(params: Dict[str, Any], save_path: str) -> None:
    """Pickle the params dict into the run folder (training.py:81-87).
    No-op on non-zero ranks of a multi-host run (every process executes
    the sweep SPMD; shared files belong to process 0)."""
    from .checkpoint import _is_writer

    if not _is_writer():
        return
    with open(save_path, "wb") as f:
        pickle.dump(params, f)


def train_with_params(
    params: Dict[str, Any],
    data_folder: str = "tr_results",
    verbose: bool = False,
    p_bar_leave: Optional[bool] = None,
    *,
    batch_size: int = 256,
    seed: int = 0,
    seeds: Optional[Sequence[int]] = None,
    data_dir: Optional[str] = None,
    allow_synthetic: bool = True,
    mesh=None,
) -> Dict[str, Any]:
    """Train one configuration end to end (training.py:90-135): hash params
    into a run folder, build loaders + model, fit with LAST_EPOCH resume +
    force_overwrite, reload BEST_EPOCH, return per-split accuracies.

    With ``seeds=[...]`` every seed trains *simultaneously* as one vmapped
    ensemble (parallel/ensemble.py) instead of N sequential runs; the
    returned ``accuracies`` values are per-seed arrays and ``seeds`` is
    echoed back for CSV expansion by :func:`train_all_params`."""
    from ..models.api import SNN  # local import: api builds on train/

    checkpoints_name = str(hash_params(params))
    checkpoint_folder = f"{data_folder}/{checkpoints_name}"
    os.makedirs(checkpoint_folder, exist_ok=True)

    dataloaders = get_dataloaders(
        dataset_id=params["dataset_id"],
        batch_size=batch_size,
        n_steps=params["n_steps"],
        train_val_split_ratio=params.get("train_val_split_ratio", 0.95),
        to_spikes_use_periods=params["to_spikes_use_periods"],
        seed=seed,
        data_dir=data_dir,
        allow_synthetic=allow_synthetic,
    )
    if seeds is not None:
        return _train_ensemble_with_params(
            params, dataloaders, checkpoint_folder, checkpoints_name,
            seeds=seeds, mesh=mesh, verbose=verbose,
        )
    network = SNN(
        inputs_size=int(dataloaders["train"].x.shape[1]),
        output_size=10,
        n_hidden_neurons=params["n_hidden_neurons"],
        int_time_steps=params["n_steps"],
        spike_func=params["spike_func"],
        hidden_layer_type=params["hidden_layer_type"],
        use_recurrent_connection=params["use_recurrent_connection"],
        checkpoint_folder=checkpoint_folder,
        learn_beta=params.get("learn_beta", False),
        seed=seed,
        mesh=mesh,
    )
    save_params(params, os.path.join(checkpoint_folder, "params.pkl"))
    network.fit(
        dataloaders["train"],
        dataloaders["val"],
        nb_epochs=params.get("nb_epochs", 15),
        max_grad_norm=params.get("max_grad_norm"),
        load_checkpoint_mode=LoadCheckpointMode.LAST_EPOCH,
        force_overwrite=True,
        verbose=verbose,
        p_bar_position=1,
        p_bar_leave=p_bar_leave,
    )
    network.load_checkpoint(LoadCheckpointMode.BEST_EPOCH)
    return dict(
        network=network,
        accuracies={
            k: network.compute_classification_accuracy(dataloaders[k])
            for k in dataloaders
        },
        checkpoints_name=checkpoints_name,
        n_samples={k: dataloaders[k].n_samples for k in dataloaders},
        data_source=dataloaders["train"].source,
    )


def _train_ensemble_with_params(
    params: Dict[str, Any],
    dataloaders,
    checkpoint_folder: str,
    checkpoints_name: str,
    *,
    seeds: Sequence[int],
    mesh=None,
    verbose: bool = False,
) -> Dict[str, Any]:
    """Vmapped multi-seed counterpart of one reference sweep config: all
    seeds train in one jitted step (what N calls of training.py:90-135
    with different seeds would produce, modulo shared data order)."""
    from ..models.config import SNNConfig
    from ..parallel.ensemble import EnsembleTrainer

    cfg = SNNConfig(
        input_size=int(dataloaders["train"].x.shape[1]),
        output_size=10,
        n_hidden_neurons=params["n_hidden_neurons"],
        int_time_steps=params["n_steps"],
        spike_func=params["spike_func"],
        hidden_layer_type=params["hidden_layer_type"],
        use_recurrent_connection=params["use_recurrent_connection"],
        learn_beta=params.get("learn_beta", False),
    )
    ensemble = EnsembleTrainer(
        cfg, seeds, mesh=mesh, checkpoint_folder=checkpoint_folder,
        max_grad_norm=params.get("max_grad_norm"),
    )
    save_params(params, os.path.join(checkpoint_folder, "params.pkl"))
    ensemble.fit(
        dataloaders["train"],
        dataloaders["val"],
        nb_epochs=params.get("nb_epochs", 15),
        verbose=verbose,
    )
    ensemble.load_best()  # per-seed BEST_EPOCH reload (training.py:130)
    return dict(
        network=ensemble,
        accuracies={
            k: ensemble.accuracies(dataloaders[k]) for k in dataloaders
        },
        checkpoints_name=checkpoints_name,
        seeds=tuple(seeds),
        n_samples={k: dataloaders[k].n_samples for k in dataloaders},
        data_source=dataloaders["train"].source,
    )


def get_all_params_combinations(
    params_space: Optional[Dict[str, Any]] = None,
) -> List[Dict[str, Any]]:
    """Cartesian product of the grid (training.py:138-148)."""
    if params_space is None:
        params_space = get_training_params_space()
    keys = list(params_space.keys())
    return [dict(zip(keys, combo)) for combo in itertools.product(*params_space.values())]


def _result_rows(result: Dict[str, Any], params: Dict[str, Any]) -> List[dict]:
    """CSV rows for one finished config: one row (reference schema,
    training.py:182-191), or one row *per seed* for a vmapped multi-seed
    run (extra ``seed`` column; checkpoints name shared)."""
    accs = result["accuracies"]
    if "seeds" in result:
        return [
            dict(
                checkpoints=result["checkpoints_name"],
                **params,
                seed=s,
                train_accuracy=float(accs["train"][i]),
                val_accuracy=float(accs["val"][i]),
                test_accuracy=float(accs["test"][i]),
            )
            for i, s in enumerate(result["seeds"])
        ]
    return [
        dict(
            checkpoints=result["checkpoints_name"],
            **params,
            train_accuracy=accs["train"],
            val_accuracy=accs["val"],
            test_accuracy=accs["test"],
        )
    ]


def train_all_params(
    training_params: Optional[Dict[str, Any]] = None,
    data_folder: str = "tr_data",
    verbose: bool = False,
    **train_kwargs,
):
    """Run the whole grid with CSV accumulation and resume
    (training.py:151-201): configs whose hash is already in results.csv are
    skipped; per-config exceptions are logged and the sweep continues."""
    import pandas as pd

    os.makedirs(data_folder, exist_ok=True)
    results_path = os.path.join(data_folder, "results.csv")
    if training_params is None:
        training_params = get_training_params_space()

    all_combos = get_all_params_combinations(training_params)
    columns = [
        "checkpoints", *training_params.keys(),
        "train_accuracy", "val_accuracy", "test_accuracy",
    ]
    try:
        df = pd.read_csv(results_path, index_col=0)
    except FileNotFoundError:
        df = pd.DataFrame(columns=columns)

    from tqdm.auto import tqdm

    n_failed = 0
    with tqdm(all_combos, desc="Training all the parameters", position=0) as p_bar:
        for i, params in enumerate(p_bar):
            if str(hash_params(params)) in df["checkpoints"].values.astype(str):
                continue
            try:
                leave = i == len(all_combos) - 1
                result = train_with_params(
                    params, data_folder=data_folder, verbose=verbose,
                    p_bar_leave=leave, **train_kwargs,
                )
                df = pd.concat(
                    [df, pd.DataFrame(_result_rows(result, params))],
                    ignore_index=True,
                )
                from .checkpoint import _is_writer

                if _is_writer():  # multi-host: CSV belongs to process 0
                    df.to_csv(results_path)
                import numpy as _np

                p_bar.set_postfix(
                    train_accuracy=float(_np.mean(result["accuracies"]["train"])),
                    val_accuracy=float(_np.mean(result["accuracies"]["val"])),
                    test_accuracy=float(_np.mean(result["accuracies"]["test"])),
                )
            except Exception as e:  # per-config isolation (training.py:198-200)
                logger.error(e)
                n_failed += 1
                continue
    if n_failed:
        # Unlike the reference, surface systemic failures loudly: an all-
        # failed sweep otherwise looks like an innocently empty CSV.
        logger.warning(
            "%d/%d sweep configs raised and were skipped; see error logs.",
            n_failed, len(all_combos),
        )
    return df
