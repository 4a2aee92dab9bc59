"""Surrogate-gradient comparison sweep (parity with the reference's
``spike_func_comparison_training.py``): FastSigmoid vs Phi on
Fashion-MNIST, ALIF-100 feedforward, into ``spk_tr_data/``.

Note: the reference grid (spike_func_comparison_training.py:17-25) omits
``n_steps``/``learn_beta``/``nb_epochs``, which ``train_with_params``
requires (training.py:99,113) -- every config would raise KeyError and be
swallowed by the sweep's exception isolation.  This version supplies the
missing keys so the comparison actually runs.
"""
import logging
import sys
from pathlib import Path
from typing import Any, Dict

sys.path.insert(0, str(Path(__file__).parent))

from snnimageclassification_tpu.data.datasets import DatasetId
from snnimageclassification_tpu.ops.cells import LayerType
from snnimageclassification_tpu.ops.surrogate import SpikeFuncType
from snnimageclassification_tpu.train.sweep import train_all_params


def get_training_params_space() -> Dict[str, Any]:
    return {
        "dataset_id": [DatasetId.FASHION_MNIST],
        "to_spikes_use_periods": [False],
        "n_steps": [100],
        "n_hidden_neurons": [100],
        "spike_func": [SpikeFuncType.FastSigmoid, SpikeFuncType.Phi],
        "hidden_layer_type": [LayerType.ALIF],
        "use_recurrent_connection": [False],
        "learn_beta": [False],
        "nb_epochs": [15],
    }


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    train_all_params(
        training_params=get_training_params_space(),
        data_folder="spk_tr_data",
        verbose=True,
    )
