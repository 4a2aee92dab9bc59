"""Single-run entry point: ``python -m snnimageclassification_tpu``.

Parity with the reference's ``__main__.py:58-74`` (the README "Code
Example"): MNIST, ALIF-128 recurrent, FastSigmoid, TTFS encoding
(periods=False), n_steps=2, 30 epochs, split 0.95.
"""
import pprint

from .data.datasets import DatasetId
from .ops.cells import LayerType
from .ops.surrogate import SpikeFuncType
from .train.sweep import train_with_params

if __name__ == "__main__":
    results = train_with_params(
        {
            "dataset_id": DatasetId.MNIST,
            "to_spikes_use_periods": False,
            "n_hidden_neurons": 128,
            "spike_func": SpikeFuncType.FastSigmoid,
            "hidden_layer_type": LayerType.ALIF,
            "use_recurrent_connection": True,
            "nb_epochs": 30,
            "n_steps": 2,
            "train_val_split_ratio": 0.95,
        },
        verbose=True,
    )
    pprint.pprint(
        {k: v for k, v in results.items() if k != "network"}, indent=4
    )
