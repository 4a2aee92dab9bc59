"""snnimageclassification_tpu: a TPU-native spiking-neural-network
image-classification framework (JAX / XLA / Pallas / pjit).

A ground-up re-design of JeremieGince/SNNImageClassification for TPU:
spike encoding, LIF/ALIF/Izhikevich dynamics with surrogate-gradient BPTT,
scan-compiled simulation, data-parallel training over device meshes,
checkpoint/resume, hyperparameter sweeps, and result analysis.
"""
__version__ = "0.1.0"

from .ops import (  # noqa: F401
    LayerType,
    SpikeFuncType,
    ToSpikes,
    batchwise_temporal_filter,
    encode_spikes,
    heaviside_phi,
    heaviside_sigmoid,
)
from .models import SNNConfig, ReadoutMth, ForwardMth  # noqa: F401
from .models.api import SNN  # noqa: F401
from .data import ArrayDataLoader, DatasetId, EncodeConfig, get_dataloaders  # noqa: F401
from .train import (  # noqa: F401
    CheckpointManager,
    LoadCheckpointMode,
    Trainer,
    train_all_params,
    train_with_params,
)
from .utils import LossHistory, mapping_update_recursively  # noqa: F401
from .parallel import make_mesh  # noqa: F401
from .parallel.ensemble import EnsembleTrainer  # noqa: F401
from .serve import InferenceServer  # noqa: F401
