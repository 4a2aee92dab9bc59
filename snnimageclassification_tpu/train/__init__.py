"""Training engine: jitted fit loop, checkpointing, sweeps."""
from .checkpoint import CheckpointManager, LoadCheckpointMode
from .trainer import Trainer, default_criterion, make_optimizer, nll_loss
from .sweep import (
    get_all_params_combinations,
    get_meta_name,
    get_training_params_space,
    hash_params,
    save_params,
    train_all_params,
    train_with_params,
)
