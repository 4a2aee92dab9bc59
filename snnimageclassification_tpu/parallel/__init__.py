"""Parallelism: device meshes, shardings, data- and tensor-parallel training."""
from .mesh import (
    DATA_AXIS,
    batch_sharded,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
)
from .tp import (
    MODEL_AXIS,
    make_2d_mesh,
    make_tp_forward,
    make_tp_loss_fn,
    make_tp_train_step,
    shard_params_2d,
    tp_param_specs,
)
from .pp import (
    PIPE_AXIS,
    make_pp_forward,
    make_pp_loss_fn,
    make_pp_mesh,
    make_pp_train_step,
    pp_param_labels,
    pp_stack_params,
    pp_unstack_params,
    shard_params_pp,
)
from . import multihost
from .pp3 import (
    make_3d_mesh,
    make_pp3_forward,
    make_pp3_loss_fn,
    make_pp3_train_step,
    pp3_param_labels,
    pp3_stack_params,
    pp3_unstack_params,
    shard_params_pp3,
)
