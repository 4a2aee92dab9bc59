"""Object-oriented facade mirroring the reference's ``SNN`` class surface.

The reference exposes one ``torch.nn.Module`` that owns the layer stack,
the fit loop, evaluation, and checkpointing (snn.py:34-555).  The
TPU-native core is functional (models/snn.py + train/trainer.py); this
class binds them behind the same constructor/method names so reference
users can switch without relearning the API:

``SNN(inputs_size, output_size, n_hidden_neurons, use_recurrent_connection,
dt, int_time_steps, spike_func, hidden_layer_type, checkpoint_folder,
model_name, **layer_kwargs)`` then ``.fit(...)``, ``.forward`` /
``__call__``, ``get_prediction_{logits,proba,log_proba}``,
``compute_classification_accuracy``, ``compute_confusion_matrix``,
``save_checkpoint`` / ``load_checkpoint``, ``get_spikes_count_per_neuron``.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cells import LayerType
from ..ops.surrogate import SpikeFuncType
from ..train.checkpoint import LoadCheckpointMode
from ..train.trainer import Trainer
from . import snn as model_lib
from .config import SNNConfig

__all__ = ["SNN", "LoadCheckpointMode"]

_LAYER_KWARG_NAMES = (
    "threshold", "gamma", "tau_m", "tau_a", "tau_out", "beta", "learn_beta",
    "use_rec_eye_mask", "readout_mth", "readout_filter_decay",
    "compute_dtype", "matmul_dtype", "remat", "use_pallas",
)


class SNN:
    """Reference-compatible SNN classifier handle.

    ``device`` is accepted and ignored: placement is JAX's job (the
    reference's single-device ``.to(device)`` pattern, snn.py:100-101, has
    no TPU-native counterpart -- sharding lives in ``parallel/``).
    """

    def __init__(
        self,
        inputs_size: int,
        output_size: int,
        n_hidden_neurons: Union[int, Iterable[int], None] = None,
        use_recurrent_connection: bool = True,
        dt: float = 1e-3,
        int_time_steps: int = 100,
        spike_func: Union[SpikeFuncType, str] = SpikeFuncType.FastSigmoid,
        hidden_layer_type: Union[LayerType, str] = LayerType.LIF,
        device=None,  # accepted for parity; ignored
        checkpoint_folder: str = "checkpoints",
        model_name: str = "snn",
        seed: int = 0,
        mesh=None,
        pp_n_micro: int = None,
        **kwargs: Any,
    ):
        del device
        cfg_kwargs = {k: v for k, v in kwargs.items() if k in _LAYER_KWARG_NAMES}
        unknown = set(kwargs) - set(cfg_kwargs)
        if unknown:
            raise TypeError(f"Unknown SNN kwargs: {sorted(unknown)}")
        self.config = SNNConfig(
            input_size=inputs_size,
            output_size=output_size,
            n_hidden_neurons=n_hidden_neurons,
            use_recurrent_connection=use_recurrent_connection,
            dt=dt,
            int_time_steps=int_time_steps,
            spike_func=spike_func,
            hidden_layer_type=hidden_layer_type,
            **cfg_kwargs,
        )
        self.trainer = Trainer(
            self.config,
            checkpoint_folder=checkpoint_folder,
            model_name=model_name,
            seed=seed,
            mesh=mesh,
            pp_n_micro=pp_n_micro,
        )

    # -- attribute passthroughs -------------------------------------------------
    @property
    def params(self):
        # Canonical per-layer form regardless of the trainer's parallelism
        # strategy (PP keeps a stacked padded stage representation live).
        return self.trainer.canonical_params

    @params.setter
    def params(self, value):
        self.trainer.set_canonical_params(value)

    @property
    def loss_history(self):
        return self.trainer.loss_history

    @property
    def checkpoint_folder(self) -> str:
        return self.trainer.ckpt.checkpoint_folder

    @property
    def model_name(self) -> str:
        return self.trainer.ckpt.model_name

    @property
    def checkpoints_meta_path(self) -> str:
        return self.trainer.ckpt.checkpoints_meta_path

    @property
    def input_size(self) -> int:
        return self.config.input_size

    @property
    def output_size(self) -> int:
        return self.config.output_size

    @property
    def int_time_steps(self) -> int:
        return self.config.int_time_steps

    # -- forward / prediction ----------------------------------------------------
    def __call__(self, inputs, return_hidden: bool = True):
        return self.forward(inputs, return_hidden=return_hidden)

    def forward(self, inputs, return_hidden: bool = True):
        """Simulate; returns (outputs_trace, hidden_states) like snn.py:201-219."""
        return model_lib.apply(
            self.config, self.params, jnp.asarray(inputs, jnp.float32),
            return_hidden=return_hidden,
        )

    def get_prediction_logits(
        self, inputs, re_outputs_trace: bool = True, re_hidden_states: bool = True
    ):
        """Max-over-time logits, optionally with traces (snn.py:221-237)."""
        outputs_trace, hidden_states = self.forward(
            inputs, return_hidden=re_hidden_states
        )
        logits = model_lib.prediction_logits(self.config, outputs_trace)
        if re_outputs_trace and re_hidden_states:
            return logits, outputs_trace, hidden_states
        if re_outputs_trace:
            return logits, outputs_trace
        if re_hidden_states:
            return logits, hidden_states
        return logits

    def get_prediction_proba(
        self, inputs, re_outputs_trace: bool = True, re_hidden_states: bool = True
    ):
        """Softmax probabilities (snn.py:239-248)."""
        out = self.get_prediction_logits(inputs, re_outputs_trace, re_hidden_states)
        if re_outputs_trace or re_hidden_states:
            return (jax.nn.softmax(out[0], axis=-1), *out[1:])
        return jax.nn.softmax(out, axis=-1)

    def get_prediction_log_proba(
        self, inputs, re_outputs_trace: bool = True, re_hidden_states: bool = True
    ):
        """Log-softmax probabilities (snn.py:250-259)."""
        out = self.get_prediction_logits(inputs, re_outputs_trace, re_hidden_states)
        if re_outputs_trace or re_hidden_states:
            return (jax.nn.log_softmax(out[0], axis=-1), *out[1:])
        return jax.nn.log_softmax(out, axis=-1)

    def get_spikes_count_per_neuron(self, hidden_states: Dict[str, tuple]):
        """Total spike count per hidden neuron from state traces
        (snn.py:261-270): sums the z-trace (last state element) over batch
        and time for every LIF-family layer.

        Parity detail: the reference's ``isinstance(layer, LIFLayer)``
        check covers LIF and ALIF but NOT Izhikevich (an RNNLayer, not a
        LIFLayer subclass) -- Izhikevich layers are excluded here too.
        """
        from ..ops.cells import ALIFConfig, LIFConfig

        lcfg_by_name = dict(self.config.layer_configs)
        counts = []
        for l_name, traces in hidden_states.items():
            if type(lcfg_by_name.get(l_name)) not in (LIFConfig, ALIFConfig):
                continue
            z_trace = traces[-1]  # (B, T, width)
            counts.append(jnp.sum(z_trace, axis=(0, 1)))
        if not counts:
            return jnp.zeros((0,), jnp.float32)
        return jnp.concatenate(counts)

    # -- training / evaluation -----------------------------------------------------
    def fit(self, train_dataloader, val_dataloader, **kwargs):
        return self.trainer.fit(train_dataloader, val_dataloader, **kwargs)

    def compute_classification_accuracy(self, dataloader, verbose=False, desc=None):
        return self.trainer.compute_classification_accuracy(dataloader, verbose, desc)

    def compute_confusion_matrix(self, nb_classes, dataloaders, **kwargs):
        return self.trainer.compute_confusion_matrix(nb_classes, dataloaders, **kwargs)

    # -- checkpointing ----------------------------------------------------------------
    def save_checkpoint(self, epoch: int, epoch_losses: Dict[str, float], best=False):
        self.trainer._ensure_optimizer_any()
        return self.trainer.ckpt.save_checkpoint(
            self.trainer.canonical_params, self.trainer.opt_state, epoch,
            epoch_losses, best,
        )

    def load_checkpoint(
        self, load_checkpoint_mode: LoadCheckpointMode = LoadCheckpointMode.BEST_EPOCH
    ):
        return self.trainer.load_checkpoint(load_checkpoint_mode)

    def get_checkpoints_loss_history(self):
        return self.trainer.ckpt.get_checkpoints_loss_history()

    def plot_loss_history(self, loss_history=None, show=False):
        return self.trainer.plot_loss_history(loss_history, show)

    # -- export ----------------------------------------------------------------------
    def export_stablehlo(self, sample_input=None) -> str:
        """Serialize the forward computation as StableHLO text -- the
        TPU-native analogue of the reference's (comment-only) ONNX export
        (snn.py:485-496)."""
        if sample_input is None:
            sample_input = jnp.zeros((1, self.input_size), jnp.float32)
        lowered = jax.jit(
            lambda p, x: model_lib.forward_logits(self.config, p, x)
        ).lower(self.params, sample_input)
        return lowered.as_text()

    def to_onnx(self, in_viz=None) -> str:
        """Name-parity with the reference's ``to_onnx`` (snn.py:485-496,
        itself only referenced from comments).  ONNX is not a TPU-native
        interchange format; this writes the StableHLO serialization to
        ``{checkpoint_folder}/{model_name}.stablehlo`` instead and returns
        the path."""
        import os

        text = self.export_stablehlo(in_viz)
        os.makedirs(self.checkpoint_folder, exist_ok=True)
        path = f"{self.checkpoint_folder}/{self.model_name}.stablehlo"
        with open(path, "w") as f:
            f.write(text)
        return path
