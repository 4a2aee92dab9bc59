"""Tensor parallelism: hidden-dimension sharding over a 2-D (data, model) mesh.

The reference has no parallelism of any kind (single device, ``.to(cuda)``,
src/modules/snn.py:141-147); ``parallel/mesh.py`` adds the GSPMD data-parallel
story.  This module adds the second mesh axis: **Megatron-style column
sharding of the hidden dimension**, for configs whose hidden width outgrows
one chip (wide-hidden sweeps, `scripts/wide_hidden_check.py` territory) or
whose per-chip batch shard under pure DP is too small to keep the MXU busy.

Layout (``shard_map`` over a ``Mesh((n_data, n_model), ("data", "model"))``):

* the batch axis is sharded over ``"data"`` (as in mesh.py);
* every hidden layer's neurons are sharded over ``"model"``:
  ``W_in (F, H)`` and ``W_rec (H, H)`` are **column-sharded**
  ``P(None, "model")`` and the neuron state tensors ``v/a/u/z (B, H)``
  live shard-local -- each chip simulates ``H / n_model`` neurons;
* the recurrent matmul needs every neuron's previous spike, so the scan
  body ``all_gather``s the ``(B_loc, H_loc)`` spike shard over ``"model"``
  once per step and contracts the full ``(B_loc, H)`` against the local
  ``W_rec`` columns.  On a real slice this collective rides ICI; its
  backward is the matching ``reduce_scatter`` (inserted by autodiff);
* between layers, the full spike trace is gathered once
  (``all_gather`` over the time-major trace) -- the next layer's columns
  need every input row;
* the readout (``H x n_out``, tiny) is replicated; every model shard
  computes identical logits, so the loss ``psum``s over **both** axes with
  the double-count cancelling in the weighted mean.  This keeps the
  global function well-defined under ``check_vma=False`` and makes
  autodiff produce exactly the DP gradient all-reduce over ``"data"``
  plus correct (un-double-counted) cotangents for replicated leaves.

Numerics: column sharding splits only matmul *output* columns -- every
contraction keeps its full length and summation order, so the forward is
bit-identical to single-device; gradients differ only by the data-shard
summation order of the batch reduction (~1e-6 relative).
``tests/test_tp.py`` pins both on the virtual 8-device CPU mesh, and
``__graft_entry__.dryrun_multichip`` runs the 2-D (dp x tp) step as part
of the driver contract.

The shard-local compute is the XLA scan path (ops/cells.py step fns); on a
real multi-chip slice the fused Pallas kernels can slot in per-shard for
feed-forward layers (their column blocks are shard-local), which is left
to a round with hardware to measure on.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import SNNConfig
from ..models import snn as model_lib
from ..ops.cells import (
    ALIFConfig,
    INIT_STATE_FNS,
    IzhikevichConfig,
    LIFConfig,
    ReadoutConfig,
    STEP_FNS,
)
from ..ops.encoding import encode_spikes

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_2d_mesh",
    "tp_param_specs",
    "shard_params_2d",
    "make_tp_forward",
    "make_tp_loss_fn",
    "make_tp_loss_logits_fn",
    "make_tp_train_step",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_2d_mesh(
    n_data: int,
    n_model: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(n_data, n_model) mesh with axes ("data", "model").

    On real hardware, pass devices ordered so the "model" axis (the
    latency-critical per-step all_gather) maps to the fastest ICI links.
    """
    if devices is None:
        devices = jax.devices()
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(
            f"mesh ({n_data}, {n_model}) needs {need} devices, have "
            f"{len(devices)}"
        )
    arr = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _is_hidden(lcfg) -> bool:
    return type(lcfg) in (LIFConfig, ALIFConfig, IzhikevichConfig)


def _validate(cfg: SNNConfig, mesh: Mesh) -> None:
    if MODEL_AXIS not in mesh.axis_names or DATA_AXIS not in mesh.axis_names:
        raise ValueError(
            f"tensor parallelism needs a ('{DATA_AXIS}', '{MODEL_AXIS}') "
            f"mesh (make_2d_mesh); got axes {mesh.axis_names}"
        )
    n_model = mesh.shape[MODEL_AXIS]
    for name, lcfg in cfg.layer_configs:
        if _is_hidden(lcfg) and lcfg.output_size % n_model:
            raise ValueError(
                f"hidden layer {name!r} width {lcfg.output_size} is not "
                f"divisible by the model-axis size {n_model}"
            )


def tp_param_specs(cfg: SNNConfig) -> Dict[str, Dict[str, P]]:
    """PartitionSpec pytree matching ``models.snn.init``'s params.

    Hidden-layer matmul weights are column-sharded over "model"; scalars
    (ALIF beta) and the readout are replicated (implicitly all-reduced
    over "data" by autodiff -- the DP gradient sync).
    """
    specs: Dict[str, Dict[str, P]] = {}
    for name, lcfg in cfg.layer_configs:
        if _is_hidden(lcfg):
            group = {"w_in": P(None, MODEL_AXIS)}
            if lcfg.use_recurrent_connection:
                group["w_rec"] = P(None, MODEL_AXIS)
            if type(lcfg) is ALIFConfig and lcfg.learn_beta:
                group["beta"] = P()
        else:  # readout: (H, n_out) is tiny -- replicate
            group = {"w_in": P(), "b": P()}
        specs[name] = group
    return specs


def shard_params_2d(mesh: Mesh, cfg: SNNConfig, params):
    """device_put params with :func:`tp_param_specs` shardings."""
    _validate(cfg, mesh)
    specs = tp_param_specs(cfg)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def _masked_rec_local(lcfg, w_rec_loc: jax.Array) -> jax.Array:
    """Shard-local eye mask: zero W_rec[i, j] where i == global column j.

    The mask removes self-connections (spiking_layers.py:50-51); the local
    shard holds columns [j0, j0 + H_loc) with j0 = model_rank * H_loc.
    """
    if not lcfg.use_rec_eye_mask:
        return w_rec_loc
    h, h_loc = w_rec_loc.shape
    j0 = jax.lax.axis_index(MODEL_AXIS) * h_loc
    rows = jnp.arange(h)[:, None]
    cols = j0 + jnp.arange(h_loc)[None, :]
    return w_rec_loc * (rows != cols).astype(w_rec_loc.dtype)


def _local_init_state(lcfg, batch: int, dtype):
    """Zero/v_rest initial state for the *local* neuron shard."""
    n_model = jax.lax.axis_size(MODEL_AXIS)
    local_cfg = dataclasses.replace(lcfg, output_size=lcfg.output_size // n_model)
    return INIT_STATE_FNS[type(lcfg)](local_cfg, batch, dtype)


def _tp_forward_local(cfg: SNNConfig, params, x: jax.Array, enc,
                      collect_counts: bool = False):
    """Shard-local forward: local batch x local neurons -> full logits.

    Runs INSIDE shard_map.  ``x`` is the local (B_loc, F) pixel / (B_loc,
    T, F) input shard; ``params`` leaves are the local shards per
    :func:`tp_param_specs`.  Returns (B_loc, n_out) logits, identical on
    every model shard.

    ``collect_counts``: additionally return ``{layer: (B_loc, H_loc)}``
    per-sample spike counts of the LOCAL neuron shard for LIF/ALIF layers
    (the spike-regularizer carrier; reference filter snn.py:268 excludes
    Izhikevich) -- summed from the pre-gather local z trace, so no extra
    communication.
    """
    if enc is not None:
        x = encode_spikes(
            jnp.asarray(x, jnp.float32),
            n_steps=enc.n_steps,
            use_periods=enc.use_periods,
            tau=enc.tau,
            thr=enc.thr,
            epsilon=enc.epsilon,
        )
    x = model_lib.format_inputs(cfg, x, jnp.float32)  # (B_loc, T, F)
    batch = x.shape[0]

    counts = {}
    z_full_tm = None  # previous layer's gathered (T, B_loc, H_prev) trace
    for name, lcfg in cfg.layer_configs:
        lparams = params[name]
        if not _is_hidden(lcfg):  # readout: replicated, full-width
            cur_tm = z_full_tm @ lparams["w_in"]  # (T, B_loc, n_out)

            def ro_step(state, cur_t, _lcfg=lcfg, _b=lparams["b"]):
                v = _lcfg.kappa * state.v + cur_t + _b
                return type(state)(v=v), v

            state0 = _local_init_state_full(lcfg, batch, x.dtype)
            _, out_tm = jax.lax.scan(ro_step, state0, cur_tm)
            trace = jnp.swapaxes(out_tm, 0, 1)  # (B_loc, T, n_out)
            logits = model_lib.prediction_logits(cfg, trace)
            return (logits, counts) if collect_counts else logits

        # Hidden layer: column-sharded input matmul for all steps at once.
        if z_full_tm is None:
            cur_tm = jnp.swapaxes(x @ lparams["w_in"], 0, 1)  # (T, B_loc, H_loc)
        else:
            cur_tm = z_full_tm @ lparams["w_in"]
        w_rec_loc = (
            _masked_rec_local(lcfg, lparams["w_rec"])
            if lcfg.use_recurrent_connection
            else None
        )
        step_fn = STEP_FNS[type(lcfg)]

        def step(state, cur_t, _lcfg=lcfg, _lp=lparams, _w=w_rec_loc,
                 _step_fn=step_fn):
            if _w is not None:
                # Every neuron's previous spike feeds the local columns:
                # gather the (B_loc, H_loc) shard to (B_loc, H) over ICI.
                z_full = jax.lax.all_gather(
                    state.z, MODEL_AXIS, axis=1, tiled=True
                )
                cur_t = cur_t + z_full @ _w
            out, new_state = _step_fn(
                _lcfg, _lp, state, cur_t,
                w_rec_eff=None, precomputed_input_current=True,
            )
            return new_state, out

        if cfg.remat:
            step = jax.checkpoint(step)
        _, z_tm_loc = jax.lax.scan(
            step, _local_init_state(lcfg, batch, x.dtype), cur_tm
        )
        if collect_counts and type(lcfg) in (LIFConfig, ALIFConfig):
            counts[name] = jnp.sum(z_tm_loc.astype(jnp.float32), axis=0)
        # Next layer's columns contract every input row: gather the trace.
        z_full_tm = jax.lax.all_gather(z_tm_loc, MODEL_AXIS, axis=2, tiled=True)

    raise ValueError("config has no readout layer")


def _local_init_state_full(lcfg, batch: int, dtype):
    """Full-width (replicated) initial state, for the readout."""
    return INIT_STATE_FNS[type(lcfg)](lcfg, batch, dtype)


def _in_specs(cfg: SNNConfig, n_inputs: int):
    return (tp_param_specs(cfg),) + (P(DATA_AXIS),) * n_inputs


def make_tp_forward(cfg: SNNConfig, mesh: Mesh, enc=None):
    """jitted ``(params, x) -> logits`` with hidden-dim tensor parallelism.

    ``params`` must be sharded per :func:`shard_params_2d`; ``x`` is
    batch-sharded pixels (with ``enc``) or spikes/inputs (without).
    """
    _validate(cfg, mesh)
    fwd = jax.shard_map(
        partial(_tp_forward_local, cfg, enc=enc),
        mesh=mesh,
        in_specs=_in_specs(cfg, 1),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(fwd)


def _tp_loss_logits_local(cfg: SNNConfig, params, x, y, w, enc, reg=None):
    if reg is not None:
        logits, counts = _tp_forward_local(
            cfg, params, x, enc, collect_counts=True
        )
    else:
        logits = _tp_forward_local(cfg, params, x, enc)
    per = optax.softmax_cross_entropy_with_integer_labels(logits, y)
    # psum over BOTH axes: the model-axis double count cancels in the
    # ratio, and it keeps the global function (hence autodiff cotangents
    # for every replicated leaf) well-defined under check_vma=False.
    num = jax.lax.psum(jnp.sum(per * w), (DATA_AXIS, MODEL_AXIS))
    den = jax.lax.psum(jnp.sum(w), (DATA_AXIS, MODEL_AXIS))
    loss = num / jnp.maximum(den, 1.0)
    if reg is not None:
        loss = loss + _tp_reg_term(cfg, reg, counts, w)
    return loss, logits


def _tp_reg_term(cfg: SNNConfig, reg, counts, w):
    """Shard-aware spike regularizer (losses.L1TotalSpikeCount /
    L2SpikesPerNeuron semantics) from shard-local counts.

    Every (sample, neuron) count element lives on exactly one (data,
    model) shard, so:

    * l1 = scale * sum_{b,h} w_b c[b,h]  -> psum the local partial over
      BOTH axes (no double counting);
    * l2 = scale * mean_h (sum_b w_b c[b,h])^2 -> the per-neuron global-
      batch count needs a psum over "data" BEFORE squaring; the neuron
      mean is sum over local h, psum'd over "model", / H_global.

    Both reductions are identical on every shard, so the loss stays
    replicated (out_specs P()).
    """
    if reg.kind == "l1":
        local = sum(
            jnp.sum(w @ c.astype(jnp.float32)) for c in counts.values()
        ) if counts else jnp.asarray(0.0)
        return reg.scale * jax.lax.psum(local, (DATA_AXIS, MODEL_AXIS))
    if reg.kind != "l2":
        raise ValueError(
            f"unsupported count regularizer kind {reg.kind!r} under tensor "
            "parallelism (use losses.L1TotalSpikeCount / L2SpikesPerNeuron)"
        )
    widths = {name: lcfg.output_size for name, lcfg in cfg.layer_configs}
    term = jnp.asarray(0.0)
    for name, c in counts.items():
        c_h = jax.lax.psum(w @ c.astype(jnp.float32), DATA_AXIS)  # (H_loc,)
        term = term + jax.lax.psum(
            jnp.sum(c_h ** 2), MODEL_AXIS
        ) / widths[name]
    return reg.scale * term


def _tp_loss_local(cfg: SNNConfig, params, x, y, w, enc) -> jax.Array:
    return _tp_loss_logits_local(cfg, params, x, y, w, enc)[0]


def make_tp_loss_fn(cfg: SNNConfig, mesh: Mesh, enc=None):
    """``(params, x, y, w) -> scalar weighted-NLL loss`` under shard_map.

    Differentiable: ``jax.grad`` through it yields gradients with the
    :func:`tp_param_specs` shardings, including the DP all-reduce over
    "data" (autodiff transpose of the replicated-in psum-out structure).
    """
    _validate(cfg, mesh)
    return jax.shard_map(
        partial(_tp_loss_local, cfg, enc=enc),
        mesh=mesh,
        in_specs=_in_specs(cfg, 3),
        out_specs=P(),
        check_vma=False,
    )


def make_tp_loss_logits_fn(cfg: SNNConfig, mesh: Mesh, enc=None, reg=None):
    """``(params, x, y, w) -> (loss, logits)`` under shard_map.

    Same weighted-NLL loss as :func:`make_tp_loss_fn` (exactly the
    Trainer's default criterion, ``trainer.nll_loss``), plus the gathered
    ``(B, n_out)`` logits for prediction/accuracy -- the Trainer's eval
    path needs both from one forward.  Differentiable via ``has_aux=True``
    (the loss output carries the gradient; logits are aux).

    ``reg``: optional count-based spike regularizer object
    (``losses.L1TotalSpikeCount`` / ``L2SpikesPerNeuron``); its term is
    computed shard-aware from the local spike counts (:func:`_tp_reg_term`)
    and added to the loss -- equal to the single-device
    ``reg.from_counts`` value.
    """
    _validate(cfg, mesh)
    return jax.shard_map(
        partial(_tp_loss_logits_local, cfg, enc=enc, reg=reg),
        mesh=mesh,
        in_specs=_in_specs(cfg, 3),
        out_specs=(P(), P(DATA_AXIS)),
        check_vma=False,
    )


def make_tp_train_step(
    cfg: SNNConfig,
    mesh: Mesh,
    tx: optax.GradientTransformation,
    enc=None,
    donate: bool = True,
):
    """jitted full training step over the 2-D mesh.

    ``(params, opt_state, x, y, w) -> (params, opt_state, loss)`` with
    params/opt_state in :func:`tp_param_specs` shardings (the optimizer
    update is elementwise, so GSPMD keeps the shardings without help).
    """
    loss_fn = make_tp_loss_fn(cfg, mesh, enc)

    def train_step(params, opt_state, x, y, w):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, w)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(train_step, donate_argnums=(0, 1) if donate else ())
