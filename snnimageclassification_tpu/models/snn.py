"""Functional SNN model: parameter init, scan-based simulation, logits.

The reference simulates the network with a per-time-step Python loop over
``nn.Module`` layers (snn.py:201-219).  Here the time recurrence is a
single :func:`jax.lax.scan` whose body applies the layer stack in order
(layer-then-time, exactly the reference's ordering, snn.py:209-214), so the
whole T-step BPTT graph is one fused XLA computation:

* The first layer's input-current matmul is *hoisted out of the scan* as
  one large ``(T*B, F) @ (F, H)`` MXU matmul over all time steps -- the
  input spikes are known ahead of time, so there is no reason to issue T
  small matmuls sequentially.
* Recurrent weights are eye-masked once per forward pass
  (ops/cells.masked_recurrent), not per step.
* Optional ``jax.checkpoint`` (remat) on the scan body trades FLOPs for
  BPTT activation memory at large ``batch * T * hidden``.

Everything here is pure: ``params`` is a ``{layer_name: {leaf: array}}``
pytree, states are NamedTuples, configs are static dataclasses.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.cells import (
    INIT_PARAM_FNS,
    INIT_STATE_FNS,
    STEP_FNS,
    masked_recurrent,
)
from ..ops.temporal import batchwise_temporal_filter, temporal_max
from .config import ReadoutMth, SNNConfig

__all__ = [
    "init",
    "init_state",
    "format_inputs",
    "apply",
    "prediction_logits",
    "forward_logits",
    "param_labels",
]

Params = Dict[str, Dict[str, jax.Array]]


def init(cfg: SNNConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Initialize all layer parameters.

    Init statistics match the reference's two-sweep scheme (model-level
    init then per-layer overrides, snn.py:149-157): hidden-layer weights
    ~ N(0, threshold^2), Izhikevich ~ N(0,1), readout W ~ N(0,1) with zero
    bias, and (quirk) a learnable ALIF beta ~ N(0, threshold^2).
    """
    params: Params = {}
    layer_cfgs = cfg.layer_configs
    keys = jax.random.split(key, len(layer_cfgs))
    for k, (name, lcfg) in zip(keys, layer_cfgs):
        params[name] = INIT_PARAM_FNS[type(lcfg)](lcfg, k, dtype)
    return params


def init_state(cfg: SNNConfig, batch_size: int, dtype=jnp.float32) -> Tuple:
    """Zero (or v_rest, for Izhikevich) initial state tuple, one per layer."""
    return tuple(
        INIT_STATE_FNS[type(lcfg)](lcfg, batch_size, dtype)
        for _, lcfg in cfg.layer_configs
    )


def format_inputs(cfg: SNNConfig, inputs: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Shape inputs to ``(B, T, F)``.

    Parity with snn.py:159-184: 2-D ``(B, F)`` inputs are treated as
    constant over time and repeated across ``int_time_steps``; 3-D inputs
    with fewer time steps are zero-padded at the end of the time axis.
    """
    inputs = jnp.asarray(inputs)
    if inputs.ndim == 2:
        inputs = jnp.broadcast_to(
            inputs[:, None, :], (inputs.shape[0], cfg.int_time_steps, inputs.shape[1])
        )
    if inputs.ndim != 3:
        raise ValueError(
            "inputs must be (batch, features) or (batch, time, features); "
            f"got shape {inputs.shape}"
        )
    t_diff = cfg.int_time_steps - inputs.shape[1]
    if t_diff < 0:
        raise ValueError(
            f"inputs have {inputs.shape[1]} time steps > int_time_steps="
            f"{cfg.int_time_steps}"
        )
    if t_diff > 0:
        pad = jnp.zeros((inputs.shape[0], t_diff, inputs.shape[2]), dtype)
        inputs = jnp.concatenate([inputs.astype(dtype), pad], axis=1)
    return inputs.astype(dtype)


def apply(
    cfg: SNNConfig,
    params: Params,
    inputs: jax.Array,
    *,
    return_hidden: bool = False,
    initial_state: Optional[Tuple] = None,
):
    """Simulate the network for ``cfg.int_time_steps`` steps.

    Returns ``(outputs_trace, hidden_states)`` where ``outputs_trace`` is
    the readout trace ``(B, T, output_size)`` (snn.py:218) and
    ``hidden_states`` is ``{layer_name: tuple of (B, T, width) arrays}``
    (snn.py:186-199) when ``return_hidden`` else ``None``.
    """
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    layer_cfgs = cfg.layer_configs
    x = format_inputs(cfg, inputs, compute_dtype)  # (B, T, F)
    batch = x.shape[0]

    cparams = jax.tree.map(lambda p: p.astype(compute_dtype), params)
    w_rec_effs = tuple(
        masked_recurrent(lcfg, cparams[name]) if getattr(lcfg, "use_recurrent_connection", False) else None
        for name, lcfg in layer_cfgs
    )

    # Hoist the first layer's input matmul out of the scan: one big MXU
    # matmul over all time steps instead of T sequential small ones.
    x_tm = jnp.swapaxes(x, 0, 1)  # (T, B, F)
    first_name, first_cfg = layer_cfgs[0]
    i0 = x_tm @ cparams[first_name]["w_in"]  # (T, B, H0)

    states0 = (
        initial_state
        if initial_state is not None
        else init_state(cfg, batch, compute_dtype)
    )

    def step(states, i0_t):
        new_states = []
        fwd = i0_t
        for idx, (name, lcfg) in enumerate(layer_cfgs):
            step_fn = STEP_FNS[type(lcfg)]
            fwd, ns = step_fn(
                lcfg,
                cparams[name],
                states[idx],
                fwd,
                w_rec_eff=w_rec_effs[idx],
                precomputed_input_current=(idx == 0),
            )
            new_states.append(ns)
        new_states = tuple(new_states)
        emit = (fwd, new_states) if return_hidden else (fwd, None)
        return new_states, emit

    if cfg.remat:
        step = jax.checkpoint(step)

    _, (out_trace_tm, hidden_tm) = jax.lax.scan(step, states0, i0)

    outputs_trace = jnp.swapaxes(out_trace_tm, 0, 1).astype(jnp.float32)  # (B, T, out)

    hidden_states = None
    if return_hidden:
        hidden_states = {
            name: tuple(
                jnp.swapaxes(leaf, 0, 1).astype(jnp.float32) for leaf in hidden_tm[idx]
            )
            for idx, (name, _) in enumerate(layer_cfgs)
        }
    return outputs_trace, hidden_states


def prediction_logits(cfg: SNNConfig, outputs_trace: jax.Array) -> jax.Array:
    """Reduce the readout trace over time to class logits.

    Default is max-over-time (snn.py:228); ``ReadoutMth.TEMPORAL_FILTER``
    selects the decayed temporal sum the reference keeps as an alternative
    (snn.py:229).
    """
    if cfg.readout_mth == ReadoutMth.TEMPORAL_FILTER:
        return batchwise_temporal_filter(outputs_trace, cfg.readout_filter_decay)
    return temporal_max(outputs_trace, time_axis=1)


def forward_logits(cfg: SNNConfig, params: Params, inputs: jax.Array) -> jax.Array:
    """Convenience: simulate and reduce to logits in one call."""
    outputs_trace, _ = apply(cfg, params, inputs, return_hidden=False)
    return prediction_logits(cfg, outputs_trace)


def param_labels(cfg: SNNConfig, params: Params) -> Params:
    """Label every leaf for optimizer masking.

    Matmul weights and biases are ``"weight"``; a learnable ALIF beta is
    ``"beta"``.  Torch's Adam skips parameters whose grad is None -- beta in
    the reference (quirk Q3) -- so beta must be excluded from both the Adam
    update *and* L2 weight decay to match.
    """
    return {
        name: {leaf: ("beta" if leaf == "beta" else "weight") for leaf in group}
        for name, group in params.items()
    }
