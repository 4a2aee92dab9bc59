"""Loss functions and spike regularizers.

The reference ships an *empty* ``losses.py`` (src/modules/losses.py, 0
bytes); the regularization losses it intended exist only as commented-out
sketches in the training step (snn.py:401-408).  This module implements
those sketches as working, optional regularizers:

* :func:`l1_total_spike_count` -- ``1e-5 * sum(total spikes)`` (the L1
  sketch, snn.py:404).
* :func:`l2_spikes_per_neuron` -- mean squared per-neuron spike count over
  batch+time (the L2 sketch, snn.py:405-407).
* :func:`mean_spike_count_per_neuron` -- the ``get_spikes_count_per_neuron``
  mean (snn.py:402, 408 with snn.py:261-270).

Each takes the hidden-state traces dict returned by ``models.apply(...,
return_hidden=True)`` (``{layer_name: tuple of (B, T, width)}``; the last
tuple element of spiking layers is the z-trace) and returns a scalar.
Pass one (or any callable with the same signature) as ``reg_fn`` to
``Trainer.fit`` -- the default remains no regularization, matching the
reference's active code path.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "l1_total_spike_count",
    "l2_spikes_per_neuron",
    "mean_spike_count_per_neuron",
    "SpikeRegularizer",
]

SpikeRegularizer = Callable[[Dict[str, Tuple[jax.Array, ...]]], jax.Array]


def _spike_traces(hidden_states: Dict[str, Tuple[jax.Array, ...]], cfg=None):
    """z-traces of LIF-family layers (snn.py:403).

    Parity detail: the reference's sketches build on
    ``get_spikes_count_per_neuron``'s ``isinstance(layer, LIFLayer)``
    filter (snn.py:268), which excludes Izhikevich.  When an ``SNNConfig``
    is supplied the same exclusion applies; without one, every non-readout
    layer counts (all layers are LIF-family in every reference sweep).
    """
    if cfg is not None:
        from ..ops.cells import ALIFConfig, LIFConfig

        lcfg_by_name = dict(cfg.layer_configs)
        return [
            traces[-1]
            for name, traces in hidden_states.items()
            if type(lcfg_by_name.get(name)) in (LIFConfig, ALIFConfig)
        ]
    return [
        traces[-1]
        for name, traces in hidden_states.items()
        if name != "readout"
    ]


def l1_total_spike_count(
    hidden_states: Dict[str, Tuple[jax.Array, ...]], scale: float = 1e-5,
    cfg=None,
) -> jax.Array:
    """L1 penalty on the total number of spikes (snn.py:404)."""
    spikes = _spike_traces(hidden_states, cfg)
    if not spikes:
        return jnp.asarray(0.0)
    return scale * sum(jnp.sum(s) for s in spikes)


def l2_spikes_per_neuron(
    hidden_states: Dict[str, Tuple[jax.Array, ...]], scale: float = 1e-5,
    cfg=None,
) -> jax.Array:
    """L2 penalty on per-neuron spike counts (snn.py:405-407): for each
    layer, square the per-neuron count summed over batch and time, then
    take the mean over neurons."""
    spikes = _spike_traces(hidden_states, cfg)
    if not spikes:
        return jnp.asarray(0.0)
    return scale * sum(
        jnp.mean(jnp.sum(s, axis=(0, 1)) ** 2) for s in spikes
    )


def mean_spike_count_per_neuron(
    hidden_states: Dict[str, Tuple[jax.Array, ...]], cfg=None
) -> jax.Array:
    """Mean per-neuron spike count (snn.py:402 with :261-270)."""
    spikes = _spike_traces(hidden_states, cfg)
    if not spikes:
        return jnp.asarray(0.0)
    counts = jnp.concatenate([jnp.sum(s, axis=(0, 1)) for s in spikes])
    return jnp.mean(counts)
