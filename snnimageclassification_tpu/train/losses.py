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
    "L1TotalSpikeCount",
    "L2SpikesPerNeuron",
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


# ---------------------------------------------------------------------------
# Count-based regularizer objects: the fused-path carriers
# ---------------------------------------------------------------------------
# Both reference regularizer sketches are functions of per-neuron spike
# COUNTS only, never of the full (B, T, H) trace:
#
#   l1 = scale * sum_{b,t,h} z          = scale * sum_h c_h
#   l2 = scale * mean_h (sum_{b,t} z)^2 = scale * mean_h c_h^2
#
# with c_h = sum_b w_b * counts[b, h] (w = the trainer's per-sample
# weights, zero on padding rows).  Passing one of these OBJECTS as
# ``Trainer.fit``'s ``reg_fn`` lets the trainer use the count-emitting
# forward (models/snn.py:forward_logits_counts_pixels): the fused Pallas
# whole-network kernels stay engaged instead of falling back to the
# trace-returning XLA path (measured 7.9x slower on the flagship).  The
# objects are also plain callables on hidden-trace dicts, identical to
# the function forms above, so they work anywhere the functions do.


class _CountRegularizer:
    """Base: callable on hidden traces AND on (counts, weights)."""

    #: "l1" | "l2" -- lets shard-aware paths (parallel/tp.py) re-derive
    #: the same scalar from shard-local counts with explicit collectives.
    kind: str = ""

    def __init__(self, scale: float = 1e-5, cfg=None):
        self.scale = float(scale)
        self.cfg = cfg

    def __call__(self, hidden_states: Dict[str, Tuple[jax.Array, ...]]):
        raise NotImplementedError

    def from_counts(self, counts: Dict[str, jax.Array], w: jax.Array):
        """Scalar reg term from ``{layer: (B, H) spike counts}`` and the
        per-sample weights ``(B,)`` (0 on padding rows).  Exactly equal to
        ``self(weight-masked hidden traces)``."""
        raise NotImplementedError


class L1TotalSpikeCount(_CountRegularizer):
    """Object form of :func:`l1_total_spike_count` (snn.py:404)."""

    kind = "l1"

    def __call__(self, hidden_states):
        return l1_total_spike_count(hidden_states, self.scale, self.cfg)

    def from_counts(self, counts, w):
        if not counts:
            return jnp.asarray(0.0)
        return self.scale * sum(
            jnp.sum(w @ c.astype(jnp.float32)) for c in counts.values()
        )


class L2SpikesPerNeuron(_CountRegularizer):
    """Object form of :func:`l2_spikes_per_neuron` (snn.py:405-407)."""

    kind = "l2"

    def __call__(self, hidden_states):
        return l2_spikes_per_neuron(hidden_states, self.scale, self.cfg)

    def from_counts(self, counts, w):
        if not counts:
            return jnp.asarray(0.0)
        return self.scale * sum(
            jnp.mean((w @ c.astype(jnp.float32)) ** 2)
            for c in counts.values()
        )
