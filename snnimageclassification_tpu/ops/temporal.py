"""Temporal filtering ops over spike/readout traces.

Parity: ``src/modules/utils.py:11-25`` (``batchwise_temporal_filter``) --
an exponentially-decayed sum over the time axis with weights
``decay**(T-1-t)``.  The reference uses it only as a commented-out
alternative readout (snn.py:229) but ships unit tests for it
(test/test_temporal_filter.py), so it is first-class API here and is
available as the model's alternative readout reduction.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["batchwise_temporal_filter", "temporal_max"]


@partial(jax.jit, static_argnames=("time_axis",))
def batchwise_temporal_filter(
    x: jax.Array, decay: float = 0.9, time_axis: int = 1
) -> jax.Array:
    """Exponentially-decayed sum over the time axis.

    ``out = sum_t decay**(T-1-t) * x[:, t]`` for the default
    ``time_axis=1`` layout ``(batch, time, ...)`` (utils.py:11-25).
    """
    time_steps = x.shape[time_axis]
    powers = jnp.arange(time_steps - 1, -1, -1, dtype=x.dtype)
    weights = jnp.power(jnp.asarray(decay, dtype=x.dtype), powers)
    shape = [1] * x.ndim
    shape[time_axis] = time_steps
    return jnp.sum(x * weights.reshape(shape), axis=time_axis)


def temporal_max(x: jax.Array, time_axis: int = 1) -> jax.Array:
    """Max-over-time readout reduction (snn.py:228).

    Implemented as first-occurrence argmax + gather rather than
    ``jnp.max`` so the *backward* matches ``torch.max``: on ties torch
    routes the whole cotangent to the first maximal time step, while
    ``jnp.max``'s VJP splits it evenly among ties.  Ties are real -- a
    hidden layer that never spikes yields an all-zero readout trace --
    and the difference is machine-checked by
    tests/test_reference_equivalence.py.
    """
    idx = jnp.argmax(x, axis=time_axis)  # first max index, like torch.max
    gathered = jnp.take_along_axis(
        x, jnp.expand_dims(idx, time_axis), axis=time_axis
    )
    return jnp.squeeze(gathered, axis=time_axis)
