"""Image -> spike-train encoding, as jittable on-device transforms.

The reference runs this encoder on CPU inside DataLoader worker processes
(``src/datasets/datasets.py:16-97``, workers at datasets.py:143-151).  Here
it is a pure ``jnp`` transform that runs *inside the jitted train step* on
TPU, so the host never bottlenecks the input pipeline and the whole
encode -> simulate -> readout path stays in HBM.

Semantics are bit-faithful to the reference (verified by the golden-file
test ported from ``test/test_to_spikes.py``):

* ``pixels_to_firing_periods`` (datasets.py:42-54): LIF-charge-time latency
  ``T = tau * ln(x / (x - thr))`` for supra-threshold pixels; sub-threshold
  pixels get ``t_max``; the result is truncated to int.
* TTFS mode ``firing_times_to_spikes`` (datasets.py:81-86): one spike at
  ``t = T`` iff ``T < n_steps``.
* Periodic mode ``firing_periods_to_spikes`` (datasets.py:72-79): period
  clamped into ``[1, n_steps - 1]``; spike wherever
  ``(t - p) % p == 0`` and ``t >= p``.

Quirk Q2 (preserve exactly): the production default ``tau = 20e-3``
(datasets.py:21) makes every supra-threshold latency < 1, which truncates
to 0 -- TTFS degenerates to "spike at t=0 iff pixel >= 0.2" and the
periodic mode to period-1 rasters.  That degenerate encoding is what
produced the published accuracies; unit tests use ``tau = 20.0``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "pixels_to_firing_periods",
    "firing_times_to_spikes",
    "firing_periods_to_spikes",
    "firing_periods_to_spikes_loop",
    "firing_periods_to_spikes_clip",
    "encode_spikes",
    "ToSpikes",
]


def pixels_to_firing_periods(
    x: jax.Array,
    *,
    t_max: float,
    tau: float = 20.0 * 1e-3,
    thr: float = 0.2,
    epsilon: float = 1e-7,
) -> jax.Array:
    """First-spike latency of a current-based LIF neuron charged by pixel x.

    Parity: datasets.py:42-54.  ``x`` is normalized to [0, 1].
    Returns int32 latencies; sub-threshold pixels map to ``t_max``.
    """
    sub = x < thr
    xc = jnp.clip(x, thr + epsilon, 1.0e9)
    latency = tau * jnp.log(xc / (xc - thr))
    latency = jnp.where(sub, t_max, latency)
    # np .astype(int) truncates toward zero; latencies are >= 0.
    return latency.astype(jnp.int32)


def firing_times_to_spikes(firing_times: jax.Array, n_steps: int) -> jax.Array:
    """Time-to-first-spike raster: one spike at t = firing_time if in range.

    Parity: datasets.py:81-86.  ``firing_times``: int array of shape
    ``(..., F)``; returns float32 ``(n_steps, ..., F)``.
    """
    t_idx = jnp.arange(n_steps, dtype=firing_times.dtype)
    t_idx = t_idx.reshape((n_steps,) + (1,) * firing_times.ndim)
    spikes = (t_idx == firing_times[None]) & (firing_times[None] < n_steps)
    return spikes.astype(jnp.float32)


def firing_periods_to_spikes(firing_periods: jax.Array, n_steps: int) -> jax.Array:
    """Periodic raster with period clamped into [1, n_steps-1].

    Parity: datasets.py:72-79 (the reference clamps in place; we clamp
    functionally).  Spike at t iff ``(t - p) % p == 0 and t >= p``.
    """
    p = jnp.clip(firing_periods, 1, n_steps - 1)
    t_idx = jnp.arange(n_steps, dtype=p.dtype)
    t_idx = t_idx.reshape((n_steps,) + (1,) * p.ndim)
    delta = t_idx - p[None]
    spikes = (delta % p[None] == 0) & (delta >= 0)
    return spikes.astype(jnp.float32)


def firing_periods_to_spikes_loop(
    firing_periods: jax.Array, n_steps: int
) -> jax.Array:
    """Dead reference variant #1 (datasets.py:56-62), vectorized.

    Semantics: the first spike lands at ``start = clip(p, 0, n_steps-1)``
    and repeats with the *unclamped* stride ``p`` (``np.arange(start,
    n_steps, step=p)``) -- unlike the live variant, which clamps the
    period into ``[1, n_steps-1]`` for both roles.  Defined for ``p >= 1``;
    the reference CRASHES on ``p == 0`` (``np.arange`` rejects step 0),
    which production data hits constantly under quirk Q2 (supra-threshold
    latencies truncate to 0) -- that crash is *why* this variant is dead.
    Here ``p == 0`` yields an all-zero row (jit cannot raise
    data-dependently) and ``p < 0`` yields zeros (an empty ``np.arange``).
    """
    # Canonicalize first (matches the ToSpikes wrapper): a raw numpy int64
    # input would otherwise make jnp.arange request int64 and warn-truncate.
    p = jnp.asarray(firing_periods)
    start = jnp.clip(p, 0, n_steps - 1)
    t_idx = jnp.arange(n_steps, dtype=p.dtype)
    t_idx = t_idx.reshape((n_steps,) + (1,) * p.ndim)
    delta = t_idx - start[None]
    p_safe = jnp.where(p >= 1, p, 1)
    spikes = (delta % p_safe[None] == 0) & (delta >= 0) & (p[None] >= 1)
    return spikes.astype(jnp.float32)


def firing_periods_to_spikes_clip(
    firing_periods: jax.Array, n_steps: int
) -> jax.Array:
    """Dead reference variant #2 (datasets.py:63-70), vectorized.

    Semantics: the start is clamped to ``[0, n_steps-1]`` (so ``p == 0``
    starts at t=0, where the live variant clamps to 1) but the modulus
    uses the *raw* period.  NumPy integer ``x % 0`` evaluates to 0 (with a
    RuntimeWarning), so ``p == 0`` spikes at EVERY step -- replicated
    explicitly here because ``lax.rem`` by zero is backend-defined.
    Negative periods: numpy's floored mod means ``delta % p == 0`` at every
    multiple of ``|p|`` (e.g. ``4 % -4 == 0``), so ``p < 0`` rasters like
    ``|p|`` from the clamped start; jnp's mod matches numpy's here.
    """
    p = jnp.asarray(firing_periods)  # see _loop: avoid int64 arange warnings
    start = jnp.clip(p, 0, n_steps - 1)
    t_idx = jnp.arange(n_steps, dtype=p.dtype)
    t_idx = t_idx.reshape((n_steps,) + (1,) * p.ndim)
    delta = t_idx - start[None]
    p_safe = jnp.where(p == 0, 1, p)
    hits = jnp.where(p[None] == 0, True, delta % p_safe[None] == 0)
    spikes = hits & (delta >= 0)
    return spikes.astype(jnp.float32)


@partial(jax.jit, static_argnames=("n_steps", "use_periods", "t_max"))
def encode_spikes(
    x: jax.Array,
    *,
    n_steps: int,
    use_periods: bool = False,
    t_max: float | None = None,
    tau: float = 20.0 * 1e-3,
    thr: float = 0.2,
    epsilon: float = 1e-7,
) -> jax.Array:
    """Full encoder: pixels ``(..., F)`` -> spike train ``(..., T, F)``.

    Batched equivalent of ``ToSpikes.__call__`` (datasets.py:93-97); the
    time axis is placed *after* the leading batch axes (the reference's
    per-sample output ``(T, F)`` corresponds to the unbatched case, which
    this matches after transposition -- see :class:`ToSpikes`).
    """
    t_max = float(n_steps) if t_max is None else t_max
    periods = pixels_to_firing_periods(
        x, t_max=t_max, tau=tau, thr=thr, epsilon=epsilon
    )
    gen = firing_periods_to_spikes if use_periods else firing_times_to_spikes
    spikes = gen(periods, n_steps)  # (T, ..., F)
    # Move time after the batch axes: (T, ..., F) -> (..., T, F)
    return jnp.moveaxis(spikes, 0, -2)


class ToSpikes:
    """API-parity wrapper mirroring the reference's ToSpikes transform
    (datasets.py:16-97), backed by the jittable jnp kernels above.

    ``__call__`` on a single flattened image of shape ``(F,)`` returns a
    ``(n_steps, F)`` float32 spike raster, exactly like the reference.
    """

    def __init__(
        self,
        n_steps: int,
        t_max: float | None = None,
        tau: float = 20.0 * 1e-3,
        thr: float = 0.2,
        use_periods: bool = False,
        epsilon: float = 1e-7,
    ):
        self.n_steps = n_steps
        self.t_max = n_steps if t_max is None else t_max
        self.tau = tau
        self.thr = thr
        self.epsilon = epsilon
        self.use_periods = use_periods

    def pixels_to_firing_periods(self, x) -> jax.Array:
        return pixels_to_firing_periods(
            jnp.asarray(x),
            t_max=self.t_max,
            tau=self.tau,
            thr=self.thr,
            epsilon=self.epsilon,
        )

    def firing_times_to_spikes(self, firing_times) -> jax.Array:
        return firing_times_to_spikes(jnp.asarray(firing_times), self.n_steps)

    def firing_periods_to_spikes(self, firing_periods) -> jax.Array:
        return firing_periods_to_spikes(jnp.asarray(firing_periods), self.n_steps)

    def firing_periods_to_spikes_loop(self, firing_periods) -> jax.Array:
        return firing_periods_to_spikes_loop(
            jnp.asarray(firing_periods), self.n_steps
        )

    def firing_periods_to_spikes_clip(self, firing_periods) -> jax.Array:
        return firing_periods_to_spikes_clip(
            jnp.asarray(firing_periods), self.n_steps
        )

    def __call__(self, x) -> jax.Array:
        x = jnp.asarray(x)
        if x.ndim > 1:
            x = x.reshape(-1)  # flatten, like the transform stack's torch.flatten
        spikes = encode_spikes(
            x,
            n_steps=self.n_steps,
            use_periods=self.use_periods,
            t_max=self.t_max,
            tau=self.tau,
            thr=self.thr,
            epsilon=self.epsilon,
        )
        return spikes  # (T, F) for a single sample
