"""Surrogate-gradient spike functions as :func:`jax.custom_vjp` primitives.

The forward pass of a spiking neuron emits a Heaviside step of the membrane
potential against a threshold; the backward pass substitutes a smooth
surrogate so BPTT can propagate error through the discrete spike.

Parity notes (reference: ``src/modules/spike_funcs.py``):

* ``SpikeFunction.forward`` (spike_funcs.py:13-29): ``out = 1.0`` where
  ``v >= threshold`` else ``0.0``.
* ``HeavisideSigmoidApprox.backward`` (spike_funcs.py:48-62): the
  fast-sigmoid surrogate of Zenke & Ganguli (2018),
  ``g / (gamma * |v - threshold| + 1)**2``.
* ``HeavisidePhiApprox.backward`` (spike_funcs.py:65-79): the triangular
  (Bellec-style) surrogate
  ``g * gamma/(threshold+eps) * max(0, 1 - |v-threshold|/(threshold+eps))``
  with ``eps = 1e-5``.
* Both reference backwards return ``None`` for the threshold and gamma
  arguments (spike_funcs.py:62,79).  We therefore return **zero**
  cotangents for them.  This is a load-bearing quirk: ALIF's dynamic
  threshold ``A = theta + beta * a`` enters the spike function only as the
  threshold argument, so a learnable ``beta`` receives no gradient in the
  reference ("learn_beta" is dead -- see README.md:18 listing beta training
  as *future* work).  We replicate that faithfully.

All functions are jittable, vmappable and shape-polymorphic; they run on
the TPU VPU as pure elementwise ops and fuse into the surrounding scan body
under XLA.
"""
from __future__ import annotations

import enum
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "SpikeFuncType",
    "surrogate_grad",
    "surrogate_grad_from_delta",
    "heaviside_sigmoid",
    "heaviside_phi",
    "PHI_EPSILON",
    "SPIKE_FN_REGISTRY",
    "resolve_spike_fn",
]

PHI_EPSILON = 1e-5  # matches HeavisidePhiApprox.epsilon (spike_funcs.py:66)


class SpikeFuncType(enum.Enum):
    """Mirror of the reference's SpikeFuncType enum (spike_funcs.py:7-9)."""

    FastSigmoid = enum.auto()
    Phi = enum.auto()


def _heaviside(v: jax.Array, threshold) -> jax.Array:
    return (v >= threshold).astype(v.dtype)


def surrogate_grad(spike_func: "SpikeFuncType", v, threshold, gamma):
    """Closed-form surrogate derivative d spike / d v.

    The single source of truth for both the custom_vjp backwards below and
    the hand-written Pallas backward kernels (spike_funcs.py:61, 76-78).
    """
    if spike_func == SpikeFuncType.FastSigmoid:
        denom = gamma * jnp.abs(v - threshold) + 1.0
        return 1.0 / (denom * denom)
    if spike_func == SpikeFuncType.Phi:
        scale = gamma / (threshold + PHI_EPSILON)
        return scale * jnp.maximum(
            jnp.zeros_like(v),
            1.0 - jnp.abs((v - threshold) / (threshold + PHI_EPSILON)),
        )
    raise ValueError(f"No closed-form surrogate gradient for {spike_func}")


def surrogate_grad_from_delta(spike_func: "SpikeFuncType", delta, threshold,
                              gamma):
    """:func:`surrogate_grad` parameterized by ``delta = v - threshold``.

    Both closed forms depend on v only through the difference, so kernels
    that store the delta residual (sign-exact for the spike recompute
    ``z = (delta >= 0)`` even in bf16) evaluate the identical expression:
    FastSigmoid ignores ``threshold``; Phi still needs it for its scale
    (for ALIF pass the *dynamic* threshold ``thr + beta * a``).
    """
    if spike_func == SpikeFuncType.FastSigmoid:
        denom = gamma * jnp.abs(delta) + 1.0
        return 1.0 / (denom * denom)
    if spike_func == SpikeFuncType.Phi:
        scale = gamma / (threshold + PHI_EPSILON)
        return scale * jnp.maximum(
            jnp.zeros_like(delta),
            1.0 - jnp.abs(delta / (threshold + PHI_EPSILON)),
        )
    raise ValueError(f"No closed-form surrogate gradient for {spike_func}")


# --------------------------------------------------------------------------
# Fast-sigmoid surrogate (Zenke & Ganguli 2018)
# --------------------------------------------------------------------------
@jax.custom_vjp
def heaviside_sigmoid(v: jax.Array, threshold, gamma) -> jax.Array:
    """Heaviside spike with fast-sigmoid surrogate gradient.

    ``gamma`` plays the role of the reference's ``scale`` in the
    fast-sigmoid denominator (spike_funcs.py:59-61).
    """
    return _heaviside(v, threshold)


def _hs_fwd(v, threshold, gamma):
    return _heaviside(v, threshold), (v, threshold, gamma)


def _hs_bwd(res, g):
    v, threshold, gamma = res
    dv = g * surrogate_grad(SpikeFuncType.FastSigmoid, v, threshold, gamma)
    # Zero cotangents for threshold/gamma: the reference returns None for
    # them (spike_funcs.py:62), which is what keeps learn_beta frozen.
    return dv, jnp.zeros_like(jnp.asarray(threshold, dtype=dv.dtype)), jnp.zeros_like(
        jnp.asarray(gamma, dtype=dv.dtype)
    )


heaviside_sigmoid.defvjp(_hs_fwd, _hs_bwd)


# --------------------------------------------------------------------------
# Triangular / "Phi" surrogate (Bellec-style)
# --------------------------------------------------------------------------
@jax.custom_vjp
def heaviside_phi(v: jax.Array, threshold, gamma) -> jax.Array:
    """Heaviside spike with triangular surrogate gradient
    (spike_funcs.py:69-79)."""
    return _heaviside(v, threshold)


def _hp_fwd(v, threshold, gamma):
    return _heaviside(v, threshold), (v, threshold, gamma)


def _hp_bwd(res, g):
    v, threshold, gamma = res
    dv = g * surrogate_grad(SpikeFuncType.Phi, v, threshold, gamma)
    return dv, jnp.zeros_like(jnp.asarray(threshold, dtype=dv.dtype)), jnp.zeros_like(
        jnp.asarray(gamma, dtype=dv.dtype)
    )


heaviside_phi.defvjp(_hp_fwd, _hp_bwd)


SPIKE_FN_REGISTRY: dict[SpikeFuncType, Callable] = {
    SpikeFuncType.FastSigmoid: heaviside_sigmoid,
    SpikeFuncType.Phi: heaviside_phi,
}


def resolve_spike_fn(spike_func) -> Callable:
    """Accept an enum member, a callable, or a string name.

    Mirrors the reference's enum-or-class acceptance (snn.py:77-79).
    """
    if isinstance(spike_func, SpikeFuncType):
        return SPIKE_FN_REGISTRY[spike_func]
    if isinstance(spike_func, str):
        return SPIKE_FN_REGISTRY[SpikeFuncType[spike_func]]
    if callable(spike_func):
        return spike_func
    raise TypeError(f"Cannot resolve spike function from {spike_func!r}")
