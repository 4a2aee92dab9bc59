"""Surrogate spike functions: forward Heaviside + closed-form VJP checks.

The reference has no tests for spike_funcs.py; these check our custom_vjp
against the closed-form derivatives in spike_funcs.py:61 and :76-78.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snnimageclassification_tpu.ops.surrogate import (
    PHI_EPSILON,
    SpikeFuncType,
    heaviside_phi,
    heaviside_sigmoid,
    resolve_spike_fn,
)


@pytest.mark.parametrize("fn", [heaviside_sigmoid, heaviside_phi])
def test_forward_is_heaviside(fn):
    v = jnp.array([-1.0, 0.0, 0.999, 1.0, 1.5])
    out = fn(v, 1.0, 0.3)
    np.testing.assert_array_equal(np.asarray(out), [0.0, 0.0, 0.0, 1.0, 1.0])


def test_fast_sigmoid_vjp_closed_form():
    v = jnp.linspace(-2.0, 4.0, 101)
    threshold, gamma = 1.0, 100.0
    grad = jax.grad(lambda x: jnp.sum(heaviside_sigmoid(x, threshold, gamma)))(v)
    expected = 1.0 / (gamma * jnp.abs(v - threshold) + 1.0) ** 2
    np.testing.assert_allclose(np.asarray(grad), np.asarray(expected), rtol=1e-6)


def test_phi_vjp_closed_form():
    v = jnp.linspace(-2.0, 4.0, 101)
    threshold, gamma = 1.0, 0.3
    grad = jax.grad(lambda x: jnp.sum(heaviside_phi(x, threshold, gamma)))(v)
    expected = (gamma / (threshold + PHI_EPSILON)) * jnp.maximum(
        0.0, 1.0 - jnp.abs((v - threshold) / (threshold + PHI_EPSILON))
    )
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(expected), rtol=1e-5, atol=1e-8
    )


@pytest.mark.parametrize("fn", [heaviside_sigmoid, heaviside_phi])
def test_threshold_and_gamma_get_zero_cotangent(fn):
    """The reference returns None grads for threshold/gamma
    (spike_funcs.py:62,79); ours must be exactly zero."""
    v = jnp.linspace(-2.0, 4.0, 11)
    g_thr = jax.grad(lambda t: jnp.sum(fn(v, t, 0.3)))(1.0)
    g_gam = jax.grad(lambda g: jnp.sum(fn(v, 1.0, g)))(0.3)
    assert float(g_thr) == 0.0
    assert float(g_gam) == 0.0


def test_vjp_scales_with_upstream_gradient():
    v = jnp.array([1.2, 0.5])
    _, vjp = jax.vjp(lambda x: heaviside_sigmoid(x, 1.0, 2.0), v)
    (dv,) = vjp(jnp.array([3.0, -2.0]))
    expected = jnp.array([3.0, -2.0]) / (2.0 * jnp.abs(v - 1.0) + 1.0) ** 2
    np.testing.assert_allclose(np.asarray(dv), np.asarray(expected), rtol=1e-6)


def test_registry_resolution():
    assert resolve_spike_fn(SpikeFuncType.FastSigmoid) is heaviside_sigmoid
    assert resolve_spike_fn(SpikeFuncType.Phi) is heaviside_phi
    assert resolve_spike_fn("Phi") is heaviside_phi
    assert resolve_spike_fn(heaviside_sigmoid) is heaviside_sigmoid
    with pytest.raises(TypeError):
        resolve_spike_fn(3)


def test_jit_and_vmap_compatible():
    fn = jax.jit(jax.vmap(lambda v: heaviside_sigmoid(v, 1.0, 0.3)))
    out = fn(jnp.ones((4, 8)) * 2.0)
    assert out.shape == (4, 8)
    np.testing.assert_array_equal(np.asarray(out), np.ones((4, 8)))
