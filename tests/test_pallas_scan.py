"""Pallas fused LIF/ALIF scan kernels vs the XLA lax.scan reference path
(interpret mode on CPU; the same kernels compile natively on TPU).

Checks forward spike traces and BPTT input-current gradients.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snnimageclassification_tpu.ops.cells import (
    ALIFConfig,
    LIFConfig,
    alif_init_state,
    alif_step,
    lif_init_state,
    lif_step,
)
from snnimageclassification_tpu.ops.pallas_scan import alif_scan, lif_scan
from snnimageclassification_tpu.ops.surrogate import SpikeFuncType


def _xla_alif_scan(currents, cfg: ALIFConfig):
    def step(state, i_t):
        z, ns = alif_step(cfg, {}, state, i_t, precomputed_input_current=True)
        return ns, z

    state0 = alif_init_state(cfg, currents.shape[1])
    _, z = jax.lax.scan(step, state0, currents)
    return z


def _xla_lif_scan(currents, cfg: LIFConfig):
    def step(state, i_t):
        z, ns = lif_step(cfg, {}, state, i_t, precomputed_input_current=True)
        return ns, z

    state0 = lif_init_state(cfg, currents.shape[1])
    _, z = jax.lax.scan(step, state0, currents)
    return z


def _currents(T=7, B=4, H=12, scale=0.1, seed=0):
    # Scale near the ALIF threshold (0.03) so spikes actually happen.
    rng = np.random.default_rng(seed)
    return jnp.asarray(scale * rng.standard_normal((T, B, H)).astype(np.float32))


@pytest.mark.parametrize("spike_func", [SpikeFuncType.FastSigmoid, SpikeFuncType.Phi])
def test_alif_forward_matches_xla(spike_func):
    cfg = ALIFConfig(input_size=1, output_size=12, use_recurrent_connection=False,
                     spike_func=spike_func)
    currents = _currents()
    z_ref = _xla_alif_scan(currents, cfg)
    z_pal = alif_scan(
        currents, cfg.beta, cfg.alpha, cfg.rho, cfg.threshold, cfg.gamma,
        spike_func, True,
    )
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref), atol=1e-6)
    assert float(jnp.sum(z_ref)) > 0  # the test actually exercises spikes


def test_lif_forward_matches_xla():
    cfg = LIFConfig(input_size=1, output_size=12, use_recurrent_connection=False)
    currents = _currents(scale=1.5)
    z_ref = _xla_lif_scan(currents, cfg)
    z_pal = lif_scan(
        currents, cfg.alpha, cfg.threshold, cfg.gamma,
        SpikeFuncType.FastSigmoid, True,
    )
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref), atol=1e-6)
    assert float(jnp.sum(z_ref)) > 0


@pytest.mark.parametrize("spike_func", [SpikeFuncType.FastSigmoid, SpikeFuncType.Phi])
def test_alif_gradient_matches_xla(spike_func):
    cfg = ALIFConfig(input_size=1, output_size=12, use_recurrent_connection=False,
                     spike_func=spike_func)
    currents = _currents(T=9, B=3, H=12, seed=1)
    w = jnp.asarray(np.random.default_rng(2).standard_normal((12,)).astype(np.float32))

    def loss_ref(c):
        return jnp.sum(_xla_alif_scan(c, cfg) * w)

    def loss_pal(c):
        z = alif_scan(c, cfg.beta, cfg.alpha, cfg.rho, cfg.threshold,
                      cfg.gamma, spike_func, True)
        return jnp.sum(z * w)

    g_ref = jax.grad(loss_ref)(currents)
    g_pal = jax.grad(loss_pal)(currents)
    assert float(jnp.linalg.norm(g_ref)) > 0
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-6
    )


def test_lif_gradient_matches_xla():
    cfg = LIFConfig(input_size=1, output_size=12, use_recurrent_connection=False)
    currents = _currents(T=9, B=3, H=12, scale=1.5, seed=3)
    w = jnp.asarray(np.random.default_rng(4).standard_normal((12,)).astype(np.float32))

    g_ref = jax.grad(lambda c: jnp.sum(_xla_lif_scan(c, cfg) * w))(currents)
    g_pal = jax.grad(
        lambda c: jnp.sum(
            lif_scan(c, cfg.alpha, cfg.threshold, cfg.gamma,
                     SpikeFuncType.FastSigmoid, True) * w
        )
    )(currents)
    assert float(jnp.linalg.norm(g_ref)) > 0
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-6
    )


def test_padding_path():
    """Shapes not divisible by the tile sizes go through _pad + slice."""
    cfg = ALIFConfig(input_size=1, output_size=100, use_recurrent_connection=False)
    currents = _currents(T=5, B=3, H=100, seed=5)
    z_ref = _xla_alif_scan(currents, cfg)
    z_pal = alif_scan(
        currents, cfg.beta, cfg.alpha, cfg.rho, cfg.threshold, cfg.gamma,
        SpikeFuncType.FastSigmoid, True,
    )
    assert z_pal.shape == (5, 3, 100)
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref), atol=1e-6)


def test_gradient_with_padding():
    cfg = LIFConfig(input_size=1, output_size=20, use_recurrent_connection=False)
    currents = _currents(T=4, B=5, H=20, scale=1.5, seed=6)
    g_ref = jax.grad(lambda c: jnp.sum(_xla_lif_scan(c, cfg)))(currents)
    g_pal = jax.grad(
        lambda c: jnp.sum(
            lif_scan(c, cfg.alpha, cfg.threshold, cfg.gamma,
                     SpikeFuncType.FastSigmoid, True)
        )
    )(currents)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-6
    )
