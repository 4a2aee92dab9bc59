"""Izhikevich Pallas scans vs the XLA lax.scan path (interpret mode):
forward spikes and gradients for feedforward and recurrent layers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snnimageclassification_tpu.ops.cells import (
    IzhikevichConfig,
    izhikevich_init_state,
    izhikevich_step,
)
from snnimageclassification_tpu.ops.pallas_izh import izh_kernel_params, izh_scan
from snnimageclassification_tpu.ops.surrogate import SpikeFuncType


def _xla(currents, w_rec, cfg):
    def step(state, i_t):
        z, ns = izhikevich_step(cfg, {}, state, i_t, w_rec_eff=w_rec,
                                precomputed_input_current=True)
        return ns, z

    _, z = jax.lax.scan(step, izhikevich_init_state(cfg, currents.shape[1]),
                        currents)
    return z


def _data(T=8, B=4, H=12, seed=0, rec=True):
    rng = np.random.default_rng(seed)
    # dv/step ~ dt*cur/C = 1e-5*cur: currents ~3e6 reach v_peak (35 mV
    # from v_rest -60) within a few steps.
    currents = jnp.asarray(
        (3e6 + 1e6 * rng.standard_normal((T, B, H))).astype(np.float32)
    )
    w_rec = None
    if rec:
        w_rec = jnp.asarray(
            (5e5 * rng.standard_normal((H, H))).astype(np.float32)
            * (1 - np.eye(H, dtype=np.float32))
        )
    return currents, w_rec


@pytest.mark.parametrize("rec", [False, True])
def test_forward_matches_xla(rec):
    cfg = IzhikevichConfig(input_size=1, output_size=12,
                           use_recurrent_connection=rec)
    currents, w_rec = _data(rec=rec)
    z_ref = _xla(currents, w_rec, cfg)
    z_pal = izh_scan(currents, w_rec, izh_kernel_params(cfg), cfg.gamma,
                     SpikeFuncType.FastSigmoid, True)
    assert float(jnp.sum(z_ref)) > 0  # spikes actually happen
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref), atol=1e-6)


@pytest.mark.parametrize("rec", [False, True])
def test_gradients_match_xla(rec):
    cfg = IzhikevichConfig(input_size=1, output_size=12,
                           use_recurrent_connection=rec)
    currents, w_rec = _data(T=10, B=3, seed=1, rec=rec)
    wout = jnp.asarray(
        np.random.default_rng(2).standard_normal((12,)).astype(np.float32)
    )

    if rec:
        def loss_ref(c, w):
            return jnp.sum(_xla(c, w, cfg) * wout)

        def loss_pal(c, w):
            return jnp.sum(
                izh_scan(c, w, izh_kernel_params(cfg), cfg.gamma,
                         SpikeFuncType.FastSigmoid, True) * wout
            )

        g_ref = jax.grad(loss_ref, argnums=(0, 1))(currents, w_rec)
        g_pal = jax.grad(loss_pal, argnums=(0, 1))(currents, w_rec)
        assert float(jnp.linalg.norm(g_ref[1])) > 0
        for a, b in zip(g_pal, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
    else:
        g_ref = jax.grad(lambda c: jnp.sum(_xla(c, None, cfg) * wout))(currents)
        g_pal = jax.grad(
            lambda c: jnp.sum(
                izh_scan(c, None, izh_kernel_params(cfg), cfg.gamma,
                         SpikeFuncType.FastSigmoid, True) * wout
            )
        )(currents)
        assert float(jnp.linalg.norm(g_ref)) > 0
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)


def test_padding_path():
    cfg = IzhikevichConfig(input_size=1, output_size=100)
    currents, w_rec = _data(T=5, B=5, H=100, seed=3)
    z_ref = _xla(currents, w_rec, cfg)
    z_pal = izh_scan(currents, w_rec, izh_kernel_params(cfg), cfg.gamma,
                     SpikeFuncType.FastSigmoid, True)
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref), atol=1e-6)
