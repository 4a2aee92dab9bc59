"""Recurrent Pallas LIF/ALIF scans vs the XLA lax.scan path (interpret
mode on CPU): forward spikes and gradients w.r.t. both input currents and
the recurrent weight matrix."""
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
from snnimageclassification_tpu.ops.pallas_rec import rec_alif_scan, rec_lif_scan
from snnimageclassification_tpu.ops.surrogate import SpikeFuncType


def _xla_rec_alif(currents, w_rec, cfg: ALIFConfig):
    def step(state, i_t):
        z, ns = alif_step(cfg, {}, state, i_t, w_rec_eff=w_rec,
                          precomputed_input_current=True)
        return ns, z

    _, z = jax.lax.scan(step, alif_init_state(cfg, currents.shape[1]), currents)
    return z


def _xla_rec_lif(currents, w_rec, cfg: LIFConfig):
    def step(state, i_t):
        z, ns = lif_step(cfg, {}, state, i_t, w_rec_eff=w_rec,
                         precomputed_input_current=True)
        return ns, z

    _, z = jax.lax.scan(step, lif_init_state(cfg, currents.shape[1]), currents)
    return z


def _data(T=8, B=4, H=12, scale=0.1, seed=0):
    rng = np.random.default_rng(seed)
    currents = jnp.asarray(scale * rng.standard_normal((T, B, H)).astype(np.float32))
    w_rec = jnp.asarray(
        (scale * rng.standard_normal((H, H))).astype(np.float32)
        * (1 - np.eye(H, dtype=np.float32))
    )
    return currents, w_rec


@pytest.mark.parametrize("spike_func", [SpikeFuncType.FastSigmoid, SpikeFuncType.Phi])
def test_rec_alif_forward(spike_func):
    cfg = ALIFConfig(input_size=1, output_size=12, spike_func=spike_func)
    currents, w_rec = _data()
    z_ref = _xla_rec_alif(currents, w_rec, cfg)
    z_pal = rec_alif_scan(currents, w_rec, cfg.beta, cfg.alpha, cfg.rho,
                          cfg.threshold, cfg.gamma, spike_func, True)
    assert float(jnp.sum(z_ref)) > 0
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref), atol=1e-6)


def test_rec_lif_forward():
    cfg = LIFConfig(input_size=1, output_size=12)
    currents, w_rec = _data(scale=1.2, seed=1)
    z_ref = _xla_rec_lif(currents, w_rec, cfg)
    z_pal = rec_lif_scan(currents, w_rec, cfg.alpha, cfg.threshold, cfg.gamma,
                         SpikeFuncType.FastSigmoid, True)
    assert float(jnp.sum(z_ref)) > 0
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref), atol=1e-6)


@pytest.mark.parametrize("spike_func", [SpikeFuncType.FastSigmoid, SpikeFuncType.Phi])
def test_rec_alif_gradients(spike_func):
    cfg = ALIFConfig(input_size=1, output_size=12, spike_func=spike_func)
    currents, w_rec = _data(T=10, B=3, seed=2)
    wout = jnp.asarray(
        np.random.default_rng(3).standard_normal((12,)).astype(np.float32)
    )

    def loss_ref(c, w):
        return jnp.sum(_xla_rec_alif(c, w, cfg) * wout)

    def loss_pal(c, w):
        z = rec_alif_scan(c, w, cfg.beta, cfg.alpha, cfg.rho, cfg.threshold,
                          cfg.gamma, spike_func, True)
        return jnp.sum(z * wout)

    gc_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(currents, w_rec)
    gc_pal, gw_pal = jax.grad(loss_pal, argnums=(0, 1))(currents, w_rec)
    assert float(jnp.linalg.norm(gc_ref)) > 0
    assert float(jnp.linalg.norm(gw_ref)) > 0
    np.testing.assert_allclose(np.asarray(gc_pal), np.asarray(gc_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_pal), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-6)


def test_rec_lif_gradients():
    cfg = LIFConfig(input_size=1, output_size=12)
    currents, w_rec = _data(T=10, B=3, scale=1.2, seed=4)

    gc_ref, gw_ref = jax.grad(
        lambda c, w: jnp.sum(_xla_rec_lif(c, w, cfg)), argnums=(0, 1)
    )(currents, w_rec)
    gc_pal, gw_pal = jax.grad(
        lambda c, w: jnp.sum(
            rec_lif_scan(c, w, cfg.alpha, cfg.threshold, cfg.gamma,
                         SpikeFuncType.FastSigmoid, True)
        ),
        argnums=(0, 1),
    )(currents, w_rec)
    assert float(jnp.linalg.norm(gw_ref)) > 0
    np.testing.assert_allclose(np.asarray(gc_pal), np.asarray(gc_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_pal), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-6)


def test_rec_alif_bf16_traces():
    """A bf16 W_rec (SNNConfig.matmul_dtype mode) stores the z/delta
    traces in bf16: spikes must stay *identical* to the f32 path run with
    the same (bf16-representable) weights, and gradients must agree to
    bf16 surrogate precision."""
    cfg = ALIFConfig(input_size=1, output_size=12)
    currents, w_rec = _data(T=8, B=4)
    w16 = w_rec.astype(jnp.bfloat16)
    w32 = w16.astype(jnp.float32)  # identical values, f32 container

    z32 = rec_alif_scan(currents, w32, cfg.beta, cfg.alpha, cfg.rho,
                        cfg.threshold, cfg.gamma, SpikeFuncType.FastSigmoid,
                        True)
    z16 = rec_alif_scan(currents, w16, cfg.beta, cfg.alpha, cfg.rho,
                        cfg.threshold, cfg.gamma, SpikeFuncType.FastSigmoid,
                        True)
    assert z16.dtype == jnp.bfloat16
    assert float(jnp.sum(z32)) > 0
    np.testing.assert_array_equal(
        np.asarray(z16.astype(jnp.float32)), np.asarray(z32)
    )

    def loss(c, w):
        z = rec_alif_scan(c, w, cfg.beta, cfg.alpha, cfg.rho, cfg.threshold,
                          cfg.gamma, SpikeFuncType.FastSigmoid, True)
        return jnp.sum(z.astype(jnp.float32))

    gc32, gw32 = jax.grad(loss, argnums=(0, 1))(currents, w32)
    gc16, gw16 = jax.grad(loss, argnums=(0, 1))(currents, w16)
    assert gc16.dtype == jnp.float32  # currents cotangent stays f32
    # bf16 delta precision (~0.4%) compounds through the recurrence;
    # assert relative L2 agreement rather than elementwise.
    for g16, g32 in ((gc16, gc32), (gw16.astype(jnp.float32), gw32)):
        rel = float(
            jnp.linalg.norm(jnp.ravel(g16) - jnp.ravel(g32))
            / jnp.linalg.norm(jnp.ravel(g32))
        )
        assert rel < 0.05, rel


def test_rec_alif_padding_path():
    """H=100 (not lane-aligned), B=5 (not sublane-aligned): padded lanes
    have zero weights/currents and must not disturb real lanes."""
    cfg = ALIFConfig(input_size=1, output_size=100)
    currents, w_rec = _data(T=6, B=5, H=100, seed=5)
    z_ref = _xla_rec_alif(currents, w_rec, cfg)
    z_pal = rec_alif_scan(currents, w_rec, cfg.beta, cfg.alpha, cfg.rho,
                          cfg.threshold, cfg.gamma, SpikeFuncType.FastSigmoid, True)
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref), atol=1e-6)

    gw_ref = jax.grad(lambda w: jnp.sum(_xla_rec_alif(currents, w, cfg)))(w_rec)
    gw_pal = jax.grad(
        lambda w: jnp.sum(
            rec_alif_scan(currents, w, cfg.beta, cfg.alpha, cfg.rho,
                          cfg.threshold, cfg.gamma, SpikeFuncType.FastSigmoid, True)
        )
    )(w_rec)
    np.testing.assert_allclose(np.asarray(gw_pal), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-6)
