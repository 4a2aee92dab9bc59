"""Neuron-cell step tests: each step checked against an independent numpy
re-derivation of the reference dynamics (spiking_layers.py:156-171,
:229-243, :337-353, :402-408).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from snnimageclassification_tpu.ops.cells import (
    ALIFConfig,
    ALIFState,
    IzhikevichConfig,
    IzhikevichState,
    LIFConfig,
    LIFState,
    ReadoutConfig,
    ReadoutState,
    alif_init_params,
    alif_init_state,
    alif_step,
    izhikevich_init_state,
    izhikevich_step,
    lif_init_params,
    lif_init_state,
    lif_step,
    masked_recurrent,
    readout_init_params,
    readout_init_state,
    readout_step,
)

RNG = np.random.default_rng(42)


def _np_heaviside(v, thr):
    return (v >= thr).astype(np.float32)


class TestLIF:
    def test_default_constants(self):
        cfg = LIFConfig(input_size=4, output_size=3)
        assert math.isclose(cfg.alpha, math.exp(-1e-3 / (10 * 1e-3)))
        assert cfg.threshold == 1.0
        assert cfg.gamma == 1.0  # quirk Q1: effective default, not 100.0

    def test_step_matches_numpy(self):
        cfg = LIFConfig(input_size=5, output_size=4, use_recurrent_connection=True)
        params = lif_init_params(cfg, jax.random.PRNGKey(0))
        w_rec_eff = masked_recurrent(cfg, params)
        x = jnp.asarray(RNG.normal(size=(2, 5)).astype(np.float32))
        v0 = jnp.asarray(RNG.normal(size=(2, 4)).astype(np.float32))
        z0 = jnp.asarray((RNG.random((2, 4)) > 0.5).astype(np.float32))
        z, st = lif_step(cfg, params, LIFState(v=v0, z=z0), x, w_rec_eff=w_rec_eff)

        w_in = np.asarray(params["w_in"])
        w_rec = np.asarray(params["w_rec"]) * (1 - np.eye(4, dtype=np.float32))
        cur = np.asarray(x) @ w_in + np.asarray(z0) @ w_rec
        v_exp = (cfg.alpha * np.asarray(v0) + cur) * (1.0 - np.asarray(z0))
        z_exp = _np_heaviside(v_exp, cfg.threshold)
        np.testing.assert_allclose(np.asarray(st.v), v_exp, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(z), z_exp)
        np.testing.assert_allclose(np.asarray(st.z), z_exp)

    def test_feedforward_no_recurrence(self):
        cfg = LIFConfig(input_size=5, output_size=4, use_recurrent_connection=False)
        params = lif_init_params(cfg, jax.random.PRNGKey(0))
        assert "w_rec" not in params
        x = jnp.ones((2, 5))
        z, st = lif_step(cfg, params, lif_init_state(cfg, 2), x)
        v_exp = np.ones((2, 5), np.float32) @ np.asarray(params["w_in"])
        np.testing.assert_allclose(np.asarray(st.v), v_exp, rtol=1e-5)

    def test_reset_is_detached(self):
        """The multiplicative reset uses stop_grad(z): gradient through v'
        w.r.t. v flows only via the alpha*v term scaled by (1 - z)."""
        cfg = LIFConfig(input_size=1, output_size=1, use_recurrent_connection=False)
        params = {"w_in": jnp.ones((1, 1))}

        def next_v(v_prev):
            state = LIFState(v=v_prev, z=jnp.ones_like(v_prev))  # just spiked
            _, st = lif_step(cfg, params, state, jnp.zeros((1, 1)))
            return jnp.sum(st.v)

        g = jax.grad(next_v)(jnp.ones((1, 1)) * 2.0)
        # (alpha*v + 0) * (1 - 1) = 0, and z is detached -> dv'/dv = 0
        np.testing.assert_allclose(np.asarray(g), 0.0)


class TestALIF:
    def test_default_constants(self):
        cfg = ALIFConfig(input_size=4, output_size=3)
        assert math.isclose(cfg.alpha, math.exp(-1e-3 / (20 * 1e-3)))
        assert math.isclose(cfg.rho, math.exp(-1e-3 / (200 * 1e-3)))
        assert cfg.threshold == 0.03
        assert cfg.beta == 1.6
        assert cfg.gamma == 0.3  # quirk Q1 effective default

    def test_step_matches_numpy(self):
        cfg = ALIFConfig(input_size=6, output_size=3, use_recurrent_connection=True)
        params = alif_init_params(cfg, jax.random.PRNGKey(3))
        w_rec_eff = masked_recurrent(cfg, params)
        x = jnp.asarray(RNG.normal(size=(2, 6)).astype(np.float32))
        v0 = jnp.asarray(RNG.normal(scale=0.03, size=(2, 3)).astype(np.float32))
        a0 = jnp.asarray(RNG.random((2, 3)).astype(np.float32))
        z0 = jnp.asarray((RNG.random((2, 3)) > 0.5).astype(np.float32))
        z, st = alif_step(
            cfg, params, ALIFState(v=v0, a=a0, z=z0), x, w_rec_eff=w_rec_eff
        )

        w_in = np.asarray(params["w_in"])
        w_rec = np.asarray(params["w_rec"]) * (1 - np.eye(3, dtype=np.float32))
        cur = np.asarray(x) @ w_in + np.asarray(z0) @ w_rec
        v_exp = (cfg.alpha * np.asarray(v0) + cur) * (1.0 - np.asarray(z0))
        a_exp = cfg.rho * np.asarray(a0) + np.asarray(z0)
        thr_dyn = cfg.threshold + cfg.beta * a_exp
        z_exp = _np_heaviside(v_exp, thr_dyn)
        np.testing.assert_allclose(np.asarray(st.v), v_exp, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(st.a), a_exp, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(z), z_exp)

    def test_learn_beta_param_init_and_dead_grad(self):
        """Quirk Q3: learnable beta starts ~N(0, threshold^2) and receives
        exactly zero gradient through the dynamic threshold."""
        cfg = ALIFConfig(
            input_size=4, output_size=8, learn_beta=True,
            use_recurrent_connection=False,
        )
        params = alif_init_params(cfg, jax.random.PRNGKey(0))
        assert params["beta"].shape == ()
        assert abs(float(params["beta"])) < 5 * cfg.threshold  # near zero

        def loss(p):
            state = alif_init_state(cfg, 2)
            state = ALIFState(v=state.v, a=jnp.ones_like(state.a), z=state.z)
            z, _ = alif_step(cfg, p, state, jnp.ones((2, 4)))
            return jnp.sum(z)

        g = jax.grad(loss)(params)
        assert float(g["beta"]) == 0.0
        assert float(jnp.linalg.norm(g["w_in"])) > 0.0


class TestIzhikevich:
    def test_initial_state_at_v_rest(self):
        cfg = IzhikevichConfig(input_size=3, output_size=2)
        st = izhikevich_init_state(cfg, 4)
        np.testing.assert_allclose(np.asarray(st.v), cfg.v_rest)
        np.testing.assert_allclose(np.asarray(st.u), 0.0)

    def test_step_matches_numpy(self):
        cfg = IzhikevichConfig(
            input_size=3, output_size=2, use_recurrent_connection=False
        )
        params = {"w_in": jnp.asarray(RNG.normal(size=(3, 2)).astype(np.float32))}
        v0 = jnp.asarray(np.full((1, 2), -55.0, np.float32))
        u0 = jnp.asarray(np.full((1, 2), 5.0, np.float32))
        z0 = jnp.asarray(np.array([[1.0, 0.0]], np.float32))
        x = jnp.asarray(RNG.normal(size=(1, 3)).astype(np.float32))
        z, st = izhikevich_step(cfg, params, IzhikevichState(v=v0, u=u0, z=z0), x)

        cur = np.asarray(x) @ np.asarray(params["w_in"])
        is_reset = np.asarray(z0)
        dvdt = cfg.k * (np.asarray(v0) - cfg.v_rest) * (np.asarray(v0) - cfg.v_th) - np.asarray(u0) + cur
        v_exp = (np.asarray(v0) + cfg.dt * dvdt / cfg.C) * (1 - is_reset) + cfg.c * is_reset
        dudt = cfg.a * (cfg.b * (np.asarray(v0) - cfg.v_rest) - np.asarray(u0))
        u_exp = np.asarray(u0) + cfg.dt * dudt + cfg.d * is_reset
        z_exp = _np_heaviside(v_exp, cfg.v_peak)
        np.testing.assert_allclose(np.asarray(st.v), v_exp, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(st.u), u_exp, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(z), z_exp)


class TestReadout:
    def test_step_matches_numpy(self):
        cfg = ReadoutConfig(input_size=4, output_size=3)
        params = readout_init_params(cfg, jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(params["b"]), 0.0)
        x = jnp.asarray(RNG.normal(size=(2, 4)).astype(np.float32))
        v0 = jnp.asarray(RNG.normal(size=(2, 3)).astype(np.float32))
        out, st = readout_step(cfg, params, ReadoutState(v=v0), x)
        kappa = math.exp(-cfg.dt / (10 * cfg.dt))
        v_exp = kappa * np.asarray(v0) + np.asarray(x) @ np.asarray(params["w_in"])
        np.testing.assert_allclose(np.asarray(out), v_exp, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(st.v), v_exp, rtol=1e-5)


class TestMaskedRecurrent:
    def test_eye_mask_zeroes_diagonal(self):
        cfg = LIFConfig(input_size=2, output_size=4)
        params = lif_init_params(cfg, jax.random.PRNGKey(0))
        w = masked_recurrent(cfg, params)
        np.testing.assert_allclose(np.asarray(jnp.diag(w)), 0.0)
        off = np.asarray(w) + np.eye(4) * np.asarray(params["w_rec"])
        np.testing.assert_allclose(off, np.asarray(params["w_rec"]), rtol=1e-6)

    def test_no_mask(self):
        cfg = LIFConfig(input_size=2, output_size=4, use_rec_eye_mask=False)
        params = lif_init_params(cfg, jax.random.PRNGKey(0))
        w = masked_recurrent(cfg, params)
        np.testing.assert_allclose(np.asarray(w), np.asarray(params["w_rec"]))

    def test_none_without_recurrence(self):
        cfg = LIFConfig(input_size=2, output_size=4, use_recurrent_connection=False)
        assert masked_recurrent(cfg, {"w_in": jnp.zeros((2, 4))}) is None
