"""Property-based tests (hypothesis): the jittable jnp implementations must
match independent numpy oracles for arbitrary shapes/values, not just the
hand-picked cases ported from the reference's tests."""
import math

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from snnimageclassification_tpu.ops.cells import (
    ALIFConfig,
    ALIFState,
    alif_step,
)
from snnimageclassification_tpu.ops.encoding import (
    firing_periods_to_spikes,
    firing_times_to_spikes,
    pixels_to_firing_periods,
)
from snnimageclassification_tpu.ops.temporal import batchwise_temporal_filter

COMMON = dict(max_examples=25, deadline=None)


@settings(**COMMON)
@given(
    pix=st.lists(st.floats(0.0, 1.0, width=32), min_size=1, max_size=64),
    tau=st.floats(0.5, 50.0),
    thr=st.floats(0.05, 0.9),
    n_steps=st.integers(2, 64),
)
def test_latency_matches_numpy_oracle(pix, tau, thr, n_steps):
    """Reference formula (datasets.py:42-54) re-derived in numpy."""
    x = np.asarray(pix, dtype=np.float32)
    got = np.asarray(
        pixels_to_firing_periods(
            jnp.asarray(x), t_max=float(n_steps), tau=tau, thr=thr
        )
    )
    xc = np.clip(x, thr + 1e-7, 1e9)
    expected = (tau * np.log(xc / (xc - thr))).astype(np.float32)
    expected[x < thr] = n_steps
    np.testing.assert_array_equal(got, expected.astype(np.int32))


@settings(**COMMON)
@given(
    times=st.lists(st.integers(0, 100), min_size=1, max_size=48),
    n_steps=st.integers(1, 40),
)
def test_ttfs_raster_matches_numpy_oracle(times, n_steps):
    ft = np.asarray(times, dtype=np.int32)
    got = np.asarray(firing_times_to_spikes(jnp.asarray(ft), n_steps))
    expected = np.zeros((n_steps, len(ft)), np.float32)
    for p, t in enumerate(ft):
        if t < n_steps:
            expected[t, p] = 1.0
    np.testing.assert_array_equal(got, expected)


@settings(**COMMON)
@given(
    periods=st.lists(st.integers(-3, 120), min_size=1, max_size=48),
    n_steps=st.integers(2, 40),
)
def test_periodic_raster_matches_numpy_oracle(periods, n_steps):
    """Clamp to [1, n_steps-1], spike where (t-p) % p == 0 and t >= p
    (datasets.py:72-79)."""
    p_arr = np.asarray(periods, dtype=np.int32)
    got = np.asarray(firing_periods_to_spikes(jnp.asarray(p_arr), n_steps))
    p = np.clip(p_arr, 1, n_steps - 1)
    expected = np.zeros((n_steps, len(p)), np.float32)
    for i, pi in enumerate(p):
        for t in range(n_steps):
            if t - pi >= 0 and (t - pi) % pi == 0:
                expected[t, i] = 1.0
    np.testing.assert_array_equal(got, expected)


@settings(**COMMON)
@given(
    b=st.integers(1, 4),
    t=st.integers(1, 8),
    f=st.integers(1, 6),
    decay=st.floats(0.1, 1.0),
    seed=st.integers(0, 2**31 - 1),
)
def test_temporal_filter_matches_numpy_oracle(b, t, f, decay, seed):
    x = np.random.default_rng(seed).standard_normal((b, t, f)).astype(np.float32)
    got = np.asarray(batchwise_temporal_filter(jnp.asarray(x), decay))
    w = decay ** np.arange(t - 1, -1, -1, dtype=np.float32)
    expected = (x * w[None, :, None]).sum(axis=1)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@settings(**COMMON)
@given(
    seed=st.integers(0, 2**31 - 1),
    batch=st.integers(1, 4),
    width=st.integers(1, 8),
    tau_m=st.floats(1e-3, 1.0),
    tau_a=st.floats(1e-3, 1.0),
    beta=st.floats(0.0, 3.0),
    threshold=st.floats(0.01, 2.0),
)
def test_alif_step_matches_numpy_oracle(seed, batch, width, tau_m, tau_a,
                                        beta, threshold):
    """ALIF dynamics (spiking_layers.py:229-243) for arbitrary constants."""
    cfg = ALIFConfig(
        input_size=1, output_size=width, use_recurrent_connection=False,
        tau_m=tau_m, tau_a=tau_a, beta=beta, threshold=threshold,
    )
    rng = np.random.default_rng(seed)
    v0 = rng.standard_normal((batch, width)).astype(np.float32)
    a0 = rng.random((batch, width)).astype(np.float32)
    z0 = (rng.random((batch, width)) > 0.5).astype(np.float32)
    cur = rng.standard_normal((batch, width)).astype(np.float32)

    z, st_new = alif_step(
        cfg, {},
        ALIFState(v=jnp.asarray(v0), a=jnp.asarray(a0), z=jnp.asarray(z0)),
        jnp.asarray(cur), precomputed_input_current=True,
    )
    alpha = math.exp(-cfg.dt / tau_m)
    rho = math.exp(-cfg.dt / tau_a)
    v_exp = (alpha * v0 + cur) * (1.0 - z0)
    a_exp = rho * a0 + z0
    z_exp = (v_exp >= threshold + beta * a_exp).astype(np.float32)
    np.testing.assert_allclose(np.asarray(st_new.v), v_exp, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_new.a), a_exp, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(z), z_exp)
