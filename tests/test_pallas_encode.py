"""Fused encode+matmul kernel vs the reference composition
(firing_*_to_spikes -> einsum), forward and W-gradient, interpret mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snnimageclassification_tpu.ops.encoding import (
    firing_periods_to_spikes,
    firing_times_to_spikes,
)
from snnimageclassification_tpu.ops.pallas_encode import encoded_input_matmul


def _reference(latencies, w, n_steps, use_periods):
    gen = firing_periods_to_spikes if use_periods else firing_times_to_spikes
    spikes = jax.vmap(lambda l: gen(l, n_steps), in_axes=0, out_axes=1)(latencies)
    return jnp.einsum("tbf,fh->tbh", spikes, w)


@pytest.mark.parametrize("use_periods", [False, True])
@pytest.mark.parametrize("shape", [(4, 12, 8), (5, 100, 16)])  # (B, F, H)
def test_forward_matches_reference(use_periods, shape):
    B, F, H = shape
    n_steps = 10
    rng = np.random.default_rng(0)
    latencies = jnp.asarray(
        rng.integers(0, n_steps + 3, size=(B, F)).astype(np.int32)
    )
    w = jnp.asarray(rng.standard_normal((F, H)).astype(np.float32))
    ref = _reference(latencies, w, n_steps, use_periods)
    got = encoded_input_matmul(latencies, w, n_steps, use_periods, True)
    assert got.shape == (n_steps, B, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert float(jnp.abs(ref).sum()) > 0


@pytest.mark.parametrize("use_periods", [False, True])
def test_w_gradient_matches_reference(use_periods):
    B, F, H, n_steps = 6, 20, 8, 7
    rng = np.random.default_rng(1)
    latencies = jnp.asarray(
        rng.integers(0, n_steps + 2, size=(B, F)).astype(np.int32)
    )
    w = jnp.asarray(rng.standard_normal((F, H)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((n_steps, B, H)).astype(np.float32))

    g_ref = jax.grad(
        lambda w_: jnp.sum(_reference(latencies, w_, n_steps, use_periods) * cot)
    )(w)
    g_pal = jax.grad(
        lambda w_: jnp.sum(
            encoded_input_matmul(latencies, w_, n_steps, use_periods, True) * cot
        )
    )(w)
    assert float(jnp.linalg.norm(g_ref)) > 0
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_degenerate_production_latencies():
    """Quirk Q2 shapes: latency 0 (supra-threshold) and t_max (sub)."""
    n_steps = 5
    latencies = jnp.asarray([[0, n_steps, 0, 2]], dtype=jnp.int32)
    w = jnp.eye(4, dtype=jnp.float32)
    got = encoded_input_matmul(latencies, w, n_steps, False, True)
    ref = _reference(latencies, w, n_steps, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))

    got_p = encoded_input_matmul(latencies, w, n_steps, True, True)
    ref_p = _reference(latencies, w, n_steps, True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref_p))


class TestApplyPixelsFusedPath:
    def test_fused_model_path_matches_fallback(self, monkeypatch):
        """Force the fused encode+matmul path (interpret mode) through
        models.apply_pixels and compare against encode-then-apply."""
        import jax
        import snnimageclassification_tpu as st
        from snnimageclassification_tpu.data.datasets import EncodeConfig
        from snnimageclassification_tpu.models import snn as M
        from snnimageclassification_tpu.ops import pallas_encode
        from snnimageclassification_tpu.ops.encoding import encode_spikes

        orig = pallas_encode.encoded_input_matmul
        monkeypatch.setattr(
            pallas_encode, "encode_matmul_supported", lambda *a: True
        )
        monkeypatch.setattr(
            pallas_encode, "encoded_input_matmul",
            lambda lat, w, n, up, interp=False: orig(lat, w, n, up, True),
        )

        cfg = st.SNNConfig(
            input_size=20, output_size=4, n_hidden_neurons=8,
            hidden_layer_type=st.LayerType.ALIF,
            use_recurrent_connection=True, int_time_steps=6,
        )
        params = M.init(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        pixels = jnp.asarray(rng.random((3, 20)).astype(np.float32))
        for use_periods in (False, True):
            enc = EncodeConfig(n_steps=6, use_periods=use_periods)
            trace_fused, _ = M.apply_pixels(cfg, params, pixels, enc)
            spikes = encode_spikes(pixels, n_steps=6, use_periods=use_periods)
            trace_ref, _ = M.apply(cfg, params, spikes)
            np.testing.assert_allclose(
                np.asarray(trace_fused), np.asarray(trace_ref),
                rtol=1e-5, atol=1e-6,
            )

    def test_apply_pixels_2d_passthrough(self):
        """as_timeseries=False feeds pixels as constant-over-time input."""
        import jax
        import snnimageclassification_tpu as st
        from snnimageclassification_tpu.data.datasets import EncodeConfig
        from snnimageclassification_tpu.models import snn as M

        cfg = st.SNNConfig(input_size=8, output_size=3, n_hidden_neurons=4,
                           int_time_steps=3, use_recurrent_connection=False)
        params = M.init(cfg, jax.random.PRNGKey(0))
        pixels = jnp.ones((2, 8))
        enc = EncodeConfig(as_timeseries=False, n_steps=3)
        trace_a, _ = M.apply_pixels(cfg, params, pixels, enc)
        trace_b, _ = M.apply(cfg, params, pixels)
        np.testing.assert_allclose(np.asarray(trace_a), np.asarray(trace_b))
