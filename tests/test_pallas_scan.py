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


def test_alif_bf16_traces():
    """trace_dtype="bfloat16" (SNNConfig.matmul_dtype mode): spikes are
    bitwise identical to the f32 path; gradients agree to bf16 surrogate
    precision (relative L2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from snnimageclassification_tpu.ops.pallas_scan import alif_scan
    from snnimageclassification_tpu.ops.surrogate import SpikeFuncType

    rng = np.random.default_rng(0)
    cur = jnp.asarray(0.1 * rng.standard_normal((8, 4, 12)).astype(np.float32))
    args = (1.6, 0.97, 0.995, 0.03, 0.3, SpikeFuncType.FastSigmoid, True)

    z32 = alif_scan(cur, *args, "float32")
    z16 = alif_scan(cur, *args, "bfloat16")
    assert z16.dtype == jnp.bfloat16
    assert float(jnp.sum(z32)) > 0
    np.testing.assert_array_equal(
        np.asarray(z16.astype(jnp.float32)), np.asarray(z32)
    )

    def loss(c, td):
        return jnp.sum(alif_scan(c, *args, td).astype(jnp.float32))

    g32 = jax.grad(loss)(cur, "float32")
    g16 = jax.grad(loss)(cur, "bfloat16")
    assert g16.dtype == jnp.float32  # currents cotangent stays f32
    rel = float(jnp.linalg.norm(g16 - g32) / jnp.linalg.norm(g32))
    assert rel < 0.05, rel


def test_fit_block_b_stays_sublane_aligned():
    """Regression: halving the batch tile under VMEM pressure must keep it
    a multiple of the 8-row sublane (200 -> 96, not 100).  Non-power-of-two
    batches (remainder val/test batches, e.g. sklearn-digits splits) hit
    this on real TPUs; interpret mode doesn't enforce the tiling rule."""
    from snnimageclassification_tpu.ops import pallas_fused, pallas_scan

    for B in (198, 200, 359, 1222, 8192):
        for K in (10, 16):
            for n_blocks in (4, 7, 9):
                bb0 = min(pallas_scan._MAX_BLOCK_B,
                          -(-B // pallas_scan._SUBLANE) * pallas_scan._SUBLANE)
                bb = pallas_scan._fit_block_b(bb0, K, 128, n_blocks)
                assert bb % pallas_scan._SUBLANE == 0 and bb >= 8, (B, K, n_blocks, bb)
    # The fused-kernel shape helper too (larger _MAX_BLOCK_B, head budget).
    w_in = jnp.zeros((64, 128), jnp.float32)
    for B in (198, 200, 359):
        _, _, _, bb = pallas_fused._shapes(B, w_in, 64, 10, head=True)
        assert bb % 8 == 0 and bb >= 8, (B, bb)
