"""Fused mid-layer kernel (z_in @ W_in + scan in one kernel) vs the
unfused composition (matmul -> XLA lax.scan), in interpret mode on CPU:
forward spikes and z_in / W_in / W_rec gradients."""
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
from snnimageclassification_tpu.ops.pallas_fused_mid import (
    fused_mid_ff_scan,
    fused_mid_rec_scan,
)
from snnimageclassification_tpu.ops.surrogate import SpikeFuncType

T, B, HIN, H = 12, 5, 24, 20


def _data(seed=0):
    rng = np.random.default_rng(seed)
    # A realistic input: a 0/1 spike trace from the previous layer.
    z_in = jnp.asarray(
        (rng.random((T, B, HIN)) < 0.3).astype(np.float32)
    )
    w_in = jnp.asarray(0.6 * rng.standard_normal((HIN, H)).astype(np.float32))
    w_rec = jnp.asarray(
        (0.3 * rng.standard_normal((H, H))).astype(np.float32)
        * (1 - np.eye(H, dtype=np.float32))
    )
    return z_in, w_in, w_rec


def _xla_reference(z_in, w_in, w_rec, cfg, n_steps):
    currents = z_in @ w_in  # (T, B, H)
    if isinstance(cfg, ALIFConfig):
        init, step = alif_init_state(cfg, B), alif_step
    else:
        init, step = lif_init_state(cfg, B), lif_step

    def body(state, i_t):
        z, ns = step(cfg, {}, state, i_t, w_rec_eff=w_rec,
                     precomputed_input_current=True)
        return ns, z

    _, z = jax.lax.scan(body, init, currents)
    return z


def _run_fused(z_in, w_in, w_rec, cfg, alif, spike_func, n_steps):
    beta = cfg.beta if alif else 0.0
    rho = cfg.rho if alif else 0.0
    common = (n_steps, alif, cfg.alpha, rho, cfg.threshold, cfg.gamma,
              spike_func, True)
    if w_rec is not None:
        return fused_mid_rec_scan(z_in, w_in, w_rec, beta, *common)
    return fused_mid_ff_scan(z_in, w_in, beta, *common)


CASES = [
    ("alif-rec", True, True, SpikeFuncType.FastSigmoid),
    ("alif-rec-phi", True, True, SpikeFuncType.Phi),
    ("alif-ff", True, False, SpikeFuncType.FastSigmoid),
    ("lif-rec", False, True, SpikeFuncType.FastSigmoid),
    ("lif-rec-phi", False, True, SpikeFuncType.Phi),
    ("lif-ff", False, False, SpikeFuncType.FastSigmoid),
]


@pytest.mark.parametrize("n_steps", [T, 24], ids=["T12-1block", "T24-2blocks"])
@pytest.mark.parametrize(
    "name,alif,rec,spike_func", CASES, ids=[c[0] for c in CASES]
)
def test_mid_forward_and_grads(name, alif, rec, spike_func, n_steps):
    z_in12, w_in, w_rec_full = _data()
    if n_steps != T:
        z_in = jnp.concatenate([z_in12, z_in12[::-1]], axis=0)
    else:
        z_in = z_in12
    w_rec = w_rec_full if rec else None
    cfg_cls = ALIFConfig if alif else LIFConfig
    cfg = cfg_cls(input_size=HIN, output_size=H, spike_func=spike_func,
                  use_recurrent_connection=rec)

    z_ref = _xla_reference(z_in, w_in, w_rec, cfg, n_steps)
    z_fused = _run_fused(z_in, w_in, w_rec, cfg, alif, spike_func, n_steps)
    assert float(jnp.sum(z_ref)) > 0, "degenerate case: no spikes"
    np.testing.assert_allclose(np.asarray(z_fused), np.asarray(z_ref),
                               atol=1e-5)

    wout = jnp.asarray(
        np.random.default_rng(1).standard_normal((H,)).astype(np.float32)
    )

    def loss_ref(z_in, w_in, w_rec):
        return jnp.sum(_xla_reference(z_in, w_in, w_rec, cfg, n_steps) * wout)

    def loss_fused(z_in, w_in, w_rec):
        return jnp.sum(
            _run_fused(z_in, w_in, w_rec, cfg, alif, spike_func, n_steps)
            * wout
        )

    if rec:
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(z_in, w_in, w_rec)
        g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(z_in, w_in, w_rec)
        names = ("z_in", "w_in", "w_rec")
    else:
        g_ref = jax.grad(lambda z, w: loss_ref(z, w, None), (0, 1))(z_in, w_in)
        g_fus = jax.grad(lambda z, w: loss_fused(z, w, None), (0, 1))(z_in, w_in)
        names = ("z_in", "w_in")
    for pname, a, b in zip(names, g_fus, g_ref):
        assert float(jnp.linalg.norm(b)) > 0
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=f"{name} {pname}",
        )


def test_mid_learnable_beta_zero_cotangent():
    """Quirk Q3 survives the mid-layer fusion."""
    z_in, w_in, w_rec = _data(2)
    cfg = ALIFConfig(input_size=HIN, output_size=H)

    def loss(beta):
        z = fused_mid_rec_scan(
            z_in, w_in, w_rec, beta, T, True, cfg.alpha, cfg.rho,
            cfg.threshold, cfg.gamma, SpikeFuncType.FastSigmoid, True,
        )
        return jnp.sum(z)

    g = jax.grad(loss)(jnp.asarray(1.6))
    assert float(g) == 0.0
