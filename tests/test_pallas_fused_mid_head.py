"""Fused mid-HEAD kernel (last hidden layer scan + readout integrator +
first-argmax max-over-time in one kernel pair) vs the unfused composition
(matmul -> XLA lax.scan -> readout matmul -> kappa scan -> temporal_max),
in interpret mode on CPU: logits, spike counts, and z_in / W_in / W_rec /
W_out / b gradients.  Multi-block n_steps=24 coverage included (the
round-2 reverse-grid-index bug class only shows when T spans >1 block).
"""
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
    fused_mid_ff_scan_head,
    fused_mid_ff_scan_head_counts,
    fused_mid_rec_scan_head,
    fused_mid_rec_scan_head_counts,
)
from snnimageclassification_tpu.ops.surrogate import SpikeFuncType
from snnimageclassification_tpu.ops.temporal import temporal_max

T, B, HIN, H, O = 12, 5, 24, 20, 7
KAPPA = 0.85


def _data(seed=0):
    rng = np.random.default_rng(seed)
    z_in = jnp.asarray((rng.random((T, B, HIN)) < 0.3).astype(np.float32))
    w_in = jnp.asarray(0.6 * rng.standard_normal((HIN, H)).astype(np.float32))
    w_rec = jnp.asarray(
        (0.3 * rng.standard_normal((H, H))).astype(np.float32)
        * (1 - np.eye(H, dtype=np.float32))
    )
    w_out = jnp.asarray(rng.standard_normal((H, O)).astype(np.float32))
    b_out = jnp.asarray(0.1 * rng.standard_normal((O,)).astype(np.float32))
    return z_in, w_in, w_rec, w_out, b_out


def _xla_hidden(z_in, w_in, w_rec, cfg, n_steps):
    currents = z_in @ w_in  # (T, B, H)
    if isinstance(cfg, ALIFConfig):
        init, step = alif_init_state(cfg, z_in.shape[1]), alif_step
    else:
        init, step = lif_init_state(cfg, z_in.shape[1]), lif_step

    def body(state, i_t):
        z, ns = step(cfg, {}, state, i_t, w_rec_eff=w_rec,
                     precomputed_input_current=True)
        return ns, z

    _, z = jax.lax.scan(body, init, currents)
    return z


def _xla_reference(z_in, w_in, w_rec, cfg, n_steps, w_out, b_out,
                   with_counts=False):
    z = _xla_hidden(z_in, w_in, w_rec, cfg, n_steps)  # (T, B, H)
    r = z @ w_out + b_out  # (T, B, O)

    def body(v, r_t):
        v = KAPPA * v + r_t
        return v, v

    _, vr = jax.lax.scan(body, jnp.zeros((z.shape[1], w_out.shape[1])), r)
    logits = temporal_max(jnp.swapaxes(vr, 0, 1), time_axis=1)
    if with_counts:
        return logits, jnp.sum(z, axis=0)
    return logits


def _run_fused(z_in, w_in, w_rec, w_out, b_out, cfg, alif, spike_func,
               n_steps, counts=False):
    beta = cfg.beta if alif else 0.0
    rho = cfg.rho if alif else 0.0
    common = (n_steps, alif, cfg.alpha, rho, cfg.threshold, cfg.gamma,
              KAPPA, spike_func, True)
    if w_rec is not None:
        fn = fused_mid_rec_scan_head_counts if counts else fused_mid_rec_scan_head
        return fn(z_in, w_in, w_rec, beta, w_out, b_out, *common)
    fn = fused_mid_ff_scan_head_counts if counts else fused_mid_ff_scan_head
    return fn(z_in, w_in, beta, w_out, b_out, *common)


CASES = [
    ("alif-rec", True, True, SpikeFuncType.FastSigmoid),
    ("alif-rec-phi", True, True, SpikeFuncType.Phi),
    ("alif-ff", True, False, SpikeFuncType.FastSigmoid),
    ("lif-rec", False, True, SpikeFuncType.FastSigmoid),
    ("lif-ff", False, False, SpikeFuncType.FastSigmoid),
]


@pytest.mark.parametrize("n_steps", [T, 24], ids=["T12-1block", "T24-2blocks"])
@pytest.mark.parametrize(
    "name,alif,rec,spike_func", CASES, ids=[c[0] for c in CASES]
)
def test_mid_head_forward_and_grads(name, alif, rec, spike_func, n_steps):
    z_in12, w_in, w_rec_full, w_out, b_out = _data()
    z_in = (
        jnp.concatenate([z_in12, z_in12[::-1]], axis=0)
        if n_steps != T else z_in12
    )
    w_rec = w_rec_full if rec else None
    cfg_cls = ALIFConfig if alif else LIFConfig
    cfg = cfg_cls(input_size=HIN, output_size=H, spike_func=spike_func,
                  use_recurrent_connection=rec)

    ref = _xla_reference(z_in, w_in, w_rec, cfg, n_steps, w_out, b_out)
    fused = _run_fused(z_in, w_in, w_rec, w_out, b_out, cfg, alif,
                       spike_func, n_steps)
    assert float(jnp.std(ref)) > 0, "degenerate case: constant logits"
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)

    g_out = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, O)).astype(np.float32)
    )

    def loss_ref(z_in, w_in, w_rec, w_out, b_out):
        return jnp.sum(
            _xla_reference(z_in, w_in, w_rec, cfg, n_steps, w_out, b_out)
            * g_out
        )

    def loss_fused(z_in, w_in, w_rec, w_out, b_out):
        return jnp.sum(
            _run_fused(z_in, w_in, w_rec, w_out, b_out, cfg, alif,
                       spike_func, n_steps)
            * g_out
        )

    if rec:
        argnums = (0, 1, 2, 3, 4)
        g_ref = jax.grad(loss_ref, argnums)(z_in, w_in, w_rec, w_out, b_out)
        g_fus = jax.grad(loss_fused, argnums)(z_in, w_in, w_rec, w_out, b_out)
        names = ("z_in", "w_in", "w_rec", "w_out", "b")
    else:
        g_ref = jax.grad(
            lambda z, w, wo, b: loss_ref(z, w, None, wo, b), (0, 1, 2, 3)
        )(z_in, w_in, w_out, b_out)
        g_fus = jax.grad(
            lambda z, w, wo, b: loss_fused(z, w, None, wo, b), (0, 1, 2, 3)
        )(z_in, w_in, w_out, b_out)
        names = ("z_in", "w_in", "w_out", "b")
    # Scale-normalized comparison (see test_pallas_fused.py): the fused
    # kernel batches the readout matmuls and accumulates g_W partials per
    # tile in a different f32 reduction order than XLA, so a handful of
    # elements drift ~1e-5 of each tensor's max.
    for pname, a, b in zip(names, g_fus, g_ref):
        assert float(jnp.linalg.norm(b)) > 0, f"{pname}: zero reference grad"
        scale = max(float(jnp.max(jnp.abs(b))), 1e-12)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-5,
            err_msg=f"{name} {pname}",
        )


@pytest.mark.parametrize("n_steps", [T, 24], ids=["T12-1block", "T24-2blocks"])
@pytest.mark.parametrize("rec", [True, False], ids=["rec", "ff"])
def test_mid_head_counts(rec, n_steps):
    """(logits, counts) variant: counts exact, both cotangents flow."""
    z_in12, w_in, w_rec_full, w_out, b_out = _data(3)
    z_in = (
        jnp.concatenate([z_in12, z_in12[::-1]], axis=0)
        if n_steps != T else z_in12
    )
    w_rec = w_rec_full if rec else None
    cfg = ALIFConfig(input_size=HIN, output_size=H,
                     use_recurrent_connection=rec)

    ref_logits, ref_counts = _xla_reference(
        z_in, w_in, w_rec, cfg, n_steps, w_out, b_out, with_counts=True
    )
    logits, counts = _run_fused(z_in, w_in, w_rec, w_out, b_out, cfg, True,
                                SpikeFuncType.FastSigmoid, n_steps,
                                counts=True)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(ref_counts))

    def loss_ref(z_in, w_in, w_out):
        lg, cnt = _xla_reference(z_in, w_in, w_rec, cfg, n_steps, w_out,
                                 b_out, with_counts=True)
        return jnp.sum(lg) + 0.3 * jnp.sum(cnt**2)

    def loss_fused(z_in, w_in, w_out):
        lg, cnt = _run_fused(z_in, w_in, w_rec, w_out, b_out, cfg, True,
                             SpikeFuncType.FastSigmoid, n_steps, counts=True)
        return jnp.sum(lg) + 0.3 * jnp.sum(cnt**2)

    g_ref = jax.grad(loss_ref, (0, 1, 2))(z_in, w_in, w_out)
    g_fus = jax.grad(loss_fused, (0, 1, 2))(z_in, w_in, w_out)
    for pname, a, b in zip(("z_in", "w_in", "w_out"), g_fus, g_ref):
        assert float(jnp.linalg.norm(b)) > 0
        scale = max(float(jnp.max(jnp.abs(b))), 1e-12)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-5,
            err_msg=pname,
        )


def test_mid_head_learnable_beta_zero_cotangent():
    """Quirk Q3 (dead learn_beta gradient) survives the mid-head fusion."""
    z_in, w_in, w_rec, w_out, b_out = _data(2)
    cfg = ALIFConfig(input_size=HIN, output_size=H)

    def loss(beta):
        logits = fused_mid_rec_scan_head(
            z_in, w_in, w_rec, beta, w_out, b_out, T, True, cfg.alpha,
            cfg.rho, cfg.threshold, cfg.gamma, KAPPA,
            SpikeFuncType.FastSigmoid, True,
        )
        return jnp.sum(logits)

    g = jax.grad(loss)(jnp.asarray(1.6))
    assert float(g) == 0.0


def test_mid_head_inference_primal_matches_fwd():
    """The store_traces=False primal (no jax.grad around it) must produce
    bitwise the same logits as the trace-storing custom_vjp forward."""
    z_in, w_in, w_rec, w_out, b_out = _data(5)
    cfg = ALIFConfig(input_size=HIN, output_size=H)
    args = (z_in, w_in, w_rec, cfg.beta, w_out, b_out, T, True, cfg.alpha,
            cfg.rho, cfg.threshold, cfg.gamma, KAPPA,
            SpikeFuncType.FastSigmoid, True)
    primal = fused_mid_rec_scan_head(*args)

    def loss(w):
        return jnp.sum(
            fused_mid_rec_scan_head(
                z_in, w_in, w_rec, cfg.beta, w, b_out, T, True, cfg.alpha,
                cfg.rho, cfg.threshold, cfg.gamma, KAPPA,
                SpikeFuncType.FastSigmoid, True,
            )
        )

    # Trigger the f_fwd path via value_and_grad: same logits bitwise.
    val_primal = float(jnp.sum(primal))
    val_fwd, _ = jax.value_and_grad(loss)(w_out)
    assert val_primal == float(val_fwd)
