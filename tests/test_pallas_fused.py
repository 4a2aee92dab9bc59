"""Fused encode+matmul+scan kernel vs the unfused composition
(encode_spikes -> currents matmul -> XLA lax.scan), in interpret mode on
CPU: forward spikes and W_in / W_rec gradients."""
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
from snnimageclassification_tpu.ops.encoding import (
    encode_spikes,
    pixels_to_firing_periods,
)
from snnimageclassification_tpu.ops.pallas_fused import (
    fused_encode_ff_scan,
    fused_encode_rec_scan,
)
from snnimageclassification_tpu.ops.surrogate import SpikeFuncType

T, B, F, H = 12, 5, 30, 20


def _data(seed=0):
    rng = np.random.default_rng(seed)
    pixels = rng.random((B, F)).astype(np.float32)
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(T))
    w_in = jnp.asarray(0.5 * rng.standard_normal((F, H)).astype(np.float32))
    w_rec = jnp.asarray(
        (0.3 * rng.standard_normal((H, H))).astype(np.float32)
        * (1 - np.eye(H, dtype=np.float32))
    )
    return pixels, lat, w_in, w_rec


def _xla_reference(pixels, w_in, w_rec, cfg, use_periods, n_steps=T):
    spikes = encode_spikes(
        jnp.asarray(pixels), n_steps=n_steps, use_periods=use_periods
    )  # (B, T, F)
    currents = jnp.swapaxes(spikes @ w_in, 0, 1)  # (T, B, H)
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


CASES = [
    ("alif-rec-ttfs", True, True, False, SpikeFuncType.FastSigmoid),
    ("alif-rec-periodic", True, True, True, SpikeFuncType.FastSigmoid),
    ("alif-rec-phi", True, True, False, SpikeFuncType.Phi),
    ("alif-ff-periodic", True, False, True, SpikeFuncType.FastSigmoid),
    ("lif-rec-ttfs", False, True, False, SpikeFuncType.FastSigmoid),
    ("lif-ff-periodic", False, False, True, SpikeFuncType.FastSigmoid),
]


def _run_fused(lat, w_in, w_rec, cfg, alif, use_periods, spike_func,
               n_steps=T):
    beta = cfg.beta if alif else 0.0
    rho = cfg.rho if alif else 0.0
    if w_rec is not None:
        return fused_encode_rec_scan(
            lat, w_in, w_rec, beta, n_steps, use_periods, alif, cfg.alpha,
            rho, cfg.threshold, cfg.gamma, spike_func, True,
        )
    return fused_encode_ff_scan(
        lat, w_in, beta, n_steps, use_periods, alif, cfg.alpha, rho,
        cfg.threshold, cfg.gamma, spike_func, True,
    )


# T=12 exercises a single K-step time block; T=24 forces TWO blocks
# through the kernel grid (regression: the backward once regenerated
# spike rows with the reverse grid index instead of the forward block
# index, corrupting g_W_in whenever T spanned multiple blocks).
@pytest.mark.parametrize("n_steps", [T, 24], ids=["T12-1block", "T24-2blocks"])
@pytest.mark.parametrize(
    "name,alif,rec,use_periods,spike_func", CASES,
    ids=[c[0] for c in CASES],
)
def test_fused_forward_and_grads(name, alif, rec, use_periods, spike_func,
                                 n_steps):
    pixels, _, w_in, w_rec_full = _data()
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(n_steps))
    w_rec = w_rec_full if rec else None
    cfg_cls = ALIFConfig if alif else LIFConfig
    cfg = cfg_cls(input_size=F, output_size=H, spike_func=spike_func,
                  use_recurrent_connection=rec)

    z_ref = _xla_reference(pixels, w_in, w_rec, cfg, use_periods, n_steps)
    z_fused = _run_fused(lat, w_in, w_rec, cfg, alif, use_periods,
                         spike_func, n_steps)
    assert float(jnp.sum(z_ref)) > 0, "degenerate case: no spikes"
    np.testing.assert_allclose(
        np.asarray(z_fused), np.asarray(z_ref), atol=1e-5
    )

    wout = jnp.asarray(
        np.random.default_rng(1).standard_normal((H,)).astype(np.float32)
    )

    def loss_ref(w_in, w_rec):
        return jnp.sum(
            _xla_reference(pixels, w_in, w_rec, cfg, use_periods, n_steps)
            * wout
        )

    def loss_fused(w_in, w_rec):
        z = _run_fused(lat, w_in, w_rec, cfg, alif, use_periods, spike_func,
                       n_steps)
        return jnp.sum(z * wout)

    if rec:
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(w_in, w_rec)
        g_fus = jax.grad(loss_fused, argnums=(0, 1))(w_in, w_rec)
    else:
        g_ref = (jax.grad(lambda w: loss_ref(w, None))(w_in),)
        g_fus = (jax.grad(lambda w: loss_fused(w, None))(w_in),)
    for name_, a, b in zip(("w_in", "w_rec"), g_fus, g_ref):
        assert float(jnp.linalg.norm(b)) > 0
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=name_,
        )


def test_fused_learnable_beta_zero_cotangent():
    """Quirk Q3 survives the fusion: a traced beta gets exactly zero."""
    _, lat, w_in, w_rec = _data(2)
    cfg = ALIFConfig(input_size=F, output_size=H)

    def loss(beta):
        z = fused_encode_rec_scan(
            lat, w_in, w_rec, beta, T, True, True, cfg.alpha, cfg.rho,
            cfg.threshold, cfg.gamma, SpikeFuncType.FastSigmoid, True,
        )
        return jnp.sum(z)

    g = jax.grad(loss)(jnp.asarray(1.6))
    assert float(g) == 0.0


def test_fused_bf16_trace_spikes_exact():
    """bf16 W_in (matmul_dtype mode): trace dtype bf16, spikes match the
    f32 run with identical (bf16-representable) weights."""
    _, lat, w_in, w_rec = _data(3)
    w_in16 = w_in.astype(jnp.bfloat16)
    w_rec16 = w_rec.astype(jnp.bfloat16)
    cfg = ALIFConfig(input_size=F, output_size=H)
    args = (1.6, T, True, True, cfg.alpha, cfg.rho, cfg.threshold,
            cfg.gamma, SpikeFuncType.FastSigmoid, True)

    def run(w_in, w_rec):
        return fused_encode_rec_scan(lat, w_in, w_rec, *args[:1], *args[1:])

    z32 = run(w_in16.astype(jnp.float32), w_rec16.astype(jnp.float32))
    z16 = run(w_in16, w_rec16)
    assert z16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(z16.astype(jnp.float32)), np.asarray(z32)
    )


# ---------------------------------------------------------------------------
# Head variants: + readout integrator + first-argmax max-over-time
# ---------------------------------------------------------------------------
from snnimageclassification_tpu.ops.cells import (  # noqa: E402
    ReadoutConfig,
    alif_init_state as _alif_init,
)
from snnimageclassification_tpu.ops.pallas_fused import (  # noqa: E402
    fused_encode_ff_scan_head,
    fused_encode_rec_scan_head,
)
from snnimageclassification_tpu.ops.temporal import temporal_max  # noqa: E402

O = 10
_KAPPA = ReadoutConfig(input_size=H, output_size=O).kappa


def _composed_head(pixels, w_in, w_rec, w_out, b_out, cfg, use_periods,
                   n_steps):
    """encode -> scan -> readout matmul -> kappa integrator -> temporal_max."""
    z = _xla_reference(pixels, w_in, w_rec, cfg, use_periods, n_steps)
    rcur = z @ w_out + b_out  # (T, B, O)

    def rbody(v, c):
        v = _KAPPA * v + c
        return v, v

    _, vr = jax.lax.scan(rbody, jnp.zeros((B, O)), rcur)
    return temporal_max(jnp.swapaxes(vr, 0, 1), time_axis=1)


def _run_head(lat, w_in, w_rec, w_out, b_out, cfg, alif, use_periods,
              spike_func, n_steps):
    beta = cfg.beta if alif else 0.0
    rho = cfg.rho if alif else 0.0
    common = (n_steps, use_periods, alif, cfg.alpha, rho, cfg.threshold,
              cfg.gamma, _KAPPA, spike_func, True)
    if w_rec is not None:
        return fused_encode_rec_scan_head(
            lat, w_in, w_rec, beta, w_out, b_out, *common
        )
    return fused_encode_ff_scan_head(lat, w_in, beta, w_out, b_out, *common)


HEAD_CASES = [
    ("alif-rec-ttfs", True, True, False, SpikeFuncType.FastSigmoid, 12),
    ("alif-ff-periodic", True, False, True, SpikeFuncType.FastSigmoid, 12),
    ("lif-rec-phi", False, True, True, SpikeFuncType.Phi, 12),
    # ALIF+Phi: the only head branch storing the adaptation trace
    # (n_trace=2) AND using the dynamic-threshold surrogate scale.
    ("alif-rec-phi", True, True, False, SpikeFuncType.Phi, 12),
    # 2 time blocks: the s-chain and tstar routing cross block boundaries.
    ("alif-rec-2blocks", True, True, False, SpikeFuncType.FastSigmoid, 24),
    ("lif-ff-2blocks", False, False, True, SpikeFuncType.FastSigmoid, 24),
    ("alif-ff-phi-2blocks", True, False, True, SpikeFuncType.Phi, 24),
]


@pytest.mark.parametrize(
    "name,alif,rec,use_periods,spike_func,n_steps", HEAD_CASES,
    ids=[c[0] for c in HEAD_CASES],
)
def test_fused_head_logits_and_grads(name, alif, rec, use_periods,
                                     spike_func, n_steps):
    rng = np.random.default_rng(11)
    pixels = rng.random((B, F)).astype(np.float32)
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(n_steps))
    w_in = jnp.asarray(0.5 * rng.standard_normal((F, H)).astype(np.float32))
    w_rec = (
        jnp.asarray(
            (0.3 * rng.standard_normal((H, H))).astype(np.float32)
            * (1 - np.eye(H, dtype=np.float32))
        )
        if rec
        else None
    )
    w_out = jnp.asarray(rng.standard_normal((H, O)).astype(np.float32))
    b_out = jnp.asarray(0.1 * rng.standard_normal((O,)).astype(np.float32))
    cfg_cls = ALIFConfig if alif else LIFConfig
    cfg = cfg_cls(input_size=F, output_size=H, spike_func=spike_func,
                  use_recurrent_connection=rec)

    ref = _composed_head(pixels, w_in, w_rec, w_out, b_out, cfg, use_periods,
                         n_steps)
    got = _run_head(lat, w_in, w_rec, w_out, b_out, cfg, alif, use_periods,
                    spike_func, n_steps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    y = jnp.asarray(rng.integers(0, O, B), jnp.int32)

    def nll(logits):
        return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(B), y])

    def loss_ref(w_in, w_rec, w_out, b_out):
        return nll(_composed_head(pixels, w_in, w_rec, w_out, b_out, cfg,
                                  use_periods, n_steps))

    def loss_head(w_in, w_rec, w_out, b_out):
        return nll(_run_head(lat, w_in, w_rec, w_out, b_out, cfg, alif,
                             use_periods, spike_func, n_steps))

    if rec:
        g_ref = jax.grad(loss_ref, (0, 1, 2, 3))(w_in, w_rec, w_out, b_out)
        g_got = jax.grad(loss_head, (0, 1, 2, 3))(w_in, w_rec, w_out, b_out)
        names = ("w_in", "w_rec", "w_out", "b_out")
    else:
        g_ref = jax.grad(lambda a, c, d: loss_ref(a, None, c, d), (0, 1, 2))(
            w_in, w_out, b_out
        )
        g_got = jax.grad(lambda a, c, d: loss_head(a, None, c, d), (0, 1, 2))(
            w_in, w_out, b_out
        )
        names = ("w_in", "w_out", "b_out")
    # ALIF+Phi divides the surrogate by the *dynamic* threshold (A + eps,
    # A = theta + beta*a ~ 0.03): per-element denominators amplify f32
    # reduction-order noise to ~1e-5 of each tensor's max (still well
    # inside the <=1e-4 parity standard, PARITY.md).  Other branches hold
    # 2e-6.
    g_atol = 2e-5 if (alif and spike_func == SpikeFuncType.Phi) else 2e-6
    for pname, a, b in zip(names, g_got, g_ref):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-12)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=g_atol,
            err_msg=f"{name} {pname}",
        )


def test_fused_head_tie_routing_matches_first_argmax():
    """A never-spiking hidden layer makes the readout trace constant per
    class; torch.max (and temporal_max) route the whole cotangent to the
    FIRST maximal step -- the head's strict-> running max must agree."""
    rng = np.random.default_rng(5)
    pixels = rng.random((B, F)).astype(np.float32)
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(T))
    w_in = jnp.zeros((F, H), jnp.float32)  # no input current -> no spikes
    w_out = jnp.asarray(rng.standard_normal((H, O)).astype(np.float32))
    b_out = jnp.asarray(rng.standard_normal((O,)).astype(np.float32))
    cfg = LIFConfig(input_size=F, output_size=H)
    y = jnp.asarray(rng.integers(0, O, B), jnp.int32)

    def nll(logits):
        return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(B), y])

    def loss_ref(b_out):
        return nll(_composed_head(pixels, w_in, None, w_out, b_out, cfg,
                                  False, T))

    def loss_head(b_out):
        return nll(_run_head(lat, w_in, None, w_out, b_out, cfg, False,
                             False, SpikeFuncType.FastSigmoid, T))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_head)(b_out)),
        np.asarray(jax.grad(loss_ref)(b_out)),
        atol=1e-6,
    )


def test_fused_head_beta_zero_cotangent():
    """Quirk Q3 through the head: a traced learnable beta gets exactly 0."""
    rng = np.random.default_rng(7)
    pixels = rng.random((B, F)).astype(np.float32)
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(T))
    w_in = jnp.asarray(0.5 * rng.standard_normal((F, H)).astype(np.float32))
    w_out = jnp.asarray(rng.standard_normal((H, O)).astype(np.float32))
    b_out = jnp.zeros((O,), jnp.float32)
    cfg = ALIFConfig(input_size=F, output_size=H)

    def loss(beta):
        logits = fused_encode_ff_scan_head(
            lat, w_in, beta, w_out, b_out, T, True, True, cfg.alpha, cfg.rho,
            cfg.threshold, cfg.gamma, _KAPPA, SpikeFuncType.FastSigmoid, True,
        )
        return jnp.sum(logits)

    assert float(jax.grad(loss)(jnp.asarray(1.6))) == 0.0


# ---------------------------------------------------------------------------
# Izhikevich fused encode (ops/pallas_fused_izh.py)
# ---------------------------------------------------------------------------
def _xla_izh_reference(pixels, w_in, w_rec, cfg, use_periods, n_steps):
    from snnimageclassification_tpu.ops.cells import (
        izhikevich_init_state,
        izhikevich_step,
    )

    spikes = encode_spikes(
        jnp.asarray(pixels), n_steps=n_steps, use_periods=use_periods
    )
    currents = jnp.swapaxes(spikes @ w_in, 0, 1)

    def body(state, i_t):
        z, ns = izhikevich_step(cfg, {}, state, i_t, w_rec_eff=w_rec,
                                precomputed_input_current=True)
        return ns, z

    _, z = jax.lax.scan(body, izhikevich_init_state(cfg, B), currents)
    return z


@pytest.mark.parametrize("n_steps", [T, 24], ids=["T12-1block", "T24-2blocks"])
@pytest.mark.parametrize("rec", [True, False], ids=["rec", "ff"])
@pytest.mark.parametrize("use_periods", [False, True], ids=["ttfs", "periodic"])
def test_fused_izh_forward_and_grads(rec, use_periods, n_steps):
    from snnimageclassification_tpu.ops.cells import IzhikevichConfig
    from snnimageclassification_tpu.ops.pallas_fused_izh import (
        fused_encode_izh_scan,
    )
    from snnimageclassification_tpu.ops.pallas_izh import izh_kernel_params

    pixels, _, _, _ = _data(3)
    # Izhikevich needs ~1e6-scale step currents to push v from v_rest
    # (-60 mV) to v_peak (35 mV): dv/step ~ dt*cur/C = 1e-5*cur (same
    # scaling as tests/test_pallas_izh.py).
    rng = np.random.default_rng(7)
    # Zero-mean with large variance so neurons spike heterogeneously
    # across time (an all-spike-at-t=0 raster makes the exact w_rec
    # gradient vanish through the reset mask).
    w_in = jnp.asarray(
        (3e6 * rng.standard_normal((F, H))).astype(np.float32)
    )
    w_rec = (
        jnp.asarray(
            (5e5 * rng.standard_normal((H, H))).astype(np.float32)
            * (1 - np.eye(H, dtype=np.float32))
        )
        if rec
        else None
    )
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(n_steps))
    cfg = IzhikevichConfig(input_size=F, output_size=H,
                           use_recurrent_connection=rec)
    kp = izh_kernel_params(cfg)

    z_ref = _xla_izh_reference(pixels, w_in, w_rec, cfg, use_periods, n_steps)
    z_fused = fused_encode_izh_scan(
        lat, w_in, w_rec, kp, n_steps, use_periods, cfg.gamma,
        cfg.spike_func, True,
    )
    assert float(jnp.sum(z_ref)) > 0, "degenerate case: no spikes"
    np.testing.assert_allclose(np.asarray(z_fused), np.asarray(z_ref),
                               atol=1e-5)

    wout = jnp.asarray(
        np.random.default_rng(1).standard_normal((H,)).astype(np.float32)
    )

    def loss_ref(w_in, w_rec):
        return jnp.sum(
            _xla_izh_reference(pixels, w_in, w_rec, cfg, use_periods, n_steps)
            * wout
        )

    def loss_fused(w_in, w_rec):
        z = fused_encode_izh_scan(
            lat, w_in, w_rec, kp, n_steps, use_periods, cfg.gamma,
            cfg.spike_func, True,
        )
        return jnp.sum(z * wout)

    if rec:
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(w_in, w_rec)
        g_fus = jax.grad(loss_fused, argnums=(0, 1))(w_in, w_rec)
    else:
        g_ref = (jax.grad(lambda w: loss_ref(w, None))(w_in),)
        g_fus = (jax.grad(lambda w: loss_fused(w, None))(w_in),)
    for name_, a, b in zip(("w_in", "w_rec"), g_fus, g_ref):
        assert float(jnp.linalg.norm(b)) > 0
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=name_,
        )


@pytest.mark.parametrize("n_steps", [T, 24], ids=["T12-1block", "T24-2blocks"])
@pytest.mark.parametrize("rec", [True, False], ids=["rec", "ff"])
def test_fused_izh_head_logits_and_grads(rec, n_steps):
    """Whole-network Izhikevich head kernel (encode -> izh scan -> readout
    integrator -> first-argmax max) vs the composed XLA path, logits and
    every gradient."""
    from snnimageclassification_tpu.ops.cells import IzhikevichConfig
    from snnimageclassification_tpu.ops.pallas_fused_izh import (
        fused_encode_izh_scan_head,
    )
    from snnimageclassification_tpu.ops.pallas_izh import izh_kernel_params

    pixels, _, _, _ = _data(3)
    rng = np.random.default_rng(7)
    w_in = jnp.asarray(
        (3e6 * rng.standard_normal((F, H))).astype(np.float32)
    )
    w_rec = (
        jnp.asarray(
            (5e5 * rng.standard_normal((H, H))).astype(np.float32)
            * (1 - np.eye(H, dtype=np.float32))
        )
        if rec
        else None
    )
    w_out = jnp.asarray(rng.standard_normal((H, O)).astype(np.float32))
    b_out = jnp.asarray(0.1 * rng.standard_normal((O,)).astype(np.float32))
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(n_steps))
    cfg = IzhikevichConfig(input_size=F, output_size=H,
                           use_recurrent_connection=rec)
    kp = izh_kernel_params(cfg)
    use_periods = False

    def composed(w_in, w_rec, w_out, b_out):
        z = _xla_izh_reference(pixels, w_in, w_rec, cfg, use_periods, n_steps)
        rcur = z @ w_out + b_out  # (T, B, O)

        def rbody(v, c):
            v = _KAPPA * v + c
            return v, v

        _, vr = jax.lax.scan(rbody, jnp.zeros((B, O)), rcur)
        return temporal_max(jnp.swapaxes(vr, 0, 1), time_axis=1)

    def fused(w_in, w_rec, w_out, b_out):
        return fused_encode_izh_scan_head(
            lat, w_in, w_rec, w_out, b_out, kp, n_steps, use_periods,
            cfg.gamma, _KAPPA, cfg.spike_func, True,
        )

    ref = composed(w_in, w_rec, w_out, b_out)
    got = fused(w_in, w_rec, w_out, b_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    y = jnp.asarray(np.random.default_rng(3).integers(0, O, B), jnp.int32)

    def nll(logits):
        return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(B), y])

    if rec:
        g_ref = jax.grad(lambda *a: nll(composed(*a)), (0, 1, 2, 3))(
            w_in, w_rec, w_out, b_out)
        g_got = jax.grad(lambda *a: nll(fused(*a)), (0, 1, 2, 3))(
            w_in, w_rec, w_out, b_out)
        names = ("w_in", "w_rec", "w_out", "b_out")
    else:
        g_ref = jax.grad(
            lambda a, c, d: nll(composed(a, None, c, d)), (0, 1, 2)
        )(w_in, w_out, b_out)
        g_got = jax.grad(
            lambda a, c, d: nll(fused(a, None, c, d)), (0, 1, 2)
        )(w_in, w_out, b_out)
        names = ("w_in", "w_out", "b_out")
    # Tolerance calibrated against the f32 noise floor: the composed XLA
    # path's own w_in gradient differs from its float64 run by up to
    # 7.7e-5 of max at T=24 rec (Izhikevich's ~1e6-scale currents amplify
    # reduction-order noise); the kernel sits within that floor.
    for pname, a, b in zip(names, g_got, g_ref):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-12)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-4,
            err_msg=f"izh-head {pname}",
        )


@pytest.mark.parametrize("rec", [True, False], ids=["rec", "ff"])
def test_fused_interleaved_bitwise_identical(rec, monkeypatch):
    """ilv=2 batch-half interleaving must be BITWISE identical to ilv=1:
    batch rows are independent, the per-row arithmetic is unchanged.
    (Needs a batch tile divisible by 16 -- the default test B=5 pads to an
    8-row tile where interleaving gates off.)"""
    import snnimageclassification_tpu.ops.pallas_fused as pf

    B32 = 32
    rng = np.random.default_rng(5)
    pixels = rng.random((B32, F)).astype(np.float32)
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(T))
    w_in = jnp.asarray(0.5 * rng.standard_normal((F, H)).astype(np.float32))
    w_rec = (
        jnp.asarray(
            (0.3 * rng.standard_normal((H, H))).astype(np.float32)
            * (1 - np.eye(H, dtype=np.float32))
        )
        if rec
        else None
    )
    w_out = jnp.asarray(rng.standard_normal((H, O)).astype(np.float32))
    b_out = jnp.asarray(0.1 * rng.standard_normal((O,)).astype(np.float32))
    cfg = ALIFConfig(input_size=F, output_size=H,
                     use_recurrent_connection=rec)
    y = jnp.asarray(rng.integers(0, O, B32), jnp.int32)

    def run():
        common = (T, False, True, cfg.alpha, cfg.rho, cfg.threshold,
                  cfg.gamma, _KAPPA, SpikeFuncType.FastSigmoid, True)

        def loss(w_in, w_rec, w_out, b_out):
            if rec:
                logits = fused_encode_rec_scan_head(
                    lat, w_in, w_rec, cfg.beta, w_out, b_out, *common)
            else:
                logits = fused_encode_ff_scan_head(
                    lat, w_in, cfg.beta, w_out, b_out, *common)
            return -jnp.mean(
                jax.nn.log_softmax(logits)[jnp.arange(B32), y]
            ), logits

        args = (w_in, w_rec, w_out, b_out) if rec else (w_in, w_out, b_out)
        if rec:
            (l, logits), g = jax.value_and_grad(
                loss, (0, 1, 2, 3), has_aux=True)(w_in, w_rec, w_out, b_out)
        else:
            (l, logits), g = jax.value_and_grad(
                lambda a, c, d: loss(a, None, c, d), (0, 1, 2),
                has_aux=True)(w_in, w_out, b_out)
        return logits, l, g

    monkeypatch.setattr(pf, "_ILV", 1)
    logits1, l1, g1 = run()
    monkeypatch.setattr(pf, "_ILV", 2)
    assert pf._ilv_for(32) == 2  # the tile really interleaves
    logits2, l2, g2 = run()
    np.testing.assert_array_equal(np.asarray(logits1), np.asarray(logits2))
    assert float(l1) == float(l2)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Stacked-replica (ensemble) grid: one kernel pair for all replicas
# ---------------------------------------------------------------------------
STACKED_CASES = [
    ("alif-rec-ttfs", True, True, False, SpikeFuncType.FastSigmoid, 12),
    ("lif-ff-periodic", False, False, True, SpikeFuncType.FastSigmoid, 12),
    ("alif-rec-phi-2blocks", True, True, False, SpikeFuncType.Phi, 24),
    ("alif-ff-2blocks", True, False, True, SpikeFuncType.FastSigmoid, 24),
]


@pytest.mark.parametrize(
    "name,alif,rec,use_periods,spike_func,n_steps", STACKED_CASES,
    ids=[c[0] for c in STACKED_CASES],
)
def test_fused_head_stacked_matches_unrolled(name, alif, rec, use_periods,
                                             spike_func, n_steps):
    """The stacked-replica grid (leading S axis, one pallas_call for the
    whole ensemble) must be BITWISE identical to S unrolled head calls --
    logits and every weight gradient, per replica.  Per-replica beta
    exercises the (S, 1, 1) SMEM block."""
    S = 3
    rng = np.random.default_rng(23)
    pixels = rng.random((B, F)).astype(np.float32)
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(n_steps))
    w_in = jnp.asarray(0.5 * rng.standard_normal((S, F, H)).astype(np.float32))
    w_rec = (
        jnp.asarray(
            (0.3 * rng.standard_normal((S, H, H))).astype(np.float32)
            * (1 - np.eye(H, dtype=np.float32))
        )
        if rec
        else None
    )
    w_out = jnp.asarray(rng.standard_normal((S, H, O)).astype(np.float32))
    b_out = jnp.asarray(0.1 * rng.standard_normal((S, O)).astype(np.float32))
    beta = (
        jnp.asarray(0.1 * rng.standard_normal(S).astype(np.float32))
        if alif
        else 0.0
    )
    cfg_cls = ALIFConfig if alif else LIFConfig
    cfg = cfg_cls(input_size=F, output_size=H, spike_func=spike_func,
                  use_recurrent_connection=rec)
    rho = cfg.rho if alif else 0.0
    common = (n_steps, use_periods, alif, cfg.alpha, rho, cfg.threshold,
              cfg.gamma, _KAPPA, spike_func, True)
    y = jnp.asarray(rng.integers(0, O, B), jnp.int32)

    def nll(logits):  # (B, O) -> scalar
        return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(B), y])

    def run_one(i, wi, wr, wo, bo):
        be = beta[i] if alif else 0.0
        if rec:
            return fused_encode_rec_scan_head(lat, wi, wr, be, wo, bo, *common)
        return fused_encode_ff_scan_head(lat, wi, be, wo, bo, *common)

    def run_stacked(wi, wr, wo, bo):
        if rec:
            return fused_encode_rec_scan_head(
                lat, wi, wr, beta, wo, bo, *common
            )
        return fused_encode_ff_scan_head(lat, wi, beta, wo, bo, *common)

    argn = (0, 1, 2, 3) if rec else (0, 2, 3)
    loss_s = lambda wi, wr, wo, bo: jnp.sum(
        jax.vmap(nll)(run_stacked(wi, wr, wo, bo))
    )
    lg_s = run_stacked(w_in, w_rec, w_out, b_out)
    g_s = jax.grad(loss_s, argn)(w_in, w_rec, w_out, b_out)
    assert lg_s.shape == (S, B, O)
    for i in range(S):
        wr_i = w_rec[i] if rec else None
        lg_i = run_one(i, w_in[i], wr_i, w_out[i], b_out[i])
        loss_i = lambda wi, wr, wo, bo: nll(run_one(i, wi, wr, wo, bo))
        g_i = jax.grad(loss_i, argn)(w_in[i], wr_i, w_out[i], b_out[i])
        np.testing.assert_array_equal(np.asarray(lg_s[i]), np.asarray(lg_i))
        for g_stacked, g_ref in zip(g_s, g_i):
            np.testing.assert_array_equal(
                np.asarray(g_stacked[i]), np.asarray(g_ref)
            )


def test_wide_hidden_tile_shrinks_not_gates():
    """Hidden sizes past 128 lanes (e.g. the reference sweep's
    n_hidden_neurons=200) must shrink the batch tile instead of losing
    the fused path: _wlat_fit_bb keeps W_in + 2 latency tiles inside
    their VMEM budget, and the kernel stays correct at the shrunk tile."""
    from snnimageclassification_tpu.ops.pallas_fused import (
        _LANE,
        _MAX_BLOCK_B,
        _WLAT_BUDGET,
        _wlat_fit_bb,
    )

    f_pad = 896  # F=784 padded
    from snnimageclassification_tpu.ops.pallas_fused import _weight_bytes

    # (hidden, recurrent) -> fits?  The budget counts W_in + W_rec +
    # W_out; recurrent H=1024 (8.2 MB of weights alone) must gate OFF so
    # it falls back to XLA instead of failing Mosaic compile, while the
    # natively-validated H<=512 recurrent shapes and wide feedforward
    # shapes stay admitted.
    for hidden, recurrent, expect_fits in (
        (128, True, True), (200, True, True), (512, True, True),
        (1024, True, False), (1024, False, True), (2048, False, False),
    ):
        h_pad = -(-hidden // _LANE) * _LANE
        w_bytes = _weight_bytes(f_pad, h_pad, recurrent, 0)
        bb = _wlat_fit_bb(_MAX_BLOCK_B, f_pad, w_bytes)
        fits = w_bytes + 2 * bb * f_pad * 4 <= _WLAT_BUDGET
        assert fits == expect_fits, (hidden, recurrent, bb)
    # H=512 recurrent really trades tile size (bb=256 on-chip validated).
    bb512 = _wlat_fit_bb(
        _MAX_BLOCK_B, f_pad, _weight_bytes(f_pad, 512, True, 128)
    )
    assert bb512 < _MAX_BLOCK_B

    # Correctness at the shrunk tile: H=200 head kernel vs composed XLA.
    F2, H2, n_steps = 784, 200, 12
    rng = np.random.default_rng(31)
    pixels = rng.random((B, F2)).astype(np.float32)
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(n_steps))
    w_in = jnp.asarray(0.2 * rng.standard_normal((F2, H2)).astype(np.float32))
    w_out = jnp.asarray(rng.standard_normal((H2, O)).astype(np.float32))
    b_out = jnp.asarray(0.1 * rng.standard_normal((O,)).astype(np.float32))
    cfg = ALIFConfig(input_size=F2, output_size=H2,
                     spike_func=SpikeFuncType.FastSigmoid,
                     use_recurrent_connection=False)
    common = (n_steps, False, True, cfg.alpha, cfg.rho, cfg.threshold,
              cfg.gamma, _KAPPA, SpikeFuncType.FastSigmoid, True)
    got = fused_encode_ff_scan_head(lat, w_in, cfg.beta, w_out, b_out,
                                    *common)
    ref = _composed_head(pixels, w_in, None, w_out, b_out, cfg, False,
                         n_steps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_shrunk_tile_multi_tile_grads(monkeypatch):
    """Force the _wlat_fit_bb shrink with a tiny budget so the batch
    really cycles multiple SHRUNK tiles (B=24, bb=8 -> 3 tiles) through
    a multi-block (T=24) recurrent head, forward AND backward -- the
    round-3 wide-hidden fix's new code path at gradient level."""
    import snnimageclassification_tpu.ops.pallas_fused as pf

    n_steps = 24
    rng = np.random.default_rng(41)
    pixels = rng.random((24, F)).astype(np.float32)
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(n_steps))
    w_in = jnp.asarray(0.5 * rng.standard_normal((F, H)).astype(np.float32))
    w_rec = jnp.asarray(
        (0.3 * rng.standard_normal((H, H))).astype(np.float32)
        * (1 - np.eye(H, dtype=np.float32))
    )
    w_out = jnp.asarray(rng.standard_normal((H, O)).astype(np.float32))
    b_out = jnp.asarray(0.1 * rng.standard_normal((O,)).astype(np.float32))
    cfg = ALIFConfig(input_size=F, output_size=H,
                     spike_func=SpikeFuncType.FastSigmoid,
                     use_recurrent_connection=True)
    common = (n_steps, False, True, cfg.alpha, cfg.rho, cfg.threshold,
              cfg.gamma, _KAPPA, SpikeFuncType.FastSigmoid, True)
    y = jnp.asarray(rng.integers(0, O, 24), jnp.int32)

    def nll(lg):
        return -jnp.mean(jax.nn.log_softmax(lg)[jnp.arange(24), y])

    def run():
        def loss(wi, wr, wo, bo):
            return nll(fused_encode_rec_scan_head(
                lat, wi, wr, cfg.beta, wo, bo, *common))
        return jax.value_and_grad(loss, (0, 1, 2, 3))(
            w_in, w_rec, w_out, b_out)

    # Reference run at the default budget (single 24-row tile).
    v_ref, g_ref = run()
    K = pf._time_block(n_steps)
    _, _, _, bb_full = pf._shapes(24, w_in, F, K, head=True,
                                  recurrent=True, n_out=O)
    assert bb_full == 24

    # Shrunk: budget forces bb=8 -> 3 tiles x 2 time blocks.
    wb = pf._weight_bytes(128, 128, True, 128)
    monkeypatch.setattr(pf, "_WLAT_BUDGET", wb + 2 * 8 * 128 * 4)
    _, _, _, bb_small = pf._shapes(24, w_in, F, K, head=True,
                                   recurrent=True, n_out=O)
    assert bb_small == 8
    v_small, g_small = run()

    # Tile partition must not change the math (tile sums are f32; the
    # per-tile g_W partials add in a different order -> tiny noise).
    np.testing.assert_allclose(float(v_small), float(v_ref), rtol=1e-6)
    for a, b in zip(g_small, g_ref):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-12)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-6)


class TestInferencePrimalMatchesTrainingForward:
    """The custom_vjp PRIMAL runs in inference mode (store_traces=False:
    no residual trace leaves the kernel).  Arithmetic is unchanged, so
    the primal's outputs must be BITWISE equal to the f_fwd pass the
    training path uses -- pinned here so the serving fast path can never
    drift from the trained forward."""

    @pytest.mark.parametrize(
        "name,alif,rec,use_periods,spike_func,n_steps",
        [HEAD_CASES[0], HEAD_CASES[3], HEAD_CASES[4]],
        ids=[HEAD_CASES[i][0] for i in (0, 3, 4)],
    )
    def test_head_primal_bitwise(self, name, alif, rec, use_periods,
                                 spike_func, n_steps):
        from snnimageclassification_tpu.ops.pallas_fused import (
            _fused_ff_head_fwd,
            _fused_rec_head_fwd,
        )

        rng = np.random.default_rng(23)
        pixels = rng.random((B, F)).astype(np.float32)
        lat = pixels_to_firing_periods(jnp.asarray(pixels),
                                       t_max=float(n_steps))
        w_in = jnp.asarray(0.5 * rng.standard_normal((F, H)).astype(np.float32))
        w_rec = (
            jnp.asarray(
                (0.3 * rng.standard_normal((H, H))).astype(np.float32)
                * (1 - np.eye(H, dtype=np.float32))
            )
            if rec
            else None
        )
        w_out = jnp.asarray(rng.standard_normal((H, O)).astype(np.float32))
        b_out = jnp.asarray(0.1 * rng.standard_normal((O,)).astype(np.float32))
        cfg_cls = ALIFConfig if alif else LIFConfig
        cfg = cfg_cls(input_size=F, output_size=H, spike_func=spike_func,
                      use_recurrent_connection=rec)
        beta = cfg.beta if alif else 0.0
        rho = cfg.rho if alif else 0.0
        primal = _run_head(lat, w_in, w_rec, w_out, b_out, cfg, alif,
                           use_periods, spike_func, n_steps)
        if rec:
            trained, _ = _fused_rec_head_fwd(
                lat, w_in, w_rec, beta, w_out, b_out, n_steps, use_periods,
                alif, cfg.alpha, rho, cfg.threshold, cfg.gamma, _KAPPA,
                spike_func, True,
            )
        else:
            trained, _ = _fused_ff_head_fwd(
                lat, w_in, beta, w_out, b_out, n_steps, use_periods,
                alif, cfg.alpha, rho, cfg.threshold, cfg.gamma, _KAPPA,
                spike_func, True,
            )
        np.testing.assert_array_equal(np.asarray(primal), np.asarray(trained))

    @pytest.mark.parametrize("alif", [True, False], ids=["alif", "lif"])
    def test_layer_primal_bitwise(self, alif):
        from snnimageclassification_tpu.ops.pallas_fused import (
            _fused_rec_fwd,
        )

        _, lat, w_in, w_rec = _data(3)
        cfg_cls = ALIFConfig if alif else LIFConfig
        cfg = cfg_cls(input_size=F, output_size=H)
        beta = cfg.beta if alif else 0.0
        rho = cfg.rho if alif else 0.0
        z = fused_encode_rec_scan(
            lat, w_in, w_rec, beta, T, False, alif, cfg.alpha, rho,
            cfg.threshold, cfg.gamma, SpikeFuncType.FastSigmoid, True,
        )
        z_trained, _ = _fused_rec_fwd(
            lat, w_in, w_rec, beta, T, False, alif, cfg.alpha, rho,
            cfg.threshold, cfg.gamma, SpikeFuncType.FastSigmoid, True,
        )
        np.testing.assert_array_equal(np.asarray(z), np.asarray(z_trained))


@pytest.mark.parametrize("n_steps", [12, 24], ids=["T12-1block", "T24-2blocks"])
@pytest.mark.parametrize("rec", [True, False], ids=["rec", "ff"])
def test_fused_izh_head_stacked_matches_unrolled(rec, n_steps):
    """The Izhikevich head kernel's stacked-replica grid (leading S axis,
    one pallas_call for the whole ensemble) must be BITWISE identical to
    S unrolled head calls -- logits and every weight gradient, per
    replica (the LIF/ALIF stacked contract, extended to Izhikevich)."""
    from snnimageclassification_tpu.ops.cells import IzhikevichConfig
    from snnimageclassification_tpu.ops.pallas_fused_izh import (
        fused_encode_izh_scan_head,
    )
    from snnimageclassification_tpu.ops.pallas_izh import izh_kernel_params

    S = 3
    rng = np.random.default_rng(31)
    pixels = rng.random((B, F)).astype(np.float32)
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(n_steps))
    w_in = jnp.asarray(
        (3e6 * rng.standard_normal((S, F, H))).astype(np.float32)
    )
    w_rec = (
        jnp.asarray(
            (5e5 * rng.standard_normal((S, H, H))).astype(np.float32)
            * (1 - np.eye(H, dtype=np.float32))
        )
        if rec
        else None
    )
    w_out = jnp.asarray(rng.standard_normal((S, H, O)).astype(np.float32))
    b_out = jnp.asarray(0.1 * rng.standard_normal((S, O)).astype(np.float32))
    cfg = IzhikevichConfig(input_size=F, output_size=H,
                           use_recurrent_connection=rec)
    kp = izh_kernel_params(cfg)
    y = jnp.asarray(rng.integers(0, O, B), jnp.int32)

    def nll(logits):
        return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(B), y])

    def run(wi, wr, wo, bo):  # stacked or per-replica, same entry
        return fused_encode_izh_scan_head(
            lat, wi, wr, wo, bo, kp, n_steps, False, cfg.gamma, _KAPPA,
            cfg.spike_func, True,
        )

    argn = (0, 1, 2, 3) if rec else (0, 2, 3)
    loss_s = lambda wi, wr, wo, bo: jnp.sum(jax.vmap(nll)(run(wi, wr, wo, bo)))
    lg_s = run(w_in, w_rec, w_out, b_out)
    g_s = jax.grad(loss_s, argn)(w_in, w_rec, w_out, b_out)
    assert lg_s.shape == (S, B, O)
    for i in range(S):
        wr_i = w_rec[i] if rec else None
        lg_i = run(w_in[i], wr_i, w_out[i], b_out[i])
        loss_i = lambda wi, wr, wo, bo: nll(run(wi, wr, wo, bo))
        g_i = jax.grad(loss_i, argn)(w_in[i], wr_i, w_out[i], b_out[i])
        np.testing.assert_array_equal(
            np.asarray(lg_s[i]), np.asarray(lg_i),
            err_msg=f"izh-stacked logits replica {i}",
        )
        for gs, gi, nm in zip(g_s, g_i, ("w_in", "w_rec", "w_out", "b_out")
                              if rec else ("w_in", "w_out", "b_out")):
            np.testing.assert_array_equal(
                np.asarray(gs[i]), np.asarray(gi),
                err_msg=f"izh-stacked grad {nm} replica {i}",
            )


def test_bf16_itemsize_admits_wide_recurrent():
    """bf16 matmul weights halve the kernel's resident bytes: recurrent
    H=1024 -- gated OFF to XLA at f32 (8.4 MB of weights) -- is admitted
    at itemsize=2 with an in-budget shrunk tile, so the TPU-natural
    "grow the hidden dim" axis keeps the fused path under the bf16
    recipe.  Covers the gate arithmetic (fused_supported /
    fused_head_supported both route through it) and the kernel numerics
    at the admitted shape: the bf16-recipe invariant (spikes bitwise
    equal to an f32 run on the same bf16-representable weights) must
    hold across MULTIPLE shrunk batch tiles."""
    from snnimageclassification_tpu.ops.pallas_fused import (
        _MAX_BLOCK_B,
        _WLAT_BUDGET,
        _weight_bytes,
        _wlat_fit_bb,
    )

    f_pad = 896  # F=784 padded
    for itemsize, o_pad, expect in (
        (4, 128, False),  # f32 head: default budget insufficient
        (2, 128, True),   # bf16 head: fits the default budget
        (4, 0, False),    # f32 layer-0: default budget insufficient
        (2, 0, True),     # bf16 layer-0: fits the default budget
    ):
        w_bytes = _weight_bytes(f_pad, 1024, True, o_pad, itemsize=itemsize)
        bb = _wlat_fit_bb(_MAX_BLOCK_B, f_pad, w_bytes)
        fits = w_bytes + 2 * bb * f_pad * 4 <= _WLAT_BUDGET
        assert fits == expect, (itemsize, o_pad, bb)
    # Round 5: shapes past the default budget no longer gate off -- the
    # f32 WIDE regime admits them through the raised-limit accounting
    # (_wlat_ok + _WIDE_F32_BUDGET), at the floor batch tile.
    import unittest.mock as mock

    import snnimageclassification_tpu.ops.pallas_fused as pf

    with mock.patch.object(pf.jax, "default_backend", lambda: "tpu"):
        assert pf.fused_supported(50, 784, 1024, True, itemsize=4)
        assert pf.fused_head_supported(50, 784, 1024, 10, True, itemsize=4)
        assert not pf.fused_supported(50, 8192, 4096, True, itemsize=4)

    H2, T2, B2 = 1024, 6, 256  # bb shrinks to 128 -> 2 tiles at B=256
    rng = np.random.default_rng(77)
    pixels2 = rng.random((B2, F)).astype(np.float32)
    lat2 = pixels_to_firing_periods(jnp.asarray(pixels2), t_max=float(T2))
    w_in16 = jnp.asarray(
        0.5 * rng.standard_normal((F, H2)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w_rec16 = jnp.asarray(
        (0.3 * rng.standard_normal((H2, H2))).astype(np.float32)
        * (1 - np.eye(H2, dtype=np.float32))
    ).astype(jnp.bfloat16)
    cfg = ALIFConfig(input_size=F, output_size=H2)
    args = (1.6, T2, False, True, cfg.alpha, cfg.rho, cfg.threshold,
            cfg.gamma, SpikeFuncType.FastSigmoid, True)

    def run(wi, wr):
        return fused_encode_rec_scan(lat2, wi, wr, *args)

    z32 = run(w_in16.astype(jnp.float32), w_rec16.astype(jnp.float32))
    z16 = run(w_in16, w_rec16)
    assert z16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(z16.astype(jnp.float32)), np.asarray(z32)
    )


def test_wide_k_shrink_preserves_numerics(monkeypatch):
    """The wide-shape time-block shrink (_wide_max_k: wide resident
    weights + f32 grad accumulators squeeze the revolving trace blocks,
    so K shrinks instead of Mosaic VMEM-OOMing) is a pure re-blocking of
    the grid: logits and every gradient must be BITWISE identical to the
    default-K run.  Forced here on a small shape via monkeypatch so the
    shrunken multi-block path (K=3, 4 blocks at T=12) runs in interpret
    mode."""
    import snnimageclassification_tpu.ops.pallas_fused as pf

    # Gate arithmetic at the real wide shapes first.
    assert pf._wide_max_k(784, 128, True, True, 10, 4) == 16   # flagship
    assert pf._wide_max_k(784, 512, True, True, 10, 4) == 16   # round-3 max
    k_wide = pf._wide_max_k(784, 1024, True, True, 10, 2)      # bf16 wide
    assert 1 <= k_wide < 16, k_wide
    # f32 wide (round 5): admitted through the raised-limit budget at the
    # PINNED _WIDE_F32_BB tile (the first cut budgeted at the 8-row
    # sublane floor, which measured 0.35x of XLA) -- must come back with
    # a usable time block, and the round-4 bf16-wide K must be UNCHANGED
    # by the new budget tier.
    assert pf._wide_max_k(784, 1024, True, True, 10, 4) == 3
    assert k_wide == 4, k_wide  # calibrated round-4 value

    n_steps = 12
    rng = np.random.default_rng(13)
    pixels = rng.random((B, F)).astype(np.float32)
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(n_steps))
    w_in = jnp.asarray(0.5 * rng.standard_normal((F, H)).astype(np.float32))
    w_rec = jnp.asarray(
        (0.3 * rng.standard_normal((H, H))).astype(np.float32)
        * (1 - np.eye(H, dtype=np.float32))
    )
    w_out = jnp.asarray(rng.standard_normal((H, O)).astype(np.float32))
    b_out = jnp.asarray(0.1 * rng.standard_normal((O,)).astype(np.float32))
    cfg = ALIFConfig(input_size=F, output_size=H)
    y = jnp.asarray(rng.integers(0, O, B), jnp.int32)
    common = (n_steps, False, True, cfg.alpha, cfg.rho, cfg.threshold,
              cfg.gamma, _KAPPA, SpikeFuncType.FastSigmoid, True)

    def loss(wi, wr, wo, bo):
        lg = fused_encode_rec_scan_head(lat, wi, wr, cfg.beta, wo, bo,
                                        *common)
        return -jnp.mean(jax.nn.log_softmax(lg)[jnp.arange(B), y])

    val = jax.value_and_grad(loss, (0, 1, 2, 3))
    l_def, g_def = val(w_in, w_rec, w_out, b_out)
    monkeypatch.setattr(pf, "_wide_max_k", lambda *a: 3)
    l_k3, g_k3 = val(w_in, w_rec, w_out, b_out)
    np.testing.assert_array_equal(np.asarray(l_def), np.asarray(l_k3))
    for a, b_, nm in zip(g_def, g_k3, ("w_in", "w_rec", "w_out", "b_out")):
        if nm == "b_out":
            # g_b sums its per-K-block s-block partials, so re-blocking
            # reassociates the f32 reduction: last-ulp differences only.
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=0, atol=5e-7,
                err_msg="K-shrink grad b_out",
            )
        else:
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b_), err_msg=f"K-shrink grad {nm}"
            )


def test_wide_shape_plans_pinned():
    """(K, batch-tile) plan regression for the calibrated shapes.

    The f32-wide tile is pinned at _WIDE_F32_BB -- the first round-5 cut
    let _wlat_fit_bb collapse it to the 8-row sublane floor (weights
    alone exceed its budget at any tile), which measured 0.35x of XLA on
    the latency-bound serial chain; the fixed plan (K=2, bb=64) measured
    1.45x (PARITY.md).  Every previously-validated plan must be
    byte-identical."""
    import snnimageclassification_tpu.ops.pallas_fused as pf

    def plan(H, dtype, T=50, B=4096):
        itemsize = jnp.dtype(dtype).itemsize
        K = pf._time_block(
            T, pf._wide_max_k(784, H, True, True, 10, itemsize)
        )
        w = jnp.zeros((784, H), dtype)
        *_, bb = pf._shapes(B, w, 784, K, head=True, recurrent=True,
                            n_out=10)
        return K, bb

    assert plan(1024, jnp.float32) == (2, 64)    # round-5 f32 wide
    assert plan(1024, jnp.bfloat16) == (2, 64)   # round-4 bf16 wide
    assert plan(128, jnp.float32, T=100, B=8192) == (10, 128)  # flagship
    assert plan(512, jnp.float32, T=100, B=8192) == (10, 32)   # round-3 max
