"""Two-layer whole-network kernel pair (ops/pallas_fused2.py): numeric
parity vs the composed fused dispatch (layer-0 fused + mid-head), the
software-pipelined multi-block path, counts variants, Q3 beta freezing,
inference-primal equality, and the model-level `_twolayer_head_fusible`
dispatch.  Kernels run in interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import snnimageclassification_tpu.models.snn as msnn
import snnimageclassification_tpu.ops.pallas_fused2 as pf2
from snnimageclassification_tpu import models
from snnimageclassification_tpu.data.datasets import EncodeConfig
from snnimageclassification_tpu.models.config import SNNConfig
from snnimageclassification_tpu.ops.encoding import pixels_to_firing_periods
from snnimageclassification_tpu.ops.pallas_fused import (
    fused_encode_ff_scan,
    fused_encode_rec_scan,
)
from snnimageclassification_tpu.ops.pallas_fused_mid import (
    fused_mid_ff_scan_head,
    fused_mid_rec_scan,
    fused_mid_rec_scan_head,
)
from snnimageclassification_tpu.ops.surrogate import SpikeFuncType

B, F, H1, H2, O = 24, 40, 16, 24, 10
ALPHA, RHO, THR, GAMMA, KAPPA = 0.9, 0.85, 1.0, 0.3, 0.8


def _weights(seed=7):
    rng = np.random.default_rng(seed)
    pixels = rng.random((B, F)).astype(np.float32)
    w0 = jnp.asarray(0.7 * rng.standard_normal((F, H1)).astype(np.float32))
    w0r = jnp.asarray(
        (0.4 * rng.standard_normal((H1, H1))).astype(np.float32)
        * (1 - np.eye(H1, dtype=np.float32))
    )
    w1 = jnp.asarray(0.6 * rng.standard_normal((H1, H2)).astype(np.float32))
    w1r = jnp.asarray(
        (0.4 * rng.standard_normal((H2, H2))).astype(np.float32)
        * (1 - np.eye(H2, dtype=np.float32))
    )
    wo = jnp.asarray(rng.standard_normal((H2, O)).astype(np.float32))
    bo = jnp.asarray(0.1 * rng.standard_normal((O,)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, O, B), jnp.int32)
    return pixels, w0, w0r, w1, w1r, wo, bo, y


def _run_pair(T, alif, rec, use_periods, sf):
    """(merged loss, logits, grads), (composed loss, logits, grads)."""
    pixels, w0, w0r, w1, w1r, wo, bo, y = _weights()
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(T))
    b0, b1 = 0.7, 0.5

    def loss_merged(w0, w0r, w1, w1r, wo, bo):
        if rec:
            lg = pf2.fused2_rec_head(
                lat, w0, w0r, b0, w1, w1r, b1, wo, bo, T, use_periods,
                alif, ALPHA, RHO, THR, GAMMA, KAPPA, sf, True,
            )
        else:
            lg = pf2.fused2_ff_head(
                lat, w0, b0, w1, b1, wo, bo, T, use_periods, alif,
                ALPHA, RHO, THR, GAMMA, KAPPA, sf, True,
            )
        return -jnp.mean(jax.nn.log_softmax(lg)[jnp.arange(B), y]), lg

    def loss_composed(w0, w0r, w1, w1r, wo, bo):
        if rec:
            z0 = fused_encode_rec_scan(
                lat, w0, w0r, b0, T, use_periods, alif, ALPHA, RHO, THR,
                GAMMA, sf, True,
            )
            lg = fused_mid_rec_scan_head(
                z0, w1, w1r, b1, wo, bo, T, alif, ALPHA, RHO, THR,
                GAMMA, KAPPA, sf, True,
            )
        else:
            z0 = fused_encode_ff_scan(
                lat, w0, b0, T, use_periods, alif, ALPHA, RHO, THR,
                GAMMA, sf, True,
            )
            lg = fused_mid_ff_scan_head(
                z0, w1, b1, wo, bo, T, alif, ALPHA, RHO, THR, GAMMA,
                KAPPA, sf, True,
            )
        return -jnp.mean(jax.nn.log_softmax(lg)[jnp.arange(B), y]), lg

    vg = jax.value_and_grad(loss_merged, (0, 1, 2, 3, 4, 5), has_aux=True)
    (lm, lgm), gm = vg(w0, w0r, w1, w1r, wo, bo)
    vg = jax.value_and_grad(loss_composed, (0, 1, 2, 3, 4, 5), has_aux=True)
    (lc, lgc), gc = vg(w0, w0r, w1, w1r, wo, bo)
    return (lm, lgm, gm), (lc, lgc, gc)


# T=6: single block + drain; T=20: K=10, nb=2 (one full pipeline
# handover); T=48: K=16, nb=3 (steady-state pipeline step exists).
@pytest.mark.parametrize("T", [6, 20, 48])
@pytest.mark.parametrize("alif", [True, False], ids=["alif", "lif"])
@pytest.mark.parametrize("rec", [True, False], ids=["rec", "ff"])
def test_matches_composed_fused(T, alif, rec):
    (lm, lgm, gm), (lc, lgc, gc) = _run_pair(
        T, alif, rec, False, SpikeFuncType.FastSigmoid
    )
    np.testing.assert_array_equal(np.asarray(lgm), np.asarray(lgc))
    for a, b, nm in zip(gm, gc, ("w0", "w0r", "w1", "w1r", "wo", "bo")):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=0, atol=1e-5 * max(1.0, np.abs(b).max()),
            err_msg=f"grad {nm}",
        )


@pytest.mark.parametrize("case", ["periodic", "phi_alif", "phi_lif"])
def test_matches_composed_variants(case):
    use_periods = case == "periodic"
    alif = case != "phi_lif"
    sf = (
        SpikeFuncType.FastSigmoid if case == "periodic"
        else SpikeFuncType.Phi
    )
    (lm, lgm, gm), (lc, lgc, gc) = _run_pair(20, alif, True, use_periods, sf)
    np.testing.assert_array_equal(np.asarray(lgm), np.asarray(lgc))
    for a, b, nm in zip(gm, gc, ("w0", "w0r", "w1", "w1r", "wo", "bo")):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=0, atol=1e-5 * max(1.0, np.abs(b).max()),
            err_msg=f"grad {nm}",
        )


def test_counts_bitwise_and_grads():
    T = 20
    pixels, w0, w0r, w1, w1r, wo, bo, y = _weights(3)
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(T))
    args = (T, False, True, ALPHA, RHO, THR, GAMMA, KAPPA,
            SpikeFuncType.FastSigmoid, True)
    lg_plain = pf2.fused2_rec_head(
        lat, w0, w0r, 0.7, w1, w1r, 0.5, wo, bo, *args
    )
    lg_c, (c0, c1) = pf2.fused2_rec_head_counts(
        lat, w0, w0r, 0.7, w1, w1r, 0.5, wo, bo, *args
    )
    z0 = fused_encode_rec_scan(
        lat, w0, w0r, 0.7, T, False, True, ALPHA, RHO, THR, GAMMA,
        SpikeFuncType.FastSigmoid, True,
    )
    z1 = fused_mid_rec_scan(
        z0, w1, w1r, 0.5, T, True, ALPHA, RHO, THR, GAMMA,
        SpikeFuncType.FastSigmoid, True,
    )
    np.testing.assert_array_equal(np.asarray(lg_plain), np.asarray(lg_c))
    np.testing.assert_array_equal(
        np.asarray(c0), np.asarray(jnp.sum(z0.astype(jnp.float32), axis=0))
    )
    np.testing.assert_array_equal(
        np.asarray(c1), np.asarray(jnp.sum(z1.astype(jnp.float32), axis=0))
    )

    def loss_c(w0_, w1_):
        lg, (cc0, cc1) = pf2.fused2_rec_head_counts(
            lat, w0_, w0r, 0.7, w1_, w1r, 0.5, wo, bo, *args
        )
        return (
            -jnp.mean(jax.nn.log_softmax(lg)[jnp.arange(B), y])
            + 1e-3 * (jnp.sum(cc0 ** 2) + jnp.sum(cc1 ** 2))
        )

    def loss_ref(w0_, w1_):
        z0_ = fused_encode_rec_scan(
            lat, w0_, w0r, 0.7, T, False, True, ALPHA, RHO, THR, GAMMA,
            SpikeFuncType.FastSigmoid, True,
        )
        z1_ = fused_mid_rec_scan(
            z0_, w1_, w1r, 0.5, T, True, ALPHA, RHO, THR, GAMMA,
            SpikeFuncType.FastSigmoid, True,
        )
        lg = fused_mid_rec_scan_head(
            z0_, w1_, w1r, 0.5, wo, bo, T, True, ALPHA, RHO, THR, GAMMA,
            KAPPA, SpikeFuncType.FastSigmoid, True,
        )
        cc0 = jnp.sum(z0_.astype(jnp.float32), axis=0)
        cc1 = jnp.sum(z1_.astype(jnp.float32), axis=0)
        return (
            -jnp.mean(jax.nn.log_softmax(lg)[jnp.arange(B), y])
            + 1e-3 * (jnp.sum(cc0 ** 2) + jnp.sum(cc1 ** 2))
        )

    gm = jax.grad(loss_c, (0, 1))(w0, w1)
    gr = jax.grad(loss_ref, (0, 1))(w0, w1)
    for a, b, nm in zip(gm, gr, ("w0", "w1")):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=0, atol=1e-5 * max(1.0, np.abs(b).max()),
            err_msg=f"counts grad {nm}",
        )


def test_beta_zero_cotangent():
    """Q3: both layers' beta cotangents are identically zero."""
    T = 12
    pixels, w0, w0r, w1, w1r, wo, bo, y = _weights(5)
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(T))

    def loss(b0, b1):
        lg = pf2.fused2_rec_head(
            lat, w0, w0r, b0, w1, w1r, b1, wo, bo, T, False, True,
            ALPHA, RHO, THR, GAMMA, KAPPA, SpikeFuncType.FastSigmoid, True,
        )
        return jnp.sum(lg ** 2)

    g0, g1 = jax.grad(loss, (0, 1))(jnp.float32(0.7), jnp.float32(0.5))
    assert float(g0) == 0.0 and float(g1) == 0.0


def test_inference_primal_bitwise():
    """The primal (store_traces=False, no residual writes) must produce
    logits bitwise equal to the vjp forward."""
    T = 20
    pixels, w0, w0r, w1, w1r, wo, bo, y = _weights(9)
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=float(T))
    args = (T, False, True, ALPHA, RHO, THR, GAMMA, KAPPA,
            SpikeFuncType.FastSigmoid, True)
    primal = pf2.fused2_rec_head(
        lat, w0, w0r, 0.7, w1, w1r, 0.5, wo, bo, *args
    )
    train_fwd, _ = jax.vjp(
        lambda a, b: pf2.fused2_rec_head(
            lat, a, w0r, 0.7, b, w1r, 0.5, wo, bo, *args
        ),
        w0, w1,
    )
    np.testing.assert_array_equal(np.asarray(primal), np.asarray(train_fwd))


class TestTwolayerGate:
    def _cfg(self, hidden=(H1, H2), **kw):
        kw.setdefault("hidden_layer_type", "ALIF")
        kw.setdefault("use_recurrent_connection", True)
        return SNNConfig(
            input_size=F, output_size=O, n_hidden_neurons=hidden,
            int_time_steps=10, **kw,
        )

    def test_gate_off_on_cpu(self):
        assert not msnn._twolayer_head_fusible(
            self._cfg(), EncodeConfig(n_steps=10)
        )

    def test_gate_shapes_and_types(self, monkeypatch):
        monkeypatch.setattr(
            pf2.jax, "default_backend", lambda: "tpu", raising=True
        )
        enc = EncodeConfig(n_steps=10)
        assert msnn._twolayer_head_fusible(self._cfg(), enc)
        assert msnn._twolayer_head_fusible(
            self._cfg(hidden_layer_type="LIF"), enc
        )
        # exactly two hidden layers
        assert not msnn._twolayer_head_fusible(self._cfg(hidden=H1), enc)
        assert not msnn._twolayer_head_fusible(
            self._cfg(hidden=(H1, H1, H2)), enc
        )
        # Izhikevich has no fused2 kernel
        assert not msnn._twolayer_head_fusible(
            self._cfg(hidden_layer_type="Izhikevich"), enc
        )
        # non-max readout / mismatched encoding length
        assert not msnn._twolayer_head_fusible(
            self._cfg(readout_mth="TEMPORAL_FILTER"), enc
        )
        assert not msnn._twolayer_head_fusible(
            self._cfg(), EncodeConfig(n_steps=7)
        )
        # compute_dtype gate
        assert not msnn._twolayer_head_fusible(
            self._cfg(compute_dtype="bfloat16"), enc
        )

    def test_explain_dispatch_reports_pair(self, monkeypatch):
        monkeypatch.setattr(
            pf2.jax, "default_backend", lambda: "tpu", raising=True
        )
        out = msnn.explain_dispatch(self._cfg(), EncodeConfig(n_steps=10))
        assert len(out) == 1
        assert out[0]["path"] == "pallas:whole-network-head-2"


def _interpret_fused2(monkeypatch):
    for nm in (
        "fused2_rec_head",
        "fused2_ff_head",
        "fused2_rec_head_counts",
        "fused2_ff_head_counts",
    ):
        real = getattr(pf2, nm)
        monkeypatch.setattr(pf2, nm, (lambda r: lambda *a: r(*a, True))(real))


class TestTwolayerDispatch:
    """forward_logits_pixels / forward_logits_counts_pixels on a
    two-hidden-layer config must match the composed XLA forward."""

    def _setup(self, monkeypatch, rec=True, seed=1):
        cfg = SNNConfig(
            input_size=F, output_size=O, n_hidden_neurons=(H1, H2),
            hidden_layer_type="ALIF", use_recurrent_connection=rec,
            int_time_steps=10, learn_beta=True,
        )
        enc = EncodeConfig(n_steps=10)
        params = models.init(cfg, jax.random.PRNGKey(seed))
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.random((B, F)), jnp.float32)
        _interpret_fused2(monkeypatch)
        monkeypatch.setattr(msnn, "_twolayer_head_fusible",
                            lambda c, e: True)
        return cfg, enc, params, x

    @pytest.mark.parametrize("rec", [True, False], ids=["rec", "ff"])
    def test_logits_match_composed(self, monkeypatch, rec):
        cfg, enc, params, x = self._setup(monkeypatch, rec)
        ref = msnn.prediction_logits(
            cfg, msnn.apply_pixels(cfg, params, x, enc)[0]
        )
        got = msnn.forward_logits_pixels(cfg, params, x, enc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

    def test_counts_match_composed(self, monkeypatch):
        cfg, enc, params, x = self._setup(monkeypatch, seed=2)
        trace, _, counts_ref = msnn.apply_pixels(
            cfg, params, x, enc, return_spike_counts=True
        )
        ref_logits = msnn.prediction_logits(cfg, trace)
        logits, counts = msnn.forward_logits_counts_pixels(
            cfg, params, x, enc
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref_logits), atol=1e-5
        )
        assert set(counts) == set(counts_ref)
        for k in counts_ref:
            np.testing.assert_array_equal(
                np.asarray(counts[k]), np.asarray(counts_ref[k])
            )

    def test_grads_match_composed(self, monkeypatch):
        cfg, enc, params, x = self._setup(monkeypatch, seed=3)

        def loss_ref(p):
            trace, _ = msnn.apply_pixels(cfg, p, x, enc)
            return jnp.sum(msnn.prediction_logits(cfg, trace) ** 2)

        def loss_fused(p):
            return jnp.sum(msnn.forward_logits_pixels(cfg, p, x, enc) ** 2)

        g_ref = jax.grad(loss_ref)(params)
        g_f = jax.grad(loss_fused)(params)
        flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
        flat_f = jax.tree_util.tree_leaves(g_f)
        for (path, a), b in zip(flat_ref, flat_f):
            scale = max(float(jnp.max(jnp.abs(a))), 1e-12)
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=2e-5,
                err_msg=str(path),
            )
        # Q3: the learnable-beta leaves stay identically zero.
        for name, group in g_f.items():
            if "beta" in group:
                assert float(jnp.linalg.norm(group["beta"])) == 0.0
