"""Fused-path spike regularization: count-emitting kernels + count-based
regularizer objects + Trainer/TP integration.

The reference sketches spike regularizers (snn.py:401-408) that are pure
functions of per-neuron spike COUNTS; round 3 implemented them on the
trace-returning path, which disabled every Pallas kernel.  These tests pin
the count path:

* the head+counts kernel pair (ops/pallas_fused.py ``_counts`` variants)
  returns counts == sum_t z and logits identical to the plain head kernel,
  with correct gradients for a loss using BOTH outputs (interpret mode);
* ``losses.L1TotalSpikeCount/.L2SpikesPerNeuron.from_counts`` equals the
  trace-based function forms on weight-masked traces;
* ``Trainer.fit(reg_fn=<count object>)`` reproduces the trace-path fit
  exactly (CPU: both routes hit the XLA scan, so the histories match to
  float tolerance);
* the same count objects train under tensor parallelism (the round-3 ban
  is lifted): a (data, model) mesh fit matches single-device.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import snnimageclassification_tpu as st
from snnimageclassification_tpu.data.datasets import ArrayDataLoader, EncodeConfig
from snnimageclassification_tpu.models import snn as M
from snnimageclassification_tpu.ops.cells import ALIFConfig, LIFConfig, ReadoutConfig
from snnimageclassification_tpu.ops.encoding import (
    encode_spikes,
    pixels_to_firing_periods,
)
from snnimageclassification_tpu.ops.pallas_fused import (
    fused_encode_ff_scan_head_counts,
    fused_encode_rec_scan_head_counts,
)
from snnimageclassification_tpu.ops.surrogate import SpikeFuncType
from snnimageclassification_tpu.ops.temporal import temporal_max
from snnimageclassification_tpu.train import losses as L
from snnimageclassification_tpu.train.trainer import Trainer

B, F, H, O = 5, 30, 20, 10


# ---------------------------------------------------------------------------
# Regularizer objects: from_counts == function form on masked traces
# ---------------------------------------------------------------------------
class TestCountRegObjects:
    def _data(self):
        rng = np.random.default_rng(0)
        z = (rng.random((4, 7, 6)) > 0.6).astype(np.float32)  # (B, T, H)
        w = np.array([1, 1, 0, 1], np.float32)
        hidden = {"input": (rng.random((4, 7, 6)).astype(np.float32), z)}
        masked = {
            k: tuple(t * w[:, None, None] for t in v)
            for k, v in hidden.items()
        }
        counts = {"input": jnp.asarray(z.sum(axis=1))}  # (B, H)
        return masked, counts, jnp.asarray(w)

    def test_l1_matches_trace_form(self):
        masked, counts, w = self._data()
        reg = L.L1TotalSpikeCount(scale=3e-4)
        assert float(reg.from_counts(counts, w)) == pytest.approx(
            float(reg(masked)), rel=1e-6
        )
        assert float(reg.from_counts(counts, w)) == pytest.approx(
            float(L.l1_total_spike_count(masked, scale=3e-4)), rel=1e-6
        )

    def test_l2_matches_trace_form(self):
        masked, counts, w = self._data()
        reg = L.L2SpikesPerNeuron(scale=0.5)
        assert float(reg.from_counts(counts, w)) == pytest.approx(
            float(reg(masked)), rel=1e-6
        )

    def test_empty_counts(self):
        assert float(L.L1TotalSpikeCount().from_counts({}, jnp.ones(3))) == 0.0
        assert float(L.L2SpikesPerNeuron().from_counts({}, jnp.ones(3))) == 0.0

    def test_kinds(self):
        assert L.L1TotalSpikeCount().kind == "l1"
        assert L.L2SpikesPerNeuron().kind == "l2"


# ---------------------------------------------------------------------------
# Head+counts kernel pair (interpret mode)
# ---------------------------------------------------------------------------
_KAPPA = ReadoutConfig(input_size=H, output_size=O).kappa


def _composed_head_counts(pixels, w_in, w_rec, w_out, b_out, cfg,
                          use_periods, n_steps):
    """XLA reference: encode -> scan -> (readout+max logits, sum_t z)."""
    from snnimageclassification_tpu.ops.cells import (
        alif_init_state,
        alif_step,
        lif_init_state,
        lif_step,
    )

    spikes = encode_spikes(
        jnp.asarray(pixels), n_steps=n_steps, use_periods=use_periods
    )
    currents = jnp.swapaxes(spikes @ w_in, 0, 1)  # (T, B, H)
    if isinstance(cfg, ALIFConfig):
        init, step = alif_init_state(cfg, B), alif_step
    else:
        init, step = lif_init_state(cfg, B), lif_step

    def body(state, i_t):
        z, ns = step(cfg, {}, state, i_t, w_rec_eff=w_rec,
                     precomputed_input_current=True)
        return ns, z

    _, z = jax.lax.scan(body, init, currents)  # (T, B, H)
    rcur = z @ w_out + b_out

    def rbody(v, c):
        v = _KAPPA * v + c
        return v, v

    _, vr = jax.lax.scan(rbody, jnp.zeros((B, O)), rcur)
    logits = temporal_max(jnp.swapaxes(vr, 0, 1), time_axis=1)
    return logits, jnp.sum(z, axis=0)


def _run_head_counts(lat, w_in, w_rec, w_out, b_out, cfg, alif, use_periods,
                     spike_func, n_steps):
    beta = cfg.beta if alif else 0.0
    rho = cfg.rho if alif else 0.0
    common = (n_steps, use_periods, alif, cfg.alpha, rho, cfg.threshold,
              cfg.gamma, _KAPPA, spike_func, True)  # interpret=True
    if w_rec is not None:
        return fused_encode_rec_scan_head_counts(
            lat, w_in, w_rec, beta, w_out, b_out, *common
        )
    return fused_encode_ff_scan_head_counts(
        lat, w_in, beta, w_out, b_out, *common
    )


CASES = [
    ("alif-rec-2blocks", True, True, True, SpikeFuncType.FastSigmoid, 24),
    ("lif-ff-ttfs", False, False, False, SpikeFuncType.FastSigmoid, 12),
    ("alif-ff-phi-2blocks", True, False, True, SpikeFuncType.Phi, 24),
    ("lif-rec-periodic", False, True, True, SpikeFuncType.FastSigmoid, 12),
]


@pytest.mark.parametrize(
    "name,alif,rec,use_periods,spike_func,n_steps", CASES,
    ids=[c[0] for c in CASES],
)
def test_head_counts_kernel(name, alif, rec, use_periods, spike_func,
                            n_steps):
    rng = np.random.default_rng(13)
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

    ref_logits, ref_counts = _composed_head_counts(
        pixels, w_in, w_rec, w_out, b_out, cfg, use_periods, n_steps
    )
    got_logits, got_counts = _run_head_counts(
        lat, w_in, w_rec, w_out, b_out, cfg, alif, use_periods, spike_func,
        n_steps,
    )
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               atol=1e-5, rtol=1e-5)
    # Counts are integer-exact.
    np.testing.assert_array_equal(np.asarray(got_counts),
                                  np.asarray(ref_counts))

    # Gradients of a loss using BOTH outputs: NLL(logits) + l2-style
    # count penalty (exercises the count cotangent feeding dz each step).
    y = jnp.asarray(rng.integers(0, O, B), jnp.int32)
    w = jnp.asarray(np.array([1, 1, 0, 1, 1], np.float32))

    def total(logits, counts):
        nll = -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(B), y])
        return nll + 1e-3 * jnp.mean((w @ counts) ** 2) \
            + 1e-3 * jnp.sum(w @ counts)

    def loss_ref(w_in, w_rec, w_out, b_out):
        return total(*_composed_head_counts(pixels, w_in, w_rec, w_out,
                                            b_out, cfg, use_periods, n_steps))

    def loss_got(w_in, w_rec, w_out, b_out):
        return total(*_run_head_counts(lat, w_in, w_rec, w_out, b_out, cfg,
                                       alif, use_periods, spike_func,
                                       n_steps))

    if rec:
        g_ref = jax.grad(loss_ref, (0, 1, 2, 3))(w_in, w_rec, w_out, b_out)
        g_got = jax.grad(loss_got, (0, 1, 2, 3))(w_in, w_rec, w_out, b_out)
        names = ("w_in", "w_rec", "w_out", "b_out")
    else:
        g_ref = jax.grad(lambda a, c, d: loss_ref(a, None, c, d), (0, 1, 2))(
            w_in, w_out, b_out
        )
        g_got = jax.grad(lambda a, c, d: loss_got(a, None, c, d), (0, 1, 2))(
            w_in, w_out, b_out
        )
        names = ("w_in", "w_out", "b_out")
    g_atol = 2e-5 if (alif and spike_func == SpikeFuncType.Phi) else 2e-6
    for pname, a, b in zip(names, g_got, g_ref):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-12)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=g_atol,
            err_msg=f"{name} {pname}",
        )


def test_head_counts_beta_zero_cotangent():
    """Quirk Q3 survives the counts path: a traced learnable beta gets
    exactly 0 through BOTH outputs."""
    rng = np.random.default_rng(7)
    pixels = rng.random((B, F)).astype(np.float32)
    lat = pixels_to_firing_periods(jnp.asarray(pixels), t_max=12.0)
    w_in = jnp.asarray(0.5 * rng.standard_normal((F, H)).astype(np.float32))
    w_out = jnp.asarray(rng.standard_normal((H, O)).astype(np.float32))
    b_out = jnp.zeros((O,), jnp.float32)
    cfg = ALIFConfig(input_size=F, output_size=H)

    def loss(beta):
        logits, counts = fused_encode_ff_scan_head_counts(
            lat, w_in, beta, w_out, b_out, 12, True, True, cfg.alpha,
            cfg.rho, cfg.threshold, cfg.gamma, _KAPPA,
            SpikeFuncType.FastSigmoid, True,
        )
        return jnp.sum(logits) + jnp.sum(counts)

    assert float(jax.grad(loss)(jnp.asarray(1.6))) == 0.0


# ---------------------------------------------------------------------------
# Model-level count forward (XLA path on CPU)
# ---------------------------------------------------------------------------
def test_forward_logits_counts_pixels_matches_traces():
    cfg = st.SNNConfig(
        input_size=F, output_size=O, n_hidden_neurons=[12, 8],
        hidden_layer_type=st.LayerType.ALIF,
        use_recurrent_connection=True, int_time_steps=5,
    )
    params = M.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    x = rng.random((6, F)).astype(np.float32)
    enc = EncodeConfig(n_steps=5, use_periods=True)
    logits, counts = M.forward_logits_counts_pixels(cfg, params, x, enc)
    trace, hidden = M.apply_pixels(cfg, params, x, enc, return_hidden=True)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(M.prediction_logits(cfg, trace)),
        rtol=1e-6, atol=1e-7,
    )
    assert set(counts) == {"input", "hidden_0"}  # readout excluded
    for name in counts:
        z = hidden[name][-1]  # (B, T, H) z-trace
        np.testing.assert_array_equal(
            np.asarray(counts[name]), np.asarray(z.sum(axis=1))
        )


# ---------------------------------------------------------------------------
# Trainer: count-object fit == trace-function fit
# ---------------------------------------------------------------------------
def _loader(n=36, seed=0, batch=16):
    rng = np.random.default_rng(seed)
    x = rng.random((n, 16)).astype(np.float32)
    y = (np.arange(n) % 4).astype(np.int32)
    enc = EncodeConfig(n_steps=3, use_periods=False)
    return ArrayDataLoader(x, y, batch, shuffle=True, encode_config=enc)


def _cfg():
    return st.SNNConfig(
        input_size=16, output_size=4, n_hidden_neurons=8,
        hidden_layer_type=st.LayerType.ALIF,
        use_recurrent_connection=True, int_time_steps=3,
    )


class TestTrainerCountPath:
    @pytest.mark.parametrize("reg_obj,reg_fn", [
        (L.L1TotalSpikeCount(1e-4),
         lambda hs: L.l1_total_spike_count(hs, scale=1e-4)),
        (L.L2SpikesPerNeuron(1e-4),
         lambda hs: L.l2_spikes_per_neuron(hs, scale=1e-4)),
    ], ids=["l1", "l2"])
    def test_count_fit_matches_trace_fit(self, tmp_path, reg_obj, reg_fn):
        """36 % 16 != 0, so padded remainder batches exercise the w-masked
        count exactness too."""
        h_cnt = Trainer(
            _cfg(), checkpoint_folder=str(tmp_path / "cnt"), reg_fn=reg_obj,
        ).fit(_loader(), _loader(seed=1), nb_epochs=3,
              force_overwrite=True, verbose=False)
        h_tr = Trainer(
            _cfg(), checkpoint_folder=str(tmp_path / "tr"), reg_fn=reg_fn,
        ).fit(_loader(), _loader(seed=1), nb_epochs=3,
              force_overwrite=True, verbose=False)
        np.testing.assert_allclose(
            np.asarray(h_cnt["train"]), np.asarray(h_tr["train"]),
            rtol=2e-5, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(h_cnt["val"]), np.asarray(h_tr["val"]),
            rtol=2e-5, atol=1e-7,
        )

    def test_count_fit_epoch_block(self, tmp_path):
        """The count path composes with the blocked fit."""
        h1 = Trainer(
            _cfg(), checkpoint_folder=str(tmp_path / "b1"),
            reg_fn=L.L1TotalSpikeCount(1e-4),
        ).fit(_loader(), _loader(seed=1), nb_epochs=4, epoch_block=1,
              force_overwrite=True, verbose=False)
        h4 = Trainer(
            _cfg(), checkpoint_folder=str(tmp_path / "b4"),
            reg_fn=L.L1TotalSpikeCount(1e-4),
        ).fit(_loader(), _loader(seed=1), nb_epochs=4, epoch_block=4,
              force_overwrite=True, verbose=False)
        np.testing.assert_allclose(
            np.asarray(h1["train"]), np.asarray(h4["train"]), rtol=1e-6
        )


# ---------------------------------------------------------------------------
# Tensor parallelism: the reg ban is lifted for count-based objects
# ---------------------------------------------------------------------------
class TestTPRegularized:
    @pytest.fixture(scope="class")
    def mesh(self):
        from snnimageclassification_tpu.parallel.tp import make_2d_mesh

        return make_2d_mesh(2, 2)

    @pytest.mark.parametrize("reg_obj", [
        L.L1TotalSpikeCount(1e-4), L.L2SpikesPerNeuron(1e-4),
    ], ids=["l1", "l2"])
    def test_tp_reg_fit_matches_single_device(self, tmp_path, mesh, reg_obj):
        h_tp = Trainer(
            _cfg(), checkpoint_folder=str(tmp_path / "tp"), mesh=mesh,
            reg_fn=reg_obj,
        ).fit(_loader(), _loader(seed=1), nb_epochs=3,
              force_overwrite=True, verbose=False)
        h_sd = Trainer(
            _cfg(), checkpoint_folder=str(tmp_path / "sd"), reg_fn=reg_obj,
        ).fit(_loader(), _loader(seed=1), nb_epochs=3,
              force_overwrite=True, verbose=False)
        np.testing.assert_allclose(
            np.asarray(h_tp["train"]), np.asarray(h_sd["train"]),
            rtol=3e-5, atol=1e-7,
        )

    def test_trace_reg_still_rejected_under_tp(self, tmp_path, mesh):
        with pytest.raises(ValueError, match="reg"):
            Trainer(
                _cfg(), checkpoint_folder=str(tmp_path / "x"), mesh=mesh,
                reg_fn=L.l1_total_spike_count,
            )


# ---------------------------------------------------------------------------
# Izhikevich: the fused head keeps running under count regularization
# ---------------------------------------------------------------------------
class TestIzhikevichCounts:
    """Reference parity: the count collector's isinstance(LIFLayer) filter
    EXCLUDES Izhikevich (reference snn.py:268, IzhikevichLayer derives
    from RNNLayer) -- so an Izhikevich network's counts dict is EMPTY and
    a count-regularized fit must keep the fused whole-network kernel.
    The count-emitting Izhikevich head kernel itself
    (ops/pallas_fused_izh.fused_encode_izh_scan_head_counts) is a tested
    beyond-reference entry for custom objectives."""

    def _setup(self, rec, n_steps=12, seed=21):
        from snnimageclassification_tpu.ops.cells import IzhikevichConfig
        from snnimageclassification_tpu.ops.pallas_izh import (
            izh_kernel_params,
        )

        rng = np.random.default_rng(seed)
        pixels = rng.random((B, F)).astype(np.float32)
        lat = pixels_to_firing_periods(
            jnp.asarray(pixels), t_max=float(n_steps)
        )
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
        b_out = jnp.asarray(
            0.1 * rng.standard_normal((O,)).astype(np.float32)
        )
        cfg = IzhikevichConfig(input_size=F, output_size=H,
                               use_recurrent_connection=rec)
        y = jnp.asarray(rng.integers(0, O, B), jnp.int32)
        return (lat, w_in, w_rec, w_out, b_out, cfg,
                izh_kernel_params(cfg), y)

    @pytest.mark.parametrize("n_steps", [12, 24],
                             ids=["T12-1block", "T24-2blocks"])
    @pytest.mark.parametrize("rec", [True, False], ids=["rec", "ff"])
    def test_izh_head_counts_kernel(self, rec, n_steps):
        from snnimageclassification_tpu.ops.pallas_fused_izh import (
            fused_encode_izh_scan,
            fused_encode_izh_scan_head,
            fused_encode_izh_scan_head_counts,
        )

        lat, w_in, w_rec, w_out, b_out, cfg, kp, y = self._setup(rec,
                                                                 n_steps)
        kappa = ReadoutConfig(input_size=H, output_size=O).kappa
        common = (kp, n_steps, False, cfg.gamma, kappa, cfg.spike_func,
                  True)

        lg_c, counts = fused_encode_izh_scan_head_counts(
            lat, w_in, w_rec, w_out, b_out, *common
        )
        lg = fused_encode_izh_scan_head(lat, w_in, w_rec, w_out, b_out,
                                        *common)
        z = fused_encode_izh_scan(lat, w_in, w_rec, kp, n_steps, False,
                                  cfg.gamma, cfg.spike_func, True)
        np.testing.assert_array_equal(np.asarray(lg_c), np.asarray(lg))
        np.testing.assert_array_equal(
            np.asarray(counts), np.asarray(jnp.sum(z, axis=0))
        )
        assert float(jnp.sum(counts)) > 0  # the setup scale makes spikes

        def nll(logits):
            return -jnp.mean(
                jax.nn.log_softmax(logits)[jnp.arange(B), y]
            )

        scale = 1e-3

        def obj_counts(wi, wr, wo, bo):
            logits, cnts = fused_encode_izh_scan_head_counts(
                lat, wi, wr, wo, bo, *common
            )
            return nll(logits) + scale * jnp.sum(cnts ** 2)

        def obj_trace(wi, wr, wo, bo):
            logits = fused_encode_izh_scan_head(lat, wi, wr, wo, bo,
                                                *common)
            zt = fused_encode_izh_scan(lat, wi, wr, kp, n_steps, False,
                                       cfg.gamma, cfg.spike_func, True)
            return nll(logits) + scale * jnp.sum(jnp.sum(zt, axis=0) ** 2)

        argn = (0, 1, 2, 3) if rec else (0, 2, 3)
        g_c = jax.grad(obj_counts, argn)(w_in, w_rec, w_out, b_out)
        g_t = jax.grad(obj_trace, argn)(w_in, w_rec, w_out, b_out)
        for a, b_, nm in zip(
            g_c, g_t,
            ("w_in", "w_rec", "w_out", "b_out") if rec
            else ("w_in", "w_out", "b_out"),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-5, atol=1e-5,
                err_msg=f"izh counts grad {nm}",
            )

    def test_model_counts_empty_and_head_fused_routing(self, monkeypatch):
        """forward_logits_counts_pixels on a head-fusible Izhikevich
        config routes to the fused whole-network forward
        (forward_logits_pixels) with counts == {} (the reference's
        LIFLayer filter excludes Izhikevich).  Logits correctness of that
        forward is pinned by the kernel tests above and the native
        parity legs; this pins the ROUTING (previously a silent fallback
        to the composed path under count regularization)."""
        import snnimageclassification_tpu.models.snn as msnn

        monkeypatch.setattr(msnn, "_head_fusible", lambda cfg, enc: True)
        sentinel = jnp.full((B, O), 7.0)
        monkeypatch.setattr(
            msnn, "forward_logits_pixels", lambda *a, **k: sentinel
        )
        cfg = st.SNNConfig(
            input_size=F, output_size=O, n_hidden_neurons=H,
            hidden_layer_type="Izhikevich", int_time_steps=8,
        )
        from snnimageclassification_tpu import models

        params = models.init(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.random((B, F)), jnp.float32)
        enc = EncodeConfig(n_steps=8)
        logits, counts = msnn.forward_logits_counts_pixels(
            cfg, params, x, enc
        )
        assert logits is sentinel
        assert counts == {}


# ---------------------------------------------------------------------------
# Pipeline and 3-D parallelism: the reg ban is lifted for count-based
# objects (round-5 VERDICT item 2) -- shard-local weighted counts psum'd
# over the pipe (and model) axes, parallel/pp.py _pp_reg_term /
# parallel/pp3.py _pp3_reg_term.
# ---------------------------------------------------------------------------
def _cfg_deep():
    # Heterogeneous hidden widths (8, 6): l2's per-layer mean must divide
    # by each stage's REAL width, not the padded H_max.
    return st.SNNConfig(
        input_size=16, output_size=4, n_hidden_neurons=[8, 6],
        hidden_layer_type=st.LayerType.ALIF,
        use_recurrent_connection=True, int_time_steps=3,
    )


class TestPPRegularized:
    @pytest.fixture(scope="class")
    def mesh(self):
        from snnimageclassification_tpu.parallel.pp import make_pp_mesh

        return make_pp_mesh(2, 3)  # 2 hidden stages + readout

    @pytest.mark.parametrize("reg_obj", [
        L.L1TotalSpikeCount(1e-4), L.L2SpikesPerNeuron(1e-4),
    ], ids=["l1", "l2"])
    def test_pp_reg_fit_matches_single_device(self, tmp_path, mesh, reg_obj):
        h_pp = Trainer(
            _cfg_deep(), checkpoint_folder=str(tmp_path / "pp"), mesh=mesh,
            reg_fn=reg_obj, pp_n_micro=4,
        ).fit(_loader(), _loader(seed=1), nb_epochs=3,
              force_overwrite=True, verbose=False)
        h_sd = Trainer(
            _cfg_deep(), checkpoint_folder=str(tmp_path / "sd"),
            reg_fn=reg_obj,
        ).fit(_loader(), _loader(seed=1), nb_epochs=3,
              force_overwrite=True, verbose=False)
        np.testing.assert_allclose(
            np.asarray(h_pp["train"]), np.asarray(h_sd["train"]),
            rtol=3e-5, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(h_pp["val"]), np.asarray(h_sd["val"]),
            rtol=3e-5, atol=1e-7,
        )

    def test_pp_reg_loss_matches_from_counts(self, mesh):
        """One-shot loss equality: the shard-aware PP reg term equals
        criterion + reg.from_counts on the gathered counts."""
        import jax

        from snnimageclassification_tpu import models
        from snnimageclassification_tpu.parallel.pp import (
            make_pp_loss_fn,
            shard_params_pp,
        )
        from snnimageclassification_tpu.train.trainer import (
            default_criterion,
        )

        cfg = _cfg_deep()
        reg = L.L2SpikesPerNeuron(1e-4)
        params = models.init(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.random((16, 16)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 4, 16), jnp.int32)
        w = jnp.asarray(rng.random(16) > 0.2, jnp.float32)  # some zeros
        enc = EncodeConfig(n_steps=3, use_periods=False)
        stacked = shard_params_pp(mesh, cfg, params)
        loss_pp = make_pp_loss_fn(cfg, mesh, enc, n_micro=4, reg=reg)(
            stacked, x, y, w
        )
        logits, counts = msnn_forward_counts(cfg, params, x, enc)
        loss_ref = default_criterion(logits, y, w) + reg.from_counts(
            counts, w
        )
        np.testing.assert_allclose(
            float(loss_pp), float(loss_ref), rtol=3e-5
        )

    def test_trace_reg_still_rejected_under_pp(self, tmp_path, mesh):
        with pytest.raises(ValueError, match="reg"):
            Trainer(
                _cfg_deep(), checkpoint_folder=str(tmp_path / "x"),
                mesh=mesh, reg_fn=L.l1_total_spike_count, pp_n_micro=4,
            )


def msnn_forward_counts(cfg, params, x, enc):
    import snnimageclassification_tpu.models.snn as msnn

    return msnn.forward_logits_counts_pixels(cfg, params, x, enc)


class TestPP3Regularized:
    @pytest.fixture(scope="class")
    def mesh(self):
        from snnimageclassification_tpu.parallel.pp3 import make_3d_mesh

        return make_3d_mesh(2, 2, 2)  # 1 hidden stage + readout, TP=2

    @pytest.mark.parametrize("reg_obj", [
        L.L1TotalSpikeCount(1e-4), L.L2SpikesPerNeuron(1e-4),
    ], ids=["l1", "l2"])
    def test_pp3_reg_fit_matches_single_device(self, tmp_path, mesh,
                                               reg_obj):
        h_3d = Trainer(
            _cfg(), checkpoint_folder=str(tmp_path / "pp3"), mesh=mesh,
            reg_fn=reg_obj, pp_n_micro=4,
        ).fit(_loader(), _loader(seed=1), nb_epochs=3,
              force_overwrite=True, verbose=False)
        h_sd = Trainer(
            _cfg(), checkpoint_folder=str(tmp_path / "sd3"),
            reg_fn=reg_obj,
        ).fit(_loader(), _loader(seed=1), nb_epochs=3,
              force_overwrite=True, verbose=False)
        np.testing.assert_allclose(
            np.asarray(h_3d["train"]), np.asarray(h_sd["train"]),
            rtol=3e-5, atol=1e-7,
        )
