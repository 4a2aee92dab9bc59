"""Deep-network fused-head dispatch (models/snn.py): the trunk `_upto`
contract, the `_deep_head_fusible` gate, numeric equivalence of the
mid-head dispatch vs the composed XLA path (kernels in interpret mode),
the loud compute_dtype fallback, and explain_dispatch."""
import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import snnimageclassification_tpu.models.snn as msnn
import snnimageclassification_tpu.ops.pallas_fused_mid as pfm
from snnimageclassification_tpu import models
from snnimageclassification_tpu.data.datasets import EncodeConfig
from snnimageclassification_tpu.models.config import SNNConfig

F, H1, H2, O, T, B = 30, 24, 16, 7, 10, 6


def _cfg(hidden=(H1, H2), **kw):
    kw.setdefault("hidden_layer_type", "ALIF")
    kw.setdefault("use_recurrent_connection", True)
    return SNNConfig(
        input_size=F, output_size=O, n_hidden_neurons=hidden,
        int_time_steps=T, **kw,
    )


def _data(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((B, F)), jnp.float32)


class TestTrunkUpto:
    """apply(..., _upto=k) returns the time-major trace of layer k,
    identical to the full forward's layer-k output."""

    @pytest.mark.parametrize("upto", [0, 1])
    def test_trunk_matches_hidden_trace(self, upto):
        cfg = _cfg()
        params = models.init(cfg, jax.random.PRNGKey(0))
        x = _data()
        # Oracle: full forward with hidden traces; layer z trace is the
        # first state leaf? No -- use the layer OUTPUT via return_hidden
        # being state tuples; instead rerun with a truncated stack by
        # consuming the z trace from apply's own XLA path.
        name = cfg.layer_configs[upto][0]
        trace, hidden = msnn.apply(cfg, params, x, return_hidden=True)
        x_tm = msnn.apply(cfg, params, x, _upto=upto)
        assert x_tm.shape == (T, B, cfg.layer_configs[upto][1].output_size)
        # z is a pure function of the hidden state: recompute the oracle
        # z from state leaves is layer-specific; instead compare against
        # a second _upto run through a DIFFERENT entry (apply_pixels
        # non-timeseries path) for determinism, and against the full
        # model's downstream equality in TestDeepDispatch below.
        x_tm2 = msnn.apply_pixels(
            cfg, params, x, EncodeConfig(n_steps=T, as_timeseries=False),
            _upto=upto,
        )
        np.testing.assert_array_equal(np.asarray(x_tm), np.asarray(x_tm2))
        del trace, hidden, name

    def test_trunk_counts(self):
        cfg = _cfg()
        params = models.init(cfg, jax.random.PRNGKey(0))
        x = _data()
        x_tm, counts = msnn.apply(
            cfg, params, x, _upto=0, return_spike_counts=True
        )
        _, _, counts_full = msnn.apply(
            cfg, params, x, return_spike_counts=True
        )
        name0 = cfg.layer_configs[0][0]
        assert set(counts) == {name0}
        np.testing.assert_array_equal(
            np.asarray(counts[name0]), np.asarray(counts_full[name0])
        )
        np.testing.assert_array_equal(
            np.asarray(counts[name0]),
            np.asarray(jnp.sum(x_tm, axis=0)),
        )


class TestDeepGate:
    def test_gate_off_on_cpu(self):
        assert not msnn._deep_head_fusible(_cfg(), EncodeConfig(n_steps=T))

    def test_gate_requires_three_layers(self, monkeypatch):
        monkeypatch.setattr(
            pfm.jax, "default_backend", lambda: "tpu", raising=True
        )
        enc = EncodeConfig(n_steps=T)
        assert msnn._deep_head_fusible(_cfg(), enc)
        assert msnn._deep_head_fusible(_cfg(hidden=(H1, H1, H2)), enc)
        # single hidden layer -> the whole-network head owns it instead
        assert not msnn._deep_head_fusible(_cfg(hidden=H1), enc)
        # Izhikevich last hidden: no mid-head kernel
        assert not msnn._deep_head_fusible(
            _cfg(hidden_layer_type="Izhikevich"), enc
        )
        # non-max readout
        assert not msnn._deep_head_fusible(
            _cfg(readout_mth="TEMPORAL_FILTER"), enc
        )

    def test_gate_respects_compute_dtype(self, monkeypatch):
        monkeypatch.setattr(
            pfm.jax, "default_backend", lambda: "tpu", raising=True
        )
        assert not msnn._deep_head_fusible(
            _cfg(compute_dtype="bfloat16"), EncodeConfig(n_steps=T)
        )


def _interpret_mid_head(monkeypatch):
    """Route the model's mid-head calls through interpret mode (CPU)."""
    for nm in (
        "fused_mid_rec_scan_head",
        "fused_mid_ff_scan_head",
        "fused_mid_rec_scan_head_counts",
        "fused_mid_ff_scan_head_counts",
    ):
        real = getattr(pfm, nm)
        monkeypatch.setattr(
            pfm, nm, (lambda r: lambda *a: r(*a, True))(real)
        )


class TestDeepDispatch:
    """The deep path (trunk + mid-head kernel) must match the composed
    apply_pixels -> prediction_logits forward exactly (up to f32
    tile-summation order in the readout matmul)."""

    @pytest.mark.parametrize("rec", [True, False], ids=["rec", "ff"])
    @pytest.mark.parametrize("hidden", [(H1, H2), (H1, H1, H2)],
                             ids=["2-hidden", "3-hidden"])
    def test_logits_match_composed(self, monkeypatch, rec, hidden):
        cfg = _cfg(hidden=hidden, use_recurrent_connection=rec)
        enc = EncodeConfig(n_steps=T)
        params = models.init(cfg, jax.random.PRNGKey(1))
        x = _data(1)
        ref = msnn.prediction_logits(
            cfg, msnn.apply_pixels(cfg, params, x, enc)[0]
        )
        _interpret_mid_head(monkeypatch)
        monkeypatch.setattr(msnn, "_deep_head_fusible", lambda c, e: True)
        got = msnn.forward_logits_pixels(cfg, params, x, enc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

    def test_counts_match_composed(self, monkeypatch):
        cfg = _cfg()
        enc = EncodeConfig(n_steps=T)
        params = models.init(cfg, jax.random.PRNGKey(2))
        x = _data(2)
        trace, _, counts_ref = msnn.apply_pixels(
            cfg, params, x, enc, return_spike_counts=True
        )
        ref_logits = msnn.prediction_logits(cfg, trace)
        _interpret_mid_head(monkeypatch)
        monkeypatch.setattr(msnn, "_deep_head_fusible", lambda c, e: True)
        logits, counts = msnn.forward_logits_counts_pixels(
            cfg, params, x, enc
        )
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(ref_logits), atol=1e-5)
        assert set(counts) == set(counts_ref)
        for k in counts_ref:
            np.testing.assert_array_equal(
                np.asarray(counts[k]), np.asarray(counts_ref[k]),
            )

    def test_grads_match_composed(self, monkeypatch):
        cfg = _cfg()
        enc = EncodeConfig(n_steps=T)
        params = models.init(cfg, jax.random.PRNGKey(3))
        x = _data(3)

        def loss_ref(p):
            trace, _ = msnn.apply_pixels(cfg, p, x, enc)
            return jnp.sum(msnn.prediction_logits(cfg, trace) ** 2)

        g_ref = jax.grad(loss_ref)(params)
        _interpret_mid_head(monkeypatch)
        monkeypatch.setattr(msnn, "_deep_head_fusible", lambda c, e: True)

        def loss_deep(p):
            return jnp.sum(msnn.forward_logits_pixels(cfg, p, x, enc) ** 2)

        g_deep = jax.grad(loss_deep)(params)
        flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
        flat_deep = jax.tree_util.tree_leaves(g_deep)
        for (path, a), b in zip(flat_ref, flat_deep):
            scale = max(float(jnp.max(jnp.abs(a))), 1e-12)
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=2e-5,
                err_msg=str(path),
            )
        # Q3: the learnable-beta leaves stay identically zero.
        for name, group in g_deep.items():
            if "beta" in group:
                assert float(jnp.linalg.norm(group["beta"])) == 0.0


class TestLoudFallbacks:
    def test_compute_dtype_warns_once(self, monkeypatch, caplog):
        monkeypatch.setattr(msnn, "_on_tpu", lambda: True)
        msnn._fallback_logged.clear()
        cfg = _cfg(hidden=H1, compute_dtype="bfloat16")
        enc = EncodeConfig(n_steps=T)
        with caplog.at_level(logging.WARNING,
                             logger="snnimageclassification_tpu.models.snn"):
            assert not msnn._head_fusible(cfg, enc)
            assert not msnn._head_fusible(cfg, enc)
            assert not msnn._pallas_layer_eligible(
                cfg, cfg.layer_configs[0][1], False
            )
        warn = [r for r in caplog.records if r.levelno == logging.WARNING]
        assert len(warn) == 2  # head gate + layer gate, each once
        assert all("bf16 recipe" in r.message for r in warn)

    def test_return_hidden_logs(self, monkeypatch, caplog):
        monkeypatch.setattr(msnn, "_on_tpu", lambda: True)
        msnn._fallback_logged.clear()
        cfg = _cfg()
        with caplog.at_level(logging.INFO,
                             logger="snnimageclassification_tpu.models.snn"):
            assert not msnn._pallas_layer_eligible(
                cfg, cfg.layer_configs[0][1], True
            )
        assert any("return_hidden" in r.message for r in caplog.records)


class TestExplainDispatch:
    def test_cpu_all_xla(self):
        entries = msnn.explain_dispatch(_cfg(), EncodeConfig(n_steps=T))
        assert len(entries) == 3
        assert all(e["path"] == "xla:scan" for e in entries)
        assert all("not TPU" in e["reason"] for e in entries)

    def test_tpu_single_hidden_head(self, monkeypatch):
        self._patch_tpu(monkeypatch)
        entries = msnn.explain_dispatch(_cfg(hidden=H1),
                                        EncodeConfig(n_steps=T))
        assert len(entries) == 1
        assert entries[0]["path"] == "pallas:whole-network-head"

    def test_tpu_deep(self, monkeypatch):
        self._patch_tpu(monkeypatch)
        entries = msnn.explain_dispatch(_cfg(hidden=(H1, H1, H2)),
                                        EncodeConfig(n_steps=T))
        paths = [e["path"] for e in entries]
        assert paths == [
            "pallas:fused-encode-layer0", "pallas:fused-mid",
            "pallas:mid-head",
        ]

    def test_bf16_compute_reason(self, monkeypatch):
        self._patch_tpu(monkeypatch)
        entries = msnn.explain_dispatch(
            _cfg(compute_dtype="bfloat16"), EncodeConfig(n_steps=T)
        )
        assert all(e["path"] == "xla:scan" for e in entries)
        assert "bf16 recipe" in entries[0]["reason"]

    @staticmethod
    def _patch_tpu(monkeypatch):
        import snnimageclassification_tpu.ops.pallas_encode as pe
        import snnimageclassification_tpu.ops.pallas_fused as pf
        import snnimageclassification_tpu.ops.pallas_scan as ps

        monkeypatch.setattr(msnn, "_on_tpu", lambda: True)
        for mod in (pf, pfm, pe, ps):
            monkeypatch.setattr(mod.jax, "default_backend", lambda: "tpu")
