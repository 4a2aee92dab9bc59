"""Model-level tests: scan-vs-explicit-loop equivalence, input formatting
(snn.py:159-184), hidden-state layout (snn.py:186-199), readout reductions,
gradient flow, remat equivalence.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snnimageclassification_tpu.models import snn as M
from snnimageclassification_tpu.models.config import ReadoutMth, SNNConfig
from snnimageclassification_tpu.ops.cells import (
    INIT_STATE_FNS,
    STEP_FNS,
    LayerType,
    masked_recurrent,
)


def _loop_forward(cfg: SNNConfig, params, inputs):
    """Reference-style explicit Python time loop (snn.py:201-219), built on
    the same cell step functions -- the equivalence oracle for the scan."""
    x = M.format_inputs(cfg, inputs)
    batch = x.shape[0]
    layer_cfgs = cfg.layer_configs
    states = [
        INIT_STATE_FNS[type(lcfg)](lcfg, batch) for _, lcfg in layer_cfgs
    ]
    w_rec_effs = [
        masked_recurrent(lcfg, params[name])
        if getattr(lcfg, "use_recurrent_connection", False)
        else None
        for name, lcfg in layer_cfgs
    ]
    outputs = []
    for t in range(cfg.int_time_steps):
        fwd = x[:, t]
        for idx, (name, lcfg) in enumerate(layer_cfgs):
            fwd, states[idx] = STEP_FNS[type(lcfg)](
                lcfg, params[name], states[idx], fwd, w_rec_eff=w_rec_effs[idx]
            )
        outputs.append(fwd)
    return jnp.stack(outputs, axis=1)


CFGS = {
    "lif_ff": SNNConfig(
        input_size=12, output_size=4, n_hidden_neurons=8,
        hidden_layer_type=LayerType.LIF, use_recurrent_connection=False,
        int_time_steps=7,
    ),
    "alif_rec": SNNConfig(
        input_size=12, output_size=4, n_hidden_neurons=8,
        hidden_layer_type=LayerType.ALIF, use_recurrent_connection=True,
        int_time_steps=7,
    ),
    "izh_rec": SNNConfig(
        input_size=12, output_size=4, n_hidden_neurons=8,
        hidden_layer_type=LayerType.Izhikevich, use_recurrent_connection=True,
        int_time_steps=5,
    ),
    "two_hidden": SNNConfig(
        input_size=12, output_size=4, n_hidden_neurons=(8, 6),
        hidden_layer_type=LayerType.ALIF, use_recurrent_connection=True,
        int_time_steps=5, learn_beta=True,
    ),
    "no_hidden": SNNConfig(
        input_size=12, output_size=4, n_hidden_neurons=None,
        int_time_steps=5,
    ),
}


@pytest.mark.parametrize("name", list(CFGS))
def test_scan_matches_explicit_loop(name):
    cfg = CFGS[name]
    params = M.init(cfg, jax.random.PRNGKey(7))
    x = jax.random.uniform(jax.random.PRNGKey(8), (3, cfg.int_time_steps, 12))
    trace_scan, _ = M.apply(cfg, params, x)
    trace_loop = _loop_forward(cfg, params, x)
    np.testing.assert_allclose(
        np.asarray(trace_scan), np.asarray(trace_loop), rtol=1e-5, atol=1e-6
    )


def test_layer_structure():
    cfg = CFGS["two_hidden"]
    names = [n for n, _ in cfg.layer_configs]
    assert names == ["input", "hidden_0", "readout"]
    sizes = [(c.input_size, c.output_size) for _, c in cfg.layer_configs]
    assert sizes == [(12, 8), (8, 6), (6, 4)]


def test_no_hidden_goes_straight_to_readout():
    cfg = CFGS["no_hidden"]
    names = [n for n, _ in cfg.layer_configs]
    assert names == ["readout"]
    params = M.init(cfg, jax.random.PRNGKey(0))
    assert set(params) == {"readout"}


def test_format_inputs_2d_repeats_over_time():
    cfg = SNNConfig(input_size=5, output_size=2, int_time_steps=4)
    x = jnp.arange(10.0).reshape(2, 5)
    out = M.format_inputs(cfg, x)
    assert out.shape == (2, 4, 5)
    for t in range(4):
        np.testing.assert_allclose(np.asarray(out[:, t]), np.asarray(x))


def test_format_inputs_pads_short_time_axis():
    cfg = SNNConfig(input_size=5, output_size=2, int_time_steps=6)
    x = jnp.ones((2, 4, 5))
    out = M.format_inputs(cfg, x)
    assert out.shape == (2, 6, 5)
    np.testing.assert_allclose(np.asarray(out[:, 4:]), 0.0)


def test_format_inputs_rejects_too_long():
    cfg = SNNConfig(input_size=5, output_size=2, int_time_steps=3)
    with pytest.raises(ValueError):
        M.format_inputs(cfg, jnp.ones((2, 4, 5)))


def test_hidden_states_layout():
    cfg = CFGS["alif_rec"]
    params = M.init(cfg, jax.random.PRNGKey(0))
    x = jnp.ones((2, cfg.int_time_steps, 12))
    trace, hs = M.apply(cfg, params, x, return_hidden=True)
    assert trace.shape == (2, cfg.int_time_steps, 4)
    assert set(hs) == {"input", "readout"}
    assert len(hs["input"]) == 3  # (v, a, z)
    for leaf in hs["input"]:
        assert leaf.shape == (2, cfg.int_time_steps, 8)
    assert hs["readout"][0].shape == (2, cfg.int_time_steps, 4)
    # Readout trace in hidden states equals the outputs trace.
    np.testing.assert_allclose(np.asarray(hs["readout"][0]), np.asarray(trace))


def test_prediction_logits_modes():
    cfg = CFGS["lif_ff"]
    trace = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, cfg.int_time_steps, 4)).astype(np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(M.prediction_logits(cfg, trace)),
        np.asarray(trace).max(axis=1),
    )
    cfg_tf = SNNConfig(
        input_size=12, output_size=4, int_time_steps=cfg.int_time_steps,
        readout_mth=ReadoutMth.TEMPORAL_FILTER, readout_filter_decay=0.8,
    )
    w = 0.8 ** np.arange(cfg.int_time_steps - 1, -1, -1, dtype=np.float32)
    expected = (np.asarray(trace) * w[None, :, None]).sum(axis=1)
    np.testing.assert_allclose(
        np.asarray(M.prediction_logits(cfg_tf, trace)), expected, rtol=1e-5
    )


def test_gradients_flow_and_beta_is_dead():
    cfg = CFGS["two_hidden"]
    params = M.init(cfg, jax.random.PRNGKey(7))
    x = jax.random.uniform(jax.random.PRNGKey(9), (4, cfg.int_time_steps, 12))
    y = jnp.array([0, 1, 2, 3])

    def loss(p):
        logits = M.forward_logits(cfg, p, x)
        return -jnp.mean(
            jax.nn.log_softmax(logits)[jnp.arange(4), y]
        )

    g = jax.grad(loss)(params)
    assert float(jnp.linalg.norm(g["input"]["w_in"])) > 0
    assert float(jnp.linalg.norm(g["readout"]["w_in"])) > 0
    assert float(g["input"]["beta"]) == 0.0  # quirk Q3
    assert float(g["hidden_0"]["beta"]) == 0.0
    # Eye mask: self-connection gradients are exactly zero.
    np.testing.assert_allclose(np.asarray(jnp.diag(g["input"]["w_rec"])), 0.0)


def test_remat_matches_no_remat():
    cfg = CFGS["alif_rec"]
    cfg_remat = SNNConfig(
        **{**{f.name: getattr(cfg, f.name) for f in cfg.__dataclass_fields__.values()},
           "remat": True}
    )
    params = M.init(cfg, jax.random.PRNGKey(7))
    x = jax.random.uniform(jax.random.PRNGKey(10), (3, cfg.int_time_steps, 12))

    def loss(c, p):
        return jnp.sum(M.forward_logits(c, p, x) ** 2)

    l1, g1 = jax.value_and_grad(lambda p: loss(cfg, p))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(cfg_remat, p))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g1, g2,
    )


def test_bfloat16_compute_dtype_runs():
    cfg = SNNConfig(
        input_size=12, output_size=4, n_hidden_neurons=8,
        hidden_layer_type=LayerType.ALIF, int_time_steps=5,
        compute_dtype="bfloat16",
    )
    params = M.init(cfg, jax.random.PRNGKey(0))
    x = jnp.ones((2, 5, 12))
    trace, _ = M.apply(cfg, params, x)
    assert trace.dtype == jnp.float32  # outputs are upcast
    assert np.isfinite(np.asarray(trace)).all()


def test_param_labels():
    cfg = CFGS["two_hidden"]
    params = M.init(cfg, jax.random.PRNGKey(0))
    labels = M.param_labels(cfg, params)
    assert labels["input"]["beta"] == "beta"
    assert labels["input"]["w_in"] == "weight"
    assert labels["readout"]["b"] == "weight"


def test_izhikevich_end_to_end_trainable():
    """Izhikevich is registered but never swept in the reference
    (SURVEY Q4); verify the full model path at least trains mechanically."""
    cfg = SNNConfig(
        input_size=12, output_size=4, n_hidden_neurons=8,
        hidden_layer_type=LayerType.Izhikevich,
        use_recurrent_connection=True, int_time_steps=5,
    )
    params = M.init(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 5, 12)) * 100.0

    def loss(p):
        return jnp.sum(M.forward_logits(cfg, p, x) ** 2)

    l0 = float(loss(params))
    g = jax.grad(loss)(params)
    assert np.isfinite(l0)
    assert all(
        np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(g)
    )


def test_feedforward_lif_t100_smoke():
    """BASELINE config #1 shape: feedforward LIF-128 at T=100 (tiny batch
    to keep CPU time sane)."""
    cfg = SNNConfig(
        input_size=32, output_size=10, n_hidden_neurons=128,
        hidden_layer_type=LayerType.LIF, use_recurrent_connection=False,
        int_time_steps=100,
    )
    params = M.init(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 100, 32))
    logits = M.forward_logits(cfg, params, x)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()


def test_matmul_dtype_bf16_close_to_f32():
    """matmul_dtype='bfloat16' keeps f32 accumulation/state: results stay
    within bf16 operand-rounding distance of the f32 path."""
    kw = dict(
        input_size=24, output_size=6, n_hidden_neurons=16,
        hidden_layer_type=LayerType.ALIF, use_recurrent_connection=True,
        int_time_steps=6,
    )
    cfg32 = SNNConfig(**kw)
    cfg16 = SNNConfig(**kw, matmul_dtype="bfloat16")
    params = M.init(cfg32, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 6, 24))
    t32, _ = M.apply(cfg32, params, x)
    t16, _ = M.apply(cfg16, params, x)
    assert t16.dtype == jnp.float32
    # Readout traces are O(1); bf16 weight rounding is ~1e-2 relative at
    # these magnitudes after T steps of accumulation.
    np.testing.assert_allclose(
        np.asarray(t16), np.asarray(t32), rtol=0.1, atol=0.05
    )
    # Gradients still flow and beta stays dead.
    g = jax.grad(lambda p: jnp.sum(M.forward_logits(cfg16, p, x) ** 2))(params)
    assert float(jnp.linalg.norm(g["input"]["w_in"])) > 0
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_fused_fallback_is_logged(monkeypatch, caplog):
    """A shape past the fused kernels' VMEM budget must log the fallback
    (no silent perf cliff) -- once per distinct config."""
    import logging

    monkeypatch.setattr(M, "_on_tpu", lambda: True)
    M._fallback_logged.clear()
    from snnimageclassification_tpu.data.datasets import EncodeConfig

    # 8192-wide input: W_in block alone is ~64 MB >> the 4 MB VMEM gate.
    cfg = SNNConfig(
        input_size=8192, output_size=10, n_hidden_neurons=2048,
        int_time_steps=4,
    )
    enc = EncodeConfig(n_steps=4, use_periods=False)
    with caplog.at_level(logging.INFO,
                         logger="snnimageclassification_tpu.models.snn"):
        assert not M._head_fusible(cfg, enc)
        assert not M._head_fusible(cfg, enc)  # second call: no re-log
    msgs = [r.message for r in caplog.records if "falling back" in r.message]
    assert len(msgs) == 1
    assert "VMEM" in msgs[0]
