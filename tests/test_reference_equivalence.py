"""Machine-checked equivalence against the *running* PyTorch reference.

The strongest parity evidence available without a dataset: torch-CPU is
installed, and the reference model code (/root/reference/src/modules/
{snn,spiking_layers,spike_funcs}.py) needs only torch.  These tests

1. initialize the JAX model, copy the *identical weights* into the
   reference ``SNN`` (torch ``nn.Module``),
2. run both on the same inputs, and
3. assert forward traces, hidden states, logits, losses, parameter
   gradients, and multi-step Adam training trajectories agree to float32
   tolerance -- across LIF/ALIF/Izhikevich x feedforward/recurrent x
   FastSigmoid/Phi x learn_beta on/off.

Spike rasters are asserted *bitwise identical*: both sides compute
``V >= threshold`` on values that differ only by float32 reduction order
(~1e-6 relative), so with the fixed seeds no membrane potential lands
inside the flip window.

Reference call paths exercised: SNN.forward (snn.py:201-219),
get_prediction_log_proba (snn.py:250-258), NLLLoss + Adam(lr, wd=1e-5)
fit step (snn.py:296-299, 384-415), layer steps
(spiking_layers.py:156-171, 229-243, 337-353, 402-408), surrogate
backwards (spike_funcs.py:48-79).

Skipped wholesale if torch or the reference checkout is unavailable.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = os.environ.get("SNN_TPU_REFERENCE", "/root/reference")
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

try:
    from src.modules.snn import SNN as TorchSNN
    from src.modules.spike_funcs import (
        HeavisidePhiApprox,
        HeavisideSigmoidApprox,
    )
    from src.modules.spiking_layers import LayerType as TorchLayerType
except ImportError:  # pragma: no cover - reference checkout absent
    pytest.skip(
        "reference checkout not importable", allow_module_level=True
    )

import jax
import jax.numpy as jnp
import optax

from snnimageclassification_tpu.models import snn as model_lib
from snnimageclassification_tpu.models.config import SNNConfig
from snnimageclassification_tpu.ops.cells import LayerType
from snnimageclassification_tpu.ops.surrogate import SpikeFuncType
from snnimageclassification_tpu.train.trainer import make_optimizer, nll_loss

TORCH_SPIKE = {
    SpikeFuncType.FastSigmoid: HeavisideSigmoidApprox,
    SpikeFuncType.Phi: HeavisidePhiApprox,
}
TORCH_LAYER = {
    LayerType.LIF: TorchLayerType.LIF,
    LayerType.ALIF: TorchLayerType.ALIF,
    LayerType.Izhikevich: TorchLayerType.Izhikevich,
}

# State-tuple field order is identical on both sides:
# LIF (V, Z) / ALIF (V, a, Z) / Izhikevich (V, u, Z) / Readout (V,)
# (spiking_layers.py:140-154, 212-227, 308-335, 387-400 vs ops/cells.py).


def _copy_params_into_torch(tsnn: TorchSNN, params) -> None:
    """Install the JAX parameter pytree into the reference nn.Module."""
    with torch.no_grad():
        for name, layer in tsnn.layers.items():
            p = params[name]
            layer.forward_weights.copy_(
                torch.from_numpy(np.array(p["w_in"], np.float32))
            )
            if "w_rec" in p:
                layer.recurrent_weights.copy_(
                    torch.from_numpy(np.array(p["w_rec"], np.float32))
                )
            if "b" in p:
                layer.bias_weights.copy_(
                    torch.from_numpy(np.array(p["b"], np.float32))
                )
            if "beta" in p:
                layer.beta.copy_(torch.tensor(float(p["beta"])))


def build_pair(
    layer_type: LayerType,
    use_rec: bool,
    spike_func: SpikeFuncType,
    learn_beta: bool = False,
    in_size: int = 12,
    hidden=(16,),
    out_size: int = 4,
    T: int = 16,
    seed: int = 0,
    tmp_path=None,
):
    """(jax_cfg, jax_params, torch_snn) with identical weights."""
    cfg = SNNConfig(
        input_size=in_size,
        output_size=out_size,
        n_hidden_neurons=hidden,
        use_recurrent_connection=use_rec,
        int_time_steps=T,
        spike_func=spike_func,
        hidden_layer_type=layer_type,
        learn_beta=learn_beta,
        use_pallas=False,
    )
    params = model_lib.init(cfg, jax.random.PRNGKey(seed))
    tsnn = TorchSNN(
        inputs_size=in_size,
        output_size=out_size,
        n_hidden_neurons=list(hidden),
        use_recurrent_connection=use_rec,
        int_time_steps=T,
        spike_func=TORCH_SPIKE[spike_func],
        hidden_layer_type=TORCH_LAYER[layer_type],
        device=torch.device("cpu"),
        checkpoint_folder=str(tmp_path) if tmp_path else "checkpoints",
        # The reference's ALIF ctor indexes kwargs["learn_beta"] directly
        # (spiking_layers.py:197); every reference caller supplies it.
        learn_beta=learn_beta,
    )
    _copy_params_into_torch(tsnn, params)
    return cfg, params, tsnn


def make_inputs(cfg: SNNConfig, batch: int = 6, seed: int = 1):
    """Spike-raster inputs (B, T, F) + integer labels.

    Izhikevich needs large input currents to move V at dt/C scale
    (spiking_layers.py:348-349: dV = dt*I/C with C=100, dt=1e-3), so its
    rasters are scaled to 1e6 -- drives several neurons across v_peak
    within T steps, exercising the reset path.
    """
    rng = np.random.default_rng(seed)
    x = (
        rng.random((batch, cfg.int_time_steps, cfg.input_size)) < 0.3
    ).astype(np.float32)
    if cfg.hidden_layer_type == LayerType.Izhikevich:
        x = x * 1e6
    y = rng.integers(0, cfg.output_size, size=(batch,)).astype(np.int32)
    return x, y


def torch_forward(tsnn: TorchSNN, x_np, y_np):
    """Reference forward + loss (snn.py:201-228, 250-258, 296-297)."""
    x = torch.from_numpy(x_np)
    out_trace, hidden = tsnn(x)
    logits, _ = torch.max(out_trace, dim=1)
    log_p = torch.log_softmax(logits, dim=-1)
    loss = torch.nn.NLLLoss()(log_p, torch.from_numpy(np.asarray(y_np)).long())
    return out_trace, hidden, logits, loss


def jax_loss_fn(cfg):
    def loss_fn(params, x, y):
        trace, _ = model_lib.apply(cfg, params, x)
        logits = model_lib.prediction_logits(cfg, trace)
        return nll_loss(logits, y), logits

    return loss_fn


CASES = [
    (lt, rec, sf, lb)
    for lt in (LayerType.LIF, LayerType.ALIF, LayerType.Izhikevich)
    for rec in (False, True)
    for sf in (SpikeFuncType.FastSigmoid, SpikeFuncType.Phi)
    for lb in ((False, True) if lt == LayerType.ALIF else (False,))
]


def _case_id(case):
    lt, rec, sf, lb = case
    return f"{lt.name}-{'rec' if rec else 'ff'}-{sf.name}" + (
        "-learnbeta" if lb else ""
    )


@pytest.mark.parametrize("case", CASES, ids=_case_id)
def test_forward_and_grads_match_reference(case, tmp_path):
    """Traces, hidden states, logits, loss, and all parameter gradients
    match the reference bit-for-bit up to float32 reduction-order noise."""
    layer_type, use_rec, spike_func, learn_beta = case
    cfg, params, tsnn = build_pair(
        layer_type, use_rec, spike_func, learn_beta, tmp_path=tmp_path
    )
    x, y = make_inputs(cfg)

    t_trace, t_hidden, t_logits, t_loss = torch_forward(tsnn, x, y)

    j_trace, j_hidden = model_lib.apply(cfg, params, x, return_hidden=True)
    j_logits = model_lib.prediction_logits(cfg, j_trace)
    j_loss, _ = jax_loss_fn(cfg)(params, jnp.asarray(x), jnp.asarray(y))

    # Izhikevich membrane potentials reach O(100); use relative tolerance.
    rtol, atol = 1e-5, 1e-5
    if layer_type == LayerType.Izhikevich:
        rtol, atol = 1e-5, 1e-3

    np.testing.assert_allclose(
        np.asarray(j_trace), t_trace.detach().numpy(), rtol=rtol, atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(j_logits), t_logits.detach().numpy(), rtol=rtol, atol=atol
    )
    np.testing.assert_allclose(
        float(j_loss), float(t_loss.detach()), rtol=1e-5, atol=1e-6
    )

    for name, t_states in t_hidden.items():
        j_states = j_hidden[name]
        assert len(j_states) == len(t_states)
        for i, (j_s, t_s) in enumerate(zip(j_states, t_states)):
            t_arr = t_s.detach().numpy()
            is_spike_slot = i == len(j_states) - 1 and name != "readout"
            if is_spike_slot:
                # Spikes must agree *exactly* -- any flip would cascade.
                assert np.array_equal(np.asarray(j_s), t_arr), (
                    f"{name} spike raster diverged"
                )
            else:
                np.testing.assert_allclose(
                    np.asarray(j_s), t_arr, rtol=rtol, atol=atol
                )

    # Gradients: reference BPTT through the T-step autograd graph vs
    # jax.grad through the lax.scan.  Same surrogate backwards
    # (spike_funcs.py:48-79 vs ops/surrogate.py).
    t_loss.backward()
    grads = jax.grad(lambda p, x, y: jax_loss_fn(cfg)(p, x, y)[0])(
        params, jnp.asarray(x), jnp.asarray(y)
    )
    # Gradients accumulate reduction-order noise over T steps; scale
    # tolerance to each tensor's magnitude.
    for name, layer in tsnn.layers.items():
        g = grads[name]
        pairs = [("w_in", layer.forward_weights)]
        if "w_rec" in g:
            pairs.append(("w_rec", layer.recurrent_weights))
        if "b" in g:
            pairs.append(("b", layer.bias_weights))
        for leaf, t_param in pairs:
            t_g = t_param.grad.detach().numpy()
            j_g = np.asarray(g[leaf])
            scale = max(np.abs(t_g).max(), 1e-30)
            assert np.abs(j_g - t_g).max() <= 1e-4 * scale + 1e-9, (
                f"{name}.{leaf} grad mismatch: "
                f"max|diff|={np.abs(j_g - t_g).max():.3e}, scale={scale:.3e}"
            )
        if "beta" in g:
            # Quirk Q3: the surrogate returns no cotangent for the
            # threshold argument (spike_funcs.py:62,79), so torch leaves
            # beta.grad at None and the JAX side must produce exactly 0.
            assert layer.beta.grad is None
            assert float(g["beta"]) == 0.0


@pytest.mark.parametrize("layer_type", [LayerType.LIF, LayerType.ALIF],
                         ids=["LIF", "ALIF"])
def test_multi_hidden_layer_stack_matches_reference(layer_type, tmp_path):
    """Two hidden layers (input 12->16, hidden_0 16->12, readout 12->4):
    the reference's ModuleDict assembly (snn.py:103-147) vs our
    per-layer-scan factorization, forward + gradients."""
    cfg, params, tsnn = build_pair(
        layer_type, True, SpikeFuncType.FastSigmoid, hidden=(16, 12),
        tmp_path=tmp_path,
    )
    assert set(tsnn.layers.keys()) == {"input", "hidden_0", "readout"}
    x, y = make_inputs(cfg)
    t_trace, _, t_logits, t_loss = torch_forward(tsnn, x, y)
    j_trace, _ = model_lib.apply(cfg, params, x)
    j_loss, j_logits = jax_loss_fn(cfg)(params, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(
        np.asarray(j_trace), t_trace.detach().numpy(), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        float(j_loss), float(t_loss.detach()), rtol=1e-5, atol=1e-6
    )
    t_loss.backward()
    grads = jax.grad(lambda p, x, y: jax_loss_fn(cfg)(p, x, y)[0])(
        params, jnp.asarray(x), jnp.asarray(y)
    )
    for name, layer in tsnn.layers.items():
        pairs = [("w_in", layer.forward_weights)]
        if "w_rec" in grads[name]:
            pairs.append(("w_rec", layer.recurrent_weights))
        for leaf, t_param in pairs:
            t_g = t_param.grad.detach().numpy()
            j_g = np.asarray(grads[name][leaf])
            scale = max(np.abs(t_g).max(), 1e-30)
            assert np.abs(j_g - t_g).max() <= 1e-4 * scale + 1e-9, (name, leaf)


def test_2d_constant_input_formatting_matches_reference(tmp_path):
    """(B, F) inputs repeat over time on both sides (snn.py:159-171)."""
    cfg, params, tsnn = build_pair(
        LayerType.ALIF, True, SpikeFuncType.FastSigmoid, tmp_path=tmp_path
    )
    rng = np.random.default_rng(7)
    x = rng.random((5, cfg.input_size)).astype(np.float32)
    t_trace, _ = tsnn(torch.from_numpy(x))
    j_trace, _ = model_lib.apply(cfg, params, x)
    np.testing.assert_allclose(
        np.asarray(j_trace), t_trace.detach().numpy(), rtol=1e-5, atol=1e-5
    )


def test_time_padding_matches_reference(tmp_path):
    """(B, t<T, F) inputs zero-pad the time axis (snn.py:175-183)."""
    cfg, params, tsnn = build_pair(
        LayerType.LIF, True, SpikeFuncType.FastSigmoid, tmp_path=tmp_path
    )
    rng = np.random.default_rng(8)
    x = (rng.random((5, cfg.int_time_steps - 6, cfg.input_size)) < 0.3).astype(
        np.float32
    )
    t_trace, _ = tsnn(torch.from_numpy(x))
    j_trace, _ = model_lib.apply(cfg, params, x)
    np.testing.assert_allclose(
        np.asarray(j_trace), t_trace.detach().numpy(), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("learn_beta", [False, True], ids=["beta-static", "learn-beta"])
def test_training_trajectory_matches_reference(learn_beta, tmp_path):
    """N steps of Adam(lr=1e-3, weight_decay=1e-5) on identical batches:
    per-step losses and final parameters agree (snn.py:296-299, 384-415).

    Also proves the Q3 contract end-to-end: with learn_beta=True the
    reference's beta never moves (grad is None -> torch Adam skips it),
    and the JAX beta stays bitwise frozen under the masked optimizer.
    """
    layer_type = LayerType.ALIF
    cfg, params, tsnn = build_pair(
        layer_type,
        True,
        SpikeFuncType.FastSigmoid,
        learn_beta=learn_beta,
        tmp_path=tmp_path,
    )
    n_steps, batch = 8, 6
    rng = np.random.default_rng(42)
    xs = (
        rng.random((n_steps, batch, cfg.int_time_steps, cfg.input_size)) < 0.3
    ).astype(np.float32)
    ys = rng.integers(0, cfg.output_size, size=(n_steps, batch)).astype(np.int32)

    # --- reference side: eager Adam loop (snn.py:384-415) ---
    optimizer = torch.optim.Adam(tsnn.parameters(), lr=1e-3, weight_decay=1e-5)
    beta0_torch = (
        float(tsnn.layers["input"].beta.detach()) if learn_beta else None
    )
    t_losses = []
    for i in range(n_steps):
        _, _, _, loss = torch_forward(tsnn, xs[i], ys[i])
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        t_losses.append(float(loss.detach()))

    # --- JAX side: the real production optimizer (train/trainer.py) ---
    labels = model_lib.param_labels(cfg, params)
    tx = make_optimizer(labels, lr=1e-3, weight_decay=1e-5)
    opt_state = tx.init(params)
    loss_fn = jax_loss_fn(cfg)
    beta0_jax = params["input"].get("beta")

    @jax.jit
    def train_step(params, opt_state, x, y):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, y
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    j_losses = []
    for i in range(n_steps):
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(xs[i]), jnp.asarray(ys[i])
        )
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-5, atol=1e-6)

    for name, layer in tsnn.layers.items():
        p = params[name]
        np.testing.assert_allclose(
            np.asarray(p["w_in"]),
            layer.forward_weights.detach().numpy(),
            rtol=1e-4,
            atol=1e-7,
        )
        if "w_rec" in p:
            np.testing.assert_allclose(
                np.asarray(p["w_rec"]),
                layer.recurrent_weights.detach().numpy(),
                rtol=1e-4,
                atol=1e-7,
            )
        if "b" in p:
            np.testing.assert_allclose(
                np.asarray(p["b"]),
                layer.bias_weights.detach().numpy(),
                rtol=1e-4,
                atol=1e-7,
            )
    if learn_beta:
        # Both stay frozen at the (quirky, N(0, theta^2)) init value.
        assert float(tsnn.layers["input"].beta.detach()) == beta0_torch
        assert float(params["input"]["beta"]) == float(beta0_jax)
