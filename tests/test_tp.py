"""Tensor-parallel (hidden-dim sharded) path vs the single-device oracle.

Runs on the conftest's virtual 8-device CPU platform, exercising the same
shard_map/collective structure XLA emits on a real (data, model) TPU mesh:
column-sharded weights, per-step spike all_gather for the recurrent
matmul, DP gradient all-reduce from the autodiff transpose.

Forward parity is *bitwise*: column sharding splits only matmul output
columns, never a contraction, so no summation reorders.  Gradients see the
data-axis batch-reduction reorder and get a small tolerance.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import snnimageclassification_tpu as st
from snnimageclassification_tpu.data.datasets import EncodeConfig
from snnimageclassification_tpu.models import snn as model_lib
from snnimageclassification_tpu.parallel import tp
from snnimageclassification_tpu.train.trainer import make_optimizer, nll_loss

BATCH = 16
N_FEATURES = 64


def _cfg(**kw):
    base = dict(
        input_size=N_FEATURES, output_size=10, n_hidden_neurons=32,
        hidden_layer_type=st.LayerType.ALIF, use_recurrent_connection=True,
        int_time_steps=6,
    )
    base.update(kw)
    return st.SNNConfig(**base)


def _data(seed=0, batch=BATCH):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((batch, N_FEATURES)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, batch), jnp.int32)
    w = jnp.ones((batch,), jnp.float32)
    return x, y, w


ENC = EncodeConfig(n_steps=6, use_periods=True)

CONFIGS = [
    ("alif-rec-learnbeta", _cfg(learn_beta=True)),
    ("lif-ff", _cfg(hidden_layer_type=st.LayerType.LIF,
                    use_recurrent_connection=False)),
    ("izh-rec", _cfg(hidden_layer_type=st.LayerType.Izhikevich)),
    ("two-hidden", _cfg(n_hidden_neurons=[32, 16],
                        hidden_layer_type=st.LayerType.ALIF)),
]


@pytest.fixture(scope="module", params=[(2, 4), (4, 2)], ids=["2x4", "4x2"])
def mesh(request):
    n_data, n_model = request.param
    return tp.make_2d_mesh(n_data, n_model)


class TestTPForward:
    @pytest.mark.parametrize("name,cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
    def test_matches_single_device_bitwise(self, mesh, name, cfg):
        params = model_lib.init(cfg, jax.random.PRNGKey(1))
        sp = tp.shard_params_2d(mesh, cfg, params)
        x, _, _ = _data()
        got = tp.make_tp_forward(cfg, mesh, ENC)(sp, x)
        want = model_lib.forward_logits_pixels(cfg, params, x, ENC)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_spikes_input_no_encoder(self, mesh):
        cfg = _cfg()
        params = model_lib.init(cfg, jax.random.PRNGKey(2))
        sp = tp.shard_params_2d(mesh, cfg, params)
        rng = np.random.default_rng(3)
        spikes = jnp.asarray(
            rng.integers(0, 2, (BATCH, cfg.int_time_steps, N_FEATURES)),
            jnp.float32,
        )
        got = tp.make_tp_forward(cfg, mesh, None)(sp, spikes)
        want = model_lib.forward_logits(cfg, params, spikes)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_param_specs_cover_all_leaves(self):
        cfg = _cfg(learn_beta=True, n_hidden_neurons=[32, 16])
        params = model_lib.init(cfg, jax.random.PRNGKey(0))
        specs = tp.tp_param_specs(cfg)
        assert jax.tree.structure(
            params
        ) == jax.tree.structure(specs, is_leaf=lambda x: isinstance(
            x, jax.sharding.PartitionSpec))


class TestTPGradients:
    @pytest.mark.parametrize("name,cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
    def test_grads_match_single_device(self, mesh, name, cfg):
        params = model_lib.init(cfg, jax.random.PRNGKey(4))
        sp = tp.shard_params_2d(mesh, cfg, params)
        x, y, w = _data(4)
        loss_fn = tp.make_tp_loss_fn(cfg, mesh, ENC)
        l_tp, g_tp = jax.jit(jax.value_and_grad(loss_fn))(sp, x, y, w)

        def ref_loss(p):
            return nll_loss(model_lib.forward_logits_pixels(cfg, p, x, ENC), y, w)

        l_ref, g_ref = jax.value_and_grad(ref_loss)(params)
        assert abs(float(l_tp) - float(l_ref)) < 1e-5 * max(1.0, abs(float(l_ref)))
        scale = max(
            float(jnp.max(jnp.abs(leaf))) for leaf in jax.tree.leaves(g_ref)
        ) or 1.0
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5 * max(scale, 1.0)
            ),
            g_tp, g_ref,
        )

    def test_grad_shardings_match_param_specs(self, mesh):
        cfg = _cfg()
        params = model_lib.init(cfg, jax.random.PRNGKey(5))
        sp = tp.shard_params_2d(mesh, cfg, params)
        x, y, w = _data(5)
        grads = jax.jit(jax.grad(tp.make_tp_loss_fn(cfg, mesh, ENC)))(sp, x, y, w)
        specs = tp.tp_param_specs(cfg)
        for name, group in specs.items():
            for leaf, spec in group.items():
                got = grads[name][leaf].sharding.spec
                # Normalize trailing Nones.
                assert tuple(got) == tuple(spec), (name, leaf, got, spec)

    def test_padded_rows_do_not_contribute(self, mesh):
        cfg = _cfg()
        params = model_lib.init(cfg, jax.random.PRNGKey(6))
        sp = tp.shard_params_2d(mesh, cfg, params)
        x, y, w = _data(6)
        # Zero-weight the last 5 rows and corrupt them: loss/grads must be
        # invariant (weighted-mean exactness under mesh padding).
        w = w.at[-5:].set(0.0)
        loss_fn = jax.jit(jax.value_and_grad(tp.make_tp_loss_fn(cfg, mesh, ENC)))
        l1, g1 = loss_fn(sp, x, y, w)
        x2 = x.at[-5:].set(0.73)
        y2 = y.at[-5:].set(0)
        l2, g2 = loss_fn(sp, x2, y2, w)
        assert float(l1) == float(l2)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            g1, g2,
        )


class TestTPTrainStep:
    def test_step_matches_single_device(self, mesh):
        cfg = _cfg(learn_beta=True)
        params = model_lib.init(cfg, jax.random.PRNGKey(7))
        tx = make_optimizer(model_lib.param_labels(cfg, params))
        x, y, w = _data(7)

        sp = tp.shard_params_2d(mesh, cfg, params)
        opt = tx.init(sp)
        step = tp.make_tp_train_step(cfg, mesh, tx, ENC, donate=False)
        p_tp, _, loss_tp = step(sp, opt, x, y, w)

        def ref_loss(p):
            return nll_loss(model_lib.forward_logits_pixels(cfg, p, x, ENC), y, w)

        import optax

        l_ref, g_ref = jax.value_and_grad(ref_loss)(params)
        upd, _ = tx.update(g_ref, tx.init(params), params)
        p_ref = optax.apply_updates(params, upd)

        assert abs(float(loss_tp) - float(l_ref)) < 1e-5 * max(1.0, abs(float(l_ref)))
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            p_tp, p_ref,
        )

    def test_beta_stays_frozen(self, mesh):
        cfg = _cfg(learn_beta=True)
        params = model_lib.init(cfg, jax.random.PRNGKey(8))
        tx = make_optimizer(model_lib.param_labels(cfg, params))
        sp = tp.shard_params_2d(mesh, cfg, params)
        opt = tx.init(sp)
        step = tp.make_tp_train_step(cfg, mesh, tx, ENC, donate=False)
        x, y, w = _data(8)
        beta0 = float(params["input"]["beta"])
        p, opt, _ = step(sp, opt, x, y, w)
        p, opt, _ = step(p, opt, x, y, w)
        assert float(p["input"]["beta"]) == beta0  # quirk Q3: bitwise frozen


class TestMesh2D:
    def test_axes_and_size(self):
        m = tp.make_2d_mesh(2, 4)
        assert m.axis_names == (tp.DATA_AXIS, tp.MODEL_AXIS)
        assert m.devices.shape == (2, 4)
        with pytest.raises(ValueError):
            tp.make_2d_mesh(4, 4)
