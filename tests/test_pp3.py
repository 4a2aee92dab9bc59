"""Combined 3-D (data, pipe, model) parallelism vs the single-device oracle.

Runs on the conftest's virtual 8-device CPU platform as a (2, 2, 2) cube —
the same shard_map program XLA emits on a real pod slice: batch sharded
over "data", one layer per "pipe" stage (GPipe microbatch ppermutes), each
stage's neurons column-sharded over "model" (per-step spike all_gather).

Padding (stage-uniform dims rounded up to multiples of n_model) only
lengthens contractions with exact zeros, so parity with the single-device
oracle is tight (f32-reassociation ULPs); padded slabs must stay bitwise
zero through Adam training.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow

import snnimageclassification_tpu as st
from snnimageclassification_tpu.data.datasets import EncodeConfig
from snnimageclassification_tpu.models import snn as model_lib
from snnimageclassification_tpu.parallel import pp, pp3, tp
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
]

TWO_HIDDEN = _cfg(n_hidden_neurons=[32, 16])


@pytest.fixture(scope="module")
def cube():
    """(2 data, 2 pipe, 2 model): single-hidden configs (hidden + readout)."""
    return pp3.make_3d_mesh(2, 2, 2)


@pytest.fixture(scope="module")
def mesh132():
    """(1 data, 3 pipe, 2 model): two-hidden configs."""
    return pp3.make_3d_mesh(1, 3, 2)


@pytest.fixture(scope="module")
def mesh124():
    """(1 data, 2 pipe, 4 model): wider model axis, h_loc = 8."""
    return pp3.make_3d_mesh(1, 2, 4)


def _grads_oracle(cfg, params, x, y, w):
    def ref_loss(p):
        return nll_loss(model_lib.forward_logits_pixels(cfg, p, x, ENC), y, w)

    return jax.value_and_grad(ref_loss)(params)


class TestPP3Forward:
    @pytest.mark.parametrize("name,cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
    def test_matches_single_device(self, cube, name, cfg):
        params = model_lib.init(cfg, jax.random.PRNGKey(1))
        sp = pp3.shard_params_pp3(cube, cfg, params)
        x, _, _ = _data()
        got = pp3.make_pp3_forward(cfg, cube, ENC)(sp, x)
        want = model_lib.forward_logits_pixels(cfg, params, x, ENC)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )

    def test_two_hidden_three_stages(self, mesh132):
        cfg = TWO_HIDDEN
        params = model_lib.init(cfg, jax.random.PRNGKey(2))
        sp = pp3.shard_params_pp3(mesh132, cfg, params)
        x, _, _ = _data(2)
        got = pp3.make_pp3_forward(cfg, mesh132, ENC, n_micro=4)(sp, x)
        want = model_lib.forward_logits_pixels(cfg, params, x, ENC)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_four_way_model_axis(self, mesh124):
        cfg = _cfg()
        params = model_lib.init(cfg, jax.random.PRNGKey(3))
        sp = pp3.shard_params_pp3(mesh124, cfg, params)
        x, _, _ = _data(3)
        got = pp3.make_pp3_forward(cfg, mesh124, ENC)(sp, x)
        want = model_lib.forward_logits_pixels(cfg, params, x, ENC)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_spikes_input_no_encoder(self, cube):
        cfg = _cfg()
        params = model_lib.init(cfg, jax.random.PRNGKey(4))
        sp = pp3.shard_params_pp3(cube, cfg, params)
        rng = np.random.default_rng(5)
        spikes = jnp.asarray(
            rng.integers(0, 2, (BATCH, cfg.int_time_steps, N_FEATURES)),
            jnp.float32,
        )
        got = pp3.make_pp3_forward(cfg, cube, None)(sp, spikes)
        want = model_lib.forward_logits(cfg, params, spikes)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_stack_unstack_roundtrip(self):
        cfg = _cfg(learn_beta=True, n_hidden_neurons=[32, 16])
        params = model_lib.init(cfg, jax.random.PRNGKey(6))
        rt = pp3.pp3_unstack_params(
            cfg, pp3.pp3_stack_params(cfg, params, n_model=4)
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            params, rt,
        )

    def test_stack_dims_divisible_by_model(self):
        """Non-divisible real dims (hidden 30, input 65) round up to
        multiples of n_model so the column sharding is even."""
        cfg = _cfg(input_size=65, n_hidden_neurons=30)
        params = model_lib.init(cfg, jax.random.PRNGKey(13))
        stacked = pp3.pp3_stack_params(cfg, params, n_model=4)
        assert stacked["w_in"].shape[1] % 4 == 0
        assert stacked["w_in"].shape[2] % 4 == 0
        rt = pp3.pp3_unstack_params(cfg, stacked)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            params, rt,
        )

    def test_non_divisible_hidden_forward(self, cube):
        cfg = _cfg(input_size=65, n_hidden_neurons=30)
        params = model_lib.init(cfg, jax.random.PRNGKey(14))
        sp = pp3.shard_params_pp3(cube, cfg, params)
        rng = np.random.default_rng(14)
        x = jnp.asarray(rng.random((BATCH, 65)), jnp.float32)
        got = pp3.make_pp3_forward(cfg, cube, ENC)(sp, x)
        want = model_lib.forward_logits_pixels(cfg, params, x, ENC)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestPP3Gradients:
    @pytest.mark.parametrize("name,cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
    def test_grads_match_single_device(self, cube, name, cfg):
        params = model_lib.init(cfg, jax.random.PRNGKey(7))
        sp = pp3.shard_params_pp3(cube, cfg, params)
        x, y, w = _data(7)
        loss_fn = pp3.make_pp3_loss_fn(cfg, cube, ENC)
        l_pp, g_pp = jax.jit(jax.value_and_grad(loss_fn))(sp, x, y, w)
        l_ref, g_ref = _grads_oracle(cfg, params, x, y, w)
        assert abs(float(l_pp) - float(l_ref)) < 1e-5 * max(1.0, abs(float(l_ref)))
        g_ref_st = pp3.pp3_stack_params(cfg, g_ref, cube.shape["model"])
        scale = max(
            float(jnp.max(jnp.abs(leaf))) for leaf in jax.tree.leaves(g_ref)
        ) or 1.0
        for k in g_pp:
            np.testing.assert_allclose(
                np.asarray(g_pp[k]), np.asarray(g_ref_st[k]),
                atol=3e-5 * max(scale, 1.0),
            )

    def test_beta_grad_exactly_zero(self, cube):
        """Quirk Q3: zero threshold-cotangent keeps the ALIF beta gradient
        exactly zero through the combined 3-D path too."""
        cfg = _cfg(learn_beta=True)
        params = model_lib.init(cfg, jax.random.PRNGKey(8))
        sp = pp3.shard_params_pp3(cube, cfg, params)
        x, y, w = _data(8)
        g = jax.jit(jax.grad(pp3.make_pp3_loss_fn(cfg, cube, ENC)))(sp, x, y, w)
        np.testing.assert_array_equal(np.asarray(g["beta"]), 0.0)

    def test_weighted_rows_do_not_contribute(self, cube):
        cfg = _cfg()
        params = model_lib.init(cfg, jax.random.PRNGKey(9))
        sp = pp3.shard_params_pp3(cube, cfg, params)
        x, y, w = _data(9)
        w = w.at[-4:].set(0.0)
        loss_fn = jax.jit(jax.value_and_grad(pp3.make_pp3_loss_fn(cfg, cube, ENC)))
        l1, g1 = loss_fn(sp, x, y, w)
        x2 = x.at[-4:].set(0.41)
        y2 = y.at[-4:].set(0)
        l2, g2 = loss_fn(sp, x2, y2, w)
        assert float(l1) == float(l2)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            g1, g2,
        )


class TestPP3TrainStep:
    def test_step_matches_single_device(self, cube):
        cfg = _cfg(learn_beta=True)
        params = model_lib.init(cfg, jax.random.PRNGKey(10))
        x, y, w = _data(10)

        sp = pp3.shard_params_pp3(cube, cfg, params)
        tx = make_optimizer(pp3.pp3_param_labels(sp))
        opt = tx.init(sp)
        step = pp3.make_pp3_train_step(cfg, cube, tx, ENC, donate=False)
        p_pp, _, loss_pp = step(sp, opt, x, y, w)

        tx_ref = make_optimizer(model_lib.param_labels(cfg, params))
        l_ref, g_ref = _grads_oracle(cfg, params, x, y, w)
        upd, _ = tx_ref.update(g_ref, tx_ref.init(params), params)
        p_ref = pp3.pp3_stack_params(
            cfg, optax.apply_updates(params, upd), cube.shape["model"]
        )

        assert abs(float(loss_pp) - float(l_ref)) < 1e-5 * max(1.0, abs(float(l_ref)))
        for k in p_pp:
            np.testing.assert_allclose(
                np.asarray(p_pp[k]), np.asarray(p_ref[k]), atol=2e-5
            )

    def test_padding_stays_zero_and_beta_frozen(self, cube):
        cfg = _cfg(learn_beta=True, input_size=65, n_hidden_neurons=30)
        params = model_lib.init(cfg, jax.random.PRNGKey(11))
        sp = pp3.shard_params_pp3(cube, cfg, params)
        tx = make_optimizer(pp3.pp3_param_labels(sp))
        opt = tx.init(sp)
        step = pp3.make_pp3_train_step(cfg, cube, tx, ENC, donate=False)
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.random((BATCH, 65)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 10, BATCH), jnp.int32)
        w = jnp.ones((BATCH,), jnp.float32)
        beta0 = np.asarray(sp["beta"])
        p, o = sp, opt
        for _ in range(2):
            p, o, _ = step(p, o, x, y, w)
        np.testing.assert_array_equal(np.asarray(p["beta"]), beta0)
        # Every padded slab entry is still exactly zero: unstack+restack
        # must be the identity on the trained stacked params.
        rt = pp3.pp3_stack_params(
            cfg, pp3.pp3_unstack_params(cfg, p), cube.shape["model"]
        )
        for k in p:
            np.testing.assert_array_equal(np.asarray(rt[k]), np.asarray(p[k]))


class TestPP3Validation:
    def test_wrong_pipe_size_raises(self):
        mesh = pp3.make_3d_mesh(1, 4, 2)
        with pytest.raises(ValueError, match="pipe axis"):
            pp3.make_pp3_forward(_cfg(), mesh, ENC)

    def test_missing_model_axis_raises(self):
        with pytest.raises(ValueError, match="model"):
            pp3.make_pp3_forward(_cfg(), pp.make_pp_mesh(4, 2), ENC)

    def test_missing_pipe_axis_raises(self):
        with pytest.raises(ValueError, match="pipe"):
            pp3.make_pp3_forward(_cfg(), tp.make_2d_mesh(4, 2), ENC)

    def test_indivisible_microbatch_raises(self, cube):
        cfg = _cfg()
        params = model_lib.init(cfg, jax.random.PRNGKey(12))
        sp = pp3.shard_params_pp3(cube, cfg, params)
        x, _, _ = _data(batch=12)  # 6 rows per data shard, n_micro=4
        with pytest.raises(ValueError, match="divisible"):
            pp3.make_pp3_forward(cfg, cube, ENC)(sp, x)

    def test_mesh_needs_enough_devices(self):
        with pytest.raises(ValueError, match="devices"):
            pp3.make_3d_mesh(2, 2, 4)
