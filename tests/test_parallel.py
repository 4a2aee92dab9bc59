"""Data-parallel training over a virtual 8-device CPU mesh.

Exercises the same GSPMD partitioning XLA uses on a real TPU slice:
replicated params, batch-sharded inputs, compiler-inserted gradient
all-reduce.
"""
import jax
import numpy as np
import pytest

import snnimageclassification_tpu as st
from snnimageclassification_tpu.data.datasets import ArrayDataLoader, EncodeConfig
from snnimageclassification_tpu.parallel.mesh import (
    batch_sharded,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
)
from snnimageclassification_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh()


def _toy(n=256, seed=0, n_steps=2):
    rng = np.random.default_rng(seed)
    protos = rng.random((10, 64)).astype(np.float32)
    y = (np.arange(n) % 10).astype(np.int32)
    x = np.clip(protos[y] + 0.1 * rng.standard_normal((n, 64)).astype(np.float32), 0, 1)
    enc = EncodeConfig(n_steps=n_steps, use_periods=False)
    split = int(0.8 * n)
    mk = lambda lo, hi, sh: ArrayDataLoader(
        x[lo:hi], y[lo:hi], 32, shuffle=sh, encode_config=enc, seed=seed
    )
    return mk(0, split, True), mk(split, n, False)


def _cfg():
    return st.SNNConfig(
        input_size=64, output_size=10, n_hidden_neurons=32,
        hidden_layer_type=st.LayerType.ALIF, use_recurrent_connection=True,
        int_time_steps=2,
    )


class TestMeshHelpers:
    def test_make_mesh(self, mesh):
        assert mesh.size == 8
        assert mesh.axis_names == ("data",)

    def test_make_mesh_subset(self):
        m = make_mesh(4)
        assert m.size == 4
        with pytest.raises(ValueError):
            make_mesh(1000)

    def test_pad_to_multiple(self):
        x = np.ones((10, 3), np.float32)
        xp, w = pad_to_multiple(x, 8)
        assert xp.shape == (16, 3)
        np.testing.assert_array_equal(w, [1] * 10 + [0] * 6)
        xp2, w2 = pad_to_multiple(x, 5)
        assert xp2.shape == (10, 3)
        assert w2.sum() == 10

    def test_shard_batch_places_across_devices(self, mesh):
        x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
        xs = shard_batch(mesh, x)
        assert len(xs.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(xs), x)


class TestDataParallelTrainer:
    def test_dp_fit_learns(self, mesh, tmp_path):
        trainer = Trainer(
            _cfg(), checkpoint_folder=str(tmp_path / "ck"), seed=0, mesh=mesh
        )
        train, val = _toy()
        history = trainer.fit(
            train, val, nb_epochs=8, force_overwrite=True, verbose=False
        )
        assert history["train"][-1] < history["train"][0]
        acc = trainer.compute_classification_accuracy(val)
        assert acc > 0.4  # 10-class chance is 0.1; recurrent ALIF is the
        # reference's hardest setting (README: recurrence -45% accuracy)

    def test_dp_matches_single_device(self, mesh, tmp_path):
        """One DP step must produce the same params as one single-device
        step on the same batch (GSPMD all-reduce == full-batch gradient)."""
        train, _ = _toy()
        x, y = next(iter(train))

        t_sd = Trainer(_cfg(), checkpoint_folder=str(tmp_path / "a"), seed=0)
        t_dp = Trainer(_cfg(), checkpoint_folder=str(tmp_path / "b"), seed=0,
                       mesh=mesh)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            t_sd.params, t_dp.params,
        )
        t_sd._ensure_optimizer(1e-3, 1e-5)
        t_dp._ensure_optimizer(1e-3, 1e-5)
        step_sd = t_sd._steps_for(train.encode_config)[0]
        step_dp = t_dp._steps_for(train.encode_config)[0]

        p_sd, _, loss_sd = step_sd(t_sd.params, t_sd.opt_state,
                                   *t_sd._prep_batch(x, y))
        p_dp, _, loss_dp = step_dp(t_dp.params, t_dp.opt_state,
                                   *t_dp._prep_batch(x, y))
        np.testing.assert_allclose(float(loss_sd), float(loss_dp), rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            ),
            p_sd, p_dp,
        )

    def test_dp_handles_uneven_batch(self, mesh, tmp_path):
        """Batch of 13 over 8 devices: padded + masked, loss/acc exact."""
        trainer = Trainer(
            _cfg(), checkpoint_folder=str(tmp_path / "ck"), seed=0, mesh=mesh
        )
        rng = np.random.default_rng(0)
        x = rng.random((13, 64)).astype(np.float32)
        y = (np.arange(13) % 10).astype(np.int32)
        enc = EncodeConfig(n_steps=2, use_periods=False)
        loader = ArrayDataLoader(x, y, batch_size=13, encode_config=enc)
        acc = trainer.compute_classification_accuracy(loader)
        assert 0.0 <= acc <= 1.0
        cm = trainer._compute_single_confusion_matrix(10, loader)
        assert cm.sum() == 13  # padding rows excluded
