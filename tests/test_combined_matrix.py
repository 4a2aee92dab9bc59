"""Combined-feature equivalence matrix (round-5 VERDICT item 5).

A real multi-seed parity run combines sparse checkpointing, early
stopping, gradient accumulation, and epoch blocking AT ONCE; the
per-feature suites (tests/test_epoch_block.py) cover pairs.  This matrix
crosses {Trainer, EnsembleTrainer(shard_seeds on/off)} x
{checkpoint_every 1/4} x {early_stopping on/off} x {grad_accum 1/2} x
{epoch_block 1/4} and pins, for every combination, equality to its
per-epoch / dense-checkpoint oracle (same grad_accum and ES -- those
change the math/length by design, so they parametrize BOTH sides):
loss history, stop epoch, final weights, and BEST/LAST checkpoint
restores.
"""
import jax
import numpy as np
import pytest

from snnimageclassification_tpu.data.datasets import ArrayDataLoader, EncodeConfig
from snnimageclassification_tpu.models.config import SNNConfig
from snnimageclassification_tpu.parallel.ensemble import EnsembleTrainer
from snnimageclassification_tpu.train.checkpoint import LoadCheckpointMode
from snnimageclassification_tpu.train.trainer import Trainer

ENC = EncodeConfig(n_steps=4)
CFG = SNNConfig(input_size=6, output_size=3, n_hidden_neurons=8,
                int_time_steps=4)
NB_EPOCHS = 10


def _loaders():
    rng = np.random.default_rng(0)
    x = rng.random((56, 6)).astype(np.float32)
    y = rng.integers(0, 3, 56).astype(np.int32)
    tr = ArrayDataLoader(x[:40], y[:40], 10, shuffle=True, seed=5,
                         encode_config=ENC)
    va = ArrayDataLoader(x[40:], y[40:], 16, encode_config=ENC)
    return tr, va


def _assert_same_trees(a, b, rtol=1e-6, atol=1e-7):
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=rtol, atol=atol)


def _assert_ckpt_equal(t_a, t_b):
    for mode in (LoadCheckpointMode.BEST_EPOCH,
                 LoadCheckpointMode.LAST_EPOCH):
        ca = t_a.ckpt.load_checkpoint(mode)
        cb = t_b.ckpt.load_checkpoint(mode)
        assert ca["epoch"] == cb["epoch"], mode
        pa, _ = t_a.ckpt.restore(ca, t_a.params, t_a.opt_state)
        pb, _ = t_b.ckpt.restore(cb, t_b.params, t_b.opt_state)
        _assert_same_trees(pa, pb)


class TestTrainerMatrix:
    @pytest.mark.parametrize("grad_accum", [1, 2], ids=["ga1", "ga2"])
    @pytest.mark.parametrize("early_stopping", [False, True],
                             ids=["noES", "ES"])
    def test_combo_matches_per_epoch_oracle(self, tmp_path, early_stopping,
                                            grad_accum):
        kw = dict(nb_epochs=NB_EPOCHS, force_overwrite=True, verbose=False,
                  early_stopping=early_stopping, early_stopping_patience=2,
                  grad_accum=grad_accum)
        t_o = Trainer(CFG, checkpoint_folder=str(tmp_path / "oracle"),
                      seed=3)
        h_o = t_o.fit(*_loaders(), epoch_block=1, checkpoint_every=1, **kw)
        t_v = Trainer(CFG, checkpoint_folder=str(tmp_path / "combo"),
                      seed=3)
        h_v = t_v.fit(*_loaders(), epoch_block=4, checkpoint_every=4, **kw)

        assert len(h_v["train"]) == len(h_o["train"])  # stop epoch equal
        if early_stopping:
            # patience=2 over 10 epochs on noisy data: the ES branch must
            # actually engage, otherwise this row tests nothing.
            assert len(h_o["train"]) < NB_EPOCHS, "ES never triggered"
        for k in ("train", "val"):
            np.testing.assert_allclose(
                [float(v) for v in h_v[k]], [float(v) for v in h_o[k]],
                rtol=1e-6,
            )
        _assert_same_trees(t_o.params, t_v.params)
        _assert_ckpt_equal(t_o, t_v)


@pytest.mark.slow
class TestEnsembleMatrix:
    @pytest.mark.parametrize("grad_accum", [1, 2], ids=["ga1", "ga2"])
    @pytest.mark.parametrize("early_stopping", [False, True],
                             ids=["noES", "ES"])
    @pytest.mark.parametrize("shard_seeds", [False, True],
                             ids=["vmapped", "shard_seeds"])
    def test_combo_matches_per_epoch_oracle(self, tmp_path, shard_seeds,
                                            early_stopping, grad_accum):
        mesh = None
        seeds = (0, 1, 2)
        if shard_seeds:
            from snnimageclassification_tpu.parallel.mesh import make_mesh

            if len(jax.devices()) < 8:
                pytest.skip("needs the 8-virtual-device conftest")
            mesh, seeds = make_mesh(), tuple(range(8))
        kw = dict(nb_epochs=NB_EPOCHS, force_overwrite=True, verbose=False,
                  early_stopping=early_stopping, early_stopping_patience=2)

        def mk(tag):
            return EnsembleTrainer(
                CFG, seeds, checkpoint_folder=str(tmp_path / tag),
                mesh=mesh, shard_seeds=shard_seeds, grad_accum=grad_accum,
            )

        t_o = mk("oracle")
        h_o = t_o.fit(*_loaders(), epoch_block=1, checkpoint_every=1, **kw)
        t_v = mk("combo")
        h_v = t_v.fit(*_loaders(), epoch_block=4, checkpoint_every=4, **kw)

        assert len(h_v[0]["train"]) == len(h_o[0]["train"])
        if early_stopping:
            assert len(h_o[0]["train"]) < NB_EPOCHS, "ES never triggered"
        for ho, hv in zip(h_o, h_v):
            for k in ("train", "val"):
                np.testing.assert_allclose(
                    [float(v) for v in hv[k]], [float(v) for v in ho[k]],
                    rtol=1e-6,
                )
        _assert_same_trees(t_o.params, t_v.params)
        # Per-seed best snapshots survive the combination identically.
        t_o.load_best()
        t_v.load_best()
        _assert_same_trees(t_o.params, t_v.params)
