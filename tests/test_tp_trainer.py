"""Trainer.fit with a 2-D (data, model) mesh: the tensor-parallel path
through the production fit/eval/checkpoint surface.

`tests/test_tp.py` pins the shard_map step against the single-device
oracle; this file pins the *Trainer integration*: same fit loop, loss
history, checkpoint files, resume and prediction surface as the
single-device path, with the compute column-sharded over "model" and the
batch sharded over "data" (parallel/tp.py).

Runs on the conftest's virtual 8-device CPU platform.  Forward parity is
bitwise (column sharding never splits a contraction); multi-epoch losses
see the data-axis batch-reduction reorder compounding through training
and get a small tolerance.
"""
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import snnimageclassification_tpu as st
from snnimageclassification_tpu.data.datasets import ArrayDataLoader, EncodeConfig
from snnimageclassification_tpu.parallel import tp
from snnimageclassification_tpu.train.checkpoint import LoadCheckpointMode
from snnimageclassification_tpu.train.trainer import Trainer

N_FEATURES = 64
ENC = EncodeConfig(n_steps=4, use_periods=True)


def _loaders(seed=0, n=128, batch_size=32):
    """Small learnable 10-class problem; fresh loaders per trainer so the
    shuffle rng sequences match across compared runs."""
    rng = np.random.default_rng(seed)
    protos = rng.random((10, N_FEATURES)).astype(np.float32)
    y = (np.arange(n) % 10).astype(np.int32)
    x = np.clip(
        protos[y] + 0.1 * rng.standard_normal((n, N_FEATURES)).astype(np.float32),
        0, 1,
    )
    split = int(0.75 * n)
    mk = lambda lo, hi, sh: ArrayDataLoader(
        x[lo:hi], y[lo:hi], batch_size, shuffle=sh, encode_config=ENC, seed=seed
    )
    return mk(0, split, True), mk(split, n, False)


def _cfg(**kw):
    base = dict(
        input_size=N_FEATURES, output_size=10, n_hidden_neurons=32,
        hidden_layer_type=st.LayerType.ALIF, use_recurrent_connection=True,
        int_time_steps=4,
    )
    base.update(kw)
    return st.SNNConfig(**base)


@pytest.fixture(scope="module")
def mesh():
    return tp.make_2d_mesh(4, 2)


def _fit(tmp_path, tag, mesh=None, nb_epochs=3, epoch_block=1, seed=7, **fit_kw):
    tr = Trainer(
        _cfg(), checkpoint_folder=str(tmp_path / tag), seed=seed, mesh=mesh
    )
    tl, vl = _loaders()
    hist = tr.fit(
        tl, vl, nb_epochs=nb_epochs, force_overwrite=True, verbose=False,
        epoch_block=epoch_block, **fit_kw,
    )
    return tr, hist


class TestTPFit:
    def test_fit_matches_single_device(self, tmp_path, mesh):
        _, hist_1d = _fit(tmp_path, "single")
        _, hist_tp = _fit(tmp_path, "tp", mesh=mesh)
        np.testing.assert_allclose(
            hist_tp["train"], hist_1d["train"], atol=2e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            hist_tp["val"], hist_1d["val"], atol=2e-4, rtol=1e-4
        )

    def test_epoch_block_matches_per_epoch(self, tmp_path, mesh):
        _, hist_1 = _fit(tmp_path, "tp-e1", mesh=mesh, nb_epochs=4)
        _, hist_4 = _fit(tmp_path, "tp-e4", mesh=mesh, nb_epochs=4,
                         epoch_block=4)
        np.testing.assert_array_equal(hist_4["train"], hist_1["train"])
        np.testing.assert_array_equal(hist_4["val"], hist_1["val"])

    def test_resume_continues_trajectory(self, tmp_path, mesh):
        _, hist_full = _fit(tmp_path, "tp-full", mesh=mesh, nb_epochs=4)

        _fit(tmp_path, "tp-resume", mesh=mesh, nb_epochs=2)
        tr2 = Trainer(
            _cfg(), checkpoint_folder=str(tmp_path / "tp-resume"), seed=7,
            mesh=mesh,
        )
        tl, vl = _loaders()
        # Replay the first two epochs' shuffle draws so the resumed rng
        # stream lines up with the uninterrupted run.
        for _ in range(2):
            list(tl.iter_indices())
            list(vl.iter_indices())
        hist = tr2.fit(
            tl, vl, nb_epochs=4, verbose=False, epoch_block=1,
            load_checkpoint_mode=LoadCheckpointMode.LAST_EPOCH,
        )
        np.testing.assert_allclose(
            hist["val"], hist_full["val"], atol=2e-4, rtol=1e-4
        )

    def test_checkpoint_best_reload_and_accuracy(self, tmp_path, mesh):
        tr, hist = _fit(tmp_path, "tp-best", mesh=mesh, nb_epochs=3)
        ckpt = tr.load_checkpoint(LoadCheckpointMode.BEST_EPOCH)
        best_epoch = int(np.argmin(hist["val"]))
        assert int(ckpt[tr.ckpt.CHECKPOINT_EPOCH_KEY]) == best_epoch
        # Params landed back in their TP shardings.
        for name, group in tr.params.items():
            for key, leaf in group.items():
                assert isinstance(leaf, jax.Array) and len(leaf.devices()) == 8
        _, vl = _loaders()
        acc = tr.compute_classification_accuracy(vl)
        assert 0.0 <= acc <= 1.0

    def test_predict_matches_single_device_bitwise(self, tmp_path, mesh):
        cfg = _cfg()
        tr_1d = Trainer(cfg, checkpoint_folder=str(tmp_path / "p1"), seed=3)
        tr_tp = Trainer(cfg, checkpoint_folder=str(tmp_path / "p2"), seed=3,
                        mesh=mesh)
        rng = np.random.default_rng(5)
        # 30 rows: NOT divisible by the 4-wide data axis -- exercises the
        # pad-and-slice path.
        x = rng.random((30, N_FEATURES)).astype(np.float32)
        got = tr_tp.predict_logits(x, ENC)
        want = tr_1d.predict_logits(x, ENC)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_eval_accuracy_matches_single_device(self, tmp_path, mesh):
        _, vl = _loaders()
        tr_1d = Trainer(_cfg(), checkpoint_folder=str(tmp_path / "a1"), seed=3)
        tr_tp = Trainer(_cfg(), checkpoint_folder=str(tmp_path / "a2"), seed=3,
                        mesh=mesh)
        assert tr_tp.compute_classification_accuracy(vl) == pytest.approx(
            tr_1d.compute_classification_accuracy(vl)
        )

    def test_tp_step_hlo_has_expected_collectives(self, tmp_path, mesh):
        """The compiled TP train step must contain the structural
        collectives the design promises (parallel/tp.py): the per-step
        spike all-gather over "model" and an all-reduce (the loss psum /
        DP gradient sync).  Guards against a silent fall-back to
        replicated compute."""
        tr = Trainer(_cfg(), checkpoint_folder=str(tmp_path / "hlo"),
                     seed=7, mesh=mesh)
        tr._ensure_optimizer(1e-3, 1e-5)
        train_step = tr._steps_for(ENC)[0]
        tl, _ = _loaders()
        xb, yb, wb = tr._prep_batch(*next(iter(tl)), target=tl.batch_size)
        txt = train_step.lower(
            tr.params, tr.opt_state, xb, yb, wb
        ).compile().as_text()
        assert "all-gather" in txt
        assert "all-reduce" in txt

    def test_custom_criterion_rejected(self, tmp_path, mesh):
        with pytest.raises(ValueError, match="criteria"):
            Trainer(
                _cfg(), checkpoint_folder=str(tmp_path / "c"), mesh=mesh,
                criterion=lambda logits, y, w=None: logits.sum(),
            )

    def test_reg_fn_rejected(self, tmp_path, mesh):
        from snnimageclassification_tpu.train.losses import l1_total_spike_count

        with pytest.raises(ValueError, match="reg_fn"):
            Trainer(
                _cfg(), checkpoint_folder=str(tmp_path / "r"), mesh=mesh,
                reg_fn=l1_total_spike_count,
            )
