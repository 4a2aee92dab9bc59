"""End-to-end training: fit on synthetic data must learn (the reference
has no such test; config modeled on the fast n_steps=2 setup of
__main__.py:69), plus resume, early stopping, beta freezing, and the SNN
facade surface."""
import numpy as np
import pytest

import snnimageclassification_tpu as st
from snnimageclassification_tpu.data.datasets import (
    ArrayDataLoader,
    DatasetId,
    EncodeConfig,
    get_dataloaders,
)
from snnimageclassification_tpu.train.checkpoint import LoadCheckpointMode
from snnimageclassification_tpu.train.trainer import Trainer


def _toy_loaders(n_steps=2, batch_size=32, n=256, use_periods=False, seed=0):
    """Small learnable 10-class problem: class prototypes + noise."""
    rng = np.random.default_rng(seed)
    protos = rng.random((10, 64)).astype(np.float32)
    y = (np.arange(n) % 10).astype(np.int32)
    x = np.clip(protos[y] + 0.1 * rng.standard_normal((n, 64)).astype(np.float32), 0, 1)
    enc = EncodeConfig(n_steps=n_steps, use_periods=use_periods)
    split = int(0.8 * n)
    mk = lambda lo, hi, sh: ArrayDataLoader(
        x[lo:hi], y[lo:hi], batch_size, shuffle=sh, encode_config=enc, seed=seed
    )
    return mk(0, split, True), mk(split, n, False)


def _mk_cfg(tmp_path, **kw):
    defaults = dict(
        input_size=64, output_size=10, n_hidden_neurons=32,
        hidden_layer_type=st.LayerType.ALIF, use_recurrent_connection=False,
        int_time_steps=2,
    )
    defaults.update(kw)
    return st.SNNConfig(**defaults)


class TestFit:
    def test_fit_learns_above_chance(self, tmp_path):
        cfg = _mk_cfg(tmp_path)
        trainer = Trainer(cfg, checkpoint_folder=str(tmp_path / "ck"), seed=0)
        train, val = _toy_loaders()
        history = trainer.fit(
            train, val, nb_epochs=8, force_overwrite=True, verbose=False
        )
        assert len(history["train"]) == 8
        assert history["train"][-1] < history["train"][0]
        acc = trainer.compute_classification_accuracy(val)
        # TTFS-encoded ALIF at T=2 (the reference's own fast __main__
        # config) separates the toy prototypes far above 10-class chance.
        assert acc > 0.6

    def test_grad_accum_matches_bigger_batch(self, tmp_path):
        """fit(grad_accum=K) at batch B must equal fit at batch K*B: with
        uniform weights and equal micro-batch sizes the accumulated mean
        grad IS the big-batch mean grad, so the Adam trajectories match
        to float rounding (MultiSteps' running mean vs one reduction)."""
        cfg = _mk_cfg(tmp_path)
        # shuffle=False so both runs see identical sample order.
        rng = np.random.default_rng(5)
        protos = rng.random((10, 64)).astype(np.float32)
        y = (np.arange(64) % 10).astype(np.int32)
        x = np.clip(
            protos[y] + 0.1 * rng.standard_normal((64, 64)).astype(np.float32),
            0, 1,
        )
        enc = EncodeConfig(n_steps=2)
        mk = lambda bs: ArrayDataLoader(
            x, y, bs, shuffle=False, encode_config=enc, seed=0
        )
        val = ArrayDataLoader(
            x[:32], y[:32], 32, shuffle=False, encode_config=enc, seed=0
        )
        t_acc = Trainer(cfg, checkpoint_folder=str(tmp_path / "a"), seed=3)
        t_acc.fit(mk(16), val, nb_epochs=2, grad_accum=2,
                  force_overwrite=True, verbose=False)
        t_big = Trainer(cfg, checkpoint_folder=str(tmp_path / "b"), seed=3)
        t_big.fit(mk(32), val, nb_epochs=2,
                  force_overwrite=True, verbose=False)
        import jax

        for la, lb in zip(
            jax.tree_util.tree_leaves(t_acc.params),
            jax.tree_util.tree_leaves(t_big.params),
        ):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=1e-5, atol=1e-6
            )

    def test_grad_accum_checkpoint_roundtrip(self, tmp_path):
        """MultiSteps opt_state (accumulator + counter) must survive the
        packed checkpoint round trip and resume mid-accumulation."""
        cfg = _mk_cfg(tmp_path)
        folder = str(tmp_path / "ck")
        train, val = _toy_loaders()
        t1 = Trainer(cfg, checkpoint_folder=folder, seed=0)
        t1.fit(train, val, nb_epochs=2, grad_accum=2,
               force_overwrite=True, verbose=False)
        t2 = Trainer(cfg, checkpoint_folder=folder, seed=1)
        hist = t2.fit(
            train, val, nb_epochs=4, grad_accum=2,
            load_checkpoint_mode=LoadCheckpointMode.LAST_EPOCH,
            verbose=False,
        )
        assert len(hist["train"]) == 4

    def test_grad_accum_change_resets_opt_state(self, tmp_path, caplog):
        """K -> K' keeps an identical MultiStepsState STRUCTURE, so the
        structural check alone would silently carry a half-filled
        accumulator between fits; any grad_accum change must reset."""
        import logging

        cfg = _mk_cfg(tmp_path)
        trainer = Trainer(cfg, checkpoint_folder=str(tmp_path / "ck"), seed=0)
        train, val = _toy_loaders(n=96)  # 3 batches: K=2 ends mid-window
        trainer.fit(train, val, nb_epochs=1, grad_accum=2,
                    force_overwrite=True, verbose=False)
        with caplog.at_level(logging.WARNING):
            trainer.fit(
                train, val, nb_epochs=2, grad_accum=4,
                load_checkpoint_mode=LoadCheckpointMode.LAST_EPOCH,
                verbose=False,
            )
        assert any("grad_accum changed" in r.message for r in caplog.records)

    def test_lr_schedule(self, tmp_path):
        """fit(lr=<optax schedule>) threads the callable through to Adam
        (beyond-reference production knob); training still learns and the
        schedule state survives the packed checkpoint."""
        import optax

        cfg = _mk_cfg(tmp_path)
        trainer = Trainer(cfg, checkpoint_folder=str(tmp_path / "ck"), seed=0)
        train, val = _toy_loaders()
        sched = optax.exponential_decay(
            init_value=1e-3, transition_steps=10, decay_rate=0.5
        )
        hist = trainer.fit(train, val, nb_epochs=6, lr=sched,
                           force_overwrite=True, verbose=False)
        assert hist["train"][-1] < hist["train"][0]
        t2 = Trainer(cfg, checkpoint_folder=str(tmp_path / "ck"), seed=1)
        h2 = t2.fit(
            train, val, nb_epochs=8, lr=sched,
            load_checkpoint_mode=LoadCheckpointMode.LAST_EPOCH,
            verbose=False,
        )
        assert len(h2["train"]) == 8

    def test_ensemble_grad_accum_runs(self, tmp_path):
        from snnimageclassification_tpu.parallel.ensemble import (
            EnsembleTrainer,
        )

        cfg = _mk_cfg(tmp_path)
        train, val = _toy_loaders(n=128)
        ens = EnsembleTrainer(
            cfg, seeds=[0, 1], grad_accum=2,
            checkpoint_folder=str(tmp_path / "ens"),
        )
        hists = ens.fit(train, val, nb_epochs=2, force_overwrite=True,
                        verbose=False)
        assert all(len(h["train"]) == 2 for h in hists)

    def test_beta_frozen_during_fit(self, tmp_path):
        cfg = _mk_cfg(tmp_path, learn_beta=True)
        trainer = Trainer(cfg, checkpoint_folder=str(tmp_path / "ck"), seed=0)
        beta0 = float(trainer.params["input"]["beta"])
        train, val = _toy_loaders()
        trainer.fit(train, val, nb_epochs=2, force_overwrite=True, verbose=False)
        # Quirk Q3: dead gradient + masked optimizer -> bitwise frozen.
        assert float(trainer.params["input"]["beta"]) == beta0

    def test_resume_from_last_epoch(self, tmp_path):
        cfg = _mk_cfg(tmp_path)
        folder = str(tmp_path / "ck")
        train, val = _toy_loaders()
        t1 = Trainer(cfg, checkpoint_folder=folder, seed=0)
        t1.fit(train, val, nb_epochs=3, force_overwrite=True, verbose=False)

        t2 = Trainer(cfg, checkpoint_folder=folder, seed=1)
        history = t2.fit(
            train, val, nb_epochs=6,
            load_checkpoint_mode=LoadCheckpointMode.LAST_EPOCH, verbose=False,
        )
        # 3 resumed epochs + 3 new ones
        assert len(history["train"]) == 6

    def test_resume_past_end_returns_immediately(self, tmp_path):
        cfg = _mk_cfg(tmp_path)
        folder = str(tmp_path / "ck")
        train, val = _toy_loaders()
        t1 = Trainer(cfg, checkpoint_folder=folder, seed=0)
        t1.fit(train, val, nb_epochs=3, force_overwrite=True, verbose=False)
        t2 = Trainer(cfg, checkpoint_folder=folder, seed=0)
        history = t2.fit(
            train, val, nb_epochs=3,
            load_checkpoint_mode=LoadCheckpointMode.LAST_EPOCH, verbose=False,
        )
        assert len(history["train"]) == 3  # nothing new ran

    def test_fresh_fit_without_overwrite_raises(self, tmp_path):
        """Quirk Q5 caller contract: existing meta + no mode + no
        force_overwrite -> assertion error (snn.py:302-307)."""
        cfg = _mk_cfg(tmp_path)
        folder = str(tmp_path / "ck")
        train, val = _toy_loaders()
        t1 = Trainer(cfg, checkpoint_folder=folder, seed=0)
        t1.fit(train, val, nb_epochs=1, force_overwrite=True, verbose=False)
        t2 = Trainer(cfg, checkpoint_folder=folder, seed=0)
        with pytest.raises(AssertionError):
            t2.fit(train, val, nb_epochs=1, verbose=False)

    def test_early_stopping_plateau(self, tmp_path):
        cfg = _mk_cfg(tmp_path)
        trainer = Trainer(cfg, checkpoint_folder=str(tmp_path / "ck"), seed=0)
        # Inject a flat val history; the detector reads the last `patience`
        # entries (snn.py:272-278).
        trainer.loss_history.concat({"val": [1.0, 1.0, 1.0, 1.0, 1.0]})
        assert trainer._check_early_stopping(patience=5)
        trainer.loss_history.concat({"val": [0.5]})
        assert not trainer._check_early_stopping(patience=5)

    def test_early_stopping_underfull_window_stops_first_epoch(self, tmp_path):
        """Reference quirk: with fewer than 2 val losses the diff window
        is empty and ``np.all([]) is True`` (snn.py:272-278), so
        ``early_stopping=True`` stops after the FIRST epoch regardless of
        the losses.  Pinned at the detector level and end to end."""
        cfg = _mk_cfg(tmp_path)
        trainer = Trainer(cfg, checkpoint_folder=str(tmp_path / "ck"), seed=0)
        trainer.loss_history.concat({"val": [123.0]})  # steep, single entry
        assert trainer._check_early_stopping(patience=5)

        trainer2 = Trainer(
            _mk_cfg(tmp_path), checkpoint_folder=str(tmp_path / "ck2"), seed=0
        )
        train, val = _toy_loaders()
        history = trainer2.fit(
            train, val, nb_epochs=8, force_overwrite=True,
            early_stopping=True, verbose=False,
        )
        assert len(history["val"]) == 1

    def test_best_epoch_reload_gives_best_val(self, tmp_path):
        cfg = _mk_cfg(tmp_path)
        folder = str(tmp_path / "ck")
        train, val = _toy_loaders()
        trainer = Trainer(cfg, checkpoint_folder=folder, seed=0)
        history = trainer.fit(
            train, val, nb_epochs=5, force_overwrite=True, verbose=False
        )
        payload = trainer.load_checkpoint(LoadCheckpointMode.BEST_EPOCH)
        best_epoch = int(np.argmin(history["val"]))
        assert payload["epoch"] == best_epoch


class TestSNNFacade:
    def test_constructor_and_prediction_surface(self, tmp_path):
        net = st.SNN(
            inputs_size=64, output_size=10, n_hidden_neurons=32,
            spike_func=st.SpikeFuncType.FastSigmoid,
            hidden_layer_type=st.LayerType.ALIF,
            use_recurrent_connection=True, int_time_steps=4,
            checkpoint_folder=str(tmp_path / "ck"), learn_beta=True,
        )
        x = np.random.default_rng(0).random((3, 64)).astype(np.float32)
        trace, hidden = net(x)
        assert trace.shape == (3, 4, 10)
        logits, trace2, hidden2 = net.get_prediction_logits(x)
        assert logits.shape == (3, 10)
        proba = net.get_prediction_proba(x, False, False)
        np.testing.assert_allclose(np.asarray(proba).sum(-1), 1.0, rtol=1e-5)
        logp = net.get_prediction_log_proba(x, False, False)
        assert np.all(np.asarray(logp) <= 0)
        counts = net.get_spikes_count_per_neuron(hidden)
        assert counts.shape == (32,)

    def test_unknown_kwarg_rejected(self, tmp_path):
        with pytest.raises(TypeError):
            st.SNN(inputs_size=4, output_size=2, bogus_kwarg=1)

    def test_fit_and_eval_through_facade(self, tmp_path):
        net = st.SNN(
            inputs_size=64, output_size=10, n_hidden_neurons=32,
            hidden_layer_type=st.LayerType.ALIF,
            use_recurrent_connection=False, int_time_steps=2,
            checkpoint_folder=str(tmp_path / "ck"),
        )
        train, val = _toy_loaders()
        net.fit(train, val, nb_epochs=3, force_overwrite=True, verbose=False)
        acc = net.compute_classification_accuracy(val)
        assert 0.0 <= acc <= 1.0
        cms = net.compute_confusion_matrix(10, {"val": val})
        assert cms["val"].shape == (10, 10)
        assert cms["val"].sum() == val.n_samples

    def test_export_stablehlo(self, tmp_path):
        net = st.SNN(
            inputs_size=8, output_size=2, n_hidden_neurons=4,
            int_time_steps=2, checkpoint_folder=str(tmp_path / "ck"),
        )
        text = net.export_stablehlo()
        assert "stablehlo" in text or "module" in text


class TestSweep:
    def test_hash_params_stable(self):
        from snnimageclassification_tpu.train.sweep import get_meta_name, hash_params

        params = {"a": 1, "b": True}
        assert get_meta_name(params) == "a-1_b-True"
        assert hash_params(params) == hash_params({"a": 1, "b": True})
        assert hash_params(params) != hash_params({"a": 2, "b": True})

    def test_all_params_combinations(self):
        from snnimageclassification_tpu.train.sweep import get_all_params_combinations

        combos = get_all_params_combinations({"a": [1, 2], "b": ["x", "y", "z"]})
        assert len(combos) == 6
        assert {"a": 1, "b": "x"} in combos

    def test_train_with_params_and_sweep_resume(self, tmp_path, monkeypatch):
        """Mini sweep on synthetic data: runs, writes results.csv, resumes
        by skipping completed hashes (training.py:176-177)."""
        monkeypatch.chdir(tmp_path)
        from snnimageclassification_tpu.train import sweep

        grid = {
            "dataset_id": [DatasetId.MNIST],
            "to_spikes_use_periods": [False],
            "n_steps": [2],
            "n_hidden_neurons": [16],
            "spike_func": [st.SpikeFuncType.FastSigmoid],
            "hidden_layer_type": [st.LayerType.ALIF],
            "use_recurrent_connection": [False],
            "learn_beta": [False],
            "nb_epochs": [1],
        }
        df = sweep.train_all_params(
            grid, data_folder=str(tmp_path / "tr"), verbose=False,
            batch_size=64, data_dir=str(tmp_path / "none"),
        )
        assert len(df) == 1
        assert 0.0 <= df["test_accuracy"].iloc[0] <= 1.0
        # resume: nothing new to run, same row count
        df2 = sweep.train_all_params(
            grid, data_folder=str(tmp_path / "tr"), verbose=False,
            batch_size=64, data_dir=str(tmp_path / "none"),
        )
        assert len(df2) == 1


class TestMeshFacadeAndExport:
    def test_snn_with_mesh_and_export(self, tmp_path):
        from snnimageclassification_tpu.parallel.mesh import make_mesh

        net = st.SNN(
            inputs_size=64, output_size=10, n_hidden_neurons=16,
            use_recurrent_connection=False, int_time_steps=2,
            checkpoint_folder=str(tmp_path / "ck"), mesh=make_mesh(),
        )
        train, val = _toy_loaders()
        net.fit(train, val, nb_epochs=2, force_overwrite=True, verbose=False)
        assert 0.0 <= net.compute_classification_accuracy(val) <= 1.0
        path = net.to_onnx()
        assert path.endswith(".stablehlo")
        import os
        assert os.path.getsize(path) > 0

    def test_sweep_with_mesh(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from snnimageclassification_tpu.parallel.mesh import make_mesh
        from snnimageclassification_tpu.train import sweep

        result = sweep.train_with_params(
            {
                "dataset_id": DatasetId.MNIST,
                "to_spikes_use_periods": False,
                "n_steps": 2,
                "n_hidden_neurons": 16,
                "spike_func": st.SpikeFuncType.FastSigmoid,
                "hidden_layer_type": st.LayerType.ALIF,
                "use_recurrent_connection": False,
                "nb_epochs": 1,
            },
            data_folder=str(tmp_path / "tr"),
            batch_size=64,
            data_dir=str(tmp_path / "none"),
            mesh=make_mesh(),
        )
        assert 0.0 <= result["accuracies"]["test"] <= 1.0


class TestPredictLogits:
    def test_predict_logits_matches_eval_path(self, tmp_path):
        cfg = _mk_cfg(tmp_path)
        trainer = Trainer(cfg, checkpoint_folder=str(tmp_path / "ck"), seed=0)
        x = np.random.default_rng(0).random((4, 64)).astype(np.float32)
        enc = EncodeConfig(n_steps=2, use_periods=False)
        logits = trainer.predict_logits(x, enc)
        assert logits.shape == (4, 10)

        from snnimageclassification_tpu.models import snn as M
        from snnimageclassification_tpu.ops.encoding import encode_spikes

        spikes = encode_spikes(x, n_steps=2, use_periods=False)
        expected = M.forward_logits(cfg, trainer.params, spikes)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(expected), rtol=1e-5, atol=1e-6
        )


class TestOptimizerHyperparams:
    def test_fit_lr_honored_after_eval(self, tmp_path):
        """Review finding: an eval before fit used to freeze the optimizer
        at default hyperparameters."""
        cfg = _mk_cfg(tmp_path)
        trainer = Trainer(cfg, checkpoint_folder=str(tmp_path / "ck"), seed=0)
        train, val = _toy_loaders()
        trainer.compute_classification_accuracy(val)  # builds default opt
        trainer.fit(train, val, lr=0.5, nb_epochs=1,
                    force_overwrite=True, verbose=False)
        assert trainer._opt_hparams == (0.5, 1e-5, None, None)

    def test_second_fit_can_change_lr(self, tmp_path):
        cfg = _mk_cfg(tmp_path)
        trainer = Trainer(cfg, checkpoint_folder=str(tmp_path / "ck"), seed=0)
        train, val = _toy_loaders()
        trainer.fit(train, val, lr=1e-3, nb_epochs=1,
                    force_overwrite=True, verbose=False)
        trainer.fit(train, val, lr=1e-4, nb_epochs=2,
                    load_checkpoint_mode=LoadCheckpointMode.LAST_EPOCH,
                    verbose=False)
        assert trainer._opt_hparams == (1e-4, 1e-5, None, None)

    def test_eval_does_not_stomp_fit_hparams(self, tmp_path):
        cfg = _mk_cfg(tmp_path)
        trainer = Trainer(cfg, checkpoint_folder=str(tmp_path / "ck"), seed=0)
        train, val = _toy_loaders()
        trainer.fit(train, val, lr=5e-4, nb_epochs=1,
                    force_overwrite=True, verbose=False)
        trainer.compute_classification_accuracy(val)
        assert trainer._opt_hparams == (5e-4, 1e-5, None, None)


class TestFacadeConfigKnobs:
    def test_matmul_dtype_and_use_pallas_accepted(self, tmp_path):
        net = st.SNN(
            inputs_size=8, output_size=2, n_hidden_neurons=4,
            int_time_steps=2, checkpoint_folder=str(tmp_path / "ck"),
            matmul_dtype="bfloat16", use_pallas=False,
        )
        assert net.config.matmul_dtype_eff == "bfloat16"
        assert net.config.use_pallas is False


class TestSpikeCountParity:
    def test_izhikevich_excluded_like_reference(self, tmp_path):
        """snn.py:268's isinstance(layer, LIFLayer) excludes Izhikevich."""
        net = st.SNN(
            inputs_size=8, output_size=2, n_hidden_neurons=4,
            hidden_layer_type=st.LayerType.Izhikevich, int_time_steps=2,
            checkpoint_folder=str(tmp_path / "ck"),
        )
        x = np.random.default_rng(0).random((2, 8)).astype(np.float32)
        _, hidden = net(x)
        counts = net.get_spikes_count_per_neuron(hidden)
        assert counts.shape == (0,)

        from snnimageclassification_tpu.train import losses as L

        assert float(L.l1_total_spike_count(hidden, cfg=net.config)) == 0.0


class TestGradClipping:
    """max_grad_norm: opt-in stability knob, off by default (parity)."""

    def test_clip_caps_update(self):
        import jax
        import jax.numpy as jnp
        import optax

        from snnimageclassification_tpu.train.trainer import make_optimizer

        params = {"layer": {"w_in": jnp.ones((4, 4)), "beta": jnp.ones(())}}
        labels = {"layer": {"w_in": "weight", "beta": "beta"}}
        grads = {"layer": {"w_in": jnp.full((4, 4), 100.0),
                           "beta": jnp.zeros(())}}
        tx = make_optimizer(labels, max_grad_norm=1.0)
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        # After clipping, Adam normalizes -- but the clipped gradient fed
        # to the moments has global norm 1; verify the chain ran (beta
        # still frozen, update finite and nonzero).
        assert float(jnp.abs(updates["layer"]["beta"])) == 0.0
        assert 0 < float(jnp.max(jnp.abs(updates["layer"]["w_in"]))) < 1.0
        # Structure differs from the unclipped chain (extra stage).
        tx0 = make_optimizer(labels)
        assert (jax.tree_util.tree_structure(tx0.init(params))
                != jax.tree_util.tree_structure(state))

    def test_fit_with_clip_and_toggle(self, tmp_path):
        import numpy as np

        from snnimageclassification_tpu.data.datasets import (
            ArrayDataLoader,
            EncodeConfig,
        )
        from snnimageclassification_tpu.models.config import SNNConfig
        from snnimageclassification_tpu.train.trainer import Trainer

        rng = np.random.default_rng(0)
        x = rng.random((40, 6)).astype(np.float32)
        y = rng.integers(0, 3, 40).astype(np.int32)
        enc = EncodeConfig(n_steps=4)
        tr_l = ArrayDataLoader(x[:32], y[:32], 16, shuffle=True,
                               encode_config=enc)
        va_l = ArrayDataLoader(x[32:], y[32:], 16, encode_config=enc)
        cfg = SNNConfig(input_size=6, output_size=3, n_hidden_neurons=8,
                        int_time_steps=4)
        t = Trainer(cfg, checkpoint_folder=str(tmp_path))
        h = t.fit(tr_l, va_l, nb_epochs=2, max_grad_norm=0.5,
                  force_overwrite=True)
        assert np.isfinite(h["train"]).all()
        # Toggling clipping off between fits resets the optimizer state
        # (structure changed) but keeps training functional.
        h2 = t.fit(tr_l, va_l, nb_epochs=4, force_overwrite=True)
        assert np.isfinite(h2["train"]).all()
