"""Spike regularizers (train/losses.py) + multi-seed ensemble trainer."""
import jax
import numpy as np
import pytest

import snnimageclassification_tpu as st
from snnimageclassification_tpu.data.datasets import ArrayDataLoader, EncodeConfig
from snnimageclassification_tpu.models import snn as M
from snnimageclassification_tpu.parallel.ensemble import EnsembleTrainer, init_ensemble
from snnimageclassification_tpu.parallel.mesh import make_mesh
from snnimageclassification_tpu.train import losses as L
from snnimageclassification_tpu.train.trainer import Trainer


def _hidden_states():
    rng = np.random.default_rng(0)
    z = (rng.random((2, 5, 4)) > 0.5).astype(np.float32)
    v = rng.random((2, 5, 4)).astype(np.float32)
    a = rng.random((2, 5, 4)).astype(np.float32)
    vr = rng.random((2, 5, 3)).astype(np.float32)
    return {"input": (v, a, z), "readout": (vr,)}, z


class TestSpikeRegularizers:
    def test_l1_total(self):
        hs, z = _hidden_states()
        got = float(L.l1_total_spike_count(hs, scale=1e-5))
        assert got == pytest.approx(1e-5 * z.sum(), rel=1e-5)

    def test_l2_per_neuron(self):
        hs, z = _hidden_states()
        got = float(L.l2_spikes_per_neuron(hs, scale=1.0))
        expected = np.mean(z.sum(axis=(0, 1)) ** 2)
        assert got == pytest.approx(expected, rel=1e-5)

    def test_mean_count(self):
        hs, z = _hidden_states()
        got = float(L.mean_spike_count_per_neuron(hs))
        assert got == pytest.approx(np.mean(z.sum(axis=(0, 1))), rel=1e-5)

    def test_readout_excluded(self):
        hs, _ = _hidden_states()
        only_readout = {"readout": hs["readout"]}
        assert float(L.l1_total_spike_count(only_readout)) == 0.0

    def test_trainer_with_regularizer_runs(self, tmp_path):
        cfg = st.SNNConfig(
            input_size=16, output_size=4, n_hidden_neurons=8,
            hidden_layer_type=st.LayerType.ALIF,
            use_recurrent_connection=False, int_time_steps=3,
        )
        trainer = Trainer(
            cfg, checkpoint_folder=str(tmp_path / "ck"),
            reg_fn=L.l1_total_spike_count,
        )
        rng = np.random.default_rng(0)
        x = rng.random((32, 16)).astype(np.float32)
        y = (np.arange(32) % 4).astype(np.int32)
        enc = EncodeConfig(n_steps=3, use_periods=False)
        loader = ArrayDataLoader(x, y, 16, shuffle=True, encode_config=enc)
        history = trainer.fit(loader, loader, nb_epochs=2,
                              force_overwrite=True, verbose=False)
        assert np.isfinite(history["train"]).all()

    def test_regularizer_ignores_padding_rows(self, tmp_path):
        """Weight-0 padding rows (remainder-batch / mesh padding) must not
        inflate the regularization term: the trainer masks the hidden
        traces by the sample weights before reg_fn."""
        cfg = st.SNNConfig(
            input_size=16, output_size=4, n_hidden_neurons=8,
            hidden_layer_type=st.LayerType.ALIF,
            use_recurrent_connection=False, int_time_steps=3,
        )
        trainer = Trainer(
            cfg, checkpoint_folder=str(tmp_path / "ck"),
            reg_fn=L.l1_total_spike_count,
        )
        trainer._ensure_optimizer_any()
        enc = EncodeConfig(n_steps=3, use_periods=False)
        eval_step = trainer._steps_for(enc)[1]
        rng = np.random.default_rng(0)
        x = rng.random((5, 16)).astype(np.float32)
        y = (np.arange(5) % 4).astype(np.int32)
        w = np.ones(5, np.float32)
        loss_plain, _ = eval_step(trainer.params, x, y, w)
        # Pad with duplicated rows at weight 0 (what _prep_batch does).
        xp = np.concatenate([x, x[:3]])
        yp = np.concatenate([y, y[:3]])
        wp = np.concatenate([w, np.zeros(3, np.float32)])
        loss_padded, _ = eval_step(trainer.params, xp, yp, wp)
        np.testing.assert_allclose(
            float(loss_padded), float(loss_plain), rtol=1e-6
        )


class TestEnsemble:
    def _loader(self, n=128, seed=0):
        rng = np.random.default_rng(seed)
        protos = rng.random((4, 16)).astype(np.float32)
        y = (np.arange(n) % 4).astype(np.int32)
        x = np.clip(protos[y] + 0.1 * rng.standard_normal((n, 16)).astype(np.float32), 0, 1)
        enc = EncodeConfig(n_steps=2, use_periods=False)
        return ArrayDataLoader(x, y, 32, shuffle=True, encode_config=enc, seed=seed)

    def _cfg(self):
        return st.SNNConfig(
            input_size=16, output_size=4, n_hidden_neurons=8,
            hidden_layer_type=st.LayerType.ALIF,
            use_recurrent_connection=False, int_time_steps=2,
        )

    def test_init_ensemble_stacks_and_differs(self):
        cfg = self._cfg()
        params = init_ensemble(cfg, [0, 1, 2])
        assert params["input"]["w_in"].shape == (3, 16, 8)
        w = np.asarray(params["input"]["w_in"])
        assert not np.allclose(w[0], w[1])  # different seeds

    def test_ensemble_seed0_matches_single_trainer_init(self):
        cfg = self._cfg()
        params = init_ensemble(cfg, [0, 7])
        single = M.init(cfg, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(
            np.asarray(params["input"]["w_in"][0]),
            np.asarray(single["input"]["w_in"]),
        )

    def test_ensemble_trains_all_seeds(self):
        cfg = self._cfg()
        ens = EnsembleTrainer(cfg, seeds=[0, 1, 2], lr=3e-3)
        loader = self._loader()
        first = ens.train_epoch(loader)
        for _ in range(5):
            last = ens.train_epoch(loader)
        assert first.shape == (3,)
        assert (last < first).all()  # every replica's loss fell
        accs = ens.accuracies(loader)
        assert accs.shape == (3,)
        assert (accs > 0.3).all()

    def test_ensemble_fused_replica_path_matches_vmapped(self):
        """The unrolled per-replica path (fused_replicas=True -- on TPU it
        runs the whole-network Pallas kernels; here it exercises the same
        unrolled plumbing over the XLA fallback) produces the same losses
        and trained params as the vmapped path."""
        cfg = self._cfg()
        loader_a, loader_b = self._loader(), self._loader()
        ens_u = EnsembleTrainer(cfg, seeds=[0, 1], fused_replicas=True)
        ens_v = EnsembleTrainer(cfg, seeds=[0, 1], fused_replicas=False)
        for _ in range(2):
            lu = ens_u.train_epoch(loader_a)
            lv = ens_v.train_epoch(loader_b)
        np.testing.assert_allclose(lu, lv, rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            ),
            ens_u.params, ens_v.params,
        )
        au = ens_u.accuracies(self._loader())
        av = ens_v.accuracies(self._loader())
        np.testing.assert_allclose(au, av)

    def test_ensemble_early_stopping_underfull_window_stops_first_epoch(self):
        """Same oracle as Trainer: the reference's plateau detector
        (snn.py:272-278) evaluates True on an under-full window
        (``np.all([]) is True``), so ``early_stopping=True`` stops the
        ensemble after the first epoch too."""
        cfg = self._cfg()
        ens = EnsembleTrainer(cfg, seeds=[0, 1])
        loader = self._loader()
        histories = ens.fit(
            loader, loader, nb_epochs=6, early_stopping=True, verbose=False
        )
        assert all(len(h["val"]) == 1 for h in histories)

    def test_ensemble_on_mesh(self):
        """Mesh ensemble (now on the whole-epoch scan path) matches the
        single-device ensemble on identical data order."""
        cfg = self._cfg()
        mesh = make_mesh()
        ens = EnsembleTrainer(cfg, seeds=[0, 1], mesh=mesh)
        losses = ens.train_epoch(self._loader())
        assert losses.shape == (2,)
        assert np.isfinite(losses).all()
        accs = ens.accuracies(self._loader())
        assert accs.shape == (2,)

        ens_sd = EnsembleTrainer(cfg, seeds=[0, 1])
        losses_sd = ens_sd.train_epoch(self._loader())
        accs_sd = ens_sd.accuracies(self._loader())
        np.testing.assert_allclose(losses, losses_sd, rtol=1e-5)
        np.testing.assert_allclose(accs, accs_sd, rtol=1e-6)

    def test_ensemble_fit_matches_sequential_fits(self, tmp_path):
        """One vmapped N-seed fit == N sequential Trainer fits with the
        same seeds and same data order: per-seed loss histories, best-val
        epoch selection, and post-BEST-reload accuracies all agree."""
        cfg = self._cfg()
        seeds = [0, 7]
        nb_epochs = 4

        ens = EnsembleTrainer(
            cfg, seeds=seeds, checkpoint_folder=str(tmp_path / "ens")
        )
        hists = ens.fit(
            self._loader(seed=0), self._loader(seed=1),
            nb_epochs=nb_epochs, verbose=False,
        )
        ens.load_best()
        ens_test_accs = ens.accuracies(self._loader(seed=2))

        for i, seed in enumerate(seeds):
            tr = Trainer(
                cfg, checkpoint_folder=str(tmp_path / f"seq{seed}"), seed=seed
            )
            # Fresh loaders with identical seeds -> identical batch order.
            hist = tr.fit(
                self._loader(seed=0), self._loader(seed=1),
                nb_epochs=nb_epochs, force_overwrite=True, verbose=False,
            )
            np.testing.assert_allclose(
                hists[i]["train"], hist["train"], rtol=2e-4, atol=1e-6
            )
            np.testing.assert_allclose(
                hists[i]["val"], hist["val"], rtol=2e-4, atol=1e-6
            )
            # Same best-val epoch choice...
            seq_best_epoch = int(np.argmin(hist["val"]))
            assert int(ens.best_epoch[i]) == seq_best_epoch
            # ...and the same accuracy after reloading BEST_EPOCH.
            tr.load_checkpoint()
            seq_acc = tr.compute_classification_accuracy(self._loader(seed=2))
            n = self._loader(seed=2).n_samples
            assert abs(float(ens_test_accs[i]) - seq_acc) <= 1.0 / n + 1e-9

    def test_ensemble_fit_records_checkpoints_and_best(self, tmp_path):
        cfg = self._cfg()
        ens = EnsembleTrainer(cfg, seeds=[0, 1],
                              checkpoint_folder=str(tmp_path / "ck"))
        ens.fit(self._loader(), self._loader(seed=1), nb_epochs=2, verbose=False)
        import json
        meta = json.loads(
            (tmp_path / "ck" / "snn_ensemble-checkpoints.json").read_text()
        )
        assert set(meta["epochs"]) == {"0", "1"}
        assert set(meta["best_per_seed"]) == {"0", "1"}
        assert all(len(h["train"]) == 2 for h in ens.histories)

    def test_ensemble_resume_last_epoch_matches_continuous(self, tmp_path):
        """2 epochs + LAST_EPOCH resume for 2 more == one 4-epoch run:
        identical per-seed histories, final params, opt state effects, and
        per-seed best-val snapshots (with unshuffled loaders so both runs
        see the same batches)."""
        from snnimageclassification_tpu.train.checkpoint import LoadCheckpointMode

        cfg = self._cfg()
        seeds = [0, 7]

        def loaders():
            rng = np.random.default_rng(3)
            protos = rng.random((4, 16)).astype(np.float32)
            y = (np.arange(96) % 4).astype(np.int32)
            x = np.clip(
                protos[y] + 0.1 * rng.standard_normal((96, 16)).astype(np.float32),
                0, 1,
            )
            enc = EncodeConfig(n_steps=2, use_periods=False)
            mk = lambda: ArrayDataLoader(x, y, 32, shuffle=False, encode_config=enc)
            return mk(), mk()

        cont = EnsembleTrainer(cfg, seeds=seeds,
                               checkpoint_folder=str(tmp_path / "cont"))
        tr, va = loaders()
        cont_hists = cont.fit(tr, va, nb_epochs=4, verbose=False)

        part = EnsembleTrainer(cfg, seeds=seeds,
                               checkpoint_folder=str(tmp_path / "part"))
        tr, va = loaders()
        part.fit(tr, va, nb_epochs=2, verbose=False)

        resumed = EnsembleTrainer(cfg, seeds=seeds,
                                  checkpoint_folder=str(tmp_path / "part"))
        tr, va = loaders()
        res_hists = resumed.fit(
            tr, va, nb_epochs=4,
            load_checkpoint_mode=LoadCheckpointMode.LAST_EPOCH, verbose=False,
        )
        for i in range(len(seeds)):
            np.testing.assert_allclose(
                res_hists[i]["train"], cont_hists[i]["train"], rtol=1e-6
            )
            np.testing.assert_allclose(
                res_hists[i]["val"], cont_hists[i]["val"], rtol=1e-6
            )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            ),
            resumed.params, cont.params,
        )
        np.testing.assert_array_equal(resumed.best_epoch, cont.best_epoch)
        np.testing.assert_allclose(resumed.best_val, cont.best_val, rtol=1e-6)
        # BEST snapshots agree too (reconstructed from epoch files).
        cont.load_best()
        resumed.load_best()
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            ),
            resumed.params, cont.params,
        )

    def test_ensemble_resume_past_end_returns_restored_history(self, tmp_path):
        from snnimageclassification_tpu.train.checkpoint import LoadCheckpointMode

        cfg = self._cfg()
        ens = EnsembleTrainer(cfg, seeds=[0, 1],
                              checkpoint_folder=str(tmp_path / "ck"))
        ens.fit(self._loader(), self._loader(seed=1), nb_epochs=2, verbose=False)
        again = EnsembleTrainer(cfg, seeds=[0, 1],
                                checkpoint_folder=str(tmp_path / "ck"))
        hists = again.fit(
            self._loader(), self._loader(seed=1), nb_epochs=2,
            load_checkpoint_mode=LoadCheckpointMode.LAST_EPOCH, verbose=False,
        )
        assert all(len(h["train"]) == 2 for h in hists)

    def test_ensemble_fit_existing_folder_without_overwrite_raises(self, tmp_path):
        cfg = self._cfg()
        ens = EnsembleTrainer(cfg, seeds=[0, 1],
                              checkpoint_folder=str(tmp_path / "ck"))
        ens.fit(self._loader(), self._loader(seed=1), nb_epochs=1, verbose=False)
        again = EnsembleTrainer(cfg, seeds=[0, 1],
                                checkpoint_folder=str(tmp_path / "ck"))
        with pytest.raises(AssertionError):
            again.fit(self._loader(), self._loader(seed=1), nb_epochs=1,
                      verbose=False)
        # force_overwrite wipes and restarts (quirk Q5).
        hists = again.fit(self._loader(), self._loader(seed=1), nb_epochs=1,
                          force_overwrite=True, verbose=False)
        assert all(len(h["train"]) == 1 for h in hists)

    def test_ensemble_resume_seed_mismatch_raises(self, tmp_path):
        from snnimageclassification_tpu.train.checkpoint import LoadCheckpointMode

        cfg = self._cfg()
        ens = EnsembleTrainer(cfg, seeds=[0, 1],
                              checkpoint_folder=str(tmp_path / "ck"))
        ens.fit(self._loader(), self._loader(seed=1), nb_epochs=1, verbose=False)
        other = EnsembleTrainer(cfg, seeds=[0, 2],
                                checkpoint_folder=str(tmp_path / "ck"))
        with pytest.raises(ValueError, match="seeds"):
            other.fit(
                self._loader(), self._loader(seed=1), nb_epochs=2,
                load_checkpoint_mode=LoadCheckpointMode.LAST_EPOCH,
                verbose=False,
            )

    def test_train_all_params_seeds_emits_row_per_seed(self, tmp_path):
        from snnimageclassification_tpu.data.datasets import DatasetId
        from snnimageclassification_tpu.ops.cells import LayerType
        from snnimageclassification_tpu.ops.surrogate import SpikeFuncType
        from snnimageclassification_tpu.train.sweep import train_all_params

        space = {
            "dataset_id": [DatasetId.MNIST],
            "to_spikes_use_periods": [False],
            "n_steps": [2],
            "n_hidden_neurons": [16],
            "spike_func": [SpikeFuncType.FastSigmoid],
            "hidden_layer_type": [LayerType.ALIF],
            "use_recurrent_connection": [False],
            "learn_beta": [False],
            "nb_epochs": [1],
        }
        df = train_all_params(
            space, data_folder=str(tmp_path / "res"),
            batch_size=1024, seeds=[0, 1, 2],
            data_dir=str(tmp_path / "none"), allow_synthetic=True,
        )
        assert len(df) == 3
        assert sorted(df["seed"].astype(int)) == [0, 1, 2]
        assert df["checkpoints"].nunique() == 1  # shared run folder
        assert ((0 <= df["test_accuracy"]) & (df["test_accuracy"] <= 1)).all()

    def test_ensemble_stacked_wiring_matches_unrolled(self, monkeypatch):
        """The fused_replicas=\"stacked\" trainer wiring (all_logits ->
        stacked_grads/stacked_eval/optimizer) must train identically to
        the unrolled path.  stacked_head_fusible is TPU-only, so the
        stacked forward is stubbed with an XLA equivalent over the same
        stacked params -- this exercises exactly the trainer plumbing the
        kernels' own tests cannot reach."""
        from snnimageclassification_tpu.models import snn as model_lib
        from snnimageclassification_tpu.data.datasets import EncodeConfig
        from snnimageclassification_tpu.ops.encoding import encode_spikes

        cfg = self._cfg()

        def fake_stacked(c, stacked_params, x, enc):
            spikes = encode_spikes(
                x, n_steps=enc.n_steps, use_periods=enc.use_periods
            )
            return jax.vmap(
                lambda p: model_lib.forward_logits(c, p, spikes)
            )(stacked_params)

        monkeypatch.setattr(model_lib, "stacked_head_fusible",
                            lambda c, e: True)
        monkeypatch.setattr(model_lib, "forward_logits_pixels_stacked",
                            fake_stacked)
        loader_a, loader_b = self._loader(), self._loader()
        ens_s = EnsembleTrainer(cfg, seeds=[0, 1], fused_replicas="stacked")
        ens_u = EnsembleTrainer(cfg, seeds=[0, 1], fused_replicas=False)
        for _ in range(2):
            ls = ens_s.train_epoch(loader_a)
            lu = ens_u.train_epoch(loader_b)
        np.testing.assert_allclose(ls, lu, rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            ),
            ens_s.params, ens_u.params,
        )
        np.testing.assert_allclose(
            ens_s.accuracies(self._loader()),
            ens_u.accuracies(self._loader()),
        )

    def test_ensemble_stacked_fallback_warns(self, caplog):
        """fused_replicas=\"stacked\" on a non-stacked-fusible config
        (here: CPU backend) must warn loudly, not silently substitute the
        unrolled path (the flag exists for A/B measurement)."""
        import logging

        cfg = self._cfg()
        ens = EnsembleTrainer(cfg, seeds=[0, 1], fused_replicas="stacked")
        with caplog.at_level(logging.WARNING,
                             logger="snnimageclassification_tpu.parallel.ensemble"):
            ens.train_epoch(self._loader())
        assert any("NOT the stacked variant" in r.message
                   for r in caplog.records)
