"""Trainer.fit with a 3-D (data, pipe, model) mesh: combined DP x PP x TP
through the production fit/eval/checkpoint surface.

`tests/test_pp3.py` pins the combined shard_map step against the
single-device oracle; this file pins the *Trainer integration*: fit loop,
loss history, canonical checkpoint files (the stacked padded stage params
-- further padded so "model" divides the stage dims -- are converted on
save/restore, so a 3-D-trained checkpoint reloads anywhere), resume and
the prediction surface.

Runs on the conftest's virtual 8-device CPU platform as a (2 data x
2 pipe x 2 model) cube over a single-hidden + readout stack (one layer
per stage, hidden columns split over "model").  Padding changes only
contraction lengths (exact zeros), so parity with single-device is
f32-reassociation-tight per step; multi-epoch histories get a small
tolerance.
"""
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import snnimageclassification_tpu as st
from snnimageclassification_tpu.data.datasets import ArrayDataLoader, EncodeConfig
from snnimageclassification_tpu.parallel import pp3
from snnimageclassification_tpu.train.checkpoint import LoadCheckpointMode
from snnimageclassification_tpu.train.trainer import Trainer

N_FEATURES = 64
ENC = EncodeConfig(n_steps=4, use_periods=True)


def _loaders(seed=0, n=128, batch_size=32):
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
        input_size=N_FEATURES, output_size=10,
        n_hidden_neurons=[32],
        hidden_layer_type=st.LayerType.ALIF, use_recurrent_connection=True,
        int_time_steps=4,
    )
    base.update(kw)
    return st.SNNConfig(**base)


@pytest.fixture(scope="module")
def cube():
    return pp3.make_3d_mesh(2, 2, 2)


def _fit(tmp_path, tag, mesh=None, nb_epochs=3, epoch_block=1, seed=7, **kw):
    tr = Trainer(
        _cfg(), checkpoint_folder=str(tmp_path / tag), seed=seed, mesh=mesh,
        **kw,
    )
    tl, vl = _loaders()
    hist = tr.fit(
        tl, vl, nb_epochs=nb_epochs, force_overwrite=True, verbose=False,
        epoch_block=epoch_block,
    )
    return tr, hist


class TestPP3Fit:
    def test_strategy_flags(self, tmp_path, cube):
        tr = Trainer(_cfg(), checkpoint_folder=str(tmp_path / "f"), mesh=cube)
        assert tr._pp3 and tr._tp and tr._pp
        # Live params carry the 3-D placement: stage axis over "pipe",
        # columns over "model".
        spec = str(tr.params["w_in"].sharding.spec)
        assert "pipe" in spec and "model" in spec

    def test_fit_matches_single_device(self, tmp_path, cube):
        _, hist_1d = _fit(tmp_path, "single")
        _, hist_3d = _fit(tmp_path, "pp3", mesh=cube)
        np.testing.assert_allclose(
            hist_3d["train"], hist_1d["train"], atol=5e-4, rtol=5e-4
        )
        np.testing.assert_allclose(
            hist_3d["val"], hist_1d["val"], atol=5e-4, rtol=5e-4
        )

    def test_epoch_block_matches_per_epoch(self, tmp_path, cube):
        _, hist_1 = _fit(tmp_path, "pp3-e1", mesh=cube, nb_epochs=4)
        _, hist_4 = _fit(tmp_path, "pp3-e4", mesh=cube, nb_epochs=4,
                         epoch_block=4)
        np.testing.assert_array_equal(hist_4["train"], hist_1["train"])
        np.testing.assert_array_equal(hist_4["val"], hist_1["val"])

    def test_checkpoint_is_canonical_and_cross_loads(self, tmp_path, cube):
        tr_3d, hist = _fit(tmp_path, "pp3-ckpt", mesh=cube, nb_epochs=3)
        # A fresh single-device trainer reloads the 3-D-trained BEST
        # checkpoint: files hold canonical per-layer params.
        tr_1d = Trainer(_cfg(), checkpoint_folder=str(tmp_path / "pp3-ckpt"),
                        seed=0)
        ckpt = tr_1d.load_checkpoint(LoadCheckpointMode.BEST_EPOCH)
        assert int(ckpt[tr_1d.ckpt.CHECKPOINT_EPOCH_KEY]) == int(
            np.argmin(hist["val"])
        )
        # And the 3-D trainer's own reload round-trips through the padded
        # stacked representation exactly: canonical views agree bitwise.
        tr_3d.load_checkpoint(LoadCheckpointMode.BEST_EPOCH)
        canon_3d = tr_3d._canonical_params(tr_3d.params)
        for name, group in tr_1d.params.items():
            for key in group:
                np.testing.assert_array_equal(
                    np.asarray(canon_3d[name][key]), np.asarray(group[key])
                )
        _, vl = _loaders()
        a_3d = tr_3d.compute_classification_accuracy(vl)
        a_1d = tr_1d.compute_classification_accuracy(vl)
        assert a_3d == pytest.approx(a_1d)

    def test_resume_continues_trajectory(self, tmp_path, cube):
        _, hist_full = _fit(tmp_path, "pp3-full", mesh=cube, nb_epochs=4)
        _fit(tmp_path, "pp3-resume", mesh=cube, nb_epochs=2)
        tr2 = Trainer(_cfg(), checkpoint_folder=str(tmp_path / "pp3-resume"),
                      seed=7, mesh=cube)
        tl, vl = _loaders()
        for _ in range(2):  # replay the consumed shuffle draws
            list(tl.iter_indices())
            list(vl.iter_indices())
        hist = tr2.fit(
            tl, vl, nb_epochs=4, verbose=False, epoch_block=1,
            load_checkpoint_mode=LoadCheckpointMode.LAST_EPOCH,
        )
        np.testing.assert_allclose(
            hist["val"], hist_full["val"], atol=5e-4, rtol=5e-4
        )

    def test_predict_matches_single_device(self, tmp_path, cube):
        cfg = _cfg()
        tr_1d = Trainer(cfg, checkpoint_folder=str(tmp_path / "p1"), seed=3)
        tr_3d = Trainer(cfg, checkpoint_folder=str(tmp_path / "p2"), seed=3,
                        mesh=cube)
        rng = np.random.default_rng(5)
        # 30 rows: not divisible by the 3-D batch multiple (8).
        x = rng.random((30, N_FEATURES)).astype(np.float32)
        got = tr_3d.predict_logits(x, ENC)
        want = tr_1d.predict_logits(x, ENC)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
        )

    def test_facade_is_strategy_transparent(self, tmp_path, cube):
        """st.SNN under the 3-D mesh: params property, forward, and the
        params setter all see canonical per-layer params."""
        net_3d = st.SNN(
            inputs_size=N_FEATURES, output_size=10, n_hidden_neurons=[32],
            hidden_layer_type=st.LayerType.ALIF,
            use_recurrent_connection=True, int_time_steps=4,
            checkpoint_folder=str(tmp_path / "f3d"), seed=3, mesh=cube,
        )
        net_1d = st.SNN(
            inputs_size=N_FEATURES, output_size=10, n_hidden_neurons=[32],
            hidden_layer_type=st.LayerType.ALIF,
            use_recurrent_connection=True, int_time_steps=4,
            checkpoint_folder=str(tmp_path / "f1d"), seed=3,
        )
        for name, group in net_1d.params.items():
            for key in group:
                np.testing.assert_array_equal(
                    np.asarray(net_3d.params[name][key]),
                    np.asarray(group[key]),
                )
        rng = np.random.default_rng(9)
        spikes = (rng.random((8, 4, N_FEATURES)) < 0.3).astype(np.float32)
        out_3d, _ = net_3d.forward(spikes, return_hidden=False)
        out_1d, _ = net_1d.forward(spikes, return_hidden=False)
        np.testing.assert_allclose(
            np.asarray(out_3d), np.asarray(out_1d), atol=2e-5, rtol=2e-5
        )
        # Round-trip through the setter: canonical in -> 3-D-placed live.
        net_3d.params = net_1d.params
        spec = str(net_3d.trainer.params["w_in"].sharding.spec)
        assert "pipe" in spec and "model" in spec

    def test_custom_criterion_rejected(self, tmp_path, cube):
        with pytest.raises(ValueError, match="criteria"):
            Trainer(
                _cfg(), checkpoint_folder=str(tmp_path / "c"), mesh=cube,
                criterion=lambda logits, y, w=None: logits.sum(),
            )
