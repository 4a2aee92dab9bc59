"""Ensemble inference: per-seed logits, soft voting, majority voting.

The reference only reports per-seed accuracies (training.py:151-201 runs
seeds sequentially and logs each one); combining the trained replicas
into ONE predictor is the payoff of training them together, so
``EnsembleTrainer`` grows ``predict_logits`` / ``predict_proba`` /
``predict`` / ``ensemble_accuracy``.  These tests pin the predictions
against per-seed oracles and check the mesh / shard_seeds paths agree
with the single-device one.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import snnimageclassification_tpu as st
from snnimageclassification_tpu.data.datasets import ArrayDataLoader, EncodeConfig
from snnimageclassification_tpu.models import snn as model_lib
from snnimageclassification_tpu.parallel.ensemble import (
    EnsembleTrainer,
    majority_vote,
)
from snnimageclassification_tpu.train.trainer import _encode_on_device

ENC = EncodeConfig(n_steps=4)
CFG = st.SNNConfig(input_size=12, output_size=4, n_hidden_neurons=8,
                   hidden_layer_type=st.LayerType.ALIF,
                   use_recurrent_connection=True, int_time_steps=4)
SEEDS = (0, 1, 2)


def _pixels(n=24, seed=0):
    rng = np.random.default_rng(seed)
    protos = rng.random((4, 12)).astype(np.float32)
    y = (np.arange(n) % 4).astype(np.int32)
    x = np.clip(protos[y] + 0.1 * rng.standard_normal((n, 12)).astype(np.float32),
                0, 1)
    return x, y


def _oracle_logits(ens, x):
    """Per-seed forward_logits on the shared encoded input."""
    inputs = _encode_on_device(jnp.asarray(x), ENC)
    return jnp.stack([
        model_lib.forward_logits(
            CFG, jax.tree.map(lambda a, i=i: np.asarray(a)[i], ens.params),
            inputs,
        )
        for i in range(len(SEEDS))
    ])


def test_predict_logits_matches_per_seed_oracle():
    x, _ = _pixels()
    ens = EnsembleTrainer(CFG, SEEDS)
    got = np.asarray(ens.predict_logits(x, ENC))
    want = np.asarray(_oracle_logits(ens, x))
    assert got.shape == (len(SEEDS), x.shape[0], CFG.output_size)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_predict_proba_mean_and_none():
    x, _ = _pixels()
    ens = EnsembleTrainer(CFG, SEEDS)
    logits = np.asarray(ens.predict_logits(x, ENC))
    per_seed = np.asarray(ens.predict_proba(x, ENC, reduce=None))
    mean = np.asarray(ens.predict_proba(x, ENC))
    np.testing.assert_allclose(
        per_seed, np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1)),
        rtol=1e-6)
    np.testing.assert_allclose(mean, per_seed.mean(axis=0), rtol=1e-6)
    np.testing.assert_allclose(mean.sum(axis=-1), 1.0, rtol=1e-5)
    with pytest.raises(ValueError):
        ens.predict_proba(x, ENC, reduce="max")


def test_predict_methods_match_manual_reductions():
    x, _ = _pixels()
    ens = EnsembleTrainer(CFG, SEEDS)
    probas = np.asarray(ens.predict_proba(x, ENC, reduce=None))
    soft = ens.predict(x, ENC)  # default mean_proba
    np.testing.assert_array_equal(soft, probas.mean(axis=0).argmax(axis=-1))
    hard = ens.predict(x, ENC, method="vote")
    np.testing.assert_array_equal(
        hard, majority_vote(probas.argmax(axis=-1), CFG.output_size))
    with pytest.raises(ValueError):
        ens.predict(x, ENC, method="plurality")


def test_majority_vote_tie_breaks_to_lowest_label():
    # 2-2 tie between labels 1 and 3 -> 1; unanimous -> that label;
    # 3-1 majority -> the majority label.
    seed_preds = np.array([
        [1, 2, 0],
        [3, 2, 0],
        [1, 2, 0],
        [3, 2, 3],
    ])
    np.testing.assert_array_equal(
        majority_vote(seed_preds, 4), np.array([1, 2, 0]))


def test_ensemble_accuracy_matches_manual_and_beats_chance():
    rng = np.random.default_rng(1)
    protos = rng.random((4, 12)).astype(np.float32)
    y = (np.arange(128) % 4).astype(np.int32)
    # Nearly-clean prototypes: 20 epochs of a tiny T=4 net must separate.
    x = np.clip(protos[y] + 0.02 * rng.standard_normal((128, 12)).astype(
        np.float32), 0, 1)
    tr = ArrayDataLoader(x[:96], y[:96], 32, shuffle=True, seed=2,
                         encode_config=ENC)
    va = ArrayDataLoader(x[96:], y[96:], 32, encode_config=ENC)
    ens = EnsembleTrainer(CFG, SEEDS)
    ens.fit(tr, va, nb_epochs=20, verbose=False)
    for method in ("mean_proba", "vote"):
        acc = ens.ensemble_accuracy(va, method=method)
        manual_correct = 0
        for xb, yb in va:
            manual_correct += int(np.sum(
                ens.predict(xb, ENC, method=method) == np.asarray(yb)))
        assert acc == manual_correct / va.n_samples
        assert 0.0 <= acc <= 1.0
    # On this separable toy set the trained soft-vote ensemble must beat
    # chance (0.25).
    assert ens.ensemble_accuracy(va) > 0.25


@pytest.mark.parametrize("mode", ["mesh8", "shard_seeds"])
def test_predict_matches_single_device_on_mesh(mode):
    from snnimageclassification_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the 8-virtual-device conftest")
    mesh = make_mesh()
    seeds = tuple(range(8)) if mode == "shard_seeds" else SEEDS
    x, _ = _pixels()
    ref = EnsembleTrainer(CFG, seeds)
    ens = EnsembleTrainer(CFG, seeds, mesh=mesh,
                          shard_seeds=(mode == "shard_seeds"))
    np.testing.assert_allclose(
        np.asarray(ens.predict_logits(x, ENC)),
        np.asarray(ref.predict_logits(x, ENC)),
        rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(ens.predict(x, ENC), ref.predict(x, ENC))
