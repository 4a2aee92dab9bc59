"""Checkpoint subsystem: round-trip, best/last semantics, meta-merge,
loss-history reconstruction (parity with snn.py:424-505)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from snnimageclassification_tpu.models import snn as M
from snnimageclassification_tpu.models.config import SNNConfig
from snnimageclassification_tpu.train.checkpoint import (
    CheckpointManager,
    LoadCheckpointMode,
)
from snnimageclassification_tpu.train.trainer import make_optimizer


@pytest.fixture
def setup(tmp_path):
    cfg = SNNConfig(input_size=6, output_size=3, n_hidden_neurons=4, int_time_steps=3)
    params = M.init(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(M.param_labels(cfg, params))
    opt_state = tx.init(params)
    ckpt = CheckpointManager(str(tmp_path / "ckpts"), "snn")
    return cfg, params, tx, opt_state, ckpt


def test_roundtrip(setup):
    cfg, params, tx, opt_state, ckpt = setup
    ckpt.save_checkpoint(params, opt_state, 0, {"train": 1.0, "val": 2.0}, best=True)
    payload = ckpt.load_checkpoint(LoadCheckpointMode.BEST_EPOCH)
    assert payload["epoch"] == 0
    assert payload["loss"] == {"train": 1.0, "val": 2.0}
    p2, o2 = ckpt.restore(payload, params, opt_state)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, p2,
    )
    # opt_state structure is preserved (typed NamedTuples, not raw dicts)
    assert jax.tree.structure(o2) == jax.tree.structure(opt_state)


def test_best_vs_last(setup):
    cfg, params, tx, opt_state, ckpt = setup
    p1 = jax.tree.map(lambda x: x + 1.0, params)
    p2 = jax.tree.map(lambda x: x + 2.0, params)
    ckpt.save_checkpoint(p1, opt_state, 0, {"train": 1.0, "val": 0.5}, best=True)
    ckpt.save_checkpoint(p2, opt_state, 1, {"train": 0.9, "val": 0.7}, best=False)

    best = ckpt.load_checkpoint(LoadCheckpointMode.BEST_EPOCH)
    last = ckpt.load_checkpoint(LoadCheckpointMode.LAST_EPOCH)
    assert best["epoch"] == 0
    assert last["epoch"] == 1

    bp, _ = ckpt.restore(best, params, opt_state)
    np.testing.assert_allclose(
        np.asarray(bp["readout"]["b"]), np.asarray(p1["readout"]["b"])
    )


def test_meta_file_structure(setup):
    cfg, params, tx, opt_state, ckpt = setup
    ckpt.save_checkpoint(params, opt_state, 0, {"train": 1.0, "val": 2.0}, best=True)
    ckpt.save_checkpoint(params, opt_state, 1, {"train": 0.5, "val": 1.5}, best=False)
    with open(ckpt.checkpoints_meta_path) as f:
        meta = json.load(f)
    # reference structure: best -> path, epochs -> {N: path} (snn.py:45-48)
    assert meta["best"] == ckpt.checkpoint_path(0)
    assert set(meta["epochs"]) == {"0", "1"}
    assert meta["epochs"]["1"] == ckpt.checkpoint_path(1)


def test_loss_history_reconstruction(setup):
    cfg, params, tx, opt_state, ckpt = setup
    for e, (tr, va) in enumerate([(1.0, 2.0), (0.8, 1.5), (0.6, 1.2)]):
        ckpt.save_checkpoint(params, opt_state, e, {"train": tr, "val": va},
                             best=(e == 2))
    history = ckpt.get_checkpoints_loss_history()
    assert history["train"] == [1.0, 0.8, 0.6]
    assert history["val"] == [2.0, 1.5, 1.2]
    assert history.min("val") == 1.2


def test_missing_meta_raises(setup):
    *_, ckpt = setup
    with pytest.raises(FileNotFoundError):
        ckpt.load_checkpoint(LoadCheckpointMode.LAST_EPOCH)
