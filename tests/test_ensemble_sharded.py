"""Seed-sharded ensemble ("ensemble parallelism") vs the single-device oracle.

``EnsembleTrainer(..., mesh=mesh, shard_seeds=True)`` partitions the seed
axis over the mesh devices via shard_map: each device trains
``n_seeds / n_devices`` replicas on the full (replicated) batch.  Replicas
are independent, so the step must contain ZERO collectives -- asserted on
the compiled HLO -- and every per-seed number must match the unsharded
vmapped ensemble (no reduction is ever split across devices).

Per-replica math is identical on both paths; the only tolerated
difference is f32 reassociation inside the batched matmuls (XLA blocks a
width-8 stacked dot differently from a width-1 shard), measured at the
ULP level per step (~5e-10), so single-step losses are asserted exact and
trained params/histories get ULP-scale tolerances.

Runs on the conftest's virtual 8-device CPU platform.
"""
import jax
import numpy as np
import pytest

import snnimageclassification_tpu as st
from snnimageclassification_tpu.data.datasets import ArrayDataLoader, EncodeConfig
from snnimageclassification_tpu.parallel.ensemble import EnsembleTrainer
from snnimageclassification_tpu.parallel.mesh import make_mesh

COLLECTIVES = (
    "all-reduce", "all-gather", "collective-permute", "all-to-all",
    "reduce-scatter",
)


def _cfg(**kw):
    base = dict(
        input_size=16, output_size=4, n_hidden_neurons=8,
        hidden_layer_type=st.LayerType.ALIF,
        use_recurrent_connection=True, int_time_steps=3,
    )
    base.update(kw)
    return st.SNNConfig(**base)


ENC = EncodeConfig(n_steps=3, use_periods=False)


def _loader(n=96, seed=0, batch_size=32, shuffle=True):
    rng = np.random.default_rng(seed)
    protos = rng.random((4, 16)).astype(np.float32)
    y = (np.arange(n) % 4).astype(np.int32)
    x = np.clip(
        protos[y] + 0.1 * rng.standard_normal((n, 16)).astype(np.float32), 0, 1
    )
    return ArrayDataLoader(
        x, y, batch_size, shuffle=shuffle, encode_config=ENC, seed=seed
    )


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


SEEDS = list(range(8))


class TestSeedShardedParity:
    def test_epoch_paths_match_single_device(self, mesh):
        cfg = _cfg()
        sharded = EnsembleTrainer(cfg, SEEDS, mesh=mesh, shard_seeds=True)
        oracle = EnsembleTrainer(cfg, SEEDS)
        l_sh = sharded.train_epoch(_loader(seed=3))
        l_or = oracle.train_epoch(_loader(seed=3))
        np.testing.assert_allclose(l_sh, l_or, rtol=1e-6)
        v_sh = sharded.eval_epoch(_loader(shuffle=False))
        v_or = oracle.eval_epoch(_loader(shuffle=False))
        np.testing.assert_allclose(v_sh[0], v_or[0], rtol=1e-6)
        np.testing.assert_allclose(v_sh[1], v_or[1], atol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            ),
            sharded.params, oracle.params,
        )

    def test_per_batch_steps_match_single_device(self, mesh):
        cfg = _cfg()
        sharded = EnsembleTrainer(cfg, SEEDS, mesh=mesh, shard_seeds=True)
        oracle = EnsembleTrainer(cfg, SEEDS)
        loader = _loader(shuffle=False)
        step_sh = sharded._steps_for(ENC)[0]
        step_or = oracle._steps_for(ENC)[0]
        b_sh = next(iter(sharded._batches(loader)))
        b_or = next(iter(oracle._batches(loader)))
        p_sh, _, l_sh = step_sh(sharded.params, sharded.opt_state, *b_sh)
        p_or, _, l_or = step_or(oracle.params, oracle.opt_state, *b_or)
        # Forward losses are bitwise equal; the single Adam update admits
        # one ULP of matmul-backward reassociation.
        np.testing.assert_array_equal(np.asarray(l_sh), np.asarray(l_or))
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-8
            ),
            p_sh, p_or,
        )

    def test_params_are_seed_sharded(self, mesh):
        ens = EnsembleTrainer(_cfg(), SEEDS, mesh=mesh, shard_seeds=True)
        spec = ens.params["input"]["w_in"].sharding.spec
        assert tuple(spec)[:1] == ("data",)
        ens.train_epoch(_loader())
        spec = ens.params["input"]["w_in"].sharding.spec
        assert tuple(spec)[:1] == ("data",)

    def test_fit_matches_unsharded_fit(self, mesh, tmp_path):
        cfg = _cfg()
        kw = dict(nb_epochs=3, verbose=False)
        sharded = EnsembleTrainer(
            cfg, SEEDS, mesh=mesh, shard_seeds=True,
            checkpoint_folder=str(tmp_path / "sh"),
        )
        oracle = EnsembleTrainer(
            cfg, SEEDS, checkpoint_folder=str(tmp_path / "or")
        )
        h_sh = sharded.fit(_loader(seed=5), _loader(shuffle=False), **kw)
        h_or = oracle.fit(_loader(seed=5), _loader(shuffle=False), **kw)
        for a, b in zip(h_sh, h_or):
            np.testing.assert_allclose(a["train"], b["train"], rtol=1e-5)
            np.testing.assert_allclose(a["val"], b["val"], rtol=1e-5)
        np.testing.assert_array_equal(sharded.best_epoch, oracle.best_epoch)
        sharded.load_best()
        oracle.load_best()
        np.testing.assert_allclose(
            sharded.accuracies(_loader(shuffle=False)),
            oracle.accuracies(_loader(shuffle=False)),
            atol=1e-6,
        )

    def test_resume_last_epoch_matches_continuous(self, mesh, tmp_path):
        """Unshuffled loaders so continuous and resumed runs see the same
        batches (a seeded shuffling loader advances its RNG per epoch, so
        a resumed run's first epoch would otherwise draw a different
        permutation than the continuous run's third)."""
        from snnimageclassification_tpu.train.checkpoint import (
            LoadCheckpointMode,
        )

        cfg = _cfg()
        cont = EnsembleTrainer(
            cfg, SEEDS, mesh=mesh, shard_seeds=True,
            checkpoint_folder=str(tmp_path / "cont"),
        )
        cont.fit(_loader(shuffle=False), _loader(shuffle=False), nb_epochs=4,
                 verbose=False)

        part = EnsembleTrainer(
            cfg, SEEDS, mesh=mesh, shard_seeds=True,
            checkpoint_folder=str(tmp_path / "part"),
        )
        part.fit(_loader(shuffle=False), _loader(shuffle=False), nb_epochs=2,
                 verbose=False)
        resumed = EnsembleTrainer(
            cfg, SEEDS, mesh=mesh, shard_seeds=True,
            checkpoint_folder=str(tmp_path / "part"),
        )
        resumed.fit(
            _loader(shuffle=False), _loader(shuffle=False), nb_epochs=4,
            load_checkpoint_mode=LoadCheckpointMode.LAST_EPOCH, verbose=False,
        )
        # Params restored through the checkpoint keep the seed sharding.
        spec = resumed.params["input"]["w_in"].sharding.spec
        assert tuple(spec)[:1] == ("data",)
        for a, b in zip(resumed.histories, cont.histories):
            np.testing.assert_allclose(a["val"], b["val"], rtol=1e-6)


class TestSeedShardedNoCollectives:
    def test_train_and_eval_hlo_have_no_collectives(self, mesh):
        ens = EnsembleTrainer(_cfg(), SEEDS, mesh=mesh, shard_seeds=True)
        loader = _loader(shuffle=False)
        steps = ens._steps_for(ENC)
        train, evals = steps.train, steps.evals
        xb, yb, wb = next(iter(ens._batches(loader)))
        txt = train.lower(
            ens.params, ens.opt_state, xb, yb, wb
        ).compile().as_text()
        assert not [op for op in COLLECTIVES if op in txt]
        txt = evals.lower(ens.params, xb, yb, wb).compile().as_text()
        assert not [op for op in COLLECTIVES if op in txt]

    def test_epoch_scan_hlo_has_no_collectives(self, mesh):
        import jax.numpy as jnp

        ens = EnsembleTrainer(_cfg(), SEEDS, mesh=mesh, shard_seeds=True)
        loader = _loader(shuffle=False)
        train_epoch = ens._steps_for(ENC)[2]
        x_all, y_all = ens.device_data.arrays(loader, ens.mesh)
        mi, mw = ens._epoch_index_matrix(loader)
        txt = train_epoch.lower(
            ens.params, ens.opt_state, x_all, y_all,
            jnp.asarray(mi), jnp.asarray(mw),
        ).compile().as_text()
        assert not [op for op in COLLECTIVES if op in txt]

    def test_block_scan_hlo_has_no_collectives(self, mesh):
        """fit(epoch_block=K)'s K-epoch block program must stay
        collective-free under shard_seeds too (the on-device best merge is
        purely per-replica)."""
        import jax
        import jax.numpy as jnp

        ens = EnsembleTrainer(_cfg(), SEEDS, mesh=mesh, shard_seeds=True)
        loader = _loader(shuffle=False)
        train_block = ens._steps_for(ENC)[4]
        x_all, y_all = ens.device_data.arrays(loader, ens.mesh)
        k = 2
        mi, mw = zip(*(ens._epoch_index_matrix(loader) for _ in range(k)))
        mi = jnp.asarray(np.stack(mi))
        mw = jnp.asarray(np.stack(mw))
        best = jax.tree.map(jnp.copy, ens.params)
        bv = jnp.full((len(SEEDS),), jnp.inf, dtype=jnp.float32)
        txt = train_block.lower(
            ens.params, ens.opt_state, best, bv,
            x_all, y_all, mi, mw, x_all, y_all, mi, mw,
        ).compile().as_text()
        assert not [op for op in COLLECTIVES if op in txt]


class TestSeedShardedValidation:
    def test_requires_mesh(self):
        with pytest.raises(ValueError, match="requires a mesh"):
            EnsembleTrainer(_cfg(), SEEDS, shard_seeds=True)

    def test_requires_divisible_seeds(self, mesh):
        with pytest.raises(ValueError, match="divisible"):
            EnsembleTrainer(_cfg(), [0, 1, 2], mesh=mesh, shard_seeds=True)

    def test_works_with_multiple_local_replicas(self, mesh):
        """16 seeds over 8 devices: two replicas per shard."""
        seeds = list(range(16))
        sharded = EnsembleTrainer(_cfg(), seeds, mesh=mesh, shard_seeds=True)
        oracle = EnsembleTrainer(_cfg(), seeds)
        np.testing.assert_allclose(
            sharded.train_epoch(_loader(seed=2)),
            oracle.train_epoch(_loader(seed=2)),
            rtol=1e-6,
        )
