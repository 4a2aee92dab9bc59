"""Multi-controller (multi-host) execution: parallel/multihost.py.

The reference is a single-process, single-GPU program; real TPU pods run
one JAX process per host.  Unit tests cover the mesh/layout helpers in
the single-process regime; the integration test spawns a REAL 2-process
CPU cluster (4 virtual devices each, gloo collectives over localhost),
trains the production ``Trainer`` over the global ("data",) mesh, and
pins its loss history / accuracy against the identical single-process
8-device run -- GSPMD compiles the same program either way, so the
histories must agree to float tolerance.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.cluster]

from snnimageclassification_tpu.parallel import multihost

import multihost_driver

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(REPO, "tests", "multihost_driver.py")


class TestSingleProcessHelpers:
    """The helpers degrade gracefully when process_count() == 1 (the
    conftest's 8-virtual-device single process)."""

    def test_is_main_and_barrier_noop(self):
        assert multihost.is_main()
        multihost.barrier("unit")  # must not hang or require a cluster
        assert multihost.process_count() == 1

    def test_mesh_1d(self):
        mesh = multihost.make_multihost_mesh()
        assert mesh.axis_names == ("data",)
        assert mesh.shape["data"] == 8

    def test_mesh_2d_model(self):
        mesh = multihost.make_multihost_mesh(n_model=2)
        assert mesh.axis_names == ("data", "model")
        assert dict(mesh.shape) == {"data": 4, "model": 2}

    def test_mesh_2d_pipe(self):
        mesh = multihost.make_multihost_mesh(n_pipe=2)
        assert mesh.axis_names == ("data", "pipe")
        assert dict(mesh.shape) == {"data": 4, "pipe": 2}

    def test_mesh_3d(self):
        mesh = multihost.make_multihost_mesh(n_model=2, n_pipe=2)
        assert mesh.axis_names == ("data", "pipe", "model")
        assert dict(mesh.shape) == {"data": 2, "pipe": 2, "model": 2}

    def test_mesh_rejects_non_dividing_inner(self):
        with pytest.raises(ValueError, match="divide"):
            multihost.make_multihost_mesh(n_model=3)

    def test_process_local_rows_single(self):
        mesh = multihost.make_multihost_mesh()
        assert multihost.process_local_rows(mesh, 32) == slice(0, 32)

    def test_process_local_rows_rejects_ragged(self):
        # Single process: everything divides; the validation only bites on
        # a real cluster -- here we exercise the n_rows=0-remainder check.
        mesh = multihost.make_multihost_mesh()
        sl = multihost.process_local_rows(mesh, 8)
        assert (sl.stop - sl.start) == 8

    def test_global_batch_roundtrip(self):
        mesh = multihost.make_multihost_mesh()
        x = np.arange(64, dtype=np.float32).reshape(16, 4)
        gx = multihost.global_batch(mesh, x)
        np.testing.assert_array_equal(np.asarray(gx), x)
        gx2, gy2 = multihost.global_batch(mesh, x, x[:, 0])
        np.testing.assert_array_equal(np.asarray(gy2), x[:, 0])


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_cluster(tmp_path, epoch_block=1, num_processes=2, n_model=1,
                 n_pipe=1, mode="trainer"):
    """Spawn the N-process cluster; returns process-0's result dict."""
    port = _free_port()
    ckpt = str(tmp_path / "mh-ckpt")
    out = str(tmp_path / "mh-out.json")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable, DRIVER, str(pid), str(num_processes),
                str(port), ckpt, out, str(epoch_block), str(n_model),
                str(n_pipe), mode,
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(num_processes)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for pid, (p, stdout) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, (
            f"cluster process {pid} failed:\n{stdout[-4000:]}"
        )
    with open(out) as f:
        return json.load(f), ckpt


class TestTwoProcessCluster:
    @pytest.fixture(scope="class")
    def cluster_result(self, tmp_path_factory):
        return _run_cluster(tmp_path_factory.mktemp("mh"))

    @pytest.fixture(scope="class")
    def single_process_result(self, tmp_path_factory):
        """The identical program on the in-process 8-device mesh."""
        from snnimageclassification_tpu.parallel.mesh import make_mesh
        from snnimageclassification_tpu.train.trainer import Trainer

        tmp = tmp_path_factory.mktemp("mh-single")
        tr = Trainer(
            multihost_driver.make_cfg(),
            checkpoint_folder=str(tmp / "ckpt"),
            seed=7,
            mesh=make_mesh(),
        )
        tl, vl = multihost_driver.make_loaders()
        hist = tr.fit(
            tl, vl, nb_epochs=3, force_overwrite=True, verbose=False,
            epoch_block=1,
        )
        acc = float(tr.compute_classification_accuracy(vl))
        return {
            "train": [float(v) for v in hist["train"]],
            "val": [float(v) for v in hist["val"]],
            "acc": acc,
        }

    def test_cluster_topology(self, cluster_result):
        res, _ = cluster_result
        assert res["process_count"] == 2
        assert res["mesh_shape"] == {"data": 8}

    def test_history_matches_single_process(
        self, cluster_result, single_process_result
    ):
        res, _ = cluster_result
        np.testing.assert_allclose(
            res["train"], single_process_result["train"], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            res["val"], single_process_result["val"], rtol=1e-5, atol=1e-6
        )
        assert res["acc"] == pytest.approx(
            single_process_result["acc"], abs=1e-6
        )

    def test_checkpoint_files_written_once(self, cluster_result):
        from snnimageclassification_tpu.train.checkpoint import (
            CheckpointManager,
        )

        res, ckpt = cluster_result
        meta = CheckpointManager(ckpt).checkpoints_meta_path
        assert os.path.exists(meta)
        with open(meta) as f:
            json.load(f)  # valid JSON => no concurrent-writer corruption

    def test_epoch_block_cluster_matches(self, tmp_path, cluster_result):
        res_blocked, _ = _run_cluster(tmp_path, epoch_block=3)
        res, _ = cluster_result
        np.testing.assert_array_equal(res_blocked["train"], res["train"])
        np.testing.assert_array_equal(res_blocked["val"], res["val"])


def _single_process_run(tmp_path, n_model=1, n_pipe=1):
    """The cluster program on the in-process 8-device platform: the same
    global mesh shape built single-controller."""
    from snnimageclassification_tpu.train.trainer import Trainer

    mesh = multihost.make_multihost_mesh(n_model=n_model, n_pipe=n_pipe)
    tr = Trainer(
        multihost_driver.make_cfg(),
        checkpoint_folder=str(tmp_path / "ckpt"),
        seed=7,
        mesh=mesh,
    )
    tl, vl = multihost_driver.make_loaders()
    hist = tr.fit(
        tl, vl, nb_epochs=3, force_overwrite=True, verbose=False,
        epoch_block=1,
    )
    acc = float(tr.compute_classification_accuracy(vl))
    return {
        "train": [float(v) for v in hist["train"]],
        "val": [float(v) for v in hist["val"]],
        "acc": acc,
    }


class TestShardedClusters:
    """TP / PP / 3-D meshes across the 2-process cluster: the "model" and
    "pipe" axes live inside one process's devices (ICI in production), so
    their per-time-step collectives never cross the process boundary;
    only the data-axis gradient all-reduce does.  Histories must track
    the identical single-process run (same global mesh shape) to float
    reassociation tolerance, and checkpoint files are written once, in
    canonical per-layer form."""

    @pytest.mark.parametrize(
        "n_model,n_pipe",
        [(2, 1), (1, 2), (2, 2)],
        ids=["tp", "pp", "pp3"],
    )
    def test_cluster_matches_single_process(
        self, tmp_path, n_model, n_pipe
    ):
        res, ckpt = _run_cluster(
            tmp_path, n_model=n_model, n_pipe=n_pipe
        )
        assert res["process_count"] == 2
        single = _single_process_run(
            tmp_path / "single", n_model=n_model, n_pipe=n_pipe
        )
        np.testing.assert_allclose(
            res["train"], single["train"], rtol=2e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            res["val"], single["val"], rtol=2e-5, atol=1e-6
        )
        assert res["acc"] == pytest.approx(single["acc"], abs=1e-6)
        # Checkpoints: single writer, canonical per-layer params that
        # reload into a strategy-free Trainer.
        from snnimageclassification_tpu.train.checkpoint import (
            CheckpointManager,
            LoadCheckpointMode,
        )
        from snnimageclassification_tpu.train.trainer import Trainer

        mgr = CheckpointManager(ckpt)
        assert os.path.exists(mgr.checkpoints_meta_path)
        tr = Trainer(
            multihost_driver.make_cfg(), checkpoint_folder=ckpt, seed=0
        )
        tr.load_checkpoint(LoadCheckpointMode.BEST_EPOCH)


class TestClusterResume:
    def test_resume_tp_cluster_equals_straight_single_process(
        self, tmp_path
    ):
        """A 2-epoch fit + LAST_EPOCH-resumed 2-epoch fit across the
        cluster (TP mesh: sharded restore placement + the cross-process
        load barrier) must equal a straight 4-epoch single-process fit:
        the reused loader's rng stream makes the trajectories identical.
        """
        from snnimageclassification_tpu.train.trainer import Trainer

        res, _ = _run_cluster(tmp_path, n_model=2, mode="resume")
        mesh = multihost.make_multihost_mesh(n_model=2)
        tr = Trainer(
            multihost_driver.make_cfg(),
            checkpoint_folder=str(tmp_path / "straight"),
            seed=7,
            mesh=mesh,
        )
        tl, vl = multihost_driver.make_loaders()
        hist = tr.fit(
            tl, vl, nb_epochs=4, force_overwrite=True, verbose=False,
            epoch_block=1,
        )
        assert len(res["train"]) == 4
        np.testing.assert_allclose(
            res["train"], [float(v) for v in hist["train"]],
            rtol=2e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            res["val"], [float(v) for v in hist["val"]],
            rtol=2e-5, atol=1e-6,
        )


class TestEnsembleCluster:
    """EnsembleTrainer across the 2-process cluster, both replica
    layouts: batch-sharded (DP: every device trains every seed on its
    batch shard) and seed-sharded (each device owns one replica -- a
    multi-host run trains each host's replicas with zero cross-host
    collectives beyond the per-epoch stat fetches)."""

    @pytest.mark.parametrize("mode", ["ens", "ens_sharded"])
    def test_ensemble_cluster_matches_single_process(self, tmp_path, mode):
        from snnimageclassification_tpu.parallel.ensemble import (
            EnsembleTrainer,
        )

        res, _ = _run_cluster(tmp_path, mode=mode)
        assert res["process_count"] == 2
        shard = mode == "ens_sharded"
        mesh = multihost.make_multihost_mesh()
        ens = EnsembleTrainer(
            multihost_driver.make_cfg(),
            multihost_driver.ensemble_seeds(shard),
            mesh=mesh,
            checkpoint_folder=str(tmp_path / "single-ckpt"),
            shard_seeds=shard,
        )
        tl, vl = multihost_driver.make_loaders()
        hists = ens.fit(
            tl, vl, nb_epochs=3, force_overwrite=True, verbose=False,
            epoch_block=1,
        )
        np.testing.assert_allclose(
            res["train"],
            [[float(v) for v in h["train"]] for h in hists],
            rtol=2e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            res["val"],
            [[float(v) for v in h["val"]] for h in hists],
            rtol=2e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            res["accs"], np.asarray(ens.accuracies(vl)), atol=1e-6
        )
        assert res["ens_acc"] == pytest.approx(
            float(ens.ensemble_accuracy(vl)), abs=1e-6
        )
