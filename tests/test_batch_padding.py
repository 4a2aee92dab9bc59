"""Remainder batches are padded to one compiled shape per epoch.

A remainder batch (dataset size not divisible by batch_size) used to
yield a second jit shape, forcing a full recompile of the T-step kernels
-- minutes of relay-attached TPU compile time for a handful of rows.
Every batch path now pads up to the loader's nominal batch size with
weight-0 rows; weighted losses/metrics keep results exact
(train/trainer.py nll_loss, parallel/ensemble.py eval masking)."""
import numpy as np
import pytest

from snnimageclassification_tpu.data.datasets import ArrayDataLoader, EncodeConfig
from snnimageclassification_tpu.data.device_cache import DeviceDataCache, pad_rows


def _loader(n=10, batch=4, f=6, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((n, f)).astype(np.float32)
    y = rng.integers(0, 3, n).astype(np.int32)
    return ArrayDataLoader(x, y, batch, encode_config=EncodeConfig(n_steps=4))


def test_pad_rows():
    idx = np.array([7, 8, 9])
    p, w = pad_rows(idx, 5)
    np.testing.assert_array_equal(p, [7, 8, 9, 0, 0])
    np.testing.assert_array_equal(w, [1, 1, 1, 0, 0])
    p, w = pad_rows(idx, 3)
    np.testing.assert_array_equal(p, idx)
    np.testing.assert_array_equal(w, [1, 1, 1])


def test_device_cache_single_device_uniform_shapes():
    loader = _loader(n=10, batch=4)
    cache = DeviceDataCache()
    batches = list(cache.batches(loader))
    assert [b[0].shape[0] for b in batches] == [4, 4, 4]
    ws = np.concatenate([np.asarray(b[2]) for b in batches])
    assert ws.sum() == 10  # exactly the real rows carry weight
    # weighted rows reproduce the dataset exactly
    xs = np.concatenate([np.asarray(b[0])[np.asarray(b[2]) > 0] for b in batches])
    np.testing.assert_allclose(np.sort(xs, axis=0), np.sort(loader.x, axis=0))


def test_device_cache_mesh_uniform_shapes():
    import jax

    from snnimageclassification_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the 8-virtual-device conftest")
    mesh = make_mesh()
    loader = _loader(n=10, batch=4)
    batches = list(DeviceDataCache().batches(loader, mesh))
    shapes = {b[0].shape[0] for b in batches}
    assert len(shapes) == 1  # one compiled shape for the whole epoch
    (bs,) = shapes
    assert bs % mesh.size == 0 and bs >= 4
    total_w = sum(float(np.asarray(b[2]).sum()) for b in batches)
    assert total_w == 10


def test_trainer_prep_batch_pads_to_target():
    from snnimageclassification_tpu.models.config import SNNConfig
    from snnimageclassification_tpu.train.trainer import Trainer

    cfg = SNNConfig(input_size=6, output_size=3, n_hidden_neurons=8,
                    int_time_steps=4)
    tr = Trainer(cfg)
    x = np.ones((3, 6), np.float32)
    y = np.arange(3, dtype=np.int32)
    xb, yb, wb = tr._prep_batch(x, y, target=8)
    assert xb.shape == (8, 6) and yb.shape == (8,) and wb.shape == (8,)
    np.testing.assert_array_equal(wb, [1, 1, 1, 0, 0, 0, 0, 0])


def test_accuracy_exact_with_remainder_batches():
    """compute_classification_accuracy over a remainder-padded loader
    equals a direct argmax over the raw split."""
    import jax.numpy as jnp

    from snnimageclassification_tpu.models import snn as model_lib
    from snnimageclassification_tpu.models.config import SNNConfig
    from snnimageclassification_tpu.train.trainer import Trainer

    cfg = SNNConfig(input_size=6, output_size=3, n_hidden_neurons=8,
                    int_time_steps=4)
    loader = _loader(n=10, batch=4)
    tr = Trainer(cfg)
    acc = tr.compute_classification_accuracy(loader)
    from snnimageclassification_tpu.train.trainer import _encode_on_device

    inputs = _encode_on_device(jnp.asarray(loader.x), loader.encode_config)
    logits = model_lib.forward_logits(cfg, tr.params, inputs)
    expect = float(np.mean(np.argmax(np.asarray(logits), -1) == loader.y))
    assert acc == pytest.approx(expect)


@pytest.mark.parametrize("use_mesh", [False, True], ids=["single", "mesh8"])
def test_epoch_scan_matches_per_batch_path(tmp_path, use_mesh):
    """The whole-epoch lax.scan fit path (one dispatch per epoch) produces
    the same loss history and val accuracy as the per-batch path -- the
    same iter_indices() shuffle drives both.  Parameterized over the
    8-virtual-device data mesh: the epoch scan runs data-parallel there
    too (replicated HBM dataset, per-batch reshard onto the data axis)."""
    import jax

    from snnimageclassification_tpu.models.config import SNNConfig
    from snnimageclassification_tpu.train.trainer import Trainer

    mesh = None
    if use_mesh:
        from snnimageclassification_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs the 8-virtual-device conftest")
        mesh = make_mesh()

    rng = np.random.default_rng(0)
    x = rng.random((50, 6)).astype(np.float32)
    y = rng.integers(0, 3, 50).astype(np.int32)
    enc = EncodeConfig(n_steps=4)
    cfg = SNNConfig(input_size=6, output_size=3, n_hidden_neurons=8,
                    int_time_steps=4)

    def run(limit, tag):
        tr_loader = ArrayDataLoader(x[:40], y[:40], 16, shuffle=True,
                                    seed=5, encode_config=enc)
        va_loader = ArrayDataLoader(x[40:], y[40:], 16, encode_config=enc)
        t = Trainer(cfg, checkpoint_folder=str(tmp_path / tag), mesh=mesh)
        t.device_data.limit_bytes = limit
        t.async_checkpointing = False
        # epoch_block=1 pins the per-epoch scan path (the blocked path has
        # its own equivalence suite, tests/test_epoch_block.py).
        hist = t.fit(tr_loader, va_loader, nb_epochs=3, force_overwrite=True,
                     epoch_block=1)
        return ([float(v) for v in hist["train"]],
                [float(v) for v in hist["val"]],
                t.compute_classification_accuracy(va_loader))

    scan_path = run(512 * 1024 * 1024, "scan")  # cache fits -> epoch scan
    batch_path = run(1, "batch")            # forced host streaming per batch
    np.testing.assert_allclose(scan_path[0], batch_path[0], rtol=1e-6)
    np.testing.assert_allclose(scan_path[1], batch_path[1], rtol=1e-6)
    assert scan_path[2] == pytest.approx(batch_path[2])
    if use_mesh:
        # Mesh epoch scan == single-device epoch scan, bitwise-comparable
        # numerics (DP only changes the reduction layout).
        t_single = Trainer(cfg, checkpoint_folder=str(tmp_path / "sd"))
        t_single.async_checkpointing = False
        tr_loader = ArrayDataLoader(x[:40], y[:40], 16, shuffle=True,
                                    seed=5, encode_config=enc)
        va_loader = ArrayDataLoader(x[40:], y[40:], 16, encode_config=enc)
        hist = t_single.fit(tr_loader, va_loader, nb_epochs=3,
                            force_overwrite=True)
        np.testing.assert_allclose(
            scan_path[0], [float(v) for v in hist["train"]], rtol=1e-5)


def test_host_snapshot_roundtrip_dtypes():
    """host_snapshot (one packed device->host transfer) reproduces every
    leaf bitwise across dtypes, shapes, and non-array leaves."""
    import jax
    import jax.numpy as jnp

    from snnimageclassification_tpu.train.trainer import host_snapshot

    tree = {
        "f32": jnp.arange(12, dtype=jnp.float32).reshape(3, 4) * 1.5,
        "bf16": jnp.asarray([[1.5, -2.25], [0.125, 3e4]], jnp.bfloat16),
        "i32": jnp.asarray([[7, -9]], jnp.int32),
        "scalar": jnp.asarray(42, jnp.int32),
        "bool": jnp.asarray([True, False, True]),
        "py": 3.5,
        "none": None,
    }
    out = host_snapshot(tree)
    assert isinstance(out["f32"], np.ndarray)
    for k in ("f32", "bf16", "i32", "scalar", "bool"):
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(tree[k]))
        assert out[k].dtype == tree[k].dtype and out[k].shape == tree[k].shape
    assert out["py"] == 3.5 and out["none"] is None
