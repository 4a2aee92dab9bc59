"""Data-pipeline tests: IDX parsing, loader splits/shuffling, synthetic
fallback, encode-config plumbing."""
import gzip
import struct

import numpy as np
import pytest

from snnimageclassification_tpu.data.datasets import (
    ArrayDataLoader,
    DatasetId,
    EncodeConfig,
    get_dataloaders,
    load_raw,
    read_idx,
)


def _write_idx(path, arr: np.ndarray, gz=False):
    dtype_code = {np.uint8: 0x08, np.int32: 0x0C}[arr.dtype.type]
    header = struct.pack("BBBB", 0, 0, dtype_code, arr.ndim)
    header += struct.pack(f">{arr.ndim}I", *arr.shape)
    payload = header + arr.astype(arr.dtype.newbyteorder(">")).tobytes()
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(payload)


class TestIdx:
    @pytest.mark.parametrize("gz", [False, True])
    def test_roundtrip(self, tmp_path, gz):
        arr = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
        p = tmp_path / ("a.idx" + (".gz" if gz else ""))
        _write_idx(p, arr, gz=gz)
        got = read_idx(p)
        np.testing.assert_array_equal(got, arr)

    def test_bad_magic(self, tmp_path):
        p = tmp_path / "bad.idx"
        p.write_bytes(b"\x01\x02\x08\x01" + b"\x00" * 8)
        with pytest.raises(ValueError):
            read_idx(p)


class TestLoadRaw:
    def test_idx_folder_layout(self, tmp_path):
        root = tmp_path / "mnist"
        root.mkdir()
        imgs = np.random.default_rng(0).integers(0, 256, (20, 28, 28)).astype(np.uint8)
        labels = np.arange(20, dtype=np.uint8) % 10
        timgs = imgs[:7]
        tlabels = labels[:7]
        _write_idx(root / "train-images-idx3-ubyte", imgs)
        _write_idx(root / "train-labels-idx1-ubyte", labels)
        _write_idx(root / "t10k-images-idx3-ubyte.gz", timgs, gz=True)
        _write_idx(root / "t10k-labels-idx1-ubyte.gz", tlabels, gz=True)
        raw = load_raw(DatasetId.MNIST, str(tmp_path), allow_synthetic=False)
        assert raw["x_train"].shape == (20, 784)
        assert raw["x_test"].shape == (7, 784)
        assert raw["x_train"].dtype == np.float32
        assert raw["x_train"].max() <= 1.0
        np.testing.assert_array_equal(raw["y_train"], labels)
        assert raw["source"].endswith("mnist")

    def test_npz_layout(self, tmp_path):
        np.savez(
            tmp_path / "mnist.npz",
            x_train=np.zeros((5, 28, 28), np.uint8),
            y_train=np.arange(5),
            x_test=np.zeros((2, 28, 28), np.uint8),
            y_test=np.arange(2),
        )
        raw = load_raw(DatasetId.MNIST, str(tmp_path), allow_synthetic=False)
        assert raw["x_train"].shape == (5, 784)
        assert raw["source"].endswith("mnist.npz")

    def test_synthetic_fallback(self, tmp_path, caplog):
        import logging

        with caplog.at_level(logging.WARNING,
                             logger="snnimageclassification_tpu.data.datasets"):
            raw = load_raw(
                DatasetId.FASHION_MNIST, str(tmp_path / "nothing-here"),
                synthetic_train=64, synthetic_test=16,
            )
        # The fallback must be LOUD: a user requesting FASHION_MNIST on a
        # machine without files should see a warning, not silently train
        # on synthetic data.
        assert any(
            "SYNTHETIC" in rec.message and "FASHION_MNIST" in (rec.msg % rec.args)
            for rec in caplog.records
        )
        assert raw["source"] == "synthetic"
        assert raw["x_train"].shape == (64, 784)
        assert set(np.unique(raw["y_train"])) <= set(range(10))
        # deterministic
        raw2 = load_raw(
            DatasetId.FASHION_MNIST, str(tmp_path / "nothing-here"),
            synthetic_train=64, synthetic_test=16,
        )
        np.testing.assert_array_equal(raw["x_train"], raw2["x_train"])

    def test_missing_raises_without_synthetic(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_raw(DatasetId.MNIST, str(tmp_path / "nope"), allow_synthetic=False)

    def test_digits_is_real_offline_data(self, tmp_path):
        pytest.importorskip("sklearn")
        raw = load_raw(DatasetId.DIGITS, str(tmp_path / "nope"),
                       allow_synthetic=False)
        assert raw["source"] == "sklearn:load_digits"
        assert raw["x_train"].shape == (1797 - 359, 64)
        assert raw["x_test"].shape == (359, 64)
        assert 0.0 <= raw["x_train"].min() and raw["x_train"].max() <= 1.0
        assert set(np.unique(raw["y_test"])) == set(range(10))
        # deterministic split
        raw2 = load_raw(DatasetId.DIGITS, allow_synthetic=False)
        np.testing.assert_array_equal(raw["y_test"], raw2["y_test"])


class TestArrayDataLoader:
    def test_batching_and_len(self):
        x = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
        y = np.arange(10, dtype=np.int32)
        loader = ArrayDataLoader(x, y, batch_size=4)
        batches = list(loader)
        assert len(loader) == 3
        assert [b[0].shape[0] for b in batches] == [4, 4, 2]
        np.testing.assert_array_equal(np.concatenate([b[1] for b in batches]), y)

    def test_drop_last(self):
        x = np.zeros((10, 3), np.float32)
        y = np.zeros(10, np.int32)
        loader = ArrayDataLoader(x, y, batch_size=4, drop_last=True)
        assert len(loader) == 2
        assert sum(b[0].shape[0] for b in loader) == 8

    def test_shuffle_changes_across_epochs_and_keeps_pairs(self):
        x = np.arange(32, dtype=np.float32).reshape(32, 1)
        y = np.arange(32, dtype=np.int32)
        loader = ArrayDataLoader(x, y, batch_size=32, shuffle=True, seed=0)
        (x1, y1), = list(loader)
        (x2, y2), = list(loader)
        assert not np.array_equal(y1, y2)  # reshuffled per epoch
        np.testing.assert_array_equal(x1[:, 0].astype(np.int32), y1)  # pairs intact
        np.testing.assert_array_equal(x2[:, 0].astype(np.int32), y2)


class TestGetDataloaders:
    def test_split_and_encode_config(self, tmp_path):
        loaders = get_dataloaders(
            DatasetId.MNIST, batch_size=16, train_val_split_ratio=0.75,
            n_steps=12, to_spikes_use_periods=True,
            data_dir=str(tmp_path / "none"), allow_synthetic=True,
        )
        assert set(loaders) == {"train", "val", "test"}
        n_train = loaders["train"].n_samples
        n_val = loaders["val"].n_samples
        assert n_train == int((n_train + n_val) * 0.75)
        enc = loaders["train"].encode_config
        assert enc == EncodeConfig(as_timeseries=True, n_steps=12, use_periods=True)
        assert loaders["train"].shuffle and not loaders["test"].shuffle

    def test_not_timeseries(self, tmp_path):
        loaders = get_dataloaders(
            DatasetId.MNIST, as_timeseries=False,
            data_dir=str(tmp_path / "none"), allow_synthetic=True,
        )
        assert loaders["train"].encode_config.as_timeseries is False

    def test_source_exposed_on_loaders(self, tmp_path):
        loaders = get_dataloaders(
            DatasetId.MNIST, data_dir=str(tmp_path / "none"),
            allow_synthetic=True,
        )
        assert all(
            loaders[k].source == "synthetic" for k in ("train", "val", "test")
        )
        # real files -> source is the resolved path
        root = tmp_path / "mnist"
        root.mkdir()
        imgs = np.zeros((20, 28, 28), np.uint8)
        labels = (np.arange(20) % 10).astype(np.uint8)
        _write_idx(root / "train-images-idx3-ubyte", imgs)
        _write_idx(root / "train-labels-idx1-ubyte", labels)
        _write_idx(root / "t10k-images-idx3-ubyte", imgs[:7])
        _write_idx(root / "t10k-labels-idx1-ubyte", labels[:7])
        loaders = get_dataloaders(
            DatasetId.MNIST, data_dir=str(tmp_path), allow_synthetic=False,
        )
        assert loaders["train"].source.endswith("mnist")


class TestFetchDatasets:
    """scripts/fetch_datasets.py --verify/--make-npz (no-egress paths)."""

    def _script(self):
        import importlib.util
        import pathlib

        spec = importlib.util.spec_from_file_location(
            "fetch_datasets",
            pathlib.Path(__file__).parent.parent / "scripts" / "fetch_datasets.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_verify_reports_missing(self, tmp_path, monkeypatch, capsys):
        mod = self._script()
        monkeypatch.setenv("SNN_TPU_DATA_DIR", str(tmp_path))
        assert mod.main(["mnist", "--verify"]) == 1
        assert "MISSING" in capsys.readouterr().out

    def test_verify_accepts_uncompressed_idx(self, tmp_path, monkeypatch):
        mod = self._script()
        monkeypatch.setenv("SNN_TPU_DATA_DIR", str(tmp_path))
        folder = tmp_path / "mnist"
        folder.mkdir()
        imgs = np.zeros((4, 28, 28), np.uint8)
        labels = np.arange(4, dtype=np.uint8)
        _write_idx(folder / "train-images-idx3-ubyte", imgs)
        _write_idx(folder / "train-labels-idx1-ubyte", labels)
        _write_idx(folder / "t10k-images-idx3-ubyte", imgs)
        _write_idx(folder / "t10k-labels-idx1-ubyte", labels)
        assert mod.main(["mnist", "--verify"]) == 0

    def test_make_npz_roundtrips_into_load_raw(self, tmp_path, monkeypatch):
        mod = self._script()
        monkeypatch.setenv("SNN_TPU_DATA_DIR", str(tmp_path))
        folder = tmp_path / "mnist"
        folder.mkdir()
        imgs = np.random.default_rng(0).integers(0, 256, (6, 28, 28)).astype(np.uint8)
        labels = (np.arange(6) % 10).astype(np.uint8)
        _write_idx(folder / "train-images-idx3-ubyte", imgs)
        _write_idx(folder / "train-labels-idx1-ubyte", labels)
        _write_idx(folder / "t10k-images-idx3-ubyte.gz", imgs[:2], gz=True)
        _write_idx(folder / "t10k-labels-idx1-ubyte.gz", labels[:2], gz=True)
        assert mod.main(["mnist", "--make-npz"]) == 0
        # Load from a dir holding ONLY the npz (IDX folders probe first).
        npz_dir = tmp_path / "npz-only"
        npz_dir.mkdir()
        (tmp_path / "mnist.npz").rename(npz_dir / "mnist.npz")
        raw = load_raw(DatasetId.MNIST, str(npz_dir), allow_synthetic=False)
        assert raw["x_train"].shape == (6, 784)
        assert raw["source"].endswith("mnist.npz")
        np.testing.assert_array_equal(raw["y_test"], labels[:2])


class TestBaselineHarness:
    """scripts/run_baseline_configs.py runs offline against fabricated
    IDX files -- keeps the published-parity runs a zero-thought command
    the moment real data appears."""

    def _fabricate(self, tmp_path):
        rng = np.random.default_rng(0)
        for sub in ("mnist", "fashion-mnist"):
            root = tmp_path / sub
            root.mkdir()
            imgs = rng.integers(0, 256, (40, 28, 28)).astype(np.uint8)
            labels = (np.arange(40) % 10).astype(np.uint8)
            _write_idx(root / "train-images-idx3-ubyte", imgs)
            _write_idx(root / "train-labels-idx1-ubyte", labels)
            _write_idx(root / "t10k-images-idx3-ubyte", imgs[:10])
            _write_idx(root / "t10k-labels-idx1-ubyte", labels[:10])

    def test_config_list_covers_baseline(self):
        import sys
        sys.path.insert(0, "scripts")
        from run_baseline_configs import baseline_configs

        cfgs = baseline_configs(epochs=None)
        names = [n for n, _ in cfgs]
        assert names[0].startswith("1-mnist-ff-lif128")
        assert any(n.startswith("2-") for n in names)
        assert any(n.startswith("3-fmnist") for n in names)
        assert sum(n.startswith("4-grid") for n in names) == 8
        assert names[-1] == "5-readme-example"
        # README example keeps the reference's quirky fast config.
        readme = dict(cfgs)[names[-1]]
        assert readme["n_steps"] == 2
        assert readme["train_val_split_ratio"] == 0.95
        assert readme["nb_epochs"] == 30

    def test_runs_on_fabricated_idx(self, tmp_path, monkeypatch):
        import sys
        sys.path.insert(0, "scripts")
        import run_baseline_configs as rbc

        self._fabricate(tmp_path)

        class Args:
            epochs = 1
            seeds = ""
            configs = "1,5"
            batch_size = 16
            data_dir = str(tmp_path)
            data_folder = str(tmp_path / "runs")
            digits = False
            verbose = False
            csv = str(tmp_path / "runs" / "results.csv")

        # Shrink the T=100 config for CI speed; the data plumbing --
        # allow_synthetic=False against the fabricated folder -- is the
        # thing under test.
        orig = rbc.baseline_configs

        def small(epochs, digits=False):
            cfgs = orig(epochs, digits)
            for _, p in cfgs:
                p["n_steps"] = min(p["n_steps"], 3)
            return cfgs

        monkeypatch.setattr(rbc, "baseline_configs", small)
        rows = rbc.run(Args())
        assert len(rows) == 2
        for row in rows:
            assert 0.0 <= row["accuracies"]["test"] <= 1.0
            assert row["published_test_acc"] is not None
            assert row["delta_vs_published"] is not None
        # The --csv leg writes the sweep-schema results.csv (and
        # best-effort figures) alongside the run dirs.
        assert (tmp_path / "runs" / "results.csv").exists()

    def test_fails_loudly_without_data(self, tmp_path):
        import sys
        sys.path.insert(0, "scripts")
        import run_baseline_configs as rbc

        class Args:
            epochs = 1
            seeds = ""
            configs = "1"
            batch_size = 16
            data_dir = str(tmp_path / "empty")
            data_folder = str(tmp_path / "runs")
            digits = False
            verbose = False

        with pytest.raises(FileNotFoundError):
            rbc.run(Args())
