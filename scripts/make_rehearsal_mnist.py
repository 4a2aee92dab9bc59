"""Write MNIST-shaped IDX files for the full-scale parity dress rehearsal.

The zero-egress environment has no real MNIST/Fashion-MNIST; this script
manufactures datasets of EXACTLY MNIST's wire shape (60,000 + 10,000
x 28x28 uint8, standard IDX file names, optionally gzipped) from the only
real image data available -- sklearn's bundled 8x8 optical digits --
so that ``scripts/run_baseline_configs.py`` can be exercised end to end
through the ``DatasetId.MNIST`` / ``FASHION_MNIST`` loader paths
(``data/datasets.py:_try_load_idx_folder`` + the native C++ IDX parser)
at true MNIST scale: memory, loader, sweep-CSV, figures, wall clock.

Construction: each 8x8 digit is nearest-upscaled x3 to 24x24 and
zero-padded to 28x28 (MNIST digits have black borders too); the 60k/10k
samples draw from DISJOINT train/test pools of the 1,797 originals with
per-sample +/-2px shifts and mild pixel noise, so test accuracy measures
real generalization over real handwritten-digit structure.  Published
MNIST/FMNIST numbers do NOT apply -- this is a rehearsal dataset, and the
"fashion-mnist" folder is just a second seed of the same construction.

    python scripts/make_rehearsal_mnist.py --out /tmp/rehearsal_data
    SNN_TPU_DATA_DIR=/tmp/rehearsal_data python scripts/run_baseline_configs.py ...
"""
import argparse
import gzip
import struct
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))


def write_idx(path: Path, arr: np.ndarray, compress: bool = False) -> None:
    """Serialize ``arr`` (uint8) in IDX format (the MNIST wire format)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    header = struct.pack("BBBB", 0, 0, 0x08, arr.ndim)
    header += struct.pack(f">{arr.ndim}I", *arr.shape)
    opener = gzip.open if compress else open
    with opener(str(path) + (".gz" if compress else ""), "wb") as f:
        f.write(header)
        f.write(arr.tobytes())


def upscale_28(img8: np.ndarray) -> np.ndarray:
    """8x8 -> 28x28: x3 nearest upscale + 2px zero border."""
    up = np.kron(img8, np.ones((3, 3), img8.dtype))  # 24x24
    return np.pad(up, 2)


def make_split(pool_x: np.ndarray, pool_y: np.ndarray, n: int,
               rng: np.random.Generator):
    """n samples with replacement from the pool, shifted +/-2px + noise."""
    idx = rng.integers(0, pool_x.shape[0], size=n)
    x = pool_x[idx]
    y = pool_y[idx].astype(np.uint8)
    out = np.zeros((n, 28, 28), np.uint8)
    shifts = rng.integers(-2, 3, size=(n, 2))
    noise = rng.normal(0.0, 8.0, size=(n, 28, 28))
    for i in range(n):
        img = np.roll(x[i], tuple(shifts[i]), axis=(0, 1))
        out[i] = np.clip(img.astype(np.float32) + noise[i], 0, 255)
    return out, y


def build_dataset(seed: int, n_train: int, n_test: int):
    from sklearn.datasets import load_digits

    d = load_digits()
    imgs = np.stack([
        upscale_28((im * (255.0 / 16.0)).astype(np.uint8)) for im in d.images
    ])
    labels = d.target.astype(np.uint8)
    # Disjoint pools (same 80/20 convention as data.datasets._load_digits_raw)
    perm = np.random.default_rng(0).permutation(imgs.shape[0])
    imgs, labels = imgs[perm], labels[perm]
    n_pool_test = imgs.shape[0] // 5
    rng = np.random.default_rng(seed)
    tr_x, tr_y = make_split(imgs[n_pool_test:], labels[n_pool_test:],
                            n_train, rng)
    te_x, te_y = make_split(imgs[:n_pool_test], labels[:n_pool_test],
                            n_test, rng)
    return tr_x, tr_y, te_x, te_y


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--n-train", type=int, default=60000)
    ap.add_argument("--n-test", type=int, default=10000)
    ap.add_argument("--gzip", action="store_true",
                    help="write .gz files (exercises the gz probe leg)")
    args = ap.parse_args()

    for sub, seed in (("mnist", 1), ("fashion-mnist", 2)):
        folder = Path(args.out) / sub
        folder.mkdir(parents=True, exist_ok=True)
        tr_x, tr_y, te_x, te_y = build_dataset(seed, args.n_train,
                                               args.n_test)
        write_idx(folder / "train-images-idx3-ubyte", tr_x, args.gzip)
        write_idx(folder / "train-labels-idx1-ubyte", tr_y, args.gzip)
        write_idx(folder / "t10k-images-idx3-ubyte", te_x, args.gzip)
        write_idx(folder / "t10k-labels-idx1-ubyte", te_y, args.gzip)
        print(f"{folder}: train {tr_x.shape} test {te_x.shape} "
              f"({tr_x.nbytes / 1e6:.0f} MB images)")


if __name__ == "__main__":
    main()
