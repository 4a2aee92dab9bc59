#!/usr/bin/env python
"""Fetch / verify MNIST and Fashion-MNIST into $SNN_TPU_DATA_DIR.

The reference acquires data via torchvision's ``download=True``
(/root/reference/src/datasets/datasets.py:129-135).  This script is the
standalone counterpart: it downloads the four IDX .gz files per dataset
from documented mirrors, verifies their MD5 checksums (the same ones
torchvision pins), and writes them under::

    $SNN_TPU_DATA_DIR/<mnist|fashion-mnist>/

so ``data.load_raw`` picks them up immediately.  In zero-egress
environments the download fails with a clear message; ``--verify`` checks
files that were dropped in place by other means, and ``--make-npz``
repacks verified IDX files into a single ``mnist.npz``-style archive.

Usage:
    python scripts/fetch_datasets.py                  # fetch both datasets
    python scripts/fetch_datasets.py --verify         # just check local files
    python scripts/fetch_datasets.py --make-npz       # IDX -> npz repack
    SNN_TPU_DATA_DIR=/data python scripts/fetch_datasets.py mnist
"""
from __future__ import annotations

import argparse
import hashlib
import os
import pathlib
import sys
import urllib.error
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from snnimageclassification_tpu.data.datasets import DATA_DIR_ENV, read_idx

# Mirrors, tried in order.  yann.lecun.com frequently 403s scripted
# fetches; the GCS/S3 mirrors host byte-identical files.
MIRRORS = {
    "mnist": (
        "https://storage.googleapis.com/cvdf-datasets/mnist/",
        "https://ossci-datasets.s3.amazonaws.com/mnist/",
        "http://yann.lecun.com/exdb/mnist/",
    ),
    "fashion-mnist": (
        "http://fashion-mnist.s3-website.eu-central-1.amazonaws.com/",
    ),
}

# File -> MD5, as pinned by torchvision.datasets.{MNIST,FashionMNIST}.
CHECKSUMS = {
    "mnist": {
        "train-images-idx3-ubyte.gz": "f68b3c2dcbeaaa9fbdd348bbdeb94873",
        "train-labels-idx1-ubyte.gz": "d53e105ee54ea40749a09fcbcd1e9432",
        "t10k-images-idx3-ubyte.gz": "9fb629c4189551a2d022fa330f9573f3",
        "t10k-labels-idx1-ubyte.gz": "ec29112dd5afa0611ce80d1b7f02629c",
    },
    "fashion-mnist": {
        "train-images-idx3-ubyte.gz": "8d4fb7e6c68d591d4c3dfef9ec88bf0d",
        "train-labels-idx1-ubyte.gz": "25c81989df183df01b3e8a0aad5dffbe",
        "t10k-images-idx3-ubyte.gz": "bef4ecab320f06d8554ea6380940ec79",
        "t10k-labels-idx1-ubyte.gz": "bb300cfdad3c16e7a12a480ee83cd310",
    },
}

NPZ_NAME = {"mnist": "mnist.npz", "fashion-mnist": "fashion_mnist.npz"}


def md5_of(path: pathlib.Path) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def data_root() -> pathlib.Path:
    return pathlib.Path(os.environ.get(DATA_DIR_ENV, "data/datasets"))


def verify(dataset: str, folder: pathlib.Path, *, strict_md5: bool = True) -> bool:
    """True iff all four IDX files exist (and match MD5 when strict)."""
    ok = True
    for name, want in CHECKSUMS[dataset].items():
        path = folder / name
        plain = folder / name[: -len(".gz")]
        if path.exists():
            got = md5_of(path)
            if strict_md5 and got != want:
                print(f"  BAD MD5 {path}: {got} != {want}")
                ok = False
            else:
                print(f"  ok {path}")
        elif plain.exists():
            print(f"  ok {plain} (uncompressed; md5 not pinned)")
        else:
            print(f"  MISSING {path}")
            ok = False
    return ok


def fetch(dataset: str, folder: pathlib.Path) -> bool:
    folder.mkdir(parents=True, exist_ok=True)
    all_ok = True
    for name, want in CHECKSUMS[dataset].items():
        dest = folder / name
        if dest.exists() and md5_of(dest) == want:
            print(f"  have {dest}")
            continue
        got_one = False
        for mirror in MIRRORS[dataset]:
            url = mirror + name
            try:
                print(f"  GET {url}")
                with urllib.request.urlopen(url, timeout=60) as r:
                    data = r.read()
            except (urllib.error.URLError, OSError, TimeoutError) as e:
                print(f"    failed: {e}")
                continue
            got = hashlib.md5(data).hexdigest()
            if got != want:
                print(f"    BAD MD5 {got} != {want}; trying next mirror")
                continue
            dest.write_bytes(data)
            print(f"    wrote {dest} ({len(data)} bytes, md5 ok)")
            got_one = True
            break
        if not got_one:
            print(
                f"  could not fetch {name} from any mirror (no egress?). "
                f"Drop the file at {dest} manually."
            )
            all_ok = False
    return all_ok


def make_npz(dataset: str, folder: pathlib.Path) -> bool:
    """Repack verified IDX files into one npz (the other layout load_raw
    probes); convenient for copying a dataset around as a single file."""
    import numpy as np

    names = list(CHECKSUMS[dataset])
    paths = []
    for name in names:
        p = folder / name
        if not p.exists():
            p = folder / name[: -len(".gz")]
        if not p.exists():
            print(f"  cannot repack: missing {name}")
            return False
        paths.append(p)
    arrays = dict(
        x_train=read_idx(paths[0]),
        y_train=read_idx(paths[1]),
        x_test=read_idx(paths[2]),
        y_test=read_idx(paths[3]),
    )
    out = data_root() / NPZ_NAME[dataset]
    np.savez_compressed(out, **arrays)
    print(f"  wrote {out}")
    return True


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "datasets", nargs="*", default=["mnist", "fashion-mnist"],
        help="subset of: mnist fashion-mnist (default: both)",
    )
    ap.add_argument("--verify", action="store_true", help="check local files only")
    ap.add_argument("--make-npz", action="store_true", help="repack IDX -> npz")
    args = ap.parse_args(argv)
    datasets = args.datasets or ["mnist", "fashion-mnist"]

    ok = True
    for ds in datasets:
        if ds not in CHECKSUMS:
            print(f"unknown dataset {ds!r}; choose from {list(CHECKSUMS)}")
            return 2
        folder = data_root() / ds
        print(f"{ds} -> {folder}")
        if args.verify:
            ok &= verify(ds, folder)
        elif args.make_npz:
            ok &= make_npz(ds, folder)
        else:
            ok &= fetch(ds, folder)
    if ok:
        print("all requested files present and verified")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
