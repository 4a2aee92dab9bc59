"""Device-resident dataset cache with on-device batch gather.

Shared by the Trainer and the EnsembleTrainer: datasets under the size
limit are copied to HBM once, and per-batch work reduces to transferring
a ~16 KB index array and gathering rows on device -- host->device pixel
transfers were measured as the dominant fit-loop cost on relay-attached
TPUs (see train/trainer.py).
"""
from __future__ import annotations

import weakref

import jax.numpy as jnp
import numpy as np

__all__ = ["DeviceDataCache"]


class DeviceDataCache:
    """Weak-keyed per-loader HBM copies.

    Weak keying means a garbage-collected loader frees its HBM copy, and a
    new loader allocated at the same address can never hit a stale entry.
    """

    def __init__(self, limit_bytes: int = 512 * 1024 * 1024):
        self.limit_bytes = limit_bytes
        self._cache = weakref.WeakKeyDictionary()

    def fits(self, loader) -> bool:
        return 0 < loader.x.nbytes <= self.limit_bytes

    def arrays(self, loader):
        if loader not in self._cache:
            self._cache[loader] = (jnp.asarray(loader.x), jnp.asarray(loader.y))
        return self._cache[loader]

    def batches(self, loader):
        """One epoch of (x, y, w) device batches (w is all-ones: no mesh
        padding happens on this path)."""
        x_dev, y_dev = self.arrays(loader)
        for idx in loader.iter_indices():
            idx_d = jnp.asarray(idx)
            yield (
                jnp.take(x_dev, idx_d, axis=0),
                jnp.take(y_dev, idx_d, axis=0),
                jnp.ones((idx.shape[0],), jnp.float32),
            )
