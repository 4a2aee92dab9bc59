"""Device-resident dataset cache with on-device batch gather.

Shared by the Trainer and the EnsembleTrainer: datasets under the size
limit are copied to HBM once, and per-batch work reduces to transferring
a ~16 KB index array and gathering rows on device -- host->device pixel
transfers were measured as the dominant fit-loop cost on relay-attached
TPUs (see train/trainer.py).
"""
from __future__ import annotations

import weakref

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DeviceDataCache", "pad_rows"]


def pad_rows(idx: np.ndarray, target: int):
    """Pad a 1-D index array up to ``target`` rows; returns (padded, w).

    Padding rows index row 0 (any valid row works) and carry weight 0, so
    weighted losses/metrics stay exact while every batch of an epoch
    shares one compiled shape."""
    n = idx.shape[0]
    w = np.ones((n,), np.float32)
    if target <= n:
        return idx, w
    return np.pad(idx, (0, target - n)), np.pad(w, (0, target - n))


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

    def arrays(self, loader, mesh=None):
        """Device copies of the loader's arrays; replicated over ``mesh``
        when one is given."""
        cached = self._cache.get(loader)
        if cached is not None and cached[0] == mesh:
            return cached[1], cached[2]
        if mesh is None:
            x, y = jnp.asarray(loader.x), jnp.asarray(loader.y)
        else:
            from ..parallel.mesh import replicated

            repl = replicated(mesh)
            x = jax.device_put(jnp.asarray(loader.x), repl)
            y = jax.device_put(jnp.asarray(loader.y), repl)
        self._cache[loader] = (mesh, x, y)
        return x, y

    def batches(self, loader, mesh=None):
        """One epoch of (x, y, w) device batches.

        Single-device: plain on-device gathers.  Under a ``mesh``: the
        dataset is HBM-resident *replicated*, the gather runs on device,
        and the result is resharded to the batch axis -- a
        replicated->sharded device_put is a local slice, no cross-chip
        traffic.  Host->device work per batch stays a ~KB index transfer
        either way.

        Every batch is padded up to ``loader.batch_size`` rows (and then
        to the mesh size) with weight-0 rows, so one compiled step shape
        serves the whole epoch -- a remainder batch would otherwise
        trigger a full recompile of the T-step kernels, which costs
        minutes on relay-attached TPUs and dwarfs the wasted rows.
        """
        x_dev, y_dev = self.arrays(loader, mesh)
        if mesh is None:
            for idx in loader.iter_indices():
                idx_p, w = pad_rows(np.asarray(idx), loader.batch_size)
                idx_d = jnp.asarray(idx_p)
                yield (
                    jnp.take(x_dev, idx_d, axis=0),
                    jnp.take(y_dev, idx_d, axis=0),
                    jnp.asarray(w),
                )
            return

        from ..parallel.mesh import batch_sharded, pad_to_multiple, replicated

        bsh = batch_sharded(mesh)
        repl = replicated(mesh)
        for idx in loader.iter_indices():
            idx_p, w = pad_rows(np.asarray(idx), loader.batch_size)
            idx_p, w2 = pad_to_multiple(idx_p, mesh.size)
            w = np.pad(w, (0, w2.shape[0] - w.shape[0]))
            idx_d = jax.device_put(jnp.asarray(idx_p), repl)
            yield (
                jax.device_put(jnp.take(x_dev, idx_d, axis=0), bsh),
                jax.device_put(jnp.take(y_dev, idx_d, axis=0), bsh),
                jax.device_put(jnp.asarray(w), bsh),
            )
