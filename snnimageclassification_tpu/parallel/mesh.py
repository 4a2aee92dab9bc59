"""Device mesh + sharding helpers.

The reference has no parallelism of any kind (SURVEY §2.2): single device,
``.to(cuda)``.  The TPU-native scale-out story is GSPMD data parallelism:

* a 1-D ``Mesh`` over all chips with a ``"data"`` axis;
* parameters and optimizer state **replicated** (tiny model: 784x128x10);
* the batch axis **sharded** across chips;
* ``jit`` with sharding annotations -- XLA inserts the gradient
  all-reduce over ICI automatically.  No hand-written collectives needed
  at this model scale; the multi-seed sweep axis can ride the same mesh.

Everything here also runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count=N``) for testing.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "shard_batch",
    "pad_to_multiple",
]

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """1-D data-parallel mesh over (a prefix of) the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, optimizer state)."""
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def pad_to_multiple(x: np.ndarray, multiple: int):
    """Pad the leading axis up to a multiple; returns (padded, weights).

    Weights are 1.0 for real rows and 0.0 for padding -- used to keep
    losses/metrics exact when the last batch doesn't divide the mesh.
    """
    n = x.shape[0]
    rem = (-n) % multiple
    w = np.ones((n,), np.float32)
    if rem == 0:
        return x, w
    pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad_width), np.pad(w, (0, rem))


def shard_batch(mesh: Mesh, *arrays, axis_name: str = DATA_AXIS):
    """device_put arrays with leading-axis sharding (pads are the caller's
    job; the leading dim must divide the mesh size)."""
    sh = batch_sharded(mesh, axis_name)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
