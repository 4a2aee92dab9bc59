"""Multi-host (multi-controller) execution over DCN.

The reference is a single-process, single-device program (SURVEY §2.2:
``.to(cuda)``, no ``torch.distributed``).  Real TPU pods are driven the
JAX way instead: ONE Python process per host, each seeing only its local
chips; ``jax.distributed.initialize`` wires the processes into a single
global runtime, and jitted programs run SPMD across every chip of every
host with XLA-inserted collectives -- ICI within a slice, DCN across
hosts.

This module supplies the pieces the rest of the framework needs to run
that way, plus a local test harness (N processes x M virtual CPU devices
with gloo collectives) so multi-controller behavior is exercised in CI
without pod hardware:

* :func:`initialize` -- environment-aware wrapper of
  ``jax.distributed.initialize`` (handles the forced-TPU-backend
  sitecustomize and virtual-CPU test clusters);
* :func:`make_multihost_mesh` -- a mesh whose axes are laid out
  **DCN-outermost**: the "data" axis spans processes, so the one
  per-step gradient all-reduce is the only collective that crosses DCN,
  while "model" / "pipe" axes are constrained to devices of a single
  process so their *per-time-step* collectives (spike all_gather,
  microbatch ppermute) always ride ICI.  This is the standard
  pod-scaling recipe: put the lowest-frequency collective on the
  slowest interconnect;
* :func:`global_batch` -- assemble a globally-sharded batch from
  per-process local rows (for host-streaming input pipelines);
* :func:`process_local_rows` -- which rows of a global batch this
  process should produce;
* :func:`is_main` / :func:`barrier` -- rank-0 file-I/O guards and a
  cross-process sync point.

The ``Trainer`` / ``EnsembleTrainer`` accept the returned mesh directly:
datasets are device-cached replicated (identical bytes on every process
-- the loaders' seeded shuffles keep index order process-identical), so
per-batch work stays a local slice and all cross-process traffic is
GSPMD-inserted.  Checkpoint files are written by process 0 only; on
restore every process reads the same files, which requires the
checkpoint folder to be on a filesystem shared across hosts (the normal
pod setup -- same contract as Orbax's single-replica writers).
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "initialize",
    "make_multihost_mesh",
    "global_batch",
    "process_local_rows",
    "is_main",
    "barrier",
    "broadcast_flag",
    "process_count",
]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_virtual_cpu_devices: Optional[int] = None,
) -> None:
    """Wire this process into a multi-controller JAX runtime.

    On a real TPU pod, call with no arguments from every host (the TPU
    runtime supplies coordinator/process topology).  For a local test
    cluster, pass all four arguments: ``local_virtual_cpu_devices`` pins
    the CPU platform and splits it into that many virtual devices per
    process (gloo collectives connect the processes).

    Must run before any other JAX API touches the backend -- platform
    and process topology freeze at first backend initialization.
    """
    import jax

    if local_virtual_cpu_devices is not None:
        # Replace (not merely append) any inherited device-count flag: a
        # parent test process's 8-device XLA_FLAGS would otherwise leak
        # into every cluster process and change the global topology.
        flags = [
            f
            for f in os.environ.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        flags.append(
            "--xla_force_host_platform_device_count="
            f"{local_virtual_cpu_devices}"
        )
        os.environ["XLA_FLAGS"] = " ".join(flags)
        # The axon sitecustomize force-registers the TPU backend and
        # ignores JAX_PLATFORMS; the config API wins (CLAUDE.md).
        jax.config.update("jax_platforms", "cpu")
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def process_count() -> int:
    import jax

    return jax.process_count()


def is_main() -> bool:
    """True on the process allowed to touch shared files (rank 0)."""
    import jax

    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Block until every process reaches the same point.  No-op in
    single-process runs."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def broadcast_flag(value: bool) -> bool:
    """Process 0's view of ``value``, on every process.

    Control-flow decisions derived from shared-filesystem state (e.g.
    "does the checkpoint meta file exist?") MUST NOT be re-derived per
    rank: ranks can sample the filesystem at different moments (or
    through stale NFS attribute caches) and diverge -- one rank enters a
    barrier the other skips, deadlocking the cluster.  Broadcasting rank
    0's decision makes the branch identical everywhere.  Identity in
    single-process runs."""
    import jax

    if jax.process_count() == 1:
        return bool(value)
    from jax.experimental import multihost_utils

    return bool(
        multihost_utils.broadcast_one_to_all(np.asarray(bool(value)))
    )


def _sorted_global_devices():
    import jax

    return sorted(jax.devices(), key=lambda d: (d.process_index, d.id))


def make_multihost_mesh(n_model: int = 1, n_pipe: int = 1):
    """Global mesh over every device of every process, DCN-outermost.

    Axis names match what the ``Trainer`` dispatches on (``parallel.tp``
    / ``parallel.pp`` / ``parallel.pp3`` conventions):

    * ``n_model == n_pipe == 1`` -> 1-D ``("data",)``;
    * ``n_model > 1``            -> ``("data", "model")``;
    * ``n_pipe > 1``             -> ``("data", "pipe")``;
    * both                        -> ``("data", "pipe", "model")``.

    Devices are ordered process-major, so with ``n_pipe * n_model``
    dividing every process's local device count (enforced), each
    model/pipe group lives inside ONE process: per-time-step TP/PP
    collectives stay on ICI, and only the "data"-axis gradient
    all-reduce crosses DCN.  Single-process runs degrade to the plain
    ``parallel.mesh`` / ``tp`` / ``pp`` / ``pp3`` layouts.
    """
    import jax
    from jax.sharding import Mesh

    devices = _sorted_global_devices()
    inner = n_model * n_pipe
    n_local = len(jax.local_devices())
    if inner > 1 and n_local % inner != 0:
        raise ValueError(
            f"model x pipe axes ({n_model} x {n_pipe}) must divide each "
            f"process's local device count ({n_local}) so their per-step "
            f"collectives stay on ICI; got remainder {n_local % inner}"
        )
    if len(devices) % inner != 0:
        raise ValueError(
            f"{len(devices)} devices not divisible by pipe*model = {inner}"
        )
    n_data = len(devices) // inner
    arr = np.array(devices).reshape(n_data, n_pipe, n_model)
    if n_pipe > 1 and n_model > 1:
        return Mesh(arr, ("data", "pipe", "model"))
    if n_pipe > 1:
        return Mesh(arr.reshape(n_data, n_pipe), ("data", "pipe"))
    if n_model > 1:
        return Mesh(arr.reshape(n_data, n_model), ("data", "model"))
    return Mesh(arr.reshape(n_data), ("data",))


def process_local_rows(mesh, n_rows: int) -> slice:
    """The contiguous block of a ``("data", ...)``-sharded global batch
    of ``n_rows`` that THIS process's devices own (devices are laid out
    process-major by :func:`make_multihost_mesh`)."""
    import jax

    if n_rows % jax.process_count() != 0:
        raise ValueError(
            f"global batch of {n_rows} rows must divide the "
            f"{jax.process_count()} processes"
        )
    per = n_rows // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def global_batch(mesh, *local_arrays, axis_name: str = "data"):
    """Assemble globally-"data"-sharded arrays from per-process local
    rows (each process passes ITS slice, see :func:`process_local_rows`).

    For the replicated-dataset path the ``Trainer`` uses, this is not
    needed -- it exists for host-streaming pipelines whose shards never
    materialize on one host."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(axis_name))
    out = tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(a))
        for a in local_arrays
    )
    return out if len(out) > 1 else out[0]
