"""Training engine: jitted BPTT steps, fit loop, evaluation.

Replaces the reference's eager per-batch loop (snn.py:280-415) with a
fully jitted, donated train step: encode (on device) -> scan-simulate ->
max-over-time logits -> NLL loss -> BPTT grads -> Adam+L2 update, all one
XLA computation per batch.

Optimizer parity: the reference uses ``torch.optim.Adam(lr=1e-3,
weight_decay=1e-5)`` (snn.py:298-299), i.e. L2 added to the gradient
*before* the Adam moments -- ``optax.chain(add_decayed_weights,
adam)``, NOT decoupled AdamW.  A learnable ALIF beta has a dead gradient
(quirk Q3); torch's Adam skips grad-less params entirely, so beta is
masked out of both decay and the update via ``optax.multi_transform``
(verified empirically: an unmasked Adam walks the zero-grad beta to 0 at
lr-sized steps because adaptive normalization amplifies the tiny decay
term).

Loss parity: ``nn.NLLLoss`` on log-softmax of max-over-time logits
(snn.py:296, 250-258, 228) == softmax cross-entropy on the logits, mean
reduction.
"""
from __future__ import annotations

import logging
import os
import shutil
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.datasets import ArrayDataLoader, EncodeConfig
from ..models import snn as model_lib
from ..models.config import SNNConfig
from ..ops.encoding import encode_spikes
from ..utils.history import LossHistory
from .checkpoint import CheckpointManager, LoadCheckpointMode

__all__ = ["Trainer", "make_optimizer", "nll_loss", "default_criterion"]

logger = logging.getLogger(__name__)

# Plateau tolerance of the early-stopping detector (snn.py:272-278's
# baked-in 1e-2).  Env-overridable so benchmarks can disable the plateau
# (SNN_TPU_ES_TOL=0 -> |diff| < 0 never holds once the window has >= 2
# real entries) without touching the training math.
ES_TOL = float(os.environ.get("SNN_TPU_ES_TOL", "1e-2"))


def nll_loss(
    logits: jax.Array, labels: jax.Array, weights: Optional[jax.Array] = None
) -> jax.Array:
    """Mean NLL of log-softmax(logits) -- the reference's default criterion
    (snn.py:296-297 with snn.py:258).

    ``weights`` (0/1 per sample) keeps the mean exact when a batch is
    padded up to the mesh size under data parallelism.
    """
    per_sample = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if weights is None:
        return per_sample.mean()
    return jnp.sum(per_sample * weights) / jnp.maximum(jnp.sum(weights), 1.0)


default_criterion = nll_loss


def checkpoint_selected(epoch: int, nb_epochs: int, every: int) -> bool:
    """Which epochs get a checkpoint FILE under ``fit(checkpoint_every=N)``:
    every Nth plus the final epoch.  (The global-best epoch is handled
    separately: tracked on device and written once at fit end.)  The one
    definition shared by both trainers' per-epoch and blocked paths."""
    return epoch % every == 0 or epoch == nb_epochs - 1


def make_optimizer(
    param_labels,
    lr: float = 1e-3,
    weight_decay: float = 1e-5,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = None,
    grad_accum: Optional[int] = None,
) -> optax.GradientTransformation:
    """Adam + L2 matching ``torch.optim.Adam(lr, weight_decay)``
    (snn.py:299), with dead-gradient leaves (label "beta") frozen.

    ``max_grad_norm`` is a beyond-reference stability knob (global-norm
    gradient clipping before the decay+Adam chain).  Default ``None``
    reproduces the reference exactly -- its regime has no clipping and is
    genuinely unstable on small datasets (see PARITY.md seed-sensitivity
    note); opt in where stability matters more than strict parity."""
    steps = [
        optax.add_decayed_weights(weight_decay),
        optax.adam(lr, b1=b1, b2=b2, eps=eps),
    ]
    if max_grad_norm is not None:
        steps.insert(0, optax.clip_by_global_norm(float(max_grad_norm)))
    weight_tx = optax.chain(*steps)
    tx = optax.multi_transform(
        {"weight": weight_tx, "beta": optax.set_to_zero()},
        param_labels,
    )
    if grad_accum is not None and int(grad_accum) > 1:
        # Gradient accumulation (beyond-reference production knob):
        # average grads over K consecutive micro-batches and apply ONE
        # Adam update -- with uniform sample weights and equal micro-batch
        # sizes this reproduces a K-times-larger batch exactly (the mean
        # of per-micro-batch mean grads IS the big-batch mean grad), at
        # 1/K the activation memory.  MultiSteps keeps the accumulator
        # and a step counter in opt_state, so it scans/checkpoints/
        # restores like any other optimizer state.
        tx = optax.MultiSteps(tx, every_k_schedule=int(grad_accum))
    return tx


@jax.jit
def _pack_leaves(leaves):
    """Concatenate arbitrary-dtype leaves into one uint8 device buffer."""
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(
            l.ravel().astype(jnp.uint8) if l.dtype == jnp.bool_ else l.ravel(),
            jnp.uint8,
        ).ravel()
        for l in leaves
    ])


def _is_packable(leaf) -> bool:
    return isinstance(leaf, (jax.Array, np.ndarray)) and leaf.size


def _unpack_flat(flat: np.ndarray, template_tree):
    """Slice one packed uint8 host buffer back into ``template_tree``'s
    structure (inverse of :func:`_pack_leaves` on its packable leaves;
    non-array / empty leaves pass through from the template)."""
    leaves, treedef = jax.tree_util.tree_flatten(template_tree)
    out, off = [], 0
    for l in leaves:
        if not _is_packable(l):
            out.append(np.asarray(l) if isinstance(l, jax.Array) else l)
            continue
        nbytes = l.size * l.dtype.itemsize
        out.append(
            np.frombuffer(flat[off:off + nbytes].tobytes(), dtype=l.dtype)
            .reshape(l.shape)
        )
        off += nbytes
    return jax.tree_util.tree_unflatten(treedef, out)


def host_snapshot(tree, mesh=None):
    """Device->host copy of a pytree in ONE device round trip.

    ``jax.device_get`` fetches leaf by leaf; on relay-attached TPUs every
    fetch pays a ~30 ms round trip, so a params+opt_state tree (~30
    leaves) costs ~1 s.  Packing the leaves into a single uint8 buffer on
    device and slicing on the host makes it one round trip regardless of
    tree size.

    ``mesh``: in a multi-process (multi-host) run, leaves sharded over
    the mesh (TP/PP params) are not host-fetchable per process; packing
    with a fully-replicated out_sharding turns the fetch into an
    all-gather + local copy on every host."""
    leaves, _ = jax.tree_util.tree_flatten(tree)
    arrays = [l for l in leaves if _is_packable(l)]
    if not arrays:
        return jax.device_get(tree)
    if mesh is not None and jax.process_count() > 1:
        flat = np.asarray(_replicated_pack_for(mesh)(arrays))
    else:
        flat = np.asarray(_pack_leaves(arrays))  # the single transfer
    return _unpack_flat(flat, tree)


_REPL_PACK_CACHE: dict = {}


def _replicated_pack_for(mesh):
    """Cached jitted pack with a fully-replicated out-sharding (a fresh
    jax.jit wrapper per call would re-trace the pack program on every
    checkpoint save)."""
    fn = _REPL_PACK_CACHE.get(mesh)
    if fn is None:
        from jax.sharding import NamedSharding, PartitionSpec

        fn = jax.jit(
            _pack_leaves,
            out_shardings=NamedSharding(mesh, PartitionSpec()),
        )
        _REPL_PACK_CACHE[mesh] = fn
    return fn


def _encode_on_device(x: jax.Array, enc: EncodeConfig) -> jax.Array:
    """Pixels -> model inputs, inside the jitted step."""
    if not enc.as_timeseries:
        return x  # 2-D: the model repeats pixels over time (snn.py:159-171)
    return encode_spikes(
        x,
        n_steps=enc.n_steps,
        use_periods=enc.use_periods,
        tau=enc.tau,
        thr=enc.thr,
        epsilon=enc.epsilon,
    )


class Trainer:
    """Owns params/opt_state and runs the fit/eval loops.

    The public surface mirrors ``SNN.fit`` and the evaluators
    (snn.py:280-350, 507-555); the compute path is jitted end-to-end.
    """

    def __init__(
        self,
        cfg: SNNConfig,
        *,
        checkpoint_folder: str = "checkpoints",
        model_name: str = "snn",
        seed: int = 0,
        criterion: Optional[Callable] = None,
        mesh=None,
        reg_fn: Optional[Callable] = None,
        pp_n_micro: Optional[int] = None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a "data" axis; when
        given, every step runs data-parallel (params replicated, batch
        sharded, XLA-inserted gradient all-reduce over ICI).  A 2-D mesh
        with a "model" axis (``parallel.tp.make_2d_mesh``) additionally
        shards every hidden layer's neurons over "model" (Megatron-style
        column sharding, ``parallel/tp.py``) -- same fit/eval/checkpoint
        surface, tensor-parallel compute.  A 2-D mesh with a "pipe" axis
        (``parallel.pp.make_pp_mesh``) instead pipelines one layer per
        stage, GPipe-microbatched (``parallel/pp.py``); ``pp_n_micro``
        sets the microbatch count (default ``2 * n_stages``).  A 3-D
        mesh with BOTH axes (``parallel.pp3.make_3d_mesh``: ("data",
        "pipe", "model")) runs the combined DP x PP x TP step
        (``parallel/pp3.py``) -- one layer per "pipe" stage, each
        stage's neurons column-sharded over "model".  Checkpoint
        files always store the canonical per-layer params (the stacked
        padded stage representation is converted on save/restore), so a
        PP-trained BEST checkpoint's *weights* reload into any other
        strategy; optimizer state is strategy-specific -- a cross-strategy
        resume restores params only and warns that Adam moments restart
        (``CheckpointManager.restore``).

        ``reg_fn``: optional spike regularizer (train/losses.py) taking the
        hidden-state traces dict and returning a scalar added to the loss.
        The reference sketches these but never enables them
        (snn.py:401-408); enabling one routes the forward through the
        trace-returning path (XLA scan, not the fused Pallas kernels)."""
        self.cfg = cfg
        self.params = model_lib.init(cfg, jax.random.PRNGKey(seed))
        self.criterion = criterion or default_criterion
        self.reg_fn = reg_fn
        self.ckpt = CheckpointManager(checkpoint_folder, model_name)
        self.loss_history = LossHistory()
        self.opt_state = None
        self.mesh = mesh
        # Datasets up to the cache limit are copied to HBM once and
        # batches gathered on device by index -- a 16 KB index transfer
        # per batch instead of multi-MB pixels (host->device bandwidth
        # measured as the fit-loop bottleneck: 417k img/s compute vs 17k
        # with per-batch pixel transfers on the relay-attached TPU).  Set
        # limit_bytes to 0 to force host streaming with prefetching.
        from ..data.device_cache import DeviceDataCache

        self.device_data = DeviceDataCache()
        self._tp = bool(
            mesh is not None
            and "model" in mesh.axis_names
            and mesh.shape["model"] > 1
        )
        self._pp = bool(
            mesh is not None
            and "pipe" in mesh.axis_names
            and mesh.shape["pipe"] > 1
        )
        self._pp_n_micro = pp_n_micro
        # Multi-controller (one process per host, parallel/multihost.py):
        # datasets replicate per process, file I/O is guarded to process 0
        # (CheckpointManager._is_writer) with cross-process barriers at fit
        # boundaries.  Everything the fit loop host-fetches (per-epoch
        # scalar stats, packed checkpoint snapshots) is constrained to a
        # fully-replicated sharding inside the jitted programs when
        # running multi-process -- np.asarray on a global jax.Array only
        # works when every process holds a complete copy.  Under TP/PP
        # the snapshot replication is a real collective (an all-gather of
        # the packed params over "model"/"pipe"); make_multihost_mesh
        # pins those axes inside one process so it rides ICI.
        self._multiproc = jax.process_count() > 1
        # Both axes > 1: combined 3-D DP x PP x TP (parallel/pp3.py) --
        # layer-per-stage GPipe whose stages are column-sharded over
        # "model".  Takes precedence over the single-strategy branches
        # everywhere below.
        self._pp3 = self._tp and self._pp
        if self._pp3:
            from ..parallel.pp3 import shard_params_pp3

            self._check_inside_shardmap_loss()
            self.params = shard_params_pp3(mesh, cfg, self.params)
        elif self._pp:
            from ..parallel.pp import shard_params_pp

            self._check_inside_shardmap_loss()
            self.params = shard_params_pp(mesh, cfg, self.params)
        elif self._tp:
            from ..parallel.tp import shard_params_2d

            self._check_inside_shardmap_loss()
            self.params = shard_params_2d(mesh, cfg, self.params)
        elif mesh is not None:
            from ..parallel.mesh import replicated

            self.params = jax.device_put(self.params, replicated(mesh))
        self._shard_forward = None  # cached shard_mapped forward (TP/PP predict)
        self._tx: Optional[optax.GradientTransformation] = None
        self._opt_hparams: Optional[tuple] = None
        self._step_cache: Dict = {}
        # Per-epoch checkpoint saves run in a background thread: JAX
        # arrays are immutable, so serializing the just-saved params while
        # the next epoch trains new ones is safe.  At most one save is in
        # flight; readers join it first (see _join_pending_save).
        self.async_checkpointing = True
        self._ckpt_thread = None

    def _reg_count_based(self) -> bool:
        """A reg_fn exposing ``from_counts`` (train/losses.py
        L1TotalSpikeCount / L2SpikesPerNeuron) trains on per-neuron spike
        counts instead of full hidden traces -- the fused-kernel path."""
        return self.reg_fn is not None and hasattr(self.reg_fn, "from_counts")

    def _check_inside_shardmap_loss(self):
        """TP/PP/3-D compute the weighted-NLL loss inside shard_map
        (parallel/tp.py, parallel/pp.py, parallel/pp3.py); custom criteria
        and trace-based regularizers need a data-only mesh.  COUNT-based
        regularizers (losses.L1TotalSpikeCount / L2SpikesPerNeuron) are
        supported under EVERY strategy: the sharded forwards emit
        shard-local spike counts and the reg term is psum'd over the mesh
        (parallel/tp.py _tp_reg_term; parallel/pp.py _pp_reg_term;
        parallel/pp3.py _pp3_reg_term)."""
        if self.reg_fn is not None:
            reg_ok = (
                self._reg_count_based()
                and getattr(self.reg_fn, "kind", None) in ("l1", "l2")
            )
            if not reg_ok:
                raise ValueError(
                    "trace-based reg_fn needs the full hidden traces, which "
                    "the tensor-/pipeline-parallel paths keep sharded; use "
                    "a data-only mesh, or a count-based regularizer "
                    "(losses.L1TotalSpikeCount / L2SpikesPerNeuron)"
                )
        if self.criterion is not default_criterion:
            raise ValueError(
                "tensor/pipeline parallelism computes the weighted-NLL "
                "loss inside shard_map; custom criteria need a data-only "
                "mesh"
            )

    def _canonical_params(self, params):
        """Checkpoint-file form of ``params``: the canonical per-layer
        dict.  Under PP the live params are the stacked padded stage
        representation; padding stays bitwise zero through training (zero
        grad -> zero Adam moments -> zero update, parallel/pp.py), so the
        slice-back is lossless and the round trip exact."""
        if self._pp:
            from ..parallel.pp import pp_unstack_params

            return pp_unstack_params(self.cfg, params)
        return params

    @property
    def canonical_params(self) -> Dict:
        """Params in the canonical per-layer form (converts PP's stacked
        stage representation; identity elsewhere)."""
        return self._canonical_params(self.params)

    def set_canonical_params(self, value) -> None:
        """Install canonical per-layer params, re-applying the trainer's
        parallelism-strategy placement (inverse of ``canonical_params``)."""
        if self._pp3:
            from ..parallel.pp3 import shard_params_pp3

            self.params = shard_params_pp3(self.mesh, self.cfg, value)
        elif self._pp:
            from ..parallel.pp import shard_params_pp

            self.params = shard_params_pp(self.mesh, self.cfg, value)
        elif self._tp:
            from ..parallel.tp import shard_params_2d

            self.params = shard_params_2d(self.mesh, self.cfg, value)
        elif self.mesh is not None:
            from ..parallel.mesh import replicated

            self.params = jax.device_put(value, replicated(self.mesh))
        else:
            self.params = value

    def _restore_placed(self, checkpoint):
        """Restore params/opt_state from a checkpoint payload, re-applying
        the live buffers' device shardings.

        ``CheckpointManager.restore`` yields host arrays; under a mesh --
        especially TP's mixed per-leaf param specs -- the restored leaves
        must land back where the compiled steps expect them (the DP path's
        explicit jit in_shardings used to paper over this; the TP path has
        no uniform annotation to lean on)."""
        def replace_mesh_leaves(restored, live):
            # Only re-place leaves whose live buffer actually spans the
            # mesh (TP-sharded / replicated weights).  Leaves that were
            # uncommitted single-device arrays (e.g. Adam's scalar count
            # from eager optax init) must stay as host arrays -- committing
            # them to one device would conflict with the mesh-spanning
            # params inside the unannotated TP/PP jits.
            mesh_devs = frozenset(self.mesh.devices.flat)
            shardings = [
                l.sharding if isinstance(l, jax.Array) else None
                for l in jax.tree_util.tree_leaves(live)
            ]
            leaves, treedef = jax.tree_util.tree_flatten(restored)
            leaves = [
                jax.device_put(l, s)
                if s is not None and frozenset(s.device_set) == mesh_devs
                else l
                for l, s in zip(leaves, shardings)
            ]
            return jax.tree_util.tree_unflatten(treedef, leaves)

        params_tmpl = self._canonical_params(self.params)
        params, opt_state = self.ckpt.restore(
            checkpoint, params_tmpl, self.opt_state
        )
        if self._pp:
            # Checkpoint files hold canonical per-layer params; live PP
            # params are the stacked padded stage representation (with
            # the "model"-divisible extra padding under 3-D).
            from jax.sharding import NamedSharding

            if self._pp3:
                from ..parallel.pp3 import pp3_param_specs, pp3_stack_params

                stacked = pp3_stack_params(
                    self.cfg, params, self.mesh.shape["model"]
                )
                specs = pp3_param_specs()
            else:
                from ..parallel.pp import pp_param_specs, pp_stack_params

                stacked = pp_stack_params(self.cfg, params)
                specs = pp_param_specs()
            params = jax.device_put(
                stacked,
                {k: NamedSharding(self.mesh, s) for k, s in specs.items()},
            )
        elif self.mesh is not None:
            params = replace_mesh_leaves(params, self.params)
        if self.mesh is not None:
            opt_state = replace_mesh_leaves(opt_state, self.opt_state)
        self.params, self.opt_state = params, opt_state

    def _join_pending_save(self):
        if self._ckpt_thread is not None:
            self._ckpt_thread.join()
            self._ckpt_thread = None

    def _barrier_before_load(self):
        """Multi-process: non-zero ranks must not read checkpoint files
        process 0's (async) writer may still be flushing; every rank
        reaches this point only after process 0 joined its writer thread
        (``_join_pending_save`` runs before the barrier on every rank)."""
        if self._multiproc:
            from ..parallel.multihost import barrier

            barrier("checkpoint-load")

    def _save_checkpoint(self, epoch: int, epoch_loss, is_best: bool):
        self._join_pending_save()
        if not self.async_checkpointing:
            params, opt_state = host_snapshot(
                (self.params, self.opt_state), self.mesh
            )
            self.ckpt.save_checkpoint(
                self._canonical_params(params), opt_state, epoch,
                epoch_loss, is_best,
            )
            return
        import threading

        # Main thread pays ONE on-device copy dispatch (the live buffers
        # get DONATED into the next epoch and would be deleted under the
        # thread); the thread does the single-round-trip host fetch
        # (host_snapshot) and the serialize+write.
        snap = jax.tree.map(jnp.copy, (self.params, self.opt_state))

        def save():
            params, opt_state = host_snapshot(snap, self.mesh)
            self.ckpt.save_checkpoint(
                self._canonical_params(params), opt_state, epoch,
                epoch_loss, is_best,
            )

        self._ckpt_thread = threading.Thread(target=save, daemon=True)
        self._ckpt_thread.start()

    # -- jitted step builders -------------------------------------------------
    def _build_steps(self, enc: EncodeConfig, tx: optax.GradientTransformation):
        """Build (train_step, eval_step) jitted for one encode config.

        With a mesh: params/opt_state replicated, batch sharded over the
        "data" axis; the gradient all-reduce is inserted by GSPMD.
        """
        cfg, criterion, reg_fn = self.cfg, self.criterion, self.reg_fn
        count_based = self._reg_count_based()

        def loss_fn(params, x, y, w):
            if reg_fn is not None and count_based:
                # Count-based regularizers (train/losses.py
                # L1TotalSpikeCount / L2SpikesPerNeuron) need only the
                # per-sample per-neuron spike counts -- the count-emitting
                # forward keeps the fused Pallas kernels engaged (the
                # trace path below is ~8x slower on the flagship).
                # Padding-row exactness: from_counts weighs by w.
                logits, spike_counts = model_lib.forward_logits_counts_pixels(
                    cfg, params, x, enc
                )
                return (
                    criterion(logits, y, w) + reg_fn.from_counts(
                        spike_counts, w
                    ),
                    logits,
                )
            if reg_fn is not None:
                trace, hidden = model_lib.apply_pixels(
                    cfg, params, x, enc, return_hidden=True
                )
                logits = model_lib.prediction_logits(cfg, trace)
                # Weight-0 padding rows (remainder-batch / mesh padding)
                # must not contribute spikes to the regularizer: mask the
                # hidden traces by the per-sample weights so the reg term
                # and its gradient stay exact regardless of padding.
                hidden = jax.tree.map(
                    lambda t: t * w.reshape((-1,) + (1,) * (t.ndim - 1)),
                    hidden,
                )
                return criterion(logits, y, w) + reg_fn(hidden), logits
            # Single-hidden-layer models fuse the whole network (encode ->
            # scan -> readout -> max) into one kernel pair on TPU.
            logits = model_lib.forward_logits_pixels(cfg, params, x, enc)
            return criterion(logits, y, w), logits

        if self._pp3:
            # Combined 3-D DP x PP x TP: GPipe stages column-sharded over
            # "model" inside one shard_map (parallel/pp3.py).  Same
            # (loss, logits) contract as the 2-D strategies below.
            from ..parallel.pp3 import make_pp3_loss_logits_fn

            loss_fn = make_pp3_loss_logits_fn(
                cfg, self.mesh, enc if enc.as_timeseries else None,
                self._pp_n_micro,
                reg=reg_fn if count_based else None,
            )
        elif self._tp:
            # Tensor parallelism: the whole forward+loss runs inside
            # shard_map (per-step spike all_gather over "model", loss
            # psum over both axes -- parallel/tp.py).  Same (loss,
            # logits) contract, so every step/epoch/block builder below
            # is strategy-agnostic.  Criterion/reg_fn restrictions are
            # enforced in __init__.
            from ..parallel.tp import make_tp_loss_logits_fn

            # as_timeseries=False feeds pixels as a constant-over-time 2-D
            # input (datasets.py EncodeConfig): the shard_mapped forwards'
            # enc=None path IS that semantics (format_inputs repeats 2-D
            # inputs over T), so drop the encoder instead of spike-encoding.
            loss_fn = make_tp_loss_logits_fn(
                cfg, self.mesh, enc if enc.as_timeseries else None,
                reg=reg_fn if count_based else None,
            )
        elif self._pp:
            # Pipeline parallelism: GPipe schedule inside shard_map, one
            # layer per "pipe" stage (parallel/pp.py).  Same (loss,
            # logits) contract as above.
            from ..parallel.pp import make_pp_loss_logits_fn

            loss_fn = make_pp_loss_logits_fn(
                cfg, self.mesh, enc if enc.as_timeseries else None,
                self._pp_n_micro,
                reg=reg_fn if count_based else None,
            )

        def train_step_fn(params, opt_state, x, y, w):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, x, y, w
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def eval_step_fn(params, x, y, w):
            loss, logits = loss_fn(params, x, y, w)
            preds = jnp.argmax(logits, axis=-1)
            return loss, preds

        if self._tp or self._pp:
            # Params/opt_state carry their strategy's param-spec
            # shardings; shard_map's in_specs reshard the (batch-sharded)
            # data args -- no jit sharding annotations needed, and none
            # would be uniform across the mixed param specs anyway.
            train_step = jax.jit(train_step_fn, donate_argnums=(0, 1))
            eval_step = jax.jit(eval_step_fn)
        elif self.mesh is not None:
            from ..parallel.mesh import batch_sharded, replicated

            repl = replicated(self.mesh)
            bsh = batch_sharded(self.mesh)
            train_step = jax.jit(
                train_step_fn,
                in_shardings=(repl, repl, bsh, bsh, bsh),
                out_shardings=(repl, repl, repl),
                donate_argnums=(0, 1),
            )
            eval_step = jax.jit(
                eval_step_fn,
                in_shardings=(repl, bsh, bsh, bsh),
                out_shardings=(repl, bsh),
            )
        else:
            train_step = jax.jit(train_step_fn, donate_argnums=(0, 1))
            eval_step = jax.jit(eval_step_fn)

        # Whole-epoch variants (device-resident dataset): one dispatch per
        # EPOCH instead of ~5 relay round trips per batch (index transfer,
        # two gathers, weights, step).  On relay-attached TPUs each round
        # trip costs ~30 ms, which dominates small-epoch fits; a lax.scan
        # over the shuffled index matrix keeps the whole epoch on device.
        # Identical math and batch order.
        #
        # Under a mesh the dataset lives replicated in HBM and each
        # scanned batch is resharded onto the "data" axis with a sharding
        # constraint -- a replicated->sharded transition is a local slice,
        # so GSPMD runs the step data-parallel with only the gradient
        # all-reduce crossing chips, exactly like the per-batch path.
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharded

            _bsh_epoch = batch_sharded(self.mesh)

            def shard_b(t):
                return jax.lax.with_sharding_constraint(t, _bsh_epoch)
        else:
            def shard_b(t):
                return t

        # Multi-process TP/PP: anything the fit loop host-fetches must be
        # fully replicated (see __init__).  The DP branch's explicit
        # out_shardings below already replicates; the TP/PP jits have no
        # uniform annotation, so constrain the fetched outputs in-graph.
        if self._multiproc and (self._tp or self._pp):
            from jax.sharding import NamedSharding, PartitionSpec

            _repl_host = NamedSharding(self.mesh, PartitionSpec())

            def host_repl(t):
                return jax.tree.map(
                    lambda l: jax.lax.with_sharding_constraint(l, _repl_host),
                    t,
                )
        else:
            def host_repl(t):
                return t

        def train_epoch_fn(params, opt_state, x_all, y_all, idx_mat, w_mat):
            def body(carry, batch):
                p, o = carry
                idx, w = batch
                p, o, loss = train_step_fn(
                    p, o, shard_b(jnp.take(x_all, idx, axis=0)),
                    shard_b(jnp.take(y_all, idx, axis=0)), shard_b(w),
                )
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (idx_mat, w_mat)
            )
            return params, opt_state, host_repl(losses)

        def eval_epoch_fn(params, x_all, y_all, idx_mat, w_mat):
            def body(_, batch):
                idx, w = batch
                w = shard_b(w)
                y = shard_b(jnp.take(y_all, idx, axis=0))
                loss, preds = eval_step_fn(
                    params, shard_b(jnp.take(x_all, idx, axis=0)), y, w
                )
                return 0, (loss, jnp.sum((preds == y) * w), jnp.sum(w))

            _, (losses, correct, total) = jax.lax.scan(
                body, 0, (idx_mat, w_mat)
            )
            return host_repl((losses, jnp.sum(correct), jnp.sum(total)))

        # Multi-epoch block: K train+val epochs in ONE dispatch.  Even the
        # whole-epoch scan pays ~2 blocking host interactions per epoch on
        # a relay-attached TPU (~30 ms each, vs ~50 ms of flagship
        # compute); scanning K epochs amortizes that to ~1/K per epoch.
        # Per-epoch checkpoint-file semantics are preserved by emitting a
        # packed (params, opt_state) snapshot per epoch as a scan output --
        # the (K, nbytes) stack is fetched ONCE per block in the async
        # checkpoint thread and sliced into K per-epoch files on the host.
        def train_block_fn(params, opt_state, x_tr, y_tr, ti, tw,
                           x_va, y_va, vi, vw):
            def epoch_body(carry, xs):
                p, o = carry
                eti, etw, evi, evw = xs
                p, o, tr_losses = train_epoch_fn(p, o, x_tr, y_tr, eti, etw)
                va_losses, corr, tot = eval_epoch_fn(p, x_va, y_va, evi, evw)
                snap = _pack_leaves(
                    [l for l in jax.tree_util.tree_leaves((p, o)) if l.size]
                )
                return (p, o), (jnp.mean(tr_losses), jnp.mean(va_losses),
                                corr, tot, snap)

            (params, opt_state), outs = jax.lax.scan(
                epoch_body, (params, opt_state), (ti, tw, vi, vw)
            )
            return params, opt_state, host_repl(outs)

        # Early-stopping block: the plateau decision (quirk Q6,
        # snn.py:272-278 -- all successive |diffs| of the last `patience`
        # val losses < tol, INCLUDING the underfull-window behavior where
        # fewer than 2 recorded losses yield an empty diff and np.all([])
        # == True) runs ON DEVICE inside the scan.  Once stopped, the
        # remaining epochs of the block take a lax.cond skip branch
        # (params/opt frozen, ~zero compute) and are flagged so the host
        # writes neither history nor checkpoint files for them.  This
        # lifts the round-3 restriction that early stopping forced the
        # per-epoch fit path (one dispatch + ~2 host syncs per epoch).
        #
        # `win` is the rolling (patience,) window of the last val losses
        # (host-initialized from the existing history, so resume
        # semantics match); `nv` counts how many slots are real.
        # patience is encoded in win's SHAPE, so a different
        # early_stopping_patience just compiles a new program.
        def train_block_es_fn(params, opt_state, win, nv, x_tr, y_tr,
                              ti, tw, x_va, y_va, vi, vw):
            patience = win.shape[0]
            tol = ES_TOL  # _check_early_stopping's tol (snn.py:272)

            def epoch_body(carry, xs):
                p, o, win, nv, stopped = carry
                eti, etw, evi, evw = xs

                def run(operand):
                    p, o = operand
                    p2, o2, tr_losses = train_epoch_fn(
                        p, o, x_tr, y_tr, eti, etw
                    )
                    va_losses, corr, tot = eval_epoch_fn(
                        p2, x_va, y_va, evi, evw
                    )
                    return (p2, o2, jnp.mean(tr_losses),
                            jnp.mean(va_losses), corr, tot)

                def skip(operand):
                    p, o = operand
                    zero = jnp.zeros((), jnp.float32)
                    return p, o, zero, zero, zero, zero

                p, o, trm, vam, corr, tot = jax.lax.cond(
                    stopped, skip, run, (p, o)
                )
                ran = jnp.logical_not(stopped)
                win = jnp.where(
                    stopped, win, jnp.concatenate([win[1:], vam[None]])
                )
                nv = jnp.where(stopped, nv,
                               jnp.minimum(nv + 1, patience))
                # Pair (i, i+1) of the window is real iff slot i is real
                # (slots >= patience - nv hold recorded losses); an
                # underfull window has no real pairs -> all([]) == True.
                pair_real = jnp.arange(patience - 1) >= (patience - nv)
                plateau = jnp.all(
                    (jnp.abs(jnp.diff(win)) < tol) | ~pair_real
                )
                stopped = stopped | (ran & plateau)
                snap = _pack_leaves(
                    [l for l in jax.tree_util.tree_leaves((p, o)) if l.size]
                )
                return (p, o, win, nv, stopped), (
                    trm, vam, corr, tot, ran.astype(jnp.float32),
                    stopped.astype(jnp.float32), snap,
                )

            (params, opt_state, *_), outs = jax.lax.scan(
                epoch_body,
                (params, opt_state, win, nv, jnp.asarray(False)),
                (ti, tw, vi, vw),
            )
            return params, opt_state, host_repl(outs)

        if self.mesh is None or self._tp or self._pp:
            # TP/PP: params keep their strategy's param-spec shardings
            # through the scan (the shard_mapped step pins them); the
            # replicated dataset + index matrices need no annotation.
            train_epoch = jax.jit(train_epoch_fn, donate_argnums=(0, 1))
            eval_epoch = jax.jit(eval_epoch_fn)
            train_block = jax.jit(train_block_fn, donate_argnums=(0, 1))
            train_block_es = jax.jit(train_block_es_fn, donate_argnums=(0, 1))
        else:
            repl = replicated(self.mesh)
            train_epoch = jax.jit(
                train_epoch_fn,
                in_shardings=(repl,) * 6,
                out_shardings=(repl, repl, repl),
                donate_argnums=(0, 1),
            )
            eval_epoch = jax.jit(
                eval_epoch_fn,
                in_shardings=(repl,) * 5,
                out_shardings=(repl, repl, repl),
            )
            train_block = jax.jit(
                train_block_fn,
                in_shardings=(repl,) * 10,
                out_shardings=(repl, repl, repl),
                donate_argnums=(0, 1),
            )
            train_block_es = jax.jit(
                train_block_es_fn,
                in_shardings=(repl,) * 12,
                out_shardings=(repl, repl, repl),
                donate_argnums=(0, 1),
            )
        return (train_step, eval_step, train_epoch, eval_epoch, train_block,
                train_block_es)

    def _prep_batch(self, x: np.ndarray, y: np.ndarray, target: int = 0):
        """Pad to ``target`` rows (the loader's nominal batch size) and to
        the mesh size, then shard.  Weight-0 padding keeps losses/metrics
        exact while giving every batch of an epoch one compiled shape --
        remainder batches would otherwise recompile the T-step kernels
        (minutes on relay-attached TPUs)."""
        x, y = np.asarray(x), np.asarray(y)
        n = x.shape[0]
        w = np.ones((n,), np.float32)
        if target > n:
            pad = target - n
            x = np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
            y = np.pad(y, (0, pad))
            w = np.pad(w, (0, pad))
        if self.mesh is None:
            return x, y, w
        from ..parallel.mesh import pad_to_multiple, shard_batch

        mult = self._batch_multiple()
        x, w2 = pad_to_multiple(x, mult)
        y, _ = pad_to_multiple(y, mult)
        w = np.pad(w, (0, w2.shape[0] - w.shape[0]))
        return shard_batch(self.mesh, x, y, w)

    def _batch_multiple(self) -> int:
        """Rows per batch must split evenly over the mesh -- and under PP
        additionally into ``n_micro`` microbatches per data shard."""
        if self.mesh is None:
            return 1
        if self._pp:
            n_data = self.mesh.shape["data"]
            nm = self._pp_n_micro or 2 * self.mesh.shape["pipe"]
            return int(np.lcm(self.mesh.size, n_data * nm))
        return self.mesh.size

    def _steps_for(self, enc: EncodeConfig):
        # Keyed by the optimizer hyperparameters (which uniquely determine
        # the transform), not id(self._tx): a rebuilt tx could reuse a
        # garbage-collected object's id and hit a stale closure.
        key = (enc, self._opt_hparams)
        if key not in self._step_cache:
            self._step_cache[key] = self._build_steps(enc, self._tx)
        return self._step_cache[key]

    def _ensure_optimizer(self, lr: float, weight_decay: float,
                          max_grad_norm: Optional[float] = None,
                          grad_accum: Optional[int] = None):
        """Build (or rebuild) the optimizer for these hyperparameters.

        A changed (lr, weight_decay) rebuilds the transform but keeps the
        existing ``opt_state`` (Adam state is structurally identical across
        hyperparameters) -- so ``fit(lr=...)`` always honors its arguments,
        including after an eval/checkpoint call created the optimizer with
        defaults, and a second fit can change the learning rate.
        """
        if self._tx is not None and self._opt_hparams == (
            lr, weight_decay, max_grad_norm, grad_accum,
        ):
            return
        prev_accum = (
            self._opt_hparams[3] if self._opt_hparams is not None else None
        )
        if self._pp:
            from ..parallel.pp import pp_param_labels

            labels = pp_param_labels(self.params)
        else:
            labels = model_lib.param_labels(self.cfg, self.params)
        self._tx = make_optimizer(
            labels, lr=lr, weight_decay=weight_decay,
            max_grad_norm=max_grad_norm, grad_accum=grad_accum,
        )
        self._opt_hparams = (lr, weight_decay, max_grad_norm, grad_accum)
        if self.opt_state is not None and prev_accum != grad_accum:
            # K -> K' between two accumulating fits keeps an identical
            # MultiStepsState STRUCTURE, so the structural check below
            # would silently carry a half-filled accumulator/counter from
            # the old K into the new schedule.  Any change of grad_accum
            # resets the optimizer state (as the fit docstring promises).
            logger.warning(
                "grad_accum changed (%s -> %s); resetting optimizer state.",
                prev_accum, grad_accum,
            )
            self.opt_state = None
        if self.opt_state is not None:
            # Toggling clipping/accumulation changes the chain-state
            # structure; Adam moments can't carry over in that case.
            fresh = jax.eval_shape(self._tx.init, self.params)
            if (jax.tree_util.tree_structure(self.opt_state)
                    != jax.tree_util.tree_structure(fresh)):
                logger.warning(
                    "Optimizer structure changed (max_grad_norm or "
                    "grad_accum toggled); resetting optimizer state."
                )
                self.opt_state = None
        if self.opt_state is None:
            self.opt_state = self._tx.init(self.params)

    def _ensure_optimizer_any(self):
        """Eval/checkpoint paths just need *an* optimizer (for the step
        cache and opt_state templates); never override fit's choice."""
        if self._tx is None:
            self._ensure_optimizer(1e-3, 1e-5)

    # -- fit -------------------------------------------------------------------
    def fit(
        self,
        train_dataloader: ArrayDataLoader,
        val_dataloader: ArrayDataLoader,
        lr: float = 1e-3,
        nb_epochs: int = 15,
        weight_decay: float = 1e-5,
        max_grad_norm: Optional[float] = None,
        load_checkpoint_mode: Optional[LoadCheckpointMode] = None,
        force_overwrite: bool = False,
        early_stopping: bool = False,
        early_stopping_patience: int = 5,
        verbose: bool = True,
        p_bar_position: Optional[int] = None,
        p_bar_leave: Optional[bool] = None,
        epoch_block: Optional[int] = None,
        checkpoint_every: int = 1,
        grad_accum: Optional[int] = None,
    ) -> LossHistory:
        """Train with per-epoch train+val phases, best-val checkpointing,
        optional plateau early stopping (snn.py:280-350).

        Resume semantics match the callers' contract (quirk Q5): with
        ``load_checkpoint_mode=None`` an existing checkpoint folder
        requires ``force_overwrite=True`` (then it is wiped,
        snn.py:302-307); with a mode, a missing checkpoint downgrades to a
        warning and training starts fresh (snn.py:308-317).

        ``epoch_block``: run K train+val epochs per device dispatch (the
        relay-latency amortization on top of the whole-epoch scan; see
        ``_build_steps``).  ``None`` auto-picks 8 when the dataset is
        device-resident; pass 1 to force the per-epoch path.  Identical
        math, batch order, loss history, and per-epoch checkpoint files.
        Early stopping composes with the block: the plateau decision
        (quirk Q6, incl. the underfull-window stop) is computed ON DEVICE
        inside the block scan and post-stop epochs take a frozen skip
        branch, so the stop epoch, history, and checkpoint files are
        identical to the per-epoch path (tests/test_epoch_block.py).

        ``checkpoint_every``: write checkpoint files only for every Nth
        epoch, the final epoch, and the global-best epoch (whose packed
        snapshot is tracked as a device slice and fetched ONCE at fit
        end).  The default 1 is the reference's every-epoch contract
        (snn.py:335-338).  On relay-attached TPUs the per-epoch packed
        (params, opt_state) snapshot TRANSFER dominates the whole fit:
        interleaved A/B on the flagship (T=100, batch 8192, epoch_block=8)
        measures ~520-740k img/s steady-state with every-epoch files vs
        ~920-975k with checkpoint_every=8 -- essentially the 917k
        no-checkpoint ceiling.  Training math, loss history, and
        best-epoch selection are unchanged; only which per-epoch files
        exist differs (resume from LAST_EPOCH restarts from the newest
        file on disk, with the reconstructed loss history covering only
        saved epochs; the global-best file appears at fit end).

        ``grad_accum``: average gradients over K consecutive batches and
        apply ONE Adam update (optax.MultiSteps; beyond-reference
        production knob).  With uniform sample weights and equal batch
        sizes this reproduces a K-times-larger batch exactly at 1/K the
        activation memory; default ``None`` is the reference's
        every-batch update.  Changing it across fits resets the
        optimizer state (the accumulator changes the opt_state
        structure).
        """
        self._ensure_optimizer(lr, weight_decay, max_grad_norm, grad_accum)
        every = max(int(checkpoint_every), 1)
        if self._multiproc:
            # Progress display and file writes belong to process 0; the
            # others run the same device program silently.
            from ..parallel.multihost import barrier, is_main

            verbose = verbose and is_main()

        start_epoch = 0
        if load_checkpoint_mode is None:
            meta_exists = os.path.exists(self.ckpt.checkpoints_meta_path)
            if self._multiproc:
                # Rank 0's view of the filesystem decides for everyone --
                # per-rank re-derivation races against rank 0's delete
                # below and can diverge the branch (deadlock: one rank in
                # the barrier, another already dispatching collectives).
                from ..parallel.multihost import broadcast_flag

                meta_exists = broadcast_flag(meta_exists)
            if meta_exists and not force_overwrite:
                raise AssertionError(
                    f"{self.ckpt.checkpoints_meta_path} already exists. "
                    "Set force_overwrite flag to True to overwrite existing saves."
                )
            if meta_exists and force_overwrite:
                if not self._multiproc or is_main():
                    shutil.rmtree(self.ckpt.checkpoint_folder)
                if self._multiproc:
                    # Nobody may start writing epoch files into the folder
                    # process 0 is still deleting.  Every rank enters this
                    # branch (meta_exists is rank-0-broadcast), so the
                    # barrier is collective-safe.
                    barrier("fit-overwrite")
        else:
            self._join_pending_save()
            self._barrier_before_load()
            try:
                checkpoint = self.ckpt.load_checkpoint(load_checkpoint_mode)
                self._restore_placed(checkpoint)
                start_epoch = int(checkpoint[self.ckpt.CHECKPOINT_EPOCH_KEY]) + 1
                self.loss_history = self.ckpt.get_checkpoints_loss_history()
            except FileNotFoundError:
                if verbose:
                    logger.warning("No such checkpoint. Fit from beginning.")

        if start_epoch >= nb_epochs:
            return self.loss_history

        block = 8 if epoch_block is None else int(epoch_block)
        if (
            block > 1
            and self._epoch_eligible(train_dataloader)
            and self._epoch_eligible(val_dataloader)
            # The block program bakes ONE encode config for both phases;
            # the per-epoch path honors each loader's own (see
            # train_epochs), so mixed-config fits must use it.
            and train_dataloader.encode_config == val_dataloader.encode_config
        ):
            # Early stopping runs blocked too: the plateau flag is
            # computed on device inside the block scan (train_block_es in
            # _build_steps) and post-stop epochs take a frozen skip
            # branch -- identical stop epoch and history to the per-epoch
            # path at blocked-fit throughput.
            return self._fit_blocked(
                train_dataloader, val_dataloader, start_epoch, nb_epochs,
                block, verbose, p_bar_position, p_bar_leave, every,
                early_stopping=early_stopping,
                patience=early_stopping_patience,
            )

        best_loss = self.loss_history.min("val")
        epochs_iter = range(start_epoch, nb_epochs)
        if verbose:
            from tqdm.auto import tqdm

            epochs_iter = tqdm(
                epochs_iter,
                desc="Training",
                position=p_bar_position,
                unit="epoch",
                leave=p_bar_leave,
            )
        # every > 1: the best epoch's state is tracked as ONE on-device
        # copy and written once after the loop -- a converging run improves
        # nearly every epoch, so eager best saves would re-create the
        # per-epoch transfer bottleneck the knob removes (this covers the
        # early-stopping / streaming configs the blocked path can't take).
        best_dev = None  # (params, opt_state, epoch, epoch_loss)
        for epoch in epochs_iter:
            epoch_loss, epoch_val_acc = self._exec_phase(
                train_dataloader, val_dataloader
            )
            self.loss_history.concat(epoch_loss)
            is_best = epoch_loss["val"] < best_loss
            selected = checkpoint_selected(epoch, nb_epochs, every)
            if (is_best and every == 1) or selected:
                self._save_checkpoint(epoch, epoch_loss, is_best)
            elif is_best:
                best_dev = (
                    jax.tree.map(jnp.copy, (self.params, self.opt_state)),
                    epoch, epoch_loss,
                )
            if is_best and selected:
                best_dev = None  # this best is already on disk, flagged
            if is_best:
                best_loss = epoch_loss["val"]
            if verbose:
                epochs_iter.set_postfix(
                    train_loss=f"{epoch_loss['train']:.5e}",
                    val_loss=f"{epoch_loss['val']:.5e}",
                    val_acc=f"{epoch_val_acc:.5f}",
                )
            if early_stopping and self._check_early_stopping(early_stopping_patience):
                if verbose:
                    logger.info(f"Early stopping stopped the training at epoch {epoch}.")
                break
        if verbose:
            epochs_iter.close()
        self._join_pending_save()
        if best_dev is not None:
            (params_b, opt_b), ep_b, el_b = (
                best_dev[0], best_dev[1], best_dev[2],
            )
            params_h, opt_h = host_snapshot((params_b, opt_b), self.mesh)
            self.ckpt.save_checkpoint(
                self._canonical_params(params_h), opt_h, ep_b, el_b, True
            )
        self.plot_loss_history(show=False)
        return self.loss_history

    def _es_window(self, patience: int):
        """Device init of the early-stopping window: the last ``patience``
        recorded val losses (resume-aware) + how many are real."""
        tail = [float(v) for v in self.loss_history["val"][-patience:]]
        win = np.zeros(patience, np.float32)
        if tail:
            win[-len(tail):] = tail
        return jnp.asarray(win), jnp.asarray(len(tail), jnp.int32)

    def _fit_blocked(self, train_loader, val_loader, start_epoch, nb_epochs,
                     block, verbose, p_bar_position, p_bar_leave, every=1,
                     early_stopping=False, patience=5):
        """K-epochs-per-dispatch fit loop (see ``fit(epoch_block=...)``).

        Per block: ONE device dispatch (train+val scans for K epochs with a
        per-epoch packed snapshot), ONE stats fetch, and ONE packed
        (K, nbytes) snapshot fetch in the async checkpoint thread that
        writes the K per-epoch checkpoint files.  The index matrices come
        from the same ``iter_indices()`` rng sequence as the per-epoch
        path, so shuffles, batch order, and therefore the entire training
        trajectory are identical.  A remainder block (nb_epochs % block)
        compiles a second program; the persistent compilation cache makes
        that a one-time cost per shape.

        ``early_stopping``: the plateau flag is evaluated on device after
        every scanned epoch (train_block_es in ``_build_steps``); epochs
        after the stop take a frozen skip branch and are excluded from
        history/checkpoints, so stop epoch and history are identical to
        the per-epoch path.
        """
        best_loss = self.loss_history.min("val")
        steps = self._steps_for(train_loader.encode_config)
        train_block, train_block_es = steps[4], steps[5]
        # checkpoint_every > 1: the global-best epoch's packed snapshot is
        # tracked as a DEVICE slice of the block's snaps stack (free) and
        # fetched exactly once at fit end -- best-so-far epochs improve
        # nearly every epoch in a converging run, so fetching them per
        # block would re-create the every-epoch transfer bottleneck the
        # knob exists to remove (see fit(checkpoint_every=...)).
        best_snap_dev = None
        best_snap_meta = None  # (epoch, ep_loss)
        pbar = None
        if verbose:
            from tqdm.auto import tqdm

            pbar = tqdm(
                total=nb_epochs - start_epoch, desc="Training",
                position=p_bar_position, unit="epoch", leave=p_bar_leave,
            )
        x_tr, y_tr = self.device_data.arrays(train_loader, self.mesh)
        x_va, y_va = self.device_data.arrays(val_loader, self.mesh)
        epoch = start_epoch
        stop_epoch = None
        while epoch < nb_epochs:
            k = min(block, nb_epochs - epoch)
            ti, tw = zip(*(self._epoch_index_matrix(train_loader)
                           for _ in range(k)))
            vi, vw = zip(*(self._epoch_index_matrix(val_loader)
                           for _ in range(k)))
            data_args = (
                x_tr, y_tr, jnp.asarray(np.stack(ti)),
                jnp.asarray(np.stack(tw)),
                x_va, y_va, jnp.asarray(np.stack(vi)),
                jnp.asarray(np.stack(vw)),
            )
            if early_stopping:
                win, nv = self._es_window(patience)
                self.params, self.opt_state, outs = train_block_es(
                    self.params, self.opt_state, win, nv, *data_args
                )
                trm, vam, corr, tot, ran_f, stop_f, snaps = outs
                stats = np.asarray(
                    jnp.stack([trm, vam, corr, tot, ran_f, stop_f])
                )
                # Epochs after the on-device stop took the skip branch:
                # no history entries, no checkpoint files (identical to
                # the per-epoch path's break).
                k_eff = int(np.sum(stats[4, :k] > 0.5))
                if k_eff and stats[5, k_eff - 1] > 0.5:
                    stop_epoch = epoch + k_eff - 1
            else:
                self.params, self.opt_state, outs = train_block(
                    self.params, self.opt_state, *data_args
                )
                trm, vam, corr, tot, snaps = outs
                # ONE host sync for the whole block's scalar stats.
                stats = np.asarray(jnp.stack([trm, vam, corr, tot]))
                k_eff = k
            prev_best = best_loss
            ep_losses, flags = [], []
            for i in range(k_eff):
                el = dict(train=float(stats[0, i]), val=float(stats[1, i]))
                self.loss_history.concat(el)
                is_best = el["val"] < best_loss
                if is_best:
                    best_loss = el["val"]
                ep_losses.append(el)
                flags.append(is_best)
                if pbar is not None:
                    pbar.update(1)
                    pbar.set_postfix(
                        train_loss=f"{el['train']:.5e}",
                        val_loss=f"{el['val']:.5e}",
                        val_acc=(
                            f"{stats[2, i] / max(stats[3, i], 1.0):.5f}"
                        ),
                    )
            if every == 1:
                self._save_checkpoint_block(
                    range(epoch, epoch + k_eff), ep_losses, flags, snaps,
                    sel=list(range(k_eff)) if k_eff < k else None,
                )
            else:
                sel = [
                    i for i in range(k_eff)
                    if checkpoint_selected(epoch + i, nb_epochs, every)
                ]
                self._save_checkpoint_block(
                    [epoch + i for i in sel],
                    [ep_losses[i] for i in sel],
                    [False] * len(sel),
                    snaps,
                    sel=sel,
                )
                if k_eff:
                    block_best = float(np.min(stats[1, :k_eff]))
                    if block_best < prev_best:
                        i_best = int(np.argmin(stats[1, :k_eff]))
                        best_snap_dev = snaps[i_best]  # device slice
                        best_snap_meta = (epoch + i_best, ep_losses[i_best])
            epoch += k
            if stop_epoch is not None:
                if verbose:
                    logger.info(
                        f"Early stopping stopped the training at epoch "
                        f"{stop_epoch}."
                    )
                break
        if pbar is not None:
            pbar.close()
        self._join_pending_save()
        if best_snap_dev is not None:
            # The deferred global-best file: ONE snapshot fetch per fit.
            flat = np.asarray(best_snap_dev)
            params_b, opt_b = _unpack_flat(flat, (self.params, self.opt_state))
            self.ckpt.save_checkpoint(
                self._canonical_params(params_b), opt_b,
                best_snap_meta[0], best_snap_meta[1], True,
            )
        self.plot_loss_history(show=False)
        return self.loss_history

    def _save_checkpoint_block(self, epochs, ep_losses, flags, snaps_dev,
                               sel=None):
        """Write one block's per-epoch checkpoint files from the stacked
        packed snapshots: one host fetch, then one file write per entry --
        same files as individual calls to ``_save_checkpoint``.

        ``sel``: optional row indices into ``snaps_dev`` matching
        ``epochs`` (``fit(checkpoint_every=N)``): the rows are gathered on
        device so only the selected epochs' bytes cross the relay -- the
        snapshot transfer is the measured fit bottleneck (see
        ``fit(checkpoint_every=...)``)."""
        self._join_pending_save()
        if sel is not None:
            snaps_dev = (
                snaps_dev[jnp.asarray(np.asarray(sel, np.int32))]
                if len(sel)
                else None
            )
            if snaps_dev is None:
                return
        # Template: packable leaves are used for shape/dtype metadata only
        # (safe even after the next block donates the buffers); any
        # non-packable leaf is materialized NOW, before donation.
        template = jax.tree_util.tree_map(
            lambda l: l if _is_packable(l) or not isinstance(l, jax.Array)
            else np.asarray(l),
            (self.params, self.opt_state),
        )

        def save():
            flat = np.asarray(snaps_dev)  # the single transfer
            for i, (ep, el, isb) in enumerate(zip(epochs, ep_losses, flags)):
                params, opt_state = _unpack_flat(flat[i], template)
                self.ckpt.save_checkpoint(
                    self._canonical_params(params), opt_state, ep, el, isb
                )

        if not self.async_checkpointing:
            save()
            return
        import threading

        self._ckpt_thread = threading.Thread(target=save, daemon=True)
        self._ckpt_thread.start()

    def _check_early_stopping(self, patience: int, tol: float = ES_TOL) -> bool:
        """Plateau detector: all successive |diffs| of the last ``patience``
        val losses below tol (snn.py:272-278, quirk Q6)."""
        losses = self.loss_history["val"][-patience:]
        return bool(np.all(np.abs(np.diff(losses)) < tol))

    def _prefetched(self, loader):
        """Device (x, y, w) batches for one epoch.

        Small datasets live in HBM (replicated over the mesh, if any) and
        are gathered on device by index; otherwise batches stream from
        host with background prefetching.
        """
        if self.device_data.fits(loader):
            return self.device_data.batches(loader, self.mesh)

        from ..data.prefetch import prefetch_to_device

        return prefetch_to_device(
            iter(loader), size=2,
            transfer=lambda b: jax.tree.map(
                jax.device_put, self._prep_batch(*b, target=loader.batch_size)
            ),
        )

    def _epoch_index_matrix(self, loader):
        """(n_batches, batch_size) index + weight matrices for one epoch
        (shuffled when the loader shuffles; weight-0 padding rows; batch
        rows additionally padded to a multiple of the mesh size)."""
        from ..data.device_cache import pad_rows

        target = loader.batch_size
        if self.mesh is not None:
            mult = self._batch_multiple()
            target = -(-target // mult) * mult
        idxs, ws = [], []
        for idx in loader.iter_indices():
            p, w = pad_rows(np.asarray(idx), target)
            idxs.append(p)
            ws.append(w)
        return (
            np.stack(idxs).astype(np.int32),
            np.stack(ws).astype(np.float32),
        )

    def _epoch_eligible(self, loader) -> bool:
        return self.device_data.fits(loader)

    def _exec_phase(self, train_loader, val_loader):
        """One train epoch + one val epoch (snn.py:352-365).

        Returns ``(epoch_loss_dict, val_accuracy)``.  The reference runs a
        *second* full val forward pass per epoch just to report accuracy
        (snn.py:332-333); here the single val sweep produces loss and
        accuracy together from ``eval_step``'s ``(loss, preds)`` -- same
        numbers, half the val compute.

        Single-device with a device-resident dataset, both phases run as
        whole-epoch scans: two dispatches + one host sync per epoch
        instead of ~5 relay round trips per batch (identical math and
        batch order -- the same iter_indices() shuffle drives both paths).
        """
        if self._epoch_eligible(train_loader) and self._epoch_eligible(val_loader):
            train_epoch = self._steps_for(train_loader.encode_config)[2]
            eval_epoch = self._steps_for(val_loader.encode_config)[3]
            x_tr, y_tr = self.device_data.arrays(train_loader, self.mesh)
            ti, tw = self._epoch_index_matrix(train_loader)
            self.params, self.opt_state, train_losses = train_epoch(
                self.params, self.opt_state, x_tr, y_tr,
                jnp.asarray(ti), jnp.asarray(tw),
            )
            x_va, y_va = self.device_data.arrays(val_loader, self.mesh)
            vi, vw = self._epoch_index_matrix(val_loader)
            val_losses, v_corr, v_tot = eval_epoch(
                self.params, x_va, y_va, jnp.asarray(vi), jnp.asarray(vw)
            )
            stats = np.asarray(jnp.stack([  # ONE host sync per epoch
                jnp.mean(train_losses), jnp.mean(val_losses), v_corr, v_tot
            ]))
            epoch_loss = dict(train=float(stats[0]), val=float(stats[1]))
            return epoch_loss, float(stats[2]) / max(float(stats[3]), 1.0)
        train_step, eval_step = self._steps_for(train_loader.encode_config)[:2]
        train_losses = []
        for xb, yb, wb in self._prefetched(train_loader):
            self.params, self.opt_state, loss = train_step(
                self.params, self.opt_state, xb, yb, wb
            )
            train_losses.append(loss)
        val_step = self._steps_for(val_loader.encode_config)[1]
        val_losses, val_correct, val_count = [], [], []
        for xb, yb, wb in self._prefetched(val_loader):
            loss, preds = val_step(self.params, xb, yb, wb)
            val_losses.append(loss)
            val_correct.append(jnp.sum((preds == yb) * wb))
            val_count.append(jnp.sum(wb))
        # Single host sync per epoch: stack on device, fetch once (serial
        # per-scalar fetches pay the transfer latency per batch).
        epoch_loss = dict(
            train=float(np.mean(np.asarray(jnp.stack(train_losses)))),
            val=float(np.mean(np.asarray(jnp.stack(val_losses)))),
        )
        n_correct = int(np.sum(np.asarray(jnp.stack(val_correct))))
        n_total = int(np.sum(np.asarray(jnp.stack(val_count))))
        return epoch_loss, n_correct / max(n_total, 1)

    # -- prediction / evaluation ------------------------------------------------
    def predict_logits(self, x, encode_config: Optional[EncodeConfig] = None):
        enc = encode_config or EncodeConfig(n_steps=self.cfg.int_time_steps)
        inputs = _encode_on_device(jnp.asarray(x, jnp.float32), enc)
        if self._tp or self._pp:
            if self._shard_forward is None:
                if self._pp3:
                    from ..parallel.pp3 import make_pp3_forward

                    self._shard_forward = make_pp3_forward(
                        self.cfg, self.mesh, n_micro=self._pp_n_micro
                    )
                elif self._tp:
                    from ..parallel.tp import make_tp_forward

                    self._shard_forward = make_tp_forward(self.cfg, self.mesh)
                else:
                    from ..parallel.pp import make_pp_forward

                    self._shard_forward = make_pp_forward(
                        self.cfg, self.mesh, n_micro=self._pp_n_micro
                    )
            # shard_map splits the batch over "data" (and PP further into
            # microbatches): pad to divisibility, slice the padding off.
            n = inputs.shape[0]
            pad = (-n) % self._batch_multiple()
            if pad:
                inputs = jnp.pad(
                    inputs, [(0, pad)] + [(0, 0)] * (inputs.ndim - 1)
                )
            return self._shard_forward(self.params, inputs)[:n]
        return model_lib.forward_logits(self.cfg, self.params, inputs)

    def compute_classification_accuracy(
        self,
        dataloader: ArrayDataLoader,
        verbose: bool = False,
        desc: Optional[str] = None,
    ) -> float:
        """Per-sample mean accuracy over a loader (snn.py:507-525)."""
        self._ensure_optimizer_any()
        if not verbose and self._epoch_eligible(dataloader):
            eval_epoch = self._steps_for(dataloader.encode_config)[3]
            x_all, y_all = self.device_data.arrays(dataloader, self.mesh)
            mi, mw = self._epoch_index_matrix(dataloader)
            _, corr, tot = eval_epoch(
                self.params, x_all, y_all, jnp.asarray(mi), jnp.asarray(mw)
            )
            # corr/tot are f32 weight sums; round (not truncate) so the
            # counts stay exact past f32's 2^24 integer range.
            return round(float(corr)) / max(round(float(tot)), 1)
        eval_step = self._steps_for(dataloader.encode_config)[1]
        # Accumulate correct/total on device; ONE host sync at the end
        # instead of two ~30 ms relay round trips per batch.
        correct, total = [], []
        batches = self._prefetched(dataloader)
        if verbose:
            from tqdm.auto import tqdm

            batches = tqdm(batches, total=len(dataloader), desc=desc)
        for xb, yb, wb in batches:
            _, preds = eval_step(self.params, xb, yb, wb)
            correct.append(jnp.sum((preds == yb) * wb))
            total.append(jnp.sum(wb))
        if not correct:
            return 0.0
        stats = np.asarray(jnp.stack([jnp.sum(jnp.stack(correct)),
                                      jnp.sum(jnp.stack(total))]))
        return round(float(stats[0])) / max(round(float(stats[1])), 1)

    def compute_confusion_matrix(
        self,
        nb_classes: int,
        dataloaders: Dict[str, ArrayDataLoader],
        fit: bool = False,
        fit_kwargs: Optional[dict] = None,
        load_checkpoint_mode: Optional[LoadCheckpointMode] = None,
    ) -> Dict[str, np.ndarray]:
        """Per-split confusion matrices (snn.py:527-555)."""
        if fit:
            self.fit(dataloaders["train"], dataloaders["val"], **(fit_kwargs or {}))
        if load_checkpoint_mode is not None:
            self.load_checkpoint(load_checkpoint_mode)
        return {
            key: self._compute_single_confusion_matrix(nb_classes, d)
            for key, d in dataloaders.items()
        }

    def _compute_single_confusion_matrix(
        self, nb_classes: int, dataloader: ArrayDataLoader
    ) -> np.ndarray:
        self._ensure_optimizer_any()
        eval_step = self._steps_for(dataloader.encode_config)[1]
        cm = np.zeros((nb_classes, nb_classes))
        # Scatter into the (C, C) matrix ON DEVICE per batch and fetch the
        # finished matrix once -- per-batch pred fetches pay a ~30 ms
        # relay round trip each.
        cm_dev = jnp.zeros((nb_classes, nb_classes), jnp.float32)
        scatter = jax.jit(
            lambda cm_d, y, p, w: cm_d.at[y, p].add(w)
        )
        ran = False
        for xb, yb, wb in self._prefetched(dataloader):
            _, preds = eval_step(self.params, xb, yb, wb)
            # weight-0 padding rows scatter with weight 0: exact.
            cm_dev = scatter(cm_dev, yb, preds, wb)
            ran = True
        if ran:
            cm += np.asarray(cm_dev).round()
        return cm

    # -- checkpointing ------------------------------------------------------------
    def load_checkpoint(
        self, load_checkpoint_mode: LoadCheckpointMode = LoadCheckpointMode.BEST_EPOCH
    ) -> dict:
        """Load and install a checkpoint (snn.py:474-483)."""
        self._join_pending_save()
        self._barrier_before_load()
        self._ensure_optimizer_any()
        checkpoint = self.ckpt.load_checkpoint(load_checkpoint_mode)
        self._restore_placed(checkpoint)
        return checkpoint

    def plot_loss_history(self, loss_history: Optional[LossHistory] = None, show=False):
        """Save the loss plot into the checkpoint folder (snn.py:417-422)."""
        history = loss_history or self.loss_history
        if not len(history):
            return
        from .checkpoint import _is_writer

        if not _is_writer():  # multi-host: PNG belongs to process 0
            return
        os.makedirs(self.ckpt.checkpoint_folder, exist_ok=True)
        try:
            history.plot(
                f"{self.ckpt.checkpoint_folder}/loss_history.png", show
            )
        except ImportError:  # matplotlib not installed: plotting is optional
            logger.warning("matplotlib unavailable; skipping loss plot")
