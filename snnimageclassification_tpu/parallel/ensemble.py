"""Multi-seed ensemble training: vmapped independent replicas.

The reference's sweep trains seeds/configs strictly sequentially
(training.py:151-201).  On TPU, independent *seeds* of the same
architecture are a vmap axis: one jitted step trains every replica
simultaneously, sharing the batch's encode work and filling the MXU with
stacked matmuls.  No gradient communication exists between replicas --
this is embarrassingly parallel, and it composes with the data mesh
(params replicated, batch sharded) for the BASELINE "multi-seed sweep,
batch 4096 over the mesh" configuration.
"""
from __future__ import annotations

import logging
import os
import shutil
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.datasets import ArrayDataLoader, EncodeConfig
from ..models import snn as model_lib
from ..models.config import SNNConfig
from ..train.checkpoint import CheckpointManager, LoadCheckpointMode
from ..train.trainer import _encode_on_device, make_optimizer, nll_loss
from ..utils.history import LossHistory

__all__ = ["init_ensemble", "majority_vote", "EnsembleTrainer"]

logger = logging.getLogger(__name__)


def init_ensemble(cfg: SNNConfig, seeds: Sequence[int]):
    """Stacked params: every leaf gains a leading ``n_seeds`` axis."""
    keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
    return jax.vmap(lambda k: model_lib.init(cfg, k))(keys)


def majority_vote(seed_preds: np.ndarray, n_classes: int) -> np.ndarray:
    """Hard majority vote over the seed axis: ``(n_seeds, B) -> (B,)``.
    Ties resolve to the lowest label (``np.bincount(...).argmax()``),
    deterministically."""
    seed_preds = np.asarray(seed_preds)
    return np.array([
        np.bincount(col, minlength=n_classes).argmax()
        for col in seed_preds.T
    ])


class EnsembleSteps(NamedTuple):
    """Compiled programs for one encode config (``_build``'s product)."""

    train: callable        # per-batch train step
    evals: callable        # per-batch eval step
    train_epoch: callable  # whole-epoch train scan
    eval_epoch: callable   # whole-epoch eval scan
    train_block: callable  # K-epoch block scan (fit(epoch_block=K))
    predict: callable      # per-seed logits (S, B, O) from pixels
    train_block_es: callable  # K-epoch block with on-device early stopping


class EnsembleTrainer:
    """Trains N independent replicas per step via vmap.

    All replicas consume the same batches (difference between replicas is
    the init seed, matching what N sequential reference runs with
    different seeds would see modulo data order).
    """

    def __init__(
        self,
        cfg: SNNConfig,
        seeds: Sequence[int],
        lr: float = 1e-3,
        weight_decay: float = 1e-5,
        max_grad_norm=None,
        mesh=None,
        checkpoint_folder: Optional[str] = None,
        model_name: str = "snn_ensemble",
        fused_replicas=None,
        shard_seeds: bool = False,
        grad_accum: Optional[int] = None,
    ):
        """``shard_seeds``: ensemble parallelism -- partition the *seed*
        axis over the mesh devices instead of the batch axis.  Replicas
        are independent, so each device trains ``n_seeds / n_devices``
        replicas on the full batch with ZERO collectives (no gradient
        all-reduce, unlike the batch-sharded mode); the step is a
        ``shard_map`` whose body is the same fused/vmapped replica code,
        so on a real slice each chip runs its local replicas through the
        fused Pallas kernels at full single-model efficiency.  Requires
        ``mesh`` and ``len(seeds) %% mesh.size == 0``.

        ``fused_replicas``: route the replicas through the fused
        whole-network Pallas kernels instead of vmapping the XLA path
        over a replica axis (vmapping pallas_call itself serializes ~15x
        slower than XLA -- measured, so it is never used).  Values:

        * ``None`` (default): auto -- fused kernels on TPU when the
          config head-fuses, vmapped XLA otherwise.
        * ``True`` / ``"unrolled"``: S unrolled fused-kernel calls inside
          ONE jitted step; each call runs at full single-model kernel
          efficiency and the (T, B, F) spike tensor never exists in HBM.
        * ``"stacked"``: ONE kernel pair for all replicas via the
          stacked-replica grid (ops/pallas_fused.py /
          pallas_fused_izh.py) -- smallest XLA graph; measured a few
          percent slower steady-state than unrolled (extra weight-block
          DMA turnover), so unrolled stays the default.
        * ``False``: force the vmapped XLA path.

        ``grad_accum``: average grads over K consecutive batches per
        replica and apply one Adam update (same contract as
        ``Trainer.fit(grad_accum=...)``; the MultiSteps accumulator is
        vmapped over the seed axis like the rest of the opt state)."""
        self.cfg = cfg
        self.seeds = tuple(seeds)
        self.mesh = mesh
        self.fused_replicas = fused_replicas
        self.shard_seeds = bool(shard_seeds)
        if self.shard_seeds:
            if mesh is None:
                raise ValueError("shard_seeds=True requires a mesh")
            if len(self.seeds) % mesh.size:
                raise ValueError(
                    f"shard_seeds needs len(seeds) divisible by the mesh "
                    f"size; got {len(self.seeds)} seeds over {mesh.size} "
                    f"devices"
                )
        self.params = init_ensemble(cfg, seeds)
        self.ckpt = (
            CheckpointManager(checkpoint_folder, model_name)
            if checkpoint_folder
            else None
        )
        # Per-seed loss histories + per-seed best-val snapshot, filled by fit.
        self.histories: List[LossHistory] = [LossHistory() for _ in self.seeds]
        self.best_params = None
        self.best_val = np.full(len(self.seeds), np.inf)
        self.best_epoch = np.full(len(self.seeds), -1, dtype=int)
        labels = model_lib.param_labels(cfg, jax.tree.map(lambda x: x[0], self.params))
        self.tx = make_optimizer(labels, lr=lr, weight_decay=weight_decay,
                                 max_grad_norm=max_grad_norm,
                                 grad_accum=grad_accum)
        self.opt_state = jax.vmap(self.tx.init)(self.params)
        if mesh is not None:
            from .mesh import replicated

            place = self._seed_sharding() if self.shard_seeds else replicated(mesh)
            self.params = jax.device_put(self.params, place)
            self.opt_state = jax.device_put(self.opt_state, place)
        # Multi-controller (one process per host, parallel/multihost.py):
        # host-fetched jit outputs must be fully replicated per process
        # (same contract as Trainer); under shard_seeds the seed axis
        # spans the global mesh, so each host trains its own replicas
        # with zero cross-host collectives except these tiny stat
        # gathers.  File writes are rank-0-guarded in CheckpointManager.
        self._multiproc = jax.process_count() > 1
        self._repl_jit = None
        self._steps = {}
        # Same host->device economics as Trainer: keep small datasets in
        # HBM and gather batches on device by index (single-device only).
        from ..data.device_cache import DeviceDataCache

        self.device_data = DeviceDataCache()

    def _seed_sharding(self):
        """NamedSharding partitioning the leading (seed) axis over the mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .mesh import DATA_AXIS

        return NamedSharding(self.mesh, P(DATA_AXIS))

    def _use_fused_replicas(self, enc: EncodeConfig) -> bool:
        if self.fused_replicas is not None:
            return bool(self.fused_replicas)
        return (
            jax.default_backend() == "tpu"
            and model_lib._head_fusible(self.cfg, enc)
        )

    def _build(self, enc: EncodeConfig):
        cfg, tx = self.cfg, self.tx
        n_seeds = len(self.seeds)
        # Under shard_seeds the step body below runs INSIDE shard_map on a
        # per-device shard of the seed axis; all replica-count-dependent
        # code (the unrolled fused loop) sees the local count.
        n_rep = n_seeds // self.mesh.size if self.shard_seeds else n_seeds
        fused = self._use_fused_replicas(enc)
        want_stacked = self.fused_replicas == "stacked"
        if want_stacked and not model_lib.stacked_head_fusible(cfg, enc):
            # No silent substitution: the flag exists for A/B measurement.
            logger.warning(
                "fused_replicas='stacked' requested but the config is not "
                "stacked-head-fusible (non-fusible shape / non-TPU "
                "backend); falling back to the UNROLLED fused path -- "
                "measurements are NOT the stacked variant."
            )
            want_stacked = False

        if fused:
            if want_stacked:
                # All replicas as ONE whole-network Pallas kernel pair
                # with a leading replica grid axis (the stacked-replica
                # lifting in ops/pallas_fused.py): numerically identical
                # to S unrolled calls, S× smaller XLA graph, no per-call
                # dispatch gaps.  Replica losses are independent, so
                # grad(sum of losses) yields the per-replica gradients.
                def all_logits(params, x):
                    return model_lib.forward_logits_pixels_stacked(
                        cfg, params, x, enc
                    )
            else:
                # Default fused shape: S unrolled fused-kernel calls (the
                # fastest measured -- see fused_replicas docstring); the
                # seed-invariant latency computation is CSE'd across
                # replicas by XLA.
                def all_logits(params, x):
                    return jnp.stack([
                        model_lib.forward_logits_pixels(
                            cfg, jax.tree.map(lambda a, i=i: a[i], params),
                            x, enc,
                        )
                        for i in range(n_rep)
                    ])

            def _sum_loss(params, x, y, w):
                logits = all_logits(params, x)  # (S, B, O)
                losses = jax.vmap(nll_loss, in_axes=(0, None, None))(
                    logits, y, w
                )
                return jnp.sum(losses), losses

            def stacked_grads(params, x, y, w):
                (_, losses), grads = jax.value_and_grad(
                    _sum_loss, has_aux=True
                )(params, x, y, w)
                return losses, grads

            def stacked_eval(params, x, y, w):
                logits = all_logits(params, x)
                losses = jax.vmap(nll_loss, in_axes=(0, None, None))(
                    logits, y, w
                )
                preds = jnp.argmax(logits, axis=-1)
                return losses, preds
        else:
            def one_replica_grads(params, inputs, y, w):
                def loss_fn(p):
                    logits = model_lib.forward_logits(cfg, p, inputs)
                    return nll_loss(logits, y, w)

                return jax.value_and_grad(loss_fn)(params)

        def train_step(params, opt_state, x, y, w):
            if fused:
                losses, grads = stacked_grads(params, x, y, w)
            else:
                inputs = _encode_on_device(x, enc)  # encoded once, shared
                losses, grads = jax.vmap(
                    one_replica_grads, in_axes=(0, None, None, None)
                )(params, inputs, y, w)
            updates, opt_state = jax.vmap(tx.update)(grads, opt_state, params)
            params = jax.vmap(optax.apply_updates)(params, updates)
            return params, opt_state, losses

        def eval_step(params, x, y, w):
            if fused:
                return stacked_eval(params, x, y, w)
            inputs = _encode_on_device(x, enc)

            def one_replica(p):
                logits = model_lib.forward_logits(cfg, p, inputs)
                return nll_loss(logits, y, w), jnp.argmax(logits, axis=-1)

            losses, preds = jax.vmap(one_replica)(params)
            return losses, preds  # (n_seeds,), (n_seeds, B)

        def predict_step(params, x):
            """Per-seed logits (n_seeds, B, O) from raw pixels."""
            if fused:
                return all_logits(params, x)
            inputs = _encode_on_device(x, enc)
            return jax.vmap(
                lambda p: model_lib.forward_logits(cfg, p, inputs)
            )(params)

        if self.shard_seeds:
            from jax.sharding import PartitionSpec as P

            from .mesh import DATA_AXIS

            S = P(DATA_AXIS)
            # Seed axis sharded, data replicated, ZERO collectives: the
            # body is pure per-replica compute, so shard_map introduces no
            # communication at all (asserted by tests on the lowered HLO).
            train = jax.jit(
                jax.shard_map(
                    train_step, mesh=self.mesh,
                    in_specs=(S, S, P(), P(), P()),
                    out_specs=(S, S, S),
                    check_vma=False,
                ),
                donate_argnums=(0, 1),
            )
            evals = jax.jit(
                jax.shard_map(
                    eval_step, mesh=self.mesh,
                    in_specs=(S, P(), P(), P()),
                    out_specs=(S, S),
                    check_vma=False,
                )
            )
        elif self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .mesh import DATA_AXIS, batch_sharded, replicated

            repl, bsh = replicated(self.mesh), batch_sharded(self.mesh)
            # preds are (n_seeds, B): the batch axis is dim 1 here.
            seed_bsh = NamedSharding(self.mesh, P(None, DATA_AXIS))
            train = jax.jit(
                train_step,
                in_shardings=(repl, repl, bsh, bsh, bsh),
                out_shardings=(repl, repl, repl),
                donate_argnums=(0, 1),
            )
            evals = jax.jit(
                eval_step,
                in_shardings=(repl, bsh, bsh, bsh),
                out_shardings=(repl, seed_bsh),
            )
        else:
            train = jax.jit(train_step, donate_argnums=(0, 1))
            evals = jax.jit(eval_step)

        # Whole-epoch scan variants (device-resident data): one dispatch
        # per epoch instead of ~5 relay round trips per batch (see
        # train/trainer.py's epoch path; ~30 ms each on relays).  Under a
        # mesh the dataset is replicated in HBM and each scanned batch is
        # resharded onto the "data" axis (a local slice), so the step runs
        # data-parallel exactly like the per-batch path.
        if self.mesh is not None and not self.shard_seeds:
            from .mesh import batch_sharded as _bsh_fn

            _bsh_epoch = _bsh_fn(self.mesh)

            def shard_b(t):
                return jax.lax.with_sharding_constraint(t, _bsh_epoch)
        else:
            # Single device, or shard_seeds (the epoch fn body then runs
            # inside shard_map where data is already the replicated local
            # copy -- no sharding constraints apply in that scope).
            def shard_b(t):
                return t

        def train_epoch_fn(params, opt_state, x_all, y_all, idx_mat, w_mat):
            def body(carry, batch):
                p, o = carry
                idx, w = batch
                p, o, losses = train_step(
                    p, o, shard_b(jnp.take(x_all, idx, axis=0)),
                    shard_b(jnp.take(y_all, idx, axis=0)), shard_b(w),
                )
                return (p, o), losses

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (idx_mat, w_mat)
            )
            return params, opt_state, losses  # (n_batches, n_seeds)

        def eval_epoch_fn(params, x_all, y_all, idx_mat, w_mat):
            def body(_, batch):
                idx, w = batch
                w = shard_b(w)
                y = shard_b(jnp.take(y_all, idx, axis=0))
                losses, preds = eval_step(
                    params, shard_b(jnp.take(x_all, idx, axis=0)), y, w
                )
                correct = jnp.sum((preds == y[None]) * w[None], axis=1)
                return 0, (losses, correct, jnp.sum(w))

            _, (losses, correct, total) = jax.lax.scan(
                body, 0, (idx_mat, w_mat)
            )
            # (n_batches, n_seeds) losses; per-seed correct counts; total.
            return losses, jnp.sum(correct, axis=0), jnp.sum(total)

        # Multi-epoch block: K train+val ensemble epochs in ONE dispatch
        # (the exact counterpart of train/trainer.py's train_block_fn).
        # Per epoch the scan also merges the per-seed best-val snapshot on
        # device (the jnp.where merge _update_best does on the host path)
        # so the whole K-epoch trajectory needs zero host decisions.  With
        # a checkpoint folder the per-epoch (params, opt_state) stacks are
        # emitted as scan outputs and written to the K per-epoch files
        # from one packed host fetch.
        with_snaps = self.ckpt is not None

        def block_fn(params, opt_state, best_params, best_val,
                     x_tr, y_tr, ti, tw, x_va, y_va, vi, vw):
            def epoch_body(carry, xs):
                p, o, bp, bv = carry
                eti, etw, evi, evw = xs
                p, o, tr_losses = train_epoch_fn(p, o, x_tr, y_tr, eti, etw)
                va_losses, corr, tot = eval_epoch_fn(p, x_va, y_va, evi, evw)
                tr_mean = jnp.mean(tr_losses, axis=0)  # (S,)
                va_mean = jnp.mean(va_losses, axis=0)  # (S,)
                improved = va_mean < bv

                def merge(b, c):
                    m = improved.reshape((-1,) + (1,) * (c.ndim - 1))
                    return jnp.where(m, c, b)

                bp = jax.tree.map(merge, bp, p)
                bv = jnp.where(improved, va_mean, bv)
                out = (tr_mean, va_mean, corr, tot, improved)
                if with_snaps:
                    out = out + ((p, o),)
                return (p, o, bp, bv), out

            (params, opt_state, best_params, best_val), outs = jax.lax.scan(
                epoch_body, (params, opt_state, best_params, best_val),
                (ti, tw, vi, vw),
            )
            return params, opt_state, best_params, best_val, outs

        # Early-stopping block: the ensemble plateaus on the MEAN val loss
        # across seeds (one stop decision for the vmapped step, the
        # ensemble-level reading of quirk Q6 -- including the underfull-
        # window stop).  The decision runs ON DEVICE inside the scan;
        # post-stop epochs take a lax.cond skip branch (params / best
        # merge frozen) and are flagged so the host writes neither
        # histories nor files for them.  Mirrors Trainer's
        # train_block_es_fn.
        seed_pmean = self.shard_seeds

        def block_es_fn(params, opt_state, best_params, best_val, win, nv,
                        x_tr, y_tr, ti, tw, x_va, y_va, vi, vw):
            from ..train.trainer import ES_TOL

            patience = win.shape[0]
            tol = ES_TOL
            n_loc = best_val.shape[0]  # local seed count (shard or full)

            def epoch_body(carry, xs):
                p, o, bp, bv, win, nv, stopped = carry
                eti, etw, evi, evw = xs

                def run(operand):
                    p, o, bp, bv = operand
                    p2, o2, tr_losses = train_epoch_fn(
                        p, o, x_tr, y_tr, eti, etw
                    )
                    va_losses, corr, tot = eval_epoch_fn(
                        p2, x_va, y_va, evi, evw
                    )
                    tr_mean = jnp.mean(tr_losses, axis=0)  # (S,)
                    va_mean = jnp.mean(va_losses, axis=0)  # (S,)
                    improved = va_mean < bv

                    def merge(b, c):
                        m = improved.reshape((-1,) + (1,) * (c.ndim - 1))
                        return jnp.where(m, c, b)

                    bp = jax.tree.map(merge, bp, p2)
                    bv = jnp.where(improved, va_mean, bv)
                    return (p2, o2, bp, bv, tr_mean, va_mean, corr, tot,
                            improved)

                def skip(operand):
                    p, o, bp, bv = operand
                    z = jnp.zeros((n_loc,), jnp.float32)
                    return (p, o, bp, bv, z, z, z,
                            jnp.zeros((), jnp.float32),
                            jnp.zeros((n_loc,), jnp.bool_))

                (p, o, bp, bv, tr_mean, va_mean, corr, tot,
                 improved) = jax.lax.cond(
                    stopped, skip, run, (p, o, bp, bv)
                )
                ran = jnp.logical_not(stopped)
                mval = jnp.mean(va_mean)
                if seed_pmean:
                    # Local shard mean -> global mean over equal-size seed
                    # shards (the plateau must be one global decision).
                    from .mesh import DATA_AXIS

                    mval = jax.lax.pmean(mval, DATA_AXIS)
                win = jnp.where(
                    stopped, win, jnp.concatenate([win[1:], mval[None]])
                )
                nv = jnp.where(stopped, nv, jnp.minimum(nv + 1, patience))
                pair_real = jnp.arange(patience - 1) >= (patience - nv)
                plateau = jnp.all(
                    (jnp.abs(jnp.diff(win)) < tol) | ~pair_real
                )
                stopped = stopped | (ran & plateau)
                out = (tr_mean, va_mean, corr, tot, improved,
                       ran.astype(jnp.float32), stopped.astype(jnp.float32))
                if with_snaps:
                    out = out + ((p, o),)
                return (p, o, bp, bv, win, nv, stopped), out

            (params, opt_state, best_params, best_val, *_), outs = (
                jax.lax.scan(
                    epoch_body,
                    (params, opt_state, best_params, best_val, win, nv,
                     jnp.asarray(False)),
                    (ti, tw, vi, vw),
                )
            )
            return params, opt_state, best_params, best_val, outs

        if self.shard_seeds:
            from jax.sharding import PartitionSpec as P

            from .mesh import DATA_AXIS

            S = P(DATA_AXIS)
            train_epoch = jax.jit(
                jax.shard_map(
                    train_epoch_fn, mesh=self.mesh,
                    in_specs=(S, S, P(), P(), P(), P()),
                    # per-batch losses are (n_batches, n_seeds): the seed
                    # axis is dim 1 inside the scan stack.
                    out_specs=(S, S, P(None, DATA_AXIS)),
                    check_vma=False,
                ),
                donate_argnums=(0, 1),
            )
            eval_epoch = jax.jit(
                jax.shard_map(
                    eval_epoch_fn, mesh=self.mesh,
                    in_specs=(S, P(), P(), P(), P()),
                    # (losses (n_batches, S), correct (S,), total scalar --
                    # identical on every shard, so P() is exact).
                    out_specs=(P(None, DATA_AXIS), S, P()),
                    check_vma=False,
                )
            )
            # Block outputs put the seed axis at dim 1 (the scan stacks a
            # K-epoch axis in front); snapshot leaves are (K, S, ...).
            SB = P(None, DATA_AXIS)
            outs_spec = (SB, SB, SB, P(), SB)
            if with_snaps:
                outs_spec = outs_spec + ((SB, SB),)
            train_block = jax.jit(
                jax.shard_map(
                    block_fn, mesh=self.mesh,
                    in_specs=(S, S, S, S) + (P(),) * 8,
                    out_specs=(S, S, S, S, outs_spec),
                    check_vma=False,
                ),
                donate_argnums=(0, 1, 2, 3),
            )
            # ES block: + replicated (win, nv) inputs and (ran, stop)
            # per-epoch flag outputs (the plateau is one global decision,
            # pmean'd over the seed shards inside the body).
            outs_es_spec = (SB, SB, SB, P(), SB, P(), P())
            if with_snaps:
                outs_es_spec = outs_es_spec + ((SB, SB),)
            train_block_es = jax.jit(
                jax.shard_map(
                    block_es_fn, mesh=self.mesh,
                    in_specs=(S, S, S, S, P(), P()) + (P(),) * 8,
                    out_specs=(S, S, S, S, outs_es_spec),
                    check_vma=False,
                ),
                donate_argnums=(0, 1, 2, 3),
            )
            predict = jax.jit(
                jax.shard_map(
                    predict_step, mesh=self.mesh,
                    in_specs=(S, P()), out_specs=S,
                    check_vma=False,
                )
            )
        elif self.mesh is None:
            train_epoch = jax.jit(train_epoch_fn, donate_argnums=(0, 1))
            eval_epoch = jax.jit(eval_epoch_fn)
            train_block = jax.jit(block_fn, donate_argnums=(0, 1, 2, 3))
            train_block_es = jax.jit(block_es_fn, donate_argnums=(0, 1, 2, 3))
            predict = jax.jit(predict_step)
        else:
            repl_e = replicated(self.mesh)
            train_epoch = jax.jit(
                train_epoch_fn,
                in_shardings=(repl_e,) * 6,
                out_shardings=(repl_e, repl_e, repl_e),
                donate_argnums=(0, 1),
            )
            eval_epoch = jax.jit(
                eval_epoch_fn,
                in_shardings=(repl_e,) * 5,
                out_shardings=(repl_e, repl_e, repl_e),
            )
            train_block = jax.jit(
                block_fn,
                in_shardings=(repl_e,) * 12,
                out_shardings=repl_e,
                donate_argnums=(0, 1, 2, 3),
            )
            train_block_es = jax.jit(
                block_es_fn,
                in_shardings=(repl_e,) * 14,
                out_shardings=repl_e,
                donate_argnums=(0, 1, 2, 3),
            )
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .mesh import DATA_AXIS, batch_sharded

            predict = jax.jit(
                predict_step,
                in_shardings=(repl_e, batch_sharded(self.mesh)),
                # logits are (n_seeds, B, O): the batch axis is dim 1.
                out_shardings=NamedSharding(self.mesh, P(None, DATA_AXIS)),
            )
        return EnsembleSteps(train, evals, train_epoch, eval_epoch,
                             train_block, predict, train_block_es)

    def _steps_for(self, enc: EncodeConfig):
        if enc not in self._steps:
            self._steps[enc] = self._build(enc)
        return self._steps[enc]

    def _prep(self, x, y, n_real: int = None):
        """Shard (and mesh-pad) one batch; rows past ``n_real`` get weight 0."""
        x, y = np.asarray(x), np.asarray(y)
        n_real = x.shape[0] if n_real is None else n_real
        if self.mesh is None or self.shard_seeds:
            # shard_seeds: the batch is replicated (shard_map in_specs
            # P()); uncommitted host arrays land there directly.
            w = (np.arange(x.shape[0]) < n_real).astype(np.float32)
            return x, y, w
        from .mesh import pad_to_multiple, shard_batch

        x, _ = pad_to_multiple(x, self.mesh.size)
        y, _ = pad_to_multiple(y, self.mesh.size)
        w = (np.arange(x.shape[0]) < n_real).astype(np.float32)
        return shard_batch(self.mesh, x, y, w)

    def _batches(self, loader: ArrayDataLoader):
        if self.device_data.fits(loader):
            # shard_seeds keeps batches whole (replicated), so the
            # device cache must not batch-shard them.
            mesh = None if self.shard_seeds else self.mesh
            yield from self.device_data.batches(loader, mesh)
            return
        for x, y in loader:
            x, y = np.asarray(x), np.asarray(y)
            # One compiled shape per epoch: pad remainder batches to the
            # nominal batch size with weight-0 rows (exact; see
            # data/device_cache.pad_rows for the device-resident path).
            if x.shape[0] < loader.batch_size:
                pad = loader.batch_size - x.shape[0]
                xp = np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
                yp = np.pad(y, (0, pad))
                yield self._prep(xp, yp, n_real=x.shape[0])
            else:
                yield self._prep(x, y)

    def train_epoch(self, loader: ArrayDataLoader) -> np.ndarray:
        """One epoch over the loader; returns mean loss per seed."""
        if self._epoch_eligible(loader):
            train_epoch = self._steps_for(loader.encode_config)[2]
            x_all, y_all = self.device_data.arrays(loader, self.mesh)
            mi, mw = self._epoch_index_matrix(loader)
            self.params, self.opt_state, losses = train_epoch(
                self.params, self.opt_state, x_all, y_all,
                jnp.asarray(mi), jnp.asarray(mw),
            )
            return np.mean(np.asarray(self._host_fetch(losses)), axis=0)
        step = self._steps_for(loader.encode_config)[0]
        losses = []
        for xb, yb, wb in self._batches(loader):
            self.params, self.opt_state, batch_losses = step(
                self.params, self.opt_state, xb, yb, wb
            )
            losses.append(batch_losses)
        return np.mean(
            np.asarray(self._host_fetch(jnp.stack(losses))), axis=0
        )

    def _host_fetch(self, tree):
        """np-fetchable copy of jit outputs: in a multi-process run,
        reshard to fully replicated first (an all-gather of the tiny
        per-seed stats / logits over the mesh) -- ``np.asarray`` on a
        global jax.Array only works when every process holds a complete
        copy.  Identity in single-process runs."""
        if not self._multiproc or self.mesh is None:
            return tree
        if self._repl_jit is None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._repl_jit = jax.jit(
                lambda t: t,
                out_shardings=NamedSharding(self.mesh, PartitionSpec()),
            )
        return self._repl_jit(tree)

    def _epoch_eligible(self, loader) -> bool:
        return self.device_data.fits(loader)

    def _epoch_index_matrix(self, loader):
        from ..data.device_cache import pad_rows

        target = loader.batch_size
        if self.mesh is not None and not self.shard_seeds:
            n_dev = self.mesh.size
            target = -(-target // n_dev) * n_dev
        idxs, ws = [], []
        for idx in loader.iter_indices():
            p, w = pad_rows(np.asarray(idx), target)
            idxs.append(p)
            ws.append(w)
        return (
            np.stack(idxs).astype(np.int32),
            np.stack(ws).astype(np.float32),
        )

    def eval_epoch(self, loader: ArrayDataLoader):
        """One fused eval sweep: (per-seed mean loss, per-seed accuracy)."""
        if self._epoch_eligible(loader):
            eval_epoch = self._steps_for(loader.encode_config)[3]
            x_all, y_all = self.device_data.arrays(loader, self.mesh)
            mi, mw = self._epoch_index_matrix(loader)
            losses, correct, total = self._host_fetch(eval_epoch(
                self.params, x_all, y_all, jnp.asarray(mi), jnp.asarray(mw)
            ))
            return (
                np.mean(np.asarray(losses), axis=0),
                np.asarray(correct) / max(float(total), 1.0),
            )
        evals = self._steps_for(loader.encode_config)[1]
        losses = []
        correct = np.zeros(len(self.seeds))
        total = 0
        for xb, yb, wb in self._batches(loader):
            batch_losses, preds = evals(self.params, xb, yb, wb)
            losses.append(batch_losses)
            correct += np.asarray(self._host_fetch(
                jnp.sum((preds == yb[None]) * wb[None], axis=1)
            ))
            total += int(jnp.sum(wb))
        return (
            np.mean(np.asarray(self._host_fetch(jnp.stack(losses))), axis=0),
            correct / max(total, 1),
        )

    def accuracies(self, loader: ArrayDataLoader) -> np.ndarray:
        """Per-seed accuracy over the loader."""
        return self.eval_epoch(loader)[1]

    # -- ensemble inference ------------------------------------------------
    #
    # The reference only ever reports per-seed accuracies; combining the
    # replicas into ONE predictor is the payoff of training them together.
    # Soft voting ("mean_proba": argmax of the seed-averaged softmax) and
    # hard majority voting ("vote") are both provided; ties in "vote"
    # resolve to the lowest label (np.bincount argmax), deterministically.

    def predict_logits(self, x, encode_config: Optional[EncodeConfig] = None):
        """Per-seed prediction logits ``(n_seeds, B, n_classes)`` for raw
        pixel inputs (the stacked analogue of
        ``SNN.get_prediction_logits``)."""
        enc = encode_config or EncodeConfig(n_steps=self.cfg.int_time_steps)
        predict = self._steps_for(enc).predict
        x = np.asarray(x, dtype=np.float32)
        n_real = x.shape[0]
        if self.mesh is not None and not self.shard_seeds:
            from .mesh import pad_to_multiple

            x, _ = pad_to_multiple(x, self.mesh.size)
        logits = self._host_fetch(predict(self.params, jnp.asarray(x)))
        return logits[:, :n_real]

    def predict_proba(self, x, encode_config: Optional[EncodeConfig] = None,
                      reduce: Optional[str] = "mean"):
        """Class probabilities: the seed-averaged softmax ``(B, n_classes)``
        (``reduce="mean"``), or per-seed probabilities
        ``(n_seeds, B, n_classes)`` with ``reduce=None``."""
        probas = jax.nn.softmax(self.predict_logits(x, encode_config), axis=-1)
        if reduce is None:
            return probas
        if reduce != "mean":
            raise ValueError(f"unknown reduce {reduce!r}; use 'mean' or None")
        return jnp.mean(probas, axis=0)

    def predict(self, x, encode_config: Optional[EncodeConfig] = None,
                method: str = "mean_proba") -> np.ndarray:
        """Ensemble class predictions ``(B,)``.

        ``method="mean_proba"``: argmax of the seed-averaged softmax (soft
        voting -- the default; uses every replica's confidence).
        ``method="vote"``: per-seed argmax, majority vote, ties to the
        lowest label."""
        if method == "mean_proba":
            return np.asarray(jnp.argmax(self.predict_proba(x, encode_config),
                                         axis=-1))
        if method != "vote":
            raise ValueError(
                f"unknown method {method!r}; use 'mean_proba' or 'vote'")
        seed_preds = np.asarray(
            jnp.argmax(self.predict_logits(x, encode_config), axis=-1)
        )  # (n_seeds, B)
        return majority_vote(seed_preds, self.cfg.output_size)

    def ensemble_accuracy(self, loader: ArrayDataLoader,
                          method: str = "mean_proba") -> float:
        """Accuracy of the combined ensemble predictor over the loader
        (typically above the per-seed ``accuracies`` mean)."""
        correct, total = 0, 0
        for x, y in loader:
            pred = self.predict(x, loader.encode_config, method=method)
            correct += int(np.sum(pred == np.asarray(y)))
            total += len(np.asarray(y))
        return correct / max(total, 1)

    def serve(self, *, encode_config: Optional[EncodeConfig] = None,
              **server_kwargs):
        """An :class:`~..serve.InferenceServer` over the whole ensemble.

        The server's compiled per-batch program is the soft-voting forward:
        every replica's logits (ONE stacked Pallas kernel pair where the
        config fuses, unrolled fused calls elsewhere -- the same dispatch
        logic as :meth:`predict_logits`), softmaxed and seed-averaged on
        device.  Each request's result rows are therefore the ensemble's
        ``(B, n_classes)`` mean class PROBABILITIES (not raw logits);
        ``classify`` argmaxes them exactly like :meth:`predict`'s default
        ``mean_proba`` method.

        ``server_kwargs`` pass through to ``InferenceServer`` (batch_size,
        max_delay_s, input_dtype, ...).  Call after ``load_best()`` to
        serve the per-seed best snapshots.
        """
        from ..serve import InferenceServer

        cfg = self.cfg
        enc = encode_config or EncodeConfig(n_steps=cfg.int_time_steps)
        n_rep = len(self.seeds)
        use_stacked = model_lib.stacked_head_fusible(cfg, enc)

        def soft_voting_forward(params, x):
            if use_stacked:
                logits = model_lib.forward_logits_pixels_stacked(
                    cfg, params, x, enc
                )
            else:
                logits = jnp.stack([
                    model_lib.forward_logits_pixels(
                        cfg, jax.tree.map(lambda a, i=i: a[i], params), x, enc
                    )
                    for i in range(n_rep)
                ])
            return jnp.mean(jax.nn.softmax(logits, axis=-1), axis=0)

        return InferenceServer(
            cfg, self.params, encode_config=enc,
            forward_fn=soft_voting_forward, **server_kwargs,
        )

    # -- fit -------------------------------------------------------------------
    def fit(
        self,
        train_dataloader: ArrayDataLoader,
        val_dataloader: ArrayDataLoader,
        nb_epochs: int = 15,
        load_checkpoint_mode: Optional[LoadCheckpointMode] = None,
        force_overwrite: bool = False,
        early_stopping: bool = False,
        early_stopping_patience: int = 5,
        verbose: bool = True,
        epoch_block: Optional[int] = None,
        checkpoint_every: int = 1,
    ) -> List[LossHistory]:
        """Train all replicas simultaneously with per-epoch train+val
        phases, per-seed best-val snapshots, and optional plateau early
        stopping -- the vmapped counterpart of ``Trainer.fit``
        (snn.py:280-350), replacing N sequential reference runs
        (training.py:151-201).

        Per-seed best params are tracked on device (a ``jnp.where`` merge
        per epoch); ``load_best()`` installs them afterwards -- the
        stacked analogue of reloading BEST_EPOCH (training.py:130).  Early
        stopping plateaus on the *mean* val loss across seeds (one stop
        decision for the vmapped step, the ensemble-level reading of
        quirk Q6).  With a ``checkpoint_folder``, every epoch saves the
        stacked params/opt_state plus per-seed best metadata.

        Resume semantics match ``Trainer.fit`` (quirk Q5, snn.py:302-317):
        with ``load_checkpoint_mode=None`` an existing checkpoint folder
        requires ``force_overwrite=True`` (then it is wiped); with
        ``LAST_EPOCH``/``BEST_EPOCH`` the stacked params/opt_state, the
        per-seed loss histories, and the per-seed best-val snapshots are
        all restored, and a missing checkpoint downgrades to a warning.

        ``epoch_block``: run K train+val epochs per device dispatch (the
        counterpart of ``Trainer.fit(epoch_block=...)``; the per-seed
        best-val merge happens on device inside the block scan).  ``None``
        auto-picks 8 when the dataset is device-resident and early
        stopping is off; pass 1 to force the per-epoch path.  Identical
        math, batch order, histories, best snapshots, and per-epoch
        checkpoint files; early stopping needs a per-epoch host decision,
        so it always uses the per-epoch path.

        ``checkpoint_every``: write per-epoch checkpoint files only for
        every Nth and the final epoch, plus ONE merged-best payload at
        fit end (the device-resident per-seed best stack, fetched once).
        The default 1 is the every-epoch contract.  The per-epoch stacked
        snapshot transfer scales with the seed count, so it dominates
        ensemble fits on relay-attached TPUs the same way it does
        ``Trainer.fit`` (see ``Trainer.fit(checkpoint_every=...)``).
        Training math, histories, and the in-memory best snapshots are
        unchanged; resume from LAST_EPOCH restarts from the newest file
        on disk, and best reconstruction prefers the merged payload.
        """
        every = max(int(checkpoint_every), 1)
        if self._multiproc:
            # Progress display belongs to process 0; file writes are
            # already rank-0-guarded in CheckpointManager.
            from .multihost import is_main

            verbose = verbose and is_main()
        start_epoch = self._prepare_resume(
            load_checkpoint_mode, force_overwrite, verbose
        )
        if start_epoch >= nb_epochs:
            return self.histories
        block = 8 if epoch_block is None else int(epoch_block)
        if (
            block > 1
            and self._epoch_eligible(train_dataloader)
            and self._epoch_eligible(val_dataloader)
            # The block program bakes ONE encode config for both phases.
            and train_dataloader.encode_config == val_dataloader.encode_config
        ):
            # Early stopping composes with the block: the mean-val plateau
            # decision runs on device inside the block scan (block_es_fn);
            # identical stop epoch/histories to the per-epoch path.
            return self._fit_blocked(
                train_dataloader, val_dataloader, start_epoch, nb_epochs,
                block, verbose, every,
                early_stopping=early_stopping,
                patience=early_stopping_patience,
            )
        epochs_iter = range(start_epoch, nb_epochs)
        if verbose:
            from tqdm.auto import tqdm

            epochs_iter = tqdm(epochs_iter, desc="Training ensemble", unit="epoch")
        # Restored histories re-seed the early-stopping window.  Old
        # checkpoints (pre-dense-meta) may hold fewer entries than
        # start_epoch; seed from what exists.
        n_hist = min(
            (len(h["val"]) for h in self.histories), default=0
        )
        mean_val_history: List[float] = [
            float(np.mean([h["val"][e] for h in self.histories]))
            for e in range(min(start_epoch, n_hist))
        ]
        for epoch in epochs_iter:
            train_losses = self.train_epoch(train_dataloader)
            val_losses, val_accs = self.eval_epoch(val_dataloader)
            for i, hist in enumerate(self.histories):
                hist.concat(
                    dict(train=float(train_losses[i]), val=float(val_losses[i]))
                )
            improved = val_losses < self.best_val
            self._update_best(improved, epoch)
            self.best_val = np.where(improved, val_losses, self.best_val)
            if self.ckpt is not None:
                from ..train.trainer import checkpoint_selected

                if checkpoint_selected(epoch, nb_epochs, every):
                    self._save_checkpoint(
                        epoch, train_losses, val_losses, improved
                    )
                else:
                    self._write_meta(epoch, train_losses, val_losses)
            mean_val_history.append(float(np.mean(val_losses)))
            if verbose:
                epochs_iter.set_postfix(
                    train_loss=f"{np.mean(train_losses):.5e}",
                    val_loss=f"{np.mean(val_losses):.5e}",
                    val_acc=f"{np.mean(val_accs):.5f}",
                )
            # Same plateau detector as Trainer._check_early_stopping /
            # the reference (snn.py:272-278, quirk Q6) INCLUDING the
            # under-full-window behavior: with a 1-element history the
            # diff is empty and ``np.all([]) == True``, so
            # ``early_stopping=True`` stops after the first epoch --
            # faithfully replicated on both trainers (no reference entry
            # point ever enables early stopping, so this quirk is latent
            # there too).
            from ..train.trainer import ES_TOL

            window = mean_val_history[-early_stopping_patience:]
            if early_stopping and bool(
                np.all(np.abs(np.diff(window)) < ES_TOL)
            ):
                if verbose:
                    logger.info(
                        f"Early stopping stopped the ensemble at epoch {epoch}."
                    )
                break
        if verbose:
            epochs_iter.close()
        if self.ckpt is not None and every > 1:
            self._write_best_merged()
        return self.histories

    def _write_best_merged(self) -> None:
        """One end-of-fit fetch of the device-resident per-seed best stack
        -> the merged-best payload ``_reconstruct_best_params`` prefers.
        Replaces per-epoch best files under ``checkpoint_every > 1``."""
        if self.best_params is None:
            return
        from ..train.trainer import host_snapshot

        params_h = host_snapshot(self.best_params, self.mesh)
        self.ckpt.save_best_merged(
            params_h,
            {"best_epoch_per_seed": [int(e) for e in self.best_epoch]},
        )

    def _es_window(self, patience: int):
        """Device init of the mean-val early-stopping window (the
        ensemble plateaus on the across-seed MEAN val loss): the last
        ``patience`` recorded entries + how many are real."""
        n_hist = min((len(h["val"]) for h in self.histories), default=0)
        tail = [
            float(np.mean([h["val"][e] for h in self.histories]))
            for e in range(n_hist)
        ][-patience:]
        win = np.zeros(patience, np.float32)
        if tail:
            win[-len(tail):] = tail
        return jnp.asarray(win), jnp.asarray(len(tail), jnp.int32)

    def _fit_blocked(self, train_loader, val_loader, start_epoch, nb_epochs,
                     block, verbose, every=1, early_stopping=False,
                     patience=5):
        """K-epochs-per-dispatch ensemble fit (see ``fit(epoch_block=...)``
        and ``Trainer._fit_blocked``).

        Per block: ONE device dispatch (K train+val epoch scans with the
        per-seed best merge inside), ONE stats fetch, and -- with a
        checkpoint folder -- ONE packed snapshot fetch that writes the K
        per-epoch checkpoint files.  Index matrices come from the same
        ``iter_indices()`` rng sequence as the per-epoch path, so the
        trajectories (and files) are identical.

        ``early_stopping``: the mean-val plateau flag is evaluated on
        device after every scanned epoch (block_es_fn); post-stop epochs
        take a frozen skip branch and are excluded from histories/files,
        so stop epoch and outputs match the per-epoch path."""
        from ..train.trainer import host_snapshot

        steps = self._steps_for(train_loader.encode_config)
        train_block, train_block_es = steps[4], steps.train_block_es
        with_snaps = self.ckpt is not None
        n_seeds = len(self.seeds)
        pbar = None
        if verbose:
            from tqdm.auto import tqdm

            pbar = tqdm(total=nb_epochs - start_epoch,
                        desc="Training ensemble", unit="epoch")
        x_tr, y_tr = self.device_data.arrays(train_loader, self.mesh)
        x_va, y_va = self.device_data.arrays(val_loader, self.mesh)
        if self.best_params is None:
            # Fresh fits have best_val == inf, so the first epoch improves
            # every seed and the on-device merge reproduces
            # _update_best's copy-on-first-call exactly.
            best_params = jax.tree.map(jnp.copy, self.params)
        else:
            best_params = self.best_params
        best_val_dev = jnp.asarray(self.best_val, dtype=jnp.float32)
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
                (self.params, self.opt_state, best_params, best_val_dev,
                 outs) = train_block_es(
                    self.params, self.opt_state, best_params, best_val_dev,
                    win, nv, *data_args,
                )
                trm, vam, corr, tot, improved, ran_f, stop_f = outs[:7]
                stats = np.asarray(self._host_fetch(jnp.concatenate(
                    [trm, vam, corr, improved.astype(jnp.float32),
                     tot[:, None], ran_f[:, None], stop_f[:, None]],
                    axis=1,
                )))
                k_eff = int(np.sum(stats[:k, -2] > 0.5))
                if k_eff and stats[k_eff - 1, -1] > 0.5:
                    stop_epoch = epoch + k_eff - 1
            else:
                (self.params, self.opt_state, best_params, best_val_dev,
                 outs) = train_block(
                    self.params, self.opt_state, best_params, best_val_dev,
                    *data_args,
                )
                trm, vam, corr, tot, improved = outs[:5]
                # ONE host sync for the whole block's per-seed stats.
                stats = np.asarray(self._host_fetch(jnp.concatenate(
                    [trm, vam, corr, improved.astype(jnp.float32),
                     tot[:, None]],
                    axis=1,
                )))
                k_eff = k
            # checkpoint_every > 1: gather only the selected epochs' rows
            # on device before the host fetch -- the stacked (K, S, ...)
            # snapshot transfer is the measured fit bottleneck (see
            # Trainer.fit(checkpoint_every=...)); the best stack already
            # lives on device and is written once at fit end.
            from ..train.trainer import checkpoint_selected

            sel = (
                [i for i in range(k_eff)
                 if checkpoint_selected(epoch + i, nb_epochs, every)]
                if every > 1
                else list(range(k_eff))
            )
            snaps_h, sel_pos = None, {i: i for i in sel}
            if with_snaps and sel:
                snaps_src = outs[7] if early_stopping else outs[5]
                if len(sel) < k:
                    idx = jnp.asarray(np.asarray(sel, np.int32))
                    snaps_src = jax.tree.map(lambda a: a[idx], snaps_src)
                    sel_pos = {e: p for p, e in enumerate(sel)}
                snaps_h = host_snapshot(snaps_src, self.mesh)
            tot_col = 4 * n_seeds
            for i in range(k_eff):
                tl = stats[i, :n_seeds]
                vl = stats[i, n_seeds:2 * n_seeds]
                corr_i = stats[i, 2 * n_seeds:3 * n_seeds]
                imp = stats[i, 3 * n_seeds:4 * n_seeds] > 0.5
                tot_i = float(stats[i, tot_col])
                for j, hist in enumerate(self.histories):
                    hist.concat(
                        dict(train=float(tl[j]), val=float(vl[j]))
                    )
                self.best_epoch = np.where(imp, epoch + i, self.best_epoch)
                self.best_val = np.where(imp, vl, self.best_val)
                if with_snaps and i in sel_pos and snaps_h is not None:
                    pos = sel_pos[i]
                    params_h, opt_h = jax.tree.map(
                        lambda a: a[pos], snaps_h
                    )
                    self._write_checkpoint(
                        params_h, opt_h, epoch + i, tl, vl, imp
                    )
                elif with_snaps:
                    # Params file skipped (checkpoint_every): the meta
                    # still records this epoch so restored histories stay
                    # dense and best metadata stays current.
                    self._write_meta(epoch + i, tl, vl)
                if pbar is not None:
                    pbar.update(1)
                    pbar.set_postfix(
                        train_loss=f"{np.mean(tl):.5e}",
                        val_loss=f"{np.mean(vl):.5e}",
                        val_acc=f"{np.mean(corr_i) / max(tot_i, 1.0):.5f}",
                    )
            epoch += k
            if stop_epoch is not None:
                if verbose:
                    logger.info(
                        f"Early stopping stopped the ensemble at epoch "
                        f"{stop_epoch}."
                    )
                break
        self.best_params = best_params
        if pbar is not None:
            pbar.close()
        if with_snaps and every > 1:
            self._write_best_merged()
        return self.histories

    def _replicate(self, tree):
        """device_put with the trainer's param placement (no-op off-mesh):
        seed-sharded under ``shard_seeds``, replicated otherwise."""
        if self.mesh is None:
            return tree
        if self.shard_seeds:
            return jax.device_put(tree, self._seed_sharding())
        from .mesh import replicated

        return jax.device_put(tree, replicated(self.mesh))

    def _prepare_resume(
        self,
        load_checkpoint_mode: Optional[LoadCheckpointMode],
        force_overwrite: bool,
        verbose: bool,
    ) -> int:
        """Apply the Q5 overwrite/resume contract; returns the start epoch."""
        if self.ckpt is None:
            return 0
        if load_checkpoint_mode is None:
            meta_exists = os.path.exists(self.ckpt.checkpoints_meta_path)
            if self._multiproc:
                # Rank 0's filesystem view decides for every rank (a
                # per-rank exists() races against rank 0's delete and can
                # diverge the barrier entry -- cluster deadlock).
                from .multihost import broadcast_flag

                meta_exists = broadcast_flag(meta_exists)
            if meta_exists:
                if not force_overwrite:
                    raise AssertionError(
                        f"{self.ckpt.checkpoints_meta_path} already exists. "
                        "Set force_overwrite flag to True to overwrite "
                        "existing saves."
                    )
                if not self._multiproc:
                    shutil.rmtree(self.ckpt.checkpoint_folder)
                else:
                    # Multi-host: only process 0 deletes, and nobody may
                    # start writing into the folder it is still deleting.
                    from .multihost import barrier, is_main

                    if is_main():
                        shutil.rmtree(self.ckpt.checkpoint_folder)
                    barrier("ensemble-fit-overwrite")
            return 0
        if self._multiproc:
            # Non-zero ranks must not read files process 0 may still be
            # writing from a previous fit on this cluster.
            from .multihost import barrier

            barrier("ensemble-checkpoint-load")
        try:
            return self._restore_from_checkpoint(load_checkpoint_mode)
        except FileNotFoundError:
            if verbose:
                logger.warning("No such checkpoint. Fit from beginning.")
            return 0

    def _restore_from_checkpoint(self, mode: LoadCheckpointMode) -> int:
        """Restore stacked params/opt_state, per-seed histories, and the
        per-seed best-val snapshots (reconstructed from the per-epoch
        checkpoint files recorded in ``best_per_seed``)."""
        import json

        checkpoint = self.ckpt.load_checkpoint(mode)
        self.params, self.opt_state = self.ckpt.restore(
            checkpoint, self.params, self.opt_state
        )
        self.params = self._replicate(self.params)
        self.opt_state = self._replicate(self.opt_state)
        start_epoch = int(checkpoint[self.ckpt.CHECKPOINT_EPOCH_KEY]) + 1
        with open(self.ckpt.checkpoints_meta_path) as f:
            meta = json.load(f)
        ens_meta = meta.get("ensemble", {})
        saved_seeds = ens_meta.get("seeds")
        if saved_seeds is not None and list(saved_seeds) != list(self.seeds):
            raise ValueError(
                f"Checkpoint was written for seeds {saved_seeds}, "
                f"this trainer has seeds {list(self.seeds)}"
            )
        self.histories = [LossHistory() for _ in self.seeds]
        for epoch_key in sorted(ens_meta.get("history", {}), key=int):
            # Entries at/after the resume epoch (an early-stopped fit with
            # checkpoint_every can record meta past the last params file)
            # would be re-trained -- drop them so index == epoch holds.
            if int(epoch_key) >= start_epoch:
                continue
            per_seed = ens_meta["history"][epoch_key]
            for i, hist in enumerate(self.histories):
                hist.concat(
                    dict(train=per_seed["train"][i], val=per_seed["val"][i])
                )
        best_val = ens_meta.get("best_val_per_seed", {})
        best_epoch = meta.get("best_per_seed", {})
        self.best_val = np.array(
            [float(best_val.get(str(s), np.inf)) for s in self.seeds]
        )
        self.best_epoch = np.array(
            [int(best_epoch.get(str(s), -1)) for s in self.seeds], dtype=int
        )
        self._reconstruct_best_params()
        return start_epoch

    def _reconstruct_best_params(self) -> None:
        """Rebuild the stacked per-seed BEST snapshot: for every distinct
        best epoch, load that epoch's (stacked) checkpoint and merge the
        seeds whose best it is."""
        from flax import serialization

        if (self.best_epoch < 0).all():
            self.best_params = None
            return
        # A merged-best payload (written once at fit end under
        # checkpoint_every > 1) replaces the per-epoch file walk when its
        # recorded best epochs match the meta -- and is the only source
        # when intermediate files were skipped.
        merged = self.ckpt.load_best_merged()
        if merged is not None and [
            int(e) for e in merged.get("best_epoch_per_seed", [])
        ] == [int(e) for e in self.best_epoch]:
            self.best_params = self._replicate(
                serialization.from_state_dict(
                    self.params, merged[self.ckpt.CHECKPOINT_STATE_DICT_KEY]
                )
            )
            return
        best = jax.tree.map(jnp.copy, self.params)
        for e in sorted({int(x) for x in self.best_epoch if x >= 0}):
            try:
                payload = self.ckpt.load_checkpoint_at(e)
            except FileNotFoundError:
                logger.warning(
                    "Best-epoch checkpoint %d missing (checkpoint_every "
                    "skipped it and no up-to-date merged-best payload "
                    "exists -- interrupted fit?); the affected seeds keep "
                    "their current params as 'best'.", e,
                )
                continue
            p_e = self._replicate(
                serialization.from_state_dict(
                    self.params, payload[self.ckpt.CHECKPOINT_STATE_DICT_KEY]
                )
            )
            mask = jnp.asarray(self.best_epoch == e)

            def merge(b, cur, m=mask):
                return jnp.where(m.reshape((-1,) + (1,) * (cur.ndim - 1)), cur, b)

            best = jax.tree.map(merge, best, p_e)
        self.best_params = best

    def _update_best(self, improved: np.ndarray, epoch: int) -> None:
        """Merge the improved seeds' current params into the best snapshot."""
        mask = jnp.asarray(improved)

        def merge(best, cur):
            m = mask.reshape((-1,) + (1,) * (cur.ndim - 1))
            return jnp.where(m, cur, best)

        if self.best_params is None:
            self.best_params = jax.tree.map(jnp.copy, self.params)
        else:
            self.best_params = jax.tree.map(merge, self.best_params, self.params)
        self.best_epoch = np.where(improved, epoch, self.best_epoch)

    def load_best(self) -> None:
        """Install the per-seed best-val params (stacked BEST_EPOCH reload)."""
        if self.best_params is not None:
            self.params = jax.tree.map(jnp.copy, self.best_params)

    def _save_checkpoint(self, epoch, train_losses, val_losses, improved) -> None:
        from ..train.trainer import host_snapshot

        params_h, opt_h = host_snapshot(
            (self.params, self.opt_state), self.mesh
        )
        self._write_checkpoint(
            params_h, opt_h, epoch, train_losses, val_losses, improved
        )

    def _write_checkpoint(
        self, params_h, opt_h, epoch, train_losses, val_losses, improved
    ) -> None:
        """File writes for one epoch from already-fetched host trees (the
        blocked path slices them out of one packed block fetch)."""
        self.ckpt.save_checkpoint(
            params_h,
            opt_h,
            epoch,
            dict(train=float(np.mean(train_losses)), val=float(np.mean(val_losses))),
            best=bool(np.any(improved)),
        )
        self._write_meta(epoch, train_losses, val_losses)

    def _write_meta(self, epoch, train_losses, val_losses) -> None:
        """The JSON-meta half of a checkpoint: per-seed losses for this
        epoch plus the up-to-date best metadata.  Written for EVERY epoch
        -- even those whose params file ``checkpoint_every`` skips -- so
        restored histories stay dense (index == epoch) and the merged-best
        payload's recorded epochs always match the meta."""
        self.ckpt.save_checkpoints_meta(
            {
                "best_per_seed": {
                    str(s): int(e) for s, e in zip(self.seeds, self.best_epoch)
                },
                # Everything LAST_EPOCH resume needs beyond the stacked
                # params/opt_state payload: per-seed losses per epoch and
                # the per-seed best val losses.
                "ensemble": {
                    "seeds": [int(s) for s in self.seeds],
                    "best_val_per_seed": {
                        str(s): float(v)
                        for s, v in zip(self.seeds, self.best_val)
                        if np.isfinite(v)
                    },
                    "history": {
                        str(epoch): {
                            "train": [float(v) for v in train_losses],
                            "val": [float(v) for v in val_losses],
                        }
                    },
                },
            }
        )
