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

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.datasets import ArrayDataLoader, EncodeConfig
from ..models import snn as model_lib
from ..models.config import SNNConfig
from ..train.trainer import _encode_on_device, make_optimizer, nll_loss

__all__ = ["init_ensemble", "EnsembleTrainer"]


def init_ensemble(cfg: SNNConfig, seeds: Sequence[int]):
    """Stacked params: every leaf gains a leading ``n_seeds`` axis."""
    keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
    return jax.vmap(lambda k: model_lib.init(cfg, k))(keys)


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
        mesh=None,
    ):
        self.cfg = cfg
        self.seeds = tuple(seeds)
        self.mesh = mesh
        self.params = init_ensemble(cfg, seeds)
        labels = model_lib.param_labels(cfg, jax.tree.map(lambda x: x[0], self.params))
        self.tx = make_optimizer(labels, lr=lr, weight_decay=weight_decay)
        self.opt_state = jax.vmap(self.tx.init)(self.params)
        if mesh is not None:
            from .mesh import replicated

            repl = replicated(mesh)
            self.params = jax.device_put(self.params, repl)
            self.opt_state = jax.device_put(self.opt_state, repl)
        self._steps = {}
        # Same host->device economics as Trainer: keep small datasets in
        # HBM and gather batches on device by index (single-device only).
        from ..data.device_cache import DeviceDataCache

        self.device_data = DeviceDataCache()

    def _build(self, enc: EncodeConfig):
        cfg, tx = self.cfg, self.tx

        def one_replica_grads(params, inputs, y, w):
            def loss_fn(p):
                logits = model_lib.forward_logits(cfg, p, inputs)
                return nll_loss(logits, y, w)

            return jax.value_and_grad(loss_fn)(params)

        def train_step(params, opt_state, x, y, w):
            inputs = _encode_on_device(x, enc)  # encoded once, shared
            losses, grads = jax.vmap(
                one_replica_grads, in_axes=(0, None, None, None)
            )(params, inputs, y, w)
            updates, opt_state = jax.vmap(tx.update)(grads, opt_state, params)
            params = jax.vmap(optax.apply_updates)(params, updates)
            return params, opt_state, losses

        def eval_step(params, x, y):
            inputs = _encode_on_device(x, enc)
            logits = jax.vmap(
                lambda p: model_lib.forward_logits(cfg, p, inputs)
            )(params)
            preds = jnp.argmax(logits, axis=-1)  # (n_seeds, B)
            return preds

        if self.mesh is not None:
            from .mesh import batch_sharded, replicated

            repl, bsh = replicated(self.mesh), batch_sharded(self.mesh)
            train = jax.jit(
                train_step,
                in_shardings=(repl, repl, bsh, bsh, bsh),
                out_shardings=(repl, repl, repl),
                donate_argnums=(0, 1),
            )
            evals = jax.jit(eval_step, in_shardings=(repl, bsh, bsh))
        else:
            train = jax.jit(train_step, donate_argnums=(0, 1))
            evals = jax.jit(eval_step)
        return train, evals

    def _steps_for(self, enc: EncodeConfig):
        if enc not in self._steps:
            self._steps[enc] = self._build(enc)
        return self._steps[enc]

    def _prep(self, x, y):
        if self.mesh is None:
            return x, y, np.ones((x.shape[0],), np.float32)
        from .mesh import pad_to_multiple, shard_batch

        x, w = pad_to_multiple(np.asarray(x), self.mesh.size)
        y, _ = pad_to_multiple(np.asarray(y), self.mesh.size)
        return shard_batch(self.mesh, x, y, w)

    def _batches(self, loader: ArrayDataLoader):
        if self.mesh is None and self.device_data.fits(loader):
            yield from self.device_data.batches(loader)
            return
        for x, y in loader:
            yield self._prep(x, y)

    def train_epoch(self, loader: ArrayDataLoader) -> np.ndarray:
        """One epoch over the loader; returns mean loss per seed."""
        step = self._steps_for(loader.encode_config)[0]
        losses = []
        for xb, yb, wb in self._batches(loader):
            self.params, self.opt_state, batch_losses = step(
                self.params, self.opt_state, xb, yb, wb
            )
            losses.append(batch_losses)
        return np.mean(np.asarray(jnp.stack(losses)), axis=0)

    def accuracies(self, loader: ArrayDataLoader) -> np.ndarray:
        """Per-seed accuracy over the loader."""
        evals = self._steps_for(loader.encode_config)[1]
        correct = np.zeros(len(self.seeds))
        total = 0
        for xb, yb, wb in self._batches(loader):
            preds = evals(self.params, xb, yb)  # (n_seeds, B)
            correct += np.asarray(
                jnp.sum((preds == yb[None]) * wb[None], axis=1)
            )
            total += int(jnp.sum(wb))
        return correct / max(total, 1)
