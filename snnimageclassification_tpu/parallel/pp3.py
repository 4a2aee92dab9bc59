"""Combined 3-D parallelism: (data, pipe, model) — DP x PP x TP in one step.

The reference is strictly single-device (src/modules/snn.py:141-147);
``parallel/mesh.py`` added the data axis, ``parallel/tp.py`` Megatron-style
hidden-column sharding, ``parallel/pp.py`` layer-per-stage GPipe.  This
module composes all three over ONE ``shard_map`` on a 3-D
``Mesh((n_data, n_stages, n_model), ("data", "pipe", "model"))`` — the
shape a real pod slice runs: batch sharded over "data", one layer per
"pipe" stage, and each stage's neurons column-sharded over "model".

Layout (extends ``pp.py``'s stage-stacked padded params):

* ``w_in (S, F3, H3)`` / ``w_rec (S, H3, H3)``: stage-sharded on axis 0
  over "pipe" AND column-sharded on the last axis over "model" — each
  device holds one stage's ``(F3, H3 / n_model)`` column block;
* ``b (S, H3)`` sharded ``("pipe", "model")``; ``beta (S,)`` over "pipe";
* padded dims ``F3 / H3`` are ``pp.py``'s uniform stage dims rounded up
  to a multiple of ``n_model`` (extra exact-zero rows/cols, same
  argument as pp.py's padding: zero activations, zero gradients,
  bitwise-zero through Adam).

Schedule = GPipe ticks exactly as ``pp.py``; within a tick each stage's
work is tensor-parallel exactly as ``tp.py``:

* the stage input trace ``act_in (T, B_mb, F3)`` is replicated over
  "model"; the stage matmul contracts it with the LOCAL ``w_in`` columns
  → shard-local currents ``(T, B_mb, H_loc)``;
* the recurrent matmul ``all_gather``s the ``(B_mb, H_loc)`` spike shard
  over "model" once per simulation step (tp.py's per-step collective);
* the stage output trace is gathered over "model" once per tick and
  ``ppermute``d full-width to the next "pipe" stage.  Gathering BEFORE
  the hop (full-width permute, replicated receive) moves fewer total
  bytes than chunk-permute + receiver re-gather (2·F3 vs 2·F3 + F3/m per
  device-tick) and keeps the receive layout trivially correct;
* the readout stage integrates shard-locally, gathers its trace once at
  the end, and reduces to logits (temporal max) — identical on every
  model shard;
* the loss ``psum``s over all three axes; the pipe x model replication
  cancels in the weighted-mean ratio, and keeping the global function
  well-defined under ``check_vma=False`` makes autodiff produce the DP
  gradient all-reduce over "data", reverse-``ppermute`` cotangent flow
  over "pipe", and ``reduce_scatter``-shaped cotangents for the column
  shards over "model".

Numerics: column sharding splits only matmul *output* columns and the
padding adds exact zeros, so parity vs the single-device oracle holds to
f32-reassociation ULPs (``tests/test_pp3.py`` pins forward, gradients and
a train step on the virtual 8-device CPU mesh as a (2, 2, 2) cube);
``__graft_entry__.dryrun_multichip`` runs the combined step as its
fourth leg.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import snn as model_lib
from ..models.config import SNNConfig
from ..ops.cells import (
    ALIFConfig,
    INIT_STATE_FNS,
    ReadoutConfig,
    STEP_FNS,
)
from ..ops.encoding import encode_spikes
from . import pp as pp_lib
from .pp import DATA_AXIS, PIPE_AXIS, _hidden_template, _validate as _pp_validate

MODEL_AXIS = "model"

__all__ = [
    "make_3d_mesh",
    "pp3_param_specs",
    "pp3_stack_params",
    "pp3_unstack_params",
    "shard_params_pp3",
    "make_pp3_forward",
    "make_pp3_loss_fn",
    "make_pp3_loss_logits_fn",
    "make_pp3_train_step",
    "pp3_param_labels",
]


def make_3d_mesh(
    n_data: int,
    n_stages: int,
    n_model: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(n_data, n_stages, n_model) mesh with ("data", "pipe", "model").

    On real hardware order devices so "model" (the per-simulation-step
    all_gather) rides the fastest ICI links, then "pipe" (one trace hop
    per tick), then "data" (one gradient all-reduce per step).
    """
    if devices is None:
        devices = jax.devices()
    need = n_data * n_stages * n_model
    if need > len(devices):
        raise ValueError(
            f"mesh ({n_data}, {n_stages}, {n_model}) needs {need} "
            f"devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:need]).reshape(n_data, n_stages, n_model)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))


def _roundup(n: int, m: int) -> int:
    return -(-n // m) * m


def _geometry3(cfg: SNNConfig, n_model: int):
    """pp geometry with stage dims rounded up to multiples of n_model."""
    layer_cfgs, f_max, h_max = pp_lib._geometry(cfg)
    return layer_cfgs, _roundup(f_max, n_model), _roundup(h_max, n_model)


def _validate(cfg: SNNConfig, mesh: Mesh) -> None:
    for ax in (DATA_AXIS, PIPE_AXIS, MODEL_AXIS):
        if ax not in mesh.axis_names:
            raise ValueError(
                f"combined parallelism needs a ('{DATA_AXIS}', "
                f"'{PIPE_AXIS}', '{MODEL_AXIS}') mesh (make_3d_mesh); "
                f"got axes {mesh.axis_names}"
            )
    # Reuse pp's stage checks on a 2-D view of the same axis sizes.
    class _Shape:
        axis_names = mesh.axis_names
        shape = mesh.shape
    _pp_validate(cfg, _Shape)


def pp3_param_specs() -> Dict[str, P]:
    """Stage axis over "pipe", weight columns over "model"."""
    return {
        "w_in": P(PIPE_AXIS, None, MODEL_AXIS),
        "w_rec": P(PIPE_AXIS, None, MODEL_AXIS),
        "b": P(PIPE_AXIS, MODEL_AXIS),
        "beta": P(PIPE_AXIS),
    }


def pp3_stack_params(cfg: SNNConfig, params, n_model: int):
    """models.snn params -> stage-stacked padded arrays (pp layout,
    dims rounded up so the "model" axis divides them evenly)."""
    layer_cfgs, f3, h3 = _geometry3(cfg, n_model)
    stacked = pp_lib.pp_stack_params(cfg, params)
    _, f_max, h_max = pp_lib._geometry(cfg)

    def grow(a, rows, cols):
        return jnp.pad(a, ((0, 0), (0, rows - a.shape[1]), (0, cols - a.shape[2])))

    return {
        "w_in": grow(stacked["w_in"], f3, h3),
        "w_rec": grow(stacked["w_rec"], h3, h3),
        "b": jnp.pad(stacked["b"], ((0, 0), (0, h3 - h_max))),
        "beta": stacked["beta"],
    }


def pp3_unstack_params(cfg: SNNConfig, stacked):
    """Inverse of :func:`pp3_stack_params` (slices real shapes back)."""
    return pp_lib.pp_unstack_params(cfg, stacked)


def pp3_param_labels(stacked) -> Dict[str, str]:
    """Optimizer labels (ALIF beta slab frozen — quirk Q3)."""
    return pp_lib.pp_param_labels(stacked)


def shard_params_pp3(mesh: Mesh, cfg: SNNConfig, params):
    """Stack+pad models.snn params and place them (pipe, model)-sharded."""
    _validate(cfg, mesh)
    stacked = pp3_stack_params(cfg, params, mesh.shape[MODEL_AXIS])
    return jax.device_put(
        stacked,
        {k: NamedSharding(mesh, s) for k, s in pp3_param_specs().items()},
    )


def _stage_apply3(cfg, h_tmpl, ro_cfg, stage, n_stages, n_model, lp, act_in):
    """One stage's tensor-parallel work on one microbatch trace.

    ``act_in``: (T, B_mb, F3) full-width input trace (replicated over
    "model"); ``lp`` leaves are the stage's LOCAL column shards.
    Returns ``(act_out (T, B_mb, F3) full-width, logits (B_mb, n_out))``.
    """
    layer_cfgs, f3, h3 = _geometry3(cfg, n_model)
    h_loc = h3 // n_model
    n_out = ro_cfg.output_size
    t_steps, b_mb = act_in.shape[0], act_in.shape[1]
    cur_tm = act_in @ lp["w_in"]  # (T, B_mb, H_loc): local columns

    def hidden_branch(cur_tm):
        lcfg = dataclasses.replace(h_tmpl, input_size=f3, output_size=h_loc)
        step_fn = STEP_FNS[type(lcfg)]
        w_rec_loc = lp["w_rec"]  # (H3, H_loc): local columns of the full H3
        if h_tmpl.use_recurrent_connection and h_tmpl.use_rec_eye_mask:
            # Shard-local eye mask: zero W_rec[i, j] where global col == row.
            j0 = jax.lax.axis_index(MODEL_AXIS) * h_loc
            rows = jnp.arange(h3)[:, None]
            cols = j0 + jnp.arange(h_loc)[None, :]
            w_rec_loc = w_rec_loc * (rows != cols).astype(w_rec_loc.dtype)
        lparams = {"beta": lp["beta"]}

        def step(state, cur_t):
            if h_tmpl.use_recurrent_connection:
                z_full = jax.lax.all_gather(
                    state.z, MODEL_AXIS, axis=1, tiled=True
                )  # (B_mb, H3)
                cur_t = cur_t + z_full @ w_rec_loc
            out, new_state = step_fn(
                lcfg, lparams, state, cur_t,
                w_rec_eff=None, precomputed_input_current=True,
            )
            return new_state, out

        if cfg.remat:
            step = jax.checkpoint(step)
        state0 = INIT_STATE_FNS[type(lcfg)](lcfg, b_mb, cur_tm.dtype)
        _, z_tm_loc = jax.lax.scan(step, state0, cur_tm)  # (T, B_mb, H_loc)
        # Shard-LOCAL per-sample spike counts (the spike-regularizer
        # carrier, reference snn.py:268,401-408): summed over time before
        # the gather, so each model shard reports only its own columns.
        counts = jnp.sum(z_tm_loc.astype(jnp.float32), axis=0)
        # Gather the full trace once per tick, pad to the inter-stage
        # width; the next stage's local columns contract every input row.
        z_tm = jax.lax.all_gather(z_tm_loc, MODEL_AXIS, axis=2, tiled=True)
        return (
            pp_lib._fit_width(z_tm, f3),
            jnp.zeros((b_mb, n_out), cur_tm.dtype),
            counts,
        )

    def readout_branch(cur_tm):
        b_loc = lp["b"]  # (H_loc,) local columns

        def step(v, cur_t):
            v = ro_cfg.kappa * v + cur_t + b_loc
            return v, v

        _, trace_tm_loc = jax.lax.scan(
            step, jnp.zeros((b_mb, h_loc), cur_tm.dtype), cur_tm
        )
        trace_tm = jax.lax.all_gather(
            trace_tm_loc, MODEL_AXIS, axis=2, tiled=True
        )  # (T, B_mb, H3)
        trace = jnp.swapaxes(trace_tm, 0, 1)[..., :n_out]  # (B_mb, T, O)
        logits = model_lib.prediction_logits(cfg, trace)
        return (
            jnp.zeros((t_steps, b_mb, f3), cur_tm.dtype),
            logits,
            jnp.zeros((b_mb, h_loc), jnp.float32),
        )

    return jax.lax.cond(stage == n_stages - 1, readout_branch, hidden_branch, cur_tm)


def _pp3_forward_local(cfg, n_micro, enc, stacked, x, w=None):
    """Shard-local GPipe schedule with tensor-parallel stages.

    Runs INSIDE shard_map on the ("data", "pipe", "model") mesh; same
    tick structure as pp.py's ``_pp_forward_local`` (cited there), with
    each stage's compute column-sharded over "model".  ``w``: see
    pp.py -- when given, additionally return the (H_loc,) weighted
    count vector for this (stage, model-shard)'s neuron columns.
    """
    n_model = jax.lax.axis_size(MODEL_AXIS)
    layer_cfgs, f3, _ = _geometry3(cfg, n_model)
    n_stages = len(layer_cfgs)
    h_tmpl = _hidden_template(cfg)
    ro_cfg = layer_cfgs[-1][1]
    n_out = ro_cfg.output_size
    stage = jax.lax.axis_index(PIPE_AXIS)
    lp = jax.tree.map(lambda a: a[0], stacked)  # squeeze local stage axis

    if enc is not None:
        x = encode_spikes(
            jnp.asarray(x, jnp.float32),
            n_steps=enc.n_steps,
            use_periods=enc.use_periods,
            tau=enc.tau,
            thr=enc.thr,
            epsilon=enc.epsilon,
        )
    x = model_lib.format_inputs(cfg, x, jnp.float32)  # (B_loc, T, F)
    b_loc, t_steps = x.shape[0], x.shape[1]
    if b_loc % n_micro:
        raise ValueError(
            f"per-data-shard batch {b_loc} is not divisible by "
            f"n_micro={n_micro}"
        )
    b_mb = b_loc // n_micro
    x_mb = pp_lib._fit_width(
        jnp.swapaxes(x.reshape(n_micro, b_mb, t_steps, -1), 1, 2), f3
    )  # (M, T, B_mb, F3)

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    apply_stage = partial(
        _stage_apply3, cfg, h_tmpl, ro_cfg, stage, n_stages, n_model
    )
    _, _, h3 = _geometry3(cfg, n_model)
    h_loc = h3 // n_model
    w_mb = (
        w.reshape(n_micro, b_mb).astype(jnp.float32) if w is not None else None
    )

    def tick(carry, t):
        if w is None:
            recv, out = carry
        else:
            recv, out, c_acc = carry
        x0 = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, n_micro - 1), axis=0, keepdims=False
        )
        act_in = jnp.where(stage == 0, x0, recv)
        act_out, logits, counts = apply_stage(lp, act_in)
        m_out = t - (n_stages - 1)
        write = jnp.logical_and(
            stage == n_stages - 1,
            jnp.logical_and(m_out >= 0, m_out < n_micro),
        )
        upd = jax.lax.dynamic_update_index_in_dim(
            out, logits, jnp.clip(m_out, 0, n_micro - 1), axis=0
        )
        out = jnp.where(write, upd, out)
        recv = jax.lax.ppermute(act_out, PIPE_AXIS, perm)
        if w is None:
            return (recv, out), None
        m_in = t - stage  # this tick's microbatch on this stage
        valid = jnp.logical_and(m_in >= 0, m_in < n_micro)
        wv = jax.lax.dynamic_index_in_dim(
            w_mb, jnp.clip(m_in, 0, n_micro - 1), axis=0, keepdims=False
        ) * valid.astype(jnp.float32)
        c_acc = c_acc + wv @ counts
        return (recv, out, c_acc), None

    carry0 = (
        jnp.zeros((t_steps, b_mb, f3), x.dtype),
        jnp.zeros((n_micro, b_mb, n_out), x.dtype),
    )
    if w is not None:
        carry0 = (*carry0, jnp.zeros((h_loc,), jnp.float32))
    carry, _ = jax.lax.scan(
        tick, carry0, jnp.arange(n_micro + n_stages - 1)
    )
    out = carry[1]
    out = jax.lax.psum(
        jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out)), PIPE_AXIS
    )
    logits = out.reshape(b_loc, n_out)
    if w is not None:
        return logits, carry[2]
    return logits


def make_pp3_forward(cfg: SNNConfig, mesh: Mesh, enc=None, n_micro: int = None):
    """jitted ``(stacked_params, x) -> logits`` over the 3-D mesh.

    ``stacked_params`` per :func:`shard_params_pp3`; ``n_micro`` defaults
    to ``2 * n_stages``, must divide the per-data-shard batch.
    """
    _validate(cfg, mesh)
    if n_micro is None:
        n_micro = 2 * mesh.shape[PIPE_AXIS]
    fwd = jax.shard_map(
        partial(_pp3_forward_local, cfg, n_micro, enc),
        mesh=mesh,
        in_specs=(pp3_param_specs(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(fwd)


def _pp3_reg_term(cfg, reg, c_loc, stage):
    """Spike-reg term from the (stage, model-shard)-local weighted count
    vector -- pp.py's ``_pp_reg_term`` with the neuron axis additionally
    sharded over "model": the full-batch weighted counts are the psum
    over "data" (before the l2 square; squares are per-neuron, so they
    stay shard-local), then per-layer terms sum over ("pipe", "model").
    Equals the single-device ``reg.from_counts`` value exactly.
    """
    layer_cfgs = cfg.layer_configs
    n_stages = len(layer_cfgs)
    c_full = jax.lax.psum(c_loc, DATA_AXIS)
    if reg.kind == "l1":
        local = jnp.sum(c_full)
    else:  # l2 (validated by pp_lib._check_pp_reg)
        widths = jnp.asarray(
            [lcfg.output_size for _, lcfg in layer_cfgs[:-1]] + [1],
            jnp.float32,
        )
        local = jnp.sum(c_full**2) / jnp.take(widths, stage)
    local = jnp.where(stage < n_stages - 1, local, 0.0)
    return reg.scale * jax.lax.psum(local, (PIPE_AXIS, MODEL_AXIS))


def _pp3_loss_logits_local(cfg, n_micro, enc, reg, stacked, x, y, w):
    if reg is None:
        logits = _pp3_forward_local(cfg, n_micro, enc, stacked, x)
    else:
        logits, c_loc = _pp3_forward_local(cfg, n_micro, enc, stacked, x, w)
    per = optax.softmax_cross_entropy_with_integer_labels(logits, y)
    # psum over ALL THREE axes: pipe x model replication cancels in the
    # ratio; well-definedness under check_vma=False gives autodiff the DP
    # all-reduce over "data", reverse-ppermute over "pipe", and correct
    # column-shard cotangents over "model" (transpose of the gathers).
    axes = (DATA_AXIS, PIPE_AXIS, MODEL_AXIS)
    num = jax.lax.psum(jnp.sum(per * w), axes)
    den = jax.lax.psum(jnp.sum(w), axes)
    loss = num / jnp.maximum(den, 1.0)
    if reg is not None:
        loss = loss + _pp3_reg_term(
            cfg, reg, c_loc, jax.lax.axis_index(PIPE_AXIS)
        )
    return loss, logits


def _pp3_loss_local(cfg, n_micro, enc, reg, stacked, x, y, w):
    return _pp3_loss_logits_local(
        cfg, n_micro, enc, reg, stacked, x, y, w
    )[0]


def make_pp3_loss_fn(cfg: SNNConfig, mesh: Mesh, enc=None, n_micro: int = None,
                     reg=None):
    """``(stacked_params, x, y, w) -> scalar weighted-NLL`` (differentiable).

    ``reg``: optional COUNT-based spike regularizer object; see
    ``pp.make_pp_loss_fn`` -- the term is shard-aware over all three axes
    (:func:`_pp3_reg_term`) and equals ``reg.from_counts``.
    """
    _validate(cfg, mesh)
    if n_micro is None:
        n_micro = 2 * mesh.shape[PIPE_AXIS]
    return jax.shard_map(
        partial(_pp3_loss_local, cfg, n_micro, enc,
                pp_lib._check_pp_reg(cfg, reg)),
        mesh=mesh,
        in_specs=(pp3_param_specs(),) + (P(DATA_AXIS),) * 3,
        out_specs=P(),
        check_vma=False,
    )


def make_pp3_loss_logits_fn(cfg: SNNConfig, mesh: Mesh, enc=None,
                            n_micro: int = None, reg=None):
    """``(stacked_params, x, y, w) -> (loss, logits)`` under shard_map.

    The same weighted-NLL loss as :func:`make_pp3_loss_fn` (exactly the
    Trainer's default criterion) plus the gathered ``(B, n_out)`` logits
    -- the Trainer's eval path needs both from one forward (same contract
    as ``pp.make_pp_loss_logits_fn``).  Differentiable via
    ``has_aux=True``.
    """
    _validate(cfg, mesh)
    if n_micro is None:
        n_micro = 2 * mesh.shape[PIPE_AXIS]
    return jax.shard_map(
        partial(_pp3_loss_logits_local, cfg, n_micro, enc,
                pp_lib._check_pp_reg(cfg, reg)),
        mesh=mesh,
        in_specs=(pp3_param_specs(),) + (P(DATA_AXIS),) * 3,
        out_specs=(P(), P(DATA_AXIS)),
        check_vma=False,
    )


def make_pp3_train_step(
    cfg: SNNConfig,
    mesh: Mesh,
    tx: optax.GradientTransformation,
    enc=None,
    n_micro: int = None,
    donate: bool = True,
    reg=None,
):
    """jitted full DP x PP x TP training step over the 3-D mesh.

    ``(stacked_params, opt_state, x, y, w) -> (params, opt_state, loss)``;
    build ``tx`` with :func:`pp3_param_labels` so the ALIF beta slab
    stays frozen (quirk Q3).  The optimizer update is elementwise, so
    GSPMD keeps every state leaf (pipe, model)-sharded without help.
    """
    loss_fn = make_pp3_loss_fn(cfg, mesh, enc, n_micro, reg=reg)

    def train_step(params, opt_state, x, y, w):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, w)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(train_step, donate_argnums=(0, 1) if donate else ())
