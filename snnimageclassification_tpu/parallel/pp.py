"""Pipeline parallelism: layer-per-stage GPipe microbatching over ICI.

The reference iterates its layers in one process on one device
(src/modules/snn.py:211-213); ``parallel/mesh.py`` and ``parallel/tp.py``
add the data- and tensor-parallel axes.  This module adds the third:
**pipeline parallelism** -- each device (pipeline stage) holds ONE layer
and microbatches flow through the stages GPipe-style, so a model whose
layer stack outgrows one chip's HBM (or whose per-layer time scans can
overlap) spreads over a ``("data", "pipe")`` mesh.

Design (``shard_map`` over a 2-D mesh, SPMD):

* stage ``s`` holds layer ``s`` of ``cfg.layer_configs`` (hidden layers
  then the readout), its weights padded to uniform ``(F_max, H_max)``
  shapes so every stage runs identical code -- zero-padding is exact:
  padded rows/columns carry zero activations, produce zero gradients, and
  stay bitwise zero through Adam + L2 (zero grad -> zero moments -> zero
  update);
* inter-layer dependency is the *full time trace* (layer ``l`` scans over
  ``T`` only after layer ``l-1``'s whole trace exists -- snn.py:211-213
  semantics), so the pipeline unit is a **microbatch**: at tick ``t``
  stage ``s`` simulates microbatch ``t - s`` (bubble otherwise) and
  ``ppermute``s its output trace to stage ``s+1`` over ICI;
* a ``lax.scan`` over ``n_micro + n_stages - 1`` ticks keeps the schedule
  compiler-friendly (one compiled tick body, no Python unrolling); bubble
  ticks compute on zero traces (finite; their outputs are never read and
  carry zero cotangents);
* the last stage reduces its readout trace to logits (temporal max,
  models/snn.py prediction_logits) and accumulates them per microbatch;
  the loss ``psum``s over both axes with an ``is_last`` mask, which keeps
  the global function well-defined under ``check_vma=False`` and makes
  autodiff produce the DP gradient all-reduce over "data" plus the
  reverse-``ppermute`` activation-cotangent flow over "pipe";
* the batch axis is sharded over "data" exactly as in ``mesh.py``, so
  DP x PP composes in one ``shard_map``.

Numerics: padding changes only the *length* of contractions (extra exact
zeros), so results match the single-device oracle to f32-reassociation
ULPs; ``tests/test_pp.py`` pins forward/grad/train-step parity on the
virtual 8-device CPU mesh and ``__graft_entry__.dryrun_multichip`` runs
the (dp x pp) step as part of the driver contract.
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

__all__ = [
    "PIPE_AXIS",
    "make_pp_mesh",
    "pp_stack_params",
    "pp_unstack_params",
    "pp_param_specs",
    "shard_params_pp",
    "make_pp_forward",
    "make_pp_loss_fn",
    "make_pp_loss_logits_fn",
    "make_pp_train_step",
    "pp_param_labels",
]

DATA_AXIS = "data"
PIPE_AXIS = "pipe"


def make_pp_mesh(
    n_data: int,
    n_stages: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(n_data, n_stages) mesh with axes ("data", "pipe").

    On real hardware order the devices so consecutive "pipe" neighbours
    share an ICI link -- every tick moves one (T, B_mb, F_max) trace one
    hop along that axis.
    """
    if devices is None:
        devices = jax.devices()
    need = n_data * n_stages
    if need > len(devices):
        raise ValueError(
            f"mesh ({n_data}, {n_stages}) needs {need} devices, have "
            f"{len(devices)}"
        )
    arr = np.asarray(devices[:need]).reshape(n_data, n_stages)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


# ---------------------------------------------------------------------------
# Static stage geometry
# ---------------------------------------------------------------------------
def _geometry(cfg: SNNConfig):
    """(layer_cfgs, F_max, H_max): uniform padded stage dimensions."""
    layer_cfgs = cfg.layer_configs
    f_max = max(lcfg.input_size for _, lcfg in layer_cfgs)
    h_max = max(lcfg.output_size for _, lcfg in layer_cfgs)
    return layer_cfgs, f_max, h_max


def _hidden_template(cfg: SNNConfig):
    """The shared hidden-layer config, size fields normalized away.

    All hidden stages run one compiled step body, so their dynamics
    (alpha/rho/threshold/spike_fn/...) must agree; only sizes may differ.
    """
    layer_cfgs = cfg.layer_configs
    hidden = [lcfg for _, lcfg in layer_cfgs[:-1]]
    norm = [
        dataclasses.replace(lcfg, input_size=0, output_size=0)
        for lcfg in hidden
    ]
    if any(n != norm[0] for n in norm[1:]):
        raise ValueError(
            "pipeline parallelism runs all hidden stages through one "
            "compiled body; hidden layers must share dynamics (only "
            "input/output sizes may differ)"
        )
    return hidden[0]


def _validate(cfg: SNNConfig, mesh: Mesh) -> None:
    if PIPE_AXIS not in mesh.axis_names or DATA_AXIS not in mesh.axis_names:
        raise ValueError(
            f"pipeline parallelism needs a ('{DATA_AXIS}', '{PIPE_AXIS}') "
            f"mesh (make_pp_mesh); got axes {mesh.axis_names}"
        )
    n_layers = len(cfg.layer_configs)
    if mesh.shape[PIPE_AXIS] != n_layers:
        raise ValueError(
            f"config has {n_layers} layers (one per stage) but the pipe "
            f"axis has {mesh.shape[PIPE_AXIS]} devices"
        )
    _hidden_template(cfg)  # raises on heterogeneous hidden dynamics
    if not isinstance(cfg.layer_configs[-1][1], ReadoutConfig):
        raise ValueError("last layer must be the readout")


# ---------------------------------------------------------------------------
# Stacked padded parameters
# ---------------------------------------------------------------------------
def _pad2(a, rows, cols):
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))


def pp_stack_params(cfg: SNNConfig, params) -> Dict[str, jax.Array]:
    """models.snn params -> stage-stacked padded arrays.

    Returns ``{"w_in": (S, F_max, H_max), "w_rec": (S, H_max, H_max),
    "b": (S, H_max), "beta": (S,)}``; absent leaves (no recurrence /
    no bias / fixed beta) are zero slabs, which the schedule provably
    never reads.
    """
    layer_cfgs, f_max, h_max = _geometry(cfg)
    w_in, w_rec, b, beta = [], [], [], []
    for name, lcfg in layer_cfgs:
        group = params[name]
        w_in.append(_pad2(jnp.asarray(group["w_in"]), f_max, h_max))
        if "w_rec" in group:
            w_rec.append(_pad2(jnp.asarray(group["w_rec"]), h_max, h_max))
        else:
            w_rec.append(jnp.zeros((h_max, h_max), jnp.float32))
        if "b" in group:
            b.append(jnp.pad(jnp.asarray(group["b"]), (0, h_max - lcfg.output_size)))
        else:
            b.append(jnp.zeros((h_max,), jnp.float32))
        beta.append(
            jnp.asarray(group["beta"], jnp.float32)
            if "beta" in group
            else jnp.zeros((), jnp.float32)
        )
    return {
        "w_in": jnp.stack(w_in),
        "w_rec": jnp.stack(w_rec),
        "b": jnp.stack(b),
        "beta": jnp.stack(beta),
    }


def pp_unstack_params(cfg: SNNConfig, stacked) -> Dict[str, Dict[str, jax.Array]]:
    """Inverse of :func:`pp_stack_params` (slices the real shapes back)."""
    params: Dict[str, Dict[str, jax.Array]] = {}
    for s, (name, lcfg) in enumerate(cfg.layer_configs):
        fi, fo = lcfg.input_size, lcfg.output_size
        group = {"w_in": stacked["w_in"][s, :fi, :fo]}
        if getattr(lcfg, "use_recurrent_connection", False):
            group["w_rec"] = stacked["w_rec"][s, :fo, :fo]
        if isinstance(lcfg, ReadoutConfig):
            group["b"] = stacked["b"][s, :fo]
        if type(lcfg) is ALIFConfig and lcfg.learn_beta:
            group["beta"] = stacked["beta"][s]
        params[name] = group
    return params


def pp_param_labels(stacked) -> Dict[str, str]:
    """Optimizer labels for the stacked pytree (beta frozen, quirk Q3)."""
    return {k: ("beta" if k == "beta" else "weight") for k in stacked}


def pp_param_specs() -> Dict[str, P]:
    """PartitionSpecs: every stacked leaf is stage-sharded over "pipe"."""
    return {k: P(PIPE_AXIS) for k in ("w_in", "w_rec", "b", "beta")}


def shard_params_pp(mesh: Mesh, cfg: SNNConfig, params):
    """Stack+pad models.snn params and place them stage-sharded."""
    stacked = pp_stack_params(cfg, params)
    return jax.device_put(
        stacked,
        {k: NamedSharding(mesh, s) for k, s in pp_param_specs().items()},
    )


# ---------------------------------------------------------------------------
# SPMD stage body + GPipe schedule
# ---------------------------------------------------------------------------
def _fit_width(x: jax.Array, width: int) -> jax.Array:
    """Pad or slice the last axis to ``width`` (pure reshaping, exact)."""
    w = x.shape[-1]
    if w == width:
        return x
    if w > width:
        return x[..., :width]
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, width - w)])


def _stage_apply(cfg, h_tmpl, ro_cfg, stage, n_stages, lp, act_in):
    """One stage's work on one microbatch trace.

    ``act_in``: (T, B_mb, F_max) input trace.  Returns
    ``(act_out (T, B_mb, F_max), logits (B_mb, n_out), counts (B_mb,
    H_max))`` -- the hidden branch emits its spike trace, zero logits,
    and its per-sample per-neuron spike counts (the spike-regularizer
    carrier, reference snn.py:268,401-408); the readout branch (selected
    by ``lax.cond`` on the stage index) zero trace/counts and real
    logits.  Both branches are compiled once; only one executes per tick
    (XLA dead-code-eliminates the count sum when the caller drops it).
    """
    _, f_max, h_max = _geometry(cfg)
    n_out = ro_cfg.output_size
    t_steps, b_mb = act_in.shape[0], act_in.shape[1]
    cur_tm = act_in @ lp["w_in"]  # (T, B_mb, H_max): the stage's matmul

    def hidden_branch(cur_tm):
        lcfg = dataclasses.replace(h_tmpl, input_size=f_max, output_size=h_max)
        step_fn = STEP_FNS[type(lcfg)]
        w_rec = lp["w_rec"]
        if lcfg.use_recurrent_connection and lcfg.use_rec_eye_mask:
            w_rec = w_rec * (1.0 - jnp.eye(h_max, dtype=w_rec.dtype))
        lparams = {"beta": lp["beta"]}

        def step(state, cur_t):
            out, new_state = step_fn(
                lcfg, lparams, state, cur_t,
                w_rec_eff=w_rec if lcfg.use_recurrent_connection else None,
                precomputed_input_current=True,
            )
            return new_state, out

        if cfg.remat:
            step = jax.checkpoint(step)
        state0 = INIT_STATE_FNS[type(lcfg)](lcfg, b_mb, cur_tm.dtype)
        _, z_tm = jax.lax.scan(step, state0, cur_tm)
        # Counts from the full-width trace (padded columns never spike:
        # zero weights -> zero currents -> delta stays -threshold < 0).
        counts = jnp.sum(z_tm.astype(jnp.float32), axis=0)  # (B_mb, H_max)
        return (
            _fit_width(z_tm, f_max),
            jnp.zeros((b_mb, n_out), cur_tm.dtype),
            counts,
        )

    def readout_branch(cur_tm):
        b_vec = lp["b"]

        def step(v, cur_t):
            v = ro_cfg.kappa * v + cur_t + b_vec
            return v, v

        _, trace_tm = jax.lax.scan(
            step, jnp.zeros((b_mb, h_max), cur_tm.dtype), cur_tm
        )
        trace = jnp.swapaxes(trace_tm, 0, 1)[..., :n_out]  # (B_mb, T, O)
        logits = model_lib.prediction_logits(cfg, trace)
        return (
            jnp.zeros((t_steps, b_mb, f_max), cur_tm.dtype),
            logits,
            jnp.zeros((b_mb, h_max), jnp.float32),
        )

    return jax.lax.cond(stage == n_stages - 1, readout_branch, hidden_branch, cur_tm)


def _pp_forward_local(cfg, n_micro, enc, stacked, x, w=None):
    """Shard-local GPipe schedule: (B_loc, ...) inputs -> (B_loc, O) logits.

    Runs INSIDE shard_map on the ("data", "pipe") mesh.  ``stacked``
    leaves carry a leading local stage axis of length 1 (stage-sharded).

    ``w`` (per-sample weights, data-sharded): when given, additionally
    return the stage's WEIGHTED per-neuron spike-count vector
    ``c_loc[h] = sum_{mb, b} w_b * counts[b, h]`` (float32, (H_max,)) --
    the shard-local carrier for the count-based spike regularizers.
    Stage ``s`` processes microbatch ``m = t - s`` at tick ``t``
    (standard GPipe); warm-up/drain ticks are masked out.
    """
    layer_cfgs, f_max, _ = _geometry(cfg)
    n_stages = len(layer_cfgs)
    h_tmpl = _hidden_template(cfg)
    ro_cfg = layer_cfgs[-1][1]
    n_out = ro_cfg.output_size
    stage = jax.lax.axis_index(PIPE_AXIS)
    lp = jax.tree.map(lambda a: a[0], stacked)  # squeeze the local stage axis

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
    # (M, T, B_mb, F_max): time-major microbatch traces.
    x_mb = _fit_width(
        jnp.swapaxes(x.reshape(n_micro, b_mb, t_steps, -1), 1, 2), f_max
    )

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    apply_stage = partial(_stage_apply, cfg, h_tmpl, ro_cfg, stage, n_stages)
    _, _, h_max = _geometry(cfg)
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
        # This tick's microbatch on this stage (warm-up/drain masked).
        m_in = t - stage
        valid = jnp.logical_and(m_in >= 0, m_in < n_micro)
        wv = jax.lax.dynamic_index_in_dim(
            w_mb, jnp.clip(m_in, 0, n_micro - 1), axis=0, keepdims=False
        ) * valid.astype(jnp.float32)
        c_acc = c_acc + wv @ counts
        return (recv, out, c_acc), None

    carry0 = (
        jnp.zeros((t_steps, b_mb, f_max), x.dtype),
        jnp.zeros((n_micro, b_mb, n_out), x.dtype),
    )
    if w is not None:
        carry0 = (*carry0, jnp.zeros((h_max,), jnp.float32))
    carry, _ = jax.lax.scan(
        tick, carry0, jnp.arange(n_micro + n_stages - 1)
    )
    out = carry[1]
    # Only the last stage's buffer is real; broadcast it along "pipe" so
    # the output is well-defined replicated (psum of the masked buffer).
    out = jax.lax.psum(
        jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out)), PIPE_AXIS
    )
    logits = out.reshape(b_loc, n_out)
    if w is not None:
        return logits, carry[2]
    return logits


def make_pp_forward(cfg: SNNConfig, mesh: Mesh, enc=None, n_micro: int = None):
    """jitted ``(stacked_params, x) -> logits`` with layer-pipeline
    parallelism over "pipe" and batch sharding over "data".

    ``stacked_params`` per :func:`shard_params_pp`; ``n_micro`` defaults
    to ``2 * n_stages`` (a reasonable bubble fraction), must divide the
    per-data-shard batch.
    """
    _validate(cfg, mesh)
    if n_micro is None:
        n_micro = 2 * mesh.shape[PIPE_AXIS]
    fwd = jax.shard_map(
        partial(_pp_forward_local, cfg, n_micro, enc),
        mesh=mesh,
        in_specs=(pp_param_specs(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(fwd)


def _check_pp_reg(cfg: SNNConfig, reg):
    """Validate/normalize a count-based regularizer for the PP paths.

    Returns the reg to use (None when the reference's count filter makes
    the term identically zero: its ``isinstance(layer, LIFLayer)`` check,
    snn.py:268, excludes Izhikevich)."""
    if reg is None:
        return None
    from ..ops.cells import ALIFConfig, LIFConfig

    if getattr(reg, "kind", None) not in ("l1", "l2"):
        raise ValueError(
            "pipeline parallelism supports count-based spike regularizers "
            "only (losses.L1TotalSpikeCount / L2SpikesPerNeuron); got "
            f"{reg!r}"
        )
    if type(_hidden_template(cfg)) not in (LIFConfig, ALIFConfig):
        return None
    return reg


def _pp_reg_term(cfg, reg, c_loc, stage):
    """Scalar spike-reg term from the stage-local weighted count vector.

    ``c_loc``: (H_max,) = sum_b w_b * counts[b, h] over THIS data shard's
    samples for THIS stage's layer.  Matches ``reg.from_counts`` on the
    gathered counts exactly: the full-batch weighted counts are the psum
    over "data" (BEFORE the l2 square), each hidden layer contributes its
    own term once via the psum over "pipe" (the readout stage's counts
    are identically zero), and l2's per-layer mean divides by the REAL
    layer width (padded neurons never spike).
    """
    layer_cfgs, _, _ = _geometry(cfg)
    n_stages = len(layer_cfgs)
    c_full = jax.lax.psum(c_loc, DATA_AXIS)
    if reg.kind == "l1":
        local = jnp.sum(c_full)
    else:  # l2 (validated in _check_pp_reg)
        widths = jnp.asarray(
            [lcfg.output_size for _, lcfg in layer_cfgs[:-1]] + [1],
            jnp.float32,
        )
        local = jnp.sum(c_full**2) / jnp.take(widths, stage)
    local = jnp.where(stage < n_stages - 1, local, 0.0)
    return reg.scale * jax.lax.psum(local, PIPE_AXIS)


def _pp_loss_logits_local(cfg, n_micro, enc, reg, stacked, x, y, w):
    if reg is None:
        logits = _pp_forward_local(cfg, n_micro, enc, stacked, x)
    else:
        logits, c_loc = _pp_forward_local(cfg, n_micro, enc, stacked, x, w)
    per = optax.softmax_cross_entropy_with_integer_labels(logits, y)
    # psum over BOTH axes: the pipe-axis replication cancels in the ratio
    # (every stage holds identical logits after the in-forward psum), and
    # it keeps cotangents for the stage-sharded params well-defined under
    # check_vma=False -- the transpose yields the DP all-reduce over
    # "data" and reverse-ppermute flows over "pipe".
    num = jax.lax.psum(jnp.sum(per * w), (DATA_AXIS, PIPE_AXIS))
    den = jax.lax.psum(jnp.sum(w), (DATA_AXIS, PIPE_AXIS))
    loss = num / jnp.maximum(den, 1.0)
    if reg is not None:
        loss = loss + _pp_reg_term(
            cfg, reg, c_loc, jax.lax.axis_index(PIPE_AXIS)
        )
    return loss, logits


def _pp_loss_local(cfg, n_micro, enc, reg, stacked, x, y, w):
    return _pp_loss_logits_local(cfg, n_micro, enc, reg, stacked, x, y, w)[0]


def make_pp_loss_fn(cfg: SNNConfig, mesh: Mesh, enc=None, n_micro: int = None,
                    reg=None):
    """``(stacked_params, x, y, w) -> scalar weighted-NLL`` (differentiable).

    ``reg``: optional COUNT-based spike regularizer object
    (losses.L1TotalSpikeCount / L2SpikesPerNeuron); the term is computed
    shard-aware from stage-local weighted counts (:func:`_pp_reg_term`)
    and equals the single-device ``reg.from_counts`` value.
    """
    _validate(cfg, mesh)
    if n_micro is None:
        n_micro = 2 * mesh.shape[PIPE_AXIS]
    return jax.shard_map(
        partial(_pp_loss_local, cfg, n_micro, enc, _check_pp_reg(cfg, reg)),
        mesh=mesh,
        in_specs=(pp_param_specs(),) + (P(DATA_AXIS),) * 3,
        out_specs=P(),
        check_vma=False,
    )


def make_pp_loss_logits_fn(cfg: SNNConfig, mesh: Mesh, enc=None,
                           n_micro: int = None, reg=None):
    """``(stacked_params, x, y, w) -> (loss, logits)`` under shard_map.

    The same weighted-NLL loss as :func:`make_pp_loss_fn` (exactly the
    Trainer's default criterion, plus the optional count-based spike-reg
    term) plus the gathered ``(B, n_out)`` logits -- the Trainer's eval
    path needs both from one forward.  Differentiable via
    ``has_aux=True``.
    """
    _validate(cfg, mesh)
    if n_micro is None:
        n_micro = 2 * mesh.shape[PIPE_AXIS]
    return jax.shard_map(
        partial(_pp_loss_logits_local, cfg, n_micro, enc,
                _check_pp_reg(cfg, reg)),
        mesh=mesh,
        in_specs=(pp_param_specs(),) + (P(DATA_AXIS),) * 3,
        out_specs=(P(), P(DATA_AXIS)),
        check_vma=False,
    )


def make_pp_train_step(
    cfg: SNNConfig,
    mesh: Mesh,
    tx: optax.GradientTransformation,
    enc=None,
    n_micro: int = None,
    donate: bool = True,
    reg=None,
):
    """jitted full training step over the ("data", "pipe") mesh.

    ``(stacked_params, opt_state, x, y, w) -> (params, opt_state, loss)``;
    build ``tx`` with :func:`pp_param_labels` so the ALIF beta slab stays
    frozen (quirk Q3).  The optimizer update is elementwise, so GSPMD
    keeps every state leaf stage-sharded without annotations.
    """
    loss_fn = make_pp_loss_fn(cfg, mesh, enc, n_micro, reg=reg)

    def train_step(params, opt_state, x, y, w):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, w)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(train_step, donate_argnums=(0, 1) if donate else ())
