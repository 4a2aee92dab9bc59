"""Functional SNN model: parameter init, scan-based simulation, logits.

The reference simulates the network with a per-time-step Python loop over
``nn.Module`` layers (snn.py:201-219).  Here the time recurrence is a
single :func:`jax.lax.scan` whose body applies the layer stack in order
(layer-then-time, exactly the reference's ordering, snn.py:209-214), so the
whole T-step BPTT graph is one fused XLA computation:

* The first layer's input-current matmul is *hoisted out of the scan* as
  one large ``(T*B, F) @ (F, H)`` MXU matmul over all time steps -- the
  input spikes are known ahead of time, so there is no reason to issue T
  small matmuls sequentially.
* Recurrent weights are eye-masked once per forward pass
  (ops/cells.masked_recurrent), not per step.
* Optional ``jax.checkpoint`` (remat) on the scan body trades FLOPs for
  BPTT activation memory at large ``batch * T * hidden``.

Everything here is pure: ``params`` is a ``{layer_name: {leaf: array}}``
pytree, states are NamedTuples, configs are static dataclasses.
"""
from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.cells import (
    INIT_PARAM_FNS,
    INIT_STATE_FNS,
    STEP_FNS,
    masked_recurrent,
)
from ..ops.temporal import batchwise_temporal_filter, temporal_max
from .config import ReadoutMth, SNNConfig

__all__ = [
    "init",
    "init_state",
    "format_inputs",
    "apply",
    "prediction_logits",
    "forward_logits",
    "forward_logits_pixels",
    "forward_logits_counts_pixels",
    "explain_dispatch",
    "param_labels",
]

Params = Dict[str, Dict[str, jax.Array]]

logger = logging.getLogger(__name__)
_fallback_logged: set = set()


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _log_fused_fallback(kind: str, reason: str, _level=logging.INFO,
                        **shape) -> None:
    """Loudly (once per distinct config) report that a Pallas fast path
    gated off and the model fell back to the XLA composition.

    The fused kernels are a ~3-8x speedup; a silent fallback (e.g. an
    input width pushing the W_in block past the VMEM budget, or a
    compute_dtype that disables the kernels entirely) would otherwise be
    invisible.  Mirrors the loud synthetic-dataset fallback policy.
    User-chosen config gates (compute_dtype) log at WARNING; shape-budget
    gates at INFO."""
    key = (kind, reason, tuple(sorted(shape.items())))
    if key in _fallback_logged:
        return
    _fallback_logged.add(key)
    detail = ", ".join(f"{k}={v}" for k, v in sorted(shape.items()))
    logger.log(
        _level,
        "Pallas %s kernel unavailable (%s; %s): falling back to the XLA "
        "scan path (identical numerics, lower throughput).",
        kind, reason, detail,
    )


def init(cfg: SNNConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Initialize all layer parameters.

    Init statistics match the reference's two-sweep scheme (model-level
    init then per-layer overrides, snn.py:149-157): hidden-layer weights
    ~ N(0, threshold^2), Izhikevich ~ N(0,1), readout W ~ N(0,1) with zero
    bias, and (quirk) a learnable ALIF beta ~ N(0, threshold^2).
    """
    params: Params = {}
    layer_cfgs = cfg.layer_configs
    keys = jax.random.split(key, len(layer_cfgs))
    for k, (name, lcfg) in zip(keys, layer_cfgs):
        params[name] = INIT_PARAM_FNS[type(lcfg)](lcfg, k, dtype)
    return params


def init_state(cfg: SNNConfig, batch_size: int, dtype=jnp.float32) -> Tuple:
    """Zero (or v_rest, for Izhikevich) initial state tuple, one per layer."""
    return tuple(
        INIT_STATE_FNS[type(lcfg)](lcfg, batch_size, dtype)
        for _, lcfg in cfg.layer_configs
    )


def format_inputs(cfg: SNNConfig, inputs: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Shape inputs to ``(B, T, F)``.

    Parity with snn.py:159-184: 2-D ``(B, F)`` inputs are treated as
    constant over time and repeated across ``int_time_steps``; 3-D inputs
    with fewer time steps are zero-padded at the end of the time axis.
    """
    inputs = jnp.asarray(inputs)
    if inputs.ndim == 2:
        inputs = jnp.broadcast_to(
            inputs[:, None, :], (inputs.shape[0], cfg.int_time_steps, inputs.shape[1])
        )
    if inputs.ndim != 3:
        raise ValueError(
            "inputs must be (batch, features) or (batch, time, features); "
            f"got shape {inputs.shape}"
        )
    t_diff = cfg.int_time_steps - inputs.shape[1]
    if t_diff < 0:
        raise ValueError(
            f"inputs have {inputs.shape[1]} time steps > int_time_steps="
            f"{cfg.int_time_steps}"
        )
    if t_diff > 0:
        pad = jnp.zeros((inputs.shape[0], t_diff, inputs.shape[2]), dtype)
        inputs = jnp.concatenate([inputs.astype(dtype), pad], axis=1)
    return inputs.astype(dtype)


def apply(
    cfg: SNNConfig,
    params: Params,
    inputs: Optional[jax.Array],
    *,
    return_hidden: bool = False,
    initial_state: Optional[Tuple] = None,
    first_layer_currents: Optional[jax.Array] = None,
    first_layer_output: Optional[jax.Array] = None,
    return_spike_counts: bool = False,
    _upto: Optional[int] = None,
):
    """Simulate the network for ``cfg.int_time_steps`` steps.

    ``_upto`` (private, used by the deep fused-head dispatch): process
    layers ``0.._upto`` only and return the last processed layer's
    TIME-MAJOR ``(T, B, width)`` output trace (plus the counts dict when
    ``return_spike_counts``) -- the trunk of a deep network whose last
    hidden layer + readout run in the fused mid-head kernel instead.

    Returns ``(outputs_trace, hidden_states)`` where ``outputs_trace`` is
    the readout trace ``(B, T, output_size)`` (snn.py:218) and
    ``hidden_states`` is ``{layer_name: tuple of (B, T, width) arrays}``
    (snn.py:186-199) when ``return_hidden`` else ``None``.

    ``return_spike_counts`` appends a third return value: a dict
    ``{layer_name: (B, width) float32}`` of per-sample per-neuron spike
    counts (``sum_t z_t``) for LIF/ALIF layers -- the reference's
    ``isinstance(layer, LIFLayer)`` filter (snn.py:268), which excludes
    Izhikevich and the readout.  Every spiking layer's z trace is already
    materialized on this path (it feeds the next layer), so the counts
    are a cheap time reduction, differentiable through the layer kernels'
    z cotangent; fused whole-network heads get their counts from the
    dedicated kernel variants instead (forward_logits_counts_pixels).

    Schedule: because the reference's ordering is layer-then-time
    (snn.py:209-214), layer ``l``'s input at step ``t`` is layer ``l-1``'s
    spike at the *same* step -- so the network factorizes into one scan
    *per layer* over the full time axis.  Each layer becomes

        one big ``(T*B, in) @ (in, out)`` MXU matmul  (input currents)
        + a sequential scan of cheap elementwise dynamics
          (plus the ``(B, out) @ (out, out)`` recurrent matmul, if any)

    instead of one scan whose body interleaves every layer's small
    matmuls.  The math (and therefore BPTT) is identical; the schedule
    keeps the MXU busy and leaves only the irreducible recurrence
    sequential.
    """
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    matmul_dtype = jnp.dtype(cfg.matmul_dtype_eff)
    layer_cfgs = cfg.layer_configs
    if first_layer_output is not None:
        # Layer 0 was fully computed upstream (the fused encode+matmul+
        # scan kernel, ops/pallas_fused.py); its time-major (T,B,H0)
        # spike trace feeds layer 1 directly.
        x = None
        batch = first_layer_output.shape[1]
    elif first_layer_currents is not None:
        # Layer-0 input currents precomputed upstream (e.g. by the fused
        # encode+matmul kernel, ops/pallas_encode.py), time-major (T,B,H0).
        x = None
        batch = first_layer_currents.shape[1]
    else:
        x = format_inputs(cfg, inputs, compute_dtype)  # (B, T, F)
        batch = x.shape[0]

    cparams = jax.tree.map(lambda p: p.astype(compute_dtype), params)
    states0 = (
        initial_state
        if initial_state is not None
        else init_state(cfg, batch, compute_dtype)
    )

    x_tm = None  # layer outputs are time-major; the raw input is (B, T, F)
    hidden_states = {} if return_hidden else None
    counts = {} if return_spike_counts else None

    def _collect_counts(name, lcfg, z_tm):
        if counts is None:
            return
        from ..ops.cells import ALIFConfig, LIFConfig

        if type(lcfg) in (LIFConfig, ALIFConfig):
            counts[name] = jnp.sum(z_tm.astype(jnp.float32), axis=0)

    def mm(a, w):
        """a @ w with cfg.matmul_dtype operands, accumulating in the
        compute dtype (spike operands are 0/1 and exact in bf16)."""
        if matmul_dtype == a.dtype == w.dtype:
            return a @ w
        return jax.lax.dot_general(
            a.astype(matmul_dtype), w.astype(matmul_dtype),
            dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=compute_dtype,
        )

    for idx, (name, lcfg) in enumerate(layer_cfgs):
        if _upto is not None and idx > _upto:
            break
        if idx == 0 and first_layer_output is not None:
            # Keep the kernel's trace dtype (possibly bf16): mm() below
            # handles operand dtypes for the next layer's matmul.
            x_tm = first_layer_output
            _collect_counts(name, lcfg, x_tm)
            continue
        lparams = cparams[name]
        step_fn = STEP_FNS[type(lcfg)]
        w_rec_eff = (
            masked_recurrent(lcfg, lparams)
            if getattr(lcfg, "use_recurrent_connection", False)
            else None
        )
        if w_rec_eff is not None and matmul_dtype != w_rec_eff.dtype:
            w_rec_eff = w_rec_eff.astype(matmul_dtype)
        # Mid-layer fusion: a spiking layer consuming the previous
        # layer's z trace runs its input matmul INSIDE the scan kernel
        # (ops/pallas_fused_mid.py) -- the (T, B, H) currents tensor and
        # its cotangent never exist in HBM.
        if (
            x_tm is not None
            and initial_state is None
            and _mid_layer_fusible(cfg, lcfg, return_hidden)
        ):
            x_tm = _fused_mid_layer(
                cfg, lcfg, lparams, x_tm, w_rec_eff, matmul_dtype
            )
            _collect_counts(name, lcfg, x_tm)
            continue
        # Input currents for ALL time steps in one MXU matmul.  The
        # readout bias is added per-step inside the cell (snn.py:407).
        if x_tm is None and first_layer_currents is not None:
            currents = first_layer_currents.astype(compute_dtype)
        elif x_tm is None:
            # First layer: contract the wide feature axis in the input's
            # native (B, T, F) layout, then transpose the (F/6x smaller)
            # result to time-major.  Transposing the raw (B, T, 784) spike
            # tensor before the matmul measured 5x slower on v5e.
            currents = jnp.swapaxes(mm(x, lparams["w_in"]), 0, 1)  # (T, B, out)
        else:
            currents = mm(x_tm, lparams["w_in"])  # (T, B, out)

        if initial_state is None and _pallas_layer_eligible(cfg, lcfg, return_hidden):
            # (a caller-supplied initial_state must flow through the XLA
            # scan path: the fused kernels hard-zero their state at t=0)
            x_tm = _pallas_layer_scan(cfg, lcfg, lparams, currents, w_rec_eff)
            _collect_counts(name, lcfg, x_tm)
            continue

        def step(state, i_t, _lcfg=lcfg, _lparams=lparams, _step_fn=step_fn,
                 _w_rec_eff=w_rec_eff):
            out, new_state = _step_fn(
                _lcfg, _lparams, state, i_t,
                w_rec_eff=_w_rec_eff, precomputed_input_current=True,
            )
            return new_state, (out, new_state if return_hidden else None)

        if cfg.remat:
            step = jax.checkpoint(step)

        _, (out_tm, states_tm) = jax.lax.scan(step, states0[idx], currents)
        if return_hidden:
            hidden_states[name] = tuple(
                jnp.swapaxes(leaf, 0, 1).astype(jnp.float32) for leaf in states_tm
            )
        x_tm = out_tm  # next layer consumes this layer's full output trace
        _collect_counts(name, lcfg, x_tm)

    if _upto is not None:
        # Trunk mode: the caller (deep fused-head dispatch) consumes the
        # time-major trace directly; keep the kernel trace dtype.
        return (x_tm, counts) if return_spike_counts else x_tm
    outputs_trace = jnp.swapaxes(x_tm, 0, 1).astype(jnp.float32)  # (B, T, out)
    if return_spike_counts:
        return outputs_trace, hidden_states, counts
    return outputs_trace, hidden_states


def _mid_layer_fusible(cfg: SNNConfig, lcfg, return_hidden) -> bool:
    """Run this mid layer's input matmul inside the scan kernel?"""
    from ..ops.cells import ALIFConfig, LIFConfig
    from ..ops.pallas_fused_mid import fused_mid_supported

    if not _pallas_layer_eligible(cfg, lcfg, return_hidden):
        return False
    if type(lcfg) not in (LIFConfig, ALIFConfig):
        return False
    return fused_mid_supported(
        cfg.int_time_steps, lcfg.input_size, lcfg.output_size,
        recurrent=lcfg.use_recurrent_connection,
        itemsize=jnp.dtype(cfg.matmul_dtype_eff).itemsize,
    )


def _fused_mid_layer(cfg: SNNConfig, lcfg, lparams, z_in, w_rec_eff,
                     matmul_dtype) -> jax.Array:
    from ..ops.cells import ALIFConfig
    from ..ops.pallas_fused_mid import fused_mid_ff_scan, fused_mid_rec_scan

    w_in = lparams["w_in"].astype(matmul_dtype)
    alif = type(lcfg) is ALIFConfig
    beta = (
        (lparams["beta"] if lcfg.learn_beta else lcfg.beta) if alif else 0.0
    )
    rho = lcfg.rho if alif else 0.0
    common = (
        cfg.int_time_steps, alif, lcfg.alpha, rho, lcfg.threshold,
        lcfg.gamma, lcfg.spike_func,
    )
    if w_rec_eff is not None:
        return fused_mid_rec_scan(z_in, w_in, w_rec_eff, beta, *common)
    return fused_mid_ff_scan(z_in, w_in, beta, *common)


def _pallas_layer_eligible(cfg: SNNConfig, lcfg, return_hidden) -> bool:
    """Use a fused Pallas time-scan kernel for this layer?

    Covered: LIF/ALIF (feedforward or recurrent) with a static (or absent)
    beta, float32 compute, hidden traces not requested, on a TPU backend.
    Everything else takes the XLA lax.scan path (identical math) -- and
    says so: every gate that fires on a TPU backend logs through
    :func:`_log_fused_fallback` (compute_dtype at WARNING -- it silently
    disabled EVERY kernel before round 5).
    """
    if not cfg.use_pallas or return_hidden:
        if cfg.use_pallas and return_hidden and _on_tpu():
            _log_fused_fallback(
                "layer scan", "hidden traces requested (return_hidden=True)"
            )
        return False
    if jnp.dtype(cfg.compute_dtype) != jnp.float32:
        if _on_tpu():
            _log_fused_fallback(
                "layer scan (ALL kernels)",
                "compute_dtype != float32 disables every Pallas kernel; "
                "for the fast bf16 recipe keep compute_dtype='float32' and "
                "set matmul_dtype='bfloat16' (see PARITY.md)",
                _level=logging.WARNING,
                compute_dtype=str(cfg.compute_dtype),
            )
        return False
    from ..ops.cells import ALIFConfig, IzhikevichConfig, LIFConfig
    from ..ops.pallas_scan import pallas_supported

    if type(lcfg) not in (LIFConfig, ALIFConfig, IzhikevichConfig):
        return False
    return pallas_supported()


def _pallas_layer_scan(
    cfg: SNNConfig, lcfg, lparams, currents: jax.Array, w_rec_eff
) -> jax.Array:
    from ..ops.cells import ALIFConfig, IzhikevichConfig
    from ..ops.pallas_izh import izh_kernel_params, izh_scan
    from ..ops.pallas_rec import rec_alif_scan, rec_lif_scan
    from ..ops.pallas_scan import alif_scan, lif_scan

    # Under matmul_dtype=bfloat16 the kernels store their z/delta traces
    # in bf16 (spikes exact; residuals only feed the surrogate backward).
    # The rec kernels infer this from W's dtype; the ff kernels take it
    # explicitly.
    trace_dtype = cfg.matmul_dtype_eff
    if type(lcfg) is IzhikevichConfig:
        return izh_scan(
            currents, w_rec_eff, izh_kernel_params(lcfg), lcfg.gamma,
            lcfg.spike_func,
        )
    if type(lcfg) is ALIFConfig:
        # A learnable beta is a traced scalar; it rides in SMEM and gets a
        # zero cotangent (quirk Q3), so the kernels stay applicable.
        beta = lparams["beta"] if lcfg.learn_beta else lcfg.beta
        if w_rec_eff is not None:
            return rec_alif_scan(
                currents, w_rec_eff, beta, lcfg.alpha, lcfg.rho,
                lcfg.threshold, lcfg.gamma, lcfg.spike_func,
            )
        return alif_scan(
            currents, beta, lcfg.alpha, lcfg.rho, lcfg.threshold,
            lcfg.gamma, lcfg.spike_func, False, trace_dtype,
        )
    if w_rec_eff is not None:
        return rec_lif_scan(
            currents, w_rec_eff, lcfg.alpha, lcfg.threshold, lcfg.gamma,
            lcfg.spike_func,
        )
    return lif_scan(
        currents, lcfg.alpha, lcfg.threshold, lcfg.gamma, lcfg.spike_func,
        False, trace_dtype,
    )


def apply_pixels(
    cfg: SNNConfig,
    params: Params,
    pixels: jax.Array,
    enc,
    *,
    return_hidden: bool = False,
    return_spike_counts: bool = False,
    _upto: Optional[int] = None,
):
    """Simulate directly from raw pixels ``(B, F)`` with the spike encoding
    inside the model graph.

    ``enc`` is a ``data.datasets.EncodeConfig``.  On TPU with float32
    compute, the encoder is *fused into the first layer's matmul*
    (ops/pallas_encode.py): spike tiles are generated in VMEM from the
    integer latencies, so the (T, B, F) spike tensor never exists.  The
    fallback composes ``encode_spikes`` with :func:`apply` -- identical
    semantics.
    """
    from ..ops.cells import ALIFConfig, IzhikevichConfig, LIFConfig
    from ..ops.encoding import encode_spikes, pixels_to_firing_periods
    from ..ops.pallas_encode import encode_matmul_supported, encoded_input_matmul
    from ..ops.pallas_fused import (
        fused_encode_ff_scan,
        fused_encode_rec_scan,
        fused_supported,
    )
    from ..ops.pallas_fused_izh import fused_encode_izh_scan, fused_izh_supported

    if not enc.as_timeseries:
        return apply(cfg, params, pixels, return_hidden=return_hidden,
                     return_spike_counts=return_spike_counts, _upto=_upto)

    first_name, first_cfg = cfg.layer_configs[0]
    encode_on_device_ok = (
        cfg.use_pallas
        and jnp.dtype(cfg.compute_dtype) == jnp.float32
        and enc.n_steps == cfg.int_time_steps  # no time padding needed
    )
    # Fully-fused path: encoding + input matmul + the whole layer-0 scan
    # in one kernel (ops/pallas_fused.py) -- the (T, B, H0) currents
    # tensor never exists in HBM.  Hidden traces route through the XLA
    # path instead (the kernels don't emit full state traces).
    supported_fn = (
        fused_izh_supported
        if type(first_cfg) is IzhikevichConfig
        else fused_supported
        if type(first_cfg) in (LIFConfig, ALIFConfig)
        else None
    )
    layer0_fused_ok = (
        encode_on_device_ok
        and not return_hidden
        and supported_fn is not None
        and supported_fn(
            cfg.int_time_steps, cfg.input_size, first_cfg.output_size,
            recurrent=first_cfg.use_recurrent_connection,
            itemsize=jnp.dtype(cfg.matmul_dtype_eff).itemsize,
        )
    )
    if (
        encode_on_device_ok
        and not return_hidden
        and supported_fn is not None
        and not layer0_fused_ok
        and _on_tpu()
    ):
        _log_fused_fallback(
            "fused encode+layer-0", "shape exceeds the kernel's VMEM budget",
            n_steps=cfg.int_time_steps, n_features=cfg.input_size,
            hidden=first_cfg.output_size,
        )
    if encode_on_device_ok and (
        layer0_fused_ok
        or encode_matmul_supported(cfg.int_time_steps, first_cfg.output_size)
    ):
        latencies = pixels_to_firing_periods(
            jnp.asarray(pixels, jnp.float32),
            t_max=float(cfg.int_time_steps),
            tau=enc.tau,
            thr=enc.thr,
            epsilon=enc.epsilon,
        )
        # Matmul operands follow W's dtype (accumulation is always
        # float32); spikes are 0/1, exact in bf16.
        w0 = params[first_name]["w_in"].astype(jnp.dtype(cfg.matmul_dtype_eff))
        if layer0_fused_ok:
            lparams0 = params[first_name]
            w_rec_eff = masked_recurrent(first_cfg, lparams0)
            if type(first_cfg) is IzhikevichConfig:
                from ..ops.pallas_izh import izh_kernel_params

                if w_rec_eff is not None:
                    w_rec_eff = w_rec_eff.astype(w0.dtype)
                z0 = fused_encode_izh_scan(
                    latencies, w0, w_rec_eff, izh_kernel_params(first_cfg),
                    cfg.int_time_steps, enc.use_periods, first_cfg.gamma,
                    first_cfg.spike_func,
                )
                return apply(
                    cfg, params, None,
                    return_hidden=return_hidden,
                    return_spike_counts=return_spike_counts,
                    first_layer_output=z0,
                    _upto=_upto,
                )
            alif = type(first_cfg) is ALIFConfig
            beta = (
                (lparams0["beta"] if first_cfg.learn_beta else first_cfg.beta)
                if alif
                else 0.0
            )
            rho = first_cfg.rho if alif else 0.0
            common = (
                cfg.int_time_steps, enc.use_periods, alif, first_cfg.alpha,
                rho, first_cfg.threshold, first_cfg.gamma,
                first_cfg.spike_func,
            )
            if w_rec_eff is not None:
                w_rec_eff = w_rec_eff.astype(w0.dtype)
                z0 = fused_encode_rec_scan(latencies, w0, w_rec_eff, beta, *common)
            else:
                z0 = fused_encode_ff_scan(latencies, w0, beta, *common)
            return apply(
                cfg, params, None,
                return_hidden=return_hidden,
                return_spike_counts=return_spike_counts,
                first_layer_output=z0,
                _upto=_upto,
            )
        currents0 = encoded_input_matmul(
            latencies,
            w0,
            cfg.int_time_steps,
            enc.use_periods,
        )
        return apply(
            cfg, params, None,
            return_hidden=return_hidden,
            return_spike_counts=return_spike_counts,
            first_layer_currents=currents0,
            _upto=_upto,
        )
    spikes = encode_spikes(
        jnp.asarray(pixels, jnp.float32),
        n_steps=enc.n_steps,
        use_periods=enc.use_periods,
        tau=enc.tau,
        thr=enc.thr,
        epsilon=enc.epsilon,
    )
    # Materialize the spike tensor instead of letting XLA fuse the
    # generator into the first matmul: the fused-operand emitter runs the
    # gemm ~4x slower than paying the HBM round-trip once (profiled on
    # v5e: 93k -> 145k img/s on the flagship).
    spikes = jax.lax.optimization_barrier(spikes)
    return apply(cfg, params, spikes, return_hidden=return_hidden,
                 return_spike_counts=return_spike_counts, _upto=_upto)


def _head_fusible(cfg: SNNConfig, enc) -> bool:
    """Whole-network fusion (encode -> hidden scan -> readout -> max) is
    available for single-hidden-layer LIF/ALIF/Izhikevich classifiers with
    the default max-over-time readout on TPU float32 compute."""
    from ..ops.cells import (
        ALIFConfig,
        IzhikevichConfig,
        LIFConfig,
        ReadoutConfig,
    )
    from ..ops.pallas_fused import fused_head_supported
    from ..ops.pallas_fused_izh import fused_izh_head_supported

    if not (cfg.use_pallas and jnp.dtype(cfg.compute_dtype) == jnp.float32):
        if (
            cfg.use_pallas
            and jnp.dtype(cfg.compute_dtype) != jnp.float32
            and _on_tpu()
        ):
            _log_fused_fallback(
                "fused whole-network head (ALL kernels)",
                "compute_dtype != float32 disables every Pallas kernel; "
                "for the fast bf16 recipe keep compute_dtype='float32' and "
                "set matmul_dtype='bfloat16' (see PARITY.md)",
                _level=logging.WARNING,
                compute_dtype=str(cfg.compute_dtype),
            )
        return False
    if not (enc.as_timeseries and enc.n_steps == cfg.int_time_steps):
        return False
    if cfg.readout_mth != ReadoutMth.RNN:  # RNN = max-over-time (snn.py:228)
        return False
    layer_cfgs = cfg.layer_configs
    if len(layer_cfgs) != 2:
        return False
    first_cfg, last_cfg = layer_cfgs[0][1], layer_cfgs[1][1]
    if type(first_cfg) not in (LIFConfig, ALIFConfig, IzhikevichConfig):
        return False
    if type(last_cfg) is not ReadoutConfig:
        return False
    supported_fn = (
        fused_izh_head_supported
        if type(first_cfg) is IzhikevichConfig
        else fused_head_supported
    )
    ok = supported_fn(
        cfg.int_time_steps, cfg.input_size, first_cfg.output_size,
        last_cfg.output_size,
        recurrent=first_cfg.use_recurrent_connection,
        # bf16 matmul weights halve the kernel's resident bytes -- wide
        # hidden layers (H=1024 recurrent) stay fused under the recipe.
        itemsize=jnp.dtype(cfg.matmul_dtype_eff).itemsize,
    )
    if not ok and _on_tpu():
        _log_fused_fallback(
            "fused whole-network head",
            "shape exceeds the kernel's VMEM budget",
            n_steps=cfg.int_time_steps, n_features=cfg.input_size,
            hidden=first_cfg.output_size, n_out=last_cfg.output_size,
        )
    return ok


def _deep_head_fusible(cfg: SNNConfig, enc) -> bool:
    """Deep-network head fusion: models with >= 2 hidden layers whose
    LAST hidden layer is LIF/ALIF and whose readout is the default
    max-over-time run that final (hidden, readout) pair as ONE mid-head
    Pallas kernel pair (ops/pallas_fused_mid.py) -- the trunk (layers
    0..N-2) keeps its layer-0-fused / mid-fused dispatch.  Matches the
    reference's arbitrary-depth surface (snn.py:116-125, 211-213) at
    fused-path throughput instead of the XLA readout composition."""
    from ..ops.cells import ALIFConfig, LIFConfig, ReadoutConfig
    from ..ops.pallas_fused_mid import fused_mid_head_supported

    if not (cfg.use_pallas and jnp.dtype(cfg.compute_dtype) == jnp.float32):
        return False
    if cfg.readout_mth != ReadoutMth.RNN:  # RNN = max-over-time (snn.py:228)
        return False
    layer_cfgs = cfg.layer_configs
    if len(layer_cfgs) < 3:
        return False
    lh_cfg = layer_cfgs[-2][1]
    last_cfg = layer_cfgs[-1][1]
    if type(last_cfg) is not ReadoutConfig:
        return False
    if type(lh_cfg) not in (LIFConfig, ALIFConfig):
        return False
    ok = fused_mid_head_supported(
        cfg.int_time_steps, lh_cfg.input_size, lh_cfg.output_size,
        last_cfg.output_size,
        recurrent=lh_cfg.use_recurrent_connection,
        itemsize=jnp.dtype(cfg.matmul_dtype_eff).itemsize,
    )
    if not ok and _on_tpu():
        _log_fused_fallback(
            "fused mid-head (deep network)",
            "shape exceeds the kernel's VMEM budget",
            n_steps=cfg.int_time_steps, hidden_in=lh_cfg.input_size,
            hidden=lh_cfg.output_size, n_out=last_cfg.output_size,
        )
    return ok


def _twolayer_head_fusible(cfg: SNNConfig, enc) -> bool:
    """Whole-network fusion for EXACTLY two hidden layers: encode ->
    layer-0 scan -> layer-1 scan -> readout integrator -> max-over-time
    as ONE software-pipelined kernel pair (ops/pallas_fused2.py) -- the
    two serial chains overlap inside one grid instead of running back to
    back as layer-0-fused + mid-head kernels.  Matches the reference's
    ``n_hidden_neurons=[h1, h2]`` surface (snn.py:116-125, 211-213).

    The kernel bakes ONE scalar parameter set for both hidden layers
    (how ``SNN._build`` constructs uniform stacks); hand-built configs
    with per-layer scalar overrides fall back to the composed deep
    dispatch, which supports them."""
    from ..ops.cells import ALIFConfig, LIFConfig, ReadoutConfig
    from ..ops.pallas_fused2 import fused2_head_supported

    if not (cfg.use_pallas and jnp.dtype(cfg.compute_dtype) == jnp.float32):
        return False
    if cfg.readout_mth != ReadoutMth.RNN:  # RNN = max-over-time (snn.py:228)
        return False
    if not (enc.as_timeseries and enc.n_steps == cfg.int_time_steps):
        return False
    layer_cfgs = cfg.layer_configs
    if len(layer_cfgs) != 3:
        return False
    h0_cfg, h1_cfg, last_cfg = (lc for _, lc in layer_cfgs)
    if type(last_cfg) is not ReadoutConfig:
        return False
    if type(h0_cfg) not in (LIFConfig, ALIFConfig):
        return False
    if type(h1_cfg) is not type(h0_cfg):
        return False
    same_scalars = (
        h0_cfg.alpha, h0_cfg.threshold, h0_cfg.gamma, h0_cfg.spike_func,
        h0_cfg.use_recurrent_connection,
    ) == (
        h1_cfg.alpha, h1_cfg.threshold, h1_cfg.gamma, h1_cfg.spike_func,
        h1_cfg.use_recurrent_connection,
    )
    if type(h0_cfg) is ALIFConfig:
        same_scalars = same_scalars and h0_cfg.rho == h1_cfg.rho and (
            h0_cfg.learn_beta == h1_cfg.learn_beta
        )
    if not same_scalars:
        return False
    ok = fused2_head_supported(
        cfg.int_time_steps, h0_cfg.input_size, h0_cfg.output_size,
        h1_cfg.output_size, last_cfg.output_size,
        recurrent=h0_cfg.use_recurrent_connection,
        itemsize=jnp.dtype(cfg.matmul_dtype_eff).itemsize,
    )
    if not ok and _on_tpu():
        _log_fused_fallback(
            "fused two-layer whole-network head",
            "shape exceeds the kernel's VMEM budget (composed "
            "layer-0-fused + mid-head dispatch takes over)",
            n_steps=cfg.int_time_steps, n_features=h0_cfg.input_size,
            h1=h0_cfg.output_size, h2=h1_cfg.output_size,
            n_out=last_cfg.output_size,
        )
    return ok


def _twolayer_head_call(cfg: SNNConfig, params: Params, pixels, enc,
                        counts: bool = False):
    """Dispatch a two-hidden-layer network to the fused2 kernel pair.
    Returns logits (B, O), or ``(logits, (cnt0, cnt1))`` when
    ``counts``."""
    from ..ops.cells import ALIFConfig
    from ..ops.encoding import pixels_to_firing_periods
    from ..ops.pallas_fused2 import (
        fused2_ff_head,
        fused2_ff_head_counts,
        fused2_rec_head,
        fused2_rec_head_counts,
    )

    (n0, c0), (n1, c1), (nl, cl) = cfg.layer_configs
    latencies = pixels_to_firing_periods(
        jnp.asarray(pixels, jnp.float32),
        t_max=float(cfg.int_time_steps),
        tau=enc.tau,
        thr=enc.thr,
        epsilon=enc.epsilon,
    )
    md = jnp.dtype(cfg.matmul_dtype_eff)
    lp0, lp1 = params[n0], params[n1]
    w0 = lp0["w_in"].astype(md)
    w1 = lp1["w_in"].astype(md)
    w_out = params[nl]["w_in"].astype(md)
    b_out = params[nl]["b"]
    alif = type(c0) is ALIFConfig
    beta0 = (lp0["beta"] if c0.learn_beta else c0.beta) if alif else 0.0
    beta1 = (lp1["beta"] if c1.learn_beta else c1.beta) if alif else 0.0
    rho = c0.rho if alif else 0.0
    common = (
        cfg.int_time_steps, enc.use_periods, alif, c0.alpha, rho,
        c0.threshold, c0.gamma, cl.kappa, c0.spike_func,
    )
    w0r = masked_recurrent(c0, lp0)
    if w0r is not None:
        w0r = w0r.astype(md)
        w1r = masked_recurrent(c1, lp1).astype(md)
        fn = fused2_rec_head_counts if counts else fused2_rec_head
        return fn(latencies, w0, w0r, beta0, w1, w1r, beta1, w_out, b_out,
                  *common)
    fn = fused2_ff_head_counts if counts else fused2_ff_head
    return fn(latencies, w0, beta0, w1, beta1, w_out, b_out, *common)


def _mid_head_call(cfg: SNNConfig, params: Params, x_tm: jax.Array,
                   counts: bool = False):
    """Dispatch the last hidden layer + readout to the fused mid-head
    kernel pair.  ``x_tm`` is the trunk's time-major (T, B, Hin) spike
    trace; returns logits (B, O), or (logits, counts (B, H)) when
    ``counts``."""
    from ..ops.cells import ALIFConfig
    from ..ops.pallas_fused_mid import (
        fused_mid_ff_scan_head,
        fused_mid_ff_scan_head_counts,
        fused_mid_rec_scan_head,
        fused_mid_rec_scan_head_counts,
    )

    (lh_name, lh_cfg), (last_name, last_cfg) = cfg.layer_configs[-2:]
    matmul_dtype = jnp.dtype(cfg.matmul_dtype_eff)
    lp = params[lh_name]
    w_in = lp["w_in"].astype(matmul_dtype)
    w_out = params[last_name]["w_in"].astype(matmul_dtype)
    b_out = params[last_name]["b"]
    alif = type(lh_cfg) is ALIFConfig
    beta = (lp["beta"] if lh_cfg.learn_beta else lh_cfg.beta) if alif else 0.0
    rho = lh_cfg.rho if alif else 0.0
    common = (
        cfg.int_time_steps, alif, lh_cfg.alpha, rho, lh_cfg.threshold,
        lh_cfg.gamma, last_cfg.kappa, lh_cfg.spike_func,
    )
    w_rec_eff = masked_recurrent(lh_cfg, lp)
    if w_rec_eff is not None:
        w_rec_eff = w_rec_eff.astype(matmul_dtype)
        fn = fused_mid_rec_scan_head_counts if counts \
            else fused_mid_rec_scan_head
        return fn(x_tm, w_in, w_rec_eff, beta, w_out, b_out, *common)
    fn = fused_mid_ff_scan_head_counts if counts else fused_mid_ff_scan_head
    return fn(x_tm, w_in, beta, w_out, b_out, *common)


def forward_logits_pixels(
    cfg: SNNConfig, params: Params, pixels: jax.Array, enc
) -> jax.Array:
    """Raw pixels ``(B, F)`` -> class logits, with the encoding inside the
    graph.

    On TPU, single-hidden-layer LIF/ALIF/Izhikevich models with the
    max-over-time readout run as ONE Pallas kernel pair covering the
    entire network (ops/pallas_fused.py / pallas_fused_izh.py head
    variants): neither the (T, B, H0) currents, the (T, B, O) readout
    trace, nor the (T, B, H0) spike-trace cotangent ever exist in HBM.
    Deeper networks (>= 2 hidden layers, snn.py:116-125) run the trunk
    through the layer-0-fused + mid-fused kernels and the final (hidden,
    readout) pair through the fused mid-head kernel
    (ops/pallas_fused_mid.py) -- same no-readout-trace property at any
    depth.  Everything else composes :func:`apply_pixels` with
    :func:`prediction_logits` -- identical semantics.
    """
    from ..ops.cells import ALIFConfig, IzhikevichConfig
    from ..ops.encoding import pixels_to_firing_periods
    from ..ops.pallas_fused import (
        fused_encode_ff_scan_head,
        fused_encode_rec_scan_head,
    )

    if not _head_fusible(cfg, enc):
        if _twolayer_head_fusible(cfg, enc):
            return _twolayer_head_call(cfg, params, pixels, enc)
        if _deep_head_fusible(cfg, enc):
            x_tm = apply_pixels(
                cfg, params, pixels, enc, _upto=len(cfg.layer_configs) - 3
            )
            return _mid_head_call(cfg, params, x_tm)
        trace, _ = apply_pixels(cfg, params, pixels, enc)
        return prediction_logits(cfg, trace)

    (first_name, first_cfg), (last_name, last_cfg) = cfg.layer_configs
    latencies = pixels_to_firing_periods(
        jnp.asarray(pixels, jnp.float32),
        t_max=float(cfg.int_time_steps),
        tau=enc.tau,
        thr=enc.thr,
        epsilon=enc.epsilon,
    )
    matmul_dtype = jnp.dtype(cfg.matmul_dtype_eff)
    lparams0 = params[first_name]
    w0 = lparams0["w_in"].astype(matmul_dtype)
    w_out = params[last_name]["w_in"].astype(matmul_dtype)
    b_out = params[last_name]["b"]
    if type(first_cfg) is IzhikevichConfig:
        from ..ops.pallas_fused_izh import fused_encode_izh_scan_head
        from ..ops.pallas_izh import izh_kernel_params

        w_rec_eff = masked_recurrent(first_cfg, lparams0)
        if w_rec_eff is not None:
            w_rec_eff = w_rec_eff.astype(matmul_dtype)
        return fused_encode_izh_scan_head(
            latencies, w0, w_rec_eff, w_out, b_out,
            izh_kernel_params(first_cfg), cfg.int_time_steps,
            enc.use_periods, first_cfg.gamma, last_cfg.kappa,
            first_cfg.spike_func,
        )
    return _lif_alif_head_call(
        cfg, first_cfg, last_cfg, lparams0, latencies, w0, w_out, b_out, enc
    )


def _lif_alif_head_call(cfg, first_cfg, last_cfg, lparams0, latencies, w0,
                        w_out, b_out, enc, counts=False):
    """Dispatch to the LIF/ALIF whole-network head kernel pair.  Every
    array op broadcasts over an optional leading replica axis, so this
    single tail serves both :func:`forward_logits_pixels` (2-D weights)
    and :func:`forward_logits_pixels_stacked` ((S, ...) weights) -- the
    static ``common`` tuple cannot drift between the two paths.

    ``counts=True`` selects the ``_counts`` kernel variants, returning
    ``(logits, spike_counts (B, H))`` -- the fused carrier for the spike
    regularizers (train/losses.py)."""
    from ..ops.cells import ALIFConfig
    from ..ops.pallas_fused import (
        fused_encode_ff_scan_head,
        fused_encode_ff_scan_head_counts,
        fused_encode_rec_scan_head,
        fused_encode_rec_scan_head_counts,
    )

    matmul_dtype = jnp.dtype(cfg.matmul_dtype_eff)
    alif = type(first_cfg) is ALIFConfig
    beta = (
        (lparams0["beta"] if first_cfg.learn_beta else first_cfg.beta)
        if alif
        else 0.0
    )
    rho = first_cfg.rho if alif else 0.0
    common = (
        cfg.int_time_steps, enc.use_periods, alif, first_cfg.alpha, rho,
        first_cfg.threshold, first_cfg.gamma, last_cfg.kappa,
        first_cfg.spike_func,
    )
    w_rec_eff = masked_recurrent(first_cfg, lparams0)
    if w_rec_eff is not None:
        w_rec_eff = w_rec_eff.astype(matmul_dtype)
        fn = fused_encode_rec_scan_head_counts if counts \
            else fused_encode_rec_scan_head
        return fn(latencies, w0, w_rec_eff, beta, w_out, b_out, *common)
    fn = fused_encode_ff_scan_head_counts if counts \
        else fused_encode_ff_scan_head
    return fn(latencies, w0, beta, w_out, b_out, *common)


def forward_logits_counts_pixels(
    cfg: SNNConfig, params: Params, pixels: jax.Array, enc
):
    """Raw pixels ``(B, F)`` -> ``(logits, spike_counts)`` with the
    encoding inside the graph.

    ``spike_counts`` is ``{layer_name: (B, width) float32}`` of per-sample
    per-neuron spike counts for LIF/ALIF layers (the reference's
    ``isinstance(layer, LIFLayer)`` filter, snn.py:268) -- everything the
    sketched spike regularizers (snn.py:401-408, train/losses.py) need,
    WITHOUT materializing the (B, T, H) hidden traces.  Head-fusible
    single-hidden-layer LIF/ALIF models keep the whole-network Pallas
    kernel pair (the ``_counts`` variants); everything else composes
    :func:`apply_pixels` with ``return_spike_counts=True`` (the z trace
    already exists on those paths, so counts are a free time reduction).
    """
    from ..ops.cells import IzhikevichConfig
    from ..ops.encoding import pixels_to_firing_periods

    first_cfg = cfg.layer_configs[0][1]
    if _head_fusible(cfg, enc) and type(first_cfg) is IzhikevichConfig:
        # Reference parity: the count collector's isinstance(LIFLayer)
        # filter EXCLUDES Izhikevich (snn.py:268) -- its counts entry
        # never exists and the reg term is zero.  Return the fused-head
        # logits with an empty counts dict so a count-regularized
        # Izhikevich fit KEEPS the whole-network kernel pair (previously
        # it silently fell back to the composed path).  Users who want
        # Izhikevich spike counts anyway (beyond-reference) can call
        # ops.pallas_fused_izh.fused_encode_izh_scan_head_counts.
        return forward_logits_pixels(cfg, params, pixels, enc), {}
    if _head_fusible(cfg, enc):
        (first_name, first_cfg), (last_name, last_cfg) = cfg.layer_configs
        latencies = pixels_to_firing_periods(
            jnp.asarray(pixels, jnp.float32),
            t_max=float(cfg.int_time_steps),
            tau=enc.tau,
            thr=enc.thr,
            epsilon=enc.epsilon,
        )
        matmul_dtype = jnp.dtype(cfg.matmul_dtype_eff)
        lparams0 = params[first_name]
        w0 = lparams0["w_in"].astype(matmul_dtype)
        w_out = params[last_name]["w_in"].astype(matmul_dtype)
        b_out = params[last_name]["b"]
        logits, counts = _lif_alif_head_call(
            cfg, first_cfg, last_cfg, lparams0, latencies, w0, w_out, b_out,
            enc, counts=True,
        )
        return logits, {first_name: counts}
    if _twolayer_head_fusible(cfg, enc):
        # Two-hidden-layer networks: BOTH layers' counts come from the
        # fused2 _counts kernel, so regularized training keeps the
        # single software-pipelined kernel pair.
        (n0, _), (n1, _) = cfg.layer_configs[:2]
        logits, (cnt0, cnt1) = _twolayer_head_call(
            cfg, params, pixels, enc, counts=True
        )
        return logits, {n0: cnt0, n1: cnt1}
    if _deep_head_fusible(cfg, enc):
        # Deep networks: trunk layers materialize their z traces anyway
        # (counts are a free time reduction there); the LAST hidden
        # layer's counts come from the mid-head _counts kernel so the
        # fused pair survives regularized training.  The gate guarantees
        # the last hidden layer is LIF/ALIF (the reference's
        # isinstance(LIFLayer) count filter, snn.py:268, includes it).
        lh_name = cfg.layer_configs[-2][0]
        x_tm, counts = apply_pixels(
            cfg, params, pixels, enc, return_spike_counts=True,
            _upto=len(cfg.layer_configs) - 3,
        )
        logits, cnt_last = _mid_head_call(cfg, params, x_tm, counts=True)
        counts[lh_name] = cnt_last
        return logits, counts
    # Izhikevich-first-layer head configs land here too: the layer-0 fused
    # Izhikevich kernel materializes z, and the reference's count filter
    # excludes Izhikevich anyway (its counts dict entry simply never
    # exists, matching get_spikes_count_per_neuron's isinstance filter).
    trace, _, counts = apply_pixels(
        cfg, params, pixels, enc, return_spike_counts=True
    )
    return prediction_logits(cfg, trace), counts


def stacked_head_fusible(cfg: SNNConfig, enc) -> bool:
    """Whether :func:`forward_logits_pixels_stacked` covers this config:
    any head-fusible single-hidden-layer model (LIF/ALIF/Izhikevich --
    both head kernel families carry the stacked-replica grid lifting)."""
    return _head_fusible(cfg, enc)


def forward_logits_pixels_stacked(
    cfg: SNNConfig, stacked_params: Params, pixels: jax.Array, enc
) -> jax.Array:
    """All-replica fused forward for multi-seed ensembles.

    ``stacked_params`` carries a leading replica axis on every leaf (the
    :class:`~..parallel.ensemble.EnsembleTrainer` layout); ``pixels``
    ``(B, F)`` are shared by all replicas.  Returns logits ``(S, B, O)``.

    The whole ensemble runs as ONE Pallas kernel pair with a leading
    replica grid axis (ops/pallas_fused.py "stacked-replica grid
    lifting") — numerically identical to S unrolled
    :func:`forward_logits_pixels` calls, but a single pallas_call per
    direction: the XLA graph stays S× smaller (compile time) and there
    are no inter-call dispatch gaps.  Callers gate on
    :func:`stacked_head_fusible` and fall back to the unrolled path.
    """
    from ..ops.encoding import pixels_to_firing_periods

    if not stacked_head_fusible(cfg, enc):
        raise ValueError(
            "forward_logits_pixels_stacked: config is not stacked-head-"
            "fusible (Izhikevich first layer, unsupported shape/dtype, or "
            "non-TPU backend) -- gate on stacked_head_fusible(cfg, enc) "
            "and use per-replica forward_logits_pixels instead."
        )
    (first_name, first_cfg), (last_name, last_cfg) = cfg.layer_configs
    latencies = pixels_to_firing_periods(
        jnp.asarray(pixels, jnp.float32),
        t_max=float(cfg.int_time_steps),
        tau=enc.tau,
        thr=enc.thr,
        epsilon=enc.epsilon,
    )
    matmul_dtype = jnp.dtype(cfg.matmul_dtype_eff)
    lparams0 = stacked_params[first_name]
    w0 = lparams0["w_in"].astype(matmul_dtype)           # (S, F, H)
    w_out = stacked_params[last_name]["w_in"].astype(matmul_dtype)
    b_out = stacked_params[last_name]["b"]               # (S, O)
    from ..ops.cells import IzhikevichConfig

    if type(first_cfg) is IzhikevichConfig:
        from ..ops.pallas_fused_izh import fused_encode_izh_scan_head
        from ..ops.pallas_izh import izh_kernel_params

        w_rec_eff = masked_recurrent(first_cfg, lparams0)
        if w_rec_eff is not None:
            w_rec_eff = w_rec_eff.astype(matmul_dtype)
        return fused_encode_izh_scan_head(
            latencies, w0, w_rec_eff, w_out, b_out,
            izh_kernel_params(first_cfg), cfg.int_time_steps,
            enc.use_periods, first_cfg.gamma, last_cfg.kappa,
            first_cfg.spike_func,
        )
    return _lif_alif_head_call(
        cfg, first_cfg, last_cfg, lparams0, latencies, w0, w_out, b_out, enc
    )


def prediction_logits(cfg: SNNConfig, outputs_trace: jax.Array) -> jax.Array:
    """Reduce the readout trace over time to class logits.

    Default is max-over-time (snn.py:228); ``ReadoutMth.TEMPORAL_FILTER``
    selects the decayed temporal sum the reference keeps as an alternative
    (snn.py:229).
    """
    if cfg.readout_mth == ReadoutMth.TEMPORAL_FILTER:
        return batchwise_temporal_filter(outputs_trace, cfg.readout_filter_decay)
    return temporal_max(outputs_trace, time_axis=1)


def forward_logits(cfg: SNNConfig, params: Params, inputs: jax.Array) -> jax.Array:
    """Convenience: simulate and reduce to logits in one call."""
    outputs_trace, _ = apply(cfg, params, inputs, return_hidden=False)
    return prediction_logits(cfg, outputs_trace)


def explain_dispatch(cfg: SNNConfig, enc=None) -> list:
    """Which kernel each layer gets for the training/eval forward, and why.

    Returns a list of dicts ``{"layer": name or tuple of names, "path":
    <kernel id>, "reason": <one line>}`` in execution order, replaying the
    exact gates :func:`forward_logits_pixels` (when ``enc`` is given) /
    :func:`apply` use.  Paths: ``pallas:whole-network-head`` (encode +
    hidden + readout + max, ONE kernel pair), ``pallas:fused-encode-
    layer0``, ``pallas:encode-matmul+scan``, ``pallas:fused-mid``,
    ``pallas:mid-head``, ``pallas:scan`` (XLA matmul + Pallas time scan),
    ``xla:scan``.  Purely informational -- calling it never changes
    dispatch (but it fires the same fallback logs the real dispatch
    would)."""
    from ..ops.cells import ALIFConfig, IzhikevichConfig, LIFConfig, ReadoutConfig
    from ..ops.pallas_encode import encode_matmul_supported
    from ..ops.pallas_fused import fused_supported
    from ..ops.pallas_fused_izh import fused_izh_supported
    from ..ops.pallas_fused_mid import fused_mid_supported

    layer_cfgs = cfg.layer_configs
    f32 = jnp.dtype(cfg.compute_dtype) == jnp.float32
    itemsize = jnp.dtype(cfg.matmul_dtype_eff).itemsize

    def _global_block() -> Optional[str]:
        if not cfg.use_pallas:
            return "use_pallas=False"
        if not f32:
            return (
                f"compute_dtype={cfg.compute_dtype!r} != float32 disables "
                "every Pallas kernel (use matmul_dtype='bfloat16' for the "
                "fast bf16 recipe)"
            )
        if not _on_tpu():
            return f"backend {jax.default_backend()!r} is not TPU"
        return None

    blocked = _global_block()
    if blocked is not None:
        return [
            {"layer": name, "path": "xla:scan", "reason": blocked}
            for name, _ in layer_cfgs
        ]

    if enc is not None and _head_fusible(cfg, enc):
        return [{
            "layer": tuple(name for name, _ in layer_cfgs),
            "path": "pallas:whole-network-head",
            "reason": "single-hidden-layer classifier with max-over-time "
                      "readout: encode + scan + readout + max in ONE "
                      "kernel pair",
        }]

    if enc is not None and _twolayer_head_fusible(cfg, enc):
        return [{
            "layer": tuple(name for name, _ in layer_cfgs),
            "path": "pallas:whole-network-head-2",
            "reason": "two-hidden-layer classifier with max-over-time "
                      "readout: encode + both hidden scans + readout + "
                      "max in ONE software-pipelined kernel pair",
        }]

    deep = enc is not None and _deep_head_fusible(cfg, enc)
    entries = []
    n = len(layer_cfgs)
    encode_fused0 = False
    for idx, (name, lcfg) in enumerate(layer_cfgs):
        if deep and idx == n - 2:
            entries.append({
                "layer": (name, layer_cfgs[-1][0]),
                "path": "pallas:mid-head",
                "reason": "deep network's last hidden layer + readout + "
                          "max-over-time in ONE kernel pair",
            })
            break
        spiking = type(lcfg) in (LIFConfig, ALIFConfig, IzhikevichConfig)
        if idx == 0 and enc is not None and enc.as_timeseries:
            if enc.n_steps != cfg.int_time_steps:
                entries.append({
                    "layer": name, "path": "pallas:scan" if spiking else "xla:scan",
                    "reason": f"enc.n_steps={enc.n_steps} != int_time_steps="
                              f"{cfg.int_time_steps}: encoding cannot fuse "
                              "on-device (time padding)",
                })
                continue
            sup = (
                fused_izh_supported
                if type(lcfg) is IzhikevichConfig
                else fused_supported if spiking else None
            )
            if sup is not None and sup(
                cfg.int_time_steps, cfg.input_size, lcfg.output_size,
                recurrent=lcfg.use_recurrent_connection, itemsize=itemsize,
            ):
                encode_fused0 = True
                entries.append({
                    "layer": name, "path": "pallas:fused-encode-layer0",
                    "reason": "encoding + input matmul + time scan in one "
                              "kernel pair",
                })
                continue
            if encode_matmul_supported(cfg.int_time_steps, lcfg.output_size):
                entries.append({
                    "layer": name, "path": "pallas:encode-matmul+scan",
                    "reason": "layer-0 fusion exceeds the VMEM budget; "
                              "encode+matmul kernel feeds a separate scan "
                              "kernel",
                })
                continue
        if spiking and idx > 0 and _mid_layer_fusible(cfg, lcfg, False):
            entries.append({
                "layer": name, "path": "pallas:fused-mid",
                "reason": "input matmul inside the scan kernel (no "
                          "currents tensor in HBM)",
            })
            continue
        if spiking and _pallas_layer_eligible(cfg, lcfg, False):
            reason = "XLA matmul + Pallas time-scan kernel"
            if type(lcfg) is IzhikevichConfig and idx > 0:
                reason += (
                    " (Izhikevich mid layers have no fused-mid variant: "
                    "the currents tensor materializes)"
                )
            entries.append({"layer": name, "path": "pallas:scan",
                            "reason": reason})
            continue
        entries.append({
            "layer": name, "path": "xla:scan",
            "reason": "readout layer (consumed by prediction_logits)"
            if type(lcfg) is ReadoutConfig
            else "no Pallas kernel covers this layer config",
        })
    return entries


def param_labels(cfg: SNNConfig, params: Params) -> Params:
    """Label every leaf for optimizer masking.

    Matmul weights and biases are ``"weight"``; a learnable ALIF beta is
    ``"beta"``.  Torch's Adam skips parameters whose grad is None -- beta in
    the reference (quirk Q3) -- so beta must be excluded from both the Adam
    update *and* L2 weight decay to match.
    """
    return {
        name: {leaf: ("beta" if leaf == "beta" else "weight") for leaf in group}
        for name, group in params.items()
    }
