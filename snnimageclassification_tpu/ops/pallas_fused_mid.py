"""Pallas TPU kernel: mid-layer input matmul + LIF/ALIF scan fused into
ONE kernel pair (forward and backward).

Hidden layers beyond layer 0 consume the previous layer's spike trace:
the XLA path runs one big ``(T*B, Hin) @ (Hin, H)`` matmul producing the
(T, B, H) currents tensor in HBM, then a scan kernel re-reads it -- and
the backward round-trips the currents *cotangent* the same way.  Here the
per-block input matmuls run inside the scan kernel (off the serial chain,
like the layer-0 fused kernel ops/pallas_fused.py), so the currents
tensor and its cotangent never exist in HBM; the backward additionally
emits the input-trace cotangent ``g_z_in`` (the layer is in the middle of
the network, so its input needs a gradient) and accumulates ``g_W_in``
against the resident z_in block.

Dynamics and residual scheme are identical to ops/pallas_fused.py
(reference spiking_layers.py:156-171, 229-243): z + delta traces for
FastSigmoid (ALIF delta = v - A), z + v (+ a) for Phi.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fused import _LANE, _MAX_BLOCK_B, _N_BLOCKS, _SUBLANE, _pad2
from .pallas_scan import (
    _fit_block_b,
    _surrogate_grad,
    _time_block,
    _use_delta_residual,
    _zprev_k,
)
from .surrogate import SpikeFuncType

__all__ = ["fused_mid_rec_scan", "fused_mid_ff_scan", "fused_mid_supported"]


def fused_mid_supported(n_steps: int, hidden_in: int, hidden: int,
                        recurrent: bool = True, itemsize: int = 4) -> bool:
    """The W_in (+ W_rec when recurrent) blocks must fit VMEM alongside
    the revolving trace blocks (same budget shape as the layer-0 gate,
    minus the latency tile).  ``recurrent`` defaults True -- the
    conservative direction; ``itemsize`` follows the matmul dtype (bf16
    weights halve the resident cost, see pallas_fused.fused_supported)."""
    hin_pad = -(-hidden_in // _LANE) * _LANE
    h_pad = -(-hidden // _LANE) * _LANE
    w_bytes = hin_pad * h_pad * itemsize
    if recurrent:
        w_bytes += h_pad * h_pad * itemsize
    return (
        jax.default_backend() == "tpu"
        and n_steps >= 1
        and w_bytes <= 4 * 1024 * 1024
    )


def _mid_shapes(B, hidden_in, hidden, K):
    hin_pad = -(-hidden_in // _LANE) * _LANE
    h_pad = -(-hidden // _LANE) * _LANE
    bb = min(_MAX_BLOCK_B, -(-B // _SUBLANE) * _SUBLANE)
    # Revolving blocks: z_in (+ its cotangent in backward) on top of the
    # usual trace blocks; budget with the wider of the two widths.
    bb = _fit_block_b(bb, K, max(hin_pad, h_pad), _N_BLOCKS + 2)
    return hin_pad, h_pad, bb


def _mid_fwd_kernel(refs, *, K, alif, has_w, alpha, rho, threshold,
                    store_delta, store_traces=True):
    if has_w:
        zin_ref, w_in_ref, w_rec_ref, beta_ref, *rest = refs
    else:
        zin_ref, w_in_ref, beta_ref, *rest = refs
        w_rec_ref = None
    # Inference (store_traces=False, the custom_vjp PRIMAL): only the z
    # spike trace leaves the kernel (the next layer consumes it); the
    # backward-only residuals (v / delta / a) are never written.
    n_trace = 1 if not store_traces else (2 if (store_delta or not alif) else 3)
    out_refs = rest[:n_trace]
    v_scr, a_scr, z_scr = rest[n_trace:]
    if not store_traces:
        (z_ref,) = out_refs
        v_ref = d_ref = a_ref = None
    elif alif and not store_delta:
        z_ref, v_ref, a_ref = out_refs
        d_ref = None
    elif alif:
        z_ref, d_ref = out_refs
        v_ref = a_ref = None
    else:
        z_ref, v_ref = out_refs  # LIF stores v (surrogate needs it)
        d_ref = a_ref = None
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        v_scr[:] = jnp.zeros_like(v_scr)
        a_scr[:] = jnp.zeros_like(a_scr)
        z_scr[:] = jnp.zeros_like(z_scr)

    w_in = w_in_ref[:]
    w_rec = w_rec_ref[:] if has_w else None
    trace_dtype = out_refs[0].dtype
    v_c, a_c, z_prev = v_scr[:], a_scr[:], z_scr[:]
    # Input currents are state-independent: ONE batched (K*bb, Hin) @
    # (Hin, H) MXU matmul off the serial chain.
    K_, bb_, hin_ = zin_ref.shape
    curs = jnp.dot(
        zin_ref[:].reshape(K_ * bb_, hin_).astype(w_in.dtype), w_in,
        preferred_element_type=jnp.float32,
    ).reshape(K_, bb_, -1)
    for k in range(K):
        cur = curs[k]
        if has_w:
            cur = cur + jnp.dot(z_prev.astype(w_rec.dtype), w_rec,
                                preferred_element_type=jnp.float32)
        v_c = (alpha * v_c + cur) * (1.0 - z_prev)
        if alif:
            a_c = rho * a_c + z_prev
            dyn_threshold = threshold + beta_ref[0, 0] * a_c
        else:
            dyn_threshold = threshold
        delta = v_c - dyn_threshold
        z_prev = (delta >= 0).astype(v_c.dtype)
        z_ref[k] = z_prev.astype(trace_dtype)
        if d_ref is not None:
            d_ref[k] = delta.astype(trace_dtype)
        elif v_ref is not None:
            v_ref[k] = v_c.astype(trace_dtype)
            if alif:
                a_ref[k] = a_c.astype(trace_dtype)
    v_scr[:] = v_c
    a_scr[:] = a_c
    z_scr[:] = z_prev


def _mid_bwd_kernel(refs, *, K, alif, has_w, alpha, rho, threshold, gamma,
                    spike_func, store_delta):
    n_res = 1 if (store_delta or not alif) else 2
    i = 0
    gz_ref = refs[i]; i += 1
    res_refs = refs[i:i + n_res]; i += n_res
    z_ref = refs[i]; i += 1
    zb_ref = refs[i]; i += 1
    zin_ref = refs[i]; i += 1
    w_in_ref = refs[i]; i += 1
    w_rec_ref = refs[i] if has_w else None
    i += 1 if has_w else 0
    beta_ref = refs[i]; i += 1
    gzin_ref = refs[i]; i += 1
    dwin_ref = refs[i]; i += 1
    dwr_ref = refs[i] if has_w else None
    i += 1 if has_w else 0
    dcur_scr, dcur_blk = refs[i], refs[i + 1]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dcur_scr[:] = jnp.zeros_like(dcur_scr)
        dwin_ref[0] = jnp.zeros_like(dwin_ref[0])
        if has_w:
            dwr_ref[0] = jnp.zeros_like(dwr_ref[0])

    is_first_block = t == pl.num_programs(1) - 1
    w_in = w_in_ref[:]
    w_rec = w_rec_ref[:] if has_w else None
    f32 = jnp.float32
    dcur_carry = dcur_scr[:]
    for k in reversed(range(K)):  # reverse time inside the block
        if store_delta or not alif:
            if alif:
                surr = _surrogate_grad(
                    spike_func, res_refs[0][k].astype(f32), 0.0, gamma
                )
            else:
                surr = _surrogate_grad(
                    spike_func, res_refs[0][k].astype(f32), threshold, gamma
                )
        else:
            v_k = res_refs[0][k].astype(f32)
            a_k = res_refs[1][k].astype(f32)
            surr = _surrogate_grad(
                spike_func, v_k, threshold + beta_ref[0, 0] * a_k, gamma
            )
        dz = gz_ref[k].astype(f32)
        if has_w:
            dz = dz + jax.lax.dot_general(
                dcur_carry.astype(w_rec.dtype), w_rec,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
        dv = dz * surr + alpha * dcur_carry
        dcur = dv * (1.0 - _zprev_k(z_ref, zb_ref, k, is_first_block))
        dcur_blk[k] = dcur
        dcur_carry = dcur
    dcur_scr[:] = dcur_carry

    # Off the serial chain: the input-trace cotangent (one batched
    # dcur @ W_in^T) and g_W_in against the resident z_in block.
    K_, bb_, H_ = dcur_blk.shape
    hin_ = zin_ref.shape[2]
    dcur_flat = dcur_blk[:].reshape(K_ * bb_, H_)
    gzin_ref[:] = jax.lax.dot_general(
        dcur_flat.astype(w_in.dtype), w_in,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ).reshape(K_, bb_, hin_)
    dwin_ref[0] += jax.lax.dot_general(
        zin_ref[:].reshape(K_ * bb_, hin_).astype(w_in.dtype),
        dcur_flat.astype(w_in.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    if has_w:
        if K_ > 1:
            dwr_ref[0] += jax.lax.dot_general(
                z_ref[: K_ - 1].reshape((K_ - 1) * bb_, H_).astype(w_rec.dtype),
                dcur_blk[1:].reshape((K_ - 1) * bb_, H_).astype(w_rec.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        zb0 = _zprev_k(z_ref, zb_ref, 0, is_first_block)
        dwr_ref[0] += jax.lax.dot_general(
            zb0.astype(w_rec.dtype), dcur_blk[0].astype(w_rec.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    del rho


def _mid_fwd_call(z_in, w_in, w_rec, beta, *, T, alif, alpha, rho,
                  threshold, store_delta, interpret, store_traces=True):
    has_w = w_rec is not None
    K = _time_block(T)
    n_trace = 1 if not store_traces else (2 if (store_delta or not alif) else 3)
    _, B, Hin = z_in.shape
    H = w_in.shape[1]
    hin_pad, h_pad, bb = _mid_shapes(B, Hin, H, K)
    pb = (-B) % bb
    zin_p = (
        jnp.pad(z_in, ((0, 0), (0, pb), (0, hin_pad - Hin)))
        if pb or hin_pad != Hin
        else z_in
    )
    Bp = zin_p.shape[1]
    grid = (Bp // bb, T // K)
    zin_spec = pl.BlockSpec((K, bb, hin_pad), lambda b, t: (t, b, 0),
                            memory_space=pltpu.VMEM)
    w_in_spec = pl.BlockSpec((hin_pad, h_pad), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    w_rec_spec = pl.BlockSpec((h_pad, h_pad), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    beta_spec = pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.SMEM)
    tr_spec = pl.BlockSpec((K, bb, h_pad), lambda b, t: (t, b, 0),
                           memory_space=pltpu.VMEM)
    trace_dtype = (
        w_in.dtype if jnp.issubdtype(w_in.dtype, jnp.floating)
        else jnp.float32
    )
    beta_s = jnp.asarray(beta, jnp.float32).reshape(1, 1)
    kernel = functools.partial(
        _mid_fwd_kernel, K=K, alif=alif, has_w=has_w, alpha=alpha, rho=rho,
        threshold=threshold, store_delta=store_delta,
        store_traces=store_traces,
    )
    in_specs = (
        [zin_spec, w_in_spec] + ([w_rec_spec] if has_w else []) + [beta_spec]
    )
    args = (
        [zin_p, _pad2(w_in, hin_pad, h_pad)]
        + ([_pad2(w_rec, h_pad, h_pad)] if has_w else []) + [beta_s]
    )
    outs = pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=grid,
        in_specs=in_specs,
        out_specs=[tr_spec] * n_trace,
        out_shape=[jax.ShapeDtypeStruct((T, Bp, h_pad), trace_dtype)] * n_trace,
        scratch_shapes=[pltpu.VMEM((bb, h_pad), jnp.float32)] * 3,
        interpret=interpret,
    )(*args)
    return tuple(o[:, :B, :H] for o in outs), zin_p


def _mid_bwd_call(g_z, residuals, z, zin_p, w_in, w_rec, beta, *, T, alif,
                  alpha, rho, threshold, gamma, spike_func, store_delta,
                  interpret):
    has_w = w_rec is not None
    K = _time_block(T)
    B, H = z.shape[1], z.shape[2]
    Hin = w_in.shape[0]
    hin_pad = zin_p.shape[2]
    _, h_pad, bb = _mid_shapes(B, Hin, H, K)  # same tile as the forward
    Bp = zin_p.shape[1]

    def padbh(x):
        pb = Bp - x.shape[1]
        ph = h_pad - x.shape[2]
        if pb or ph:
            x = jnp.pad(x, ((0, 0), (0, pb), (0, ph)))
        return x

    operands = [padbh(x) for x in (g_z, *residuals, z)]
    nb = T // K
    grid = (Bp // bb, nb)
    rev = pl.BlockSpec((K, bb, h_pad), lambda b, t, n=nb: (n - 1 - t, b, 0),
                       memory_space=pltpu.VMEM)
    rev_in = pl.BlockSpec((K, bb, hin_pad), lambda b, t, n=nb: (n - 1 - t, b, 0),
                          memory_space=pltpu.VMEM)
    zb = pl.BlockSpec(
        (1, bb, h_pad),
        lambda b, t, n=nb, K=K: (jnp.maximum((n - 1 - t) * K - 1, 0), b, 0),
        memory_space=pltpu.VMEM,
    )
    w_in_spec = pl.BlockSpec((hin_pad, h_pad), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    w_rec_spec = pl.BlockSpec((h_pad, h_pad), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    beta_spec = pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.SMEM)
    dwin_spec = pl.BlockSpec((1, hin_pad, h_pad), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    dwr_spec = pl.BlockSpec((1, h_pad, h_pad), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    beta_s = jnp.asarray(beta, jnp.float32).reshape(1, 1)
    kernel = functools.partial(
        _mid_bwd_kernel, K=K, alif=alif, has_w=has_w, alpha=alpha, rho=rho,
        threshold=threshold, gamma=gamma, spike_func=spike_func,
        store_delta=store_delta,
    )
    in_specs = (
        [rev] * len(operands) + [zb, rev_in, w_in_spec]
        + ([w_rec_spec] if has_w else []) + [beta_spec]
    )
    args = (
        operands + [operands[-1], zin_p, _pad2(w_in, hin_pad, h_pad)]
        + ([_pad2(w_rec, h_pad, h_pad)] if has_w else []) + [beta_s]
    )
    out_specs = [rev_in, dwin_spec] + ([dwr_spec] if has_w else [])
    out_shape = [
        jax.ShapeDtypeStruct((T, Bp, hin_pad), jnp.float32),
        jax.ShapeDtypeStruct((Bp // bb, hin_pad, h_pad), jnp.float32),
    ]
    if has_w:
        out_shape.append(
            jax.ShapeDtypeStruct((Bp // bb, h_pad, h_pad), jnp.float32)
        )
    outs = pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bb, h_pad), jnp.float32),
            pltpu.VMEM((K, bb, h_pad), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    # Cotangent dtype must match the primal trace dtype (bf16 traces
    # under matmul_dtype=bfloat16).
    g_z_in = outs[0][:, :z.shape[1], :Hin].astype(zin_p.dtype)
    g_w_in = jnp.sum(outs[1], axis=0)[:Hin, :H].astype(w_in.dtype)
    g_w_rec = (
        jnp.sum(outs[2], axis=0)[:H, :H].astype(w_rec.dtype) if has_w else None
    )
    return g_z_in, g_w_in, g_w_rec


# ---------------------------------------------------------------------------
# custom_vjp wrappers
# ---------------------------------------------------------------------------
MID_REC_STATICS = (4, 5, 6, 7, 8, 9, 10, 11)


@functools.partial(jax.custom_vjp, nondiff_argnums=MID_REC_STATICS)
def fused_mid_rec_scan(
    z_in: jax.Array,
    w_in: jax.Array,
    w_rec: jax.Array,
    beta,
    n_steps: int,
    alif: bool,
    alpha: float,
    rho: float,
    threshold: float,
    gamma: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
) -> jax.Array:
    """(z_in (T,B,Hin) trace, W_in, masked W_rec) -> spikes (T,B,H).

    Numerically equal (up to f32 tile-summation order) to
    ``z_in @ W_in`` followed by ``rec_{alif,lif}_scan``; the backward
    additionally returns the z_in cotangent.
    """
    (z,), _ = _mid_fwd_call(
        z_in, w_in, w_rec, beta, T=n_steps, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, store_traces=False,
    )
    return z


def _mid_rec_fwd(z_in, w_in, w_rec, beta, n_steps, alif, alpha, rho,
                 threshold, gamma, spike_func, interpret):
    outs, zin_p = _mid_fwd_call(
        z_in, w_in, w_rec, beta, T=n_steps, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret,
    )
    return outs[0], (outs, zin_p, w_in, w_rec, beta)


def _mid_rec_bwd(n_steps, alif, alpha, rho, threshold, gamma, spike_func,
                 interpret, res, g_z):
    outs, zin_p, w_in, w_rec, beta = res
    z, *residuals = outs
    g_z_in, g_w_in, g_w_rec = _mid_bwd_call(
        g_z, tuple(residuals), z, zin_p, w_in, w_rec, beta, T=n_steps,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold, gamma=gamma,
        spike_func=spike_func,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret,
    )
    return g_z_in, g_w_in, g_w_rec, jnp.zeros_like(jnp.asarray(beta))


fused_mid_rec_scan.defvjp(_mid_rec_fwd, _mid_rec_bwd)


MID_FF_STATICS = (3, 4, 5, 6, 7, 8, 9, 10)


@functools.partial(jax.custom_vjp, nondiff_argnums=MID_FF_STATICS)
def fused_mid_ff_scan(
    z_in: jax.Array,
    w_in: jax.Array,
    beta,
    n_steps: int,
    alif: bool,
    alpha: float,
    rho: float,
    threshold: float,
    gamma: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
) -> jax.Array:
    """Feedforward mid-layer variant: no recurrent weights."""
    (z,), _ = _mid_fwd_call(
        z_in, w_in, None, beta, T=n_steps, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, store_traces=False,
    )
    return z


def _mid_ff_fwd(z_in, w_in, beta, n_steps, alif, alpha, rho, threshold,
                gamma, spike_func, interpret):
    outs, zin_p = _mid_fwd_call(
        z_in, w_in, None, beta, T=n_steps, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret,
    )
    return outs[0], (outs, zin_p, w_in, beta)


def _mid_ff_bwd(n_steps, alif, alpha, rho, threshold, gamma, spike_func,
                interpret, res, g_z):
    outs, zin_p, w_in, beta = res
    z, *residuals = outs
    g_z_in, g_w_in, _ = _mid_bwd_call(
        g_z, tuple(residuals), z, zin_p, w_in, None, beta, T=n_steps,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold, gamma=gamma,
        spike_func=spike_func,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret,
    )
    return g_z_in, g_w_in, jnp.zeros_like(jnp.asarray(beta))


fused_mid_ff_scan.defvjp(_mid_ff_fwd, _mid_ff_bwd)
