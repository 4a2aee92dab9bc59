"""Pallas TPU kernels: fused *recurrent* LIF/ALIF time scans.

The recurrent hidden layer is the irreducibly sequential part of the
flagship model: per step, ``cur_t = i_t + z_{t-1} @ W_rec`` followed by
elementwise dynamics.  XLA's ``lax.scan`` pays per-iteration loop overhead
T times in the forward and T more in the backward; these kernels run the
whole loop on-chip -- grid ``(B/bB, T)`` with time innermost, membrane
state and ``W_rec`` resident in VMEM, the recurrent matmul on the MXU
inside the kernel, and current/output tiles double-buffered from HBM.

Backward derivation (see ops/pallas_scan.py for the feedforward case; the
same two reference quirks kill the reset and adaptation gradient paths):

    live consumers of z_t: downstream trace (g_z[t]) and cur_{t+1} matmul
    carry: dcur_{t+1} = dv_{t+1} * (1 - z_t)

    reverse step t:
      dz_t   = g_z[t] + dcur_carry @ W_rec^T
      dv_t   = dz_t * surr'(v_t, A_t) + alpha * dcur_carry
      dcur_t = dv_t * (1 - z_{t-1})          -> g_i[t]
      dW_rec += z_{t-1}^T @ dcur_t           (accumulated in VMEM)
      dcur_carry <- dcur_t

Per-batch-tile partial ``dW_rec`` blocks are summed outside the kernel.

Batch rows are independent given the weights, so batch tiles parallelize
over the grid's first axis.  The hidden width is processed whole (the
matmul couples lanes); H is padded up to the 128-lane multiple -- padded
lanes carry zero weights and zero currents, so they never spike and never
contaminate real lanes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_scan import (
    _fit_block_b,
    _surrogate_grad,
    _time_block,
    _use_delta_residual,
)
from .surrogate import SpikeFuncType

__all__ = ["rec_lif_scan", "rec_alif_scan"]

_LANE = 128
_SUBLANE = 8
_MAX_BLOCK_B = 512


def _block_b(batch: int, K: int = 1, H_pad: int = _LANE,
             n_blocks: int = 4) -> int:
    bb = min(_MAX_BLOCK_B, -(-batch // _SUBLANE) * _SUBLANE)
    return _fit_block_b(bb, K, H_pad, n_blocks)


def _pad_bh(x, bb, H_pad):
    T, B, H = x.shape
    pb = (-B) % bb
    ph = H_pad - H
    if pb or ph:
        x = jnp.pad(x, ((0, 0), (0, pb), (0, ph)))
    return x


def _pad_w(w, H_pad):
    H = w.shape[0]
    if H_pad != H:
        w = jnp.pad(w, ((0, H_pad - H), (0, H_pad - H)))
    return w


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------
def _rec_fwd_kernel(i_ref, w_ref, beta_ref, out_refs_and_scratch, *, K, alif,
                    alpha, rho, threshold, store_delta=False,
                    store_traces=True):
    """``store_delta`` (ALIF + FastSigmoid): the backward needs only
    ``v - A`` (see pallas_scan._use_delta_residual), so the kernel writes
    z + delta instead of z + v + a -- one less full HBM output pass.
    ``store_traces=False`` (inference, the custom_vjp primal): only the z
    spike trace is written; the backward-only residuals never touch HBM."""
    if not store_traces:
        if alif:
            z_ref, v_scr, a_scr, z_scr = out_refs_and_scratch
        else:
            z_ref, v_scr, z_scr = out_refs_and_scratch
            a_scr = None
        v_ref = a_ref = d_ref = None
    elif alif and store_delta:
        z_ref, d_ref, v_scr, a_scr, z_scr = out_refs_and_scratch
        v_ref = a_ref = None
    elif alif:
        z_ref, v_ref, a_ref, v_scr, a_scr, z_scr = out_refs_and_scratch
        d_ref = None
    else:
        z_ref, v_ref, v_scr, z_scr = out_refs_and_scratch
        a_ref = a_scr = d_ref = None
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        v_scr[:] = jnp.zeros_like(v_scr)
        z_scr[:] = jnp.zeros_like(z_scr)
        if alif:
            a_scr[:] = jnp.zeros_like(a_scr)

    # K steps per grid invocation (statically unrolled) amortize the
    # per-invocation prologue and K-x the DMA transfer sizes; W stays
    # VMEM-resident throughout (constant index map).
    w = w_ref[:]
    v_c = v_scr[:]
    z_prev = z_scr[:]
    a_c = a_scr[:] if alif else None
    trace_dtype = z_ref.dtype  # bf16 under SNNConfig.matmul_dtype
    for k in range(K):
        # Operand dtype follows W (bf16 under SNNConfig.matmul_dtype;
        # spikes are 0/1 and exact); accumulation stays float32.
        rec = jnp.dot(z_prev.astype(w.dtype), w,
                      preferred_element_type=jnp.float32)
        v_c = (alpha * v_c + i_ref[k] + rec) * (1.0 - z_prev)
        if alif:
            a_c = rho * a_c + z_prev
            dyn_threshold = threshold + beta_ref[0, 0] * a_c
        else:
            dyn_threshold = threshold
        delta = v_c - dyn_threshold
        z_prev = (delta >= 0).astype(v_c.dtype)
        z_ref[k] = z_prev.astype(trace_dtype)  # 0/1: exact in bf16
        if d_ref is not None:
            d_ref[k] = delta.astype(trace_dtype)
        elif v_ref is not None:
            v_ref[k] = v_c.astype(trace_dtype)
            if alif:
                a_ref[k] = a_c.astype(trace_dtype)
    v_scr[:] = v_c
    z_scr[:] = z_prev
    if alif:
        a_scr[:] = a_c


def _rec_fwd_call(currents, w_rec, beta, *, alif, alpha, rho, threshold,
                  interpret, store_delta=False, store_traces=True):
    T, B, H = currents.shape
    H_pad = -(-H // _LANE) * _LANE
    K = _time_block(T)
    if store_traces:
        n_out = (2 if store_delta else 3) if alif else 2
    else:
        n_out = 1
    n_scr = 3 if alif else 2
    bb = _block_b(B, K, H_pad, n_blocks=1 + n_out)
    if w_rec.dtype == jnp.bfloat16:
        bb = max(16, -(-bb // 16) * 16)  # bf16 trace sublane multiple
    ip = _pad_bh(currents, bb, H_pad)
    wp = _pad_w(w_rec, H_pad)  # keeps w_rec's dtype (may be bf16)
    beta_s = jnp.asarray(beta, currents.dtype).reshape(1, 1)
    Bp = ip.shape[1]
    grid = (Bp // bb, T // K)
    tr_spec = pl.BlockSpec((K, bb, H_pad), lambda b, t: (t, b, 0),
                           memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((H_pad, H_pad), lambda b, t: (0, 0),
                          memory_space=pltpu.VMEM)
    beta_spec = pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.SMEM)

    def kernel(i_ref, w_ref, beta_ref, *rest):
        _rec_fwd_kernel(i_ref, w_ref, beta_ref, rest, K=K, alif=alif,
                        alpha=alpha, rho=rho, threshold=threshold,
                        store_delta=store_delta, store_traces=store_traces)

    # Trace storage follows W's dtype: under SNNConfig.matmul_dtype=bf16
    # the z/delta traces are stored bf16 (z is 0/1, exact; delta only
    # feeds the surrogate backward in that opt-in reduced-precision
    # mode), halving their HBM traffic and letting downstream bf16
    # matmuls consume z without a cast pass.
    trace_dtype = wp.dtype if jnp.issubdtype(wp.dtype, jnp.floating) else currents.dtype
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tr_spec, w_spec, beta_spec],
        out_specs=[tr_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((T, Bp, H_pad), trace_dtype)] * n_out,
        scratch_shapes=[pltpu.VMEM((bb, H_pad), currents.dtype)] * n_scr,
        interpret=interpret,
    )(ip, wp, beta_s)
    return tuple(o[:, :B, :H] for o in outs)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------
def _rec_bwd_kernel(refs, *, K, alif, alpha, rho, threshold, gamma,
                    spike_func, store_delta=False):
    if alif and store_delta:
        (gz_ref, d_ref, z_ref, zb_ref, w_ref, beta_ref,
         gi_ref, dwr_ref, dcur_scr) = refs
        v_ref = a_ref = None
    elif alif:
        (gz_ref, v_ref, a_ref, z_ref, zb_ref, w_ref, beta_ref,
         gi_ref, dwr_ref, dcur_scr) = refs
        d_ref = None
    else:
        (gz_ref, v_ref, z_ref, zb_ref, w_ref, beta_ref,
         gi_ref, dwr_ref, dcur_scr) = refs
        a_ref = d_ref = None
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dcur_scr[:] = jnp.zeros_like(dcur_scr)
        dwr_ref[0] = jnp.zeros_like(dwr_ref[0])

    from .pallas_scan import _zprev_k

    is_first_block = t == pl.num_programs(1) - 1
    w = w_ref[:]
    dcur_carry = dcur_scr[:]
    f32 = jnp.float32  # traces may be stored bf16; compute stays f32
    for k in reversed(range(K)):  # reverse time inside the block
        if alif and store_delta:
            # FastSigmoid's surrogate is a function of v - A alone.
            surr = _surrogate_grad(spike_func, d_ref[k].astype(f32), 0.0,
                                   gamma)
        else:
            if alif:
                dyn_threshold = (
                    threshold + beta_ref[0, 0] * a_ref[k].astype(f32)
                )
            else:
                dyn_threshold = threshold
            surr = _surrogate_grad(spike_func, v_ref[k].astype(f32),
                                   dyn_threshold, gamma)
        # dz_t = g_z[t] + dcur_{t+1} @ W_rec^T
        dz = gz_ref[k].astype(f32) + jax.lax.dot_general(
            dcur_carry.astype(w.dtype), w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv = dz * surr + alpha * dcur_carry
        dcur = dv * (1.0 - _zprev_k(z_ref, zb_ref, k, is_first_block))
        gi_ref[k] = dcur
        # dW_rec partial: z_{t-1}^T @ dcur_t.  The k=0 predecessor row is
        # handled separately below, so accumulate rows 1..K-1 here as one
        # (K-1)*bb-row MXU matmul plus one bb-row matmul for the boundary.
        dcur_carry = dcur
    K_, bb_, H_ = gi_ref.shape
    if K_ > 1:
        zp_flat = z_ref[: K_ - 1].reshape((K_ - 1) * bb_, H_)
        gi_flat = gi_ref[1:].reshape((K_ - 1) * bb_, H_)
        dwr_ref[0] += jax.lax.dot_general(
            zp_flat.astype(w.dtype), gi_flat.astype(w.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    zb0 = _zprev_k(z_ref, zb_ref, 0, is_first_block)
    dwr_ref[0] += jax.lax.dot_general(
        zb0.astype(w.dtype), gi_ref[0].astype(w.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dcur_scr[:] = dcur_carry
    del rho


def _rec_bwd_call(g_z, residuals, z, w_rec, beta, *, alif, alpha, rho,
                  threshold, gamma, spike_func, interpret,
                  store_delta=False):
    """``residuals``: (v, a) traces, or (delta,) when ``store_delta``.
    ``z`` is the unshifted spike trace -- read through the reverse-time
    spec plus a single-row boundary spec for z_{t-1} at block edges (no
    materialized shifted copy)."""
    T, B, H = g_z.shape
    H_pad = -(-H // _LANE) * _LANE
    K = _time_block(T)
    n_big = 1 + len(residuals) + 1 + 1  # gz + residuals + z + gi out
    bb = _block_b(B, K, H_pad, n_blocks=n_big)
    if any(x.dtype == jnp.bfloat16 for x in (g_z, *residuals, z)):
        bb = max(16, -(-bb // 16) * 16)  # bf16 sublane multiple
    operands = [g_z, *residuals, z]
    operands = [_pad_bh(x, bb, H_pad) for x in operands]
    wp = _pad_w(w_rec, H_pad)
    beta_s = jnp.asarray(beta, jnp.float32).reshape(1, 1)
    Bp = operands[0].shape[1]
    nb = T // K
    grid = (Bp // bb, nb)
    rev_spec = pl.BlockSpec(
        (K, bb, H_pad), lambda b, t, n=nb: (n - 1 - t, b, 0),
        memory_space=pltpu.VMEM,
    )
    zb_spec = pl.BlockSpec(
        (1, bb, H_pad),
        lambda b, t, n=nb, K=K: (jnp.maximum((n - 1 - t) * K - 1, 0), b, 0),
        memory_space=pltpu.VMEM,
    )
    w_spec = pl.BlockSpec((H_pad, H_pad), lambda b, t: (0, 0),
                          memory_space=pltpu.VMEM)
    beta_spec = pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.SMEM)
    dwr_spec = pl.BlockSpec((1, H_pad, H_pad), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        _rec_bwd_kernel(refs, K=K, alif=alif, alpha=alpha, rho=rho,
                        threshold=threshold, gamma=gamma,
                        spike_func=spike_func, store_delta=store_delta)

    g_i, dwr_partial = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[rev_spec] * len(operands) + [zb_spec, w_spec, beta_spec],
        out_specs=[rev_spec, dwr_spec],
        out_shape=[
            # gi is the cotangent of the float32 currents; the carries and
            # dW accumulation stay float32 regardless of trace dtype.
            jax.ShapeDtypeStruct((T, Bp, H_pad), jnp.float32),
            jax.ShapeDtypeStruct((Bp // bb, H_pad, H_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bb, H_pad), jnp.float32)],
        interpret=interpret,
    )(*operands, operands[-1], wp, beta_s)
    g_wr = jnp.sum(dwr_partial, axis=0)[:H, :H].astype(w_rec.dtype)
    return g_i[:, :B, :H], g_wr


# ---------------------------------------------------------------------------
# custom_vjp wrappers
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def rec_alif_scan(
    currents: jax.Array,
    w_rec: jax.Array,
    beta,
    alpha: float,
    rho: float,
    threshold: float,
    gamma: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
) -> jax.Array:
    """Fused recurrent ALIF: (currents (T,B,H), masked W_rec) -> spikes.

    ``w_rec`` must already be eye-masked (ops/cells.masked_recurrent); the
    eye mask's gradient zeroing happens automatically outside.  ``beta``
    may be a traced scalar (rides in SMEM, zero cotangent -- quirk Q3).
    """
    return _rec_fwd_call(
        currents, w_rec, beta, alif=True, alpha=alpha, rho=rho,
        threshold=threshold, interpret=interpret,
        store_delta=_use_delta_residual(spike_func), store_traces=False,
    )[0]


def _rec_alif_fwd(currents, w_rec, beta, alpha, rho, threshold, gamma,
                  spike_func, interpret):
    outs = _rec_fwd_call(
        currents, w_rec, beta, alif=True, alpha=alpha, rho=rho,
        threshold=threshold, interpret=interpret,
        store_delta=_use_delta_residual(spike_func),
    )
    return outs[0], (*outs, w_rec, beta)


def _rec_alif_bwd(alpha, rho, threshold, gamma, spike_func, interpret,
                  res, g_z):
    z, *residuals, w_rec, beta = res
    g_i, g_wr = _rec_bwd_call(
        g_z, tuple(residuals), z, w_rec, beta, alif=True,
        alpha=alpha, rho=rho, threshold=threshold, gamma=gamma,
        spike_func=spike_func, interpret=interpret,
        store_delta=_use_delta_residual(spike_func),
    )
    return g_i, g_wr, jnp.zeros_like(jnp.asarray(beta))


rec_alif_scan.defvjp(_rec_alif_fwd, _rec_alif_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def rec_lif_scan(
    currents: jax.Array,
    w_rec: jax.Array,
    alpha: float,
    threshold: float,
    gamma: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
) -> jax.Array:
    """Fused recurrent LIF: (currents (T,B,H), masked W_rec) -> spikes."""
    (z,) = _rec_fwd_call(currents, w_rec, 0.0, alif=False, alpha=alpha,
                         rho=0.0, threshold=threshold, interpret=interpret,
                         store_traces=False)
    return z


def _rec_lif_fwd(currents, w_rec, alpha, threshold, gamma, spike_func,
                 interpret):
    z, v = _rec_fwd_call(currents, w_rec, 0.0, alif=False, alpha=alpha,
                         rho=0.0, threshold=threshold, interpret=interpret)
    return z, (z, v, w_rec)


def _rec_lif_bwd(alpha, threshold, gamma, spike_func, interpret, res, g_z):
    z, v, w_rec = res
    g_i, g_wr = _rec_bwd_call(
        g_z, (v,), z, w_rec, 0.0, alif=False, alpha=alpha,
        rho=0.0, threshold=threshold, gamma=gamma, spike_func=spike_func,
        interpret=interpret,
    )
    return g_i, g_wr


rec_lif_scan.defvjp(_rec_lif_fwd, _rec_lif_bwd)
