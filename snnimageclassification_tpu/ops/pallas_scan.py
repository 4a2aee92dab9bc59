"""Pallas TPU kernels: fused feedforward LIF/ALIF time scans.

After the per-layer-scan restructuring (models/snn.py), a feedforward
spiking layer is one big input-current matmul followed by a *purely
elementwise* sequential recurrence over T steps.  These kernels run that
recurrence entirely on-chip: grid ``(B/bB, H/bH, T)`` iterates time
innermost, membrane state lives in VMEM scratch across grid steps, and
Pallas double-buffers the current/output HBM tiles -- no per-step HLO
dispatch, no carry round-trips.

The backward pass is a hand-derived reverse-time kernel.  The gradient
structure is special because of two reference quirks baked into the
dynamics (see ops/cells.py, ops/surrogate.py):

* the reset multiplies by ``(1 - stop_grad(z))`` -- no gradient flows from
  ``v_{t+1}`` into ``z_t`` through the reset;
* the spike threshold argument has a **zero cotangent**
  (spike_funcs.py:62,79) -- ALIF's adaptation ``a`` feeds only the dynamic
  threshold, so ``dL/da == 0`` and the adaptation chain drops out of the
  backward entirely.

With ``v_t = (alpha*v_{t-1} + i_t) * (1 - z_{t-1})`` and
``z_t = H(v_t - A_t)`` the reverse recursion is just

    dv_t   = g_z[t] * surr'(v_t, A_t) + carry
    g_i[t] = dv_t * (1 - z_{t-1})
    carry  = alpha * g_i[t]            # == dL/dv_{t-1}

where ``surr'`` is the surrogate derivative (fast-sigmoid or triangular).

Residuals saved for the backward: the v / (a) / z traces the forward
kernel already produces.  Only z is exposed as the primal output; the
wrapper is a ``jax.custom_vjp``.

Use :func:`lif_scan` / :func:`alif_scan`; both fall back transparently to
shapes the kernel can't tile (see ``_pad``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .surrogate import SpikeFuncType, surrogate_grad as _surrogate_grad

__all__ = ["lif_scan", "alif_scan", "pallas_supported"]

_LANE = 128      # TPU lane width: last block dim
_SUBLANE = 8     # float32 sublane multiple
_MAX_BLOCK_B = 256
# VMEM budget for the revolving (K, bb, bh) HBM blocks (double-buffered by
# Mosaic).  ~12 MB of the ~16 MB/core keeps headroom for scratch + W.
_VMEM_BUDGET = 12 * 1024 * 1024


def _time_block(T: int, max_k: int = 16) -> int:
    """Steps per grid invocation: the largest divisor of T up to
    ``max_k``.  Divisors avoid time padding entirely; a prime T just
    degrades to the one-step-per-invocation schedule (K=1).

    Processing K steps per invocation amortizes the per-grid-step kernel
    prologue/epilogue and issues K-x larger DMA transfers -- measured 1.7x
    forward / 3.9x backward on v5e at T=100, B=8192, H=128 (the profiled
    42%-of-step-time recurrent kernels).
    """
    for k in range(min(max_k, T), 0, -1):
        if T % k == 0:
            return k
    return 1


def _fit_block_b(bb: int, K: int, bh: int, n_blocks: int, itemsize: int = 4):
    """Shrink the batch tile until the revolving blocks fit the VMEM
    budget: ``n_blocks`` distinct (K, bb, bh) HBM blocks, each
    double-buffered."""
    while bb > _SUBLANE and 2 * n_blocks * K * bb * bh * itemsize > _VMEM_BUDGET:
        # Keep the tile a sublane multiple: halving e.g. 200 -> 100 would
        # violate the TPU block-shape rule (second-minor % 8 == 0), which
        # bites for non-power-of-two batches (remainder val/test batches).
        bb = (bb // 2) // _SUBLANE * _SUBLANE
    return max(_SUBLANE, bb)


def _block_shape(batch: int, hidden: int, K: int = 1, n_blocks: int = 4):
    """Hardware-aligned tile: sublane multiple of 8, lane width 128.
    Smaller inputs are padded up (harmless: lanes are independent)."""
    bb = min(_MAX_BLOCK_B, -(-batch // _SUBLANE) * _SUBLANE)
    return _fit_block_b(bb, K, _LANE, n_blocks), _LANE


def _pad(x, bb, bh):
    """Pad (T, B, H) so B % bb == 0 and H % bh == 0.  Safe: the dynamics
    are independent per (b, h) lane, so padded lanes never contaminate
    real ones; outputs are sliced back."""
    T, B, H = x.shape
    pb = (-B) % bb
    ph = (-H) % bh
    if pb or ph:
        x = jnp.pad(x, ((0, 0), (0, pb), (0, ph)))
    return x


# ---------------------------------------------------------------------------
# Forward kernels
# ---------------------------------------------------------------------------
def _alif_fwd_kernel(i_ref, beta_ref, out_refs, v_scr, a_scr,
                     z_scr, *, K, alpha, rho, threshold, gamma, spike_func,
                     store_delta, store_traces=True):
    """``store_delta``: FastSigmoid's surrogate depends only on
    ``v - A`` (ops/surrogate.py), so the backward residual shrinks from
    (v, a) traces to a single delta trace -- one less full HBM pass in
    each direction.  Phi additionally needs A itself, so it keeps (v, a).
    ``store_traces=False`` (inference, the custom_vjp primal): only the z
    spike trace is written.
    """
    if not store_traces:
        (z_ref,) = out_refs
        v_ref = a_ref = d_ref = None
    elif store_delta:
        z_ref, d_ref = out_refs
        v_ref = a_ref = None
    else:
        z_ref, v_ref, a_ref = out_refs
        d_ref = None
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        v_scr[:] = jnp.zeros_like(v_scr)
        a_scr[:] = jnp.zeros_like(a_scr)
        z_scr[:] = jnp.zeros_like(z_scr)

    # K time steps per invocation (statically unrolled): the VMEM carry
    # stays in registers between sub-steps; only step k touches block
    # row k of the HBM tiles.
    trace_dtype = z_ref.dtype  # bf16 under SNNConfig.matmul_dtype
    v_c, a_c, z_prev = v_scr[:], a_scr[:], z_scr[:]
    for k in range(K):
        v_c = (alpha * v_c + i_ref[k]) * (1.0 - z_prev)
        a_c = rho * a_c + z_prev
        dyn_threshold = threshold + beta_ref[0, 0] * a_c
        delta = v_c - dyn_threshold
        z_prev = (delta >= 0).astype(v_c.dtype)
        z_ref[k] = z_prev.astype(trace_dtype)  # 0/1: exact in bf16
        if d_ref is not None:
            d_ref[k] = delta.astype(trace_dtype)
        elif v_ref is not None:
            v_ref[k] = v_c.astype(trace_dtype)
            a_ref[k] = a_c.astype(trace_dtype)
    v_scr[:] = v_c
    a_scr[:] = a_c
    z_scr[:] = z_prev
    del gamma, spike_func  # gamma only matters in the backward


def _lif_fwd_kernel(i_ref, *rest, K, alpha, threshold, gamma, spike_func,
                    store_traces=True):
    if store_traces:
        z_ref, v_ref, v_scr, z_scr = rest
    else:  # inference: no v residual leaves the kernel
        z_ref, v_scr, z_scr = rest
        v_ref = None
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        v_scr[:] = jnp.zeros_like(v_scr)
        z_scr[:] = jnp.zeros_like(z_scr)

    trace_dtype = z_ref.dtype
    v_c, z_prev = v_scr[:], z_scr[:]
    for k in range(K):
        v_c = (alpha * v_c + i_ref[k]) * (1.0 - z_prev)
        z_prev = (v_c >= threshold).astype(v_c.dtype)
        z_ref[k] = z_prev.astype(trace_dtype)
        if v_ref is not None:
            v_ref[k] = v_c.astype(trace_dtype)
    v_scr[:] = v_c
    z_scr[:] = z_prev
    del gamma, spike_func


# ---------------------------------------------------------------------------
# Backward kernels (reverse time)
# ---------------------------------------------------------------------------
def _zprev_k(z_ref, zb_ref, k, is_first_block):
    """z_{t-1} for in-block step k.

    The z trace is read directly (no materialized shifted copy): rows
    k >= 1 shift within the block; row 0's predecessor is the single
    boundary row loaded by the (1, bb, bh) companion spec, or the zero
    initial state for the first forward block."""
    f32 = jnp.float32
    if k > 0:
        return z_ref[k - 1].astype(f32)
    return jnp.where(is_first_block, 0.0, zb_ref[0].astype(f32))


def _alif_bwd_kernel(beta_ref, in_refs, gi_ref,
                     carry_scr, *, K, alpha, rho, threshold, gamma,
                     spike_func, store_delta):
    if store_delta:
        gz_ref, d_ref, z_ref, zb_ref = in_refs
        v_ref = a_ref = None
    else:
        gz_ref, v_ref, a_ref, z_ref, zb_ref = in_refs
        d_ref = None
    t = pl.program_id(2)  # forward block index is T/K-1-t via index maps

    @pl.when(t == 0)
    def _():
        carry_scr[:] = jnp.zeros_like(carry_scr)

    carry = carry_scr[:]
    f32 = jnp.float32  # traces may be stored bf16; compute stays f32
    for k in reversed(range(K)):  # reverse time inside the block
        if store_delta:
            # FastSigmoid's surrogate is a function of v - A alone.
            surr = _surrogate_grad(spike_func, d_ref[k].astype(f32), 0.0,
                                   gamma)
        else:
            dyn_threshold = threshold + beta_ref[0, 0] * a_ref[k].astype(f32)
            surr = _surrogate_grad(spike_func, v_ref[k].astype(f32),
                                   dyn_threshold, gamma)
        dv = gz_ref[k].astype(f32) * surr + carry
        gi = dv * (1.0 - _zprev_k(z_ref, zb_ref, k, t == pl.num_programs(2) - 1))
        gi_ref[k] = gi
        carry = alpha * gi
    carry_scr[:] = carry
    del rho


def _lif_bwd_kernel(gz_ref, v_ref, z_ref, zb_ref, gi_ref, carry_scr,
                    *, K, alpha, threshold, gamma, spike_func):
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        carry_scr[:] = jnp.zeros_like(carry_scr)

    carry = carry_scr[:]
    f32 = jnp.float32
    for k in reversed(range(K)):
        surr = _surrogate_grad(spike_func, v_ref[k].astype(f32), threshold,
                               gamma)
        dv = gz_ref[k].astype(f32) * surr + carry
        gi = dv * (1.0 - _zprev_k(z_ref, zb_ref, k, t == pl.num_programs(2) - 1))
        gi_ref[k] = gi
        carry = alpha * gi
    carry_scr[:] = carry


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------
def _smem_scalar_spec():
    return pl.BlockSpec((1, 1), lambda b, h, t: (0, 0),
                        memory_space=pltpu.SMEM)


def _fwd_call(kernel, currents, scalars, n_state_outputs, K, bb, bh,
              interpret, n_scratch=None, out_dtype=None):
    """``scalars``: traced (1,1) SMEM inputs (e.g. a learnable-but-frozen
    beta), passed AFTER the currents.  ``K`` time steps per invocation.
    ``out_dtype``: trace storage dtype (bf16 under SNNConfig.matmul_dtype);
    the in-kernel carries stay in the currents dtype."""
    T, B, H = currents.shape
    grid = (B // bb, H // bh, T // K)
    spec = pl.BlockSpec((K, bb, bh), lambda b, h, t: (t, b, h),
                        memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((T, B, H), out_dtype or currents.dtype)
    ] * (1 + n_state_outputs)
    scratch = [pltpu.VMEM((bb, bh), currents.dtype)] * (
        (1 + n_state_outputs) if n_scratch is None else n_scratch
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] + [_smem_scalar_spec()] * len(scalars),
        out_specs=[spec] * (1 + n_state_outputs),
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(currents, *scalars)


def _bwd_call(kernel, scalars, operands, K, bb, bh, interpret):
    """``operands``: (T, B, H) arrays read at reversed time; the LAST one
    must be the (unshifted) z trace -- it is additionally passed through a
    single-row "boundary" spec so the kernel can form z_{t-1} without a
    materialized shifted copy (which would cost a full extra HBM
    read+write pass).  ``scalars``: traced (1,1) SMEM inputs, passed
    FIRST.  Blocks cover K steps; in-block time reversal happens in the
    kernel."""
    T, B, H = operands[0].shape
    nb = T // K
    grid = (B // bb, H // bh, nb)
    # reverse-time block index: forward block nb-1-t
    rev = pl.BlockSpec(
        (K, bb, bh), lambda b, h, t, n=nb: (n - 1 - t, b, h),
        memory_space=pltpu.VMEM,
    )
    # boundary row: z[fb*K - 1] for forward block fb = nb-1-t (clamped at
    # fb=0; the kernel substitutes the zero initial state there).
    zb = pl.BlockSpec(
        (1, bb, bh),
        lambda b, h, t, n=nb, K=K: (jnp.maximum((n - 1 - t) * K - 1, 0), b, h),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_smem_scalar_spec()] * len(scalars)
        + [rev] * len(operands)
        + [zb],
        out_specs=rev,
        # gi is the cotangent of the float32 currents; the carry stays
        # float32 even when the residual operands are stored bf16.
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bb, bh), jnp.float32)],
        interpret=interpret,
    )(*scalars, *operands, operands[-1])


def pallas_supported() -> bool:
    """Whether the current default backend can run these kernels natively."""
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Public custom_vjp wrappers
# ---------------------------------------------------------------------------
@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(2, 3, 4, 5, 6, 7, 8),
)
def alif_scan(
    currents: jax.Array,
    beta,
    alpha: float,
    rho: float,
    threshold: float,
    gamma: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
    trace_dtype: str = "float32",
) -> jax.Array:
    """Fused feedforward ALIF recurrence: currents (T,B,H) -> spikes.

    Equivalent to scanning ops/cells.alif_step with
    ``precomputed_input_current=True`` and no recurrent weights, but one
    kernel instead of T fused loop iterations.  ``beta`` may be a traced
    scalar (a learnable beta -- it rides in SMEM and receives a zero
    cotangent, faithful to quirk Q3).  ``trace_dtype="bfloat16"``
    (SNNConfig.matmul_dtype mode) stores z/delta traces in bf16: spikes
    stay exact; only the surrogate backward sees rounded residuals.
    """
    return _alif_scan_fwd_impl(
        currents, beta, alpha, rho, threshold, gamma, spike_func, interpret,
        trace_dtype, store_traces=False,
    )[0]


def _beta_scalar(beta, dtype):
    return jnp.asarray(beta, dtype).reshape(1, 1)


def _use_delta_residual(spike_func) -> bool:
    """FastSigmoid's surrogate depends only on v - A, so the ALIF backward
    residual can be the single delta trace instead of (v, a)."""
    return spike_func == SpikeFuncType.FastSigmoid


def _bf16_bb(bb: int, trace_dtype) -> int:
    if jnp.dtype(trace_dtype) == jnp.bfloat16:
        return max(16, -(-bb // 16) * 16)  # bf16 sublane multiple
    return bb


def _alif_scan_fwd_impl(currents, beta, alpha, rho, threshold, gamma,
                        spike_func, interpret, trace_dtype="float32",
                        store_traces=True):
    T, B, H = currents.shape
    K = _time_block(T)
    store_delta = _use_delta_residual(spike_func)
    # z + (delta | v, a); inference stores z only
    n_out = (2 if store_delta else 3) if store_traces else 1
    bb, bh = _block_shape(B, H, K, n_blocks=1 + n_out)
    bb = _bf16_bb(bb, trace_dtype)
    padded = _pad(currents, bb, bh)

    def kernel(i_ref, beta_ref, *rest):
        _alif_fwd_kernel(
            i_ref, beta_ref, rest[:n_out], *rest[n_out:], K=K, alpha=alpha,
            rho=rho, threshold=threshold, gamma=gamma, spike_func=spike_func,
            store_delta=store_delta, store_traces=store_traces,
        )

    outs = _fwd_call(
        kernel, padded, [_beta_scalar(beta, currents.dtype)], n_out - 1,
        K, bb, bh, interpret, n_scratch=3, out_dtype=jnp.dtype(trace_dtype),
    )
    return tuple(o[:, :B, :H] for o in outs)


def _alif_scan_fwd(currents, beta, alpha, rho, threshold, gamma, spike_func,
                   interpret, trace_dtype):
    outs = _alif_scan_fwd_impl(
        currents, beta, alpha, rho, threshold, gamma, spike_func, interpret,
        trace_dtype,
    )
    return outs[0], (*outs, beta)


def _alif_scan_bwd(alpha, rho, threshold, gamma, spike_func, interpret,
                   trace_dtype, res, g_z):
    *outs, beta = res
    z = outs[0]
    T, B, H = z.shape
    K = _time_block(T)
    store_delta = _use_delta_residual(spike_func)
    # reversed-time operands: gz + (delta | v, a) + z, plus the boundary
    # row (appended by _bwd_call) and the gi out
    n_in = 4 if store_delta else 5
    bb, bh = _block_shape(B, H, K, n_blocks=n_in)
    bb = _bf16_bb(bb, trace_dtype)
    operands = tuple(_pad(x, bb, bh) for x in (g_z, *outs[1:], z))

    def kernel(beta_ref, *rest):
        _alif_bwd_kernel(
            beta_ref, rest[:n_in], *rest[n_in:], K=K, alpha=alpha, rho=rho,
            threshold=threshold, gamma=gamma, spike_func=spike_func,
            store_delta=store_delta,
        )

    g_i = _bwd_call(
        kernel, [_beta_scalar(beta, jnp.float32)], operands, K, bb, bh,
        interpret,
    )
    # beta's cotangent is zero: the dynamic threshold path is dead in the
    # reference (spike_funcs.py:62) -- quirk Q3.
    return g_i[:, :B, :H], jnp.zeros_like(jnp.asarray(beta))


alif_scan.defvjp(_alif_scan_fwd, _alif_scan_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def lif_scan(
    currents: jax.Array,
    alpha: float,
    threshold: float,
    gamma: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
    trace_dtype: str = "float32",
) -> jax.Array:
    """Fused feedforward LIF recurrence: currents (T,B,H) -> spikes."""
    (z,) = _lif_scan_fwd_impl(currents, alpha, threshold, gamma, spike_func,
                              interpret, trace_dtype, store_traces=False)
    return z


def _lif_scan_fwd_impl(currents, alpha, threshold, gamma, spike_func,
                       interpret, trace_dtype="float32", store_traces=True):
    T, B, H = currents.shape
    K = _time_block(T)
    n_out = 2 if store_traces else 1  # z (+ v residual when training)
    bb, bh = _block_shape(B, H, K, n_blocks=1 + n_out)
    bb = _bf16_bb(bb, trace_dtype)
    padded = _pad(currents, bb, bh)
    kernel = functools.partial(
        _lif_fwd_kernel, K=K, alpha=alpha, threshold=threshold, gamma=gamma,
        spike_func=spike_func, store_traces=store_traces,
    )
    outs = _fwd_call(kernel, padded, [], n_out - 1, K, bb, bh, interpret,
                     n_scratch=2, out_dtype=jnp.dtype(trace_dtype))
    return tuple(o[:, :B, :H] for o in outs)


def _lif_scan_fwd(currents, alpha, threshold, gamma, spike_func, interpret,
                  trace_dtype):
    z, v = _lif_scan_fwd_impl(currents, alpha, threshold, gamma, spike_func,
                              interpret, trace_dtype, store_traces=True)
    return z, (z, v)


def _lif_scan_bwd(alpha, threshold, gamma, spike_func, interpret,
                  trace_dtype, res, g_z):
    z, v = res
    T, B, H = z.shape
    K = _time_block(T)
    bb, bh = _block_shape(B, H, K, n_blocks=4)  # gz/v/z in + gi out
    bb = _bf16_bb(bb, trace_dtype)
    operands = tuple(_pad(x, bb, bh) for x in (g_z, v, z))
    kernel = functools.partial(
        _lif_bwd_kernel, K=K, alpha=alpha, threshold=threshold, gamma=gamma,
        spike_func=spike_func,
    )
    g_i = _bwd_call(kernel, [], operands, K, bb, bh, interpret)
    return (g_i[:, :B, :H],)


lif_scan.defvjp(_lif_scan_fwd, _lif_scan_bwd)
