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


def _block_shape(batch: int, hidden: int):
    """Hardware-aligned tile: sublane multiple of 8, lane width 128.
    Smaller inputs are padded up (harmless: lanes are independent)."""
    bb = min(_MAX_BLOCK_B, -(-batch // _SUBLANE) * _SUBLANE)
    return bb, _LANE


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
def _alif_fwd_kernel(i_ref, beta_ref, z_ref, v_ref, a_ref, v_scr, a_scr,
                     z_scr, *, alpha, rho, threshold, gamma, spike_func):
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        v_scr[:] = jnp.zeros_like(v_scr)
        a_scr[:] = jnp.zeros_like(a_scr)
        z_scr[:] = jnp.zeros_like(z_scr)

    z_prev = z_scr[:]
    v = (alpha * v_scr[:] + i_ref[0]) * (1.0 - z_prev)
    a = rho * a_scr[:] + z_prev
    dyn_threshold = threshold + beta_ref[0, 0] * a
    z = (v >= dyn_threshold).astype(v.dtype)
    v_scr[:] = v
    a_scr[:] = a
    z_scr[:] = z
    z_ref[0] = z
    v_ref[0] = v
    a_ref[0] = a
    del gamma, spike_func  # gamma only matters in the backward


def _lif_fwd_kernel(i_ref, z_ref, v_ref, v_scr, z_scr,
                    *, alpha, threshold, gamma, spike_func):
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        v_scr[:] = jnp.zeros_like(v_scr)
        z_scr[:] = jnp.zeros_like(z_scr)

    z_prev = z_scr[:]
    v = (alpha * v_scr[:] + i_ref[0]) * (1.0 - z_prev)
    z = (v >= threshold).astype(v.dtype)
    v_scr[:] = v
    z_scr[:] = z
    z_ref[0] = z
    v_ref[0] = v
    del gamma, spike_func


# ---------------------------------------------------------------------------
# Backward kernels (reverse time)
# ---------------------------------------------------------------------------
def _alif_bwd_kernel(beta_ref, gz_ref, v_ref, a_ref, zprev_ref, gi_ref,
                     carry_scr, *, alpha, rho, threshold, gamma, spike_func):
    t = pl.program_id(2)  # forward step index is T-1-t via index maps

    @pl.when(t == 0)
    def _():
        carry_scr[:] = jnp.zeros_like(carry_scr)

    dyn_threshold = threshold + beta_ref[0, 0] * a_ref[0]
    surr = _surrogate_grad(spike_func, v_ref[0], dyn_threshold, gamma)
    dv = gz_ref[0] * surr + carry_scr[:]
    gi = dv * (1.0 - zprev_ref[0])
    gi_ref[0] = gi
    carry_scr[:] = alpha * gi
    del rho


def _lif_bwd_kernel(gz_ref, v_ref, zprev_ref, gi_ref, carry_scr,
                    *, alpha, threshold, gamma, spike_func):
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        carry_scr[:] = jnp.zeros_like(carry_scr)

    surr = _surrogate_grad(spike_func, v_ref[0], threshold, gamma)
    dv = gz_ref[0] * surr + carry_scr[:]
    gi = dv * (1.0 - zprev_ref[0])
    gi_ref[0] = gi
    carry_scr[:] = alpha * gi


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------
def _smem_scalar_spec():
    return pl.BlockSpec((1, 1), lambda b, h, t: (0, 0),
                        memory_space=pltpu.SMEM)


def _fwd_call(kernel, currents, scalars, n_state_outputs, bb, bh, interpret):
    """``scalars``: traced (1,1) SMEM inputs (e.g. a learnable-but-frozen
    beta), passed AFTER the currents."""
    T, B, H = currents.shape
    grid = (B // bb, H // bh, T)
    spec = pl.BlockSpec((1, bb, bh), lambda b, h, t: (t, b, h),
                        memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((T, B, H), currents.dtype)] * (
        1 + n_state_outputs
    )
    scratch = [pltpu.VMEM((bb, bh), currents.dtype)] * (1 + n_state_outputs)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] + [_smem_scalar_spec()] * len(scalars),
        out_specs=[spec] * (1 + n_state_outputs),
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(currents, *scalars)


def _bwd_call(kernel, scalars, operands, bb, bh, interpret):
    """``operands``: (T, B, H) arrays read at reversed time; the last one
    is the shifted z_{t-1} trace (zero-padded by the caller, no clamping
    needed).  ``scalars``: traced (1,1) SMEM inputs, passed FIRST."""
    T, B, H = operands[0].shape
    grid = (B // bb, H // bh, T)
    # reverse-time block index: forward step T-1-t
    rev = pl.BlockSpec((1, bb, bh), lambda b, h, t, T=T: (T - 1 - t, b, h),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_smem_scalar_spec()] * len(scalars) + [rev] * len(operands),
        out_specs=rev,
        out_shape=jax.ShapeDtypeStruct((T, B, H), operands[0].dtype),
        scratch_shapes=[pltpu.VMEM((bb, bh), operands[0].dtype)],
        interpret=interpret,
    )(*scalars, *operands)


def _shift_prev(z):
    """z_{t-1} aligned at index t (zero initial state)."""
    return jnp.concatenate([jnp.zeros_like(z[:1]), z[:-1]], axis=0)


def pallas_supported() -> bool:
    """Whether the current default backend can run these kernels natively."""
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Public custom_vjp wrappers
# ---------------------------------------------------------------------------
@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(2, 3, 4, 5, 6, 7),
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
) -> jax.Array:
    """Fused feedforward ALIF recurrence: currents (T,B,H) -> spikes.

    Equivalent to scanning ops/cells.alif_step with
    ``precomputed_input_current=True`` and no recurrent weights, but one
    kernel instead of T fused loop iterations.  ``beta`` may be a traced
    scalar (a learnable beta -- it rides in SMEM and receives a zero
    cotangent, faithful to quirk Q3).
    """
    z, _, _ = _alif_scan_fwd_impl(
        currents, beta, alpha, rho, threshold, gamma, spike_func, interpret
    )
    return z


def _beta_scalar(beta, dtype):
    return jnp.asarray(beta, dtype).reshape(1, 1)


def _alif_scan_fwd_impl(currents, beta, alpha, rho, threshold, gamma,
                        spike_func, interpret):
    T, B, H = currents.shape
    bb, bh = _block_shape(B, H)
    padded = _pad(currents, bb, bh)
    kernel = functools.partial(
        _alif_fwd_kernel, alpha=alpha, rho=rho, threshold=threshold,
        gamma=gamma, spike_func=spike_func,
    )
    z, v, a = _fwd_call(
        kernel, padded, [_beta_scalar(beta, currents.dtype)], 2, bb, bh,
        interpret,
    )
    return z[:, :B, :H], v[:, :B, :H], a[:, :B, :H]


def _alif_scan_fwd(currents, beta, alpha, rho, threshold, gamma, spike_func,
                   interpret):
    z, v, a = _alif_scan_fwd_impl(
        currents, beta, alpha, rho, threshold, gamma, spike_func, interpret
    )
    return z, (z, v, a, beta)


def _alif_scan_bwd(alpha, rho, threshold, gamma, spike_func, interpret,
                   res, g_z):
    z, v, a, beta = res
    T, B, H = z.shape
    bb, bh = _block_shape(B, H)
    z_prev = _shift_prev(z)
    operands = tuple(_pad(x, bb, bh) for x in (g_z, v, a, z_prev))
    kernel = functools.partial(
        _alif_bwd_kernel, alpha=alpha, rho=rho, threshold=threshold,
        gamma=gamma, spike_func=spike_func,
    )
    g_i = _bwd_call(
        kernel, [_beta_scalar(beta, z.dtype)], operands, bb, bh, interpret
    )
    # beta's cotangent is zero: the dynamic threshold path is dead in the
    # reference (spike_funcs.py:62) -- quirk Q3.
    return g_i[:, :B, :H], jnp.zeros_like(jnp.asarray(beta))


alif_scan.defvjp(_alif_scan_fwd, _alif_scan_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def lif_scan(
    currents: jax.Array,
    alpha: float,
    threshold: float,
    gamma: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
) -> jax.Array:
    """Fused feedforward LIF recurrence: currents (T,B,H) -> spikes."""
    z, _ = _lif_scan_fwd_impl(currents, alpha, threshold, gamma, spike_func,
                              interpret)
    return z


def _lif_scan_fwd_impl(currents, alpha, threshold, gamma, spike_func, interpret):
    T, B, H = currents.shape
    bb, bh = _block_shape(B, H)
    padded = _pad(currents, bb, bh)
    kernel = functools.partial(
        _lif_fwd_kernel, alpha=alpha, threshold=threshold, gamma=gamma,
        spike_func=spike_func,
    )
    z, v = _fwd_call(kernel, padded, [], 1, bb, bh, interpret)
    return z[:, :B, :H], v[:, :B, :H]


def _lif_scan_fwd(currents, alpha, threshold, gamma, spike_func, interpret):
    z, v = _lif_scan_fwd_impl(currents, alpha, threshold, gamma, spike_func,
                              interpret)
    return z, (z, v)


def _lif_scan_bwd(alpha, threshold, gamma, spike_func, interpret, res, g_z):
    z, v = res
    T, B, H = z.shape
    bb, bh = _block_shape(B, H)
    z_prev = _shift_prev(z)
    operands = tuple(_pad(x, bb, bh) for x in (g_z, v, z_prev))
    kernel = functools.partial(
        _lif_bwd_kernel, alpha=alpha, threshold=threshold, gamma=gamma,
        spike_func=spike_func,
    )
    g_i = _bwd_call(kernel, [], operands, bb, bh, interpret)
    return (g_i[:, :B, :H],)


lif_scan.defvjp(_lif_scan_fwd, _lif_scan_bwd)
