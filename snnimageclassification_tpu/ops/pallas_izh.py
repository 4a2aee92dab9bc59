"""Pallas TPU kernels: fused Izhikevich time scans (feedforward + recurrent).

Completes the fused-kernel coverage of the neuron families (LIF/ALIF live
in pallas_scan.py / pallas_rec.py).  Same architecture: grid with time
innermost, state in VMEM scratch, optional in-kernel recurrent matmul.

Dynamics (ops/cells.izhikevich_step; reference spiking_layers.py:337-353),
with ``r = z_{t-1}`` detached:

    cur_t = i_t (+ z_{t-1} @ W)
    v_t   = (v_{t-1} + dt*(k(v-vr)(v-vth) - u + cur)/C)(1-r) + c*r
    u_t   = u_{t-1} + dt*a*(b(v_{t-1}-vr) - u_{t-1}) + d*r
    z_t   = H(v_t - v_peak)     (surrogate grad w.r.t. v only)

Backward: two carries (dL/dv_{t+1}, dL/du_{t+1}); the reset and the
v_peak threshold argument are gradient-dead (same quirks as LIF/ALIF).
At reverse step t:

    dcur_next = dv_next * (dt/C) * (1 - z_t)
    dz_t = g_z[t] (+ dcur_next @ W^T)
    dv_t = dz_t*surr'(v_t, v_peak)
         + dv_next*(1 + (dt*k/C)*(2*v_t - vr - vth))*(1 - z_t)
         + du_next*(dt*a*b)
    du_t = -dcur_next + du_next*(1 - dt*a)
    g_i[t] = dv_t * (dt/C) * (1 - z_{t-1})
    dW += z_{t-1}^T @ g_i[t]

Residuals: the v and z traces (u is not needed -- every partial involving
u is state-independent).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_rec import _block_b, _pad_bh, _pad_w
from .pallas_scan import _surrogate_grad, _time_block, _zprev_k
from .surrogate import SpikeFuncType

__all__ = ["izh_scan"]

_LANE = 128


def _fwd_kernel(i_ref, w_ref, z_ref, v_ref, v_scr, u_scr, z_scr, *,
                K, has_w, dt, C, v_rest, v_th, k, a, b, c, d, v_peak):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        v_scr[:] = jnp.full_like(v_scr, v_rest)  # spiking_layers.py:317-322
        u_scr[:] = jnp.zeros_like(u_scr)
        z_scr[:] = jnp.zeros_like(z_scr)

    v_prev, u_prev, z_prev = v_scr[:], u_scr[:], z_scr[:]
    for kk in range(K):  # K steps per invocation, statically unrolled
        cur = i_ref[kk]
        if has_w:
            cur = cur + jnp.dot(z_prev.astype(w_ref.dtype), w_ref[:],
                                preferred_element_type=jnp.float32)
        dvdt = k * (v_prev - v_rest) * (v_prev - v_th) - u_prev + cur
        v = (v_prev + dt * dvdt / C) * (1.0 - z_prev) + c * z_prev
        dudt = a * (b * (v_prev - v_rest) - u_prev)
        u = (u_prev + dt * dudt) + d * z_prev
        z = (v >= v_peak).astype(v.dtype)
        z_ref[kk] = z
        v_ref[kk] = v
        v_prev, u_prev, z_prev = v, u, z
    v_scr[:] = v_prev
    u_scr[:] = u_prev
    z_scr[:] = z_prev


def _bwd_kernel(refs, *, K, has_w, dt, C, v_rest, v_th, k, a, b, v_peak,
                gamma, spike_func):
    if has_w:
        (gz_ref, v_ref, z_ref, zb_ref, w_ref,
         gi_ref, dwr_ref, dv_scr, du_scr) = refs
    else:
        gz_ref, v_ref, z_ref, zb_ref, gi_ref, dv_scr, du_scr = refs
        w_ref = dwr_ref = None
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dv_scr[:] = jnp.zeros_like(dv_scr)
        du_scr[:] = jnp.zeros_like(du_scr)
        if has_w:
            dwr_ref[0] = jnp.zeros_like(dwr_ref[0])

    is_first_block = t == pl.num_programs(1) - 1
    dv_next, du_next = dv_scr[:], du_scr[:]
    for kk in reversed(range(K)):  # reverse time inside the block
        v_t, z_t = v_ref[kk], z_ref[kk]
        z_prev = _zprev_k(z_ref, zb_ref, kk, is_first_block)
        not_reset_next = 1.0 - z_t   # the (1-r) factor inside step t+1
        dcur_next = dv_next * (dt / C) * not_reset_next
        dz = gz_ref[kk]
        if has_w:
            dz = dz + jax.lax.dot_general(
                dcur_next.astype(w_ref.dtype), w_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        surr = _surrogate_grad(spike_func, v_t, v_peak, gamma)
        dv = (
            dz * surr
            + dv_next * (1.0 + (dt * k / C) * (2.0 * v_t - v_rest - v_th))
            * not_reset_next
            + du_next * (dt * a * b)
        )
        du = -dcur_next + du_next * (1.0 - dt * a)
        gi = dv * (dt / C) * (1.0 - z_prev)
        gi_ref[kk] = gi
        dv_next, du_next = dv, du
    if has_w:
        # W_rec partial: rows 1..K-1 as one big MXU matmul (z rows shift
        # within the block) + one bb-row matmul for the k=0 boundary.
        K_, bb_, H_ = gi_ref.shape
        if K_ > 1:
            dwr_ref[0] += jax.lax.dot_general(
                z_ref[: K_ - 1].reshape((K_ - 1) * bb_, H_).astype(w_ref.dtype),
                gi_ref[1:].reshape((K_ - 1) * bb_, H_).astype(w_ref.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        zb0 = _zprev_k(z_ref, zb_ref, 0, is_first_block)
        dwr_ref[0] += jax.lax.dot_general(
            zb0.astype(w_ref.dtype), gi_ref[0].astype(w_ref.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dv_scr[:] = dv_next
    du_scr[:] = du_next


def _fwd_call(currents, w_rec, kp, interpret):
    T, B, H = currents.shape
    H_pad = -(-H // _LANE) * _LANE
    K = _time_block(T)
    bb = _block_b(B, K, H_pad, n_blocks=3)  # in + z/v out
    ip = _pad_bh(currents, bb, H_pad)
    has_w = w_rec is not None
    wp = _pad_w(w_rec, H_pad) if has_w else jnp.zeros((8, _LANE), currents.dtype)
    Bp = ip.shape[1]
    grid = (Bp // bb, T // K)
    tr_spec = pl.BlockSpec((K, bb, H_pad), lambda bi, t: (t, bi, 0),
                           memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(wp.shape, lambda bi, t: (0, 0),
                          memory_space=pltpu.VMEM)

    kernel = functools.partial(_fwd_kernel, K=K, has_w=has_w, **kp)
    z, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tr_spec, w_spec],
        out_specs=[tr_spec, tr_spec],
        out_shape=[jax.ShapeDtypeStruct((T, Bp, H_pad), currents.dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((bb, H_pad), currents.dtype)] * 3,
        interpret=interpret,
    )(ip, wp)
    return z[:, :B, :H], v[:, :B, :H]


def _bwd_call(g_z, v, z, w_rec, kp, gamma, spike_func, interpret):
    T, B, H = g_z.shape
    H_pad = -(-H // _LANE) * _LANE
    K = _time_block(T)
    bb = _block_b(B, K, H_pad, n_blocks=4)  # gz/v/z in + gi out
    has_w = w_rec is not None
    operands = [_pad_bh(x, bb, H_pad) for x in (g_z, v, z)]
    Bp = operands[0].shape[1]
    nb = T // K
    grid = (Bp // bb, nb)
    rev = pl.BlockSpec(
        (K, bb, H_pad), lambda bi, t, n=nb: (n - 1 - t, bi, 0),
        memory_space=pltpu.VMEM,
    )
    zb = pl.BlockSpec(
        (1, bb, H_pad),
        lambda bi, t, n=nb, K=K: (jnp.maximum((n - 1 - t) * K - 1, 0), bi, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [rev] * 3 + [zb]
    out_shapes = [jax.ShapeDtypeStruct((T, Bp, H_pad), g_z.dtype)]
    out_specs = [rev]
    call_args = list(operands) + [operands[2]]  # z again for the boundary
    if has_w:
        wp = _pad_w(w_rec, H_pad)
        in_specs.append(pl.BlockSpec((H_pad, H_pad), lambda bi, t: (0, 0),
                                     memory_space=pltpu.VMEM))
        out_specs.append(pl.BlockSpec((1, H_pad, H_pad),
                                      lambda bi, t: (bi, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((Bp // bb, H_pad, H_pad), g_z.dtype)
        )
        call_args.append(wp)

    bwd_kp = {n: kp[n] for n in ("dt", "C", "v_rest", "v_th", "k", "a", "b",
                                 "v_peak")}

    def kernel(*refs):
        _bwd_kernel(refs, K=K, has_w=has_w, gamma=gamma,
                    spike_func=spike_func, **bwd_kp)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((bb, H_pad), g_z.dtype)] * 2,
        interpret=interpret,
    )(*call_args)
    if has_w:
        g_i, dwr = outs
        g_wr = jnp.sum(dwr, axis=0)[:H, :H].astype(w_rec.dtype)
        return g_i[:, :B, :H], g_wr
    return outs[0][:, :B, :H], None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def izh_scan(
    currents: jax.Array,
    w_rec,
    kernel_params: tuple,
    gamma: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
) -> jax.Array:
    """Fused Izhikevich recurrence: currents (T,B,H) [, masked W_rec] ->
    spikes.  ``kernel_params`` is the hashable tuple of the 10 scalar
    dynamics constants (see :func:`izh_scan_from_config`); ``w_rec`` may
    be None for feedforward layers.
    """
    z, _ = _fwd_call(currents, w_rec, dict(kernel_params), interpret)
    return z


def _izh_fwd(currents, w_rec, kernel_params, gamma, spike_func, interpret):
    z, v = _fwd_call(currents, w_rec, dict(kernel_params), interpret)
    return z, (z, v, w_rec)


def _izh_bwd(kernel_params, gamma, spike_func, interpret, res, g_z):
    z, v, w_rec = res
    g_i, g_wr = _bwd_call(
        g_z, v, z, w_rec, dict(kernel_params), gamma, spike_func, interpret,
    )
    return g_i, g_wr


izh_scan.defvjp(_izh_fwd, _izh_bwd)


def izh_kernel_params(lcfg) -> tuple:
    """Hashable dynamics-constant tuple from an IzhikevichConfig."""
    return tuple(
        (n, getattr(lcfg, n))
        for n in ("dt", "C", "v_rest", "v_th", "k", "a", "b", "c", "d",
                  "v_peak")
    )
