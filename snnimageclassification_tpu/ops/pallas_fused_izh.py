"""Pallas TPU kernel: spike encoding + input matmul + Izhikevich scan
fused into ONE kernel (forward and backward).

Izhikevich counterpart of ops/pallas_fused.py: layer-0 Izhikevich models
previously ran encode (ops/pallas_encode.py) and dynamics
(ops/pallas_izh.py) as two kernels with the (T, B, H) input-currents
tensor -- and its cotangent -- round-tripping through HBM between them.
Here the spike rows are regenerated in VMEM from the integer latency tile
in both directions and the currents never exist in HBM; g_W_in
accumulates on-chip against the regenerated rows.

Dynamics are identical to ops/pallas_izh.py (reference
spiking_layers.py:337-353; v initialized at v_rest per :317-322, reset
and v_peak threshold gradient-dead); encoding identical to
ops/encoding.py (reference datasets.py:42-86).  Residual traces: v and z
(u is never needed -- every u partial is state-independent, see the
backward derivation in ops/pallas_izh.py's module docstring).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fused import (
    _pad2,
    _pad_lat,
    _shapes,
    _share_spec,
    _spike_row,
    _stack_spec,
    _wide_compiler_params,
    _wide_max_k,
    fused_supported,
)
from .pallas_scan import _surrogate_grad, _time_block, _zprev_k
from .surrogate import SpikeFuncType

__all__ = [
    "fused_encode_izh_scan",
    "fused_encode_izh_scan_head",
    "fused_encode_izh_scan_head_counts",
    "fused_izh_supported",
    "fused_izh_head_supported",
]


def fused_izh_supported(
    n_steps: int, n_features: int, hidden: int, recurrent: bool = True,
    itemsize: int = 4,
) -> bool:
    """Same VMEM footprint as the LIF/ALIF fused kernels."""
    return fused_supported(n_steps, n_features, hidden, recurrent=recurrent,
                           itemsize=itemsize)


def fused_izh_head_supported(
    n_steps: int, n_features: int, hidden: int, n_out: int,
    recurrent: bool = True, itemsize: int = 4,
) -> bool:
    """Head variant: W_out + (bb, o_pad) readout state resident like the
    LIF/ALIF head (pallas_fused.fused_head_supported)."""
    from .pallas_fused import fused_head_supported

    return fused_head_supported(
        n_steps, n_features, hidden, n_out, recurrent=recurrent,
        itemsize=itemsize,
    )


def _izh_fwd_kernel(refs, *, K, n_steps, use_periods, has_w, dt, C, v_rest,
                    v_th, k, a, b, c, d, v_peak, head=False, kappa=0.0,
                    store_traces=True, t_axis=1, store_counts=False):
    if has_w:
        lat_ref, w_in_ref, w_rec_ref, *rest = refs
    else:
        lat_ref, w_in_ref, *rest = refs
        w_rec_ref = None
    cnt_ref = None
    if head:
        # The head stores ONLY the f32 v trace: z is recomputed in the
        # backward as (v >= v_peak) -- bit-exact, because the forward
        # computes z from exactly the stored v.  Inference
        # (store_traces=False, the custom_vjp PRIMAL) skips even that:
        # only logits/tstar leave the kernel, same arithmetic.
        if store_traces:
            (w_out_ref, b_out_ref, v_ref, logits_ref, tstar_ref,
             *rest) = rest
        else:
            (w_out_ref, b_out_ref, logits_ref, tstar_ref, *rest) = rest
            v_ref = None
        if store_counts:
            # Per-sample per-neuron spike counts alongside logits -- the
            # fused-path carrier for the spike regularizers (see
            # pallas_fused._fused_fwd_kernel).
            cnt_ref, *rest = rest
        v_scr, u_scr, z_scr, vr_scr, m_scr, ts_scr = rest
        z_ref = None
    else:
        # Non-head inference keeps z (the next layer consumes it) but
        # skips the backward-only v residual.
        if store_traces:
            z_ref, v_ref, v_scr, u_scr, z_scr = rest
        else:
            z_ref, v_scr, u_scr, z_scr = rest
            v_ref = None
    t = pl.program_id(t_axis)

    @pl.when(t == 0)
    def _():
        v_scr[:] = jnp.full_like(v_scr, v_rest)  # spiking_layers.py:317-322
        u_scr[:] = jnp.zeros_like(u_scr)
        z_scr[:] = jnp.zeros_like(z_scr)
        if head:
            vr_scr[:] = jnp.zeros_like(vr_scr)
            m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
            ts_scr[:] = jnp.zeros_like(ts_scr)
        if cnt_ref is not None:
            cnt_ref[:] = jnp.zeros_like(cnt_ref)

    lat = lat_ref[:]
    w_in = w_in_ref[:]
    w_rec = w_rec_ref[:] if has_w else None
    if head:
        w_out = w_out_ref[:]
        b_out = b_out_ref[:]
    trace_dtype = (
        v_ref.dtype if v_ref is not None
        else (z_ref.dtype if z_ref is not None else jnp.float32)
    )
    v_prev, u_prev, z_prev = v_scr[:], u_scr[:], z_scr[:]
    # Input currents off the serial chain (see pallas_fused.py): the K
    # spike-gen + W_in matmuls have no state dependence.
    curs = [
        jnp.dot(
            _spike_row(lat, t * K + kk, n_steps, use_periods).astype(w_in.dtype),
            w_in, preferred_element_type=jnp.float32,
        )
        for kk in range(K)
    ]
    zs = []
    for kk in range(K):
        cur = curs[kk]
        if has_w:
            cur = cur + jnp.dot(z_prev.astype(w_rec.dtype), w_rec,
                                preferred_element_type=jnp.float32)
        dvdt = k * (v_prev - v_rest) * (v_prev - v_th) - u_prev + cur
        v = (v_prev + dt * dvdt / C) * (1.0 - z_prev) + c * z_prev
        dudt = a * (b * (v_prev - v_rest) - u_prev)
        u = (u_prev + dt * dudt) + d * z_prev
        z = (v >= v_peak).astype(v.dtype)
        if head:
            zs.append(z)
        else:
            z_ref[kk] = z.astype(trace_dtype)
        if v_ref is not None:
            v_ref[kk] = v.astype(trace_dtype)
        v_prev, u_prev, z_prev = v, u, z
    v_scr[:] = v_prev
    u_scr[:] = u_prev
    z_scr[:] = z_prev
    if cnt_ref is not None:
        # f32 accumulation: counts reach T (<= a few hundred) exactly.
        acc = zs[0].astype(jnp.float32)
        for zr in zs[1:]:
            acc = acc + zr.astype(jnp.float32)
        cnt_ref[:] += acc
    if head:
        # Readout leaky integrator + running first-argmax max-over-time,
        # identical to the LIF/ALIF head (pallas_fused._fused_fwd_kernel):
        # the K readout matmuls batch into ONE MXU call off the serial
        # chain; only the cheap kappa/max updates stay sequential.
        bb_, h_ = zs[0].shape
        z_blk = jnp.stack(zs).reshape(K * bb_, h_)
        r_all = (
            jnp.dot(z_blk.astype(w_out.dtype), w_out,
                    preferred_element_type=jnp.float32) + b_out
        ).reshape(K, bb_, -1)
        v_r, m_run, ts_run = vr_scr[:], m_scr[:], ts_scr[:]
        for kk in range(K):
            v_r = kappa * v_r + r_all[kk]
            better = v_r > m_run
            m_run = jnp.where(better, v_r, m_run)
            ts_run = jnp.where(better, t * K + kk, ts_run)
        vr_scr[:] = v_r
        m_scr[:] = m_run
        ts_scr[:] = ts_run

        @pl.when(t == pl.num_programs(t_axis) - 1)
        def _():
            logits_ref[:] = m_run
            tstar_ref[:] = ts_run


def _izh_bwd_kernel(refs, *, K, n_steps, use_periods, has_w, dt, C, v_rest,
                    v_th, k, a, b, v_peak, gamma, spike_func, head=False,
                    kappa=0.0, t_axis=1, has_gcnt=False):
    i = 0
    gcnt_ref = None
    if head:
        g_ref = refs[i]; i += 1
        ts_ref = refs[i]; i += 1
        if has_gcnt:
            gcnt_ref = refs[i]; i += 1
        gz_ref = None
    else:
        gz_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    if head:
        # z never stored: recomputed as (v >= v_peak), bit-exact against
        # the f32 v trace; the boundary row comes from v too.
        vb_ref = refs[i]; i += 1
        z_ref = zb_ref = None
    else:
        z_ref = refs[i]; i += 1
        zb_ref = refs[i]; i += 1
    lat_ref = refs[i]; i += 1
    w_in_ref = refs[i]; i += 1
    w_rec_ref = refs[i] if has_w else None
    i += 1 if has_w else 0
    w_out_ref = refs[i] if head else None
    i += 1 if head else 0
    dwin_ref = refs[i]; i += 1
    dwr_ref = refs[i] if has_w else None
    i += 1 if has_w else 0
    if head:
        dwout_ref = refs[i]; i += 1
        db_ref = refs[i]; i += 1
    dv_scr = refs[i]; i += 1
    du_scr = refs[i]; i += 1
    gi_blk = refs[i]; i += 1
    if head:
        s_scr, s_blk = refs[i], refs[i + 1]
    t = pl.program_id(t_axis)

    @pl.when(t == 0)
    def _():
        dv_scr[:] = jnp.zeros_like(dv_scr)
        du_scr[:] = jnp.zeros_like(du_scr)
        dwin_ref[0] = jnp.zeros_like(dwin_ref[0])
        if has_w:
            dwr_ref[0] = jnp.zeros_like(dwr_ref[0])
        if head:
            s_scr[:] = jnp.zeros_like(s_scr)
            dwout_ref[0] = jnp.zeros_like(dwout_ref[0])
            db_ref[0] = jnp.zeros_like(db_ref[0])

    is_first_block = t == pl.num_programs(t_axis) - 1
    fwd_blk = pl.num_programs(t_axis) - 1 - t  # forward block this grid step
    lat = lat_ref[:]
    w_in = w_in_ref[:]
    w_rec = w_rec_ref[:] if has_w else None
    f32 = jnp.float32
    dv_next, du_next = dv_scr[:], du_scr[:]

    if head:
        # Readout cotangent chain + batched dz matmuls off the serial
        # chain -- identical machinery to the LIF/ALIF head backward
        # (pallas_fused._fused_bwd_kernel).
        g = g_ref[:].astype(f32)
        ts = ts_ref[:]
        w_out = w_out_ref[:]
        s_carry = s_scr[:]
        for kk in reversed(range(K)):
            step = fwd_blk * K + kk
            s_carry = kappa * s_carry + g * (step == ts).astype(f32)
            s_blk[kk] = s_carry
        s_scr[:] = s_carry
        K_, bb_, O_ = s_blk.shape
        H_ = v_ref.shape[2]
        s_flat = s_blk[:].reshape(K_ * bb_, O_)
        dz_all = jax.lax.dot_general(
            s_flat.astype(w_out.dtype), w_out,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).reshape(K_, bb_, H_)
        if gcnt_ref is not None:
            # Count cotangent: d counts / d z_t == I at every step.
            dz_all = dz_all + gcnt_ref[:].astype(f32)[None]
        z_res = (v_ref[:].astype(f32) >= v_peak).astype(f32)
        zb_row = jnp.where(
            is_first_block, 0.0,
            (vb_ref[0].astype(f32) >= v_peak).astype(f32),
        )

    def zres_prev(kk):
        if head:
            return z_res[kk - 1] if kk > 0 else zb_row
        return _zprev_k(z_ref, zb_ref, kk, is_first_block).astype(f32)

    for kk in reversed(range(K)):  # reverse time inside the block
        v_t = v_ref[kk].astype(f32)
        z_t = z_res[kk] if head else z_ref[kk].astype(f32)
        z_prev = zres_prev(kk)
        not_reset_next = 1.0 - z_t  # the (1-r) factor inside step t+1
        dcur_next = dv_next * (dt / C) * not_reset_next
        dz = dz_all[kk] if head else gz_ref[kk].astype(f32)
        if has_w:
            dz = dz + jax.lax.dot_general(
                dcur_next.astype(w_rec.dtype), w_rec,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
        surr = _surrogate_grad(spike_func, v_t, v_peak, gamma)
        dv = (
            dz * surr
            + dv_next * (1.0 + (dt * k / C) * (2.0 * v_t - v_rest - v_th))
            * not_reset_next
            + du_next * (dt * a * b)
        )
        du = -dcur_next + du_next * (1.0 - dt * a)
        gi_blk[kk] = dv * (dt / C) * (1.0 - z_prev)
        dv_next, du_next = dv, du
    dv_scr[:] = dv_next
    du_scr[:] = du_next

    if head:
        # Readout weight/bias partials, off the serial chain.
        dwout_ref[0] += jax.lax.dot_general(
            z_res.reshape(K_ * bb_, H_).astype(w_out.dtype),
            s_flat.astype(w_out.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        db_ref[0] += jnp.sum(s_flat, axis=0, keepdims=True)

    # g_W_in partials against regenerated spike rows (forward step index
    # of the gi rows they pair with -- the grid walks blocks in reverse).
    for kk in range(K):
        step = fwd_blk * K + kk
        spk = _spike_row(lat, step, n_steps, use_periods)
        dwin_ref[0] += jax.lax.dot_general(
            spk.astype(w_in.dtype), gi_blk[kk].astype(w_in.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    if has_w:
        K_, bb_, H_ = gi_blk.shape
        if K_ > 1:
            zrows = (
                z_res[: K_ - 1]
                if head
                else z_ref[: K_ - 1].astype(f32)
            )
            dwr_ref[0] += jax.lax.dot_general(
                zrows.reshape((K_ - 1) * bb_, H_).astype(w_rec.dtype),
                gi_blk[1:].reshape((K_ - 1) * bb_, H_).astype(w_rec.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        zb0 = (
            zb_row if head
            else _zprev_k(z_ref, zb_ref, 0, is_first_block)
        )
        dwr_ref[0] += jax.lax.dot_general(
            zb0.astype(w_rec.dtype), gi_blk[0].astype(w_rec.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )


def _izh_fwd_call(latencies, w_in, w_rec, kp, *, T, use_periods, interpret,
                  lat_prepadded=None, w_out=None, b_out=None, kappa=0.0,
                  store_traces=True, store_counts=False):
    has_w = w_rec is not None
    head = w_out is not None
    stacked = w_in.ndim == 3  # leading replica axis (pallas_fused._stack_spec)
    S = w_in.shape[0] if stacked else None
    if stacked and not head:
        raise ValueError("stacked Izhikevich is head-only (ensemble path)")
    K = _time_block(T, _wide_max_k(
        w_in.shape[-2], w_in.shape[-1], has_w, head,
        w_out.shape[-1] if head else 0, jnp.dtype(w_in.dtype).itemsize,
    ))
    cparams = _wide_compiler_params(
        w_in.shape[-2], w_in.shape[-1], has_w, head,
        w_out.shape[-1] if head else 0, jnp.dtype(w_in.dtype).itemsize,
    )
    B, F = latencies.shape
    H, f_pad, h_pad, bb = _shapes(B, w_in, F, K, head, recurrent=has_w,
        n_out=w_out.shape[-1] if head else 0)
    lat = (
        lat_prepadded
        if lat_prepadded is not None
        else _pad_lat(latencies.astype(jnp.int32), bb, f_pad)
    )
    Bp = lat.shape[0]
    grid = (Bp // bb, T // K)
    lat_spec = pl.BlockSpec((bb, f_pad), lambda bi, t: (bi, 0),
                            memory_space=pltpu.VMEM)
    w_in_spec = pl.BlockSpec((f_pad, h_pad), lambda bi, t: (0, 0),
                             memory_space=pltpu.VMEM)
    w_rec_spec = pl.BlockSpec((h_pad, h_pad), lambda bi, t: (0, 0),
                              memory_space=pltpu.VMEM)
    tr_spec = pl.BlockSpec((K, bb, h_pad), lambda bi, t: (t, bi, 0),
                           memory_space=pltpu.VMEM)
    # Traces stay f32 regardless of the matmul dtype: v feeds both the
    # surrogate and the dv recurrence factor (2v - vr - vth), where bf16
    # quantization at |v| ~ 60 mV would visibly perturb gradients (the
    # two-kernel izh path keeps f32 traces for the same reason).
    trace_dtype = jnp.float32
    kernel = functools.partial(
        _izh_fwd_kernel, K=K, n_steps=T, use_periods=use_periods,
        has_w=has_w, head=head, kappa=kappa, store_traces=store_traces,
        t_axis=2 if stacked else 1, store_counts=store_counts, **kp,
    )
    in_specs = [lat_spec, w_in_spec] + ([w_rec_spec] if has_w else [])
    args = [lat, _pad2(w_in, f_pad, h_pad)] + (
        [_pad2(w_rec, h_pad, h_pad)] if has_w else []
    )
    scratch = [pltpu.VMEM((bb, h_pad), jnp.float32)] * 3
    if head:
        from .pallas_fused import _LANE

        o_pad = -(-w_out.shape[-1] // _LANE) * _LANE
        w_out_spec = pl.BlockSpec((h_pad, o_pad), lambda bi, t: (0, 0),
                                  memory_space=pltpu.VMEM)
        b_out_spec = pl.BlockSpec((1, o_pad), lambda bi, t: (0, 0),
                                  memory_space=pltpu.VMEM)
        head_spec = pl.BlockSpec((bb, o_pad), lambda bi, t: (bi, 0),
                                 memory_space=pltpu.VMEM)
        in_specs += [w_out_spec, b_out_spec]
        b_out_2d = jnp.asarray(b_out, jnp.float32).reshape(
            (S, 1, -1) if stacked else (1, -1)
        )
        args += [_pad2(w_out, h_pad, o_pad), _pad2(b_out_2d, 1, o_pad)]
        v_out = (
            [tr_spec], [jax.ShapeDtypeStruct((T, Bp, h_pad), trace_dtype)]
        ) if store_traces else ([], [])
        out_specs = v_out[0] + [head_spec, head_spec]
        out_shape = v_out[1] + [
            jax.ShapeDtypeStruct((Bp, o_pad), jnp.float32),
            jax.ShapeDtypeStruct((Bp, o_pad), jnp.int32),
        ]
        if store_counts:
            out_specs += [
                pl.BlockSpec((bb, h_pad), lambda bi, t: (bi, 0),
                             memory_space=pltpu.VMEM)
            ]
            out_shape += [jax.ShapeDtypeStruct((Bp, h_pad), jnp.float32)]
        scratch += [
            pltpu.VMEM((bb, o_pad), jnp.float32),
            pltpu.VMEM((bb, o_pad), jnp.float32),
            pltpu.VMEM((bb, o_pad), jnp.int32),
        ]
        if stacked:
            # Grid (tiles, S, time): replica axis INSIDE the tile axis so
            # the shared latency tile keeps its block index across all S
            # replicas (DMA'd once per tile -- see pallas_fused).
            grid = (grid[0], S, grid[1])
            in_specs = [
                _share_spec(sp) if sp is lat_spec else _stack_spec(sp)
                for sp in in_specs
            ]
            out_specs = [_stack_spec(sp) for sp in out_specs]
            out_shape = [
                jax.ShapeDtypeStruct((S, *os.shape), os.dtype)
                for os in out_shape
            ]
        outs = pl.pallas_call(
            lambda *refs: kernel(refs),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=cparams,
        )(*args)
        v = outs[0][..., :B, :H] if store_traces else None
        base = 1 if store_traces else 0
        logits, tstar = outs[base], outs[base + 1]
        O = w_out.shape[-1]
        if store_counts:
            counts = outs[base + 2][..., :B, :H]
            return (v, lat, logits[..., :B, :O], tstar[..., :B, :O],
                    counts)
        return v, lat, logits[..., :B, :O], tstar[..., :B, :O]
    n_out_traces = 2 if store_traces else 1
    outs = pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=grid,
        in_specs=in_specs,
        out_specs=[tr_spec] * n_out_traces,
        out_shape=[jax.ShapeDtypeStruct((T, Bp, h_pad), trace_dtype)]
        * n_out_traces,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=cparams,
    )(*args)
    z = outs[0][:, :B, :H]
    v = outs[1][:, :B, :H] if store_traces else None
    return z, v, lat


def _izh_bwd_call(g_z, v, z, lat, w_in, w_rec, kp, *, T, use_periods,
                  gamma, spike_func, interpret,
                  g_logits=None, tstar=None, w_out=None, kappa=0.0,
                  g_counts=None):
    has_w = w_rec is not None
    head = w_out is not None
    stacked = w_in.ndim == 3  # leading replica axis (pallas_fused._stack_spec)
    S = w_in.shape[0] if stacked else None
    K = _time_block(T, _wide_max_k(
        w_in.shape[-2], w_in.shape[-1], has_w, head,
        w_out.shape[-1] if head else 0, jnp.dtype(w_in.dtype).itemsize,
    ))
    cparams = _wide_compiler_params(
        w_in.shape[-2], w_in.shape[-1], has_w, head,
        w_out.shape[-1] if head else 0, jnp.dtype(w_in.dtype).itemsize,
    )
    B, H = v.shape[-2], v.shape[-1]
    F = w_in.shape[-2]
    f_pad = lat.shape[1]
    # Same batch tile as the forward (lat is padded to a multiple of it).
    _, _, h_pad, bb = _shapes(B, w_in, F, K, head, recurrent=has_w,
        n_out=w_out.shape[-1] if head else 0)
    Bp = lat.shape[0]

    def padbh(x):
        pb = Bp - x.shape[-2]
        ph = h_pad - x.shape[-1]
        if pb or ph:
            pad = [(0, 0)] * (x.ndim - 2) + [(0, pb), (0, ph)]
            x = jnp.pad(x, pad)
        return x

    # head: only the v trace is materialized; z and the boundary row are
    # recomputed from it inside the kernel.
    operands = (
        [padbh(v)] if head else [padbh(x) for x in (g_z, v, z)]
    )
    nb = T // K
    grid = (Bp // bb, nb)
    rev = pl.BlockSpec((K, bb, h_pad), lambda bi, t, n=nb: (n - 1 - t, bi, 0),
                       memory_space=pltpu.VMEM)
    zb = pl.BlockSpec(
        (1, bb, h_pad),
        lambda bi, t, n=nb, K=K: (jnp.maximum((n - 1 - t) * K - 1, 0), bi, 0),
        memory_space=pltpu.VMEM,
    )
    lat_spec = pl.BlockSpec((bb, f_pad), lambda bi, t: (bi, 0),
                            memory_space=pltpu.VMEM)
    w_in_spec = pl.BlockSpec((f_pad, h_pad), lambda bi, t: (0, 0),
                             memory_space=pltpu.VMEM)
    w_rec_spec = pl.BlockSpec((h_pad, h_pad), lambda bi, t: (0, 0),
                              memory_space=pltpu.VMEM)
    dwin_spec = pl.BlockSpec((1, f_pad, h_pad), lambda bi, t: (bi, 0, 0),
                             memory_space=pltpu.VMEM)
    dwr_spec = pl.BlockSpec((1, h_pad, h_pad), lambda bi, t: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
    bwd_kp = {n: kp[n] for n in ("dt", "C", "v_rest", "v_th", "k", "a", "b",
                                 "v_peak")}
    kernel = functools.partial(
        _izh_bwd_kernel, K=K, n_steps=T, use_periods=use_periods,
        has_w=has_w, gamma=gamma, spike_func=spike_func, head=head,
        kappa=kappa, t_axis=2 if stacked else 1,
        has_gcnt=g_counts is not None, **bwd_kp,
    )
    in_specs = (
        [rev] * len(operands) + [zb, lat_spec, w_in_spec]
        + ([w_rec_spec] if has_w else [])
    )
    args = (
        operands + [operands[-1], lat, _pad2(w_in, f_pad, h_pad)]
        + ([_pad2(w_rec, h_pad, h_pad)] if has_w else [])
    )
    out_specs = [dwin_spec] + ([dwr_spec] if has_w else [])
    out_shape = [jax.ShapeDtypeStruct((Bp // bb, f_pad, h_pad), jnp.float32)]
    if has_w:
        out_shape.append(
            jax.ShapeDtypeStruct((Bp // bb, h_pad, h_pad), jnp.float32)
        )
    scratch = [
        pltpu.VMEM((bb, h_pad), jnp.float32),
        pltpu.VMEM((bb, h_pad), jnp.float32),
        pltpu.VMEM((K, bb, h_pad), jnp.float32),
    ]
    if head:
        from .pallas_fused import _LANE

        o_pad = -(-w_out.shape[-1] // _LANE) * _LANE
        O = w_out.shape[-1]
        head_spec = pl.BlockSpec((bb, o_pad), lambda bi, t: (bi, 0),
                                 memory_space=pltpu.VMEM)
        pad_bo = [(0, 0)] * (g_logits.ndim - 2) + [
            (0, Bp - g_logits.shape[-2]), (0, o_pad - g_logits.shape[-1])
        ]
        gl = jnp.pad(g_logits.astype(jnp.float32), pad_bo)
        ts_p = jnp.pad(tstar, pad_bo)
        if g_counts is not None:
            gcnt_spec = pl.BlockSpec((bb, h_pad), lambda bi, t: (bi, 0),
                                     memory_space=pltpu.VMEM)
            # Zero-padded rows/cols contribute zero count cotangent.
            in_specs = [head_spec, head_spec, gcnt_spec] + in_specs
            args = [gl, ts_p, padbh(g_counts.astype(jnp.float32))] + args
        else:
            in_specs = [head_spec, head_spec] + in_specs
            args = [gl, ts_p] + args
        w_out_spec = pl.BlockSpec((h_pad, o_pad), lambda bi, t: (0, 0),
                                  memory_space=pltpu.VMEM)
        in_specs.append(w_out_spec)
        args.append(_pad2(w_out, h_pad, o_pad))
        dwout_spec = pl.BlockSpec((1, h_pad, o_pad), lambda bi, t: (bi, 0, 0),
                                  memory_space=pltpu.VMEM)
        db_spec = pl.BlockSpec((1, 1, o_pad), lambda bi, t: (bi, 0, 0),
                               memory_space=pltpu.VMEM)
        out_specs += [dwout_spec, db_spec]
        out_shape += [
            jax.ShapeDtypeStruct((Bp // bb, h_pad, o_pad), jnp.float32),
            jax.ShapeDtypeStruct((Bp // bb, 1, o_pad), jnp.float32),
        ]
        scratch += [
            pltpu.VMEM((bb, o_pad), jnp.float32),
            pltpu.VMEM((K, bb, o_pad), jnp.float32),
        ]
    if stacked:
        grid = (grid[0], S, grid[1])
        in_specs = [
            _share_spec(sp) if sp is lat_spec else _stack_spec(sp)
            for sp in in_specs
        ]
        out_specs = [_stack_spec(sp) for sp in out_specs]
        out_shape = [
            jax.ShapeDtypeStruct((S, *os.shape), os.dtype) for os in out_shape
        ]
    outs = pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=cparams,
    )(*args)
    tile_ax = 1 if stacked else 0  # reduce the batch-tile partials only
    g_w_in = jnp.sum(outs[0], axis=tile_ax)[..., :F, :H].astype(w_in.dtype)
    g_w_rec = (
        jnp.sum(outs[1], axis=tile_ax)[..., :H, :H].astype(w_rec.dtype)
        if has_w
        else None
    )
    if head:
        j = 2 if has_w else 1
        g_w_out = jnp.sum(outs[j], axis=tile_ax)[..., :H, :O].astype(w_out.dtype)
        g_b = jnp.sum(outs[j + 1], axis=tile_ax)[..., 0, :O]
        return g_w_in, g_w_rec, g_w_out, g_b
    return g_w_in, g_w_rec


IZH_STATICS = (3, 4, 5, 6, 7, 8)


@functools.partial(jax.custom_vjp, nondiff_argnums=IZH_STATICS)
def fused_encode_izh_scan(
    latencies: jax.Array,
    w_in: jax.Array,
    w_rec,
    kernel_params: tuple,
    n_steps: int,
    use_periods: bool,
    gamma: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
) -> jax.Array:
    """(latencies (B,F) int32, W_in [, masked W_rec]) -> spikes (T,B,H).

    Numerically equal (up to f32 tile-summation order) to
    ``encoded_input_matmul`` followed by ``izh_scan``.  ``kernel_params``
    is the hashable constants tuple from ``pallas_izh.izh_kernel_params``;
    ``w_rec`` may be None for feedforward layers.
    """
    z, _, _ = _izh_fwd_call(
        latencies, w_in, w_rec, dict(kernel_params), T=n_steps,
        use_periods=use_periods, interpret=interpret, store_traces=False,
    )
    return z


def _fused_izh_fwd(latencies, w_in, w_rec, kernel_params, n_steps,
                   use_periods, gamma, spike_func, interpret):
    z, v, lat = _izh_fwd_call(
        latencies, w_in, w_rec, dict(kernel_params), T=n_steps,
        use_periods=use_periods, interpret=interpret,
    )
    return z, (z, v, lat, latencies.shape, w_in, w_rec)


def _fused_izh_bwd(kernel_params, n_steps, use_periods, gamma, spike_func,
                   interpret, res, g_z):
    z, v, lat, lat_shape, w_in, w_rec = res
    g_w_in, g_w_rec = _izh_bwd_call(
        g_z, v, z, lat, w_in, w_rec, dict(kernel_params), T=n_steps,
        use_periods=use_periods, gamma=gamma, spike_func=spike_func,
        interpret=interpret,
    )
    g_lat = np.zeros(lat_shape, dtype=jax.dtypes.float0)
    return g_lat, g_w_in, g_w_rec


fused_encode_izh_scan.defvjp(_fused_izh_fwd, _fused_izh_bwd)


IZH_HEAD_STATICS = (5, 6, 7, 8, 9, 10, 11)


@functools.partial(jax.custom_vjp, nondiff_argnums=IZH_HEAD_STATICS)
def fused_encode_izh_scan_head(
    latencies: jax.Array,
    w_in: jax.Array,
    w_rec,
    w_out: jax.Array,
    b_out: jax.Array,
    kernel_params: tuple,
    n_steps: int,
    use_periods: bool,
    gamma: float,
    kappa: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
) -> jax.Array:
    """Whole single-hidden-layer Izhikevich network as ONE kernel pair:
    encode -> input matmul -> Izhikevich scan -> readout leaky integrator
    -> first-argmax max-over-time logits (spiking_layers.py:337-353,
    402-408; snn.py:228 torch.max tie routing).

    Izhikevich counterpart of ``fused_encode_rec_scan_head``: the (T,B,H)
    z trace, its cotangent, and the (T,B,O) readout trace never exist in
    HBM; only the f32 v trace is stored (z recomputed as ``v >= v_peak``,
    bit-exact).  Returns logits ``(B, n_out)``.
    """
    _, _, logits, _ = _izh_fwd_call(
        latencies, w_in, w_rec, dict(kernel_params), T=n_steps,
        use_periods=use_periods, interpret=interpret,
        w_out=w_out, b_out=b_out, kappa=kappa, store_traces=False,
    )
    return logits


def _fused_izh_head_fwd(latencies, w_in, w_rec, w_out, b_out, kernel_params,
                        n_steps, use_periods, gamma, kappa, spike_func,
                        interpret):
    v, lat, logits, tstar = _izh_fwd_call(
        latencies, w_in, w_rec, dict(kernel_params), T=n_steps,
        use_periods=use_periods, interpret=interpret,
        w_out=w_out, b_out=b_out, kappa=kappa,
    )
    return logits, (v, lat, tstar, latencies.shape, w_in, w_rec, w_out)


def _fused_izh_head_bwd(kernel_params, n_steps, use_periods, gamma, kappa,
                        spike_func, interpret, res, g_logits):
    v, lat, tstar, lat_shape, w_in, w_rec, w_out = res
    g_w_in, g_w_rec, g_w_out, g_b = _izh_bwd_call(
        None, v, None, lat, w_in, w_rec, dict(kernel_params), T=n_steps,
        use_periods=use_periods, gamma=gamma, spike_func=spike_func,
        interpret=interpret, g_logits=g_logits, tstar=tstar, w_out=w_out,
        kappa=kappa,
    )
    g_lat = np.zeros(lat_shape, dtype=jax.dtypes.float0)
    return g_lat, g_w_in, g_w_rec, g_w_out, g_b


fused_encode_izh_scan_head.defvjp(_fused_izh_head_fwd, _fused_izh_head_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=IZH_HEAD_STATICS)
def fused_encode_izh_scan_head_counts(
    latencies: jax.Array,
    w_in: jax.Array,
    w_rec,
    w_out: jax.Array,
    b_out: jax.Array,
    kernel_params: tuple,
    n_steps: int,
    use_periods: bool,
    gamma: float,
    kappa: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
):
    """Like :func:`fused_encode_izh_scan_head` but returns
    ``(logits (B, O), spike_counts (B, H))`` with
    ``spike_counts[b, h] = sum_t z_t[b, h]`` (float32, exact integers) --
    the Izhikevich counterpart of
    ``pallas_fused.fused_encode_rec_scan_head_counts``, keeping the fused
    whole-network path engaged under the reference's sketched spike
    regularizers (snn.py:401-408).  Differentiable in both outputs: the
    counts cotangent joins the logits cotangent at dz every step."""
    _, _, logits, _, counts = _izh_fwd_call(
        latencies, w_in, w_rec, dict(kernel_params), T=n_steps,
        use_periods=use_periods, interpret=interpret,
        w_out=w_out, b_out=b_out, kappa=kappa,
        store_traces=False, store_counts=True,
    )
    return logits, counts


def _fused_izh_head_cnt_fwd(latencies, w_in, w_rec, w_out, b_out,
                            kernel_params, n_steps, use_periods, gamma,
                            kappa, spike_func, interpret):
    v, lat, logits, tstar, counts = _izh_fwd_call(
        latencies, w_in, w_rec, dict(kernel_params), T=n_steps,
        use_periods=use_periods, interpret=interpret,
        w_out=w_out, b_out=b_out, kappa=kappa, store_counts=True,
    )
    return (logits, counts), (v, lat, tstar, latencies.shape, w_in, w_rec,
                              w_out)


def _fused_izh_head_cnt_bwd(kernel_params, n_steps, use_periods, gamma,
                            kappa, spike_func, interpret, res, g):
    g_logits, g_counts = g
    v, lat, tstar, lat_shape, w_in, w_rec, w_out = res
    g_w_in, g_w_rec, g_w_out, g_b = _izh_bwd_call(
        None, v, None, lat, w_in, w_rec, dict(kernel_params), T=n_steps,
        use_periods=use_periods, gamma=gamma, spike_func=spike_func,
        interpret=interpret, g_logits=g_logits, tstar=tstar, w_out=w_out,
        kappa=kappa, g_counts=g_counts,
    )
    g_lat = np.zeros(lat_shape, dtype=jax.dtypes.float0)
    return g_lat, g_w_in, g_w_rec, g_w_out, g_b


fused_encode_izh_scan_head_counts.defvjp(
    _fused_izh_head_cnt_fwd, _fused_izh_head_cnt_bwd
)
