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

HEAD variants (``fused_mid_*_scan_head``): the LAST hidden layer of a
deep (multi-hidden) network additionally fuses the readout leaky
integrator and the first-argmax max-over-time into the same kernel pair
(reference snn.py:211-213, 228; spiking_layers.py:402-408) -- the
mid-layer twin of ops/pallas_fused.py's whole-network head.  An N-hidden
model then runs as layer-0 fused (encode+matmul+scan) -> (N-2) mid
kernels -> ONE mid-head kernel, so neither the (T, B, O) readout trace
nor the last hidden layer's (T, B, H) z-trace cotangent ever exist in
HBM; the backward recomputes z from the delta residual (sign-exact) and
emits g_z_in for the preceding layer.  ``_counts`` variants also emit
per-neuron spike counts for the spike regularizers (snn.py:401-408).
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
from .surrogate import (
    SpikeFuncType,
    surrogate_grad_from_delta as _surrogate_grad_from_delta,
)

__all__ = [
    "fused_mid_rec_scan",
    "fused_mid_ff_scan",
    "fused_mid_supported",
    "fused_mid_rec_scan_head",
    "fused_mid_ff_scan_head",
    "fused_mid_rec_scan_head_counts",
    "fused_mid_ff_scan_head_counts",
    "fused_mid_head_supported",
]


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


def fused_mid_head_supported(n_steps: int, hidden_in: int, hidden: int,
                             n_out: int, recurrent: bool = True,
                             itemsize: int = 4) -> bool:
    """Head variant additionally keeps W_out and the (bb, o_pad) readout
    state resident -- cheap for classification-sized outputs (same o_pad
    cap as pallas_fused.fused_head_supported)."""
    hin_pad = -(-hidden_in // _LANE) * _LANE
    h_pad = -(-hidden // _LANE) * _LANE
    o_pad = -(-n_out // _LANE) * _LANE
    w_bytes = hin_pad * h_pad * itemsize + h_pad * o_pad * itemsize
    if recurrent:
        w_bytes += h_pad * h_pad * itemsize
    return (
        jax.default_backend() == "tpu"
        and n_steps >= 1
        and o_pad <= 512
        and w_bytes <= 4 * 1024 * 1024
    )


def _mid_shapes(B, hidden_in, hidden, K, head=False):
    hin_pad = -(-hidden_in // _LANE) * _LANE
    h_pad = -(-hidden // _LANE) * _LANE
    bb = min(_MAX_BLOCK_B, -(-B // _SUBLANE) * _SUBLANE)
    # Revolving blocks: z_in (+ its cotangent in backward) on top of the
    # usual trace blocks; budget with the wider of the two widths.  The
    # head keeps an extra (K, bb, o_pad) s-block plus (bb, o_pad) readout
    # state resident; budget it like two more revolving blocks.
    bb = _fit_block_b(bb, K, max(hin_pad, h_pad),
                      _N_BLOCKS + 2 + (2 if head else 0))
    return hin_pad, h_pad, bb


def _mid_fwd_kernel(refs, *, K, alif, has_w, alpha, rho, threshold,
                    store_delta, store_traces=True, head=False, kappa=0.0,
                    store_counts=False):
    if has_w:
        zin_ref, w_in_ref, w_rec_ref, beta_ref, *rest = refs
    else:
        zin_ref, w_in_ref, beta_ref, *rest = refs
        w_rec_ref = None
    cnt_ref = None
    if head:
        w_out_ref, b_out_ref, *rest = rest
        # The head writes NO z trace (no next layer consumes it; the
        # backward recomputes z = (delta >= 0), sign-exact) and stores
        # the delta residual for every cell/surrogate combo (+ the
        # adaptation trace for Phi's dynamic-threshold scale).
        # Inference (store_traces=False, the custom_vjp PRIMAL): no trace
        # output leaves the kernel at all -- arithmetic is unchanged.
        n_trace = 0 if not store_traces else (
            1 if (store_delta or not alif) else 2
        )
        out_refs = rest[:n_trace]
        rest = rest[n_trace:]
        logits_ref, tstar_ref, *rest = rest
        if store_counts:
            cnt_ref, *rest = rest
        v_scr, a_scr, z_scr, vr_scr, m_scr, ts_scr = rest
        z_ref = v_ref = None
        if not store_traces:
            d_ref = a_ref = None
        elif alif and not store_delta:
            d_ref, a_ref = out_refs
        else:
            (d_ref,) = out_refs
            a_ref = None
    else:
        # Inference (store_traces=False, the custom_vjp PRIMAL): only the
        # z spike trace leaves the kernel (the next layer consumes it);
        # the backward-only residuals (v / delta / a) are never written.
        n_trace = 1 if not store_traces else (
            2 if (store_delta or not alif) else 3
        )
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
        if head:
            vr_scr[:] = jnp.zeros_like(vr_scr)
            m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
            ts_scr[:] = jnp.zeros_like(ts_scr)
        if cnt_ref is not None:
            cnt_ref[:] = jnp.zeros_like(cnt_ref)

    w_in = w_in_ref[:]
    w_rec = w_rec_ref[:] if has_w else None
    if head:
        w_out = w_out_ref[:]
        b_out = b_out_ref[:]
    trace_dtype = out_refs[0].dtype if out_refs else jnp.float32
    v_c, a_c, z_prev = v_scr[:], a_scr[:], z_scr[:]
    # Input currents are state-independent: ONE batched (K*bb, Hin) @
    # (Hin, H) MXU matmul off the serial chain.
    K_, bb_, hin_ = zin_ref.shape
    curs = jnp.dot(
        zin_ref[:].reshape(K_ * bb_, hin_).astype(w_in.dtype), w_in,
        preferred_element_type=jnp.float32,
    ).reshape(K_, bb_, -1)
    zs = []
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
        if head:
            zs.append(z_prev)
            if d_ref is not None:
                d_ref[k] = delta.astype(trace_dtype)
            if a_ref is not None:
                a_ref[k] = a_c.astype(trace_dtype)
        else:
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
    if cnt_ref is not None:
        # f32 accumulation: counts reach T (<= a few hundred) exactly.
        acc = zs[0].astype(jnp.float32)
        for zr in zs[1:]:
            acc = acc + zr.astype(jnp.float32)
        cnt_ref[:] += acc
    if head:
        # Readout leaky integrator + running first-argmax max-over-time
        # (spiking_layers.py:402-408; snn.py:228 with torch.max tie
        # semantics).  z for the whole block is known once the dynamics
        # loop finishes, so the K readout matmuls batch into ONE MXU
        # call OFF the serial chain (see pallas_fused._fused_fwd_kernel).
        z_blk = jnp.stack(zs).reshape(K * bb_, -1)
        r_all = (
            jnp.dot(z_blk.astype(w_out.dtype), w_out,
                    preferred_element_type=jnp.float32) + b_out
        ).reshape(K, bb_, -1)
        v_r, m_run, ts_run = vr_scr[:], m_scr[:], ts_scr[:]
        for k in range(K):
            v_r = kappa * v_r + r_all[k]
            better = v_r > m_run
            m_run = jnp.where(better, v_r, m_run)
            ts_run = jnp.where(better, t * K + k, ts_run)
        vr_scr[:] = v_r
        m_scr[:] = m_run
        ts_scr[:] = ts_run

        @pl.when(t == pl.num_programs(1) - 1)
        def _():
            logits_ref[:] = m_run
            tstar_ref[:] = ts_run


def _mid_bwd_kernel(refs, *, K, alif, has_w, alpha, rho, threshold, gamma,
                    spike_func, store_delta, head=False, kappa=0.0,
                    has_gcnt=False):
    n_res = 1 if (store_delta or not alif) else 2
    i = 0
    gcnt_ref = None
    if head:
        g_ref = refs[i]; i += 1
        ts_ref = refs[i]; i += 1
        if has_gcnt:
            # counts = sum_t z_t, so the (bb, h) count cotangent adds to
            # dz at EVERY step of the block.
            gcnt_ref = refs[i]; i += 1
        gz_ref = None
    else:
        gz_ref = refs[i]; i += 1
    res_refs = refs[i:i + n_res]; i += n_res
    if head:
        # Boundary row of the DELTA residual: z is never stored by the
        # head forward; z_{t-1} is recomputed as (delta_{t-1} >= 0),
        # sign-exact (see pallas_fused._fused_bwd_kernel).
        resb_ref = refs[i]; i += 1
        z_ref = zb_ref = None
    else:
        z_ref = refs[i]; i += 1
        zb_ref = refs[i]; i += 1
    zin_ref = refs[i]; i += 1
    w_in_ref = refs[i]; i += 1
    w_rec_ref = refs[i] if has_w else None
    i += 1 if has_w else 0
    beta_ref = refs[i]; i += 1
    w_out_ref = refs[i] if head else None
    i += 1 if head else 0
    gzin_ref = refs[i]; i += 1
    dwin_ref = refs[i]; i += 1
    dwr_ref = refs[i] if has_w else None
    i += 1 if has_w else 0
    if head:
        dwout_ref = refs[i]; i += 1
        db_ref = refs[i]; i += 1
    dcur_scr, dcur_blk = refs[i], refs[i + 1]
    i += 2
    if head:
        s_scr, s_blk = refs[i], refs[i + 1]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dcur_scr[:] = jnp.zeros_like(dcur_scr)
        dwin_ref[0] = jnp.zeros_like(dwin_ref[0])
        if has_w:
            dwr_ref[0] = jnp.zeros_like(dwr_ref[0])
        if head:
            s_scr[:] = jnp.zeros_like(s_scr)
            dwout_ref[0] = jnp.zeros_like(dwout_ref[0])
            db_ref[0] = jnp.zeros_like(db_ref[0])

    is_first_block = t == pl.num_programs(1) - 1
    fwd_blk = pl.num_programs(1) - 1 - t  # forward block this grid step
    w_in = w_in_ref[:]
    w_rec = w_rec_ref[:] if has_w else None
    f32 = jnp.float32
    dcur_carry = dcur_scr[:]
    z_res = zb_row = None
    if head:
        g = g_ref[:].astype(f32)
        ts = ts_ref[:]
        w_out = w_out_ref[:]
        # Readout cotangent chain, reverse time:
        #   s(t) = kappa * s(t+1) + g_logits * [t == argmax step].
        # Independent of the membrane dynamics, so the whole block's s
        # values -- and the K dz matmuls as ONE batched MXU call -- run
        # OFF the serial chain (see pallas_fused._fused_bwd_kernel).
        s_carry = s_scr[:]
        for k in reversed(range(K)):
            step = fwd_blk * K + k
            s_carry = kappa * s_carry + g * (step == ts).astype(f32)
            s_blk[k] = s_carry
        s_scr[:] = s_carry
        K_, bb_, O_ = s_blk.shape
        H_ = res_refs[0].shape[2]
        s_flat = s_blk[:].reshape(K_ * bb_, O_)
        dz_all = jax.lax.dot_general(
            s_flat.astype(w_out.dtype), w_out,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).reshape(K_, bb_, H_)
        if gcnt_ref is not None:
            dz_all = dz_all + gcnt_ref[:].astype(f32)[None]
        # z recomputed from the delta residual (sign-exact in bf16).
        z_res = (res_refs[0][:].astype(f32) >= 0).astype(f32)
        zb_row = jnp.where(
            is_first_block, 0.0, (resb_ref[0].astype(f32) >= 0).astype(f32)
        )
        thr_dyn = (
            threshold + beta_ref[0, 0] * res_refs[1][:].astype(f32)
            if (alif and not store_delta)
            else threshold
        )
        surr_all = _surrogate_grad_from_delta(
            spike_func, res_refs[0][:].astype(f32), thr_dyn, gamma
        )
        for k in reversed(range(K)):  # the serial chain: VPU only
            dz = dz_all[k]
            if has_w:
                dz = dz + jax.lax.dot_general(
                    dcur_carry.astype(w_rec.dtype), w_rec,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                )
            dv = dz * surr_all[k] + alpha * dcur_carry
            z_prev_k = z_res[k - 1] if k > 0 else zb_row
            dcur = dv * (1.0 - z_prev_k)
            dcur_blk[k] = dcur
            dcur_carry = dcur
        dcur_scr[:] = dcur_carry
        # Readout weight/bias partials, off the serial chain.
        dwout_ref[0] += jax.lax.dot_general(
            z_res.reshape(K_ * bb_, H_).astype(w_out.dtype),
            s_flat.astype(w_out.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        db_ref[0] += jnp.sum(s_flat, axis=0, keepdims=True)
    else:
        for k in reversed(range(K)):  # reverse time inside the block
            if store_delta or not alif:
                if alif:
                    surr = _surrogate_grad(
                        spike_func, res_refs[0][k].astype(f32), 0.0, gamma
                    )
                else:
                    surr = _surrogate_grad(
                        spike_func, res_refs[0][k].astype(f32), threshold,
                        gamma
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
            zrows = (
                z_res[: K_ - 1]
                if head
                else z_ref[: K_ - 1].astype(f32)
            )
            dwr_ref[0] += jax.lax.dot_general(
                zrows.reshape((K_ - 1) * bb_, H_).astype(w_rec.dtype),
                dcur_blk[1:].reshape((K_ - 1) * bb_, H_).astype(w_rec.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        zb0 = zb_row if head else _zprev_k(z_ref, zb_ref, 0, is_first_block)
        dwr_ref[0] += jax.lax.dot_general(
            zb0.astype(w_rec.dtype), dcur_blk[0].astype(w_rec.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    del rho


def _mid_fwd_call(z_in, w_in, w_rec, beta, *, T, alif, alpha, rho,
                  threshold, store_delta, interpret, store_traces=True,
                  w_out=None, b_out=None, kappa=0.0, store_counts=False):
    has_w = w_rec is not None
    head = w_out is not None
    K = _time_block(T)
    if head:
        n_trace = 0 if not store_traces else (
            1 if (store_delta or not alif) else 2
        )
    else:
        n_trace = 1 if not store_traces else (
            2 if (store_delta or not alif) else 3
        )
    _, B, Hin = z_in.shape
    H = w_in.shape[1]
    hin_pad, h_pad, bb = _mid_shapes(B, Hin, H, K, head)
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
        store_traces=store_traces, head=head, kappa=kappa,
        store_counts=store_counts,
    )
    in_specs = (
        [zin_spec, w_in_spec] + ([w_rec_spec] if has_w else []) + [beta_spec]
    )
    args = (
        [zin_p, _pad2(w_in, hin_pad, h_pad)]
        + ([_pad2(w_rec, h_pad, h_pad)] if has_w else []) + [beta_s]
    )
    out_specs = [tr_spec] * n_trace
    out_shape = [jax.ShapeDtypeStruct((T, Bp, h_pad), trace_dtype)] * n_trace
    scratch = [pltpu.VMEM((bb, h_pad), jnp.float32)] * 3
    if head:
        o_pad = -(-w_out.shape[-1] // _LANE) * _LANE
        w_out_spec = pl.BlockSpec((h_pad, o_pad), lambda b, t: (0, 0),
                                  memory_space=pltpu.VMEM)
        b_out_spec = pl.BlockSpec((1, o_pad), lambda b, t: (0, 0),
                                  memory_space=pltpu.VMEM)
        head_spec = pl.BlockSpec((bb, o_pad), lambda b, t: (b, 0),
                                 memory_space=pltpu.VMEM)
        in_specs += [w_out_spec, b_out_spec]
        b_out_2d = jnp.asarray(b_out, jnp.float32).reshape(1, -1)
        args += [_pad2(w_out, h_pad, o_pad), _pad2(b_out_2d, 1, o_pad)]
        out_specs += [head_spec, head_spec]
        out_shape += [
            jax.ShapeDtypeStruct((Bp, o_pad), jnp.float32),
            jax.ShapeDtypeStruct((Bp, o_pad), jnp.int32),
        ]
        if store_counts:
            out_specs += [
                pl.BlockSpec((bb, h_pad), lambda b, t: (b, 0),
                             memory_space=pltpu.VMEM)
            ]
            out_shape += [jax.ShapeDtypeStruct((Bp, h_pad), jnp.float32)]
        scratch += [
            pltpu.VMEM((bb, o_pad), jnp.float32),
            pltpu.VMEM((bb, o_pad), jnp.float32),
            pltpu.VMEM((bb, o_pad), jnp.int32),
        ]
    outs = pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    traces = tuple(o[:, :B, :H] for o in outs[:n_trace])
    if head:
        O = w_out.shape[-1]
        logits = outs[n_trace][:B, :O]
        tstar = outs[n_trace + 1][:B, :O]
        if store_counts:
            counts = outs[n_trace + 2][:B, :H]
            return traces, zin_p, logits, tstar, counts
        return traces, zin_p, logits, tstar
    return traces, zin_p


def _mid_bwd_call(g_z, residuals, z, zin_p, w_in, w_rec, beta, *, T, alif,
                  alpha, rho, threshold, gamma, spike_func, store_delta,
                  interpret, g_logits=None, tstar=None, w_out=None,
                  kappa=0.0, g_counts=None):
    has_w = w_rec is not None
    head = w_out is not None
    K = _time_block(T)
    ref3d = residuals[0] if head else z
    B, H = ref3d.shape[1], ref3d.shape[2]
    Hin = w_in.shape[0]
    hin_pad = zin_p.shape[2]
    _, h_pad, bb = _mid_shapes(B, Hin, H, K, head)  # same tile as forward
    Bp = zin_p.shape[1]

    def padbh(x):
        pb = Bp - x.shape[-2]
        ph = h_pad - x.shape[-1]
        if pb or ph:
            pad = [(0, 0)] * (x.ndim - 2) + [(0, pb), (0, ph)]
            x = jnp.pad(x, pad)
        return x

    # head: the z trace is never materialized -- operands are the
    # residual traces only, and the boundary companion row comes from
    # the delta residual instead of z.
    parts = (*(() if head else (g_z,)), *residuals, *(() if head else (z,)))
    operands = [padbh(x) for x in parts]
    boundary_op = operands[0] if head else operands[-1]
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
        store_delta=store_delta, head=head, kappa=kappa,
        has_gcnt=g_counts is not None,
    )
    in_specs = (
        [rev] * len(operands) + [zb, rev_in, w_in_spec]
        + ([w_rec_spec] if has_w else []) + [beta_spec]
    )
    args = (
        operands + [boundary_op, zin_p, _pad2(w_in, hin_pad, h_pad)]
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
    scratch = [
        pltpu.VMEM((bb, h_pad), jnp.float32),
        pltpu.VMEM((K, bb, h_pad), jnp.float32),
    ]
    if head:
        o_pad = -(-w_out.shape[-1] // _LANE) * _LANE
        O = w_out.shape[-1]
        head_spec = pl.BlockSpec((bb, o_pad), lambda b, t: (b, 0),
                                 memory_space=pltpu.VMEM)
        # g_logits/tstar arrive (B, O) from the sliced forward outputs;
        # padded rows/cols carry zero cotangent so they contribute nothing.
        pad_bo = [(0, Bp - g_logits.shape[-2]), (0, o_pad - g_logits.shape[-1])]
        gl = jnp.pad(g_logits.astype(jnp.float32), pad_bo)
        ts_p = jnp.pad(tstar, pad_bo)
        if g_counts is not None:
            gcnt_spec = pl.BlockSpec((bb, h_pad), lambda b, t: (b, 0),
                                     memory_space=pltpu.VMEM)
            in_specs = [head_spec, head_spec, gcnt_spec] + in_specs
            args = [gl, ts_p, padbh(g_counts.astype(jnp.float32))] + args
        else:
            in_specs = [head_spec, head_spec] + in_specs
            args = [gl, ts_p] + args
        w_out_spec = pl.BlockSpec((h_pad, o_pad), lambda b, t: (0, 0),
                                  memory_space=pltpu.VMEM)
        in_specs.append(w_out_spec)
        args.append(_pad2(w_out, h_pad, o_pad))
        dwout_spec = pl.BlockSpec((1, h_pad, o_pad), lambda b, t: (b, 0, 0),
                                  memory_space=pltpu.VMEM)
        db_spec = pl.BlockSpec((1, 1, o_pad), lambda b, t: (b, 0, 0),
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
    outs = pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    # Cotangent dtype must match the primal trace dtype (bf16 traces
    # under matmul_dtype=bfloat16).
    g_z_in = outs[0][:, :B, :Hin].astype(zin_p.dtype)
    g_w_in = jnp.sum(outs[1], axis=0)[:Hin, :H].astype(w_in.dtype)
    g_w_rec = (
        jnp.sum(outs[2], axis=0)[:H, :H].astype(w_rec.dtype) if has_w else None
    )
    if head:
        j = 3 if has_w else 2
        g_w_out = jnp.sum(outs[j], axis=0)[:H, :O].astype(w_out.dtype)
        g_b = jnp.sum(outs[j + 1], axis=0)[0, :O]
        return g_z_in, g_w_in, g_w_rec, g_w_out, g_b
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


# ---------------------------------------------------------------------------
# Head variants: last hidden layer + readout + max-over-time in one pair
# ---------------------------------------------------------------------------
MID_HEAD_REC_STATICS = tuple(range(6, 15))


@functools.partial(jax.custom_vjp, nondiff_argnums=MID_HEAD_REC_STATICS)
def fused_mid_rec_scan_head(
    z_in: jax.Array,
    w_in: jax.Array,
    w_rec: jax.Array,
    beta,
    w_out: jax.Array,
    b_out: jax.Array,
    n_steps: int,
    alif: bool,
    alpha: float,
    rho: float,
    threshold: float,
    gamma: float,
    kappa: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
) -> jax.Array:
    """(z_in (T,B,Hin) trace, weights) -> max-over-time logits (B, O).

    Numerically equal (up to f32 tile-summation order) to
    ``fused_mid_rec_scan`` -> readout matmul -> kappa scan ->
    ``temporal_max`` (reference snn.py:211-213, 228 incl. torch.max's
    first-argmax tie routing); the backward additionally returns the
    z_in cotangent for the preceding layer.
    """
    _, _, logits, _ = _mid_fwd_call(
        z_in, w_in, w_rec, beta, T=n_steps, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, store_traces=False, w_out=w_out, b_out=b_out,
        kappa=kappa,
    )
    return logits


def _mid_rec_head_fwd(z_in, w_in, w_rec, beta, w_out, b_out, n_steps, alif,
                      alpha, rho, threshold, gamma, kappa, spike_func,
                      interpret):
    traces, zin_p, logits, tstar = _mid_fwd_call(
        z_in, w_in, w_rec, beta, T=n_steps, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, w_out=w_out, b_out=b_out, kappa=kappa,
    )
    return logits, (traces, zin_p, z_in.shape, w_in, w_rec, beta, w_out,
                    tstar)


def _mid_rec_head_bwd(n_steps, alif, alpha, rho, threshold, gamma, kappa,
                      spike_func, interpret, res, g_logits):
    traces, zin_p, zin_shape, w_in, w_rec, beta, w_out, tstar = res
    g_z_in, g_w_in, g_w_rec, g_w_out, g_b = _mid_bwd_call(
        None, tuple(traces), None, zin_p, w_in, w_rec, beta, T=n_steps,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold, gamma=gamma,
        spike_func=spike_func,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, g_logits=g_logits, tstar=tstar, w_out=w_out,
        kappa=kappa,
    )
    return (g_z_in[:, :zin_shape[1], :], g_w_in, g_w_rec,
            jnp.zeros_like(jnp.asarray(beta)), g_w_out, g_b)


fused_mid_rec_scan_head.defvjp(_mid_rec_head_fwd, _mid_rec_head_bwd)


MID_HEAD_FF_STATICS = tuple(range(5, 14))


@functools.partial(jax.custom_vjp, nondiff_argnums=MID_HEAD_FF_STATICS)
def fused_mid_ff_scan_head(
    z_in: jax.Array,
    w_in: jax.Array,
    beta,
    w_out: jax.Array,
    b_out: jax.Array,
    n_steps: int,
    alif: bool,
    alpha: float,
    rho: float,
    threshold: float,
    gamma: float,
    kappa: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
) -> jax.Array:
    """Feedforward mid-head variant: no recurrent weights."""
    _, _, logits, _ = _mid_fwd_call(
        z_in, w_in, None, beta, T=n_steps, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, store_traces=False, w_out=w_out, b_out=b_out,
        kappa=kappa,
    )
    return logits


def _mid_ff_head_fwd(z_in, w_in, beta, w_out, b_out, n_steps, alif, alpha,
                     rho, threshold, gamma, kappa, spike_func, interpret):
    traces, zin_p, logits, tstar = _mid_fwd_call(
        z_in, w_in, None, beta, T=n_steps, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, w_out=w_out, b_out=b_out, kappa=kappa,
    )
    return logits, (traces, zin_p, z_in.shape, w_in, beta, w_out, tstar)


def _mid_ff_head_bwd(n_steps, alif, alpha, rho, threshold, gamma, kappa,
                     spike_func, interpret, res, g_logits):
    traces, zin_p, zin_shape, w_in, beta, w_out, tstar = res
    g_z_in, g_w_in, _, g_w_out, g_b = _mid_bwd_call(
        None, tuple(traces), None, zin_p, w_in, None, beta, T=n_steps,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold, gamma=gamma,
        spike_func=spike_func,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, g_logits=g_logits, tstar=tstar, w_out=w_out,
        kappa=kappa,
    )
    return (g_z_in[:, :zin_shape[1], :], g_w_in,
            jnp.zeros_like(jnp.asarray(beta)), g_w_out, g_b)


fused_mid_ff_scan_head.defvjp(_mid_ff_head_fwd, _mid_ff_head_bwd)


# ---------------------------------------------------------------------------
# Head + spike-count variants: (logits, counts) in one kernel pair -- the
# fused carrier for the spike regularizers (reference snn.py:401-408) on
# deep networks' LAST hidden layer (see pallas_fused head_counts).
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=MID_HEAD_REC_STATICS)
def fused_mid_rec_scan_head_counts(
    z_in: jax.Array,
    w_in: jax.Array,
    w_rec: jax.Array,
    beta,
    w_out: jax.Array,
    b_out: jax.Array,
    n_steps: int,
    alif: bool,
    alpha: float,
    rho: float,
    threshold: float,
    gamma: float,
    kappa: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
):
    """Like :func:`fused_mid_rec_scan_head` but returns
    ``(logits (B, O), spike_counts (B, H))``, differentiable in both."""
    _, _, logits, _, counts = _mid_fwd_call(
        z_in, w_in, w_rec, beta, T=n_steps, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, store_traces=False, w_out=w_out, b_out=b_out,
        kappa=kappa, store_counts=True,
    )
    return logits, counts


def _mid_rec_head_cnt_fwd(z_in, w_in, w_rec, beta, w_out, b_out, n_steps,
                          alif, alpha, rho, threshold, gamma, kappa,
                          spike_func, interpret):
    traces, zin_p, logits, tstar, counts = _mid_fwd_call(
        z_in, w_in, w_rec, beta, T=n_steps, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, w_out=w_out, b_out=b_out, kappa=kappa,
        store_counts=True,
    )
    return (logits, counts), (traces, zin_p, z_in.shape, w_in, w_rec, beta,
                              w_out, tstar)


def _mid_rec_head_cnt_bwd(n_steps, alif, alpha, rho, threshold, gamma,
                          kappa, spike_func, interpret, res, g):
    g_logits, g_counts = g
    traces, zin_p, zin_shape, w_in, w_rec, beta, w_out, tstar = res
    g_z_in, g_w_in, g_w_rec, g_w_out, g_b = _mid_bwd_call(
        None, tuple(traces), None, zin_p, w_in, w_rec, beta, T=n_steps,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold, gamma=gamma,
        spike_func=spike_func,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, g_logits=g_logits, tstar=tstar, w_out=w_out,
        kappa=kappa, g_counts=g_counts,
    )
    return (g_z_in[:, :zin_shape[1], :], g_w_in, g_w_rec,
            jnp.zeros_like(jnp.asarray(beta)), g_w_out, g_b)


fused_mid_rec_scan_head_counts.defvjp(
    _mid_rec_head_cnt_fwd, _mid_rec_head_cnt_bwd
)


@functools.partial(jax.custom_vjp, nondiff_argnums=MID_HEAD_FF_STATICS)
def fused_mid_ff_scan_head_counts(
    z_in: jax.Array,
    w_in: jax.Array,
    beta,
    w_out: jax.Array,
    b_out: jax.Array,
    n_steps: int,
    alif: bool,
    alpha: float,
    rho: float,
    threshold: float,
    gamma: float,
    kappa: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
):
    """Feedforward mid-head+counts variant: no recurrent weights."""
    _, _, logits, _, counts = _mid_fwd_call(
        z_in, w_in, None, beta, T=n_steps, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, store_traces=False, w_out=w_out, b_out=b_out,
        kappa=kappa, store_counts=True,
    )
    return logits, counts


def _mid_ff_head_cnt_fwd(z_in, w_in, beta, w_out, b_out, n_steps, alif,
                         alpha, rho, threshold, gamma, kappa, spike_func,
                         interpret):
    traces, zin_p, logits, tstar, counts = _mid_fwd_call(
        z_in, w_in, None, beta, T=n_steps, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, w_out=w_out, b_out=b_out, kappa=kappa,
        store_counts=True,
    )
    return (logits, counts), (traces, zin_p, z_in.shape, w_in, beta, w_out,
                              tstar)


def _mid_ff_head_cnt_bwd(n_steps, alif, alpha, rho, threshold, gamma, kappa,
                         spike_func, interpret, res, g):
    g_logits, g_counts = g
    traces, zin_p, zin_shape, w_in, beta, w_out, tstar = res
    g_z_in, g_w_in, _, g_w_out, g_b = _mid_bwd_call(
        None, tuple(traces), None, zin_p, w_in, None, beta, T=n_steps,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold, gamma=gamma,
        spike_func=spike_func,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, g_logits=g_logits, tstar=tstar, w_out=w_out,
        kappa=kappa, g_counts=g_counts,
    )
    return (g_z_in[:, :zin_shape[1], :], g_w_in,
            jnp.zeros_like(jnp.asarray(beta)), g_w_out, g_b)


fused_mid_ff_scan_head_counts.defvjp(
    _mid_ff_head_cnt_fwd, _mid_ff_head_cnt_bwd
)
