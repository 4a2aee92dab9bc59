"""Pallas TPU kernel pair: an entire TWO-hidden-layer spiking network --
encode -> layer-0 scan -> layer-1 scan -> readout integrator ->
first-argmax max-over-time -- as ONE forward and ONE backward kernel.

Why a dedicated kernel: the round-5 mid-head composition (layer-0 fused
kernel + mid-head kernel, ops/pallas_fused_mid.py) already removed every
HBM trace except layer 0's z and its cotangent, yet two-hidden models
still measured ~65% of the single-hidden flagship -- the two kernels'
serial (tile, time-step) chains run back to back, so the latency-bound
wall time doubles.  This kernel SOFTWARE-PIPELINES the two layers inside
one grid: at grid step t it advances layer 0's chain on time block t and
layer 1's chain (plus the readout) on time block t-1, with the z_0 block
handed over in VMEM scratch.  The two chains are data-independent within
a grid step, so Mosaic's scheduler interleaves them -- the same overlap
the ILV ablation measured as free (PARITY.md) -- and the total critical
path returns to ~one chain instead of two.  The grid runs T/K + 1 steps
(one drain step for the trailing layer).

Residual scheme per layer matches the head kernels
(ops/pallas_fused.py): the delta trace only (z recomputed sign-exact as
delta >= 0 in the backward; + the adaptation trace for Phi's dynamic
threshold).  The backward pipelines in reverse: layer 1's reverse block
produces the dz_0 block (batched W_1^T matmuls off the serial chain) one
grid step before layer 0's reverse block consumes it.

Reference surface covered: deep networks built by ``n_hidden_neurons``
lists (snn.py:116-125) with the standard readout max-over-time
(snn.py:211-213, 228; spiking_layers.py:402-408); both hidden layers
share the layer class and scalar parameters (how SNN._build constructs
them), betas are per-layer.  ``_counts`` variants also emit both layers'
per-neuron spike counts for the spike regularizers (snn.py:401-408).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fused import (
    _LANE,
    _MAX_BLOCK_B,
    _SUBLANE,
    _pad2,
    _pad_lat,
    _spike_row,
)
from .pallas_scan import (
    _fit_block_b,
    _use_delta_residual,
)
from .surrogate import (
    SpikeFuncType,
    surrogate_grad_from_delta as _surrogate_grad_from_delta,
)

__all__ = [
    "fused2_rec_head",
    "fused2_ff_head",
    "fused2_rec_head_counts",
    "fused2_ff_head_counts",
    "fused2_head_supported",
]

# Distinct revolving (K, bb, h) blocks the BACKWARD keeps in flight
# (d0 at two block indices + 2 boundary rows + d1 + dcur blocks + the
# dz0 pipe + s blocks), double-buffered -- the conservative count used
# for both directions so they pick the same tile.
_N2_BLOCKS = 12


def _plan2(T: int, B: int, hmax_pad: int):
    """(K, bb): prefer the largest batch tile (the serial chains are
    latency-bound -- tile rows are the work each ~2 us link carries),
    then the largest time block (DMA amortization; measured flat beyond
    moderate K)."""
    bb_req = min(_MAX_BLOCK_B, -(-B // _SUBLANE) * _SUBLANE)
    best = None
    for K in range(min(16, T), 0, -1):
        if T % K:
            continue
        bb = _fit_block_b(bb_req, K, hmax_pad, _N2_BLOCKS)
        cand = (bb, K)
        if best is None or cand > best:
            best = cand
    return best[1], best[0]


def fused2_head_supported(n_steps: int, n_features: int, h1: int, h2: int,
                          n_out: int, recurrent: bool = True,
                          itemsize: int = 4) -> bool:
    """All five weight blocks (+ both f32 grad accumulators in the
    backward) must fit VMEM beside the revolving blocks; sized like the
    single-layer head gate with the second layer's weights added."""
    f_pad = -(-n_features // _LANE) * _LANE
    h1_pad = -(-h1 // _LANE) * _LANE
    h2_pad = -(-h2 // _LANE) * _LANE
    o_pad = -(-n_out // _LANE) * _LANE
    w_bytes = (f_pad * h1_pad + h1_pad * h2_pad + h2_pad * o_pad) * itemsize
    if recurrent:
        w_bytes += (h1_pad * h1_pad + h2_pad * h2_pad) * itemsize
    # + f32 grad accumulators (backward) at the same element counts.
    fixed = w_bytes + w_bytes // itemsize * 4
    return (
        jax.default_backend() == "tpu"
        and n_steps >= 1
        and o_pad <= 512
        and fixed <= 6 * 1024 * 1024
        and _plan2(n_steps, _MAX_BLOCK_B, max(h1_pad, h2_pad))[1] >= _SUBLANE
    )


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------
def _fused2_fwd_kernel(refs, *, K, n_steps, use_periods, alif, has_w,
                       alpha, rho, threshold, store_delta, kappa,
                       store_traces=True, store_counts=False):
    i = 0
    lat_ref = refs[i]; i += 1
    w0_ref = refs[i]; i += 1
    w0r_ref = refs[i] if has_w else None
    i += 1 if has_w else 0
    beta0_ref = refs[i]; i += 1
    w1_ref = refs[i]; i += 1
    w1r_ref = refs[i] if has_w else None
    i += 1 if has_w else 0
    beta1_ref = refs[i]; i += 1
    wout_ref = refs[i]; i += 1
    bout_ref = refs[i]; i += 1
    rest = refs[i:]
    n_res = 0 if not store_traces else (1 if (store_delta or not alif) else 2)
    d0_ref = a0_ref = d1_ref = a1_ref = None
    if store_traces:
        d0_ref = rest[0]
        if n_res == 2:
            a0_ref = rest[1]
        d1_ref = rest[n_res]
        if n_res == 2:
            a1_ref = rest[n_res + 1]
        rest = rest[2 * n_res:]
    logits_ref, tstar_ref, *rest = rest
    cnt0_ref = cnt1_ref = None
    if store_counts:
        cnt0_ref, cnt1_ref, *rest = rest
    (v0_scr, a0_scr, z0_scr, v1_scr, a1_scr, z1_scr,
     vr_scr, m_scr, ts_scr, zpipe_scr) = rest

    t = pl.program_id(1)
    nb = pl.num_programs(1) - 1

    @pl.when(t == 0)
    def _():
        v0_scr[:] = jnp.zeros_like(v0_scr)
        a0_scr[:] = jnp.zeros_like(a0_scr)
        z0_scr[:] = jnp.zeros_like(z0_scr)
        v1_scr[:] = jnp.zeros_like(v1_scr)
        a1_scr[:] = jnp.zeros_like(a1_scr)
        z1_scr[:] = jnp.zeros_like(z1_scr)
        vr_scr[:] = jnp.zeros_like(vr_scr)
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        ts_scr[:] = jnp.zeros_like(ts_scr)
        zpipe_scr[:] = jnp.zeros_like(zpipe_scr)
        if cnt0_ref is not None:
            cnt0_ref[:] = jnp.zeros_like(cnt0_ref)
            cnt1_ref[:] = jnp.zeros_like(cnt1_ref)

    lat = lat_ref[:]
    w0 = w0_ref[:]
    w0r = w0r_ref[:] if has_w else None
    w1 = w1_ref[:]
    w1r = w1r_ref[:] if has_w else None
    w_out = wout_ref[:]
    b_out = bout_ref[:]
    trace_dtype = d0_ref.dtype if d0_ref is not None else jnp.float32
    f32 = jnp.float32

    valid_a = t < nb   # layer 0 advances on time block t
    valid_b = t > 0    # layer 1 + readout trail on time block t - 1
    # The t == nb drain step re-reads block nb-1's spike rows (clamped
    # base); its results are discarded (state/count/trace writes are all
    # predicated), so the clamp only avoids an out-of-range encode index.
    tA = jnp.minimum(t, nb - 1)

    # Stage B consumes the z0 block stage A produced LAST grid step: read
    # the pipe before this step's stage A overwrites it (Pallas orders
    # the load before the store on the same ref).
    z0_pipe = zpipe_scr[:]

    # Off-chain MXU work for both stages, batched up front: the K
    # spike-gen + W0 matmuls (state-independent) and the K W1 matmuls on
    # the piped z0 block.
    curs0 = [
        jnp.dot(
            _spike_row(lat, tA * K + k, n_steps, use_periods).astype(
                w0.dtype
            ),
            w0, preferred_element_type=f32,
        )
        for k in range(K)
    ]
    Kp, bb_, h1_ = z0_pipe.shape
    curs1 = jnp.dot(
        z0_pipe.reshape(Kp * bb_, h1_).astype(w1.dtype), w1,
        preferred_element_type=f32,
    ).reshape(Kp, bb_, -1)

    v0, a0, z0p = v0_scr[:], a0_scr[:], z0_scr[:]
    v1, a1, z1p = v1_scr[:], a1_scr[:], z1_scr[:]
    d0s, a0s, z0s = [], [], []
    d1s, a1s, z1s = [], [], []
    # The two serial chains, manually interleaved per step: stage A's
    # step k and stage B's step k touch disjoint state, so Mosaic can
    # overlap one chain's VPU dynamics with the other's recurrent matmul
    # (the ILV ablation measured this overlap as free).
    for k in range(K):
        # ---- layer 0, forward step tA*K + k ----
        cur0 = curs0[k]
        if has_w:
            cur0 = cur0 + jnp.dot(z0p.astype(w0r.dtype), w0r,
                                  preferred_element_type=f32)
        v0 = (alpha * v0 + cur0) * (1.0 - z0p)
        if alif:
            a0 = rho * a0 + z0p
            thr0 = threshold + beta0_ref[0, 0] * a0
        else:
            thr0 = threshold
        delta0 = v0 - thr0
        z0p = (delta0 >= 0).astype(v0.dtype)
        d0s.append(delta0)
        a0s.append(a0)
        z0s.append(z0p)
        # ---- layer 1, forward step (t-1)*K + k ----
        cur1 = curs1[k]
        if has_w:
            cur1 = cur1 + jnp.dot(z1p.astype(w1r.dtype), w1r,
                                  preferred_element_type=f32)
        v1n = (alpha * v1 + cur1) * (1.0 - z1p)
        if alif:
            a1n = rho * a1 + z1p
            thr1 = threshold + beta1_ref[0, 0] * a1n
        else:
            a1n = a1
            thr1 = threshold
        delta1 = v1n - thr1
        z1n = (delta1 >= 0).astype(v1n.dtype)
        # Stage-B state only advances on valid steps (at t == 0 the pipe
        # holds the zero init, but keep the guard uniform with the
        # readout/count guards below).
        v1 = jnp.where(valid_b, v1n, v1)
        a1 = jnp.where(valid_b, a1n, a1)
        z1p = jnp.where(valid_b, z1n, z1p)
        d1s.append(delta1)
        a1s.append(a1n)
        z1s.append(z1p)

    # State write-back.  Stage A's state past t == nb-1 is never read
    # again, so its drain-step garbage needs no guard.
    v0_scr[:] = v0
    a0_scr[:] = a0
    z0_scr[:] = z0p
    v1_scr[:] = v1
    a1_scr[:] = a1
    z1_scr[:] = z1p
    zpipe_scr[:] = jnp.stack(z0s)

    if store_traces:
        @pl.when(valid_a)
        def _():
            for k in range(K):
                d0_ref[k] = d0s[k].astype(trace_dtype)
                if a0_ref is not None:
                    a0_ref[k] = a0s[k].astype(trace_dtype)

        @pl.when(valid_b)
        def _():
            for k in range(K):
                d1_ref[k] = d1s[k].astype(trace_dtype)
                if a1_ref is not None:
                    a1_ref[k] = a1s[k].astype(trace_dtype)

    if cnt0_ref is not None:
        acc0 = z0s[0].astype(f32)
        for zr in z0s[1:]:
            acc0 = acc0 + zr.astype(f32)
        cnt0_ref[:] += jnp.where(valid_a, acc0, 0.0)
        acc1 = z1s[0].astype(f32)
        for zr in z1s[1:]:
            acc1 = acc1 + zr.astype(f32)
        cnt1_ref[:] += jnp.where(valid_b, acc1, 0.0)

    # Readout leaky integrator + running first-argmax max-over-time on
    # stage B's steps (snn.py:228, torch.max tie semantics); the K
    # readout matmuls batch into ONE MXU call off the serial chain.
    z1_blk = jnp.stack(z1s).reshape(K * bb_, -1)
    r_all = (
        jnp.dot(z1_blk.astype(w_out.dtype), w_out,
                preferred_element_type=f32) + b_out
    ).reshape(K, bb_, -1)
    v_r, m_run, ts_run = vr_scr[:], m_scr[:], ts_scr[:]
    for k in range(K):
        v_rn = kappa * v_r + r_all[k]
        better = v_rn > m_run
        v_r = jnp.where(valid_b, v_rn, v_r)
        m_run = jnp.where(valid_b & better, v_rn, m_run)
        ts_run = jnp.where(valid_b & better, (t - 1) * K + k, ts_run)
    vr_scr[:] = v_r
    m_scr[:] = m_run
    ts_scr[:] = ts_run

    @pl.when(t == nb)
    def _():
        logits_ref[:] = m_run
        tstar_ref[:] = ts_run


def _fused2_fwd_call(latencies, w0, w0r, beta0, w1, w1r, beta1, w_out,
                     b_out, *, T, use_periods, alif, alpha, rho, threshold,
                     store_delta, kappa, interpret, store_traces=True,
                     store_counts=False):
    has_w = w0r is not None
    B, F = latencies.shape
    H1 = w0.shape[-1]
    H2 = w1.shape[-1]
    O = w_out.shape[-1]
    f_pad = -(-F // _LANE) * _LANE
    h1_pad = -(-H1 // _LANE) * _LANE
    h2_pad = -(-H2 // _LANE) * _LANE
    o_pad = -(-O // _LANE) * _LANE
    K, bb = _plan2(T, B, max(h1_pad, h2_pad))
    lat = _pad_lat(latencies.astype(jnp.int32), bb, f_pad)
    Bp = lat.shape[0]
    nb = T // K
    grid = (Bp // bb, nb + 1)
    trace_dtype = (
        w0.dtype if jnp.issubdtype(w0.dtype, jnp.floating) else jnp.float32
    )
    n_res = 0 if not store_traces else (1 if (store_delta or not alif) else 2)

    def full(r, c):
        return pl.BlockSpec((r, c), lambda b, t: (0, 0),
                            memory_space=pltpu.VMEM)

    lat_spec = pl.BlockSpec((bb, f_pad), lambda b, t: (b, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                        memory_space=pltpu.SMEM)
    # Layer 0 writes time block t (clamped: the t == nb drain step maps
    # back onto block nb-1, which it does NOT write -- the resident
    # buffer still holds block nb-1's rows, so the write-back is a
    # no-op); layer 1 writes block t-1 (the t == 0 prologue writes
    # nothing into the clamped block-0 buffer, which t == 1 then fills
    # before any consumer reads it).
    d0_spec = pl.BlockSpec(
        (K, bb, h1_pad),
        lambda b, t, n=nb: (jnp.minimum(t, n - 1), b, 0),
        memory_space=pltpu.VMEM,
    )
    d1_spec = pl.BlockSpec(
        (K, bb, h2_pad),
        lambda b, t: (jnp.maximum(t - 1, 0), b, 0),
        memory_space=pltpu.VMEM,
    )
    head_spec = pl.BlockSpec((bb, o_pad), lambda b, t: (b, 0),
                             memory_space=pltpu.VMEM)

    in_specs = [lat_spec, full(f_pad, h1_pad)]
    args = [lat, _pad2(w0, f_pad, h1_pad)]
    if has_w:
        in_specs.append(full(h1_pad, h1_pad))
        args.append(_pad2(w0r, h1_pad, h1_pad))
    in_specs += [smem, full(h1_pad, h2_pad)]
    args.append(jnp.asarray(beta0, jnp.float32).reshape(1, 1))
    args.append(_pad2(w1, h1_pad, h2_pad))
    if has_w:
        in_specs.append(full(h2_pad, h2_pad))
        args.append(_pad2(w1r, h2_pad, h2_pad))
    in_specs += [smem, full(h2_pad, o_pad), full(1, o_pad)]
    args.append(jnp.asarray(beta1, jnp.float32).reshape(1, 1))
    args.append(_pad2(w_out, h2_pad, o_pad))
    args.append(
        _pad2(jnp.asarray(b_out, jnp.float32).reshape(1, -1), 1, o_pad)
    )

    out_specs, out_shape = [], []
    if store_traces:
        for _ in range(n_res):
            out_specs.append(d0_spec)
            out_shape.append(
                jax.ShapeDtypeStruct((T, Bp, h1_pad), trace_dtype)
            )
        for _ in range(n_res):
            out_specs.append(d1_spec)
            out_shape.append(
                jax.ShapeDtypeStruct((T, Bp, h2_pad), trace_dtype)
            )
    out_specs += [head_spec, head_spec]
    out_shape += [
        jax.ShapeDtypeStruct((Bp, o_pad), jnp.float32),
        jax.ShapeDtypeStruct((Bp, o_pad), jnp.int32),
    ]
    if store_counts:
        out_specs += [
            pl.BlockSpec((bb, h1_pad), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, h2_pad), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((Bp, h1_pad), jnp.float32),
            jax.ShapeDtypeStruct((Bp, h2_pad), jnp.float32),
        ]
    scratch = [
        pltpu.VMEM((bb, h1_pad), jnp.float32),
        pltpu.VMEM((bb, h1_pad), jnp.float32),
        pltpu.VMEM((bb, h1_pad), jnp.float32),
        pltpu.VMEM((bb, h2_pad), jnp.float32),
        pltpu.VMEM((bb, h2_pad), jnp.float32),
        pltpu.VMEM((bb, h2_pad), jnp.float32),
        pltpu.VMEM((bb, o_pad), jnp.float32),
        pltpu.VMEM((bb, o_pad), jnp.float32),
        pltpu.VMEM((bb, o_pad), jnp.int32),
        pltpu.VMEM((K, bb, h1_pad), jnp.float32),
    ]
    kernel = functools.partial(
        _fused2_fwd_kernel, K=K, n_steps=T, use_periods=use_periods,
        alif=alif, has_w=has_w, alpha=alpha, rho=rho, threshold=threshold,
        store_delta=store_delta, kappa=kappa, store_traces=store_traces,
        store_counts=store_counts,
    )
    outs = pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
    )(*args)
    n_tr = 2 * n_res if store_traces else 0
    traces = tuple(outs[:n_tr])  # padded residuals, backward-only
    logits = outs[n_tr][..., :B, :O]
    tstar = outs[n_tr + 1][..., :B, :O]
    if store_counts:
        cnt0 = outs[n_tr + 2][..., :B, :H1]
        cnt1 = outs[n_tr + 3][..., :B, :H2]
        return traces, lat, logits, tstar, (cnt0, cnt1)
    return traces, lat, logits, tstar


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------
def _fused2_bwd_kernel(refs, *, K, n_steps, use_periods, alif, has_w,
                       alpha, rho, threshold, gamma, spike_func,
                       store_delta, kappa, has_gcnt=False):
    n_res = 1 if (store_delta or not alif) else 2
    i = 0
    g_ref = refs[i]; i += 1
    ts_ref = refs[i]; i += 1
    gcnt0_ref = gcnt1_ref = None
    if has_gcnt:
        gcnt0_ref = refs[i]; i += 1
        gcnt1_ref = refs[i]; i += 1
    # Layer-0 residual at stage A's block (jA = nb - u) AND at stage B's
    # block (jB = nb-1-u, where z0 rows feed g_W1), plus the boundary
    # rows both stages need for z_{t-1}.
    d0A_ref = refs[i]; i += 1
    a0A_ref = refs[i] if n_res == 2 else None
    i += 1 if n_res == 2 else 0
    b0A_ref = refs[i]; i += 1
    d0B_ref = refs[i]; i += 1
    d1B_ref = refs[i]; i += 1
    a1B_ref = refs[i] if n_res == 2 else None
    i += 1 if n_res == 2 else 0
    b1B_ref = refs[i]; i += 1
    lat_ref = refs[i]; i += 1
    w0_ref = refs[i]; i += 1
    w0r_ref = refs[i] if has_w else None
    i += 1 if has_w else 0
    beta0_ref = refs[i]; i += 1
    w1_ref = refs[i]; i += 1
    w1r_ref = refs[i] if has_w else None
    i += 1 if has_w else 0
    beta1_ref = refs[i]; i += 1
    wout_ref = refs[i]; i += 1
    # Outputs: per-tile grad partials.
    dw0_ref = refs[i]; i += 1
    dw0r_ref = refs[i] if has_w else None
    i += 1 if has_w else 0
    dw1_ref = refs[i]; i += 1
    dw1r_ref = refs[i] if has_w else None
    i += 1 if has_w else 0
    dwout_ref = refs[i]; i += 1
    db_ref = refs[i]; i += 1
    (dcur0_scr, dcur0_blk, dcur1_scr, dcur1_blk, s_scr, s_blk,
     pipe_scr) = refs[i:]

    u = pl.program_id(1)
    nb = pl.num_programs(1) - 1
    f32 = jnp.float32

    @pl.when(u == 0)
    def _():
        dcur0_scr[:] = jnp.zeros_like(dcur0_scr)
        dcur1_scr[:] = jnp.zeros_like(dcur1_scr)
        s_scr[:] = jnp.zeros_like(s_scr)
        pipe_scr[:] = jnp.zeros_like(pipe_scr)
        dw0_ref[0] = jnp.zeros_like(dw0_ref[0])
        if has_w:
            dw0r_ref[0] = jnp.zeros_like(dw0r_ref[0])
        dw1_ref[0] = jnp.zeros_like(dw1_ref[0])
        if has_w:
            dw1r_ref[0] = jnp.zeros_like(dw1r_ref[0])
        dwout_ref[0] = jnp.zeros_like(dwout_ref[0])
        db_ref[0] = jnp.zeros_like(db_ref[0])

    valid_b = u < nb    # layer 1 reverses forward block jB = nb-1-u
    valid_a = u > 0     # layer 0 trails on forward block jA = nb-u
    jB = jnp.maximum(nb - 1 - u, 0)
    jA = jnp.minimum(nb - u, nb - 1)

    lat = lat_ref[:]
    w0 = w0_ref[:]
    w0r = w0r_ref[:] if has_w else None
    w1 = w1_ref[:]
    w1r = w1r_ref[:] if has_w else None
    w_out = wout_ref[:]

    # Stage A consumes the dz0 block stage B produced LAST grid step.
    dz0_pipe = pipe_scr[:]

    # ---- Stage B (layer 1 + readout), forward block jB ----
    g = g_ref[:].astype(f32)
    ts = ts_ref[:]
    # Readout cotangent chain s(t) = kappa s(t+1) + g [t == argmax]:
    # independent of the membrane chain, so the block's s values and the
    # K dz1 matmuls run off the serial chain (pallas_fused pattern).
    s_carry = s_scr[:]
    for k in reversed(range(K)):
        step = jB * K + k
        s_new = kappa * s_carry + g * (step == ts).astype(f32)
        s_carry = jnp.where(valid_b, s_new, s_carry)
        s_blk[k] = s_carry
    s_scr[:] = s_carry
    K_, bb_, O_ = s_blk.shape
    H2_ = d1B_ref.shape[2]
    H1_ = d0A_ref.shape[2]
    s_flat = s_blk[:].reshape(K_ * bb_, O_)
    dz1_all = jax.lax.dot_general(
        s_flat.astype(w_out.dtype), w_out,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ).reshape(K_, bb_, H2_)
    if gcnt1_ref is not None:
        dz1_all = dz1_all + gcnt1_ref[:].astype(f32)[None]
    z1_res = (d1B_ref[:].astype(f32) >= 0).astype(f32)
    z1b_row = jnp.where(jB == 0, 0.0, (b1B_ref[0].astype(f32) >= 0)
                        .astype(f32))
    thr1_dyn = (
        threshold + beta1_ref[0, 0] * a1B_ref[:].astype(f32)
        if (alif and not store_delta)
        else threshold
    )
    surr1_all = _surrogate_grad_from_delta(
        spike_func, d1B_ref[:].astype(f32), thr1_dyn, gamma
    )
    # ---- Stage A (layer 0) off-chain prep, forward block jA ----
    z0A_res = (d0A_ref[:].astype(f32) >= 0).astype(f32)
    z0b_row = jnp.where(jA == 0, 0.0, (b0A_ref[0].astype(f32) >= 0)
                        .astype(f32))
    thr0_dyn = (
        threshold + beta0_ref[0, 0] * a0A_ref[:].astype(f32)
        if (alif and not store_delta)
        else threshold
    )
    surr0_all = _surrogate_grad_from_delta(
        spike_func, d0A_ref[:].astype(f32), thr0_dyn, gamma
    )
    dz0_all = dz0_pipe
    if gcnt0_ref is not None:
        dz0_all = dz0_all + gcnt0_ref[:].astype(f32)[None]

    # The two reverse serial chains, manually interleaved per step
    # (disjoint state; Mosaic overlaps them like the forward).
    dc0 = dcur0_scr[:]
    dc1 = dcur1_scr[:]
    for k in reversed(range(K)):
        # layer 1 reverse, step jB*K + k
        dz1 = dz1_all[k]
        if has_w:
            dz1 = dz1 + jax.lax.dot_general(
                dc1.astype(w1r.dtype), w1r,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
        dv1 = dz1 * surr1_all[k] + alpha * dc1
        z1_prev = z1_res[k - 1] if k > 0 else z1b_row
        dcur1 = dv1 * (1.0 - z1_prev)
        dc1 = jnp.where(valid_b, dcur1, dc1)
        dcur1_blk[k] = dc1
        # layer 0 reverse, step jA*K + k
        dz0 = dz0_all[k]
        if has_w:
            dz0 = dz0 + jax.lax.dot_general(
                dc0.astype(w0r.dtype), w0r,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
        dv0 = dz0 * surr0_all[k] + alpha * dc0
        z0_prev = z0A_res[k - 1] if k > 0 else z0b_row
        dcur0 = dv0 * (1.0 - z0_prev)
        dc0 = jnp.where(valid_a, dcur0, dc0)
        dcur0_blk[k] = dc0
    dcur0_scr[:] = dc0
    dcur1_scr[:] = dc1

    # dz0 block for NEXT grid step's stage A: batched W1^T matmuls off
    # the chain (the block stage B just reversed is forward block jB,
    # exactly the block stage A processes at u+1).
    dcur1_flat = dcur1_blk[:].reshape(K_ * bb_, H2_)
    pipe_scr[:] = jax.lax.dot_general(
        dcur1_flat.astype(w1.dtype), w1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ).reshape(K_, bb_, H1_)

    # ---- Weight-gradient partials (all off the serial chains) ----
    vb = valid_b.astype(f32)
    va = valid_a.astype(f32)
    # g_W1 += z0(t)^T dcur1(t) over stage B's block: z0 regenerated from
    # the layer-0 residual AT jB (the second d0 spec).
    z0B_res = (d0B_ref[:].astype(f32) >= 0).astype(f32)
    dw1_ref[0] += vb * jax.lax.dot_general(
        z0B_res.reshape(K_ * bb_, H1_).astype(w1.dtype),
        dcur1_flat.astype(w1.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    if has_w:
        if K_ > 1:
            dw1r_ref[0] += vb * jax.lax.dot_general(
                z1_res[: K_ - 1].reshape((K_ - 1) * bb_, H2_)
                .astype(w1r.dtype),
                dcur1_blk[1:].reshape((K_ - 1) * bb_, H2_)
                .astype(w1r.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        dw1r_ref[0] += vb * jax.lax.dot_general(
            z1b_row.astype(w1r.dtype), dcur1_blk[0].astype(w1r.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    dwout_ref[0] += vb * jax.lax.dot_general(
        z1_res.reshape(K_ * bb_, H2_).astype(w_out.dtype),
        s_flat.astype(w_out.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    db_ref[0] += vb * jnp.sum(s_flat, axis=0, keepdims=True)
    # g_W0 += spikes(t)^T dcur0(t), spike rows regenerated at stage A's
    # forward steps.
    for k in range(K):
        step = jA * K + k
        spk = _spike_row(lat, step, n_steps, use_periods)
        dw0_ref[0] += va * jax.lax.dot_general(
            spk.astype(w0.dtype), dcur0_blk[k].astype(w0.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    if has_w:
        if K_ > 1:
            dw0r_ref[0] += va * jax.lax.dot_general(
                z0A_res[: K_ - 1].reshape((K_ - 1) * bb_, H1_)
                .astype(w0r.dtype),
                dcur0_blk[1:].reshape((K_ - 1) * bb_, H1_)
                .astype(w0r.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        dw0r_ref[0] += va * jax.lax.dot_general(
            z0b_row.astype(w0r.dtype), dcur0_blk[0].astype(w0r.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    del rho


def _fused2_bwd_call(residuals, lat, w0, w0r, beta0, w1, w1r, beta1,
                     w_out, b_out, g_logits, tstar, *, T, use_periods,
                     alif, alpha, rho, threshold, gamma, spike_func,
                     store_delta, kappa, interpret, g_counts=None):
    has_w = w0r is not None
    n_res = 1 if (store_delta or not alif) else 2
    F = w0.shape[-2]
    H1 = w0.shape[-1]
    H2 = w1.shape[-1]
    O = w_out.shape[-1]
    f_pad = lat.shape[1]
    h1_pad = -(-H1 // _LANE) * _LANE
    h2_pad = -(-H2 // _LANE) * _LANE
    o_pad = -(-O // _LANE) * _LANE
    K, bb = _plan2(T, residuals[0].shape[1], max(h1_pad, h2_pad))
    Bp = lat.shape[0]
    nb = T // K
    grid = (Bp // bb, nb + 1)

    d0_parts = residuals[:n_res]
    d1_parts = residuals[n_res:]

    def full(r, c):
        return pl.BlockSpec((r, c), lambda b, u: (0, 0),
                            memory_space=pltpu.VMEM)

    lat_spec = pl.BlockSpec((bb, f_pad), lambda b, u: (b, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda b, u: (0, 0),
                        memory_space=pltpu.SMEM)
    head_spec = pl.BlockSpec((bb, o_pad), lambda b, u: (b, 0),
                             memory_space=pltpu.VMEM)

    def blkA(h):
        return pl.BlockSpec(
            (K, bb, h),
            lambda b, u, n=nb: (jnp.minimum(n - u, n - 1), b, 0),
            memory_space=pltpu.VMEM,
        )

    def blkB(h):
        return pl.BlockSpec(
            (K, bb, h),
            lambda b, u, n=nb: (jnp.maximum(n - 1 - u, 0), b, 0),
            memory_space=pltpu.VMEM,
        )

    def rowA(h):
        return pl.BlockSpec(
            (1, bb, h),
            lambda b, u, n=nb, K=K: (
                jnp.maximum(jnp.minimum(n - u, n - 1) * K - 1, 0), b, 0
            ),
            memory_space=pltpu.VMEM,
        )

    def rowB(h):
        return pl.BlockSpec(
            (1, bb, h),
            lambda b, u, n=nb, K=K: (
                jnp.maximum(jnp.maximum(n - 1 - u, 0) * K - 1, 0), b, 0
            ),
            memory_space=pltpu.VMEM,
        )

    pad_bo = [(0, 0)] * (g_logits.ndim - 2) + [
        (0, Bp - g_logits.shape[-2]), (0, o_pad - g_logits.shape[-1])
    ]
    gl = jnp.pad(g_logits.astype(jnp.float32), pad_bo)
    ts_p = jnp.pad(tstar, pad_bo)

    in_specs = [head_spec, head_spec]
    args = [gl, ts_p]
    if g_counts is not None:
        gc0, gc1 = g_counts

        def padbh(x, h):
            return jnp.pad(
                x.astype(jnp.float32),
                ((0, Bp - x.shape[0]), (0, h - x.shape[1])),
            )

        in_specs += [
            pl.BlockSpec((bb, h1_pad), lambda b, u: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, h2_pad), lambda b, u: (b, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [padbh(gc0, h1_pad), padbh(gc1, h2_pad)]
    # d0 at jA (+ a0), the jA boundary row, d0 at jB, d1 at jB (+ a1),
    # the jB boundary row.
    in_specs += [blkA(h1_pad)]
    args += [d0_parts[0]]
    if n_res == 2:
        in_specs += [blkA(h1_pad)]
        args += [d0_parts[1]]
    in_specs += [rowA(h1_pad), blkB(h1_pad), blkB(h2_pad)]
    args += [d0_parts[0], d0_parts[0], d1_parts[0]]
    if n_res == 2:
        in_specs += [blkB(h2_pad)]
        args += [d1_parts[1]]
    in_specs += [rowB(h2_pad), lat_spec]
    args += [d1_parts[0], lat]
    in_specs += [full(f_pad, h1_pad)]
    args += [_pad2(w0, f_pad, h1_pad)]
    if has_w:
        in_specs += [full(h1_pad, h1_pad)]
        args += [_pad2(w0r, h1_pad, h1_pad)]
    in_specs += [smem, full(h1_pad, h2_pad)]
    args += [jnp.asarray(beta0, jnp.float32).reshape(1, 1)]
    args += [_pad2(w1, h1_pad, h2_pad)]
    if has_w:
        in_specs += [full(h2_pad, h2_pad)]
        args += [_pad2(w1r, h2_pad, h2_pad)]
    in_specs += [smem, full(h2_pad, o_pad)]
    args += [jnp.asarray(beta1, jnp.float32).reshape(1, 1)]
    args += [_pad2(w_out, h2_pad, o_pad)]

    def acc_spec(r, c):
        return pl.BlockSpec((1, r, c), lambda b, u: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    n_tiles = Bp // bb
    out_specs = [acc_spec(f_pad, h1_pad)]
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, f_pad, h1_pad), jnp.float32)
    ]
    if has_w:
        out_specs.append(acc_spec(h1_pad, h1_pad))
        out_shape.append(
            jax.ShapeDtypeStruct((n_tiles, h1_pad, h1_pad), jnp.float32)
        )
    out_specs.append(acc_spec(h1_pad, h2_pad))
    out_shape.append(
        jax.ShapeDtypeStruct((n_tiles, h1_pad, h2_pad), jnp.float32)
    )
    if has_w:
        out_specs.append(acc_spec(h2_pad, h2_pad))
        out_shape.append(
            jax.ShapeDtypeStruct((n_tiles, h2_pad, h2_pad), jnp.float32)
        )
    out_specs += [acc_spec(h2_pad, o_pad), acc_spec(1, o_pad)]
    out_shape += [
        jax.ShapeDtypeStruct((n_tiles, h2_pad, o_pad), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, o_pad), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((bb, h1_pad), jnp.float32),
        pltpu.VMEM((K, bb, h1_pad), jnp.float32),
        pltpu.VMEM((bb, h2_pad), jnp.float32),
        pltpu.VMEM((K, bb, h2_pad), jnp.float32),
        pltpu.VMEM((bb, o_pad), jnp.float32),
        pltpu.VMEM((K, bb, o_pad), jnp.float32),
        pltpu.VMEM((K, bb, h1_pad), jnp.float32),
    ]
    kernel = functools.partial(
        _fused2_bwd_kernel, K=K, n_steps=T, use_periods=use_periods,
        alif=alif, has_w=has_w, alpha=alpha, rho=rho, threshold=threshold,
        gamma=gamma, spike_func=spike_func, store_delta=store_delta,
        kappa=kappa, has_gcnt=g_counts is not None,
    )
    outs = pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
    )(*args)
    j = 0
    g_w0 = jnp.sum(outs[j], axis=0)[:F, :H1].astype(w0.dtype); j += 1
    g_w0r = None
    if has_w:
        g_w0r = jnp.sum(outs[j], axis=0)[:H1, :H1].astype(w0r.dtype); j += 1
    g_w1 = jnp.sum(outs[j], axis=0)[:H1, :H2].astype(w1.dtype); j += 1
    g_w1r = None
    if has_w:
        g_w1r = jnp.sum(outs[j], axis=0)[:H2, :H2].astype(w1r.dtype); j += 1
    g_wout = jnp.sum(outs[j], axis=0)[:H2, :O].astype(w_out.dtype); j += 1
    g_b = jnp.sum(outs[j], axis=0)[0, :O]
    return g_w0, g_w0r, g_w1, g_w1r, g_wout, g_b


# ---------------------------------------------------------------------------
# custom_vjp wrappers
# ---------------------------------------------------------------------------
REC2_STATICS = (9, 10, 11, 12, 13, 14, 15, 16, 17, 18)


@functools.partial(jax.custom_vjp, nondiff_argnums=REC2_STATICS)
def fused2_rec_head(
    latencies: jax.Array,
    w0: jax.Array,
    w0_rec: jax.Array,
    beta0,
    w1: jax.Array,
    w1_rec: jax.Array,
    beta1,
    w_out: jax.Array,
    b_out: jax.Array,
    n_steps: int,
    use_periods: bool,
    alif: bool,
    alpha: float,
    rho: float,
    threshold: float,
    gamma: float,
    kappa: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
) -> jax.Array:
    """(latencies (B,F) int32, both hidden layers' weights, readout) ->
    logits (B, O) for a recurrent two-hidden-layer network.

    Numerically equal (up to f32 tile-order summation) to
    ``fused_encode_rec_scan`` + ``fused_mid_rec_scan_head``; one kernel
    pair instead of two, with the z_0 trace handed over in VMEM.  The
    primal (inference) pass stores no residuals at all."""
    _, _, logits, _ = _fused2_fwd_call(
        latencies, w0, w0_rec, beta0, w1, w1_rec, beta1, w_out, b_out,
        T=n_steps, use_periods=use_periods, alif=alif, alpha=alpha,
        rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        kappa=kappa, interpret=interpret, store_traces=False,
    )
    return logits


def _rec2_fwd(latencies, w0, w0_rec, beta0, w1, w1_rec, beta1, w_out,
              b_out, n_steps, use_periods, alif, alpha, rho, threshold,
              gamma, kappa, spike_func, interpret):
    traces, lat, logits, tstar = _fused2_fwd_call(
        latencies, w0, w0_rec, beta0, w1, w1_rec, beta1, w_out, b_out,
        T=n_steps, use_periods=use_periods, alif=alif, alpha=alpha,
        rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        kappa=kappa, interpret=interpret,
    )
    return logits, (traces, lat, latencies.shape, w0, w0_rec, beta0, w1,
                    w1_rec, beta1, w_out, b_out, tstar)


def _rec2_bwd(n_steps, use_periods, alif, alpha, rho, threshold, gamma,
              kappa, spike_func, interpret, res, g_logits):
    (traces, lat, lat_shape, w0, w0r, beta0, w1, w1r, beta1, w_out,
     b_out, tstar) = res
    g_w0, g_w0r, g_w1, g_w1r, g_wout, g_b = _fused2_bwd_call(
        traces, lat, w0, w0r, beta0, w1, w1r, beta1, w_out, b_out,
        g_logits, tstar, T=n_steps, use_periods=use_periods, alif=alif,
        alpha=alpha, rho=rho, threshold=threshold, gamma=gamma,
        spike_func=spike_func,
        store_delta=alif and _use_delta_residual(spike_func),
        kappa=kappa, interpret=interpret,
    )
    g_lat = np.zeros(lat_shape, dtype=jax.dtypes.float0)
    # Q3: beta's gradient is dead through the spike threshold
    # (surrogate.py) -- zero cotangent, bitwise-frozen under training.
    return (g_lat, g_w0, g_w0r, jnp.zeros_like(jnp.asarray(beta0)),
            g_w1, g_w1r, jnp.zeros_like(jnp.asarray(beta1)),
            g_wout, g_b.astype(jnp.asarray(b_out).dtype))


fused2_rec_head.defvjp(_rec2_fwd, _rec2_bwd)


FF2_STATICS = (7, 8, 9, 10, 11, 12, 13, 14, 15, 16)


@functools.partial(jax.custom_vjp, nondiff_argnums=FF2_STATICS)
def fused2_ff_head(
    latencies: jax.Array,
    w0: jax.Array,
    beta0,
    w1: jax.Array,
    beta1,
    w_out: jax.Array,
    b_out: jax.Array,
    n_steps: int,
    use_periods: bool,
    alif: bool,
    alpha: float,
    rho: float,
    threshold: float,
    gamma: float,
    kappa: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
) -> jax.Array:
    """Feedforward two-hidden-layer variant of :func:`fused2_rec_head`."""
    _, _, logits, _ = _fused2_fwd_call(
        latencies, w0, None, beta0, w1, None, beta1, w_out, b_out,
        T=n_steps, use_periods=use_periods, alif=alif, alpha=alpha,
        rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        kappa=kappa, interpret=interpret, store_traces=False,
    )
    return logits


def _ff2_fwd(latencies, w0, beta0, w1, beta1, w_out, b_out, n_steps,
             use_periods, alif, alpha, rho, threshold, gamma, kappa,
             spike_func, interpret):
    traces, lat, logits, tstar = _fused2_fwd_call(
        latencies, w0, None, beta0, w1, None, beta1, w_out, b_out,
        T=n_steps, use_periods=use_periods, alif=alif, alpha=alpha,
        rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        kappa=kappa, interpret=interpret,
    )
    return logits, (traces, lat, latencies.shape, w0, beta0, w1, beta1,
                    w_out, b_out, tstar)


def _ff2_bwd(n_steps, use_periods, alif, alpha, rho, threshold, gamma,
             kappa, spike_func, interpret, res, g_logits):
    (traces, lat, lat_shape, w0, beta0, w1, beta1, w_out, b_out,
     tstar) = res
    g_w0, _, g_w1, _, g_wout, g_b = _fused2_bwd_call(
        traces, lat, w0, None, beta0, w1, None, beta1, w_out, b_out,
        g_logits, tstar, T=n_steps, use_periods=use_periods, alif=alif,
        alpha=alpha, rho=rho, threshold=threshold, gamma=gamma,
        spike_func=spike_func,
        store_delta=alif and _use_delta_residual(spike_func),
        kappa=kappa, interpret=interpret,
    )
    g_lat = np.zeros(lat_shape, dtype=jax.dtypes.float0)
    return (g_lat, g_w0, jnp.zeros_like(jnp.asarray(beta0)),
            g_w1, jnp.zeros_like(jnp.asarray(beta1)),
            g_wout, g_b.astype(jnp.asarray(b_out).dtype))


fused2_ff_head.defvjp(_ff2_fwd, _ff2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=REC2_STATICS)
def fused2_rec_head_counts(
    latencies, w0, w0_rec, beta0, w1, w1_rec, beta1, w_out, b_out,
    n_steps: int, use_periods: bool, alif: bool, alpha: float, rho: float,
    threshold: float, gamma: float, kappa: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
):
    """:func:`fused2_rec_head` that also returns both hidden layers'
    per-sample per-neuron spike counts ``(logits, (cnt0, cnt1))`` --
    the fused-path carrier for the spike regularizers (snn.py:401-408)
    on two-hidden-layer networks."""
    _, _, logits, _, counts = _fused2_fwd_call(
        latencies, w0, w0_rec, beta0, w1, w1_rec, beta1, w_out, b_out,
        T=n_steps, use_periods=use_periods, alif=alif, alpha=alpha,
        rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        kappa=kappa, interpret=interpret, store_traces=False,
        store_counts=True,
    )
    return logits, counts


def _rec2c_fwd(latencies, w0, w0_rec, beta0, w1, w1_rec, beta1, w_out,
               b_out, n_steps, use_periods, alif, alpha, rho, threshold,
               gamma, kappa, spike_func, interpret):
    traces, lat, logits, tstar, counts = _fused2_fwd_call(
        latencies, w0, w0_rec, beta0, w1, w1_rec, beta1, w_out, b_out,
        T=n_steps, use_periods=use_periods, alif=alif, alpha=alpha,
        rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        kappa=kappa, interpret=interpret, store_counts=True,
    )
    return (logits, counts), (traces, lat, latencies.shape, w0, w0_rec,
                              beta0, w1, w1_rec, beta1, w_out, b_out,
                              tstar)


def _rec2c_bwd(n_steps, use_periods, alif, alpha, rho, threshold, gamma,
               kappa, spike_func, interpret, res, g):
    (traces, lat, lat_shape, w0, w0r, beta0, w1, w1r, beta1, w_out,
     b_out, tstar) = res
    g_logits, g_counts = g
    g_w0, g_w0r, g_w1, g_w1r, g_wout, g_b = _fused2_bwd_call(
        traces, lat, w0, w0r, beta0, w1, w1r, beta1, w_out, b_out,
        g_logits, tstar, T=n_steps, use_periods=use_periods, alif=alif,
        alpha=alpha, rho=rho, threshold=threshold, gamma=gamma,
        spike_func=spike_func,
        store_delta=alif and _use_delta_residual(spike_func),
        kappa=kappa, interpret=interpret, g_counts=g_counts,
    )
    g_lat = np.zeros(lat_shape, dtype=jax.dtypes.float0)
    return (g_lat, g_w0, g_w0r, jnp.zeros_like(jnp.asarray(beta0)),
            g_w1, g_w1r, jnp.zeros_like(jnp.asarray(beta1)),
            g_wout, g_b.astype(jnp.asarray(b_out).dtype))


fused2_rec_head_counts.defvjp(_rec2c_fwd, _rec2c_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=FF2_STATICS)
def fused2_ff_head_counts(
    latencies, w0, beta0, w1, beta1, w_out, b_out,
    n_steps: int, use_periods: bool, alif: bool, alpha: float, rho: float,
    threshold: float, gamma: float, kappa: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
):
    """Feedforward variant of :func:`fused2_rec_head_counts`."""
    _, _, logits, _, counts = _fused2_fwd_call(
        latencies, w0, None, beta0, w1, None, beta1, w_out, b_out,
        T=n_steps, use_periods=use_periods, alif=alif, alpha=alpha,
        rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        kappa=kappa, interpret=interpret, store_traces=False,
        store_counts=True,
    )
    return logits, counts


def _ff2c_fwd(latencies, w0, beta0, w1, beta1, w_out, b_out, n_steps,
              use_periods, alif, alpha, rho, threshold, gamma, kappa,
              spike_func, interpret):
    traces, lat, logits, tstar, counts = _fused2_fwd_call(
        latencies, w0, None, beta0, w1, None, beta1, w_out, b_out,
        T=n_steps, use_periods=use_periods, alif=alif, alpha=alpha,
        rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        kappa=kappa, interpret=interpret, store_counts=True,
    )
    return (logits, counts), (traces, lat, latencies.shape, w0, beta0,
                              w1, beta1, w_out, b_out, tstar)


def _ff2c_bwd(n_steps, use_periods, alif, alpha, rho, threshold, gamma,
              kappa, spike_func, interpret, res, g):
    (traces, lat, lat_shape, w0, beta0, w1, beta1, w_out, b_out,
     tstar) = res
    g_logits, g_counts = g
    g_w0, _, g_w1, _, g_wout, g_b = _fused2_bwd_call(
        traces, lat, w0, None, beta0, w1, None, beta1, w_out, b_out,
        g_logits, tstar, T=n_steps, use_periods=use_periods, alif=alif,
        alpha=alpha, rho=rho, threshold=threshold, gamma=gamma,
        spike_func=spike_func,
        store_delta=alif and _use_delta_residual(spike_func),
        kappa=kappa, interpret=interpret, g_counts=g_counts,
    )
    g_lat = np.zeros(lat_shape, dtype=jax.dtypes.float0)
    return (g_lat, g_w0, jnp.zeros_like(jnp.asarray(beta0)),
            g_w1, jnp.zeros_like(jnp.asarray(beta1)),
            g_wout, g_b.astype(jnp.asarray(b_out).dtype))


fused2_ff_head_counts.defvjp(_ff2c_fwd, _ff2c_bwd)
