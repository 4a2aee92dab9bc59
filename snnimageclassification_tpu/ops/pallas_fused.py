"""Pallas TPU kernel: spike encoding + input matmul + LIF/ALIF time scan
fused into ONE kernel.

The previous fast path (ops/pallas_encode.py + ops/pallas_rec.py) runs
two kernels with a (T, B, H) float32 "input currents" tensor between
them in HBM: the encode kernel writes it (~420 MB/step at the flagship
shape) and the recurrent kernel reads it back; the backward pays the
same round-trip for the currents cotangent.  This kernel eliminates the
intermediate entirely:

* forward: per (batch-tile, K-step time block) grid invocation, the
  spike rows are generated in VMEM from the integer latency tile (which
  is *revolving-window resident* per batch tile -- read once, not per
  time block), multiplied onto the MXU against a VMEM-resident W_in, the
  optional recurrent matmul and the membrane dynamics run in the same
  loop, and only the z (+ delta | v,a) traces reach HBM;
* backward: regenerates the spike rows (they cost VPU, not HBM),
  accumulates g_W_in per batch tile in VMEM, and never materializes the
  currents cotangent.

Encoding semantics are identical to ops/encoding.py (reference
datasets.py:42-86 incl. the period clamp); dynamics identical to
ops/cells.py (spiking_layers.py:156-171, 229-243); the backward carries
the same structure as ops/pallas_rec.py (quirks Q3's dead threshold
cotangent included).  Latencies are integers -- no pixel gradient, like
the reference's int cast (datasets.py:54).

Trace storage follows W_in's dtype (bf16 under SNNConfig.matmul_dtype):
spikes are 0/1 and bitwise exact; delta/v/a only feed the surrogate
backward.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    "fused_encode_rec_scan",
    "fused_encode_ff_scan",
    "fused_encode_rec_scan_head",
    "fused_encode_ff_scan_head",
    "fused_encode_rec_scan_head_counts",
    "fused_encode_ff_scan_head_counts",
    "fused_supported",
    "fused_head_supported",
]

_LANE = 128
_SUBLANE = 8
_MAX_BLOCK_B = 512
# Batch-half interleave factor for the serial dynamics chains (see
# _fused_fwd_kernel).  Numerics are bitwise identical at any value; >1
# lets Mosaic overlap one row-group's VPU dynamics with another's MXU
# recurrent matmul.  Env-overridable for A/B benchmarking.
_ILV = int(os.environ.get("SNN_TPU_ILV", "1"))
# EXPERIMENT flag (benchmarking only, NOT numerics-preserving): keep the
# forward membrane state (v/a/z scratch) and the backward dcur chain in
# bfloat16 instead of float32.  Probes whether halving the VPU vector
# width on the serial dynamics chain moves the latency-bound kernels;
# spikes stay exact (0/1) but v/a quantize, so logits shift -- never
# enable outside an A/B measurement.  Default off = bitwise unchanged.
_BF16_STATE = os.environ.get("SNN_TPU_BF16_STATE", "0") == "1"


def _ilv_for(bb: int) -> int:
    return _ILV if _ILV > 1 and bb % (_SUBLANE * _ILV) == 0 else 1


# Budget for the VMEM-resident weight blocks (W_in + W_rec + W_out) plus
# double-buffered latency tiles (separate from the revolving trace-block
# budget, _fit_block_b).  Calibrated so the flagship f32 shape keeps its
# optimal 512-row tile (4.26 MB fully accounted, proven on-chip) and the
# natively-validated H=512 recurrent shape stays admitted at bb=256
# (4.9 MB, scripts/wide_hidden_check.py), while H=1024 recurrent (8.2 MB
# of weights alone) gates off to XLA instead of failing Mosaic compile.
_WLAT_BUDGET = 5 * 1024 * 1024


def _weight_bytes(f_pad: int, h_pad: int, recurrent: bool, o_pad: int,
                  itemsize: int = 4) -> int:
    w = f_pad * h_pad * itemsize
    if recurrent:
        w += h_pad * h_pad * itemsize
    if o_pad:
        w += h_pad * o_pad * itemsize
    return w


def _wlat_fit_bb(bb: int, f_pad: int, w_bytes: int) -> int:
    """Shrink the batch tile until the resident weights + 2 latency tiles
    fit their budget -- wide hidden layers (h_pad > 128) trade tile size
    for fusion instead of falling back to XLA."""
    while bb > _SUBLANE and w_bytes + 2 * bb * f_pad * 4 > _WLAT_BUDGET:
        bb = (bb // 2) // _SUBLANE * _SUBLANE
    return max(_SUBLANE, bb)


def _wlat_ok(w_bytes, bb, f_pad, F, hidden, recurrent, n_out,
             itemsize) -> bool:
    """Weights + double-buffered latency tiles fit their budget -- OR the
    shape is in the f32 WIDE regime, where _wide_max_k's raised-limit
    accounting (weights + grad accumulators + latency + trace blocks vs
    _WIDE_F32_BUDGET) subsumes this check at the pinned _WIDE_F32_BB
    tile."""
    if w_bytes + 2 * bb * f_pad * 4 <= _WLAT_BUDGET:
        return True
    h_pad = -(-hidden // _LANE) * _LANE
    o_pad = -(-n_out // _LANE) * _LANE if n_out else 0
    fixed = _weight_bytes(f_pad, h_pad, recurrent, o_pad,
                          itemsize=itemsize) + _weight_bytes(
        f_pad, h_pad, recurrent, o_pad, itemsize=4)
    return fixed > _WIDE_VMEM_BUDGET  # _wide_max_k owns the admission


# Total scoped-VMEM budget for the WIDE-shape time-block shrink
# (_wide_max_k).  v5e scoped VMEM is 16 MB; leave ~1.5 MB for kernel
# scratch (state rows, readout tiles) and compiler temporaries.
# Calibration point: H=1024 recurrent bf16 head measured 16.76 MB scoped
# (OOM by 777 KB) at K=10 -- the f32 gradient accumulators the backward
# keeps resident (8.4 MB) plus the bf16 weight blocks (4.2 MB) leave
# room for only a few revolving trace blocks.
_WIDE_VMEM_BUDGET = int(14.5 * 1024 * 1024)
# Shapes whose weights + f32 grad accumulators stay under this use the
# default K=16 time block -- every round-3-validated shape lands here,
# so their compiled programs are bitwise unchanged.
_WIDE_FIXED_THRESHOLD = 8 * 1024 * 1024
# f32 WIDE regime (round 5): shapes whose fixed footprint alone exceeds
# _WIDE_VMEM_BUDGET (f32 H=1024 recurrent: 7.9 MB of weights + 7.9 MB of
# f32 grad accumulators = 15.7 MB) budget against the raised 32 MB
# per-kernel scoped-VMEM limit (_wide_compiler_params) instead of losing
# fusion entirely -- 2 MB headroom for scratch/compiler temporaries.
# The round-4-validated bf16-wide regime (fixed in (8, 14.5] MB) keeps
# its budget and therefore its exact compiled programs.
_WIDE_F32_BUDGET = 30 * 1024 * 1024
# Batch tile for the f32 WIDE regime.  The first round-5 admission let
# _wlat_fit_bb collapse the tile to the sublane floor (weights alone
# exceed its 5 MB budget at any bb), which measured 0.35x of XLA -- the
# serial chain is latency-bound, so an 8-row tile starves every link.
# Pin the tile at the bf16-wide-measured 64 rows instead and shrink K
# against _WIDE_F32_BUDGET (H=1024 rec head: fixed 16 MB + K=2 trace
# blocks 8.4 MB + latency 0.45 MB = 24.9 MB under the raised 32 MB
# per-kernel limit).
_WIDE_F32_BB = 64


def _wide_compiler_params(F, hidden, recurrent, head, n_out, itemsize):
    """Raised scoped-VMEM limit for WIDE shapes, else None.

    Mosaic's default scoped-VMEM budget is 16 MB -- a compiler split of
    the chip's much larger physical VMEM, not a hardware ceiling.  Wide
    shapes legitimately need more: the backward keeps the weight blocks
    plus their f32 gradient accumulators resident (H=1024 recurrent bf16
    measured 16.03 MB scoped even after the K-shrink).  Raising the
    per-kernel limit keeps the revolving-window design unchanged and
    costs nothing for the (unchanged) non-wide shapes."""
    f_pad = -(-F // _LANE) * _LANE
    h_pad = -(-hidden // _LANE) * _LANE
    o_pad = -(-n_out // _LANE) * _LANE if n_out else 0
    fixed = _weight_bytes(f_pad, h_pad, recurrent, o_pad,
                          itemsize=itemsize) + _weight_bytes(
        f_pad, h_pad, recurrent, o_pad, itemsize=4)
    if fixed <= _WIDE_FIXED_THRESHOLD:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


def _wide_max_k(F, hidden, recurrent, head, n_out, itemsize) -> int:
    """Largest time-block size K whose revolving trace blocks fit VMEM
    beside this shape's resident weights AND their f32 gradient
    accumulators (the backward's fixed footprint).  Returns the default
    16 for every non-wide shape; 0 means the shape cannot fuse at all."""
    f_pad = -(-F // _LANE) * _LANE
    h_pad = -(-hidden // _LANE) * _LANE
    o_pad = -(-n_out // _LANE) * _LANE if n_out else 0
    w_b = _weight_bytes(f_pad, h_pad, recurrent, o_pad, itemsize=itemsize)
    g_b = _weight_bytes(f_pad, h_pad, recurrent, o_pad, itemsize=4)
    fixed = w_b + g_b
    if fixed <= _WIDE_FIXED_THRESHOLD:
        return 16
    budget = (
        _WIDE_VMEM_BUDGET if fixed <= _WIDE_VMEM_BUDGET else _WIDE_F32_BUDGET
    )
    # bf16-wide reaches the 16-row floor tile (round-4 calibration);
    # f32-wide pins the tile at _WIDE_F32_BB (see the constant) so K is
    # accounted against the tile the kernel actually runs.
    bb = (16 if itemsize == 2 else _SUBLANE) \
        if fixed <= _WIDE_VMEM_BUDGET else _WIDE_F32_BB
    lat = 2 * bb * f_pad * 4
    n_blocks = _N_BLOCKS + (2 if head else 0)
    per_k = 2 * n_blocks * bb * h_pad * itemsize  # traces follow W dtype
    return max(0, min(16, (budget - fixed - lat) // per_k))


def fused_supported(
    n_steps: int, n_features: int, hidden: int, recurrent: bool = True,
    itemsize: int = 4,
) -> bool:
    """The weight blocks plus one (shrinkable) latency tile must fit
    VMEM.  ``recurrent`` defaults True (the conservative direction: a
    feedforward caller passing the default only over-budgets).

    ``itemsize``: bytes per weight element.  The kernels run bf16
    weights natively (SNNConfig.matmul_dtype) and _shapes already sizes
    the resident blocks by W's real itemsize -- passing 2 here admits
    shapes the f32 budget rejects, e.g. H=1024 recurrent (8.2 MB of f32
    weights vs 4.1 MB bf16), making wide hidden layers fusible under the
    bf16 matmul recipe instead of silently falling back to XLA.  f32
    WIDE shapes whose weights alone exceed the default budget are
    admitted through the raised-limit accounting (_WIDE_F32_BUDGET),
    which covers weights + latency + trace blocks in one sum."""
    f_pad = -(-n_features // _LANE) * _LANE
    h_pad = -(-hidden // _LANE) * _LANE
    w_bytes = _weight_bytes(f_pad, h_pad, recurrent, 0, itemsize=itemsize)
    bb = _wlat_fit_bb(_MAX_BLOCK_B, f_pad, w_bytes)
    return (
        jax.default_backend() == "tpu"
        and n_steps >= 1
        and _wlat_ok(w_bytes, bb, f_pad, n_features, hidden, recurrent, 0,
                     itemsize)
        and _wide_max_k(n_features, hidden, recurrent, False, 0,
                        itemsize) >= 1
    )


def fused_head_supported(
    n_steps: int, n_features: int, hidden: int, n_out: int,
    recurrent: bool = True, itemsize: int = 4,
) -> bool:
    """Head variant additionally keeps W_out and (bb, o_pad) readout
    state resident; cheap for classification-sized outputs.
    ``itemsize``: see :func:`fused_supported`."""
    f_pad = -(-n_features // _LANE) * _LANE
    h_pad = -(-hidden // _LANE) * _LANE
    o_pad = -(-n_out // _LANE) * _LANE
    w_bytes = _weight_bytes(f_pad, h_pad, recurrent, o_pad,
                            itemsize=itemsize)
    bb = _wlat_fit_bb(_MAX_BLOCK_B, f_pad, w_bytes)
    return (
        jax.default_backend() == "tpu"
        and n_steps >= 1
        and o_pad <= 512
        and _wlat_ok(w_bytes, bb, f_pad, n_features, hidden, recurrent,
                     n_out, itemsize)
        and _wide_max_k(n_features, hidden, recurrent, True, n_out,
                        itemsize) >= 1
    )


def _spike_row(lat, step, n_steps: int, use_periods: bool):
    """(bb, F_pad) bool spike row for scalar time ``step``.

    TTFS: one spike at t == latency (datasets.py:81-86).  Periodic:
    period clamped to [1, n_steps-1], spike where (t - p) % p == 0 and
    t >= p (datasets.py:72-79); the remainder runs in float32 -- exact
    for delta < n_steps <= 2^12 (see ops/pallas_encode.py).
    """
    if use_periods:
        p = jnp.clip(lat, 1, n_steps - 1)
        delta = step - p
        d_f = delta.astype(jnp.float32)
        p_f = p.astype(jnp.float32)
        q = jnp.floor(d_f / p_f)
        return (delta >= 0) & (d_f == q * p_f)
    return lat == step


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------
def _fused_fwd_kernel(refs, *, K, n_steps, use_periods, alif, has_w,
                      alpha, rho, threshold, store_delta, head=False,
                      kappa=0.0, ilv=1, t_axis=1, store_traces=True,
                      store_counts=False):
    if has_w:
        lat_ref, w_in_ref, w_rec_ref, beta_ref, *rest = refs
    else:
        lat_ref, w_in_ref, beta_ref, *rest = refs
        w_rec_ref = None
    cnt_ref = None
    if head:
        w_out_ref, b_out_ref, *rest = rest
        # The head writes NO z trace (no next layer consumes it; the
        # backward recomputes z = (delta >= 0), sign-exact even in bf16 —
        # caveat: an f32 delta in (-9e-41, 0) rounds to bf16 -0.0 whose
        # >= 0 is True, but membrane deltas are O(0.1), 38 orders of
        # magnitude above that denormal range, so unreachable in practice)
        # and stores the delta residual for every cell/surrogate combo
        # (+ the adaptation trace for Phi's dynamic-threshold scale).
        # Inference (store_traces=False, the custom_vjp PRIMAL): no trace
        # output leaves the kernel at all -- arithmetic is unchanged, so
        # logits are bitwise identical, but the (T, B, H) residual HBM
        # write disappears from the serving path.
        n_trace = 0 if not store_traces else (1 if (store_delta or not alif) else 2)
        out_refs = rest[:n_trace]
        rest = rest[n_trace:]
        logits_ref, tstar_ref, *rest = rest
        if store_counts:
            # Per-sample per-neuron spike counts (sum_t z): the fused-path
            # carrier for the reference's sketched spike regularizers
            # (snn.py:401-408) -- z is already in VMEM, so emitting the
            # (B, H) count costs one add per step, no extra HBM traffic
            # beyond the count tile itself.
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
        # Non-head inference still stores z (the next layer consumes it)
        # but skips the backward-only residuals (v / delta / a).
        n_trace = 1 if not store_traces else (2 if (store_delta or not alif) else 3)
        out_refs = rest[:n_trace]
        rest = rest[n_trace:]
        v_scr, a_scr, z_scr = rest
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
    t = pl.program_id(t_axis)

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

    lat = lat_ref[:]
    w_in = w_in_ref[:]
    w_rec = w_rec_ref[:] if has_w else None
    if head:
        w_out = w_out_ref[:]
        b_out = b_out_ref[:]
    trace_dtype = out_refs[0].dtype if out_refs else jnp.float32
    v_c, a_c, z_prev = v_scr[:], a_scr[:], z_scr[:]
    # Input currents are state-independent, so the K spike-gen + W_in
    # matmuls run OFF the serial chain (back-to-back, MXU pipelined)
    # before the dynamics loop -- the chain keeps only the recurrent
    # matmul + VPU updates, one dependent matmul latency per step
    # instead of two.
    curs = [
        jnp.dot(
            _spike_row(lat, t * K + k, n_steps, use_periods).astype(w_in.dtype),
            w_in, preferred_element_type=jnp.float32,
        )
        for k in range(K)
    ]
    if v_scr.dtype == jnp.bfloat16:
        # _BF16_STATE experiment: run the serial VPU dynamics in bf16
        # (state carries come from the bf16 scratch; casting the currents
        # keeps the whole chain bf16).  Measurement-only -- see the flag.
        curs = [c.astype(jnp.bfloat16) for c in curs]
    zs = []
    if ilv > 1:
        # Batch-half interleaving: split the tile into ``ilv`` independent
        # row groups and interleave their serial chains at each step, so
        # one group's VPU dynamics can overlap another group's MXU
        # recurrent matmul (batch rows are independent -- the arithmetic
        # per row is identical, so numerics are bitwise unchanged).
        hb = v_c.shape[0] // ilv
        sls = [slice(i * hb, (i + 1) * hb) for i in range(ilv)]
        vh = [v_c[s] for s in sls]
        ah = [a_c[s] for s in sls]
        zh = [z_prev[s] for s in sls]
        for k in range(K):
            for i, s in enumerate(sls):
                cur = curs[k][s]
                if has_w:
                    cur = cur + jnp.dot(zh[i].astype(w_rec.dtype), w_rec,
                                        preferred_element_type=jnp.float32)
                vh[i] = (alpha * vh[i] + cur) * (1.0 - zh[i])
                if alif:
                    ah[i] = rho * ah[i] + zh[i]
                    dyn_threshold = threshold + beta_ref[0, 0] * ah[i]
                else:
                    dyn_threshold = threshold
                delta = vh[i] - dyn_threshold
                zh[i] = (delta >= 0).astype(vh[i].dtype)
                if head:
                    if d_ref is not None:
                        d_ref[k, s] = delta.astype(trace_dtype)
                    if a_ref is not None:
                        a_ref[k, s] = ah[i].astype(trace_dtype)
                else:
                    z_ref[k, s] = zh[i].astype(trace_dtype)
                    if d_ref is not None:
                        d_ref[k, s] = delta.astype(trace_dtype)
                    elif v_ref is not None:
                        v_ref[k, s] = vh[i].astype(trace_dtype)
                        if alif:
                            a_ref[k, s] = ah[i].astype(trace_dtype)
            if head:
                zs.append(jnp.concatenate(zh, axis=0))
        v_c = jnp.concatenate(vh, axis=0)
        a_c = jnp.concatenate(ah, axis=0)
        z_prev = jnp.concatenate(zh, axis=0)
    else:
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
    v_scr[:] = v_c.astype(v_scr.dtype)
    a_scr[:] = a_c.astype(a_scr.dtype)
    z_scr[:] = z_prev.astype(z_scr.dtype)
    if cnt_ref is not None:
        # f32 accumulation: counts reach T (<= a few hundred) exactly.
        acc = zs[0].astype(jnp.float32)
        for zr in zs[1:]:
            acc = acc + zr.astype(jnp.float32)
        cnt_ref[:] += acc
    if head:
        # Readout leaky integrator + running first-argmax max-over-time
        # (spiking_layers.py:402-408; snn.py:228 with torch.max tie
        # semantics: strict > keeps the earliest maximal step).  The
        # readout consumes z at the SAME step (layer-then-time ordering,
        # snn.py:209-214), and z for the whole block is known once the
        # dynamics loop finishes -- so the K readout matmuls batch into
        # ONE MXU call OFF the serial chain; only the cheap kappa/max
        # updates stay sequential.
        bb_, h_ = zs[0].shape
        z_blk = jnp.stack(zs).reshape(K * bb_, h_)
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

        @pl.when(t == pl.num_programs(t_axis) - 1)
        def _():
            logits_ref[:] = m_run
            tstar_ref[:] = ts_run


def _pad_lat(lat, bb, f_pad):
    B, F = lat.shape
    pb = (-B) % bb
    pf = f_pad - F
    if pb or pf:
        # Huge latency never fires in TTFS; in periodic mode a padded
        # feature column meets a zero W_in row, and padded batch rows are
        # sliced off the outputs.
        lat = jnp.pad(lat, ((0, pb), (0, pf)), constant_values=10**9)
    return lat


def _pad2(w, r_pad, c_pad):
    r, c = w.shape[-2], w.shape[-1]
    if r_pad != r or c_pad != c:
        pad = [(0, 0)] * (w.ndim - 2) + [(0, r_pad - r), (0, c_pad - c)]
        w = jnp.pad(w, pad)
    return w


# --- stacked-replica (ensemble) grid lifting -------------------------------
# The head kernels also run with a replica grid axis: grid
# (tiles, S, time blocks) -- batch tiles OUTERMOST, replicas in the
# middle, time innermost.  Per-replica weights/traces/grads are selected
# by a size-None leading block dim (the kernel refs keep their 2-D/3-D
# shapes, so the kernel bodies are byte-for-byte the single-model ones
# with t_axis=2).  Shared operands (the latency tile -- every replica
# sees the same batch) keep their blocks and ignore the replica index;
# putting the replica axis INSIDE the tile axis is what lets the shared
# tile keep its block index across replicas (DMA'd once per tile).  This
# is how the multi-seed EnsembleTrainer can run all replicas as ONE
# kernel pair per direction instead of S unrolled pallas_calls.


def _stack_spec(spec):
    # Grid order is (tiles, S, time): the replica axis sits INSIDE the
    # batch-tile axis so the (bb, f_pad) latency tile keeps its block
    # index across all S replicas and is DMA'd once per tile, not once
    # per (replica, tile).
    im = spec.index_map
    return spec.replace(
        block_shape=(None, *spec.block_shape),
        index_map=lambda b, s, t: (s, *im(b, t)),
    )


def _share_spec(spec):
    im = spec.index_map
    return spec.replace(index_map=lambda b, s, t: im(b, t))


# VMEM accounting uses the same (conservative) revolving-block count for
# forward and backward so both directions pick the SAME batch tile -- the
# backward reuses the forward's padded latency array.
_N_BLOCKS = 6


def _shapes(B, w_in, F, K, head=False, recurrent=True, n_out=0):
    H = w_in.shape[-1]
    f_pad = -(-F // _LANE) * _LANE
    h_pad = -(-H // _LANE) * _LANE
    o_pad = -(-n_out // _LANE) * _LANE if n_out else 0
    bb = min(_MAX_BLOCK_B, -(-B // _SUBLANE) * _SUBLANE)
    # The head keeps an extra (K, bb, o_pad) s-block plus (bb, o_pad)
    # readout state resident; budget it like two more revolving blocks.
    bb = _fit_block_b(bb, K, h_pad, _N_BLOCKS + (2 if head else 0))
    # Wide layers: shrink the tile, don't gate off fusion.  Weight bytes
    # use the real itemsize (bf16 W halves the resident cost).
    w_bytes = _weight_bytes(f_pad, h_pad, recurrent, o_pad,
                            itemsize=jnp.dtype(w_in.dtype).itemsize)
    fixed = w_bytes + _weight_bytes(f_pad, h_pad, recurrent, o_pad,
                                    itemsize=4)
    if fixed > _WIDE_VMEM_BUDGET:
        # f32 WIDE regime: weights alone exceed _WLAT_BUDGET, so
        # _wlat_fit_bb would collapse the tile to the sublane floor and
        # starve the latency-bound serial chain (measured 0.35x of XLA
        # at bb=8).  _wide_max_k already shrank K against
        # _WIDE_F32_BUDGET assuming this tile; the raised 32 MB
        # per-kernel limit (_wide_compiler_params) holds the total.
        bb = min(bb, _WIDE_F32_BB)
    else:
        bb = _wlat_fit_bb(bb, f_pad, w_bytes)
    if w_in.dtype == jnp.bfloat16:
        # Sublane tiling for bf16 needs 16-row multiples; round DOWN so
        # the budget just enforced still holds (16 is the hard floor).
        bb = max(16, bb // 16 * 16)
    return H, f_pad, h_pad, bb


def _fused_fwd_call(latencies, w_in, w_rec, beta, *, T, use_periods, alif,
                    alpha, rho, threshold, store_delta, interpret,
                    lat_prepadded=None, w_out=None, b_out=None, kappa=0.0,
                    store_traces=True, store_counts=False):
    has_w = w_rec is not None
    head = w_out is not None
    stacked = w_in.ndim == 3  # leading replica axis (see _stack_spec)
    S = w_in.shape[0] if stacked else None
    K = _time_block(T, _wide_max_k(
        w_in.shape[-2], w_in.shape[-1], has_w, head,
        w_out.shape[-1] if head else 0, jnp.dtype(w_in.dtype).itemsize,
    ))
    cparams = _wide_compiler_params(
        w_in.shape[-2], w_in.shape[-1], has_w, head,
        w_out.shape[-1] if head else 0, jnp.dtype(w_in.dtype).itemsize,
    )
    # store_traces=False is the inference mode (custom_vjp primal): only
    # what downstream consumers need leaves the kernel -- logits for the
    # head, the z spike trace otherwise.  Same arithmetic, no residual
    # HBM writes.
    if head:  # delta (+ a for Phi) only -- no z trace leaves the kernel
        n_trace = 0 if not store_traces else (
            1 if (store_delta or not alif) else 2
        )
    else:
        n_trace = 1 if not store_traces else (
            2 if (store_delta or not alif) else 3
        )
    B, F = latencies.shape
    H, f_pad, h_pad, bb = _shapes(B, w_in, F, K, head, recurrent=has_w,
        n_out=w_out.shape[-1] if head else 0)
    lat = (
        lat_prepadded
        if lat_prepadded is not None
        else _pad_lat(latencies.astype(jnp.int32), bb, f_pad)
    )
    w_in_p = _pad2(w_in, f_pad, h_pad)
    Bp = lat.shape[0]
    grid = (Bp // bb, T // K)
    lat_spec = pl.BlockSpec((bb, f_pad), lambda b, t: (b, 0),
                            memory_space=pltpu.VMEM)
    w_in_spec = pl.BlockSpec((f_pad, h_pad), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    w_rec_spec = pl.BlockSpec((h_pad, h_pad), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    beta_spec = pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.SMEM)
    tr_spec = pl.BlockSpec((K, bb, h_pad), lambda b, t: (t, b, 0),
                           memory_space=pltpu.VMEM)
    trace_dtype = w_in.dtype if jnp.issubdtype(w_in.dtype, jnp.floating) else jnp.float32
    if stacked:
        beta_s = jnp.broadcast_to(
            jnp.asarray(beta, jnp.float32).reshape(-1, 1, 1), (S, 1, 1)
        )
    else:
        beta_s = jnp.asarray(beta, jnp.float32).reshape(1, 1)

    kernel = functools.partial(
        _fused_fwd_kernel, K=K, n_steps=T, use_periods=use_periods,
        alif=alif, has_w=has_w, alpha=alpha, rho=rho, threshold=threshold,
        store_delta=store_delta, head=head, kappa=kappa, ilv=_ilv_for(bb),
        t_axis=2 if stacked else 1, store_traces=store_traces,
        store_counts=store_counts,
    )
    in_specs = [lat_spec, w_in_spec] + ([w_rec_spec] if has_w else []) + [beta_spec]
    args = [lat, w_in_p] + ([_pad2(w_rec, h_pad, h_pad)] if has_w else []) + [beta_s]
    out_specs = [tr_spec] * n_trace
    out_shape = [jax.ShapeDtypeStruct((T, Bp, h_pad), trace_dtype)] * n_trace
    state_dtype = jnp.bfloat16 if _BF16_STATE else jnp.float32
    scratch = [pltpu.VMEM((bb, h_pad), state_dtype)] * 3
    if head:
        o_pad = -(-w_out.shape[-1] // _LANE) * _LANE
        w_out_spec = pl.BlockSpec((h_pad, o_pad), lambda b, t: (0, 0),
                                  memory_space=pltpu.VMEM)
        b_out_spec = pl.BlockSpec((1, o_pad), lambda b, t: (0, 0),
                                  memory_space=pltpu.VMEM)
        head_spec = pl.BlockSpec((bb, o_pad), lambda b, t: (b, 0),
                                 memory_space=pltpu.VMEM)
        in_specs += [w_out_spec, b_out_spec]
        b_out_2d = jnp.asarray(b_out, jnp.float32).reshape(
            (S, 1, -1) if stacked else (1, -1)
        )
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
    if stacked:
        # Grid (tiles, S, time): replica axis INSIDE the tile axis (see
        # the _stack_spec comment); per-replica operands/outputs pick
        # their slab via a size-None leading block dim; the shared
        # latency tile ignores the replica index.
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
    traces = tuple(o[..., :B, :H] for o in outs[:n_trace])
    if head:
        O = w_out.shape[-1]
        logits = outs[n_trace][..., :B, :O]
        tstar = outs[n_trace + 1][..., :B, :O]
        if store_counts:
            counts = outs[n_trace + 2][..., :B, :H]
            return traces, lat, logits, tstar, counts
        return traces, lat, logits, tstar
    return traces, lat


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------
def _fused_bwd_kernel(refs, *, K, n_steps, use_periods, alif, has_w,
                      alpha, rho, threshold, gamma, spike_func,
                      store_delta, head=False, kappa=0.0, ilv=1, t_axis=1,
                      has_gcnt=False):
    n_res = 1 if (store_delta or not alif) else 2
    i = 0
    gcnt_ref = None
    if head:
        g_ref = refs[i]; i += 1
        ts_ref = refs[i]; i += 1
        if has_gcnt:
            # Cotangent of the per-sample spike-count output: counts =
            # sum_t z_t, so d(counts)/dz_t == I and the (bb, h) count
            # cotangent adds to dz at EVERY step of the block.
            gcnt_ref = refs[i]; i += 1
        gz_ref = None
    else:
        gz_ref = refs[i]; i += 1
    res_refs = refs[i:i + n_res]; i += n_res
    if head:
        # Boundary row of the DELTA residual: z is never stored by the
        # head forward; z_{t-1} is recomputed as (delta_{t-1} >= 0),
        # which is sign-exact even with bf16 trace storage.  (Caveat: an
        # f32 delta in the denormal range (-9e-41, 0) rounds to bf16 -0.0
        # and -0.0 >= 0 flips the recomputed spike; unreachable for real
        # membrane dynamics, where |delta| is O(0.1).)
        resb_ref = refs[i]; i += 1
        z_ref = zb_ref = None
    else:
        z_ref = refs[i]; i += 1
        zb_ref = refs[i]; i += 1
    lat_ref = refs[i]; i += 1
    w_in_ref = refs[i]; i += 1
    w_rec_ref = refs[i] if has_w else None
    i += 1 if has_w else 0
    beta_ref = refs[i]; i += 1
    w_out_ref = refs[i] if head else None
    i += 1 if head else 0
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
    t = pl.program_id(t_axis)

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

    is_first_block = t == pl.num_programs(t_axis) - 1
    fwd_blk = pl.num_programs(t_axis) - 1 - t  # forward block this grid step
    w_in = w_in_ref[:]
    w_rec = w_rec_ref[:] if has_w else None
    lat = lat_ref[:]
    f32 = jnp.float32
    dcur_carry = dcur_scr[:]

    if head:
        g = g_ref[:].astype(f32)
        ts = ts_ref[:]
        w_out = w_out_ref[:]
        # Readout cotangent chain, reverse time:
        #   s(t) = kappa * s(t+1) + g_logits * [t == argmax step]
        # (max-over-time routes the whole cotangent to the first maximal
        # step, torch.max semantics; v_r(t) has unit gain in cur_r(t), so
        # dcur_r(t) = s(t)).  The chain is independent of the membrane
        # dynamics, so the whole block's s values -- and the K dz matmuls
        # as ONE batched MXU call -- are computed OFF the serial chain.
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
        if ilv > 1:
            # Batch-half interleaving (see _fused_fwd_kernel): independent
            # row groups' serial chains interleave so one group's VPU work
            # overlaps another's recurrent matmul.  Bitwise identical.
            hb = dcur_carry.shape[0] // ilv
            sls = [slice(i * hb, (i + 1) * hb) for i in range(ilv)]
            dch = [dcur_carry[s] for s in sls]
            zb_h = [zb_row[s] for s in sls]  # always (bb, h) via jnp.where
            for k in reversed(range(K)):
                for i, s in enumerate(sls):
                    dz = dz_all[k][s]
                    if has_w:
                        dz = dz + jax.lax.dot_general(
                            dch[i].astype(w_rec.dtype), w_rec,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=f32,
                        )
                    dv = dz * surr_all[k][s] + alpha * dch[i]
                    z_prev_k = z_res[k - 1][s] if k > 0 else zb_h[i]
                    dcur = dv * (1.0 - z_prev_k)
                    dcur_blk[k, s] = dcur
                    dch[i] = dcur
            dcur_carry = jnp.concatenate(dch, axis=0)
        else:
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
        # Readout weight/bias partials, off the serial chain:
        # g_W_out += sum_t z(t)^T s(t); g_b += sum_{t,batch} s(t).
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
                    preferred_element_type=jnp.float32,
                )
            dv = dz * surr + alpha * dcur_carry
            dcur = dv * (1.0 - _zprev_k(z_ref, zb_ref, k, is_first_block))
            dcur_blk[k] = dcur
            dcur_carry = dcur
        dcur_scr[:] = dcur_carry

    # g_W_in partials: sum_t spikes(t)^T @ dcur_t, spike rows regenerated
    # in VMEM (VPU work, no HBM).  Off the serial chain.  The grid walks
    # time blocks in reverse (the block specs map grid step t to forward
    # block nb-1-t), so the regenerated spike rows must use the *forward*
    # step index of the dcur rows they pair with.
    for k in range(K):
        step = fwd_blk * K + k
        spk = _spike_row(lat, step, n_steps, use_periods)
        dwin_ref[0] += jax.lax.dot_general(
            spk.astype(w_in.dtype), dcur_blk[k].astype(w_in.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if has_w:
        K_, bb_, H_ = dcur_blk.shape
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
                preferred_element_type=jnp.float32,
            )
        zb0 = zb_row if head else _zprev_k(z_ref, zb_ref, 0, is_first_block)
        dwr_ref[0] += jax.lax.dot_general(
            zb0.astype(w_rec.dtype), dcur_blk[0].astype(w_rec.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    del rho


def _fused_bwd_call(g_z, residuals, z, lat, w_in, w_rec, beta, *, T,
                    use_periods, alif, alpha, rho, threshold, gamma,
                    spike_func, store_delta, interpret,
                    g_logits=None, tstar=None, w_out=None, kappa=0.0,
                    g_counts=None):
    has_w = w_rec is not None
    head = w_out is not None
    stacked = w_in.ndim == 3  # leading replica axis (see _stack_spec)
    S = w_in.shape[0] if stacked else None
    K = _time_block(T, _wide_max_k(
        w_in.shape[-2], w_in.shape[-1], has_w, head,
        w_out.shape[-1] if head else 0, jnp.dtype(w_in.dtype).itemsize,
    ))
    cparams = _wide_compiler_params(
        w_in.shape[-2], w_in.shape[-1], has_w, head,
        w_out.shape[-1] if head else 0, jnp.dtype(w_in.dtype).itemsize,
    )
    ref3d = residuals[0] if head else z
    B, H = ref3d.shape[-2], ref3d.shape[-1]
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
    zb = pl.BlockSpec(
        (1, bb, h_pad),
        lambda b, t, n=nb, K=K: (jnp.maximum((n - 1 - t) * K - 1, 0), b, 0),
        memory_space=pltpu.VMEM,
    )
    lat_spec = pl.BlockSpec((bb, f_pad), lambda b, t: (b, 0),
                            memory_space=pltpu.VMEM)
    w_in_spec = pl.BlockSpec((f_pad, h_pad), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    w_rec_spec = pl.BlockSpec((h_pad, h_pad), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    beta_spec = pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.SMEM)
    dwin_spec = pl.BlockSpec((1, f_pad, h_pad), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    dwr_spec = pl.BlockSpec((1, h_pad, h_pad), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    if stacked:
        beta_s = jnp.broadcast_to(
            jnp.asarray(beta, jnp.float32).reshape(-1, 1, 1), (S, 1, 1)
        )
    else:
        beta_s = jnp.asarray(beta, jnp.float32).reshape(1, 1)

    kernel = functools.partial(
        _fused_bwd_kernel, K=K, n_steps=T, use_periods=use_periods,
        alif=alif, has_w=has_w, alpha=alpha, rho=rho, threshold=threshold,
        gamma=gamma, spike_func=spike_func, store_delta=store_delta,
        head=head, kappa=kappa, ilv=_ilv_for(bb),
        t_axis=2 if stacked else 1, has_gcnt=g_counts is not None,
    )
    in_specs = (
        [rev] * len(operands) + [zb, lat_spec, w_in_spec]
        + ([w_rec_spec] if has_w else []) + [beta_spec]
    )
    args = (
        operands + [boundary_op, lat, _pad2(w_in, f_pad, h_pad)]
        + ([_pad2(w_rec, h_pad, h_pad)] if has_w else []) + [beta_s]
    )
    out_specs = [dwin_spec] + ([dwr_spec] if has_w else [])
    out_shape = [jax.ShapeDtypeStruct((Bp // bb, f_pad, h_pad), jnp.float32)]
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
        # g_logits/tstar arrive padded to (Bp, o_pad) from the forward;
        # padded rows/cols carry zero cotangent so they contribute nothing.
        pad_bo = [(0, 0)] * (g_logits.ndim - 2) + [
            (0, Bp - g_logits.shape[-2]), (0, o_pad - g_logits.shape[-1])
        ]
        gl = jnp.pad(g_logits.astype(jnp.float32), pad_bo)
        ts_p = jnp.pad(tstar, pad_bo)
        if g_counts is not None:
            gcnt_spec = pl.BlockSpec((bb, h_pad), lambda b, t: (b, 0),
                                     memory_space=pltpu.VMEM)
            # Zero-padded rows/cols contribute zero count cotangent.
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


# ---------------------------------------------------------------------------
# custom_vjp wrappers
# ---------------------------------------------------------------------------
STATICS = (4, 5, 6, 7, 8, 9, 10, 11, 12)


@functools.partial(jax.custom_vjp, nondiff_argnums=STATICS)
def fused_encode_rec_scan(
    latencies: jax.Array,
    w_in: jax.Array,
    w_rec: jax.Array,
    beta,
    n_steps: int,
    use_periods: bool,
    alif: bool,
    alpha: float,
    rho: float,
    threshold: float,
    gamma: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
) -> jax.Array:
    """(latencies (B,F) int32, W_in, masked W_rec) -> spikes (T,B,H).

    Numerically equal (up to f32 tile-summation order) to
    ``encoded_input_matmul`` followed by ``rec_{alif,lif}_scan``.  For
    LIF pass ``alif=False`` (beta is ignored, zero cotangent either way).
    """
    (z,), _ = _fused_fwd_call(
        latencies, w_in, w_rec, beta, T=n_steps, use_periods=use_periods,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, store_traces=False,
    )
    return z


def _fused_rec_fwd(latencies, w_in, w_rec, beta, n_steps, use_periods, alif,
                   alpha, rho, threshold, gamma, spike_func, interpret):
    outs, lat = _fused_fwd_call(
        latencies, w_in, w_rec, beta, T=n_steps, use_periods=use_periods,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret,
    )
    return outs[0], (outs, lat, latencies.shape, w_in, w_rec, beta)


def _fused_rec_bwd(n_steps, use_periods, alif, alpha, rho, threshold, gamma,
                   spike_func, interpret, res, g_z):
    outs, lat, lat_shape, w_in, w_rec, beta = res
    z, *residuals = outs
    g_w_in, g_w_rec = _fused_bwd_call(
        g_z, tuple(residuals), z, lat, w_in, w_rec, beta, T=n_steps,
        use_periods=use_periods, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold, gamma=gamma, spike_func=spike_func,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret,
    )
    g_lat = np.zeros(lat_shape, dtype=jax.dtypes.float0)
    return g_lat, g_w_in, g_w_rec, jnp.zeros_like(jnp.asarray(beta))


fused_encode_rec_scan.defvjp(_fused_rec_fwd, _fused_rec_bwd)


FF_STATICS = (3, 4, 5, 6, 7, 8, 9, 10, 11)


@functools.partial(jax.custom_vjp, nondiff_argnums=FF_STATICS)
def fused_encode_ff_scan(
    latencies: jax.Array,
    w_in: jax.Array,
    beta,
    n_steps: int,
    use_periods: bool,
    alif: bool,
    alpha: float,
    rho: float,
    threshold: float,
    gamma: float,
    spike_func: SpikeFuncType = SpikeFuncType.FastSigmoid,
    interpret: bool = False,
) -> jax.Array:
    """Feedforward variant: no recurrent weights."""
    (z,), _ = _fused_fwd_call(
        latencies, w_in, None, beta, T=n_steps, use_periods=use_periods,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, store_traces=False,
    )
    return z


def _fused_ff_fwd(latencies, w_in, beta, n_steps, use_periods, alif,
                  alpha, rho, threshold, gamma, spike_func, interpret):
    outs, lat = _fused_fwd_call(
        latencies, w_in, None, beta, T=n_steps, use_periods=use_periods,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret,
    )
    return outs[0], (outs, lat, latencies.shape, w_in, beta)


def _fused_ff_bwd(n_steps, use_periods, alif, alpha, rho, threshold, gamma,
                  spike_func, interpret, res, g_z):
    outs, lat, lat_shape, w_in, beta = res
    z, *residuals = outs
    g_w_in, _ = _fused_bwd_call(
        g_z, tuple(residuals), z, lat, w_in, None, beta, T=n_steps,
        use_periods=use_periods, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold, gamma=gamma, spike_func=spike_func,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret,
    )
    g_lat = np.zeros(lat_shape, dtype=jax.dtypes.float0)
    return g_lat, g_w_in, jnp.zeros_like(jnp.asarray(beta))


fused_encode_ff_scan.defvjp(_fused_ff_fwd, _fused_ff_bwd)


# ---------------------------------------------------------------------------
# Head variants: + readout leaky integrator + first-argmax max-over-time
# ---------------------------------------------------------------------------
# For a single-hidden-layer model these fuse the ENTIRE network into one
# kernel pair: pixels' latencies -> spikes -> W_in matmul -> LIF/ALIF scan
# -> W_out readout integrator (spiking_layers.py:402-408) -> max-over-time
# logits (snn.py:228).  Beyond the currents tensor, this also eliminates
# the (T, B, H) spike-trace *cotangent* round trip and the (T, B, O)
# readout trace from HBM: the backward rebuilds dz in VMEM from the
# kappa-decay chain of the logits cotangent.

HEAD_REC_STATICS = tuple(range(6, 16))


@functools.partial(jax.custom_vjp, nondiff_argnums=HEAD_REC_STATICS)
def fused_encode_rec_scan_head(
    latencies: jax.Array,
    w_in: jax.Array,
    w_rec: jax.Array,
    beta,
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
    """(latencies (B,F) int32, weights) -> max-over-time logits (B, O).

    Numerically equal (up to f32 tile-summation order) to the composed
    pipeline ``fused_encode_rec_scan`` -> readout matmul -> kappa scan ->
    ``temporal_max`` -- including torch.max's first-argmax tie routing.
    """
    _, _, logits, _ = _fused_fwd_call(
        latencies, w_in, w_rec, beta, T=n_steps, use_periods=use_periods,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, w_out=w_out, b_out=b_out, kappa=kappa,
        store_traces=False,
    )
    return logits


def _fused_rec_head_fwd(latencies, w_in, w_rec, beta, w_out, b_out, n_steps,
                        use_periods, alif, alpha, rho, threshold, gamma,
                        kappa, spike_func, interpret):
    traces, lat, logits, tstar = _fused_fwd_call(
        latencies, w_in, w_rec, beta, T=n_steps, use_periods=use_periods,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, w_out=w_out, b_out=b_out, kappa=kappa,
    )
    return logits, (traces, lat, latencies.shape, w_in, w_rec, beta, w_out,
                    tstar)


def _fused_rec_head_bwd(n_steps, use_periods, alif, alpha, rho, threshold,
                        gamma, kappa, spike_func, interpret, res, g_logits):
    traces, lat, lat_shape, w_in, w_rec, beta, w_out, tstar = res
    g_w_in, g_w_rec, g_w_out, g_b = _fused_bwd_call(
        None, tuple(traces), None, lat, w_in, w_rec, beta, T=n_steps,
        use_periods=use_periods, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold, gamma=gamma, spike_func=spike_func,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, g_logits=g_logits, tstar=tstar, w_out=w_out,
        kappa=kappa,
    )
    g_lat = np.zeros(lat_shape, dtype=jax.dtypes.float0)
    return (g_lat, g_w_in, g_w_rec, jnp.zeros_like(jnp.asarray(beta)),
            g_w_out, g_b)


fused_encode_rec_scan_head.defvjp(_fused_rec_head_fwd, _fused_rec_head_bwd)


HEAD_FF_STATICS = tuple(range(5, 15))


@functools.partial(jax.custom_vjp, nondiff_argnums=HEAD_FF_STATICS)
def fused_encode_ff_scan_head(
    latencies: jax.Array,
    w_in: jax.Array,
    beta,
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
    """Feedforward head variant: no recurrent weights."""
    _, _, logits, _ = _fused_fwd_call(
        latencies, w_in, None, beta, T=n_steps, use_periods=use_periods,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, w_out=w_out, b_out=b_out, kappa=kappa,
        store_traces=False,
    )
    return logits


def _fused_ff_head_fwd(latencies, w_in, beta, w_out, b_out, n_steps,
                       use_periods, alif, alpha, rho, threshold, gamma,
                       kappa, spike_func, interpret):
    traces, lat, logits, tstar = _fused_fwd_call(
        latencies, w_in, None, beta, T=n_steps, use_periods=use_periods,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, w_out=w_out, b_out=b_out, kappa=kappa,
    )
    return logits, (traces, lat, latencies.shape, w_in, beta, w_out, tstar)


def _fused_ff_head_bwd(n_steps, use_periods, alif, alpha, rho, threshold,
                       gamma, kappa, spike_func, interpret, res, g_logits):
    traces, lat, lat_shape, w_in, beta, w_out, tstar = res
    g_w_in, _, g_w_out, g_b = _fused_bwd_call(
        None, tuple(traces), None, lat, w_in, None, beta, T=n_steps,
        use_periods=use_periods, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold, gamma=gamma, spike_func=spike_func,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, g_logits=g_logits, tstar=tstar, w_out=w_out,
        kappa=kappa,
    )
    g_lat = np.zeros(lat_shape, dtype=jax.dtypes.float0)
    return (g_lat, g_w_in, jnp.zeros_like(jnp.asarray(beta)), g_w_out, g_b)


fused_encode_ff_scan_head.defvjp(_fused_ff_head_fwd, _fused_ff_head_bwd)


# ---------------------------------------------------------------------------
# Head + spike-count variants: (logits, counts) in one kernel pair
# ---------------------------------------------------------------------------
# The reference's sketched spike regularizers (snn.py:401-408) need only
# per-neuron spike COUNTS, not the full (B, T, H) z trace -- so the fused
# whole-network path stays available under regularized training: the
# forward emits counts[b, h] = sum_t z_t[b, h] alongside the logits (z is
# already in VMEM; the count costs one add per step), and the backward
# adds the count cotangent to dz at every step (d counts / d z_t == I).
# Without these, reg_fn forced return_hidden=True -> the XLA trace path,
# measured 7.9x slower than the fused path on the flagship.


@functools.partial(jax.custom_vjp, nondiff_argnums=HEAD_REC_STATICS)
def fused_encode_rec_scan_head_counts(
    latencies: jax.Array,
    w_in: jax.Array,
    w_rec: jax.Array,
    beta,
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
):
    """Like :func:`fused_encode_rec_scan_head` but returns
    ``(logits (B, O), spike_counts (B, H))`` where
    ``spike_counts[b, h] = sum_t z_t[b, h]`` (float32, exact integers).

    Differentiable in both outputs: the counts cotangent feeds the same
    surrogate-BPTT chain as the logits cotangent (quirk Q3's dead
    threshold/beta cotangents included)."""
    _, _, logits, _, counts = _fused_fwd_call(
        latencies, w_in, w_rec, beta, T=n_steps, use_periods=use_periods,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, w_out=w_out, b_out=b_out, kappa=kappa,
        store_traces=False, store_counts=True,
    )
    return logits, counts


def _fused_rec_head_cnt_fwd(latencies, w_in, w_rec, beta, w_out, b_out,
                            n_steps, use_periods, alif, alpha, rho,
                            threshold, gamma, kappa, spike_func, interpret):
    traces, lat, logits, tstar, counts = _fused_fwd_call(
        latencies, w_in, w_rec, beta, T=n_steps, use_periods=use_periods,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, w_out=w_out, b_out=b_out, kappa=kappa,
        store_counts=True,
    )
    return (logits, counts), (traces, lat, latencies.shape, w_in, w_rec,
                              beta, w_out, tstar)


def _fused_rec_head_cnt_bwd(n_steps, use_periods, alif, alpha, rho,
                            threshold, gamma, kappa, spike_func, interpret,
                            res, g):
    g_logits, g_counts = g
    traces, lat, lat_shape, w_in, w_rec, beta, w_out, tstar = res
    g_w_in, g_w_rec, g_w_out, g_b = _fused_bwd_call(
        None, tuple(traces), None, lat, w_in, w_rec, beta, T=n_steps,
        use_periods=use_periods, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold, gamma=gamma, spike_func=spike_func,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, g_logits=g_logits, tstar=tstar, w_out=w_out,
        kappa=kappa, g_counts=g_counts,
    )
    g_lat = np.zeros(lat_shape, dtype=jax.dtypes.float0)
    return (g_lat, g_w_in, g_w_rec, jnp.zeros_like(jnp.asarray(beta)),
            g_w_out, g_b)


fused_encode_rec_scan_head_counts.defvjp(
    _fused_rec_head_cnt_fwd, _fused_rec_head_cnt_bwd
)


@functools.partial(jax.custom_vjp, nondiff_argnums=HEAD_FF_STATICS)
def fused_encode_ff_scan_head_counts(
    latencies: jax.Array,
    w_in: jax.Array,
    beta,
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
):
    """Feedforward head+counts variant: no recurrent weights."""
    _, _, logits, _, counts = _fused_fwd_call(
        latencies, w_in, None, beta, T=n_steps, use_periods=use_periods,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, w_out=w_out, b_out=b_out, kappa=kappa,
        store_traces=False, store_counts=True,
    )
    return logits, counts


def _fused_ff_head_cnt_fwd(latencies, w_in, beta, w_out, b_out, n_steps,
                           use_periods, alif, alpha, rho, threshold, gamma,
                           kappa, spike_func, interpret):
    traces, lat, logits, tstar, counts = _fused_fwd_call(
        latencies, w_in, None, beta, T=n_steps, use_periods=use_periods,
        alif=alif, alpha=alpha, rho=rho, threshold=threshold,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, w_out=w_out, b_out=b_out, kappa=kappa,
        store_counts=True,
    )
    return (logits, counts), (traces, lat, latencies.shape, w_in, beta,
                              w_out, tstar)


def _fused_ff_head_cnt_bwd(n_steps, use_periods, alif, alpha, rho,
                           threshold, gamma, kappa, spike_func, interpret,
                           res, g):
    g_logits, g_counts = g
    traces, lat, lat_shape, w_in, beta, w_out, tstar = res
    g_w_in, _, g_w_out, g_b = _fused_bwd_call(
        None, tuple(traces), None, lat, w_in, None, beta, T=n_steps,
        use_periods=use_periods, alif=alif, alpha=alpha, rho=rho,
        threshold=threshold, gamma=gamma, spike_func=spike_func,
        store_delta=alif and _use_delta_residual(spike_func),
        interpret=interpret, g_logits=g_logits, tstar=tstar, w_out=w_out,
        kappa=kappa, g_counts=g_counts,
    )
    g_lat = np.zeros(lat_shape, dtype=jax.dtypes.float0)
    return (g_lat, g_w_in, jnp.zeros_like(jnp.asarray(beta)), g_w_out, g_b)


fused_encode_ff_scan_head_counts.defvjp(
    _fused_ff_head_cnt_fwd, _fused_ff_head_cnt_bwd
)
