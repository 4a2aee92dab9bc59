"""Pallas TPU kernel: spike encoding fused into the input-current matmul.

The profiled bottleneck of the flagship train step (~87% of device time)
is XLA's fusion of the spike generator into the first-layer matmul: the
generated operand forces a slow convolution-style emitter for both the
forward ``spikes @ W`` and the backward ``spikes^T @ g``.  Materializing
the spike tensor instead costs ~1.3 GB of HBM traffic per step at batch
4096 (spikes are ``(T, B, 784)`` float32 but carry only ``(B, 784)``
int32 of information -- the firing latencies/periods).

This kernel computes ``currents[t] = spikes(t) @ W`` directly from the
integer latencies: spike tiles are *generated in VMEM* from a
``(bB, bF)`` latency tile and fed to the MXU, so HBM reads drop from
~320 MB of spikes to ~3 MB of latencies (plus W), and the matmul runs on
the standard MXU path.

Encoding semantics are identical to ops/encoding.py (reference
datasets.py:72-86):

* TTFS: ``spike(t, b, f) = (latency[b, f] == t)`` (a latency >= n_steps
  never fires since t < n_steps).
* periodic: ``p = clip(latency, 1, n_steps - 1)``;
  ``spike(t) = (t - p >= 0) and ((t - p) % p == 0)``.

Backward: latencies are integers (no gradient -- the reference's int cast
kills pixel gradients too, datasets.py:54); ``g_W = sum_t spikes(t)^T @
g_currents(t)`` uses the same generated-operand trick in reverse.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["encoded_input_matmul", "encode_matmul_supported"]

_LANE = 128
_SUBLANE = 8
_BLOCK_B = 64   # keeps the (T, bB, H) accumulator ~3 MB at T=100, H=128
_BLOCK_F = 128


def encode_matmul_supported(n_steps: int, hidden: int) -> bool:
    """VMEM sanity: the in-kernel accumulator is (T, bB, H) float32."""
    acc_bytes = n_steps * _BLOCK_B * -(-hidden // _LANE) * _LANE * 4
    return jax.default_backend() == "tpu" and acc_bytes <= 8 * 1024 * 1024


def _spike_tile(latency_tile, t_iota, n_steps: int, use_periods: bool):
    """(T, bB, bF) float32 spike tile from a (bB, bF) int32 latency tile.

    The periodic remainder is computed in float32 instead of integer
    modulus (integer div/mod is many VPU cycles).  Exact for our ranges:
    ``delta < n_steps <= 2^12`` and ``1 <= p < n_steps``, so the
    correctly-rounded f32 quotient is never half-ulp-close to the wrong
    integer and ``floor`` recovers the true integer division.
    """
    lat = latency_tile[None, :, :]
    if use_periods:
        p = jnp.clip(lat, 1, n_steps - 1)
        delta = t_iota - p
        d_f = delta.astype(jnp.float32)
        p_f = p.astype(jnp.float32)
        q = jnp.floor(d_f / p_f)
        rem_is_zero = d_f == q * p_f
        spk = (delta >= 0) & rem_is_zero
    else:
        spk = t_iota == lat
    return spk


def _fwd_kernel(lat_ref, w_ref, out_ref, *, n_steps, use_periods):
    f = pl.program_id(1)

    @pl.when(f == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    T = out_ref.shape[0]
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0)
    # Spike operands take W's dtype (bf16-exact: values are 0/1);
    # accumulation is float32 either way.
    spk = _spike_tile(lat_ref[:], t_iota, n_steps, use_periods).astype(
        w_ref.dtype
    )
    bB = spk.shape[1]
    contrib = jnp.dot(
        spk.reshape(T * bB, -1), w_ref[:], preferred_element_type=jnp.float32
    ).reshape(T, bB, -1)
    out_ref[:] += contrib


def _bwd_kernel(lat_ref, g_ref, gw_ref, *, n_steps, use_periods):
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        gw_ref[:] = jnp.zeros_like(gw_ref)

    T = g_ref.shape[0]
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0)
    spk = _spike_tile(lat_ref[:], t_iota, n_steps, use_periods)  # (T,bB,bF)
    bB = spk.shape[1]
    # g_w[f, h] += sum_{t, b} spike[t, b, f] * g[t, b, h]
    g_tile = g_ref[:].reshape(T * bB, -1)
    gw_ref[:] += jax.lax.dot_general(
        spk.astype(g_tile.dtype).reshape(T * bB, -1), g_tile,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pad_lat(lat, bb, f_pad):
    B, F = lat.shape
    pb = (-B) % bb
    pf = f_pad - F
    if pb or pf:
        # Padded latencies = huge: never fires in TTFS; in periodic mode a
        # padded *feature* column must meet a zero W row (padded below),
        # and padded *batch* rows are sliced off the output.
        lat = jnp.pad(lat, ((0, pb), (0, pf)), constant_values=10**9)
    return lat


def _maybe_pad(x, widths):
    if any(hi for _, hi in widths):
        return jnp.pad(x, widths)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def encoded_input_matmul(
    latencies: jax.Array,
    w: jax.Array,
    n_steps: int,
    use_periods: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """(latencies (B, F) int32, W (F, H)) -> currents (T, B, H).

    Numerically equal (up to f32 tile-summation order) to
    ``einsum('btf,fh->tbh', firing_*_to_spikes(latencies, T), W)``.
    """
    return _fwd(latencies, w, n_steps, use_periods, interpret)


def _fwd(latencies, w, n_steps, use_periods, interpret, lat_prepadded=None):
    B, F = latencies.shape
    H = w.shape[1]
    f_pad = -(-F // _BLOCK_F) * _BLOCK_F
    h_pad = -(-H // _LANE) * _LANE
    lat = (
        lat_prepadded
        if lat_prepadded is not None
        else _pad_lat(latencies.astype(jnp.int32), _BLOCK_B, f_pad)
    )
    wp = _maybe_pad(w, ((0, f_pad - F), (0, h_pad - H)))
    Bp = lat.shape[0]
    grid = (Bp // _BLOCK_B, f_pad // _BLOCK_F)

    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, n_steps=n_steps, use_periods=use_periods,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_B, _BLOCK_F), lambda b, f: (b, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_F, h_pad), lambda b, f: (f, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_steps, _BLOCK_B, h_pad),
                               lambda b, f: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps, Bp, h_pad), jnp.float32),
        interpret=interpret,
    )(lat, wp)
    if out.shape[1] != B or out.shape[2] != H:
        out = out[:, :B, :H]
    return out


def _fwd_vjp(latencies, w, n_steps, use_periods, interpret):
    f_pad = -(-latencies.shape[1] // _BLOCK_F) * _BLOCK_F
    lat = _pad_lat(latencies.astype(jnp.int32), _BLOCK_B, f_pad)
    out = _fwd(latencies, w, n_steps, use_periods, interpret, lat_prepadded=lat)
    # Save the padded latencies so the backward doesn't re-pad.  The
    # zero-size sentinel carries w's dtype (dtype objects aren't valid
    # residual leaves).
    return out, (lat, latencies.shape, w.shape, jnp.empty((0,), w.dtype))


def _bwd_vjp(n_steps, use_periods, interpret, res, g):
    lat, lat_shape, w_shape, w_sentinel = res
    F, H = w_shape
    B = lat_shape[0]
    f_pad = -(-F // _BLOCK_F) * _BLOCK_F
    h_pad = -(-H // _LANE) * _LANE
    Bp = lat.shape[0]
    gp = _maybe_pad(
        g.astype(jnp.float32), ((0, 0), (0, Bp - B), (0, h_pad - H))
    )
    grid = (f_pad // _BLOCK_F, Bp // _BLOCK_B)

    gw = pl.pallas_call(
        functools.partial(_bwd_kernel, n_steps=n_steps,
                          use_periods=use_periods),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_B, _BLOCK_F), lambda f, b: (b, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_steps, _BLOCK_B, h_pad), lambda f, b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_F, h_pad), lambda f, b: (f, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_pad, h_pad), jnp.float32),
        interpret=interpret,
    )(lat, gp)
    g_lat = np.zeros(lat_shape, dtype=jax.dtypes.float0)
    if gw.shape != (F, H):
        gw = gw[:F, :H]
    return g_lat, gw.astype(w_sentinel.dtype)


encoded_input_matmul.defvjp(_fwd_vjp, _bwd_vjp)
