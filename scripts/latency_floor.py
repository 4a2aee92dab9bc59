"""Quantify the fused-kernel latency floor on the flagship shape.

Round-2/3 evidence says the whole-network head kernels are latency-bound
on the serial (recurrent matmul + VPU dynamics) chain: bf16 matmul
operands change ~nothing, K/VMEM block sweeps are flat, batch-half
interleaving (SNN_TPU_ILV) is slightly *negative*.  This script turns
that folklore into numbers: per-variant step time and derived
micro-seconds per serial (tile, time-step) link, ablating each
contributor of the chain:

* fwd-only vs fwd+bwd          (how much of the step is the backward)
* recurrent vs feedforward     (the MXU matmul's latency share)
* ALIF vs LIF                  (the adaptation VPU ops' share)
* T=50 vs T=100                (linearity in chain length)
* batch 4096 vs 8192           (linearity in tile count)

Timing matches bench.py: chained same-buffer steps, float() host read to
close each window, best of 3 windows.  Run on the real TPU:

    python scripts/latency_floor.py [--steps 25] [--windows 3]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8192
T = 100
BLOCK_B = 512  # _MAX_BLOCK_B: tiles per batch = BATCH / 512


def measure(cfg, enc, batch, steps, windows, grad=True):
    from snnimageclassification_tpu.models import snn as model_lib
    from snnimageclassification_tpu.train.trainer import nll_loss

    params = model_lib.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 28 * 28)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, batch), jnp.int32)

    def loss_fn(p, x):
        return nll_loss(model_lib.forward_logits_pixels(cfg, p, x, enc), y)

    if grad:
        @jax.jit
        def step(p, x, s):
            loss, grads = jax.value_and_grad(loss_fn)(p, x)
            # Consume every cotangent so no part of the backward can be
            # dead-code-eliminated; chain the loss back into the next
            # call's input so iterations serialize (relay-safe timing).
            g = sum(jnp.sum(l) for l in jax.tree.leaves(grads))
            return loss + s, g
    else:
        @jax.jit
        def step(p, x, s):
            return loss_fn(p, x) + s, jnp.float32(0)

    s = jnp.float32(0)
    for _ in range(3):
        s, _ = step(params, x, s * 0)
    float(s)
    best = float("inf")
    for _ in range(windows):
        s = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(steps):
            s, _ = step(params, x, s * 1e-30)
        float(s)
        best = min(best, time.perf_counter() - t0)
    return best / steps  # seconds per step


def main():
    import snnimageclassification_tpu as st
    from snnimageclassification_tpu.data.datasets import EncodeConfig
    from snnimageclassification_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()
    enable_compilation_cache()

    base = dict(
        input_size=28 * 28, output_size=10, n_hidden_neurons=128,
        hidden_layer_type="ALIF", use_recurrent_connection=True,
        learn_beta=True, int_time_steps=T, matmul_dtype="bfloat16",
    )
    variants = [
        ("flagship fwd+bwd", base, T, BATCH, True),
        ("flagship fwd-only", base, T, BATCH, False),
        ("feedforward (no rec matmul)",
         {**base, "use_recurrent_connection": False}, T, BATCH, True),
        ("LIF (no adaptation ops)",
         {**base, "hidden_layer_type": "LIF"}, T, BATCH, True),
        ("T=50", {**base, "int_time_steps": 50}, 50, BATCH, True),
        ("batch 4096", base, T, 4096, True),
    ]
    rows = []
    for name, cfg_kw, t, batch, grad in variants:
        cfg = st.SNNConfig(**cfg_kw)
        enc = EncodeConfig(n_steps=t, use_periods=True)
        sec = measure(cfg, enc, batch, args.steps, args.windows, grad=grad)
        tiles = batch // BLOCK_B
        # Serial links: fwd tiles*T; bwd adds tiles*T more (reverse sweep).
        links = tiles * t * (2 if grad else 1)
        rows.append(dict(
            variant=name, step_ms=round(sec * 1e3, 3),
            img_per_s=round(batch / sec),
            us_per_serial_link=round(sec * 1e6 / links, 3),
        ))
        print(json.dumps(rows[-1]))
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
