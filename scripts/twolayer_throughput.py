"""Two-hidden-layer training throughput: fused2 whole-network pair vs
the composed layer-0-fused + mid-head dispatch, interleaved in ONE
process (contention hits both arms equally), plus in-process loss/grad
parity between the two dispatches.

Run: PYTHONPATH=/root/repo python scripts/twolayer_throughput.py
     [--t 100] [--batch 8192] [--windows 3] [--f32]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

WARMUP, STEPS = 2, 10


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--f32", action="store_true",
                    help="f32 matmuls (default: the bf16 recipe)")
    args = ap.parse_args()

    import optax

    import snnimageclassification_tpu.models.snn as msnn
    from snnimageclassification_tpu import models
    from snnimageclassification_tpu.data.datasets import EncodeConfig
    from snnimageclassification_tpu.models.config import SNNConfig
    from snnimageclassification_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    T, B, H = args.t, args.batch, args.hidden
    kw = {} if args.f32 else {"matmul_dtype": "bfloat16"}
    cfg = SNNConfig(
        input_size=784, output_size=10, n_hidden_neurons=[H, H],
        hidden_layer_type="ALIF", use_recurrent_connection=True,
        learn_beta=True, int_time_steps=T, **kw,
    )
    enc = EncodeConfig(n_steps=T, use_periods=True)
    assert msnn._twolayer_head_fusible(cfg, enc), "fused2 gate off?"
    params = models.init(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, 784)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, B), jnp.int32)

    real_gate = msnn._twolayer_head_fusible

    def make_step(use_fused2):
        def loss_fn(p, xb):
            logits = msnn.forward_logits_pixels(cfg, p, xb, enc)
            return -jnp.mean(
                jax.nn.log_softmax(logits)[jnp.arange(B), y]
            )

        def step(p, s, xb):
            loss, g = jax.value_and_grad(loss_fn)(p, xb)
            up, s = opt.update(g, s, p)
            return optax.apply_updates(p, up), s, loss

        # The gate is replayed at TRACE time, so flipping it before jit
        # tracing selects the dispatch for the whole compiled program.
        msnn._twolayer_head_fusible = real_gate if use_fused2 \
            else (lambda c, e: False)
        try:
            compiled = jax.jit(step, donate_argnums=(0, 1)).lower(
                params, opt_state, x
            ).compile()
        finally:
            msnn._twolayer_head_fusible = real_gate
        return compiled

    arms = {"fused2": make_step(True), "composed": make_step(False)}

    # In-process parity first (same data, fresh params each).
    vals = {}
    for nm, step in arms.items():
        p = models.init(cfg, jax.random.PRNGKey(0))
        s = opt.init(p)
        for _ in range(3):
            p, s, loss = step(p, s, x)
        vals[nm] = (float(loss), p)
    l_f, p_f = vals["fused2"]
    l_c, p_c = vals["composed"]
    dmax = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(p_f),
                        jax.tree_util.tree_leaves(p_c))
    )
    print(f"parity: 3-step loss fused2 {l_f:.6f} composed {l_c:.6f} "
          f"(|d|={abs(l_f-l_c):.2e}) max param diff {dmax:.2e}")

    results = {nm: [] for nm in arms}
    state = {
        nm: (models.init(cfg, jax.random.PRNGKey(1)), None)
        for nm in arms
    }
    for nm in arms:
        p, _ = state[nm]
        state[nm] = (p, opt.init(p))
    for w in range(args.windows + 1):  # window 0 = warm-up, discarded
        for nm, step in arms.items():
            p, s = state[nm]
            t0 = time.perf_counter()
            for _ in range(STEPS):
                p, s, loss = step(p, s, x)
            _ = float(loss)  # host read closes the window
            dt = time.perf_counter() - t0
            state[nm] = (p, s)
            if w:
                results[nm].append(B * STEPS / dt)
                print(f"window {w} {nm}: {B*STEPS/dt:,.0f} img/s")
    best = {nm: max(v) for nm, v in results.items()}
    med = {nm: sorted(v)[len(v) // 2] for nm, v in results.items()}
    print(f"RESULT T={T} B={B} H=[{H},{H}] "
          f"{'f32' if args.f32 else 'bf16'}: "
          f"fused2 best {best['fused2']:,.0f} med {med['fused2']:,.0f} | "
          f"composed best {best['composed']:,.0f} med "
          f"{med['composed']:,.0f} | speedup best "
          f"{best['fused2']/best['composed']:.2f}x med "
          f"{med['fused2']/med['composed']:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
