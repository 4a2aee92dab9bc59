"""Native validation of the wide-hidden fused path (round-3 gate fix):
hidden sizes past 128 lanes shrink the batch tile instead of losing
fusion.  For each width: assert the gate opens, check fused-vs-XLA loss
+ gradient parity at batch > tile (the shrunk tile really cycles), and
measure throughput both ways.

Run on the real TPU:  python scripts/wide_hidden_check.py [--widths 256,512]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="200,256,512")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--t", type=int, default=50)
    args = ap.parse_args()

    from snnimageclassification_tpu.models import snn as M
    from snnimageclassification_tpu.models.config import SNNConfig
    from snnimageclassification_tpu.data.datasets import EncodeConfig
    from snnimageclassification_tpu.ops.encoding import encode_spikes
    from snnimageclassification_tpu.ops.pallas_fused import (
        _shapes,
        _time_block,
        fused_head_supported,
    )
    from snnimageclassification_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.random((64, 784)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 10, 64), jnp.int32)
    xb = jnp.asarray(rng.random((args.batch, 784)), jnp.float32)
    yb = jnp.asarray(rng.integers(0, 10, args.batch), jnp.int32)
    ok = True
    for width in [int(w) for w in args.widths.split(",")]:
        assert fused_head_supported(args.t, 784, width, 10), width
        cfg = SNNConfig(
            input_size=784, output_size=10, n_hidden_neurons=width,
            hidden_layer_type="ALIF", use_recurrent_connection=True,
            int_time_steps=args.t,
        )
        cfg_x = SNNConfig(
            input_size=784, output_size=10, n_hidden_neurons=width,
            hidden_layer_type="ALIF", use_recurrent_connection=True,
            int_time_steps=args.t, use_pallas=False,
        )
        enc = EncodeConfig(n_steps=args.t)
        params = M.init(cfg, jax.random.PRNGKey(0))
        _, _, _, bb = _shapes(args.batch, params["input"]["w_in"], 784,
                              _time_block(args.t), head=True)

        def loss(c, p, x, y):
            lg = (M.forward_logits_pixels(c, p, x, enc)
                  if c.use_pallas else
                  M.forward_logits(c, p, encode_spikes(x, n_steps=args.t)))
            n = x.shape[0]
            return -jnp.mean(jax.nn.log_softmax(lg)[jnp.arange(n), y])

        # Parity at small batch (fast), against the XLA scan path.
        lp = jax.jit(lambda p: loss(cfg, p, xs, ys))(params)
        lx = jax.jit(lambda p: loss(cfg_x, p, xs, ys))(params)
        gp = jax.jit(jax.grad(lambda p: loss(cfg, p, xs, ys)))(params)
        gx = jax.jit(jax.grad(lambda p: loss(cfg_x, p, xs, ys)))(params)
        dl = abs(float(lp) - float(lx))
        dg = max(
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx))
        )
        good = dl < 1e-5 and dg < 1e-4
        ok &= good

        # Throughput at batch > tile: the shrunk tile cycles for real.
        res = {}
        for c, label in ((cfg, "fused"), (cfg_x, "xla")):
            step = jax.jit(jax.value_and_grad(lambda p: loss(c, p, xb, yb)))
            v, _ = step(params)
            float(v)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(10):
                    v, _ = step(params)
                float(v)
                best = min(best, time.perf_counter() - t0)
            res[label] = round(args.batch * 10 / best)
        print(json.dumps(dict(
            width=width, tile=int(bb), loss_diff=dl, grad_diff=dg,
            parity="OK" if good else "FAIL",
            fused_img_s=res["fused"], xla_img_s=res["xla"],
            speedup=round(res["fused"] / res["xla"], 2),
        )))
    print("WIDE-HIDDEN", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
