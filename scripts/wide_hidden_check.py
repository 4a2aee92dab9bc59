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
    ap.add_argument("--matmul-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="bfloat16 halves the kernel's resident weight "
                         "bytes: H=1024 recurrent stays FUSED under the "
                         "bf16 recipe where f32 gates off to XLA")
    args = ap.parse_args()
    bf16 = args.matmul_dtype == "bfloat16"

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
    xb = jnp.asarray(rng.random((args.batch, 784)), jnp.float32)
    yb = jnp.asarray(rng.integers(0, 10, args.batch), jnp.int32)
    ok = True
    for width in [int(w) for w in args.widths.split(",")]:
        assert fused_head_supported(args.t, 784, width, 10,
                                    itemsize=2 if bf16 else 4), width
        cfg = SNNConfig(
            input_size=784, output_size=10, n_hidden_neurons=width,
            hidden_layer_type="ALIF", use_recurrent_connection=True,
            int_time_steps=args.t, matmul_dtype=args.matmul_dtype,
        )
        cfg_x = SNNConfig(
            input_size=784, output_size=10, n_hidden_neurons=width,
            hidden_layer_type="ALIF", use_recurrent_connection=True,
            int_time_steps=args.t, use_pallas=False,
            matmul_dtype=args.matmul_dtype,
        )
        enc = EncodeConfig(n_steps=args.t)
        params = M.init(cfg, jax.random.PRNGKey(0))
        w_in_k = params["input"]["w_in"].astype(
            jnp.dtype(cfg.matmul_dtype_eff)
        )
        _, _, _, bb = _shapes(args.batch, w_in_k, 784,
                              _time_block(args.t), head=True,
                              recurrent=True, n_out=10)

        def loss(c, p, x, y):
            lg = (M.forward_logits_pixels(c, p, x, enc)
                  if c.use_pallas else
                  M.forward_logits(c, p, encode_spikes(x, n_steps=args.t)))
            n = x.shape[0]
            return -jnp.mean(jax.nn.log_softmax(lg)[jnp.arange(n), y])

        # Parity AT THE FULL BATCH (> shrunk tile, so tile cycling is
        # exercised), fused vs the XLA scan path, scale-normalized per
        # leaf (raw gradients reach O(1e3+) at these widths).
        grads, res = {}, {}
        for c, label in ((cfg, "fused"), (cfg_x, "xla")):
            # Chain iterations: fold the previous loss back into the
            # input (x * (1 + 0*v) is bitwise x) so the relay cannot
            # overlap same-args calls and under-report (CLAUDE.md).
            step = jax.jit(
                lambda p, x, c=c: jax.value_and_grad(
                    lambda q: loss(c, q, x, yb)
                )(p)
            )
            v, g = step(params, xb)
            float(v)
            grads[label] = (float(v), g)
            best = float("inf")
            for _ in range(3):
                x_c = xb
                t0 = time.perf_counter()
                for _ in range(10):
                    v, _ = step(params, x_c)
                    x_c = xb * (1.0 + 0.0 * v)
                float(v)
                best = min(best, time.perf_counter() - t0)
            res[label] = round(args.batch * 10 / best)
        dl = abs(grads["fused"][0] - grads["xla"][0]) / max(
            abs(grads["xla"][0]), 1e-12
        )
        dg = max(
            float(jnp.max(jnp.abs(a - b)))
            / max(float(jnp.max(jnp.abs(b))), 1e-12)
            for a, b in zip(
                jax.tree.leaves(grads["fused"][1]),
                jax.tree.leaves(grads["xla"][1]),
            )
        )
        # bf16: both paths quantize their matmuls/traces, but fusion
        # reorders the rounding, so tolerances widen (spikes themselves
        # stay bitwise per the bf16-recipe parity suite).
        tol_l, tol_g = (5e-3, 2e-2) if bf16 else (1e-5, 1e-4)
        good = dl < tol_l and dg < tol_g
        ok &= good
        print(json.dumps(dict(
            width=width, tile=int(bb), matmul_dtype=args.matmul_dtype,
            rel_loss_diff=dl, rel_grad_diff=dg,
            parity="OK" if good else "FAIL",
            fused_img_s=res["fused"], xla_img_s=res["xla"],
            speedup=round(res["fused"] / res["xla"], 2),
        )))
    print("WIDE-HIDDEN", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
