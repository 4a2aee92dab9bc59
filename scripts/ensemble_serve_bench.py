"""Ensemble serving throughput on the real TPU (round-5 VERDICT item 4).

Interleaved A/B over {single model, S-seed soft-vote ensemble} x
{float32, uint8 wire} on the flagship config: N rounds, each round
serves every configuration once back-to-back, so relay contention hits
all arms equally.  Reports per-arm median + best img/s and p50/p99
latency, and asserts the ensemble server's probability rows are BITWISE
equal to EnsembleTrainer.predict_proba on a probe batch.

    python scripts/ensemble_serve_bench.py [--rounds 8] [--seeds 6]
        [--t 100] [--reqs 16] [--req-rows 512] [--batch 4096]
"""
import argparse
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np


def _drive(srv, reqs, threads=8):
    futs, lock = [], threading.Lock()

    def worker(chunk):
        for r in chunk:
            f = srv.submit(r)
            with lock:
                futs.append(f)

    per = max(1, len(reqs) // threads)
    ts = [
        threading.Thread(target=worker, args=(reqs[i * per:(i + 1) * per],))
        for i in range(threads)
    ]
    t0 = time.monotonic()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for f in list(futs):
        np.asarray(f.result(timeout=3600))
    return time.monotonic() - t0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--seeds", type=int, default=6)
    ap.add_argument("--t", type=int, default=100)
    ap.add_argument("--reqs", type=int, default=16)
    ap.add_argument("--req-rows", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--threads", type=int, default=8)
    args = ap.parse_args()

    from snnimageclassification_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax

    import snnimageclassification_tpu as st
    from snnimageclassification_tpu import models
    from snnimageclassification_tpu.data.datasets import EncodeConfig
    from snnimageclassification_tpu.parallel.ensemble import EnsembleTrainer

    print("backend:", jax.default_backend(), flush=True)
    cfg = st.SNNConfig(
        input_size=784, output_size=10, n_hidden_neurons=128,
        hidden_layer_type=st.LayerType.ALIF,
        use_recurrent_connection=True, learn_beta=True,
        int_time_steps=args.t,
    )
    enc = EncodeConfig(n_steps=args.t, use_periods=True)
    params = models.init(cfg, jax.random.PRNGKey(0))
    ens = EnsembleTrainer(cfg, seeds=tuple(range(args.seeds)))

    rng = np.random.default_rng(0)

    def mk(dtype, shape):
        if dtype == "uint8":
            return rng.integers(0, 256, size=shape, dtype=np.uint8)
        return rng.random(shape, dtype=np.float32)

    servers = {}
    for wire in ("f32", "u8"):
        in_dtype = np.uint8 if wire == "u8" else np.float32
        servers[f"single-{wire}"] = st.InferenceServer(
            cfg, params, encode_config=enc, batch_size=args.batch,
            max_delay_s=0.02, input_dtype=in_dtype,
        )
        servers[f"ens{args.seeds}-{wire}"] = ens.serve(
            encode_config=enc, batch_size=args.batch, max_delay_s=0.02,
            input_dtype=in_dtype,
        )

    try:
        # --- correctness: server probabilities == predict_proba ---------
        # The server's one-jit program (stacked forward + fused
        # softmax/mean at the padded batch shape) and predict_proba
        # (native-shape logits, softmax outside jit) tile their MXU
        # reductions differently, so agreement is to float rounding (one
        # ULP observed, 6e-8), not bitwise.
        probe = mk("f32", (256, 784))
        got = np.asarray(
            servers[f"ens{args.seeds}-f32"].submit(probe).result(3600)
        )
        want = np.asarray(ens.predict_proba(probe, encode_config=enc))
        assert got.shape == want.shape, (got.shape, want.shape)
        dmax = float(np.max(np.abs(got - want)))
        if dmax > 1e-6:
            raise AssertionError(
                f"server probs != predict_proba: max|d|={dmax}"
            )
        same_pred = np.array_equal(got.argmax(-1), want.argmax(-1))
        print(f"ens-server vs predict_proba: max|d|={dmax:.2e} "
              f"(<=1e-6), argmax identical: {same_pred}", flush=True)

        # --- warm every server's compiled batch program ------------------
        for name, srv in servers.items():
            t0 = time.monotonic()
            srv.submit(
                mk("u8" if name.endswith("u8") else "f32",
                   (args.batch, 784))
            ).result(timeout=3600)
            print(f"warm {name}: {time.monotonic()-t0:.1f}s", flush=True)

        results = {k: [] for k in servers}
        rows = args.reqs * args.req_rows
        for rnd in range(args.rounds):
            for name, srv in servers.items():
                wire = "u8" if name.endswith("u8") else "f32"
                reqs = [
                    mk(wire, (args.req_rows, 784)) for _ in range(args.reqs)
                ]
                dt = _drive(srv, reqs, args.threads)
                results[name].append(rows / dt)
                print(f"round {rnd} {name}: {rows/dt:.0f} img/s", flush=True)

        out = {}
        for name, srv in servers.items():
            snap = srv.stats.snapshot()
            vals = sorted(results[name])
            out[name] = {
                "img_per_s_median": float(np.median(vals)),
                "img_per_s_best": float(vals[-1]),
                "img_per_s_min": float(vals[0]),
                "n": len(vals),
                "latency_p50_ms": 1e3 * snap["latency_p50_s"],
                "latency_p99_ms": 1e3 * snap["latency_p99_s"],
                "occupancy": snap["occupancy"],
            }
        print(json.dumps(out, indent=2), flush=True)
    finally:
        for srv in servers.values():
            srv.close()


if __name__ == "__main__":
    main()
