"""Serving throughput on the real TPU: drive InferenceServer with
concurrent host-streamed requests on the flagship config.

    python scripts/serve_throughput.py [--batch 4096] [--reqs 64]
        [--req-rows 512] [--threads 8]

On relay-attached TPUs this measures the HOST-STREAMING bound (the
12.8 MB pixel upload per batch dominates; the dispatcher/completion
split overlaps batch i+1's upload with batch i's compute).  The
kernel-bound ceiling for the same forward is BENCH_FULL's infer_value
(~2.5M img/s) -- that is what a PCIe-attached production host would see.
"""
import argparse
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reqs", type=int, default=64)
    ap.add_argument("--req-rows", type=int, default=512)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument(
        "--uint8", action="store_true",
        help="uint8 wire format: raw bytes over the relay, normalize-by-"
        "255 on device (4x fewer wire bytes on the transfer-bound path)",
    )
    args = ap.parse_args()

    from snnimageclassification_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax

    import snnimageclassification_tpu as st
    from snnimageclassification_tpu import models

    cfg = st.SNNConfig(
        input_size=784, output_size=10, n_hidden_neurons=128,
        hidden_layer_type=st.LayerType.ALIF,
        use_recurrent_connection=True, learn_beta=True,
        int_time_steps=100,
    )
    params = models.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    if args.uint8:
        def make(shape):
            return rng.integers(0, 256, size=shape, dtype=np.uint8)
    else:
        def make(shape):
            return rng.random(shape, dtype=np.float32)

    with st.InferenceServer(
        cfg, params, batch_size=args.batch, max_delay_s=0.02,
        input_dtype=np.uint8 if args.uint8 else np.float32,
    ) as srv:
        # Warm the compile (cached across processes via the XLA cache).
        srv.submit(make((args.batch, 784))).result(timeout=3600)

        reqs = [make((args.req_rows, 784)) for _ in range(args.reqs)]
        futs, lock = [], threading.Lock()

        def worker(chunk):
            for r in chunk:
                f = srv.submit(r)
                with lock:
                    futs.append(f)

        per = args.reqs // args.threads
        threads = [
            threading.Thread(target=worker, args=(reqs[i * per:(i + 1) * per],))
            for i in range(args.threads)
        ]
        t0 = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for f in list(futs):
            f.result(timeout=3600)
        dt = time.monotonic() - t0
        snap = srv.stats.snapshot()

    rows = args.reqs * args.req_rows
    print(
        f"served {rows} rows in {dt:.3f}s -> {rows / dt:.0f} img/s "
        f"(occupancy {snap['occupancy']:.2f}, "
        f"p50 {1e3 * snap['latency_p50_s']:.0f} ms under full queue load)"
    )


if __name__ == "__main__":
    main()
