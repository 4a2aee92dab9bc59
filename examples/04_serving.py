"""Serving: concurrent clients against the dynamic-batching
InferenceServer.  Requests coalesce into one compiled fixed-shape batch;
the stats snapshot shows occupancy and latency percentiles.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import threading

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import snnimageclassification_tpu as st
    from snnimageclassification_tpu import models

    cfg = st.SNNConfig(
        input_size=64, output_size=10, n_hidden_neurons=32,
        hidden_layer_type=st.LayerType.ALIF,
        use_recurrent_connection=False, int_time_steps=4,
    )
    params = models.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)

    with st.InferenceServer(
        cfg, params, batch_size=64, max_delay_s=0.005
    ) as srv:
        results = []
        lock = threading.Lock()

        def client(i):
            r = np.random.default_rng(i)
            for _ in range(args.requests // args.clients):
                pixels = r.random((int(r.integers(1, 9)), 64),
                                  dtype=np.float32)
                labels = srv.classify(pixels)
                with lock:
                    results.append(labels)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        snap = srv.stats.snapshot()

    print(f"served {snap['rows']} rows in {snap['batches']} batches "
          f"(occupancy {snap['occupancy']:.2f})")
    print(f"latency p50 {1e3 * snap['latency_p50_s']:.1f} ms, "
          f"p99 {1e3 * snap['latency_p99_s']:.1f} ms")


if __name__ == "__main__":
    main()
