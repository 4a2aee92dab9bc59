"""Dynamic-batching inference server (serve.py).

The reference has no serving layer; this pins the contract that makes
one: coalesced fixed-shape batches (no recompiles), padding invisible to
callers, chunking of oversized requests, thread-safe submission, drain
semantics on close, and numerics equal to the direct
``forward_logits_pixels`` call.
"""
import threading

import numpy as np
import pytest

import snnimageclassification_tpu as st
from snnimageclassification_tpu import models
from snnimageclassification_tpu.data.datasets import EncodeConfig
from snnimageclassification_tpu.models import snn as model_lib
from snnimageclassification_tpu.serve import InferenceServer

N_F, N_O = 20, 10


@pytest.fixture(scope="module")
def cfg():
    return st.SNNConfig(
        input_size=N_F, output_size=N_O, n_hidden_neurons=16,
        hidden_layer_type=st.LayerType.ALIF,
        use_recurrent_connection=False, int_time_steps=3,
    )


@pytest.fixture(scope="module")
def params(cfg):
    import jax

    return models.init(cfg, jax.random.PRNGKey(0))


def _pixels(rng, n):
    return rng.random((n, N_F), dtype=np.float32) if n > 1 else rng.random(
        (N_F,), dtype=np.float32
    )


def _oracle(cfg, params, rows):
    enc = EncodeConfig(n_steps=cfg.int_time_steps)
    return np.asarray(
        model_lib.forward_logits_pixels(cfg, params, rows, enc)
    )


class TestCorrectness:
    def test_single_row_matches_direct(self, cfg, params):
        rng = np.random.default_rng(0)
        x = _pixels(rng, 1)
        with InferenceServer(cfg, params, batch_size=8) as srv:
            got = srv.submit(x).result(timeout=60)
        assert got.shape == (N_O,)
        np.testing.assert_allclose(
            got, _oracle(cfg, params, x[None])[0], rtol=1e-5, atol=1e-6
        )

    def test_block_request_matches_direct(self, cfg, params):
        rng = np.random.default_rng(1)
        x = _pixels(rng, 5)
        with InferenceServer(cfg, params, batch_size=8) as srv:
            got = srv.submit(x).result(timeout=60)
        assert got.shape == (5, N_O)
        np.testing.assert_allclose(
            got, _oracle(cfg, params, x), rtol=1e-5, atol=1e-6
        )

    def test_oversized_request_chunks(self, cfg, params):
        """A request larger than the compiled batch spans several batches
        and re-assembles in order."""
        rng = np.random.default_rng(2)
        x = _pixels(rng, 19)  # 3 chunks at batch_size=8
        with InferenceServer(cfg, params, batch_size=8) as srv:
            got = srv.submit(x).result(timeout=60)
            assert srv.stats.batches >= 3
        np.testing.assert_allclose(
            got, _oracle(cfg, params, x), rtol=1e-5, atol=1e-6
        )

    def test_padding_rows_invisible(self, cfg, params):
        """A partial batch (flushed by max_delay) returns exactly the
        same logits as the same rows inside a full direct batch: padding
        rows are zero pixels whose compute never leaks into real rows."""
        rng = np.random.default_rng(3)
        x = _pixels(rng, 3)
        with InferenceServer(
            cfg, params, batch_size=8, max_delay_s=0.01
        ) as srv:
            got = srv.submit(x).result(timeout=60)
        padded = np.zeros((8, N_F), np.float32)
        padded[:3] = x
        np.testing.assert_array_equal(
            got, _oracle(cfg, params, padded)[:3]
        )

    def test_classify(self, cfg, params):
        rng = np.random.default_rng(4)
        x = _pixels(rng, 4)
        with InferenceServer(cfg, params, batch_size=8) as srv:
            labels = srv.classify(x)
        np.testing.assert_array_equal(
            labels, np.argmax(_oracle(cfg, params, x), axis=-1)
        )


class TestUint8Wire:
    """uint8 wire format: raw bytes in, on-device normalize-by-255."""

    def test_uint8_matches_float_server_bitwise(self, cfg, params):
        rng = np.random.default_rng(7)
        raw = rng.integers(0, 256, size=(5, N_F), dtype=np.uint8)
        with InferenceServer(
            cfg, params, batch_size=8, input_dtype=np.uint8
        ) as srv:
            got = srv.submit(raw).result(timeout=60)
        # The on-device x.astype(f32)/255.0 is one exact-rounding f32
        # division -- identical to host normalization, so the logits
        # must be BITWISE equal to the float32 path fed raw/255.
        want = _oracle(
            cfg, params, raw.astype(np.float32) / np.float32(255.0)
        )
        np.testing.assert_array_equal(got, want)

    def test_uint8_single_row_and_padding(self, cfg, params):
        rng = np.random.default_rng(8)
        raw = rng.integers(0, 256, size=(N_F,), dtype=np.uint8)
        with InferenceServer(
            cfg, params, batch_size=8, input_dtype=np.uint8
        ) as srv:
            got = srv.submit(raw).result(timeout=60)
        assert got.shape == (N_O,)
        want = _oracle(
            cfg, params, raw[None].astype(np.float32) / np.float32(255.0)
        )[0]
        np.testing.assert_array_equal(got, want)

    def test_uint8_accepts_wider_ints(self, cfg, params):
        raw = np.arange(N_F, dtype=np.int64) % 256
        with InferenceServer(
            cfg, params, batch_size=8, input_dtype=np.uint8
        ) as srv:
            got = srv.submit(raw).result(timeout=60)
        assert got.shape == (N_O,)

    def test_uint8_rejects_floats_and_out_of_range(self, cfg, params):
        with InferenceServer(
            cfg, params, batch_size=8, input_dtype=np.uint8
        ) as srv:
            with pytest.raises(ValueError, match="uint8 raw bytes"):
                srv.submit(np.zeros(N_F, dtype=np.float32))
            with pytest.raises(ValueError, match="out of uint8 range"):
                srv.submit(np.full(N_F, 300, dtype=np.int32))

    def test_custom_scale_float_server(self, cfg, params):
        """input_scale also works for float servers (e.g. 0-16 DIGITS)."""
        rng = np.random.default_rng(9)
        x = (16.0 * rng.random((3, N_F))).astype(np.float32)
        with InferenceServer(
            cfg, params, batch_size=8, input_scale=16.0
        ) as srv:
            got = srv.submit(x).result(timeout=60)
        want = _oracle(cfg, params, x / np.float32(16.0))
        np.testing.assert_array_equal(got, want)

    def test_bad_input_dtype_rejected(self, cfg, params):
        with pytest.raises(ValueError, match="input_dtype"):
            InferenceServer(cfg, params, input_dtype=np.float64)


class TestConcurrency:
    def test_many_threads_all_correct(self, cfg, params):
        rng = np.random.default_rng(5)
        reqs = [_pixels(rng, int(n)) for n in rng.integers(1, 7, size=24)]
        results = [None] * len(reqs)
        with InferenceServer(
            cfg, params, batch_size=16, max_delay_s=0.005
        ) as srv:
            def worker(i):
                results[i] = srv.submit(reqs[i]).result(timeout=60)

            threads = [
                threading.Thread(target=worker, args=(i,))
                for i in range(len(reqs))
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            snap = srv.stats.snapshot()
        assert snap["requests"] == len(reqs)
        assert snap["rows"] == sum(
            1 if r.ndim == 1 else r.shape[0] for r in reqs
        )
        assert 0.0 < snap["occupancy"] <= 1.0
        assert snap["latency_p99_s"] >= snap["latency_p50_s"] >= 0.0
        for req, got in zip(reqs, results):
            rows = req[None] if req.ndim == 1 else req
            want = _oracle(cfg, params, rows)
            np.testing.assert_allclose(
                got if got.ndim == 2 else got[None], want,
                rtol=1e-5, atol=1e-6,
            )

    def test_coalescing_fills_batches(self, cfg, params):
        """Rows submitted together coalesce: far fewer batches than
        requests."""
        rng = np.random.default_rng(6)
        with InferenceServer(
            cfg, params, batch_size=16, max_delay_s=0.05
        ) as srv:
            futs = [srv.submit(_pixels(rng, 2)) for _ in range(16)]
            for f in futs:
                f.result(timeout=60)
            assert srv.stats.batches <= 4  # 32 rows / 16-row batches (+slack)


class TestMeshServing:
    def test_mesh_server_matches_single_device(self, cfg, params):
        """A DP-mesh server (batch sharded over the conftest's 8 virtual
        devices) returns the same logits as the unsharded server."""
        from snnimageclassification_tpu.parallel import make_mesh

        rng = np.random.default_rng(9)
        x = _pixels(rng, 6)
        with InferenceServer(
            cfg, params, batch_size=16, mesh=make_mesh()
        ) as srv:
            got = srv.submit(x).result(timeout=60)
        np.testing.assert_allclose(
            got, _oracle(cfg, params, x), rtol=1e-5, atol=1e-6
        )

    def test_mesh_batch_divisibility_enforced(self, cfg, params):
        from snnimageclassification_tpu.parallel import make_mesh

        with pytest.raises(ValueError, match="multiple"):
            InferenceServer(cfg, params, batch_size=6, mesh=make_mesh())


class TestLifecycle:
    def test_submit_after_close_raises(self, cfg, params):
        srv = InferenceServer(cfg, params, batch_size=4)
        srv.close()
        with pytest.raises(RuntimeError):
            srv.submit(np.zeros(N_F, np.float32))

    def test_close_drains_pending(self, cfg, params):
        rng = np.random.default_rng(7)
        srv = InferenceServer(cfg, params, batch_size=4, max_delay_s=5.0)
        fut = srv.submit(_pixels(rng, 2))
        srv.close(drain=True)  # must not wait the 5 s delay
        assert fut.result(timeout=1).shape == (2, N_O)

    def test_close_without_drain_fails_pending(self, cfg, params):
        rng = np.random.default_rng(8)
        srv = InferenceServer(cfg, params, batch_size=64, max_delay_s=30.0)
        fut = srv.submit(_pixels(rng, 2))
        srv.close(drain=False)
        with pytest.raises(RuntimeError):
            fut.result(timeout=1)

    def test_close_idempotent(self, cfg, params):
        srv = InferenceServer(cfg, params, batch_size=4)
        srv.close()
        srv.close()

    def test_cancelled_future_does_not_wedge_server(self, cfg, params):
        """A caller cancelling a pending Future must not kill the
        completion thread: later requests still resolve."""
        rng = np.random.default_rng(10)
        with InferenceServer(
            cfg, params, batch_size=4, max_delay_s=0.2
        ) as srv:
            fut = srv.submit(_pixels(rng, 2))
            assert fut.cancel()  # pending (dispatcher still coalescing)
            x = _pixels(rng, 3)
            got = srv.submit(x).result(timeout=60)
        np.testing.assert_allclose(
            got, _oracle(cfg, params, x), rtol=1e-5, atol=1e-6
        )

    def test_bad_shape_rejected(self, cfg, params):
        with InferenceServer(cfg, params, batch_size=4) as srv:
            with pytest.raises(ValueError):
                srv.submit(np.zeros((2, N_F + 1), np.float32))
            with pytest.raises(ValueError):
                srv.submit(np.zeros((1, 2, 3), np.float32))


class TestForwardFnAndValidation:
    def test_invalid_input_scale_rejected(self, cfg, params):
        for bad in (0.0, -1.0, float("nan"), float("inf")):
            with pytest.raises(ValueError, match="input_scale"):
                InferenceServer(cfg, params, batch_size=4, input_scale=bad)

    def test_custom_forward_fn(self, cfg, params):
        """forward_fn overrides the compiled per-batch program (applied
        after the wire normalization)."""
        import jax

        enc = EncodeConfig(n_steps=cfg.int_time_steps)

        def fwd(p, x):  # softmax probabilities instead of logits
            return jax.nn.softmax(
                model_lib.forward_logits_pixels(cfg, p, x, enc), axis=-1
            )

        rng = np.random.default_rng(7)
        x = _pixels(rng, 5)
        with InferenceServer(cfg, params, batch_size=8, forward_fn=fwd) as srv:
            got = srv.submit(x).result(timeout=60)
        want = np.asarray(jax.nn.softmax(_oracle(cfg, params, x), axis=-1))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_ensemble_serve_soft_voting(self, cfg):
        """EnsembleTrainer.serve returns the seed-averaged softmax --
        identical to predict_proba on the same pixels."""
        from snnimageclassification_tpu.parallel.ensemble import EnsembleTrainer

        rng = np.random.default_rng(8)
        x = _pixels(rng, 6)
        ens = EnsembleTrainer(cfg, seeds=[0, 1, 2])
        enc = EncodeConfig(n_steps=cfg.int_time_steps)
        want = np.asarray(ens.predict_proba(x, enc))
        with ens.serve(batch_size=8) as srv:
            got = srv.submit(x).result(timeout=120)
        assert got.shape == (6, N_O)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        # classify == the ensemble's mean_proba predictions
        with ens.serve(batch_size=8) as srv:
            labels = srv.classify(x)
        np.testing.assert_array_equal(labels, ens.predict(x, enc))
