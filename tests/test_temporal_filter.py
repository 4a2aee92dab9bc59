"""Temporal-filter tests, ported from the reference's
test/test_temporal_filter.py (same values), plus jit coverage.
"""
import jax.numpy as jnp
import numpy as np

from snnimageclassification_tpu.ops.temporal import (
    batchwise_temporal_filter,
    temporal_max,
)


class TestTemporalFilter:
    def test_batchwise_temporal_filter(self):
        # ref: test_temporal_filter.py:8-23
        decay = 0.9
        x = jnp.asarray(
            [[[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]]]
        )
        expected = np.array(
            [
                [
                    7 + decay * (4 + decay * 1),
                    8 + decay * (5 + decay * 2),
                    9 + decay * (6 + decay * 3),
                ]
            ]
        )
        got = batchwise_temporal_filter(x, decay)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)

    def test_batchwise_temporal_filter_identity(self):
        # ref: test_temporal_filter.py:25-36 -- decay=1 is a plain time-sum.
        x = jnp.asarray(
            [[[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]]]
        )
        got = batchwise_temporal_filter(x, 1.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x.sum(axis=1)))

    def test_temporal_max(self):
        x = jnp.asarray([[[1.0, 9.0], [5.0, 2.0], [3.0, 4.0]]])
        got = temporal_max(x)
        np.testing.assert_allclose(np.asarray(got), [[5.0, 9.0]])

    def test_high_rank_trailing_dims(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 5, 3, 4)).astype(np.float32))
        got = batchwise_temporal_filter(x, 0.5)
        weights = 0.5 ** np.arange(4, -1, -1, dtype=np.float32)
        expected = (np.asarray(x) * weights[None, :, None, None]).sum(axis=1)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)
