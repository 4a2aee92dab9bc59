"""Spike-encoder tests, ported from the reference's test/test_to_spikes.py
(same values and expected rasters), plus the golden-file fixture test and
extra batched/jit coverage.
"""
import numpy as np
import pytest

from snnimageclassification_tpu.ops.encoding import ToSpikes, encode_spikes


class TestToSpikes:
    def test_pixels_to_firing_periods_zeros(self):
        # ref: test_to_spikes.py:9-13
        transform = ToSpikes(100, 100, tau=20.0, thr=0.2, epsilon=1e-7)
        periods = transform.pixels_to_firing_periods(np.array([0.0]))
        assert np.all(np.asarray(periods) == transform.n_steps)

    def test_pixels_to_firing_periods(self):
        # ref: test_to_spikes.py:15-20
        transform = ToSpikes(100, 100, tau=20.0, thr=0.2, epsilon=1e-7)
        pix = np.array(
            [0.82352941, 0.82745098, 0.83529412, 0.8745098, 0.8627451,
             0.95294118, 0.79215686, 0.0, 0.0, 0.0]
        )
        expected = np.array([5, 5, 5, 5, 5, 4, 5, 100, 100, 100])
        got = transform.pixels_to_firing_periods(pix)
        np.testing.assert_allclose(np.asarray(got), expected)

    def test_pixels_to_firing_periods_2(self):
        # ref: test_to_spikes.py:22-30
        transform = ToSpikes(10, 10, tau=20.0, thr=0.2, epsilon=1e-7)
        pix = np.array(
            [0.8627451, 0.90980392, 0.96470588, 0.0, 0.01176471, 0.79215686,
             0.89411765, 0.87843137, 0.86666667, 0.82745098]
        )
        expected = np.array([5, 4, 4, 10, 10, 5, 5, 5, 5, 5])
        got = transform.pixels_to_firing_periods(pix)
        np.testing.assert_allclose(np.asarray(got), expected)

    def test_call(self):
        # ref: test_to_spikes.py:38-50
        transform = ToSpikes(10, 10, tau=20.0, thr=0.2, epsilon=1e-7)
        pix = np.array(
            [0.8627451, 0.90980392, 0.96470588, 0.0, 0.01176471,
             0.79215686, 0.89411765, 0.87843137, 0.86666667, 0.82745098,
             0.82745098, 0.83921569]
        )
        expected = np.zeros((10, 12))
        for t, p in zip([4, 4, 5, 5, 5, 5, 5, 5, 5, 5],
                        [1, 2, 0, 5, 6, 7, 8, 9, 10, 11]):
            expected[t, p] = 1.0
        got = np.asarray(transform(pix))
        np.testing.assert_allclose(got, expected)

    def test_firing_times_to_spikes(self):
        # ref: test_to_spikes.py:52-60
        transform = ToSpikes(10, 10, tau=20.0, thr=0.2, epsilon=1e-7)
        firing_times = np.array([5, 4, 4, 10, 10, 5, 5, 5, 5, 5, 5, 5])
        expected = np.zeros((10, 12))
        for t, p in zip([4, 4, 5, 5, 5, 5, 5, 5, 5, 5],
                        [1, 2, 0, 5, 6, 7, 8, 9, 10, 11]):
            expected[t, p] = 1.0
        got = np.asarray(transform.firing_times_to_spikes(firing_times))
        np.testing.assert_allclose(got, expected)

    def test_firing_periods_to_spikes(self):
        # ref: test_to_spikes.py:62-73 -- includes out-of-range clamping.
        transform = ToSpikes(5, 5)
        firing_periods = np.array([1, 2, transform.n_steps + 1])
        expected = np.array(
            [
                [0, 0, 0],
                [1, 0, 0],
                [1, 1, 0],
                [1, 0, 0],
                [1, 1, 1],
            ]
        )
        got = np.asarray(transform.firing_periods_to_spikes(firing_periods))
        np.testing.assert_allclose(got, expected)

    def test_call_on_real(self, fixtures_dir):
        # ref golden-file test: test_to_spikes.py:75-83.  The fixture is a
        # dict {x: (28,28) float64 raw image, spikes: (100,784) float32}.
        x_dict = np.load(
            fixtures_dir / "test_x_to_spikes.npy", allow_pickle=True
        ).item()
        transform = ToSpikes(100, 100, tau=20.0, thr=0.2, epsilon=1e-7)
        x = (np.asarray(x_dict["x"], dtype=np.float64) / 255.0).reshape(-1)
        got = np.asarray(transform(x.astype(np.float32)))
        np.testing.assert_allclose(x_dict["spikes"], got)


class TestEncodeBatched:
    """Batched/jitted encoder behavior (no reference counterpart: the
    reference encodes one sample at a time in DataLoader workers)."""

    def test_batched_matches_per_sample(self):
        rng = np.random.default_rng(0)
        x = rng.random((6, 49)).astype(np.float32)
        batched = np.asarray(encode_spikes(x, n_steps=20, tau=20.0))
        single = ToSpikes(20, tau=20.0)
        for i in range(x.shape[0]):
            np.testing.assert_allclose(batched[i], np.asarray(single(x[i])))

    def test_periodic_batched(self):
        rng = np.random.default_rng(1)
        x = rng.random((3, 16)).astype(np.float32)
        batched = np.asarray(
            encode_spikes(x, n_steps=12, use_periods=True, tau=20.0)
        )
        single = ToSpikes(12, tau=20.0, use_periods=True)
        for i in range(x.shape[0]):
            np.testing.assert_allclose(batched[i], np.asarray(single(x[i])))

    def test_degenerate_production_tau(self):
        """Quirk Q2: default tau=20e-3 collapses supra-threshold latencies
        to 0 (TTFS -> spike at t=0; sub-threshold -> t_max)."""
        x = np.array([[0.9, 0.5, 0.1]], dtype=np.float32)
        spikes = np.asarray(encode_spikes(x, n_steps=4))  # default tau
        expected = np.zeros((1, 4, 3))
        expected[0, 0, 0] = 1.0  # supra-threshold: t=0
        expected[0, 0, 1] = 1.0
        # 0.1 < thr: firing time = t_max = 4 >= n_steps -> no spike
        np.testing.assert_allclose(spikes, expected)

    def test_shapes_and_dtype(self):
        x = np.random.default_rng(2).random((5, 784)).astype(np.float32)
        spikes = encode_spikes(x, n_steps=100)
        assert spikes.shape == (5, 100, 784)
        assert str(spikes.dtype) == "float32"


class TestDeadEncoderVariants:
    """The reference's two dead periodic-raster variants (datasets.py:56-70,
    never selected by spikes_gen_func).  Oracle = a direct numpy transcription
    of each variant's semantics; our jnp versions must match wherever the
    reference code would not crash."""

    @staticmethod
    def _oracle_loop(fp, n_steps):
        spikes = np.zeros((n_steps, fp.shape[0]))
        starts = np.clip(fp, 0, n_steps - 1).astype(int)
        for i, period in enumerate(fp):
            if period == 0:
                continue  # reference raises here (np.arange step 0)
            idx = np.arange(starts[i], n_steps, step=period, dtype=int)
            spikes[idx, i] = 1.0
        return spikes

    @staticmethod
    def _oracle_clip(fp, n_steps):
        idx = np.indices((n_steps, fp.shape[0]))
        starts = np.clip(fp, 0, n_steps - 1).astype(int)
        rng = idx[0] - starts[idx[1]]
        with np.errstate(divide="ignore"):
            hits = (rng % fp[idx[1]]) == 0
        return (hits * (rng >= 0)).astype(float)

    def test_loop_matches_oracle(self):
        from snnimageclassification_tpu.ops.encoding import (
            firing_periods_to_spikes_loop,
        )
        fp = np.array([1, 2, 3, 5, 9, 10, 50, 99, 100, 200])
        got = np.asarray(firing_periods_to_spikes_loop(fp, 10))
        np.testing.assert_array_equal(got, self._oracle_loop(fp, 10))

    def test_loop_degenerate_periods(self):
        # p == 0 crashes the reference; p < 0 produces an empty arange.
        # Our jit-safe contract: zero rows for both.
        from snnimageclassification_tpu.ops.encoding import (
            firing_periods_to_spikes_loop,
        )
        fp = np.array([0, -3, 4])
        got = np.asarray(firing_periods_to_spikes_loop(fp, 8))
        assert got[:, 0].sum() == 0 and got[:, 1].sum() == 0
        np.testing.assert_array_equal(
            got[:, 2:], self._oracle_loop(np.array([4]), 8)
        )

    def test_clip_matches_oracle(self):
        from snnimageclassification_tpu.ops.encoding import (
            firing_periods_to_spikes_clip,
        )
        fp = np.array([0, 1, 2, 3, 5, 9, 10, 50, 99, 100, 200])
        got = np.asarray(firing_periods_to_spikes_clip(fp, 10))
        np.testing.assert_array_equal(got, self._oracle_clip(fp, 10))

    def test_clip_zero_period_spikes_everywhere(self):
        # numpy x % 0 == 0 -> the p==0 column is all ones from t=0.
        from snnimageclassification_tpu.ops.encoding import (
            firing_periods_to_spikes_clip,
        )
        got = np.asarray(firing_periods_to_spikes_clip(np.array([0]), 6))
        np.testing.assert_array_equal(got[:, 0], np.ones(6))

    def test_clip_negative_period_rasters_like_abs(self):
        # floored mod: t % -4 == 0 at t = 0, 4, 8 -> |p|-periodic raster.
        from snnimageclassification_tpu.ops.encoding import (
            firing_periods_to_spikes_clip,
        )
        fp = np.array([-4])
        got = np.asarray(firing_periods_to_spikes_clip(fp, 10))
        np.testing.assert_array_equal(got, self._oracle_clip(fp, 10))
        assert got[:, 0].sum() == 3

    def test_variants_agree_in_clamped_regime(self):
        # For 1 <= p <= n_steps-1 all three periodic variants coincide.
        from snnimageclassification_tpu.ops.encoding import (
            firing_periods_to_spikes,
            firing_periods_to_spikes_clip,
            firing_periods_to_spikes_loop,
        )
        fp = np.arange(1, 10)
        live = np.asarray(firing_periods_to_spikes(fp, 10))
        np.testing.assert_array_equal(
            live, np.asarray(firing_periods_to_spikes_loop(fp, 10))
        )
        np.testing.assert_array_equal(
            live, np.asarray(firing_periods_to_spikes_clip(fp, 10))
        )

    def test_tospikes_methods(self):
        ts = ToSpikes(10, 10, tau=20.0, thr=0.2, epsilon=1e-7)
        fp = np.array([2, 3, 15])
        np.testing.assert_array_equal(
            np.asarray(ts.firing_periods_to_spikes_loop(fp)),
            self._oracle_loop(fp, 10),
        )
        np.testing.assert_array_equal(
            np.asarray(ts.firing_periods_to_spikes_clip(fp)),
            self._oracle_clip(fp, 10),
        )
