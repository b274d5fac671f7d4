import numpy as np
import pytest

from lcgp_tpu.models import transforms as tx

# pre-commit smoke set: oracle-parity + model-API (pytest -m quick, <3 min)
pytestmark = pytest.mark.quick


class TestStandardizeX:
    @pytest.mark.parametrize('n,d', [(30, 1), (50, 2), (100, 3)])
    def test_range_zero_one(self, n, d):
        rng = np.random.default_rng(42)
        x = rng.uniform(-5, 5, (n, d))
        xs, x_min, x_max = tx.standardize_x(x)
        xs = np.asarray(xs)
        assert xs.min() >= -1e-9 and xs.max() <= 1 + 1e-9
        assert xs.shape == (n, d)
        np.testing.assert_allclose(np.asarray(x_min), x.min(axis=0))

    def test_invertible(self):
        rng = np.random.default_rng(1)
        x = rng.uniform(-3, 7, (20, 2))
        xs, mn, mx = tx.standardize_x(x)
        back = np.asarray(xs) * (np.asarray(mx) - np.asarray(mn)) + np.asarray(mn)
        np.testing.assert_allclose(back, x, atol=1e-12)

    def test_xnorm_positive_and_exact(self):
        rng = np.random.default_rng(7)
        x = rng.uniform(0, 1, (30, 2))
        xn = tx.xnorm(x)
        assert (xn > 0).all()
        # brute-force check against the reference definition (lcgp.py:304-310)
        for j in range(2):
            dist = np.abs(x[:, j][:, None] - x[:, j][None, :])
            expected = dist[dist > 0].mean()
            np.testing.assert_allclose(xn[j], expected, rtol=1e-12)

    def test_xnorm_blocked_matches_unblocked(self):
        rng = np.random.default_rng(9)
        x = rng.uniform(0, 1, (53, 2))
        np.testing.assert_allclose(tx.xnorm(x, block=7), tx.xnorm(x, block=10_000),
                                   rtol=1e-12)


class TestCenterSpread:
    def test_robust_is_median_mad(self):
        rng = np.random.default_rng(0)
        y = rng.standard_normal((3, 101))
        c, s = tx.center_spread(y, robust=True)
        np.testing.assert_allclose(np.asarray(c)[:, 0], np.median(y, axis=1),
                                   rtol=1e-12)
        mad = np.median(np.abs(y - np.median(y, axis=1, keepdims=True)), axis=1)
        np.testing.assert_allclose(np.asarray(s)[:, 0], mad, rtol=1e-12)

    def test_nonrobust_is_mean_std(self):
        rng = np.random.default_rng(0)
        y = rng.standard_normal((3, 50))
        c, s = tx.center_spread(y, robust=False)
        np.testing.assert_allclose(np.asarray(c)[:, 0], y.mean(axis=1), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(s)[:, 0], y.std(axis=1), rtol=1e-12)

    def test_floor_zero_spread(self):
        y = np.vstack([np.ones(10), np.arange(10.0)])
        _, s = tx.center_spread(y, robust=False, floor_zero_spread=True)
        assert np.asarray(s)[0, 0] == 1.0
        assert np.asarray(s)[1, 0] > 0

    @pytest.mark.parametrize('robust', [True, False])
    def test_standardize_y_roundtrip(self, robust):
        rng = np.random.default_rng(5)
        y = rng.standard_normal((4, 60)) * 3 + 1
        ys, c, s = tx.standardize_y(y, robust)
        back = np.asarray(ys) * np.asarray(s) + np.asarray(c)
        np.testing.assert_allclose(back, y, atol=1e-10)
        row_spread = np.asarray(ys).std(axis=1)
        assert (row_spread > 0.1).all()
