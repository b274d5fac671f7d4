import numpy as np

from lcgp_tpu import evaluation


class TestMetrics:
    def test_rmse_zero_on_identical(self):
        y = np.random.default_rng(0).standard_normal((3, 20))
        assert evaluation.rmse(y, y.copy()) == 0.0

    def test_rmse_value(self):
        y = np.zeros((1, 4))
        yhat = np.full((1, 4), 2.0)
        assert evaluation.rmse(y, yhat) == 2.0

    def test_normalized_rmse(self):
        rng = np.random.default_rng(1)
        y = rng.uniform(0, 10, (2, 50))
        yhat = y + 0.1
        val = evaluation.normalized_rmse(y, yhat)
        assert 0 < val < 0.1

    def test_dss_diag_and_full_agree_on_diagonal_cov(self):
        rng = np.random.default_rng(2)
        p, n = 3, 10
        y = rng.standard_normal((p, n))
        mu = y + 0.1 * rng.standard_normal((p, n))
        var = np.abs(rng.uniform(0.5, 1.5, (p, n)))
        full = np.zeros((p, p, n))
        for i in range(n):
            full[:, :, i] = np.diag(var[:, i])
        d_diag = evaluation.dss(y, mu, var, use_diag=True)
        d_full = evaluation.dss(y, mu, full, use_diag=False)
        np.testing.assert_allclose(d_diag, d_full, rtol=1e-10)

    def test_intervalstats(self):
        rng = np.random.default_rng(3)
        y = rng.standard_normal((2, 1000))
        mu = np.zeros_like(y)
        var = np.ones_like(y)
        cov, length = evaluation.intervalstats(y, mu, var)
        assert 0.93 < cov < 0.97          # ~95% nominal
        np.testing.assert_allclose(length, 2 * 1.959964 * 1.0, rtol=1e-3)

    def test_interval_coverage_bounds(self):
        y = np.array([[0.0, 10.0]])
        mu = np.zeros((1, 2))
        var = np.ones((1, 2)) * 0.01
        cov, _ = evaluation.intervalstats(y, mu, var)
        assert cov == 0.5

    def test_dss_fullcov_matches_per_point_oracle(self):
        """Vectorized full-cov DSS == looped log|S| + r^T S^{-1} r
        (reference evaluation.py:25-48 semantics) on dense covariances."""
        rng = np.random.default_rng(5)
        p, n = 4, 17
        y = rng.standard_normal((p, n))
        mu = y + 0.2 * rng.standard_normal((p, n))
        full = np.zeros((p, p, n))
        for i in range(n):
            a = rng.standard_normal((p, p))
            full[:, :, i] = a @ a.T + 0.5 * np.eye(p)
        expected = 0.0
        for i in range(n):
            r = y[:, i] - mu[:, i]
            s = full[:, :, i]
            expected += np.linalg.slogdet(s)[1] + r @ np.linalg.solve(s, r)
        expected /= n
        got = evaluation.dss(y, mu, full, use_diag=False)
        np.testing.assert_allclose(got, expected, rtol=1e-12)

    def test_dss_fullcov_fast_at_scale(self):
        import time
        rng = np.random.default_rng(6)
        p, n = 3, 10_000
        y = rng.standard_normal((p, n))
        full = np.broadcast_to(np.eye(p)[:, :, None], (p, p, n)).copy()
        t0 = time.perf_counter()
        val = evaluation.dss(y, np.zeros_like(y), full, use_diag=False)
        assert time.perf_counter() - t0 < 2.0   # vectorized, not a py-loop
        assert np.isfinite(val)

    def test_normalized_rmse_options(self):
        rng = np.random.default_rng(7)
        y = rng.uniform(0, 5, (3, 40))
        yhat = y + 0.05
        pooled = evaluation.normalized_rmse(y, yhat)
        per_out = evaluation.normalized_rmse(y, yhat,
                                             aggregate='mean_per_output')
        by_std = evaluation.normalized_rmse(y, yhat, method='std')
        assert pooled > 0 and per_out > 0 and by_std > 0
        # constant shift: scaled residual is 0.05/scale per output; the
        # pooled rms and the mean of per-output rms then agree exactly
        np.testing.assert_allclose(
            per_out, np.mean(0.05 / np.ptp(y, axis=1)), rtol=1e-12)

    def test_dss_diag_per_entry_is_per_point_over_p(self):
        rng = np.random.default_rng(8)
        p, n = 5, 30
        y = rng.standard_normal((p, n))
        mu = y + 0.1
        var = rng.uniform(0.5, 2.0, (p, n))
        pp = evaluation.dss(y, mu, var, use_diag=True)
        pe = evaluation.dss(y, mu, var, use_diag=True, aggregate='per_entry')
        np.testing.assert_allclose(pe, pp / p, rtol=1e-12)

    def test_intervalstats_z_and_level(self):
        rng = np.random.default_rng(9)
        y = rng.standard_normal((2, 2000))
        mu = np.zeros_like(y)
        var = np.ones_like(y)
        cov90, len90 = evaluation.intervalstats(y, mu, var, level=0.90)
        cov95, len95 = evaluation.intervalstats(y, mu, var)
        assert cov90 < cov95 and len90 < len95
        cov_z, len_z = evaluation.intervalstats(y, mu, var, z=1.96)
        np.testing.assert_allclose(len_z, 2 * 1.96, rtol=1e-12)
