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
