"""FITC/Nystrom inducing-point path (models/sparse.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lcgp_tpu import LCGP, datasets
from lcgp_tpu.models import basis as basis_mod
from lcgp_tpu.models import likelihood as lik
from lcgp_tpu.models import params as P
from lcgp_tpu.models import sparse


def _full_problem(q=3, p=6, n=40, d=2, seed=0):
    rng = np.random.default_rng(seed)
    xs = rng.uniform(0, 1, (n, d))
    ys = rng.standard_normal((p, n))
    ys = (ys - ys.mean(1, keepdims=True)) / ys.std(1, keepdims=True)
    b = basis_mod.init_phi(ys, q=q)
    data = lik.FullData(xs=jnp.asarray(xs), ys=jnp.asarray(ys),
                        phi=jnp.asarray(b.phi), diag_D=jnp.asarray(b.diag_D),
                        sigma_map=jnp.asarray(P.sigma_index_map([1] * p)))
    free = P.init_values(xs, ys, b.q, [1] * p)
    return data, free


class TestSelectInducing:
    def test_farthest_point_coverage(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (200, 2))
        z = sparse.select_inducing(x, 20)
        assert z.shape == (20, 2)
        # every point is within a modest distance of some inducing point
        d = np.min(np.linalg.norm(x[:, None] - z[None], axis=-1), axis=1)
        assert d.max() < 0.35

    def test_m_ge_n_returns_all(self):
        x = np.random.default_rng(1).uniform(0, 1, (5, 2))
        z = sparse.select_inducing(x, 10)
        assert z.shape == (5, 2)


class TestFitcLoss:
    def test_full_exact_when_z_is_x(self):
        """With Z = X the Nystrom term is exact and the diagonal correction
        vanishes, so the FITC loss equals the exact loss."""
        data, free = _full_problem()
        exact = float(lik.neglpost_full(free, data))
        fitc = float(sparse.neglpost_full_fitc(free, data, data.xs))
        np.testing.assert_allclose(fitc, exact, rtol=1e-6)

    def test_rep_exact_when_z_is_x(self):
        xtr, ytr, _, _ = datasets.make_rep_data_skewed(seed=3)
        m = LCGP(y=ytr, x=xtr, q=3, submethod='rep')
        exact = float(m.loss())
        fitc = float(sparse.neglpost_rep_fitc(m._free, m._data, m._data.xs))
        np.testing.assert_allclose(fitc, exact, rtol=1e-6)

    def test_full_approx_close_with_subset(self):
        data, free = _full_problem(n=60, seed=2)
        exact = float(lik.neglpost_full(free, data))
        z = sparse.select_inducing(np.asarray(data.xs), 30)
        fitc = float(sparse.neglpost_full_fitc(free, data, jnp.asarray(z)))
        # approximation, not identity — but should be in the same ballpark
        assert abs(fitc - exact) / abs(exact) < 0.2

    def test_gradient_finite(self):
        data, free = _full_problem(n=50, seed=4)
        z = jnp.asarray(sparse.select_inducing(np.asarray(data.xs), 20))
        g = jax.grad(lambda fr: sparse.neglpost_full_fitc(fr, data, z))(free)
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()


class TestFitcStreaming:
    """n-blocked streaming FITC (sparse._fitc_stream): the quad identity
    quad = b^T Lam b - sum (lam b)^2/lam_t + t^T M^{-1} t must reproduce
    the dense Woodbury path to float64 precision, block size dividing n
    or not."""

    @pytest.mark.parametrize('n_chunk', [16, 17, 53, 64])
    def test_full_loss_parity(self, n_chunk):
        data, free = _full_problem(n=53, seed=5)
        z = jnp.asarray(sparse.select_inducing(np.asarray(data.xs), 9))
        dense = float(sparse.neglpost_full_fitc(free, data, z))
        stream = float(sparse.neglpost_full_fitc(free, data, z,
                                                 n_chunk=n_chunk))
        np.testing.assert_allclose(stream, dense, rtol=1e-12)

    def test_full_grad_parity(self):
        data, free = _full_problem(n=53, seed=6)
        z = jnp.asarray(sparse.select_inducing(np.asarray(data.xs), 9))
        gd = jax.grad(lambda fr: sparse.neglpost_full_fitc(fr, data, z))(free)
        gs = jax.grad(lambda fr: sparse.neglpost_full_fitc(
            fr, data, z, n_chunk=16))(free)
        for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-12)

    def test_rep_loss_parity(self):
        xtr, ytr, _, _ = datasets.make_rep_data_skewed(seed=3)
        m = LCGP(y=ytr, x=xtr, q=3, submethod='rep', inducing=12, n_chunk=0)
        dense = float(m.loss())
        stream = float(sparse.neglpost_rep_fitc(m._free, m._data, m._z,
                                                n_chunk=7))
        np.testing.assert_allclose(stream, dense, rtol=1e-12)

    def test_aux_and_predict_parity(self):
        xtr, ytr, xte, _ = datasets.make_rep_data_skewed(seed=4)
        md = LCGP(y=ytr, x=xtr, q=3, submethod='rep', inducing=12, n_chunk=0)
        ms = LCGP(y=ytr, x=xtr, q=3, submethod='rep', inducing=12, n_chunk=7)
        ms.fit(method='adam', steps=20)
        md._free = ms._free
        md._params_version += 1
        pd = md.predict(xte)
        ps = ms.predict(xte)
        for a, b in zip(pd[:2], ps[:2]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-12)
        # dual-weight diagnostic (FitcAux.u) matches too
        np.testing.assert_allclose(np.asarray(md._aux.u),
                                   np.asarray(ms._aux.u),
                                   rtol=1e-9, atol=1e-12)

    def test_auto_policy_thresholds(self):
        # small panels stay un-chunked; a >HBM-budget panel chunks with a
        # power-of-two block bounded below by 4096
        assert LCGP._auto_n_chunk(4, 50_000, 256, 'fast') is None
        blk = LCGP._auto_n_chunk(4, 2_000_000, 512, 'fast')
        assert blk == 32768
        assert LCGP._auto_n_chunk(4, 2_000_000, 512, 'high') == 16384

    def test_saveload_keeps_n_chunk(self, tmp_path):
        xtr, ytr, _, _ = datasets.make_rep_data_skewed(seed=5)
        m = LCGP(y=ytr, x=xtr, q=3, submethod='rep', inducing=12, n_chunk=7)
        m.fit(method='adam', steps=10)
        path = str(tmp_path / 'm.npz')
        m.save(path)
        m2 = LCGP.load(path)
        assert m2.n_chunk == 7
        np.testing.assert_allclose(float(m2.loss()), float(m.loss()),
                                   rtol=0, atol=0)

    def test_f32_streaming_close(self):
        data, free = _full_problem(n=53, seed=7)
        z = jnp.asarray(sparse.select_inducing(np.asarray(data.xs), 9))
        dense = float(sparse.neglpost_full_fitc(free, data, z,
                                                compute_dtype=jnp.float32))
        stream = float(sparse.neglpost_full_fitc(
            free, data, z, compute_dtype=jnp.float32, n_chunk=16))
        f64 = float(sparse.neglpost_full_fitc(free, data, z))
        assert abs(stream - f64) / abs(f64) < 1e-4
        assert abs(stream - dense) / abs(f64) < 1e-4


class TestFitcModel:
    def _fit_pair(self, seed=5):
        xtr, ytr, xte, ytrue = datasets.make_rep_data_skewed(seed=seed)
        exact = LCGP(y=ytr, x=xtr, q=3, submethod='rep')
        fitc = LCGP(y=ytr, x=xtr, q=3, submethod='rep', inducing=20)
        return exact, fitc, xte, ytrue

    def test_fit_predict_quality(self):
        from lcgp_tpu import evaluation
        exact, fitc, xte, ytrue = self._fit_pair()
        exact.fit(method='scipy', maxiter=150)
        fitc.fit(method='scipy', maxiter=150)
        yp_e = np.asarray(exact.predict(xte)[0])
        yp_f, ypv_f, ycv_f = map(np.asarray, fitc.predict(xte))
        rmse_e = evaluation.rmse(ytrue, yp_e)
        rmse_f = evaluation.rmse(ytrue, yp_f)
        # documented tradeoff: close to exact quality at m=20 of n=40
        assert rmse_f < max(2.5 * rmse_e, 0.06)
        assert (ypv_f > 0).all()
        assert (ycv_f <= ypv_f + 1e-12).all()

    def test_loss_decreases_after_fit(self):
        _, fitc, _, _ = self._fit_pair(seed=6)
        l0 = float(fitc.loss())
        fitc.fit(method='scipy', maxiter=100)
        assert float(fitc.loss()) < l0

    def test_inducing_array_and_saveload(self, tmp_path):
        xtr, ytr, xte, _ = datasets.make_rep_data_skewed(seed=7)
        zx = np.linspace(0.05, 0.95, 15)[:, None]
        m = LCGP(y=ytr, x=xtr, q=3, submethod='rep', inducing=zx)
        assert m._z.shape == (15, 1)
        m.fit(method='scipy', maxiter=30)
        yp = np.asarray(m.predict(xte)[0])
        path = tmp_path / 'fitc.npz'
        m.save(path)
        m2 = LCGP.load(path)
        np.testing.assert_allclose(np.asarray(m2.predict(xte)[0]), yp,
                                   rtol=1e-12)

    def test_inducing_too_large_raises(self):
        xtr, ytr, _, _ = datasets.make_rep_data_1d(n_unique=8, seed=8)
        with pytest.raises(ValueError):
            LCGP(y=ytr, x=xtr, submethod='rep', inducing=1000)

    def test_aux_properties_none_or_dual(self):
        xtr, ytr, xte, _ = datasets.make_rep_data_skewed(seed=9)
        m = LCGP(y=ytr, x=xtr, q=3, submethod='rep', inducing=15)
        assert m.Tks is None and m.LTs is None and m.mks is None
        assert m.CinvMs.shape == (m.q, m.n)


class TestFitcFastPrecision:
    def test_f32_loss_close_to_f64_and_finite(self):
        xtr, ytr, xte, _ = datasets.make_rep_data_skewed(seed=15)
        hi = LCGP(y=ytr, x=xtr, q=3, submethod='rep', inducing=20)
        fa = LCGP(y=ytr, x=xtr, q=3, submethod='rep', inducing=20,
                  precision='fast')
        l_hi, l_fa = float(hi.loss()), float(fa.loss())
        assert np.isfinite(l_fa)
        np.testing.assert_allclose(l_fa, l_hi, rtol=1e-3)
        fa.fit(method='lbfgs-jax', maxiter=40)
        assert np.isfinite(float(fa.loss()))
        yp, ypv, _ = map(np.asarray, fa.predict(xte))
        assert np.isfinite(yp).all() and (ypv > 0).all()


class TestClampStatsAndRefinement:
    def _model(self, seed=61, m=12):
        rng = np.random.default_rng(seed)
        n, d, p = 120, 2, 4
        x = rng.uniform(0, 1, (n, d))
        y = np.vstack([np.sin(4 * x[:, 0]), np.cos(3 * x[:, 1]),
                       x[:, 0] * x[:, 1], (x ** 2).sum(1)])
        y = y + 0.05 * rng.standard_normal((p, n))
        from lcgp_tpu import LCGP
        return LCGP(y=y, x=x, q=3, inducing=m), x

    def test_clamp_stats_recorded(self):
        m, x = self._model()
        m.fit(method='adam', steps=20)
        m.predict(x[:10])
        st = m._fitc_clamp_stats
        assert st is not None
        assert set(st) == {'n_clamped', 'total', 'frac', 'worst'}
        assert st['total'] == 3 * 10
        assert 0 <= st['frac'] <= 1

    def test_health_check_surfaces_clamp(self):
        from lcgp_tpu.utils.diagnostics import health_check
        m, x = self._model(seed=62)
        m.fit(method='adam', steps=20)
        m.predict(x[:8])
        rep = health_check(m)
        assert 'fitc_variance_clamp' in rep['checks']
        assert 'frac' in rep['checks']['fitc_variance_clamp']

    def test_refine_inducing_improves_loss(self):
        m, x = self._model(seed=63, m=8)
        m.fit(method='adam', steps=40)
        l0 = float(m.loss())
        z0 = np.asarray(m._z).copy()
        l1 = m.refine_inducing(steps=60, learning_rate=5e-3, joint=False)
        assert not np.allclose(np.asarray(m._z), z0)   # z actually moved
        assert l1 <= l0 + 1e-9
        # joint refinement from there should not be worse either
        l2 = m.refine_inducing(steps=40, learning_rate=2e-3, joint=True)
        assert l2 <= l1 + 1e-6

    def test_refine_requires_inducing(self):
        import pytest
        from lcgp_tpu import LCGP
        rng = np.random.default_rng(64)
        x = rng.uniform(0, 1, (20, 1))
        y = np.vstack([np.sin(x[:, 0]), x[:, 0]])
        mdl = LCGP(y=y, x=x)
        with pytest.raises(ValueError, match='inducing'):
            mdl.refine_inducing()


class TestFitcMixedAux:
    def test_mixed_predict_bitwise_high(self):
        """FITC aux stays pure f64 under precision='mixed' (the refined-aux
        sentinel applies only to the full/rep dense paths — models/lcgp.py
        _ensure_aux): predictions must equal the 'high' model's exactly."""
        rng = np.random.default_rng(5)
        xtr = rng.uniform(0, 1, (80, 2))
        ytr = rng.standard_normal((4, 80))
        x0 = rng.uniform(0, 1, (7, 2))
        hi = LCGP(y=ytr, x=xtr, q=3, inducing=16, precision='high')
        mx = LCGP(y=ytr, x=xtr, q=3, inducing=16, precision='mixed')
        mx._free = hi._free
        mx._z = hi._z
        mx._params_version += 1
        ph = hi.predict(x0)
        pm = mx.predict(x0)
        for u, v in zip(pm, ph):
            np.testing.assert_array_equal(np.asarray(u), np.asarray(v))
