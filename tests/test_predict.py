"""Predictive-path parity vs the oracle (which mirrors the reference's
eigh / explicit-inverse computations) + distributional sanity invariants."""
import numpy as np
import pytest

import jax.numpy as jnp

from lcgp_tpu.models import predict as pred
import oracle
from test_likelihood import _full_setup, _rep_setup

# pre-commit smoke set: oracle-parity + model-API (pytest -m quick, <3 min)
pytestmark = pytest.mark.quick


def _x0(seed, n0, d):
    return np.random.default_rng(seed + 100).uniform(-0.1, 1.1, (n0, d))


class TestPredictFull:
    @pytest.mark.parametrize('seed,n,d,p,q,err', [
        (0, 30, 2, 4, None, None),
        (1, 25, 1, 3, 2, None),
        (2, 40, 3, 5, 3, [2, 2, 1]),
    ])
    def test_matches_oracle(self, seed, n, d, p, q, err):
        data, free, (lLmb, lLmb0, lsig, lnug), b, xs, ys, err = _full_setup(
            seed, n, d, p, q, err)
        x0s = _x0(seed, 13, d)
        ymean = np.zeros((p, 1))
        ystd = np.ones((p, 1))

        aux = pred.compute_aux_full(free, data)
        ghat, gvar = pred.predict_full_core(free, data, aux, jnp.asarray(x0s))
        ypred, ypredvar, yconfvar = pred.recombine_full(
            free, data, ghat, gvar, jnp.asarray(ymean), jnp.asarray(ystd))

        ref = oracle.predict_full_np(lLmb, lLmb0, lsig, lnug, xs, ys, b.phi,
                                     b.diag_D, err, ymean, ystd, x0s)
        np.testing.assert_allclose(np.asarray(ypred), ref[0], rtol=1e-8,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(ypredvar), ref[1], rtol=1e-7,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(yconfvar), ref[2], rtol=1e-7,
                                   atol=1e-10)

    def test_fullcov_diag_equals_predvar(self, ):
        data, free, (lLmb, lLmb0, lsig, lnug), b, xs, ys, err = _full_setup(
            0, 30, 2, 4)
        x0s = _x0(0, 7, 2)
        aux = pred.compute_aux_full(free, data)
        ghat, gvar = pred.predict_full_core(free, data, aux, jnp.asarray(x0s))
        p = ys.shape[0]
        ymean, ystd = jnp.zeros((p, 1)), jnp.full((p, 1), 1.7)
        _, ypredvar, _ = pred.recombine_full(free, data, ghat, gvar, ymean, ystd)
        cov = pred.fullcov_full(free, data, gvar, ystd)
        np.testing.assert_allclose(
            np.diagonal(np.asarray(cov), axis1=1, axis2=2).T,
            np.asarray(ypredvar), rtol=1e-8)
        # symmetric PSD
        c = np.asarray(cov)
        np.testing.assert_allclose(c, np.transpose(c, (0, 2, 1)), atol=1e-12)
        assert min(np.linalg.eigvalsh(ci).min() for ci in c) > -1e-10

    def test_variance_invariants(self):
        data, free, *_ = _full_setup(7, 35, 2, 4)
        x0s = _x0(7, 21, 2)
        aux = pred.compute_aux_full(free, data)
        ghat, gvar = pred.predict_full_core(free, data, aux, jnp.asarray(x0s))
        p = 4
        ymean, ystd = jnp.zeros((p, 1)), jnp.ones((p, 1))
        _, ypredvar, yconfvar = pred.recombine_full(free, data, ghat, gvar,
                                                    ymean, ystd)
        assert (np.asarray(gvar) > -1e-10).all()
        assert (np.asarray(ypredvar) > 0).all()
        assert (np.asarray(yconfvar) <= np.asarray(ypredvar) + 1e-12).all()

    def test_fits_training_points(self):
        """Posterior mean at training inputs tracks smooth data well.

        Note: the LCGP parameterization fixes the latent posterior precision
        at diag_D (independent of sigma; reference lcgp.py:654, 705), so
        noise->0 does NOT imply exact interpolation — shrinkage is governed
        by diag_D and the kernel amplitude.  We assert a sanity bound, not
        interpolation."""
        rng = np.random.default_rng(11)
        xs = rng.uniform(0, 1, (40, 1))
        f = np.vstack([np.sin(4 * xs[:, 0]), np.cos(3 * xs[:, 0])])
        from lcgp_tpu.models import basis as basis_mod, params as P, likelihood as lik
        b = basis_mod.init_phi(f)
        data = lik.FullData(xs=jnp.asarray(xs), ys=jnp.asarray(f),
                            phi=jnp.asarray(b.phi),
                            diag_D=jnp.asarray(b.diag_D),
                            sigma_map=jnp.asarray(P.sigma_index_map([1, 1])))
        free = P.unconstrain(jnp.full((b.q, 1), 0.3), jnp.ones(b.q),
                             jnp.full(2, np.log(1e-6)), jnp.full(b.q, 1e-6))
        aux = pred.compute_aux_full(free, data)
        ghat, gvar = pred.predict_full_core(free, data, aux, jnp.asarray(xs))
        ypred, _, _ = pred.recombine_full(free, data, ghat, gvar,
                                          jnp.zeros((2, 1)), jnp.ones((2, 1)))
        # function scale is O(0.7); posterior mean should be far closer
        assert np.sqrt(np.mean((np.asarray(ypred) - f) ** 2)) < 0.1


class TestPredictRep:
    @pytest.mark.parametrize('seed,use_std,err', [
        (0, True, None),
        (1, False, None),
        (2, True, [2, 1]),
    ])
    def test_matches_oracle(self, seed, use_std, err):
        (data, free, (lLmb, lLmb0, lsig, lnug), b, xu, y_used, scale, r,
         ybar_mean, ybar_std, err) = _rep_setup(seed, use_std=use_std, err=err)
        d = xu.shape[1]
        x0s = _x0(seed, 11, d)

        aux = pred.compute_aux_rep(free, data)
        ghat, gvar = pred.predict_rep_core(free, data, aux, jnp.asarray(x0s))
        mean = jnp.asarray(ybar_mean) if use_std else jnp.zeros_like(jnp.asarray(ybar_mean))
        std = jnp.asarray(ybar_std) if use_std else jnp.ones_like(jnp.asarray(ybar_std))
        ypred, ypredvar, yconfvar = pred.recombine_rep(free, data, ghat, gvar,
                                                       mean, std)

        ref = oracle.predict_rep_np(lLmb, lLmb0, lsig, lnug, xu, y_used,
                                    scale, r, b.phi, b.diag_D, err,
                                    ybar_mean, ybar_std, use_std, x0s)
        np.testing.assert_allclose(np.asarray(ypred), ref[0], rtol=1e-7,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(ypredvar), ref[1], rtol=1e-6,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(yconfvar), ref[2], rtol=1e-6,
                                   atol=1e-9)

    def test_psi_c_correct_when_q_lt_p(self):
        """The reference's psi_c broadcasts wrongly when q != p
        (lcgp.py:754); ours must equal phi^T * sigma_inv_sqrt_used."""
        (data, free, (lLmb, lLmb0, lsig, lnug), b, xu, y_used, scale, r,
         *_ ) = _rep_setup(9, p=4)
        aux = pred.compute_aux_rep(free, data)
        sigma_inv_sqrt_used = scale / np.sqrt(np.exp(
            oracle.expand_sigma_np(lsig, [1, 1, 1, 1])))
        np.testing.assert_allclose(np.asarray(aux.psi_c),
                                   b.phi.T * sigma_inv_sqrt_used[None, :],
                                   rtol=1e-10)


class TestQChunkedPredict:
    """Chunked aux/predict must equal unchunked exactly (the f64 aux at the
    headline scale exceeds HBM unchunked — round-3 find)."""

    def test_full_aux_and_core_chunked_equal(self):
        import jax.numpy as jnp
        import numpy as np
        from lcgp_tpu.models import basis as basis_mod
        from lcgp_tpu.models import likelihood as lik
        from lcgp_tpu.models import params as P
        from lcgp_tpu.models import predict as pred
        rng = np.random.default_rng(31)
        n, d, p, q = 24, 2, 6, 4
        xs = rng.uniform(0, 1, (n, d))
        ys = rng.standard_normal((p, n))
        b = basis_mod.init_phi(ys, q=q)
        data = lik.FullData(xs=jnp.asarray(xs), ys=jnp.asarray(ys),
                            phi=jnp.asarray(b.phi),
                            diag_D=jnp.asarray(b.diag_D),
                            sigma_map=jnp.asarray(P.sigma_index_map([1] * p)))
        free = P.init_values(xs, ys, q, [1] * p)
        x0s = jnp.asarray(rng.uniform(0, 1, (7, d)))
        a0 = pred.compute_aux_full(free, data)
        a2 = pred.compute_aux_full(free, data, q_chunk=2)
        np.testing.assert_array_equal(np.asarray(a0.CinvM),
                                      np.asarray(a2.CinvM))
        np.testing.assert_array_equal(np.asarray(a0.LB), np.asarray(a2.LB))
        g0 = pred.predict_full_core(free, data, a0, x0s)
        g2 = pred.predict_full_core(free, data, a2, x0s, q_chunk=2)
        for u, v in zip(g0, g2):
            np.testing.assert_array_equal(np.asarray(u), np.asarray(v))

    def test_model_level_chunked_predict_equal(self):
        import numpy as np
        from lcgp_tpu import LCGP
        rng = np.random.default_rng(32)
        x = rng.uniform(0, 1, (30, 2))
        xr = np.vstack([x, x[:10]])
        y = rng.standard_normal((4, 40))
        x0 = rng.uniform(0, 1, (9, 2))
        for sub in ('full', 'rep'):
            m1 = LCGP(y=y, x=xr, q=4, submethod=sub)
            m2 = LCGP(y=y, x=xr, q=4, submethod=sub, q_chunk=2)
            m2._free = m1._free
            m2._params_version += 1
            p1 = m1.predict(x0)
            p2 = m2.predict(x0)
            for u, v in zip(p1, p2):
                np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                           rtol=1e-12, atol=1e-14)


class TestMixedAux:
    """precision='mixed' predictive aux: the refined factorization must give
    f64-grade predictions (round-4; see models/lcgp.py _ensure_aux).  The
    factorands are the training targets (I + D C, C + Lam) whose refined
    factors carry the validated <=1e-8 accuracy class."""

    def test_aux_full_mixed_matches_f64(self):
        data, free, _, b, xs, ys, err = _full_setup(0, 30, 2, 4)
        x0s = jnp.asarray(_x0(0, 11, 2))
        aux64 = pred.compute_aux_full(free, data)
        auxmx = pred.compute_aux_full(free, data, compute_dtype='mixed')
        np.testing.assert_allclose(np.asarray(auxmx.CinvM),
                                   np.asarray(aux64.CinvM),
                                   rtol=1e-9, atol=1e-11)
        g64 = pred.predict_full_core(free, data, aux64, x0s)
        gmx = pred.predict_full_core(free, data, auxmx, x0s,
                                     compute_dtype='mixed')
        np.testing.assert_allclose(np.asarray(gmx[0]), np.asarray(g64[0]),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(gmx[1]), np.asarray(g64[1]),
                                   rtol=1e-7, atol=1e-10)

    def test_aux_rep_mixed_matches_f64(self):
        data, free, *_ = _rep_setup(1, 20, 2, 3)
        d = int(data.xs.shape[1])
        x0s = jnp.asarray(_x0(1, 9, d))
        aux64 = pred.compute_aux_rep(free, data)
        auxmx = pred.compute_aux_rep(free, data, compute_dtype='mixed')
        np.testing.assert_allclose(np.asarray(auxmx.CinvM),
                                   np.asarray(aux64.CinvM),
                                   rtol=1e-9, atol=1e-11)
        g64 = pred.predict_rep_core(free, data, aux64, x0s)
        gmx = pred.predict_rep_core(free, data, auxmx, x0s,
                                    compute_dtype='mixed')
        np.testing.assert_allclose(np.asarray(gmx[0]), np.asarray(g64[0]),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(gmx[1]), np.asarray(g64[1]),
                                   rtol=1e-7, atol=1e-10)

    def test_model_level_mixed_predict_matches_high(self):
        from lcgp_tpu import LCGP
        rng = np.random.default_rng(33)
        x = rng.uniform(0, 1, (40, 2))
        y = rng.standard_normal((4, 40))
        x0 = rng.uniform(0, 1, (9, 2))
        for sub in ('full', 'rep'):
            mh = LCGP(y=y, x=x, q=3, submethod=sub, precision='high')
            mm = LCGP(y=y, x=x, q=3, submethod=sub, precision='mixed')
            mm._free = mh._free
            mm._params_version += 1
            ph = mh.predict(x0)
            pm = mm.predict(x0)
            for u, v in zip(pm, ph):
                np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                           rtol=1e-7, atol=1e-9)
