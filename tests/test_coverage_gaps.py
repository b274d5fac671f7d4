"""Behavioral edge cases mirroring the reference's tests/test_coverage_gaps.py."""
import numpy as np
import pytest

from lcgp_tpu import LCGP


def _rep_data(seed=0, n_unique=12, p=3, d=2, reps=2):
    rng = np.random.default_rng(seed)
    xu = rng.uniform(0, 1, (n_unique, d))
    x = np.tile(xu, (reps, 1))
    y = rng.standard_normal((p, n_unique * reps))
    return x, y


class TestPhiInputFallbacks:
    def test_rep_uses_ybar_s_by_default(self):
        x, y = _rep_data()
        m = LCGP(y=y, x=x, submethod='rep')
        src = np.asarray(m._get_phi_input())
        np.testing.assert_allclose(src, np.asarray(m.ybar_s))

    def test_rep_non_standardized_uses_ybar(self):
        x, y = _rep_data(1)
        m = LCGP(y=y, x=x, submethod='rep', rep_standardize_ybar=False)
        # rep_standardize_ybar=False: ybar_s exists but the flag wins
        src = np.asarray(m._get_phi_input())
        np.testing.assert_allclose(src, np.asarray(m.ybar))

    def test_full_uses_y(self):
        rng = np.random.default_rng(2)
        x = rng.uniform(0, 1, (20, 1))
        y = rng.standard_normal((2, 20))
        m = LCGP(y=y, x=x)
        np.testing.assert_allclose(np.asarray(m._get_phi_input()),
                                   np.asarray(m.y))

    def test_rep_fallback_after_ybar_s_deleted(self):
        x, y = _rep_data(3)
        m = LCGP(y=y, x=x, submethod='rep')
        del m.ybar_s
        np.testing.assert_allclose(np.asarray(m._get_phi_input()),
                                   np.asarray(m.ybar))
        del m.ybar
        np.testing.assert_allclose(np.asarray(m._get_phi_input()),
                                   np.asarray(m.y))


class TestAuxRefresh:
    def test_force_recompute_full(self):
        rng = np.random.default_rng(4)
        x = rng.uniform(0, 1, (25, 1))
        y = rng.standard_normal((2, 25))
        m = LCGP(y=y, x=x)
        c1 = np.asarray(m.CinvMs)
        m.compute_aux_predictive_quantities()
        c2 = np.asarray(m.CinvMs)
        np.testing.assert_allclose(c1, c2)
        # param change invalidates
        m.set_params(lLmb0=np.asarray(m.lLmb0) * 1.5)
        c3 = np.asarray(m.CinvMs)
        assert not np.allclose(c1, c3)

    def test_rep_aux_attributes(self):
        x, y = _rep_data(5)
        m = LCGP(y=y, x=x, submethod='rep')
        assert m.Tks is not None and m.Tks.shape == (m.q, m.n, m.n)
        assert m.mks.shape == (m.q, m.n)
        assert m.psi_c.shape == (m.q, int(m.p))
        assert m.Ths is None  # full-path-only attribute

    def test_full_aux_attributes(self):
        rng = np.random.default_rng(6)
        x = rng.uniform(0, 1, (20, 1))
        y = rng.standard_normal((2, 20))
        m = LCGP(y=y, x=x)
        assert m.Tks is None
        assert m.mks is None
        assert m.Ths.shape == (m.q, 20, 20)

    def test_Ths_is_reference_matrix(self):
        """Ths must be the reference's Th_k (symmetric sqrt of
        D_k (I + D_k C_k)^{-1}, lcgp.py:709-715), not an internal factor."""
        rng = np.random.default_rng(60)
        x = rng.uniform(0, 1, (15, 1))
        y = rng.standard_normal((2, 15))
        m = LCGP(y=y, x=x)
        Th = np.asarray(m.Ths)
        # symmetric, and Th^2 == D (I + D C)^{-1}
        np.testing.assert_allclose(Th, np.swapaxes(Th, -1, -2), atol=1e-10)
        LB = np.asarray(m.LBs)
        for k in range(m.q):
            B = LB[k] @ LB[k].T
            expect = float(m.diag_D[k]) * np.linalg.inv(B)
            np.testing.assert_allclose(Th[k] @ Th[k], expect,
                                       rtol=1e-8, atol=1e-10)

    def test_Tks_is_reference_matrix(self):
        """Tks must equal C^{-1} - C^{-1}(C^{-1}+d_k R)^{-1}C^{-1}
        (reference lcgp.py:783-788) == (C + (d_k R)^{-1})^{-1}."""
        x, y = _rep_data(61)
        m = LCGP(y=y, x=x, submethod='rep')
        T = np.asarray(m.Tks)
        LT = np.asarray(m.LTs)
        for k in range(m.q):
            A = LT[k] @ LT[k].T            # C_k + diag(1/(d_k r))
            np.testing.assert_allclose(T[k], np.linalg.inv(A),
                                       rtol=1e-8, atol=1e-10)

    def test_tx_y_rep_mode(self):
        x, y = _rep_data(62)
        m = LCGP(y=y, x=x, submethod='rep')
        back = np.asarray(m.tx_y(m.ybar_s))
        np.testing.assert_allclose(back, np.asarray(m.ybar), atol=1e-10)
        m2 = LCGP(y=y, x=x, submethod='rep', rep_standardize_ybar=False)
        same = np.asarray(m2.tx_y(m2.ybar))
        np.testing.assert_allclose(same, np.asarray(m2.ybar), atol=1e-12)


class TestCombinedFlags:
    @pytest.mark.parametrize('robust', [True, False])
    @pytest.mark.parametrize('use_std', [True, False])
    def test_rep_flag_grid_finite(self, robust, use_std):
        x, y = _rep_data(7)
        m = LCGP(y=y, x=x, submethod='rep', robust_mean=robust,
                 rep_standardize_ybar=use_std)
        assert np.isfinite(float(m.loss()))
        yp, ypv, ycv = m.predict(x[:5])
        assert np.isfinite(np.asarray(yp)).all()
        assert (np.asarray(ypv) > 0).all()

    def test_predict_dispatch_keyerror(self):
        rng = np.random.default_rng(8)
        x = rng.uniform(0, 1, (15, 1))
        y = rng.standard_normal((2, 15))
        m = LCGP(y=y, x=x)
        m.submethod = 'bogus'  # simulate corrupted state
        with pytest.raises(KeyError):
            m.predict(x[:2])
