"""Verifier-walkthrough invariants (reference test_verification.py:10-341).

The reference ships an ``LCGPVerifier`` that narrates five step-by-step
checks of the rep-path pipeline; its checks are printed with loose
pass/fail thresholds.  This file is the pytest counterpart: the same five
invariants, as hard assertions, plus the full-path predict-at-training-
points check the reference omits.
"""
import numpy as np
import pytest

from lcgp_tpu import LCGP, datasets


@pytest.fixture(scope='module')
def rep_model():
    xtr, ytr, _, _ = datasets.make_rep_data_skewed(seed=42)
    return LCGP(y=ytr, x=xtr, q=3, submethod='rep')


class TestVerifierWalkthrough:
    @pytest.mark.quick
    def test_1_transformation_consistency(self, rep_model):
        """Reference test_1 (test_verification.py:37-87): manual replicate
        averages -> standardize -> inverse must round-trip to ~0."""
        m = rep_model
        y_orig = np.asarray(m.y_orig)
        x_orig = np.asarray(m.x_orig)
        x_unique, inverse = np.unique(x_orig, axis=0, return_inverse=True)
        p = y_orig.shape[0]
        ybar_manual = np.zeros((p, x_unique.shape[0]))
        for i in range(x_unique.shape[0]):
            ybar_manual[:, i] = y_orig[:, inverse == i].mean(axis=1)
        ybar_rec = (np.asarray(m.ybar_s) * np.asarray(m.ybar_std)
                    + np.asarray(m.ybar_mean))
        # the model's x_unique ordering may differ from np.unique's sort;
        # align through the coordinates
        order = np.lexsort(np.asarray(m.x_unique).T[::-1])
        ref_order = np.lexsort(x_unique.T[::-1])
        err = (np.linalg.norm(ybar_rec[:, order]
                              - ybar_manual[:, ref_order])
               / np.linalg.norm(ybar_manual))
        assert err < 1e-10

    @pytest.mark.quick
    def test_2_basis_reconstruction_full(self):
        """Reference test_2 (test_verification.py:89-135), q == p branch.

        Exact algebraic form of the invariant: with the shared convention
        phi = U sqrt(n)/s and g = phi^T Y (reference lcgp.py:479-481),
        ``phi @ diag(diag_D)^{-1} @ g`` IS the thin-SVD reconstruction
        U S V^T — the reference's narrated ``phi @ g`` only approximates Y
        when s_k^2 ~ n, so the assertion here targets the exact identity."""
        xtr, ytr, _, _ = datasets.make_rep_data_skewed(seed=7)
        p = ytr.shape[0]
        m = LCGP(y=ytr, x=xtr, q=p, submethod='rep')
        ybar_s = np.asarray(m.ybar_s)
        rec = (np.asarray(m.phi)
               @ (np.asarray(m.g) / np.asarray(m.diag_D)[:, None]))
        err = np.linalg.norm(ybar_s - rec) / np.linalg.norm(ybar_s)
        assert err < 1e-8

    @pytest.mark.quick
    def test_2_basis_reconstruction_reduced(self, rep_model):
        """Reference test_2, q < p branch: the reduced-basis reconstruction
        is the optimal rank-q truncation — its error equals the discarded
        singular-value tail energy exactly (and is < 0.5, the reference's
        sanity threshold)."""
        m = rep_model
        ybar_s = np.asarray(m.ybar_s)
        rec = (np.asarray(m.phi)
               @ (np.asarray(m.g) / np.asarray(m.diag_D)[:, None]))
        err = np.linalg.norm(ybar_s - rec) / np.linalg.norm(ybar_s)
        s = np.linalg.svd(ybar_s, compute_uv=False)
        discarded = np.sqrt(np.sum(s[int(m.q):] ** 2) / np.sum(s ** 2))
        assert err < 0.5
        # the SVD basis is optimal: error equals the discarded tail energy
        np.testing.assert_allclose(err, discarded, rtol=1e-8, atol=1e-12)

    @pytest.mark.quick
    def test_3_psi_c_computation(self, rep_model):
        """Reference test_3 (test_verification.py:138-183): psi_c equals
        phi^T scaled by sigma_inv_sqrt_std, and psi_c @ (scaled phi) = I."""
        m = rep_model
        phi = np.asarray(m.phi)
        lsig = np.asarray(m.lsigma2s)
        sigma_inv_sqrt_std = (np.exp(-0.5 * lsig)
                              * np.asarray(m.ybar_std)[:, 0])
        psi_c_manual = phi.T * sigma_inv_sqrt_std[None, :]
        psi_c = np.asarray(m.psi_c)
        err = (np.linalg.norm(psi_c - psi_c_manual)
               / np.linalg.norm(psi_c_manual))
        assert err < 1e-10
        # the exact orthogonality invariant behind the reference's printed
        # "identity-like" check: phi's columns are orthogonal with
        # phi^T phi = diag(diag_D) (basis.py convention phi = U sqrt(n)/s)
        np.testing.assert_allclose(phi.T @ phi, np.diag(np.asarray(m.diag_D)),
                                   rtol=1e-10, atol=1e-10)

    @pytest.mark.quick
    def test_4_prediction_at_training_points_rep(self, rep_model):
        """Reference test_4 (test_verification.py:185-236): the unfitted
        pipeline predicts at x_unique without error and lands within the
        reference's (loose) sanity bound; variances are positive."""
        m = rep_model
        x_test = np.asarray(m.x_unique)
        ypred, ypredvar, yconfvar = (np.asarray(a)
                                     for a in m.predict(x_test))
        assert ypred.shape == np.asarray(m.ybar).shape
        assert np.isfinite(ypred).all()
        assert (ypredvar > 0).all() and (yconfvar >= 0).all()
        ybar = np.asarray(m.ybar)
        rel = np.linalg.norm(ypred - ybar) / np.linalg.norm(ybar)
        assert rel < 10.0                      # reference threshold
        # and after fitting the interpolation must actually be close
        m2 = LCGP(y=np.asarray(m.y_orig), x=np.asarray(m.x_orig), q=3,
                  submethod='rep')
        m2.fit(method='scipy', maxiter=150)
        yp2 = np.asarray(m2.predict(x_test)[0])
        rel2 = np.linalg.norm(yp2 - ybar) / np.linalg.norm(ybar)
        assert rel2 < 0.3

    @pytest.mark.quick
    def test_4_prediction_at_training_points_full(self):
        """Full-path counterpart: fitted model reproduces the training
        response at the training sites (no replication noise to average)."""
        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, (40, 2))
        y = np.vstack([np.sin(2 * np.pi * x[:, 0]),
                       np.cos(2 * np.pi * x[:, 1]),
                       x[:, 0] * x[:, 1]])
        y = y + 0.01 * rng.standard_normal(y.shape)
        m = LCGP(y=y, x=x, q=3)
        m.fit(method='scipy', maxiter=200)
        yp, ypv, _ = (np.asarray(a) for a in m.predict(x))
        rel = np.linalg.norm(yp - y) / np.linalg.norm(y)
        assert rel < 0.1
        assert (ypv > 0).all()

    @pytest.mark.quick
    def test_5_detailed_prediction_steps(self, rep_model):
        """Reference test_5 (test_verification.py:238-298) narrates the
        one-point pipeline; here it is recomputed numerically: the model's
        predict at one training point must equal the hand-chained
        c0 @ CinvM / c00 - c0 T c0^T / psi_c recombination."""
        from lcgp_tpu.ops.matern import Matern32, matern32_diag

        m = rep_model
        idx = 0
        x0 = np.asarray(m.x_unique)[idx:idx + 1]
        x0_s = np.asarray(m.x_unique_s)[idx:idx + 1]
        xs = np.asarray(m.x_unique_s)

        CinvM = np.asarray(m.CinvMs)               # (q, n)
        Tks = np.asarray(m.Tks)                    # (q, n, n)
        psi_c = np.asarray(m.psi_c)                # (q, p)
        lLmb = np.asarray(m.lLmb)
        lLmb0 = np.asarray(m.lLmb0)
        lnug = np.asarray(m.lnugGPs)

        q = int(m.q)
        ghat = np.zeros(q)
        gvar = np.zeros(q)
        for k in range(q):
            c0k = np.asarray(Matern32(x0_s, xs, lLmb[k], lLmb0[k],
                                      lnug[k]))                  # (1, n)
            c00k = float(np.asarray(matern32_diag(
                x0_s, lLmb0[k:k + 1]))[0, 0])
            ghat[k] = float((c0k @ CinvM[k])[0])                 # mean
            gvar[k] = c00k - float((c0k @ Tks[k] @ c0k.T)[0, 0])  # variance

        # latent -> output space (reference lcgp.py:902-926: the
        # recombination matrix is Psi = phi * sqrt(sigma_used), the
        # inverse of the scaling the dual weights absorbed), then
        # inverse standardization
        std = np.asarray(m.ybar_std)[:, 0]
        mean = np.asarray(m.ybar_mean)[:, 0]
        sigma_used = np.exp(np.asarray(m.lsigma2s)) / std ** 2
        Psi = np.asarray(m.phi) * np.sqrt(sigma_used)[:, None]  # (p, q)
        predmean_std = Psi @ ghat                                # (p,)
        confvar_std = (Psi ** 2) @ gvar
        ypred_manual = predmean_std * std + mean
        yconf_manual = confvar_std * std ** 2
        ypredvar_manual = (confvar_std + sigma_used) * std ** 2
        assert psi_c.shape == (q, np.asarray(m.phi).shape[0])

        ypred, ypredvar, yconfvar = (np.asarray(a)[:, 0]
                                     for a in m.predict(x0))
        np.testing.assert_allclose(ypred, ypred_manual,
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(yconfvar, yconf_manual,
                                   rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(ypredvar, ypredvar_manual,
                                   rtol=1e-7, atol=1e-10)
