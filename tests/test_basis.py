import numpy as np
import pytest

from lcgp_tpu.models import basis as B

# pre-commit smoke set: oracle-parity + model-API (pytest -m quick, <3 min)
pytestmark = pytest.mark.quick


class TestBasis:
    def test_phi_orthogonality(self):
        rng = np.random.default_rng(0)
        y = rng.standard_normal((5, 40))
        b = B.init_phi(y, q=3)
        # phi^T phi = diag(D) (reference convention, lcgp.py:479-480)
        np.testing.assert_allclose(b.phi.T @ b.phi, np.diag(b.diag_D),
                                   atol=1e-10)
        n = 40
        s = np.linalg.svd(y, compute_uv=False)
        np.testing.assert_allclose(b.diag_D, n / s[:3] ** 2, rtol=1e-10)

    def test_g_is_projection(self):
        rng = np.random.default_rng(1)
        y = rng.standard_normal((4, 30))
        b = B.init_phi(y)
        np.testing.assert_allclose(b.g, b.phi.T @ y, rtol=1e-12)
        assert b.q == 4

    def test_reconstruction_full_q(self):
        """With q = p, Y = pinv(phi^T) g reconstructs (phi has full column
        relevance)."""
        rng = np.random.default_rng(2)
        y = rng.standard_normal((3, 25))
        b = B.init_phi(y)
        y_rec = np.linalg.pinv(b.phi.T) @ b.g
        np.testing.assert_allclose(y_rec, y, atol=1e-8)

    def test_latent_variance_near_one(self):
        """sqrt(n)/s scaling gives ~unit-variance latents for centered data."""
        rng = np.random.default_rng(3)
        y = rng.standard_normal((3, 500))
        y = y - y.mean(axis=1, keepdims=True)
        b = B.init_phi(y)
        assert np.all(b.g_var > 0.5) and np.all(b.g_var < 1.5)

    def test_q_selection_threshold(self):
        rng = np.random.default_rng(4)
        # construct Y with one dominant direction
        u = rng.standard_normal((6, 1))
        y = u @ rng.standard_normal((1, 50)) + 1e-3 * rng.standard_normal((6, 50))
        b = B.init_phi(y, var_threshold=0.9)
        assert b.q == 1
        b2 = B.init_phi(y, var_threshold=1.0 - 1e-15)
        assert b2.q >= 1

    def test_q_and_threshold_exclusive(self):
        with pytest.raises(ValueError):
            B.init_phi(np.zeros((3, 10)), q=2, var_threshold=0.9)

    def test_q_too_large(self):
        rng = np.random.default_rng(5)
        with pytest.raises(ValueError):
            B.init_phi(rng.standard_normal((5, 3)), q=4)

    def test_select_q_default_p(self):
        assert B.select_q(np.ones(3), p=3, q=None, var_threshold=None) == 3
