import numpy as np
import pytest

import jax.numpy as jnp

from lcgp_tpu.ops.matern import Matern32, matern32_gram, matern32_diag
from oracle import matern32_np

# pre-commit smoke set: oracle-parity + model-API (pytest -m quick, <3 min)
pytestmark = pytest.mark.quick


class TestValues:
    def test_1d_formula(self):
        """Hand-computed Matérn 3/2 product form at a few points."""
        x1 = np.array([[0.0], [1.0]])
        x2 = np.array([[0.5]])
        l, amp, nug = 2.0, 1.5, 1e-4
        out = np.asarray(matern32_gram(x1, x2, np.array([[l]]),
                                       np.array([amp]), np.array([nug]),
                                       same=False))[0]
        s = np.abs(np.array([[0.0], [1.0]]) - 0.5) / l
        expected = amp * (1 - nug / (1 + nug)) * (1 + s) * np.exp(-s)
        np.testing.assert_allclose(out, expected, rtol=1e-14)

    @pytest.mark.parametrize('d', [1, 2, 5])
    @pytest.mark.parametrize('same', [True, False])
    def test_matches_oracle(self, d, same):
        rng = np.random.default_rng(d)
        x1 = rng.uniform(0, 1, (17, d))
        x2 = x1 if same else rng.uniform(0, 1, (9, d))
        llmb = rng.uniform(0.3, 3.0, d)
        llmb0, lnug = 1.7, 3e-3
        ours = np.asarray(matern32_gram(x1, x2, llmb[None], np.array([llmb0]),
                                        np.array([lnug]), same=same))[0]
        ref = matern32_np(x1, x2, llmb, llmb0, lnug, same=same)
        np.testing.assert_allclose(ours, ref, rtol=1e-13)

    def test_batched_consistent_with_single(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (11, 3))
        lens = rng.uniform(0.5, 2.0, (4, 3))
        amps = rng.uniform(0.5, 2.0, 4)
        nugs = rng.uniform(1e-5, 1e-3, 4)
        stack = np.asarray(matern32_gram(x, x, lens, amps, nugs, same=True))
        for k in range(4):
            single = np.asarray(matern32_gram(x, x, lens[k][None], amps[k][None],
                                              nugs[k][None], same=True))[0]
            np.testing.assert_allclose(stack[k], single, rtol=1e-14)

    def test_nugget_only_on_same(self):
        x = np.array([[0.0], [1.0]])
        nug = 0.01
        same = np.asarray(matern32_gram(x, x, np.array([[1.0]]),
                                        np.array([1.0]), np.array([nug]),
                                        same=True))[0]
        cross = np.asarray(matern32_gram(x, x.copy(), np.array([[1.0]]),
                                         np.array([1.0]), np.array([nug]),
                                         same=False))[0]
        eta = nug / (1 + nug)
        np.testing.assert_allclose(same - cross, eta * np.eye(2), atol=1e-15)
        # cross diagonal is shrunk: (1-eta) * 1 at distance 0
        np.testing.assert_allclose(np.diag(cross), (1 - eta) * np.ones(2),
                                   rtol=1e-14)

    def test_spd(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, (40, 2))
        C = np.asarray(matern32_gram(x, x, np.array([[0.7, 1.3]]),
                                     np.array([2.0]), np.array([1e-3]),
                                     same=True))[0]
        w = np.linalg.eigvalsh(C)
        assert w.min() > 0


class TestPublicAPI:
    """Reference signature behaviors (reference covmat.py:5-55, tests/test_cov.py)."""

    def test_matern_1d_pair(self):
        x1 = np.linspace(0, 1, 40).reshape(40, 1)
        x2 = np.linspace(0, 1, 25).reshape(25, 1)
        out = Matern32(x1=x1, x2=x2, llmb=1.0, llmb0=1.0, lnug=np.exp(-12.0))
        assert out.shape == (40, 25)

    def test_diag(self):
        x1 = np.linspace(0, 1, 40).reshape(40, 1)
        out = Matern32(x1, x1, llmb=1.0, llmb0=2.5, lnug=np.exp(-12.0),
                       diag_only=True)
        np.testing.assert_allclose(np.asarray(out), 2.5 * np.ones(40))

    def test_diag_requires_same(self):
        x1 = np.linspace(0, 1, 40).reshape(40, 1)
        with pytest.raises(AssertionError):
            Matern32(x1, x1 + 0.5, llmb=1.0, llmb0=1.0, lnug=1e-4,
                     diag_only=True)

    def test_invalid_1d_input(self):
        x = np.linspace(0, 1, 40)
        with pytest.raises(AssertionError):
            Matern32(x1=x, x2=x, llmb=1.0, llmb0=1.0, lnug=1e-4)

    def test_dim_mismatch(self):
        with pytest.raises(AssertionError):
            Matern32(x1=np.zeros((4, 2)), x2=np.zeros((4, 3)),
                     llmb=np.ones(2), llmb0=1.0, lnug=1e-4)

    def test_equal_values_get_nugget(self):
        x = np.linspace(0, 1, 10).reshape(10, 1)
        C_same = np.asarray(Matern32(x, x.copy(), llmb=1.0, llmb0=1.0, lnug=0.01))
        C_diff = np.asarray(Matern32(x, x + 1e-9, llmb=1.0, llmb0=1.0, lnug=0.01))
        eta = 0.01 / 1.01
        assert np.allclose(np.diag(C_same), (1 - eta) + eta)
        assert np.diag(C_diff).max() < 1.0 - eta / 2

    def test_float64(self):
        x = np.linspace(0, 1, 8).reshape(8, 1)
        assert Matern32(x, x, 1.0, 1.0, 1e-4).dtype == jnp.float64

    def test_diag_batched(self):
        out = matern32_diag(np.zeros((7, 2)), np.array([1.0, 3.0]))
        assert out.shape == (2, 7)
        np.testing.assert_allclose(np.asarray(out)[1], 3.0)


class TestC0Reuse:
    """gram_stack(want_c0=True) + gram_vjp(c0=) must equal the rebuild
    path exactly — the gradient-in-forward losses rely on it."""

    @pytest.mark.parametrize('kind', ['matern32', 'matern52', 'rbf'])
    def test_vjp_with_c0_matches_rebuild(self, kind):
        from lcgp_tpu.ops.gram import gram_stack, gram_vjp
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.uniform(0, 1, (13, 3)))
        lens = jnp.asarray(rng.uniform(0.5, 2.0, (2, 3)))
        amps = jnp.asarray([1.3, 0.8])
        nugs = jnp.asarray([1e-3, 1e-2])
        cbar = jnp.asarray(rng.standard_normal((2, 13, 13)))

        C, c0 = gram_stack(x, x, lens, amps, nugs, same=True, kind=kind,
                           want_c0=True)
        C_plain = gram_stack(x, x, lens, amps, nugs, same=True, kind=kind)
        np.testing.assert_array_equal(np.asarray(C), np.asarray(C_plain))

        with_c0 = gram_vjp(x, x, lens, amps, nugs, same=True, cbar=cbar,
                           kind=kind, c0=c0)
        rebuilt = gram_vjp(x, x, lens, amps, nugs, same=True, cbar=cbar,
                           kind=kind)
        for a, b in zip(with_c0, rebuilt):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-14, atol=1e-14)
