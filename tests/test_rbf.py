"""Squared-exponential kernel option (extra beyond the reference)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lcgp_tpu import LCGP
from lcgp_tpu.ops.rbf import rbf_gram
from lcgp_tpu.ops.gram import gram_stack


def _np_rbf(x1, x2, lens, amp, nug, same):
    u = x1 / lens
    v = x2 / lens
    d2 = ((u[:, None, :] - v[None, :, :]) ** 2).sum(-1)
    c0 = np.exp(-0.5 * d2)
    eta = nug / (1 + nug)
    c = (1 - eta) * c0
    if same:
        c = c + eta * np.eye(x1.shape[0])
    return amp * c


class TestRbfGram:
    @pytest.mark.parametrize('same', [True, False])
    def test_matches_numpy(self, same):
        rng = np.random.default_rng(0)
        x1 = rng.uniform(0, 1, (20, 3))
        x2 = x1 if same else rng.uniform(0, 1, (15, 3))
        lens = rng.uniform(0.3, 2.0, (4, 3))
        amps = rng.uniform(0.5, 2.0, 4)
        nugs = rng.uniform(1e-5, 1e-3, 4)
        out = np.asarray(rbf_gram(x1, x2, lens, amps, nugs, same=same))
        for k in range(4):
            ref = _np_rbf(x1, x2, lens[k], amps[k], nugs[k], same)
            np.testing.assert_allclose(out[k], ref, rtol=1e-9, atol=1e-12)

    def test_spd(self):
        rng = np.random.default_rng(1)
        x = rng.uniform(0, 1, (30, 2))
        C = np.asarray(rbf_gram(x, x, np.full((1, 2), 0.5), np.ones(1),
                                np.full(1, 1e-3), same=True))[0]
        assert np.linalg.eigvalsh(C).min() > 0

    def test_gram_stack_dispatch(self):
        rng = np.random.default_rng(2)
        x = rng.uniform(0, 1, (10, 2))
        lens = np.ones((2, 2))
        out = gram_stack(x, x, lens, np.ones(2), np.full(2, 1e-4),
                         same=True, kind='rbf')
        assert out.shape == (2, 10, 10)
        with pytest.raises(ValueError):
            gram_stack(x, x, lens, np.ones(2), np.full(2, 1e-4),
                       same=True, kind='bogus')

    def test_grad_flows(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(0, 1, (12, 2)))
        lens = jnp.ones((2, 2))

        def f(l):
            return jnp.sum(rbf_gram(x, x, l, jnp.ones(2), jnp.full(2, 1e-4),
                                    same=True))

        g = jax.grad(f)(lens)
        assert np.isfinite(np.asarray(g)).all()


class TestModelWithRbf:
    def test_fit_predict(self):
        rng = np.random.default_rng(4)
        x = rng.uniform(0, 1, (40, 1))
        f = np.vstack([np.sin(5 * x[:, 0]), np.cos(4 * x[:, 0])])
        y = f + rng.normal(0, 0.05, f.shape)
        m = LCGP(y=y, x=x, kernel='rbf')
        l0 = float(m.loss())
        m.fit(maxiter=40)
        assert float(m.loss()) < l0
        yp, ypv, ycv = m.predict(x)
        assert np.isfinite(np.asarray(yp)).all()
        assert (np.asarray(ypv) > 0).all()
        # smooth function: rbf should fit well
        assert np.sqrt(np.mean((np.asarray(yp) - f) ** 2)) < 0.15

    def test_rep_with_rbf(self):
        rng = np.random.default_rng(5)
        xu = rng.uniform(0, 1, (12, 2))
        x = np.tile(xu, (2, 1))
        y = rng.standard_normal((3, 24))
        m = LCGP(y=y, x=x, submethod='rep', kernel='rbf')
        assert np.isfinite(float(m.loss()))
        yp = m.predict(xu[:5])[0]
        assert np.isfinite(np.asarray(yp)).all()

    def test_invalid_kernel(self):
        with pytest.raises(ValueError):
            LCGP(y=np.ones((2, 5)), x=np.zeros((5, 1)), kernel='laplace')

    def test_kernel_saved(self, tmp_path):
        rng = np.random.default_rng(6)
        x = rng.uniform(0, 1, (20, 1))
        y = rng.standard_normal((2, 20))
        m = LCGP(y=y, x=x, kernel='rbf')
        path = tmp_path / 'm.npz'
        m.save(path)
        m2 = LCGP.load(path)
        assert m2.kernel == 'rbf'
