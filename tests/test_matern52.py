"""Matérn 5/2 kernel option (extra beyond the reference)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lcgp_tpu import LCGP
from lcgp_tpu.ops.matern52 import matern52_gram, matern52_gram_vjp
from lcgp_tpu.ops.gram import gram_stack, gram_vjp

A = np.sqrt(5.0)


def _np_m52(x1, x2, lens, amp, nug, same):
    u = x1 / lens
    v = x2 / lens
    s = np.abs(u[:, None, :] - v[None, :, :])
    c0 = np.prod(1 + A * s + (5 / 3) * s ** 2, axis=-1) * \
        np.exp(-A * s.sum(-1))
    eta = nug / (1 + nug)
    c = (1 - eta) * c0
    if same:
        c = c + eta * np.eye(x1.shape[0])
    return amp * c


class TestMatern52Gram:
    @pytest.mark.parametrize('same', [True, False])
    def test_matches_numpy(self, same):
        rng = np.random.default_rng(0)
        x1 = rng.uniform(0, 1, (18, 3))
        x2 = x1 if same else rng.uniform(0, 1, (14, 3))
        lens = rng.uniform(0.3, 2.0, (4, 3))
        amps = rng.uniform(0.5, 2.0, 4)
        nugs = rng.uniform(1e-5, 1e-3, 4)
        out = np.asarray(matern52_gram(x1, x2, lens, amps, nugs, same=same))
        for k in range(4):
            ref = _np_m52(x1, x2, lens[k], amps[k], nugs[k], same)
            np.testing.assert_allclose(out[k], ref, rtol=1e-9, atol=1e-12)

    def test_spd_and_smoother_than_m32(self):
        from lcgp_tpu.ops.matern import matern32_gram
        rng = np.random.default_rng(1)
        x = rng.uniform(0, 1, (30, 2))
        lens = np.full((1, 2), 0.5)
        C52 = np.asarray(matern52_gram(x, x, lens, np.ones(1),
                                       np.full(1, 1e-3), same=True))[0]
        C32 = np.asarray(matern32_gram(x, x, lens, np.ones(1),
                                       np.full(1, 1e-3), same=True))[0]
        assert np.linalg.eigvalsh(C52).min() > 0
        # the 1-D factors differ: (1+a s+a^2 s^2/3)e^{-a s} with a=sqrt(5)
        # decays faster in s than (1+s)e^{-s}, so the 5/2 Gram carries
        # less off-diagonal mass at these lengthscales
        mask = ~np.eye(30, dtype=bool)
        assert C52[mask].mean() < C32[mask].mean()
        assert not np.allclose(C52, C32)

    @pytest.mark.parametrize('same', [True, False])
    def test_vjp_matches_autodiff(self, same):
        rng = np.random.default_rng(2)
        x1 = jnp.asarray(rng.uniform(0, 1, (12, 2)))
        x2 = x1 if same else jnp.asarray(rng.uniform(0, 1, (9, 2)))
        lens = jnp.asarray(rng.uniform(0.4, 1.5, (3, 2)))
        amps = jnp.asarray(rng.uniform(0.5, 2.0, 3))
        nugs = jnp.asarray(rng.uniform(1e-4, 1e-2, 3))
        cbar = jnp.asarray(rng.standard_normal((3, x1.shape[0], x2.shape[0])))

        def f(lens_, amps_, nugs_):
            return jnp.sum(cbar * matern52_gram(x1, x2, lens_, amps_, nugs_,
                                                same=same))

        g_ad = jax.grad(f, argnums=(0, 1, 2))(lens, amps, nugs)
        g_an = matern52_gram_vjp(x1, x2, lens, amps, nugs, same=same,
                                 cbar=cbar)
        for a, b in zip(g_ad, g_an):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-8, atol=1e-10)

    def test_dispatch(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, (10, 2))
        out = gram_stack(x, x, np.ones((2, 2)), np.ones(2),
                         np.full(2, 1e-4), same=True, kind='matern52')
        assert out.shape == (2, 10, 10)
        g = gram_vjp(x, x, np.ones((2, 2)), np.ones(2), np.full(2, 1e-4),
                     same=True, cbar=jnp.ones((2, 10, 10)), kind='matern52')
        assert g[0].shape == (2, 2)


class TestModelWithMatern52:
    def test_fit_predict_and_saveload(self, tmp_path):
        rng = np.random.default_rng(4)
        x = rng.uniform(0, 1, (40, 1))
        f = np.vstack([np.sin(5 * x[:, 0]), np.cos(4 * x[:, 0])])
        y = f + rng.normal(0, 0.05, f.shape)
        m = LCGP(y=y, x=x, kernel='matern52')
        l0 = float(m.loss())
        m.fit(maxiter=40)
        assert float(m.loss()) < l0
        yp, ypv, _ = m.predict(x)
        assert np.isfinite(np.asarray(yp)).all()
        assert np.sqrt(np.mean((np.asarray(yp) - f) ** 2)) < 0.15
        path = tmp_path / 'm52.npz'
        m.save(path)
        assert LCGP.load(path).kernel == 'matern52'
