"""Pallas Matérn kernel correctness in interpreter mode (runs on CPU; the
same kernels compile on TPU via Mosaic — covered by the TPU drive)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lcgp_tpu.ops import matern as m
from lcgp_tpu.ops import matern_pallas as mp


@pytest.fixture(autouse=True)
def interpret_mode():
    os.environ['LCGP_TPU_PALLAS_INTERPRET'] = '1'
    yield
    os.environ.pop('LCGP_TPU_PALLAS_INTERPRET', None)


def _inputs(seed=0, n1=300, n2=280, d=3, q=4):
    rng = np.random.default_rng(seed)
    x1 = jnp.asarray(rng.uniform(0, 1, (n1, d)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, (n2, d)), jnp.float32)
    lens = jnp.asarray(rng.uniform(.3, 2, (q, d)), jnp.float32)
    amps = jnp.asarray(rng.uniform(.5, 2, q), jnp.float32)
    nugs = jnp.asarray(rng.uniform(1e-4, 1e-2, q), jnp.float32)
    return x1, x2, lens, amps, nugs


class TestForward:
    @pytest.mark.parametrize('same', [False, True])
    def test_matches_jnp(self, same):
        x1, x2, lens, amps, nugs = _inputs()
        xa, xb = (x1, x1) if same else (x1, x2)
        out = mp.matern32_gram_pallas(xa, xb, lens, amps, nugs, same)
        ref = m.matern32_gram(xa, xb, lens, amps, nugs, same=same)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_nondivisible_shapes(self):
        """Tile padding must not contaminate real outputs."""
        x1, x2, lens, amps, nugs = _inputs(n1=257, n2=129, d=2, q=2)
        out = mp.matern32_gram_pallas(x1, x2, lens, amps, nugs, False)
        ref = m.matern32_gram(x1, x2, lens, amps, nugs, same=False)
        assert out.shape == (2, 257, 129)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_1d_input(self):
        x1, _, lens, amps, nugs = _inputs(n1=260, d=1, q=3)
        out = mp.matern32_gram_pallas(x1, x1, lens, amps, nugs, True)
        ref = m.matern32_gram(x1, x1, lens, amps, nugs, same=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)


class TestBackward:
    def test_vjp_matches_jnp_autodiff(self):
        x1, _, lens, amps, nugs = _inputs(n1=290, d=3, q=3)
        rng = np.random.default_rng(1)
        gbar = jnp.asarray(rng.standard_normal((3, 290, 290)), jnp.float32)

        def loss_pal(l, a, nn):
            return jnp.sum(mp.matern32_gram_pallas(x1, x1, l, a, nn, True)
                           * gbar)

        def loss_jnp(l, a, nn):
            return jnp.sum(m.matern32_gram(x1, x1, l, a, nn, same=True)
                           * gbar)

        gp = jax.grad(loss_pal, argnums=(0, 1, 2))(lens, amps, nugs)
        gr = jax.grad(loss_jnp, argnums=(0, 1, 2))(lens, amps, nugs)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-3, atol=1e-4)

    def test_cross_vjp(self):
        x1, x2, lens, amps, nugs = _inputs(n1=280, n2=260, d=2, q=2)
        rng = np.random.default_rng(2)
        gbar = jnp.asarray(rng.standard_normal((2, 280, 260)), jnp.float32)

        def loss_pal(l):
            return jnp.sum(mp.matern32_gram_pallas(x1, x2, l, amps, nugs,
                                                   False) * gbar)

        def loss_jnp(l):
            return jnp.sum(m.matern32_gram(x1, x2, l, amps, nugs, same=False)
                           * gbar)

        gp = jax.grad(loss_pal)(lens)
        gr = jax.grad(loss_jnp)(lens)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=3e-3, atol=1e-4)


class TestQBlocking:
    def test_q_larger_than_block(self):
        """q > QBLOCK exercises the q-tiling + padding path."""
        x1, _, _, _, _ = _inputs(n1=270, d=2, q=1)
        rng = np.random.default_rng(5)
        q = 10  # qb=8 -> padded to 16
        lens = jnp.asarray(rng.uniform(.3, 2, (q, 2)), jnp.float32)
        amps = jnp.asarray(rng.uniform(.5, 2, q), jnp.float32)
        nugs = jnp.asarray(rng.uniform(1e-4, 1e-2, q), jnp.float32)
        out = mp.matern32_gram_pallas(x1, x1, lens, amps, nugs, True)
        ref = m.matern32_gram(x1, x1, lens, amps, nugs, same=True)
        assert out.shape == (q, 270, 270)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_q_padding_backward(self):
        x1, _, _, _, _ = _inputs(n1=260, d=2, q=1)
        rng = np.random.default_rng(6)
        q = 9
        lens = jnp.asarray(rng.uniform(.3, 2, (q, 2)), jnp.float32)
        amps = jnp.asarray(rng.uniform(.5, 2, q), jnp.float32)
        nugs = jnp.asarray(rng.uniform(1e-4, 1e-2, q), jnp.float32)
        gbar = jnp.asarray(rng.standard_normal((q, 260, 260)), jnp.float32)

        def loss_pal(l):
            return jnp.sum(mp.matern32_gram_pallas(x1, x1, l, amps, nugs,
                                                   True) * gbar)

        def loss_jnp(l):
            return jnp.sum(m.matern32_gram(x1, x1, l, amps, nugs, same=True)
                           * gbar)

        gp = jax.grad(loss_pal)(lens)
        gr = jax.grad(loss_jnp)(lens)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=3e-3, atol=1e-4)
