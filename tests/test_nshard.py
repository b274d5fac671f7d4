"""n-axis sharded distributed Cholesky / solve / loss (parallel/nshard.py)
on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lcgp_tpu.models import basis as basis_mod
from lcgp_tpu.models import likelihood as lik
from lcgp_tpu.models import params as P
from lcgp_tpu.parallel import nshard


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


def _spd_stack(q=3, n=32, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((q, n, 8))
    M = A @ np.swapaxes(A, -1, -2) + 5.0 * np.eye(n)
    return jnp.asarray(M)


def _full_problem(q=4, p=8, n=24, d=2, seed=0):
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


class TestDistChol:
    def test_matches_dense_cholesky(self):
        mesh = nshard.make_n_mesh(8)
        M = _spd_stack(q=3, n=32)
        L = np.asarray(nshard.dist_cholesky(mesh, M))
        L_ref = np.asarray(jnp.linalg.cholesky(M))
        np.testing.assert_allclose(L, L_ref, rtol=1e-10, atol=1e-12)

    def test_solve_matches_dense(self):
        mesh = nshard.make_n_mesh(8)
        M = _spd_stack(q=2, n=40, seed=1)
        rng = np.random.default_rng(2)
        b = jnp.asarray(rng.standard_normal((2, 40)))
        L = nshard.dist_cholesky(mesh, M)
        x = np.asarray(nshard.dist_cho_solve_vec(mesh, L, b))
        x_ref = np.asarray(jnp.linalg.solve(M, b[..., None])[..., 0])
        np.testing.assert_allclose(x, x_ref, rtol=1e-9, atol=1e-11)

    def test_logdet_matches_dense(self):
        mesh = nshard.make_n_mesh(8)
        M = _spd_stack(q=3, n=24, seed=3)
        L = nshard.dist_cholesky(mesh, M)
        ld = np.asarray(nshard.dist_chol_logdet(mesh, L))
        _, ld_ref = np.linalg.slogdet(np.asarray(M))
        np.testing.assert_allclose(ld, ld_ref, rtol=1e-10)

    def test_smaller_mesh(self):
        mesh = nshard.make_n_mesh(4)
        M = _spd_stack(q=1, n=16, seed=4)
        L = np.asarray(nshard.dist_cholesky(mesh, M))
        np.testing.assert_allclose(L, np.linalg.cholesky(np.asarray(M)),
                                   rtol=1e-10, atol=1e-12)


class TestNShardedLoss:
    def test_matches_single_device(self):
        data, free = _full_problem(n=24)      # 24 -> padded to 32 over 8
        mesh = nshard.make_n_mesh(8)
        expected = float(lik.neglpost_full(free, data))
        got = float(nshard.neglpost_full_nsharded(free, data, mesh))
        np.testing.assert_allclose(got, expected, rtol=1e-10)

    def test_divisible_n(self):
        data, free = _full_problem(n=32, seed=5)
        mesh = nshard.make_n_mesh(8)
        expected = float(lik.neglpost_full(free, data))
        got = float(nshard.neglpost_full_nsharded(free, data, mesh))
        np.testing.assert_allclose(got, expected, rtol=1e-10)

    def test_gradient_matches(self):
        data, free = _full_problem(n=24, seed=6)
        mesh = nshard.make_n_mesh(8)
        vg = nshard.make_nsharded_value_and_grad(mesh, data)
        v, g = vg(free)
        g_ref = jax.grad(lambda fr: lik.neglpost_full(fr, data))(free)
        np.testing.assert_allclose(float(v),
                                   float(lik.neglpost_full(free, data)),
                                   rtol=1e-10)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-7, atol=1e-9)

    def test_fast_dtype_path(self):
        data, free = _full_problem(n=32, seed=7)
        mesh = nshard.make_n_mesh(8)
        got = float(nshard.neglpost_full_nsharded(
            free, data, mesh, compute_dtype=jnp.float32, jitter=1e-6))
        expected = float(lik.neglpost_full(free, data,
                                           compute_dtype=jnp.float32,
                                           jitter=1e-6))
        np.testing.assert_allclose(got, expected, rtol=2e-4)


def _rep_problem(q=3, p=6, n=20, d=2, seed=0):
    rng = np.random.default_rng(seed)
    xu = rng.uniform(0, 1, (n, d))
    ybar = rng.standard_normal((p, n))
    r = rng.integers(1, 5, n).astype(np.float64)
    b = basis_mod.init_phi(ybar, q=q)
    data = lik.RepData(xs=jnp.asarray(xu), ybar=jnp.asarray(ybar),
                       scale=jnp.ones(p), r=jnp.asarray(r),
                       phi=jnp.asarray(b.phi), diag_D=jnp.asarray(b.diag_D),
                       sigma_map=jnp.asarray(P.sigma_index_map([1] * p)))
    free = P.init_values(xu, ybar, b.q, [1] * p)
    return data, free


class TestNShardedRepLoss:
    def test_matches_single_device(self):
        data, free = _rep_problem(n=20)       # 20 -> padded to 24 over 8
        mesh = nshard.make_n_mesh(8)
        expected = float(lik.neglpost_rep(free, data))
        got = float(nshard.neglpost_rep_nsharded(free, data, mesh))
        np.testing.assert_allclose(got, expected, rtol=1e-10)

    def test_gradient_matches(self):
        data, free = _rep_problem(n=24, seed=1)
        mesh = nshard.make_n_mesh(8)
        vg = nshard.make_nsharded_value_and_grad(mesh, data)
        v, g = vg(free)
        np.testing.assert_allclose(float(v),
                                   float(lik.neglpost_rep(free, data)),
                                   rtol=1e-10)
        g_ref = jax.grad(lambda fr: lik.neglpost_rep(fr, data))(free)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-7, atol=1e-9)

    def test_fast_jitter_path(self):
        data, free = _rep_problem(n=32, seed=2)
        mesh = nshard.make_n_mesh(8)
        got = float(nshard.neglpost_rep_nsharded(
            free, data, mesh, compute_dtype=jnp.float32, jitter=1e-6))
        expected = float(lik.neglpost_rep(free, data,
                                          compute_dtype=jnp.float32,
                                          jitter=1e-6))
        np.testing.assert_allclose(got, expected, rtol=2e-4)
