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


class TestNShardEndToEnd:
    """VERDICT r2 #1: n-sharding as an end-to-end model capability."""

    def _xy(self, n=28, d=2, p=5, seed=0):
        rng = np.random.default_rng(seed)
        x = rng.uniform(0, 1, (n, d))
        y = np.vstack([np.sin(3 * x[:, 0]), np.cos(2 * x[:, 1]),
                       x[:, 0] * x[:, 1], x.sum(1), (x ** 2).sum(1)])
        return x, y + 0.05 * rng.standard_normal((p, n))

    def test_predict_parity_full(self):
        from lcgp_tpu import LCGP
        x, y = self._xy()
        rng = np.random.default_rng(1)
        x0 = rng.uniform(0, 1, (9, 2))
        m0 = LCGP(y=y, x=x, q=3)
        m0.fit(method='scipy', maxiter=25)
        ref = [np.asarray(a) for a in m0.predict(x0)]
        m1 = LCGP(y=y, x=x, q=3)
        m1._free = m0._free
        m1._params_version += 1
        m1.set_mesh(nshard.make_n_mesh(8))
        got = [np.asarray(a) for a in m1.predict(x0)]
        for r, g in zip(ref, got):
            np.testing.assert_allclose(g, r, rtol=1e-9, atol=1e-12)
        # loss() also routes through the n-sharded path and agrees
        np.testing.assert_allclose(float(m1.loss()), float(m0.loss()),
                                   rtol=1e-10)

    def test_predict_parity_rep(self):
        from lcgp_tpu import LCGP, datasets
        xtr, ytr, xte, _ = datasets.make_rep_data_skewed(seed=42)
        m0 = LCGP(y=ytr, x=xtr, q=3, submethod='rep')
        m0.fit(method='scipy', maxiter=25)
        ref = [np.asarray(a) for a in m0.predict(xte)]
        m1 = LCGP(y=ytr, x=xtr, q=3, submethod='rep')
        m1._free = m0._free
        m1._params_version += 1
        m1.set_mesh(nshard.make_n_mesh(8))
        got = [np.asarray(a) for a in m1.predict(xte)]
        for r, g in zip(ref, got):
            np.testing.assert_allclose(g, r, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(float(m1.loss()), float(m0.loss()),
                                   rtol=1e-10)

    def test_fit_through_api(self):
        from lcgp_tpu import LCGP
        x, y = self._xy(seed=3)
        m = LCGP(y=y, x=x, q=3)
        l0 = float(m.loss())
        m.fit(mesh=nshard.make_n_mesh(8), method='scipy', maxiter=30)
        assert float(m.loss()) < l0
        assert m._fit_result.nit > 0
        # aux accessors still work (gather+trim the padded factor)
        assert np.asarray(m.CinvMs).shape == (3, x.shape[0])
        LB = np.asarray(m.LBs)
        assert LB.shape == (3, x.shape[0], x.shape[0])
        # factor parity vs the single-device aux at the same params
        m2 = LCGP(y=y, x=x, q=3)
        m2._free = m._free
        m2._params_version += 1
        np.testing.assert_allclose(LB, np.asarray(m2.LBs),
                                   rtol=1e-9, atol=1e-12)

    def test_bad_mesh_axis_names(self):
        from lcgp_tpu import LCGP
        from jax.sharding import Mesh
        x, y = self._xy(seed=4)
        m = LCGP(y=y, x=x, q=2)
        bad = Mesh(np.array(jax.devices()[:2]), ('rows',))
        with pytest.raises(ValueError, match="axis names"):
            m.fit(mesh=bad)

    def test_backward_memory_bounded(self):
        """The custom-VJP backward must compile to a strictly smaller
        per-device temp footprint than plain autodiff through the
        unrolled distributed factorization."""
        data, free = _full_problem(q=4, p=8, n=256, d=2, seed=9)
        mesh = nshard.make_n_mesh(8)

        def temp_bytes(loss):
            c = jax.jit(jax.value_and_grad(loss)).lower(free).compile()
            return int(c.memory_analysis().temp_size_in_bytes)

        custom = temp_bytes(
            lambda fr: nshard.neglpost_full_nsharded(fr, data, mesh))
        plain = temp_bytes(
            lambda fr: nshard.neglpost_full_nsharded(fr, data, mesh,
                                                     _custom_vjp=False))
        assert custom < 0.75 * plain, (custom, plain)


class TestNShardAuxPredict:
    def test_aux_matches_single_device(self):
        from lcgp_tpu.models import predict as pred
        data, free = _full_problem(q=3, p=6, n=24, d=2, seed=11)
        mesh = nshard.make_n_mesh(8)
        aux = nshard.compute_aux_nsharded(free, data, mesh)
        ref = pred.compute_aux_full(free, data)
        n = data.xs.shape[0]
        np.testing.assert_allclose(np.asarray(aux.u)[:, :n],
                                   np.asarray(ref.CinvM),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(aux.L)[:, :n, :n],
                                   np.asarray(ref.LB), rtol=1e-9, atol=1e-12)

    def test_predict_core_matches(self):
        from lcgp_tpu.models import predict as pred
        data, free = _full_problem(q=3, p=6, n=24, d=2, seed=12)
        mesh = nshard.make_n_mesh(8)
        rng = np.random.default_rng(13)
        x0s = jnp.asarray(rng.uniform(0, 1, (7, 2)))
        aux = nshard.compute_aux_nsharded(free, data, mesh)
        ghat, gvar = nshard.predict_nsharded_core(free, data, aux, x0s, mesh)
        ref = pred.compute_aux_full(free, data)
        ghat_r, gvar_r = pred.predict_full_core(free, data, ref, x0s)
        np.testing.assert_allclose(np.asarray(ghat), np.asarray(ghat_r),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(gvar), np.asarray(gvar_r),
                                   rtol=1e-8, atol=1e-11)


class TestNShardMixedAux:
    def test_mixed_predict_bitwise_high_on_mesh(self):
        """n-sharded aux stays pure f64 under precision='mixed' (the
        refined-aux sentinel applies only to the single-device full/rep
        paths — models/lcgp.py _ensure_aux): mesh predictions of a mixed
        model must equal the 'high' mesh model's exactly."""
        from lcgp_tpu import LCGP
        rng = np.random.default_rng(7)
        x = rng.uniform(0, 1, (24, 2))
        y = rng.standard_normal((4, 24))
        x0 = rng.uniform(0, 1, (6, 2))
        hi = LCGP(y=y, x=x, q=3, precision='high')
        mx = LCGP(y=y, x=x, q=3, precision='mixed')
        mx._free = hi._free
        mx._params_version += 1
        mesh = nshard.make_n_mesh(8)
        hi.set_mesh(mesh)
        mx.set_mesh(mesh)
        ph = hi.predict(x0)
        pm = mx.predict(x0)
        for u, v in zip(pm, ph):
            np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


class TestNCMesh:
    """2-D ('comp','n') mesh: q components sharded over 'comp' groups,
    each group running the distributed-Cholesky n algorithm.  Parity
    must hold for every factorization of 8 devices, including comp
    sizes that don't divide q (component zero-padding path)."""

    @pytest.mark.parametrize('nc,nn', [(2, 4), (4, 2), (1, 8)])
    def test_full_loss_and_grad_parity(self, nc, nn):
        data, free = _full_problem(q=3, p=6, n=24, d=2, seed=3)  # 3 % 2 != 0
        mesh = nshard.make_nc_mesh(nc, nn)
        v, g = nshard.make_nsharded_value_and_grad(mesh, data)(free)
        ref_v, ref_g = jax.value_and_grad(lik.neglpost_full)(free, data)
        np.testing.assert_allclose(float(v), float(ref_v), rtol=1e-12)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-11)

    @pytest.mark.parametrize('nc,nn', [(2, 4), (4, 2)])
    def test_rep_loss_and_grad_parity(self, nc, nn):
        data, free = _rep_problem(q=3, p=6, n=20, d=2, seed=4)
        mesh = nshard.make_nc_mesh(nc, nn)
        v, g = nshard.make_nsharded_value_and_grad(mesh, data)(free)
        ref_v, ref_g = jax.value_and_grad(lik.neglpost_rep)(free, data)
        np.testing.assert_allclose(float(v), float(ref_v), rtol=1e-12)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-11)

    def test_divisible_q_no_padding(self):
        data, free = _full_problem(q=4, p=8, n=24, d=2, seed=5)
        mesh = nshard.make_nc_mesh(4, 2)
        v, _ = nshard.make_nsharded_value_and_grad(mesh, data)(free)
        ref = lik.neglpost_full(free, data)
        np.testing.assert_allclose(float(v), float(ref), rtol=1e-12)

    @pytest.mark.parametrize('kind', ['full', 'rep'])
    def test_predict_parity(self, kind):
        from lcgp_tpu.models import predict as pred
        mesh = nshard.make_nc_mesh(2, 4)
        rng = np.random.default_rng(6)
        x0s = jnp.asarray(rng.uniform(0, 1, (7, 2)))
        if kind == 'full':
            data, free = _full_problem(q=3, p=6, n=24, d=2, seed=6)
            aux_r = pred.compute_aux_full(free, data)
            gh_r, gv_r = pred.predict_full_core(free, data, aux_r, x0s)
        else:
            data, free = _rep_problem(q=3, p=6, n=24, d=2, seed=6)
            aux_r = pred.compute_aux_rep(free, data)
            gh_r, gv_r = pred.predict_rep_core(free, data, aux_r, x0s)
        aux = nshard.compute_aux_nsharded(free, data, mesh)
        gh, gv = nshard.predict_nsharded_core(free, data, aux, x0s, mesh)
        np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_r),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_r),
                                   rtol=1e-8, atol=1e-11)

    def test_fit_through_api(self):
        from lcgp_tpu import LCGP
        rng = np.random.default_rng(7)
        x = rng.uniform(0, 1, (24, 2))
        y = rng.standard_normal((5, 24))
        mesh = nshard.make_nc_mesh(2, 4)
        model = LCGP(y=y, x=x, q=3)
        model.fit(mesh=mesh, method='adam', steps=6, learning_rate=1e-2)
        x0 = rng.uniform(0, 1, (5, 2))
        yp = np.asarray(model.predict(x0)[0])
        single = LCGP(y=y, x=x, q=3)
        single._free = model._free
        single._params_version += 1
        yp_ref = np.asarray(single.predict(x0)[0])
        np.testing.assert_allclose(yp, yp_ref, rtol=1e-8, atol=1e-10)

    def test_fitc_comp_mesh_parity(self):
        """FITC losses/aux also shard q over 'comp' (parallel/fitc_shard):
        end-to-end fit+predict on the 2-D mesh matches the single-device
        FITC model at the fitted parameters."""
        from lcgp_tpu import LCGP
        rng = np.random.default_rng(8)
        x = rng.uniform(0, 1, (24, 2))
        y = rng.standard_normal((4, 24))
        mesh = nshard.make_nc_mesh(2, 4)
        model = LCGP(y=y, x=x, q=3, inducing=8)   # q=3 % comp=2 != 0
        model.fit(mesh=mesh, method='adam', steps=4, learning_rate=1e-2)
        x0 = rng.uniform(0, 1, (5, 2))
        yp = np.asarray(model.predict(x0)[0])
        single = LCGP(y=y, x=x, q=3, inducing=8)
        single._free, single._z = model._free, model._z
        single._params_version += 1
        yp_ref = np.asarray(single.predict(x0)[0])
        np.testing.assert_allclose(yp, yp_ref, rtol=1e-8, atol=1e-10)

    @pytest.mark.parametrize('kind', ['full', 'rep'])
    def test_parity_accessors_trim_q_padding(self, kind):
        """CinvMs/LBs/LTs/Ths/Tks on a ('comp','n') mesh with q % comp != 0
        must trim the neutral-component q padding (regression: the aux
        carries qp = ceil(q/comp)*comp components; accessors once returned
        the padded rows, and Ths crashed on the diag_D broadcast)."""
        from lcgp_tpu import LCGP
        rng = np.random.default_rng(11)
        n, p, q = 24, 6, 3
        x = rng.uniform(0, 1, (n, 2))
        if kind == 'full':
            y = rng.standard_normal((p, n))
            model = LCGP(y=y, x=x, q=q)
            single = LCGP(y=y, x=x, q=q)
        else:
            xr = np.repeat(x, 2, axis=0)
            yr = rng.standard_normal((p, 2 * n))
            model = LCGP(y=yr, x=xr, q=q, submethod='rep')
            single = LCGP(y=yr, x=xr, q=q, submethod='rep')
        model.set_mesh(nshard.make_nc_mesh(2, 4))
        assert model.CinvMs.shape == (q, n)
        np.testing.assert_allclose(np.asarray(model.CinvMs),
                                   np.asarray(single.CinvMs),
                                   rtol=1e-9, atol=1e-12)
        if kind == 'full':
            assert model.LBs.shape == (q, n, n)
            np.testing.assert_allclose(np.asarray(model.Ths),
                                       np.asarray(single.Ths),
                                       rtol=1e-7, atol=1e-9)
        else:
            assert model.LTs.shape == (q, n, n)
            np.testing.assert_allclose(np.asarray(model.Tks),
                                       np.asarray(single.Tks),
                                       rtol=1e-8, atol=1e-10)

    def test_fast_dtype_parity(self):
        """f32 compute on the 2-D mesh matches the single-device f32 loss
        to f32-grade tolerance."""
        data, free = _full_problem(q=3, p=6, n=24, d=2, seed=9)
        mesh = nshard.make_nc_mesh(2, 4)
        v = nshard.neglpost_full_nsharded(free, data, mesh,
                                          compute_dtype=jnp.float32,
                                          jitter=1e-6)
        ref = lik.neglpost_full(free, data, compute_dtype=jnp.float32,
                                jitter=1e-6)
        np.testing.assert_allclose(float(v), float(ref), rtol=2e-5)
