"""n-sharded FITC (parallel/fitc_shard.py) on the virtual 8-device CPU
mesh: the distributed Woodbury panel must reproduce the single-device
sparse path exactly (float reordering only), through loss, gradient,
aux, predict, fit and inducing refinement.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lcgp_tpu import LCGP
from lcgp_tpu.models import sparse
from lcgp_tpu.parallel import fitc_shard, nshard

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


def _rel(a, b):
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    return float(np.max(np.abs(a - b) / np.maximum(np.abs(a), 1e-12)))


def _field(n=83, d=3, p=6, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (n, d))
    y = (np.sin(x.sum(1))[None, :] * np.linspace(1, 2, p)[:, None]
         + 0.05 * rng.standard_normal((p, n)))
    return x, y


def _rep_field(n_unique=30, reps=4, d=2, p=4, seed=1):
    rng = np.random.default_rng(seed)
    xu = rng.uniform(0, 1, (n_unique, d))
    x = np.repeat(xu, reps, axis=0)
    y = (np.cos(2 * np.pi * x[:, :1].T) * np.linspace(0.5, 2, p)[:, None]
         + 0.1 * rng.standard_normal((p, x.shape[0])))
    return x, y


@pytest.fixture(scope='module')
def mesh():
    return nshard.make_n_mesh(8)


class TestLossParity:
    def test_full_loss_and_grad(self, mesh):
        # n=83 is not divisible by 8 — exercises the padding rows
        x, y = _field(n=83)
        mod = LCGP(y=y, x=x, q=3, inducing=12)
        l1 = float(sparse.neglpost_full_fitc(mod._free, mod._data, mod._z))
        l2 = float(fitc_shard.neglpost_full_fitc_nsharded(
            mod._free, mod._data, mod._z, mesh))
        assert _rel(l1, l2) < 1e-10
        g1 = jax.grad(lambda f: sparse.neglpost_full_fitc(
            f, mod._data, mod._z))(mod._free)
        g2 = jax.grad(lambda f: fitc_shard.neglpost_full_fitc_nsharded(
            f, mod._data, mod._z, mesh))(mod._free)
        assert max(_rel(a, b) for a, b in
                   zip(jax.tree.leaves(g1), jax.tree.leaves(g2))) < 1e-8

    def test_rep_loss_and_grad(self, mesh):
        x, y = _rep_field()
        mod = LCGP(y=y, x=x, q=2, inducing=10, submethod='rep')
        l1 = float(sparse.neglpost_rep_fitc(mod._free, mod._data, mod._z))
        l2 = float(fitc_shard.neglpost_rep_fitc_nsharded(
            mod._free, mod._data, mod._z, mesh))
        assert _rel(l1, l2) < 1e-10
        g1 = jax.grad(lambda f: sparse.neglpost_rep_fitc(
            f, mod._data, mod._z))(mod._free)
        g2 = jax.grad(lambda f: fitc_shard.neglpost_rep_fitc_nsharded(
            f, mod._data, mod._z, mesh))(mod._free)
        assert max(_rel(a, b) for a, b in
                   zip(jax.tree.leaves(g1), jax.tree.leaves(g2))) < 1e-8

    def test_f32_compute_dtype(self, mesh):
        x, y = _field(n=64, seed=2)
        mod = LCGP(y=y, x=x, q=2, inducing=8)
        l1 = float(sparse.neglpost_full_fitc(
            mod._free, mod._data, mod._z, compute_dtype=jnp.float32))
        l2 = float(fitc_shard.neglpost_full_fitc_nsharded(
            mod._free, mod._data, mod._z, mesh, compute_dtype=jnp.float32))
        # identical precision recipe, sums reordered across 8 shards
        assert _rel(l1, l2) < 1e-5


class TestAuxPredictParity:
    @pytest.mark.parametrize('mode', ['full', 'rep'])
    def test_aux_fields(self, mesh, mode):
        if mode == 'rep':
            x, y = _rep_field()
            mod = LCGP(y=y, x=x, q=2, inducing=10, submethod='rep')
        else:
            x, y = _field(n=83)
            mod = LCGP(y=y, x=x, q=3, inducing=12)
        a1 = sparse.compute_aux_fitc(mod._free, mod._data, mod._z, mode)
        a2 = fitc_shard.compute_aux_fitc_nsharded(
            mod._free, mod._data, mod._z, mode, mesh)
        for f in ('Lmm', 'alpha', 'inner', 'u'):
            assert _rel(getattr(a1, f), getattr(a2, f)) < 1e-9, f
        assert a2.u.shape == a1.u.shape  # mesh padding trimmed

    def test_predict_core_consumes_sharded_aux(self, mesh):
        x, y = _field(n=83)
        mod = LCGP(y=y, x=x, q=3, inducing=12)
        a1 = sparse.compute_aux_fitc(mod._free, mod._data, mod._z, 'full')
        a2 = fitc_shard.compute_aux_fitc_nsharded(
            mod._free, mod._data, mod._z, 'full', mesh)
        x0 = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (9, 3)))
        gh1, gv1 = sparse.predict_fitc_core(mod._free, mod._data, a1,
                                            mod._z, x0)
        gh2, gv2 = sparse.predict_fitc_core(mod._free, mod._data, a2,
                                            mod._z, x0)
        assert _rel(gh1, gh2) < 1e-9
        assert _rel(gv1, gv2) < 1e-9


class TestModelIntegration:
    def test_set_mesh_accepts_fitc(self, mesh):
        x, y = _field(n=64, seed=4)
        mod = LCGP(y=y, x=x, q=2, inducing=8)
        mod.set_mesh(mesh)  # previously raised 'm-bounded'
        x1, y1 = _field(n=64, seed=4)
        ref = LCGP(y=y1, x=x1, q=2, inducing=8)
        assert _rel(float(ref.loss()), float(mod.loss())) < 1e-10

    def test_fit_predict_parity(self, mesh):
        x, y = _field(n=96, seed=5)
        m1 = LCGP(y=y, x=x, q=2, inducing=10)
        m2 = LCGP(y=y, x=x, q=2, inducing=10)
        m1.fit(method='adam', steps=40, learning_rate=5e-2)
        m2.fit(mesh=mesh, method='adam', steps=40, learning_rate=5e-2)
        assert _rel(float(m1.loss()), float(m2.loss())) < 1e-9
        x0 = np.random.default_rng(6).uniform(0, 1, (20, 3))
        p1, p2 = m1.predict(x0), m2.predict(x0)
        for a, b in zip(p1, p2):
            assert _rel(a, b) < 1e-8

    def test_comp_out_mesh_rejected_for_fitc(self):
        from lcgp_tpu import parallel
        x, y = _field(n=48, seed=8)
        mod = LCGP(y=y, x=x, q=2, inducing=8)
        co_mesh = parallel.make_mesh(n_comp=4, n_out=2)
        with pytest.raises(ValueError, match="'n',"):
            mod.fit(mesh=co_mesh, steps=2)

    def test_refine_inducing_on_mesh(self, mesh):
        x, y = _field(n=64, seed=7)
        m1 = LCGP(y=y, x=x, q=2, inducing=8)
        m2 = LCGP(y=y, x=x, q=2, inducing=8)
        m2.set_mesh(mesh)
        l1 = m1.refine_inducing(steps=5, learning_rate=1e-3)
        l2 = m2.refine_inducing(steps=5, learning_rate=1e-3)
        assert _rel(l1, l2) < 1e-9
