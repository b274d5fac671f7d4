import numpy as np
import pytest

from lcgp_tpu import LCGP


def _problem(seed=0, n=35):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (n, 1))
    f = np.vstack([np.sin(5 * x[:, 0]), x[:, 0] ** 2])
    y = f + rng.normal(0, 0.05, f.shape)
    return x, y


class TestFitMethods:
    def test_scipy_default(self):
        x, y = _problem(0)
        m = LCGP(y=y, x=x)
        l0 = float(m.loss())
        m.fit()
        assert float(m.loss()) < l0
        assert m._fit_result.nit > 0

    def test_adam(self):
        x, y = _problem(1)
        m = LCGP(y=y, x=x)
        l0 = float(m.loss())
        m.fit(method='adam', steps=100, learning_rate=5e-2)
        assert float(m.loss()) < l0

    def test_lbfgs_jax(self):
        x, y = _problem(2)
        m = LCGP(y=y, x=x)
        l0 = float(m.loss())
        m.fit(method='lbfgs-jax', maxiter=100)
        assert float(m.loss()) < l0

    def test_unknown_method(self):
        x, y = _problem(3)
        m = LCGP(y=y, x=x)
        with pytest.raises(ValueError):
            m.fit(method='sgd-magic')

    def test_scipy_and_jax_lbfgs_agree(self):
        """Two independent optimizers should reach comparable optima."""
        x, y = _problem(4)
        m1 = LCGP(y=y, x=x)
        m1.fit()
        m2 = LCGP(y=y, x=x)
        m2.fit(method='lbfgs-jax', maxiter=300)
        l1, l2 = float(m1.loss()), float(m2.loss())
        assert abs(l1 - l2) < 0.05 * (1 + min(abs(l1), abs(l2)))

    def test_verbose_prints(self, capsys):
        x, y = _problem(5)
        m = LCGP(y=y, x=x)
        m.fit(verbose=True, maxiter=3)
        out = capsys.readouterr().out
        assert 'loss' in out


class TestHybridFit:
    def test_hybrid_improves_loss(self):
        import numpy as np
        from lcgp_tpu import LCGP, datasets
        xtr, ytr, xte, ytrue = datasets.make_rep_data_skewed(seed=31)
        m = LCGP(y=ytr, x=xtr, q=3, submethod='rep')
        l0 = float(m.loss())
        m.fit(method='hybrid', maxiter=80, polish_maxiter=20)
        l1 = float(m.loss())
        assert l1 < l0
        from lcgp_tpu import evaluation
        yp = np.asarray(m.predict(xte)[0])
        assert evaluation.rmse(ytrue, yp) < 0.1


class TestCheckpointing:
    def test_checkpoint_and_restore(self, tmp_path):
        import numpy as np
        from lcgp_tpu import LCGP, datasets
        xtr, ytr, _, _ = datasets.make_rep_data_skewed(seed=33)
        path = str(tmp_path / 'ckpt.npz')

        m = LCGP(y=ytr, x=xtr, q=3, submethod='rep')
        m.fit(method='adam', steps=40, block_steps=10, checkpoint_path=path)
        fitted = np.asarray(m._free.lLmb)

        m2 = LCGP(y=ytr, x=xtr, q=3, submethod='rep')
        step, loss = m2.restore_checkpoint(path)
        assert step == 40 and np.isfinite(loss)
        np.testing.assert_allclose(np.asarray(m2._free.lLmb), fitted)

    def test_scipy_checkpoint_callback(self, tmp_path):
        import numpy as np
        from lcgp_tpu import LCGP, datasets
        xtr, ytr, _, _ = datasets.make_rep_data_1d(n_unique=8, seed=34)
        path = str(tmp_path / 'c2.npz')
        m = LCGP(y=ytr, x=xtr, submethod='rep')
        m.fit(method='scipy', maxiter=15, checkpoint_path=path)
        m2 = LCGP(y=ytr, x=xtr, submethod='rep')
        step, loss = m2.restore_checkpoint(path)
        assert step >= 1 and np.isfinite(loss)

    def test_lbfgs_jax_checkpoint(self, tmp_path):
        import numpy as np
        from lcgp_tpu import LCGP, datasets
        xtr, ytr, _, _ = datasets.make_rep_data_1d(n_unique=10, seed=35)
        path = str(tmp_path / 'c3.npz')
        m = LCGP(y=ytr, x=xtr, submethod='rep')
        m.fit(method='lbfgs-jax', maxiter=20, block_iters=10,
              checkpoint_path=path)
        z = np.load(path)
        assert np.isfinite(float(z['loss']))


class TestStopReason:
    def test_plateau_stop_scipy(self):
        from lcgp_tpu.fit.scipy_lbfgs import minimize_lbfgs
        import jax.numpy as jnp

        def rosen(p):
            x = p['x']
            return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                           + (1 - x[:-1]) ** 2)

        p0 = {'x': jnp.zeros(6)}
        res = minimize_lbfgs(rosen, p0, plateau_patience=3,
                             plateau_rtol=1e-2)
        assert res.stop_reason in ('plateau', 'gtol')
        assert res.nit < 100          # the loose plateau bites early

    def test_cap_stop_reported(self):
        from lcgp_tpu.fit.scipy_lbfgs import minimize_lbfgs
        import jax.numpy as jnp

        def rosen(p):
            x = p['x']
            return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                           + (1 - x[:-1]) ** 2)

        res = minimize_lbfgs(rosen, {'x': jnp.zeros(6)}, maxiter=3)
        assert res.stop_reason == 'cap'

    def test_lbfgs_jax_plateau(self):
        from lcgp_tpu.fit.optax_fit import minimize_lbfgs_jax
        import jax.numpy as jnp

        def rosen(p):
            x = p['x']
            return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                           + (1 - x[:-1]) ** 2)

        res = minimize_lbfgs_jax(rosen, {'x': jnp.zeros(6)}, maxiter=500,
                                 block_iters=10, plateau_rtol=1e-2)
        assert res.stop_reason in ('plateau', 'gtol')

    def test_fit_cap_announced(self, capsys):
        from lcgp_tpu import LCGP
        x, y = _problem(7)
        m = LCGP(y=y, x=x)
        m.fit(method='scipy', maxiter=2)
        if m._fit_result.stop_reason == 'cap':
            assert 'iteration cap' in capsys.readouterr().out


class TestCheckpointPathNormalization:
    def test_suffixless_path_roundtrips(self, tmp_path):
        """np.savez appends '.npz'; restore must find the file anyway
        (ADVICE r2 finding, reproduced before the fix)."""
        from lcgp_tpu import LCGP, datasets
        xtr, ytr, _, _ = datasets.make_rep_data_1d(n_unique=8, seed=36)
        path = str(tmp_path / 'ckpt')        # no suffix
        m = LCGP(y=ytr, x=xtr, submethod='rep')
        m.fit(method='adam', steps=10, block_steps=5, checkpoint_path=path)
        m2 = LCGP(y=ytr, x=xtr, submethod='rep')
        step, loss = m2.restore_checkpoint(path)
        assert step == 10 and np.isfinite(loss)


class TestLazyXnorm:
    def test_construction_skips_xnorm(self, monkeypatch):
        """Constructing must not run the O(n^2) xnorm host loop; the
        property computes it on first access (VERDICT r2 weak #5)."""
        from lcgp_tpu.models import transforms as tx
        x, y = _problem(8)
        calls = []
        orig = tx.xnorm
        monkeypatch.setattr(tx, 'xnorm',
                            lambda *a, **k: calls.append(1) or orig(*a, **k))
        m = LCGP(y=y, x=x)
        assert not calls                      # lazy: untouched at ctor
        xn = np.asarray(m.xnorm)
        assert calls and xn.shape == (1,) and (xn > 0).all()
        np.testing.assert_allclose(xn, orig(x))
        _ = m.xnorm
        assert len(calls) == 1                # cached


class TestPlateauTracker:
    """The one early-stop rule shared by the lbfgs-jax loop and
    parallel.fit_sharded (fit/optax_fit.PlateauTracker)."""

    def test_monotone_trips_at_patience_one(self):
        from lcgp_tpu.fit.optax_fit import PlateauTracker
        t = PlateauTracker(1e-3, patience=1)
        assert not t.update(100.0)       # first value: infinite improvement
        assert not t.update(50.0)        # big improvement
        assert t.update(49.9999)         # below rtol -> plateau

    def test_oscillation_needs_patience(self):
        from lcgp_tpu.fit.optax_fit import PlateauTracker
        t = PlateauTracker(1e-3, patience=3)
        assert not t.update(100.0)
        assert not t.update(50.0)
        assert not t.update(51.0)        # worse than best: stale 1
        assert not t.update(50.5)        # stale 2
        assert not t.update(45.0)        # real improvement resets
        assert not t.update(45.2)
        assert not t.update(45.1)
        assert t.update(45.05)           # third consecutive stale block

    def test_disabled_and_nonfinite(self):
        from lcgp_tpu.fit.optax_fit import PlateauTracker
        t = PlateauTracker(None)
        assert not any(t.update(v) for v in [1.0, 1.0, 1.0, 1.0])
        t2 = PlateauTracker(1e-3)
        assert not t2.update(float('nan'))
        assert not t2.update(float('inf'))
