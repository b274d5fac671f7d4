import numpy as np

import jax.numpy as jnp

from lcgp_tpu.runner import LCGPRun
from lcgp_tpu.utils import timed, log_compiles
from lcgp_tpu import datasets


class TestRunner:
    def test_define_train_predict(self):
        xtr, ytr, xte, ytrue = datasets.make_rep_data_1d(n_unique=10, seed=1)
        run = LCGPRun(runno='t1', data=dict(xtrain=xtr, ytrain=ytr,
                                            xtest=xte, ytest=None),
                      submethod='rep')
        run.define_model()
        assert run.model is not None and run.modelname == 'LCGP_robust'
        run.train(maxiter=10)
        ymean, ypredvar, yconfvar = run.predict()
        assert ymean.shape == (3, xte.shape[0])
        assert isinstance(ymean, np.ndarray)
        # as_pxn transposes
        ymean_t, _, _ = run.predict(as_pxn=True)
        assert ymean_t.shape == (xte.shape[0], 3)
        # train=True predicts at training inputs
        ytr_pred = run.predict(train=True)[0]
        assert ytr_pred.shape == (3, xtr.shape[0])

    def test_fullcov_passthrough(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (25, 2))
        y = rng.standard_normal((3, 25))
        run = LCGPRun(runno='t2', data=dict(xtrain=x, ytrain=y,
                                            xtest=x[:5], ytest=None))
        run.define_model()
        out = run.predict(return_fullcov=True)
        assert len(out) == 4 and out[3].shape == (5, 3, 3)


class TestDatasets:
    def test_forrester(self):
        y = datasets.forrester2008(np.linspace(0, 1, 30),
                                   rng=np.random.default_rng(0))
        assert y.shape == (3, 30)
        y_clean = datasets.forrester2008(np.linspace(0, 1, 30), noisy=False)
        assert np.isfinite(y_clean).all()

    def test_cps2001(self):
        x = np.random.default_rng(1).uniform(0.5, 1.5, (20, 4))
        y = datasets.cps2001(x, rng=np.random.default_rng(2))
        assert y.shape == (20, 2)

    def test_borehole_field(self):
        x, y = datasets.make_borehole_field(n=50, p=10)
        assert x.shape == (50, 8) and y.shape == (10, 50)
        assert np.isfinite(y).all()


class TestProfiling:
    def test_timed(self):
        f = lambda x: jnp.sum(x * x)
        stats = timed(f, jnp.arange(1000.0), iters=3)
        assert stats['median'] >= 0 and stats['iters'] == 3

    def test_log_compiles_context(self):
        with log_compiles():
            jnp.sum(jnp.ones(3))


class TestHealthCheck:
    def test_healthy_model(self):
        from lcgp_tpu import LCGP
        from lcgp_tpu.utils import health_check
        xtr, ytr, _, _ = datasets.make_rep_data_skewed(seed=41)
        m = LCGP(y=ytr, x=xtr, q=3, submethod='rep')
        m.fit(method='scipy', maxiter=40)
        rep = health_check(m)
        assert rep['ok'] is True
        assert rep['checks']['factor_conditioning']['ok']
        assert rep['checks']['predict_smoke']['ok']

    def test_detects_broken_params(self):
        import jax.numpy as jnp
        from lcgp_tpu import LCGP
        from lcgp_tpu.utils import health_check
        from lcgp_tpu.models.params import FreeParams
        xtr, ytr, _, _ = datasets.make_rep_data_1d(n_unique=8, seed=42)
        m = LCGP(y=ytr, x=xtr, submethod='rep')
        m._free = FreeParams(m._free.lLmb * jnp.nan, m._free.lLmb0,
                             m._free.lsigma2s, m._free.lnugGPs)
        m._params_version += 1
        rep = health_check(m)
        assert rep['ok'] is False

    def test_fitc_model_skips_factor(self):
        from lcgp_tpu import LCGP
        from lcgp_tpu.utils import health_check
        xtr, ytr, _, _ = datasets.make_rep_data_skewed(seed=43)
        m = LCGP(y=ytr, x=xtr, q=3, submethod='rep', inducing=12)
        rep = health_check(m)
        assert rep['checks']['factor_conditioning'].get('skipped')
