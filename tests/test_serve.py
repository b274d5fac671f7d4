"""Prediction server (lcgp_tpu/serve.py)."""
import json
import urllib.request

import numpy as np
import pytest

from lcgp_tpu import LCGP, datasets
from lcgp_tpu.serve import PredictServer


@pytest.fixture(scope='module')
def fitted_model():
    xtr, ytr, _, _ = datasets.make_rep_data_skewed(seed=21)
    m = LCGP(y=ytr, x=xtr, q=3, submethod='rep')
    m.fit(method='scipy', maxiter=60)
    return m


class TestPredictServer:
    def test_predict_matches_model(self, fitted_model):
        srv = PredictServer(fitted_model, batch_size=32, warmup=False)
        x0 = np.linspace(0, 1, 50)[:, None]
        yp_s, ypv_s, ycv_s = srv.predict(x0)
        yp_m, ypv_m, ycv_m = map(np.asarray, fitted_model.predict(x0))
        np.testing.assert_allclose(yp_s, yp_m, rtol=1e-10)
        np.testing.assert_allclose(ypv_s, ypv_m, rtol=1e-10)

    def test_load_from_saved(self, fitted_model, tmp_path):
        path = tmp_path / 'm.npz'
        fitted_model.save(path)
        srv = PredictServer(str(path), batch_size=16, warmup=True)
        x0 = np.linspace(0, 1, 20)[:, None]
        yp_s = srv.predict(x0)[0]
        yp_m = np.asarray(fitted_model.predict(x0)[0])
        np.testing.assert_allclose(yp_s, yp_m, rtol=1e-10)

    def test_dim_mismatch_raises(self, fitted_model):
        srv = PredictServer(fitted_model, batch_size=8, warmup=False)
        with pytest.raises(ValueError):
            srv.predict(np.zeros((4, 3)))

    def test_http_roundtrip(self, fitted_model):
        srv = PredictServer(fitted_model, batch_size=16, warmup=False)
        httpd, _ = srv.serve(port=0, background=True)
        port = httpd.server_address[1]
        base = f'http://127.0.0.1:{port}'
        try:
            with urllib.request.urlopen(base + '/healthz', timeout=30) as r:
                assert json.load(r)['status'] == 'ok'
            with urllib.request.urlopen(base + '/info', timeout=30) as r:
                info = json.load(r)
            assert info['p'] == 3 and info['submethod'] == 'rep'

            x0 = np.linspace(0, 1, 10)[:, None]
            req = urllib.request.Request(
                base + '/predict',
                data=json.dumps({'x': x0.tolist()}).encode(),
                headers={'Content-Type': 'application/json'})
            with urllib.request.urlopen(req, timeout=60) as r:
                out = json.load(r)
            yp_m = np.asarray(fitted_model.predict(x0)[0])
            np.testing.assert_allclose(np.asarray(out['ypred']), yp_m,
                                       rtol=1e-8)
            assert out['latency_s'] >= 0

            # bad request -> 400
            bad = urllib.request.Request(
                base + '/predict', data=b'{"x": [[1, 2, 3]]}',
                headers={'Content-Type': 'application/json'})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad, timeout=30)
            assert ei.value.code == 400
        finally:
            srv.shutdown()


class TestHotReload:
    def test_param_swap_reuses_executable(self, fitted_model):
        """Same config + shapes (the periodic-refit pattern): reload must
        reuse the compiled executable and serve the new model's values."""
        srv = PredictServer(fitted_model, batch_size=16, warmup=True)
        x0 = np.linspace(0, 1, 20)[:, None]
        yp_old = srv.predict(x0)[0]

        xtr, ytr, _, _ = datasets.make_rep_data_skewed(seed=21)
        m2 = LCGP(y=ytr, x=xtr, q=3, submethod='rep')
        m2.fit(method='adam', steps=20, learning_rate=1e-2)
        out = srv.reload(m2)
        assert out['reused_executable'] is True
        assert out['reload_count'] == 1
        yp_new = srv.predict(x0)[0]
        yp_ref = np.asarray(m2.predict(x0)[0])
        np.testing.assert_allclose(yp_new, yp_ref, rtol=1e-10)
        assert not np.allclose(yp_new, yp_old)
        srv.shutdown()

    def test_shape_change_recompiles(self, fitted_model):
        """New model with different n (shape change): reload still works,
        reports the executable was NOT reused."""
        srv = PredictServer(fitted_model, batch_size=8, warmup=False)
        xtr, ytr, _, _ = datasets.make_rep_data_1d(n_unique=9, seed=5)
        m2 = LCGP(y=ytr, x=xtr, q=2, submethod='rep')
        out = srv.reload(m2)
        assert out['reused_executable'] is False
        x0 = np.linspace(0, 1, 7)[:, None]
        np.testing.assert_allclose(srv.predict(x0)[0],
                                   np.asarray(m2.predict(x0)[0]),
                                   rtol=1e-10)
        srv.shutdown()

    def test_submethod_change_rebuilds(self, fitted_model):
        """Static-config change (rep -> full): fused fn is rebuilt."""
        srv = PredictServer(fitted_model, batch_size=8, warmup=False)
        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, (20, 1))
        y = rng.standard_normal((3, 20))
        m2 = LCGP(y=y, x=x, q=2)
        out = srv.reload(m2)
        assert out['reused_executable'] is False
        assert out['submethod'] == 'full'
        x0 = np.linspace(0, 1, 5)[:, None]
        np.testing.assert_allclose(srv.predict(x0)[0],
                                   np.asarray(m2.predict(x0)[0]),
                                   rtol=1e-10)
        # fullcov was invalidated and rebuilt against the new (full) model
        cov = srv.predict_fullcov(x0)[3]
        ref = np.asarray(m2.predict(x0, return_fullcov=True)[3])
        np.testing.assert_allclose(cov, ref, rtol=1e-8, atol=1e-12)
        srv.shutdown()

    def test_d_mismatch_rejected(self, fitted_model):
        srv = PredictServer(fitted_model, batch_size=8, warmup=False)
        rng = np.random.default_rng(4)
        m2 = LCGP(y=rng.standard_normal((3, 15)),
                  x=rng.uniform(0, 1, (15, 2)), q=2)
        with pytest.raises(ValueError, match='d mismatch'):
            srv.reload(m2)
        srv.shutdown()

    def test_http_reload_disabled_by_default(self, fitted_model):
        """Without reload_dir=, POST /reload is a 403 (unauthenticated
        endpoint loading client-named paths must be opt-in)."""
        srv = PredictServer(fitted_model, batch_size=8, warmup=False)
        httpd, _ = srv.serve(port=0, background=True)
        port = httpd.server_address[1]
        try:
            req = urllib.request.Request(
                f'http://127.0.0.1:{port}/reload',
                data=b'{"path": "m.npz"}',
                headers={'Content-Type': 'application/json'})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 403
        finally:
            srv.shutdown()

    def test_http_reload(self, fitted_model, tmp_path):
        """POST /reload with a saved-model path swaps the served model."""
        srv = PredictServer(fitted_model, batch_size=8, warmup=False,
                            reload_dir=str(tmp_path))
        httpd, _ = srv.serve(port=0, background=True)
        port = httpd.server_address[1]
        base = f'http://127.0.0.1:{port}'
        try:
            xtr, ytr, _, _ = datasets.make_rep_data_skewed(seed=21)
            m2 = LCGP(y=ytr, x=xtr, q=3, submethod='rep')
            m2.fit(method='adam', steps=10, learning_rate=1e-2)
            path = tmp_path / 'm2.npz'
            m2.save(path)
            req = urllib.request.Request(
                base + '/reload',
                data=json.dumps({'path': str(path)}).encode(),
                headers={'Content-Type': 'application/json'})
            with urllib.request.urlopen(req, timeout=120) as r:
                out = json.load(r)
            assert out['reused_executable'] is True
            x0 = np.linspace(0, 1, 6)[:, None]
            req = urllib.request.Request(
                base + '/predict',
                data=json.dumps({'x': x0.tolist()}).encode(),
                headers={'Content-Type': 'application/json'})
            with urllib.request.urlopen(req, timeout=60) as r:
                got = np.asarray(json.load(r)['ypred'])
            np.testing.assert_allclose(got, np.asarray(m2.predict(x0)[0]),
                                       rtol=1e-8)
            # bad reload (missing file inside reload_dir) -> 400
            bad = urllib.request.Request(
                base + '/reload', data=b'{"path": "nonexistent.npz"}',
                headers={'Content-Type': 'application/json'})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad, timeout=30)
            assert ei.value.code == 400
            # corrupt model file -> 400 (not an aborted connection)
            (tmp_path / 'corrupt.npz').write_bytes(b'not a zipfile')
            bad = urllib.request.Request(
                base + '/reload', data=b'{"path": "corrupt.npz"}',
                headers={'Content-Type': 'application/json'})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad, timeout=30)
            assert ei.value.code == 400
            # path escaping reload_dir -> 403
            bad = urllib.request.Request(
                base + '/reload', data=b'{"path": "../escape.npz"}',
                headers={'Content-Type': 'application/json'})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad, timeout=30)
            assert ei.value.code == 403
        finally:
            srv.shutdown()


class TestMicrobatching:
    def test_concurrent_clients_match_model_predict(self, tmp_path):
        """8 threads, request sizes 1..127: every response must equal the
        direct model.predict values (microbatcher fan-out correctness)."""
        import threading
        import numpy as np
        from lcgp_tpu import LCGP, datasets
        from lcgp_tpu.serve import PredictServer

        xtr, ytr, xte, _ = datasets.make_rep_data_skewed(seed=55)
        m = LCGP(y=ytr, x=xtr, q=3, submethod='rep')
        m.fit(method='adam', steps=30)
        srv = PredictServer(m, batch_size=64, warmup=True)

        rng = np.random.default_rng(0)
        sizes = [1, 3, 7, 16, 31, 64, 90, 127]
        inputs = [rng.uniform(xtr.min(), xtr.max(), (s, 1)) for s in sizes]
        expected = [tuple(np.asarray(o) for o in m.predict(x))
                    for x in inputs]

        results = [None] * len(sizes)
        errors = []

        def worker(i):
            try:
                results[i] = srv.predict(inputs[i])
            except Exception as e:       # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(sizes))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        srv.shutdown()
        assert not errors, errors
        for got, exp, s in zip(results, expected, sizes):
            assert got is not None, f'request of size {s} never completed'
            for g, e in zip(got, exp):
                np.testing.assert_allclose(g, e, rtol=1e-10, atol=1e-12)

    def test_coalescing_happens(self):
        """With a slow fake executable, concurrent small requests must
        share dispatches (fewer device calls than requests)."""
        import threading
        import numpy as np
        from lcgp_tpu.serve import PredictServer
        from lcgp_tpu import LCGP, datasets

        xtr, ytr, _, _ = datasets.make_rep_data_1d(n_unique=8, seed=56)
        m = LCGP(y=ytr, x=xtr, submethod='rep')
        srv = PredictServer(m, batch_size=32, warmup=True)

        calls = []
        real_fn = srv._fn

        def counting_fn(batch):
            calls.append(batch.shape[0])
            import time as _t
            _t.sleep(0.05)               # widen the coalescing window
            return real_fn(batch)

        srv._fn = counting_fn
        n_req = 12

        def worker():
            srv.predict(np.full((2, xtr.shape[1]), 0.5))

        threads = [threading.Thread(target=worker) for _ in range(n_req)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        srv.shutdown()
        assert len(calls) < n_req, (len(calls), calls)


class TestFullcovServing:
    def test_fullcov_matches_model(self):
        rng = np.random.default_rng(11)
        x = rng.uniform(0, 1, (30, 2))
        y = np.vstack([np.sin(5 * x[:, 0]), np.cos(4 * x[:, 1]),
                       x[:, 0] * x[:, 1]]) + rng.normal(0, 0.05, (3, 30))
        m = LCGP(y=y, x=x, q=3)          # submethod='full'
        m.fit(maxiter=30)
        srv = PredictServer(m, batch_size=8, warmup=False)
        x0 = rng.uniform(0, 1, (11, 2))  # exercises pad + multi-chunk
        yp_s, ypv_s, ycv_s, cov_s = srv.predict_fullcov(x0)
        yp_m, ypv_m, ycv_m, cov_m = (np.asarray(o) for o in
                                     m.predict(x0, return_fullcov=True))
        np.testing.assert_allclose(yp_s, yp_m, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(cov_s, cov_m, rtol=1e-10, atol=1e-12)
        srv.shutdown()

    def test_fullcov_rejected_for_rep(self, fitted_model):
        srv = PredictServer(fitted_model, batch_size=8, warmup=False)
        with pytest.raises(ValueError, match='full'):
            srv.predict_fullcov(np.zeros((2, 1)))
        srv.shutdown()

    def test_http_fullcov(self):
        rng = np.random.default_rng(12)
        x = rng.uniform(0, 1, (25, 1))
        y = np.vstack([np.sin(6 * x[:, 0]),
                       np.cos(6 * x[:, 0])]) + rng.normal(0, 0.05, (2, 25))
        m = LCGP(y=y, x=x, q=2)
        m.fit(maxiter=20)
        srv = PredictServer(m, batch_size=8, warmup=False)
        httpd, _ = srv.serve(port=0, background=True)
        port = httpd.server_address[1]
        body = json.dumps({'x': x[:3].tolist(), 'fullcov': True}).encode()
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/predict', data=body,
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        assert 'yfullcov' in out
        cov = np.asarray(out['yfullcov'])
        assert cov.shape == (3, 2, 2)
        cov_m = np.asarray(m.predict(x[:3], return_fullcov=True)[3])
        np.testing.assert_allclose(cov, cov_m, rtol=1e-8, atol=1e-10)
        srv.shutdown()


class TestInducingServing:
    def test_serve_fitc_model(self):
        """Serving an inducing-point (FITC) model: the fused predict jits
        _latent_predict, so its clamp-stat recording must be jit-safe
        (regression: ADVICE r3 high — ConcretizationTypeError at warmup)."""
        rng = np.random.default_rng(5)
        n, d, p = 120, 2, 4
        x = rng.uniform(0, 1, (n, d))
        y = np.vstack([np.sin(4 * x[:, 0]), np.cos(3 * x[:, 1]),
                       x[:, 0] * x[:, 1], (x ** 2).sum(1)])
        y = y + 0.05 * rng.standard_normal((p, n))
        m = LCGP(y=y, x=x, q=3, inducing=16)
        m.fit(method='adam', steps=20)
        srv = PredictServer(m, batch_size=16, warmup=True)
        x0 = rng.uniform(0, 1, (10, d))
        yp_s, ypv_s, _ = srv.predict(x0)
        yp_m, ypv_m, _ = map(np.asarray, m.predict(x0))
        np.testing.assert_allclose(yp_s, yp_m, rtol=1e-10)
        np.testing.assert_allclose(ypv_s, ypv_m, rtol=1e-10)

    def test_clamp_stats_accumulate_across_batches(self):
        """Batched predict accumulates clamp stats across batches instead of
        overwriting per batch (ADVICE r3 low), counting only the user's
        points — the duplicated padding rows of the final chunk must not
        inflate (or dilute) health_check's clamp fraction."""
        rng = np.random.default_rng(6)
        n, d, p = 100, 2, 3
        x = rng.uniform(0, 1, (n, d))
        y = rng.standard_normal((p, n))
        m = LCGP(y=y, x=x, q=2, inducing=12)
        m.fit(method='adam', steps=10)
        x0 = rng.uniform(0, 1, (25, d))
        m.predict(x0, batch_size=8)  # 4 batches (last padded 1->8)
        st = m._fitc_clamp_stats
        assert st is not None
        assert st['total'] == 2 * 25  # q * n0, padding excluded
        assert st['n_clamped'] >= 0 and 0 <= st['frac'] <= 1
        # unbatched predict over the same points must agree on the stats
        m.predict(x0)
        st2 = m._fitc_clamp_stats
        assert st2['total'] == 2 * 25
        assert st2['n_clamped'] == st['n_clamped']
