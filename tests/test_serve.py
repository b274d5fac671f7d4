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
