"""Prediction serving: a warm, fixed-shape compiled predict path behind a
minimal HTTP JSON API.

The reference has no serving layer (its deployment story ends at the
Python API); this module is the production extra: load a saved model
once, pre-compile predict at a fixed batch shape (requests of any size
are chunked/padded to it, so the server never recompiles), and serve.

API:
  GET  /healthz            -> {"status": "ok"}
  GET  /info               -> model/config summary
  POST /predict {"x": [[...], ...]}
       -> {"ypred": [[p x n0]], "ypredvar": ..., "yconfvar": ...}

Usage:
  python -m lcgp_tpu.serve model.npz --port 8080 --batch-size 256
or programmatically:
  server = PredictServer('model.npz'); server.serve(port=8080)
"""
from __future__ import annotations

import argparse
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class PredictServer:
    def __init__(self, model_or_path, batch_size: int = 256,
                 warmup: bool = True):
        from .models.lcgp import LCGP
        if isinstance(model_or_path, (str, bytes)) or hasattr(model_or_path,
                                                              '__fspath__'):
            self.model = LCGP.load(model_or_path)
        else:
            self.model = model_or_path
        self.batch_size = int(batch_size)
        self._lock = threading.Lock()
        self._httpd = None
        self._fn = self._build_fused()
        if warmup:
            self.warmup()

    def _build_fused(self):
        """One jitted end-to-end predict executable at the fixed batch shape.

        Driving model.predict per request costs ~8 separate device
        dispatches (standardize, core, recombine, pad/slice each their
        own) — ~2 s/request on a tunneled backend.  Tracing the whole
        path into a single jit makes a warm request one dispatch; padding
        and unpadding happen host-side in NumPy.
        """
        import jax

        model = self.model
        aux = model._ensure_aux()
        free, data = model._free, model._data

        import jax.numpy as jnp
        from .models import predict as pred

        def fused(x0):
            x0s = (x0 - model.x_min) / (model.x_max - model.x_min)
            ghat, gvar = model._latent_predict(aux, x0s)
            if model.submethod == 'rep':
                if model.rep_standardize_ybar:
                    mean, std = model.ybar_mean, model.ybar_std
                else:
                    mean = jnp.zeros_like(model.ybar_mean)
                    std = jnp.ones_like(model.ybar_std)
                return pred.recombine_rep(free, data, ghat, gvar, mean, std)
            return pred.recombine_full(free, data, ghat, gvar,
                                       model.ymean, model.ystd)

        return jax.jit(fused)

    def warmup(self):
        """Compile the fused fixed-batch predict before the first request."""
        d = int(self.model.d)
        x0 = np.full((self.batch_size, d), 0.5)
        t0 = time.time()
        self.predict(x0)
        return time.time() - t0

    def predict(self, x0):
        """Thread-safe predict through the single fused executable; inputs
        pad host-side to the fixed batch shape (large requests chunk)."""
        x0 = np.atleast_2d(np.asarray(x0, dtype=np.float64))
        if x0.shape[1] != int(self.model.d):
            raise ValueError(
                f'expected (n0, {int(self.model.d)}) inputs, got {x0.shape}')
        n0 = x0.shape[0]
        bs = self.batch_size
        outs = []
        with self._lock:
            for s in range(0, n0, bs):
                blk = x0[s:s + bs]
                pad = bs - blk.shape[0]
                if pad:
                    blk = np.concatenate(
                        [blk, np.repeat(blk[-1:], pad, axis=0)])
                res = self._fn(blk)
                outs.append([np.asarray(o)[:, :bs - pad] if pad
                             else np.asarray(o) for o in res])
        return tuple(np.concatenate([c[i] for c in outs], axis=1)
                     for i in range(3))

    def info(self):
        m = self.model
        return dict(method=m.method, submethod=m.submethod, n=int(m.n),
                    d=int(m.d), p=int(m.p), q=int(m.q),
                    precision=m.precision, kernel=m.kernel,
                    inducing=None if m._z is None else int(m._z.shape[0]),
                    batch_size=self.batch_size)

    # -- HTTP ----------------------------------------------------------
    def _make_handler(server):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet by default
                pass

            def _reply(self, code, payload):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header('Content-Type', 'application/json')
                self.send_header('Content-Length', str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == '/healthz':
                    self._reply(200, {'status': 'ok'})
                elif self.path == '/info':
                    self._reply(200, server.info())
                else:
                    self._reply(404, {'error': 'not found'})

            def do_POST(self):
                if self.path != '/predict':
                    self._reply(404, {'error': 'not found'})
                    return
                try:
                    length = int(self.headers.get('Content-Length', 0))
                    req = json.loads(self.rfile.read(length) or b'{}')
                    x0 = req['x']
                    t0 = time.time()
                    ypred, ypredvar, yconfvar = server.predict(x0)
                    self._reply(200, {
                        'ypred': ypred.tolist(),
                        'ypredvar': ypredvar.tolist(),
                        'yconfvar': yconfvar.tolist(),
                        'latency_s': round(time.time() - t0, 4),
                    })
                except (KeyError, ValueError, TypeError) as e:
                    self._reply(400, {'error': str(e)})
        return Handler

    def serve(self, host: str = '127.0.0.1', port: int = 8080,
              background: bool = False):
        """Start the HTTP server.  background=True returns (httpd, thread)
        immediately (for tests/embedding); otherwise blocks."""
        self._httpd = ThreadingHTTPServer((host, port), self._make_handler())
        if background:
            t = threading.Thread(target=self._httpd.serve_forever,
                                 daemon=True)
            t.start()
            return self._httpd, t
        try:
            self._httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            self._httpd.server_close()

    def shutdown(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None


def main(argv=None):
    ap = argparse.ArgumentParser(description='Serve a saved LCGP model.')
    ap.add_argument('model', help='path to a model .npz (LCGP.save)')
    ap.add_argument('--host', default='127.0.0.1')
    ap.add_argument('--port', type=int, default=8080)
    ap.add_argument('--batch-size', type=int, default=256)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    server = PredictServer(args.model, batch_size=args.batch_size,
                           warmup=False)
    secs = server.warmup()
    print(f'[lcgp_tpu.serve] warm ({secs:.1f}s); '
          f'listening on {args.host}:{args.port}', flush=True)
    server.serve(args.host, args.port)


if __name__ == '__main__':
    main()
