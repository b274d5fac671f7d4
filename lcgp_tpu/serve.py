"""Prediction serving: a warm, fixed-shape compiled predict path behind a
minimal HTTP JSON API.

The reference has no serving layer (its deployment story ends at the
Python API); this module is the production extra: load a saved model
once, pre-compile predict at a fixed batch shape (requests of any size
are chunked/padded to it, so the server never recompiles), and serve.

Concurrency: a single dispatcher thread owns the device executable and
*microbatches* — concurrent requests are coalesced row-wise into one
padded fixed-shape dispatch and the results fanned back out, so k
concurrent small requests cost ~one device call instead of k serialized
ones (round-2 review: the old global lock made p50 scale ~k*92 ms).

API:
  GET  /healthz            -> {"status": "ok"}
  GET  /info               -> model/config summary
  POST /predict {"x": [[...], ...]}
       -> {"ypred": [[p x n0]], "ypredvar": ..., "yconfvar": ...}
  POST /predict {"x": ..., "fullcov": true}
       -> adds "yfullcov" (n0 x p x p); submethod='full' models only

Usage:
  python -m lcgp_tpu.serve model.npz --port 8080 --batch-size 256
or programmatically:
  server = PredictServer('model.npz'); server.serve(port=8080)
"""
from __future__ import annotations

import argparse
import json
import queue as queue_mod
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Chunk:
    """One <=batch_size slice of a request, awaiting a microbatch slot."""
    __slots__ = ('x0', 'event', 'result', 'error')

    def __init__(self, x0):
        self.x0 = x0
        self.event = threading.Event()
        self.result = None
        self.error = None


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
        self._httpd = None
        self._fn = self._build_fused()
        self._fn_fullcov = None                  # built on first use
        self._fullcov_lock = threading.Lock()
        self._queue: queue_mod.Queue = queue_mod.Queue()
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            daemon=True)
        self._dispatcher.start()
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
        """Thread-safe predict through the microbatching dispatcher.

        The request is split into <=batch_size chunks; each chunk is
        coalesced with whatever other requests are concurrently pending
        into one padded fixed-shape device dispatch, and the rows are
        fanned back out.  Values are identical to ``model.predict``.
        """
        x0 = np.atleast_2d(np.asarray(x0, dtype=np.float64))
        if x0.shape[1] != int(self.model.d):
            raise ValueError(
                f'expected (n0, {int(self.model.d)}) inputs, got {x0.shape}')
        bs = self.batch_size
        chunks = [_Chunk(x0[s:s + bs]) for s in range(0, x0.shape[0], bs)]
        for c in chunks:
            self._queue.put(c)
        for c in chunks:
            c.event.wait()
            if c.error is not None:
                raise c.error
        return tuple(np.concatenate([c.result[i] for c in chunks], axis=1)
                     for i in range(3))

    def predict_fullcov(self, x0):
        """Predict with the (n0, p, p) full predictive covariance.

        Full-submethod models only (the rep path's fullcov slot is None by
        the reference contract, lcgp.py:928-929).  Fullcov payloads are
        O(n0 p^2) — requests run serialized through their own fused
        executable rather than the row-microbatcher (coalescing rows of
        different requests would not reduce the dominant p^2 cost).
        """
        if self.model.submethod != 'full':
            raise ValueError('full predictive covariance is only available '
                             "for submethod='full' models")
        x0 = np.atleast_2d(np.asarray(x0, dtype=np.float64))
        if x0.shape[1] != int(self.model.d):
            raise ValueError(
                f'expected (n0, {int(self.model.d)}) inputs, got {x0.shape}')
        with self._fullcov_lock:
            if self._fn_fullcov is None:
                self._fn_fullcov = self._build_fused_fullcov()
            bs = self.batch_size
            outs = []
            for s in range(0, x0.shape[0], bs):
                blk = x0[s:s + bs]
                k = blk.shape[0]
                if k < bs:
                    blk = np.concatenate(
                        [blk, np.repeat(blk[-1:], bs - k, axis=0)])
                res = [np.asarray(o) for o in self._fn_fullcov(blk)]
                outs.append((res[0][:, :k], res[1][:, :k], res[2][:, :k],
                             res[3][:k]))
        return tuple(np.concatenate([o[i] for o in outs],
                                    axis=1 if i < 3 else 0)
                     for i in range(4))

    def _build_fused_fullcov(self):
        import jax

        model = self.model
        aux = model._ensure_aux()
        free, data = model._free, model._data
        from .models import predict as pred

        def fused(x0):
            x0s = (x0 - model.x_min) / (model.x_max - model.x_min)
            ghat, gvar = model._latent_predict(aux, x0s)
            yp, ypv, ycv = pred.recombine_full(free, data, ghat, gvar,
                                               model.ymean, model.ystd)
            cov = pred.fullcov_full(free, data, gvar, model.ystd)
            return yp, ypv, ycv, cov

        return jax.jit(fused)

    def _dispatch_loop(self):
        """Dispatcher thread: sole owner of the device executable.

        Blocks for one pending chunk, then greedily drains more pending
        chunks while their rows still fit the fixed batch shape —
        concurrent clients share a single padded dispatch.
        """
        bs = self.batch_size
        while True:
            first = self._queue.get()
            if first is None:        # shutdown sentinel
                return
            group = [first]
            rows = first.x0.shape[0]
            while rows < bs:
                try:
                    nxt = self._queue.queue[0]   # peek
                except IndexError:
                    break
                if nxt is None or rows + nxt.x0.shape[0] > bs:
                    break
                group.append(self._queue.get_nowait())
                rows += group[-1].x0.shape[0]
            try:
                batch = np.concatenate([c.x0 for c in group])
                pad = bs - batch.shape[0]
                if pad:
                    batch = np.concatenate(
                        [batch, np.repeat(batch[-1:], pad, axis=0)])
                res = [np.asarray(o) for o in self._fn(batch)]
                ofs = 0
                for c in group:
                    k = c.x0.shape[0]
                    c.result = [o[:, ofs:ofs + k] for o in res]
                    ofs += k
                    c.event.set()
            except Exception as e:   # noqa: BLE001 — fan the error out
                for c in group:
                    c.error = e
                    c.event.set()

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
                    if req.get('fullcov'):
                        ypred, ypredvar, yconfvar, cov = \
                            server.predict_fullcov(x0)
                        payload = {'yfullcov': cov.tolist()}
                    else:
                        ypred, ypredvar, yconfvar = server.predict(x0)
                        payload = {}
                    payload.update({
                        'ypred': ypred.tolist(),
                        'ypredvar': ypredvar.tolist(),
                        'yconfvar': yconfvar.tolist(),
                        'latency_s': round(time.time() - t0, 4),
                    })
                    self._reply(200, payload)
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
        if self._dispatcher.is_alive():
            self._queue.put(None)        # stop the dispatcher thread
            self._dispatcher.join(timeout=5)


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
