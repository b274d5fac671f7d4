"""Hot-reload-under-traffic benchmark (round 4).

Streams concurrent predict requests through the microbatching
PredictServer while a second thread hot-swaps a refit model
(``PredictServer.reload``), then checks that

  - zero requests failed,
  - every post-swap response matches the NEW model exactly,
  - the latency distribution during the reload window is indistinguishable
    from steady state when the executable is reused (the same-shape refit
    pattern — the whole point of the state-parametric fused predict).

Prints one JSON line.  The reference has no serving layer at all
(deployment ends at the Python API); this measures the production extra.

  PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/serve_reload.py [--cpu]
"""
from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--clients', type=int, default=4)
    ap.add_argument('--seconds', type=float, default=8.0)
    ap.add_argument('--precision', default='high',
                    choices=('high', 'mixed', 'fast'),
                    help='model precision the server serves (stated in the '
                         'output so latency numbers are attributable)')
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    from lcgp_tpu import LCGP, datasets
    from lcgp_tpu.serve import PredictServer

    xtr, ytr, _, _ = datasets.make_rep_data_skewed(seed=7)
    model = LCGP(y=ytr, x=xtr, q=3, submethod='rep', precision=args.precision)
    model.fit(method='adam', steps=100)
    model2 = LCGP(y=ytr, x=xtr, q=3, submethod='rep',
                  precision=args.precision)
    model2.fit(method='adam', steps=60, learning_rate=5e-3)
    yref1 = {}
    yref2 = {}

    srv = PredictServer(model, batch_size=256, warmup=True)

    rng = np.random.default_rng(0)
    sizes = [1, 7, 16, 63][:args.clients]
    inputs = [rng.uniform(xtr.min(), xtr.max(), (s, xtr.shape[1]))
              for s in sizes]
    for i, x in enumerate(inputs):
        yref1[i] = np.asarray(model.predict(x)[0])
        yref2[i] = np.asarray(model2.predict(x)[0])

    # f32 ('fast') models reach the same values through differently-fused
    # programs server-side vs model.predict — compare at f32 resolution.
    rtol, atol = ((1e-10, 1e-12) if args.precision != 'fast'
                  else (1e-4, 1e-6))

    stop = threading.Event()
    lats: list[tuple[float, float]] = []   # (t_end, latency)
    errs: list[str] = []
    mismatches: list[str] = []
    lock = threading.Lock()

    def client(i):
        while not stop.is_set():
            t0 = time.time()
            try:
                yp = srv.predict(inputs[i])[0]
            except Exception as e:  # noqa: BLE001
                with lock:
                    errs.append(repr(e))
                return
            t1 = time.time()
            ok = (np.allclose(yp, yref1[i], rtol=rtol, atol=atol) or
                  np.allclose(yp, yref2[i], rtol=rtol, atol=atol))
            with lock:
                lats.append((t1, t1 - t0))
                if not ok:
                    mismatches.append(f'client {i} at {t1}')

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(sizes))]
    t_start = time.time()
    for t in threads:
        t.start()

    time.sleep(args.seconds / 2)
    t_swap0 = time.time()
    out = srv.reload(model2)
    t_swap1 = time.time()
    time.sleep(args.seconds / 2)
    stop.set()
    for t in threads:
        t.join()

    # settle: every response strictly after the swap must be model2's
    post = [e for e in lats if e[0] > t_swap1]
    final = [np.asarray(srv.predict(x)[0]) for x in inputs]
    post_match_new = all(
        np.allclose(f, yref2[i], rtol=rtol, atol=atol)
        for i, f in enumerate(final))
    srv.shutdown()

    during = [lat for (te, lat) in lats if t_swap0 <= te <= t_swap1 + 0.5]
    steady = [lat for (te, lat) in lats
              if te < t_swap0 or te > t_swap1 + 0.5]
    p95 = lambda v: float(np.percentile(v, 95)) if v else float('nan')  # noqa: E731
    print(json.dumps(dict(
        served_precision=args.precision,
        clients=len(sizes), run_s=round(time.time() - t_start, 1),
        requests=len(lats), failed=len(errs), value_mismatches=len(mismatches),
        reused_executable=out['reused_executable'],
        reload_call_ms=round((t_swap1 - t_swap0) * 1e3, 1),
        steady_p50_ms=round(float(np.percentile(steady, 50)) * 1e3, 1),
        steady_p95_ms=round(p95(steady) * 1e3, 1),
        during_reload_p95_ms=round(p95(during) * 1e3, 1),
        post_swap_requests=len(post),
        post_swap_serves_new_model=bool(post_match_new),
    )))
    if errs or mismatches:
        raise SystemExit(1)


if __name__ == '__main__':
    main()
