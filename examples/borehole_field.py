"""Borehole-style field emulation (BASELINE.json config 3):
n=1000 design points, d=8 inputs, p=100-dim output field, q=5 latents.

Usage: python examples/borehole_field.py [--cpu] [--n 1000] [--p 100]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--n', type=int, default=1000)
    ap.add_argument('--p', type=int, default=100)
    ap.add_argument('--q', type=int, default=5)
    ap.add_argument('--precision', default='high', choices=['high', 'fast'])
    ap.add_argument('--method', default='scipy',
                    choices=['scipy', 'adam', 'lbfgs-jax'])
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    from lcgp_tpu import LCGP, evaluation, datasets

    x, y = datasets.make_borehole_field(n=args.n, p=args.p, seed=0)
    n_test = args.n // 5
    xte, yte = x[-n_test:], y[:, -n_test:]
    xtr, ytr = x[:-n_test], y[:, :-n_test]

    model = LCGP(y=ytr, x=xtr, q=args.q, precision=args.precision)
    t0 = time.time()
    model.fit(method=args.method)
    fit_s = time.time() - t0
    ypred, ypredvar, _ = map(np.asarray, model.predict(xte))

    print(f"n={xtr.shape[0]} p={args.p} q={model.q} "
          f"precision={args.precision} method={args.method}")
    print(f"fit: {fit_s:.2f}s")
    print(f"test rmse:  {evaluation.rmse(yte, ypred):.5f}")
    print(f"test nrmse: {evaluation.normalized_rmse(yte, ypred):.5f}")
    cover, width = evaluation.intervalstats(yte, ypred, ypredvar)
    print(f"coverage: {cover:.3f}  width: {width:.4f}")


if __name__ == '__main__':
    main()
