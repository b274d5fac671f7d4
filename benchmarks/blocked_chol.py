"""GEMM-dominant blocked Cholesky, A/B vs XLA's expander (VERDICT r2 #2).

The naive version (f32_breakdown.py) updated a (q, n, n) buffer in place
with `.at[].set` each panel step — XLA copies the 1.3 GB buffer per
update, which swamps the GEMM win.  This version assembles column blocks
and shrinks the trailing matrix functionally, so per-step traffic is the
trailing block only.

  PYTHONPATH=... python -u benchmarks/blocked_chol.py [--cpu] [--nb 512 ...]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def blocked_cholesky(A, nb: int, solve_panel: bool = False,
                     gemm_precision=None):
    """Right-looking blocked lower Cholesky of a batched PSD stack.

    Panel factor: XLA cholesky on the (q, nb, nb) diagonal block.
    Panel column: `solve_panel=False` inverts the diagonal factor
    (triangular solve vs identity, nb^3/6) and applies it as a GEMM —
    MXU-friendly; True uses a direct triangular solve (better error for
    ill-conditioned panels, slower on TPU).
    Trailing update: one batched GEMM on the shrinking trailing block.
    gemm_precision: lax.Precision for the panel-apply and trailing GEMMs
    (None = global default; HIGH = bf16_3x MXU passes — near-f32 accuracy
    at ~2x the f32(6-pass) GEMM rate; DEFAULT/bf16 breaks the PSD margin
    and NaNs the factor — measured).
    """
    import jax
    import jax.numpy as jnp

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((a.ndim - 1,), (b.ndim - 2,)), ((0,), (0,))),
            precision=gemm_precision)

    n = A.shape[-1]
    batch = A.shape[:-2]
    cols = []
    trail = A
    for k in range(0, n, nb):
        Lkk = jnp.linalg.cholesky(trail[..., :nb, :nb])
        rest = trail[..., nb:, :nb]                      # (q, n-k-nb, nb)
        if solve_panel:
            Lik = jnp.swapaxes(
                jax.lax.linalg.triangular_solve(
                    Lkk, jnp.swapaxes(rest, -1, -2), left_side=True,
                    lower=True), -1, -2)
        else:
            eye = jnp.broadcast_to(jnp.eye(nb, dtype=A.dtype),
                                   batch + (nb, nb))
            Linv = jax.lax.linalg.triangular_solve(
                Lkk, eye, left_side=True, lower=True)
            Lik = mm(rest, jnp.swapaxes(Linv, -1, -2))
        above = jnp.zeros(batch + (k, nb), dtype=A.dtype)
        cols.append(jnp.concatenate([above, Lkk, Lik], axis=-2))
        if k + nb < n:
            trail = trail[..., nb:, nb:] - mm(Lik,
                                              jnp.swapaxes(Lik, -1, -2))
    return jnp.concatenate(cols, axis=-1)


def measure_rtt(reps=10):
    """Dispatch+transfer round-trip floor: a jitted scalar increment."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda s: s + 1.0)
    s = jnp.float32(0.0)
    float(f(s))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(s))
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--nb', type=int, nargs='*', default=[512, 1024])
    ap.add_argument('--n', type=int, default=4096)
    ap.add_argument('--q', type=int, default=20)
    ap.add_argument('--reps', type=int, default=5)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    import jax.numpy as jnp

    # the realistic factorization target: B = D*C(Matern) + (1+j) I in f32
    from lcgp_tpu.ops.gram import gram_factor_target
    from lcgp_tpu.models import params as P
    rng = np.random.default_rng(0)
    n, q, d = args.n, args.q, 8
    xs = jnp.asarray(rng.uniform(0, 1, (n, d)), dtype=jnp.float32)
    free = P.init_values(np.asarray(xs), rng.standard_normal((10, n)), q,
                         [1] * 10)
    lLmb, lLmb0, _, lnug = P.constrain(free)
    D = jnp.asarray(rng.uniform(0.3, 3.0, q))
    B = jax.jit(lambda: gram_factor_target(
        xs, lLmb, lLmb0, lnug, row_scale=D,
        diag_vec=jnp.full((q, n), 1.0 + 1e-6, dtype=jnp.float32),
        compute_dtype=jnp.float32))()
    B = jax.block_until_ready(B)

    def timed(fn, *a):
        r = jax.jit(lambda *a: jnp.sum(fn(*a), dtype=jnp.float64))
        float(r(*a))
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            float(r(*a))
            ts.append(time.time() - t0)
        return float(np.median(ts)) * 1e3

    print(json.dumps({'rtt_ms': measure_rtt()}), flush=True)

    L_ref = jax.jit(jnp.linalg.cholesky)(B)
    L_ref = jax.block_until_ready(L_ref)
    ms_xla = timed(jnp.linalg.cholesky, B)
    print(json.dumps({'xla_ms': ms_xla}), flush=True)

    variants = [(False, None, '_inv'), (True, None, '_trsm'),
                (False, jax.lax.Precision.HIGH, '_inv_b3x')]
    for nb in args.nb:
        for solve_panel, prec, suffix in variants:
            tag = f'blocked{nb}{suffix}'
            try:
                ms = timed(lambda A, nb=nb, sp=solve_panel, pr=prec:
                           blocked_cholesky(A, nb, sp, pr), B)
                Lb = jax.jit(lambda A, nb=nb, sp=solve_panel, pr=prec:
                             blocked_cholesky(A, nb, sp, pr))(B)
                err = float(jax.jit(
                    lambda a, b: jnp.max(jnp.abs(a - b)))(Lb, L_ref))
                scale = float(jax.jit(lambda a: jnp.max(jnp.abs(a)))(L_ref))
                print(json.dumps({f'{tag}_ms': ms,
                                  f'{tag}_relerr': err / scale}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({tag: f'FAIL {e}'[:160]}), flush=True)


if __name__ == '__main__':
    main()
