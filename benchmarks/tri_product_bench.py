"""Microbenchmark: structured triangular products vs dense GEMMs on TPU.

The mixed refinement residual (L @ L^T, L lower triangular) and the potri
combination (Linv^T @ Linv) are the dominant GEMMs of the mixed forward
and of every loss backward.  ``syrk_tri_lower`` / ``gram_tri_lower``
(ops/linalg.py) compute them with strip GEMMs at the true n^3/3 flop cost
instead of the dense 2n^3 XLA emits.  This script times both forms at the
shape the executables actually see — one loss chunk of the headline
config (q=q_chunk=5, n=4096; the q=20 stack is processed as four such
chunks) — in f64 and f32(bf16_3x), printing one JSON line per case.
The published RESULTS.md table was produced with these defaults.

Usage: python -u benchmarks/tri_product_bench.py [--cpu] [--n 4096] [--q 5]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--n', type=int, default=4096)
    ap.add_argument('--q', type=int, default=5)
    ap.add_argument('--reps', type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import jax
    import jax.numpy as jnp
    from jax import lax
    from lcgp_tpu.ops import linalg

    n, q = args.n, args.q
    rng = np.random.default_rng(0)
    A = rng.standard_normal((q, n, 32))
    B64 = jnp.asarray(A @ np.swapaxes(A, -1, -2) + 5.0 * np.eye(n))
    L64 = jnp.linalg.cholesky(B64)
    L32 = L64.astype(jnp.float32)

    def timed(fn, *xs):
        # fused scalar sync: block_until_ready is unreliable on axon
        f = jax.jit(lambda *a: jnp.sum(fn(*a), dtype=jnp.float64))
        float(f(*xs))
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            float(f(*xs))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    cases = {}
    cases['syrk_dense_f64'] = timed(
        lambda L: L @ jnp.swapaxes(L, -1, -2), L64)
    cases['syrk_tri_f64'] = timed(linalg.syrk_tri_lower, L64)
    cases['gram_dense_f64'] = timed(
        lambda M: jnp.swapaxes(M, -1, -2) @ M, L64)
    cases['gram_tri_f64'] = timed(linalg.gram_tri_lower, L64)
    hi = lax.Precision.HIGH
    cases['gram_dense_f32_3x'] = timed(
        lambda M: jnp.matmul(jnp.swapaxes(M, -1, -2), M, precision=hi), L32)
    cases['gram_tri_f32_3x'] = timed(
        lambda M: linalg.gram_tri_lower(M, precision=hi), L32)

    # full mixed refinement step, dense form vs shipped structured form
    from lcgp_tpu.ops.mixed import _phi_lower

    def refine_dense(B, L):
        R = B - L @ jnp.swapaxes(L, -1, -2)
        L32 = L.astype(jnp.float32)
        M = linalg.tri_inverse_lower(L32)
        X = (M @ R.astype(jnp.float32)) @ jnp.swapaxes(M, -1, -2)
        return L + (L32 @ _phi_lower(X)).astype(B.dtype)

    def refine_tri(B, L):
        R = B - linalg.syrk_tri_lower(L)
        L32 = L.astype(jnp.float32)
        M = linalg.tri_inverse_lower(L32)
        Y = linalg.trmm_lower(M, R.astype(jnp.float32))
        X = linalg.mul_t_block_lower(Y, M)
        return L + linalg.mul_lower_lower(
            L32, _phi_lower(X)).astype(B.dtype)

    cases['refine_step_dense_f64'] = timed(refine_dense, B64, L64)
    cases['refine_step_tri_f64'] = timed(refine_tri, B64, L64)

    out = dict(n=n, q=q, device=str(jax.devices()[0]),
               **{k: round(v, 4) for k, v in cases.items()})
    out['syrk_f64_speedup'] = round(
        cases['syrk_dense_f64'] / cases['syrk_tri_f64'], 2)
    out['gram_f64_speedup'] = round(
        cases['gram_dense_f64'] / cases['gram_tri_f64'], 2)
    out['gram_f32_speedup'] = round(
        cases['gram_dense_f32_3x'] / cases['gram_tri_f32_3x'], 2)
    out['refine_step_speedup'] = round(
        cases['refine_step_dense_f64'] / cases['refine_step_tri_f64'], 2)
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
