"""A/B the blocked-triangular-inverse block size for the f32 backward.

``ops.linalg.chol_inverse`` (tri_inverse_lower + bf16_3x syrk) is the
largest single op in the f32 NLL-grad eval (~70 ms net of RTT at the
headline config, ~47% of the amortized eval).  The 512 block was tuned
for f64; the f32/bf16_3x GEMM rate is ~50-100x higher, shifting the
balance between the diagonal-block trsm (serial-ish) and the
combination GEMMs (MXU).

  PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/inv_block_ab.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lcgp_tpu.ops import linalg

    q, n = 20, 4096
    rng = np.random.default_rng(0)
    a = rng.standard_normal((q, n, 8)).astype(np.float32)
    B = a @ a.transpose(0, 2, 1) + 4.0 * np.eye(n, dtype=np.float32)
    L = np.linalg.cholesky(B)
    Ld = jnp.asarray(L)

    @jax.jit
    def ref_inv(Ld):
        eye = jnp.broadcast_to(jnp.eye(n, dtype=Ld.dtype), Ld.shape)
        linv = linalg.solve_tri_lower(Ld, eye)
        return jnp.einsum('...kn,...km->...nm', linv, linv,
                          precision=jax.lax.Precision.HIGH)

    def timed(fn, *args, reps=5):
        out = fn(*args)
        float(jnp.sum(out[0, -1]))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            float(jnp.sum(out[0, -1]))
            ts.append(time.time() - t0)
        return float(np.median(ts)), out

    t_ref, X_ref = timed(ref_inv, Ld)
    X_ref = np.asarray(X_ref[0])
    print(json.dumps({'variant': 'trsm_identity+syrk', 'ms': round(t_ref * 1e3, 1)}),
          flush=True)

    for nb in (256, 512, 1024, 2048):
        linalg._TRI_INV_BLOCK = nb
        f = jax.jit(linalg.chol_inverse)
        t, X = timed(f, Ld)
        err = float(np.max(np.abs(np.asarray(X[0]) - X_ref))
                    / np.max(np.abs(X_ref)))
        print(json.dumps({'variant': f'blocked nb={nb}', 'ms': round(t * 1e3, 1),
                          'relerr_vs_trsm': float(f'{err:.2e}')}), flush=True)
        jax.clear_caches()


if __name__ == '__main__':
    main()
