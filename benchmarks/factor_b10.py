"""Prototype: factor the f64 Gram stack in batch-10 halves (round 5).

chol_ab measured the native (512,512) diagonal-block chol at 0.249 s for
batch 5 but only 0.513 s for batch 20 — a large per-step serial cost that
wider batches amortize.  The loss currently factors per q_chunk=5 chunk
(4 x 8 = 32 serial diagonal steps/eval); factoring in two batch-10 halves
would cut that to 16 while the backward stays chunked at 5 for memory.
This prototypes the forward's factor stage exactly as the hoisted design
would run it — B halves BUILT inside the lax.map body (no full-B buffer),
fused chol+inverse, diag extracted in-body so L dies there — and times it
against the equivalent 4-chunk stage.  OOM here kills the design.

MEASURED (TPU v5 lite, n=4096 q=20 f64): factor_stage_b5 = 9.20 s,
factor_stage_b10 = 9.09 s — a 1.2% gain, nowhere near the ~2x the
diagonal-step model predicted.  The serial cost the wider batch was meant
to amortize is NOT per-diagonal-step dispatch; the blocked factorization
is wall-limited elsewhere (XLA schedules the per-step work the same way
at either batch).  Conclusion: batch-widened factoring is a dead end —
the loss keeps q_chunk=5 end to end.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/factor_b10.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import bench  # noqa: E402

EVALS = 3


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lcgp_tpu.models import params as P
    from lcgp_tpu.ops import linalg
    from lcgp_tpu.ops.gram import gram_factor_target

    out = {'device': str(jax.devices()[0])}
    data, free = bench.make_problem()
    lLmb, lLmb0, lsig_g, lnug = P.constrain(free)
    xs, D = data.xs, data.diag_D
    n, q = xs.shape[0], D.shape[0]

    def factor_stage(qc):
        nchunks = q // qc

        def body(stacks):
            lL, lA, lN, Dc = stacks
            diag_vec = jnp.full((qc, n), 1.0, dtype=xs.dtype)
            B = gram_factor_target(xs, lL, lA, lN, row_scale=Dc,
                                   diag_vec=diag_vec)
            L, X = linalg.cholesky_tri_inverse(B)
            return jnp.diagonal(L, axis1=-2, axis2=-1), X

        def stage(lL, lA, lN, Dv):
            st = jax.tree.map(
                lambda x: x.reshape((nchunks, qc) + x.shape[1:]),
                (lL, lA, lN, Dv))
            diags, Xs = jax.lax.map(body, st)
            return (jnp.sum(jnp.log(diags).astype(jnp.float64))
                    + jnp.sum(Xs[..., ::997, ::997].astype(jnp.float64)))

        return stage

    for qc in (5, 10):
        name = f'factor_stage_b{qc}'
        try:
            fn = jax.jit(factor_stage(qc))
            t0 = time.time()
            float(fn(lLmb, lLmb0, lnug, D))
            comp = time.time() - t0
            ts = []
            for _ in range(EVALS):
                t0 = time.time()
                float(fn(lLmb, lLmb0, lnug, D))
                ts.append(time.time() - t0)
            out[name] = round(float(np.median(ts)), 4)
            out[name + '_compile_s'] = round(comp, 1)
            print(f'[factor_b10] {name}: {out[name]:.4f} s '
                  f'(compile {comp:.1f} s)', file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            out[name + '_error'] = f'{type(e).__name__}: {str(e)[:200]}'
            print(f'[factor_b10] {name} failed: {e}', file=sys.stderr,
                  flush=True)
            jax.clear_caches()

    print(json.dumps(out))


if __name__ == '__main__':
    main()
