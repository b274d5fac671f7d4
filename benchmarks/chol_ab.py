"""A/B: blocked f64 Cholesky batch-width and block-size variants (round 5).

fwd_stages.py showed the f64 forward is ~86% Cholesky: 1.92 s per
(5, 4096, 4096) chunk, so 7.7 s of the 11.7 s/eval headline f64 cost.
Inside cholesky_blocked the GEMMs are ~0.2 s (2n^3/3 at ~1.4 TFLOP/s);
the rest is 8 sequential diagonal-block factorizations + triangular
inversions at batch 5.  Those per-step costs are latency-like, so
batching MORE components per call should amortize them: this script
times the blocked Cholesky at batch 20 (one call), 10 (x2), 5 (x4), and
block sizes 256/512/1024 at batch 20, plus the per-step primitives
(native chol and tri-solve on (b, 512, 512)) that explain the totals.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/chol_ab.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import bench  # noqa: E402

N = 4096
EVALS = 3


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lcgp_tpu.ops import linalg

    out = {'device': str(jax.devices()[0]), 'n': N}

    # One well-conditioned SPD stack, sliced for the batch variants.
    rng = np.random.default_rng(0)
    M = rng.standard_normal((20, N, 64)) / np.sqrt(64)
    A20 = jnp.asarray(M @ np.swapaxes(M, -1, -2) + 1.5 * np.eye(N))
    assert A20.dtype == jnp.float64

    def timed(name, fn, *inputs):
        @jax.jit
        def fused(*ins):
            return jnp.sum(fn(*ins).astype(jnp.float64))
        t0 = time.time()
        float(fused(*inputs))
        comp = time.time() - t0
        ts = []
        for _ in range(EVALS):
            t0 = time.time()
            float(fused(*inputs))
            ts.append(time.time() - t0)
        med = float(np.median(ts))
        out[name] = round(med, 4)
        out[name + '_compile_s'] = round(comp, 1)
        print(f'[chol_ab] {name}: {med:.4f} s (compile {comp:.1f} s)',
              file=sys.stderr, flush=True)
        return med

    # per-step primitives at the two batch widths
    d5 = A20[:5, :512, :512]
    d20 = A20[:, :512, :512]
    timed('chol512_b5', jnp.linalg.cholesky, d5)
    timed('chol512_b20', jnp.linalg.cholesky, d20)
    eye5 = jnp.broadcast_to(jnp.eye(512, dtype=A20.dtype), (5, 512, 512))
    eye20 = jnp.broadcast_to(jnp.eye(512, dtype=A20.dtype), (20, 512, 512))
    L5 = jnp.linalg.cholesky(d5)
    L20 = jnp.linalg.cholesky(d20)
    timed('trisolve512_b5', linalg.solve_tri_lower, L5, eye5)
    timed('trisolve512_b20', linalg.solve_tri_lower, L20, eye20)

    # headline variants
    t5 = timed('blk512_b5', linalg.cholesky_blocked, A20[:5])
    out['blk512_b5_x4'] = round(4 * t5, 4)
    t10 = timed('blk512_b10', linalg.cholesky_blocked, A20[:10])
    out['blk512_b10_x2'] = round(2 * t10, 4)
    try:
        timed('blk512_b20', linalg.cholesky_blocked, A20)
        timed('blk256_b20', lambda a: linalg.cholesky_blocked(a, block=256),
              A20)
        timed('blk1024_b20', lambda a: linalg.cholesky_blocked(a, block=1024),
              A20)
    except Exception as e:  # noqa: BLE001 — OOM at full batch is a finding
        out['b20_error'] = f'{type(e).__name__}: {str(e)[:200]}'
        print(f'[chol_ab] b20 failed: {e}', file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == '__main__':
    main()
