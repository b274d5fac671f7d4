"""A/B round 2: diagonal-block strategies for the blocked f64 Cholesky.

chol_ab.py found: native chol on (5,512,512) f64 = 0.249 s while batch 20
is only 0.513 s — a ~0.16 s per-call serial floor dominates at batch 5,
so the 8 diagonal steps cost ~1.9 s of the 1.92 s blocked factorization.
Batching more components per call OOMs (b10 bare chol RESOURCE_EXHAUSTED
on this ~10 GB-budget chip), so the remaining lever is making each
diagonal step cheaper: this script measures how the native chol scales
with block size at batch 5 (128/256/512/1024) and times recursive
two-level blocked variants of the full (5,4096,4096) factorization.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/chol_ab2.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, '/root/repo')

N = 4096
EVALS = 3


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lcgp_tpu.ops import linalg

    out = {'device': str(jax.devices()[0]), 'n': N}

    rng = np.random.default_rng(0)
    M = rng.standard_normal((5, N, 64)) / np.sqrt(64)
    A5 = jnp.asarray(M @ np.swapaxes(M, -1, -2) + 1.5 * np.eye(N))
    assert A5.dtype == jnp.float64

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
        print(f'[chol_ab2] {name}: {med:.4f} s (compile {comp:.1f} s)',
              file=sys.stderr, flush=True)
        return med

    # native chol size scaling at batch 5
    for nb in (128, 256, 1024):
        timed(f'chol{nb}_b5', jnp.linalg.cholesky, A5[:, :nb, :nb])

    def blocked_two_level(A, nb, diag_nb):
        """cholesky_blocked with the diagonal block itself factored by the
        blocked algorithm at a finer block (recursion depth 1)."""
        n = A.shape[-1]
        batch = A.shape[:-2]
        eye = jnp.broadcast_to(jnp.eye(nb, dtype=A.dtype), batch + (nb, nb))
        cols = []
        trail = A
        for k in range(0, n, nb):
            Lkk = linalg.cholesky_blocked(trail[..., :nb, :nb],
                                          block=diag_nb)
            above = jnp.zeros(batch + (k, nb), dtype=A.dtype)
            if k + nb == n:
                cols.append(jnp.concatenate([above, Lkk], axis=-2))
                break
            Lkk_inv = linalg.solve_tri_lower(Lkk, eye)
            panel = jnp.matmul(trail[..., nb:, :nb],
                               jnp.swapaxes(Lkk_inv, -1, -2))
            cols.append(jnp.concatenate([above, Lkk, panel], axis=-2))
            trail = trail[..., nb:, nb:] - jnp.matmul(
                panel, jnp.swapaxes(panel, -1, -2))
        return jnp.concatenate(cols, axis=-1)

    # recursive diagonal factor on one 512 block
    timed('blk128_of_512_b5',
          lambda a: linalg.cholesky_blocked(a, block=128),
          A5[:, :512, :512])

    # full-matrix variants
    timed('blk512_diag128_b5', lambda a: blocked_two_level(a, 512, 128), A5)
    timed('blk1024_diag256_b5', lambda a: blocked_two_level(a, 1024, 256),
          A5)
    timed('blk256_b5', lambda a: linalg.cholesky_blocked(a, block=256), A5)

    print(json.dumps(out))


if __name__ == '__main__':
    main()
