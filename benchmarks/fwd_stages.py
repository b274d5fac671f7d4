"""Stage-wise f64 forward breakdown on TPU (round 5).

After the blocked Cholesky landed, the full-path f64 forward still costs
8.57 s/eval (vs 11.32 s for the whole value_and_grad) at the headline
config (n=4096, p=1000, q=20, q_chunk=5).  The forward is just
Gram-build -> Cholesky -> cho_solve_vec -> logdet/quad, so this script
times each stage on one q-chunk (5, 4096, 4096) plus two hypothesis
probes:

- ``exp_probe``: a bare jnp.exp over the chunk stack — isolates the
  emulated-f64 transcendental cost inside the Gram build;
- ``solve_via_inv``: cho_solve_vec re-expressed as tri_inverse_lower +
  two batched matvecs — O(n^3) GEMM flops instead of XLA's sequential
  substitution, the candidate replacement if the solve dominates.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/fwd_stages.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import bench  # noqa: E402

QC = 5
EVALS = 4


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lcgp_tpu.models import likelihood as lik
    from lcgp_tpu.models import params as P
    from lcgp_tpu.ops import linalg
    from lcgp_tpu.ops.gram import gram_factor_target

    out = {'device': str(jax.devices()[0]), 'q_chunk': QC}
    data, free = bench.make_problem()

    lLmb, lLmb0, lsig_g, lnug = P.constrain(free)
    lsig = P.expand_sigma(lsig_g, data.sigma_map)
    psi_c = data.phi / jnp.sqrt(jnp.exp(lsig))[:, None]
    a_full = (data.ys.T @ psi_c).T
    sl = slice(0, QC)
    xs = data.xs
    n = xs.shape[0]
    args = dict(lLmb=lLmb[sl], lLmb0=lLmb0[sl], lnug=lnug[sl],
                D=data.diag_D[sl], a=a_full[sl])

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
        print(f'[fwd_stages] {name}: {med:.4f} s (compile {comp:.1f} s)',
              file=sys.stderr, flush=True)
        return med

    # stage inputs computed once on device
    diag_vec = jnp.full((QC, n), 1.0, dtype=xs.dtype)

    def build_B(lLmb_c, lLmb0_c, lnug_c, D_c):
        return gram_factor_target(xs, lLmb_c, lLmb0_c, lnug_c,
                                  row_scale=D_c, diag_vec=diag_vec)

    B = jax.jit(build_B)(args['lLmb'], args['lLmb0'], args['lnug'], args['D'])
    B.block_until_ready()
    L = jax.jit(linalg.cholesky)(B)
    L.block_until_ready()

    timed('gram', build_B, args['lLmb'], args['lLmb0'], args['lnug'],
          args['D'])
    timed('exp_probe', lambda M: jnp.exp(-jnp.abs(M)), B)
    timed('chol_blocked', linalg.cholesky, B)
    timed('solve_tri', linalg.cho_solve_vec, L, args['a'])

    def solve_via_inv(L_c, a_c):
        Linv = linalg.tri_inverse_lower(L_c)
        z = jnp.einsum('qij,qj->qi', Linv, a_c)
        return jnp.einsum('qij,qi->qj', Linv, z)

    timed('solve_via_inv', solve_via_inv, L, args['a'])

    def fwd_chunked(fr, d):
        return lik.neglpost_full(fr, d, q_chunk=QC)

    timed('fwd_total', fwd_chunked, free, data)

    chunks = a_full.shape[0] // QC
    staged = (out['gram'] + out['chol_blocked'] + out['solve_tri']) * chunks
    out['staged_x_chunks'] = round(staged, 4)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
