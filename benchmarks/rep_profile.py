"""Rep-vs-full f64 per-eval breakdown on TPU (VERDICT r4 item 1).

BENCH_r04: rep f64 = 12.40 s/eval vs full f64 = 11.36 s/eval at the same
factorization sizes (n=4096, q=20, q_chunk=5).  The hot ops (Gram build,
batched Cholesky, solve, tri-inverse, kernel VJP) are shape-identical on
the two paths, so the ~1 s gap must be a scheduling/layout artifact or
O(qn)/O(pn) assembly work gone wrong.  This script times forward-only and
value_and_grad for both losses with the same single-transfer sync bench.py
uses, so fwd/bwd gaps separate.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/rep_profile.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import bench  # noqa: E402  (problem builders + sync helpers)

QC = 5
EVALS = 5


def time_fused(fn, free, data):
    import numpy as np
    fused = bench.fuse_scalar(fn)
    t0 = time.time()
    float(fused(free, data))
    compile_s = time.time() - t0
    times = []
    for _ in range(EVALS):
        t0 = time.time()
        float(fused(free, data))
        times.append(time.time() - t0)
    return float(np.median(times)), compile_s


def main():
    import jax

    from lcgp_tpu.models import likelihood as lik

    out = {'device': str(jax.devices()[0]), 'q_chunk': QC}

    data, free = bench.make_problem()
    rep_data, rep_free = bench.make_rep_problem()

    def fwd_full(fr, d):
        v = lik.neglpost_full(fr, d, q_chunk=QC)
        return v, jax.tree.map(lambda x: x * 0.0, fr)

    def fwd_rep(fr, d):
        v = lik.neglpost_rep(fr, d, q_chunk=QC)
        return v, jax.tree.map(lambda x: x * 0.0, fr)

    def vg_full(fr, d):
        return jax.value_and_grad(
            lambda f_: lik.neglpost_full(f_, d, q_chunk=QC))(fr)

    def vg_rep(fr, d):
        return jax.value_and_grad(
            lambda f_: lik.neglpost_rep(f_, d, q_chunk=QC))(fr)

    for name, fn, fr, d in (
            ('full_fwd', fwd_full, free, data),
            ('rep_fwd', fwd_rep, rep_free, rep_data),
            ('full_vg', vg_full, free, data),
            ('rep_vg', vg_rep, rep_free, rep_data)):
        secs, comp = time_fused(fn, fr, d)
        out[name] = round(secs, 4)
        out[name + '_compile_s'] = round(comp, 1)
        print(f'[rep_profile] {name}: {secs:.4f} s/eval '
              f'(compile {comp:.1f} s)', file=sys.stderr, flush=True)

    out['full_bwd_est'] = round(out['full_vg'] - out['full_fwd'], 4)
    out['rep_bwd_est'] = round(out['rep_vg'] - out['rep_fwd'], 4)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
