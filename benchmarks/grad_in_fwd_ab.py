"""A/B: gradient-in-forward custom-VJP losses (round 5) on TPU.

Times ONLY the f64 full and rep value_and_grad at the headline config
(n=4096, p=1000, q=20, q_chunk=5) — the two numbers the restructure
targets.  Compare against the pre-change measurements in commit 6ae82fa:
full 10.97 s/eval, rep 10.53 s/eval.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/grad_in_fwd_ab.py
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

    from lcgp_tpu.models import likelihood as lik

    out = {'device': str(jax.devices()[0]), 'q_chunk': QC}

    def timed(name, vg, free, data):
        fused = bench.fuse_scalar(vg)
        t0 = time.time()
        float(fused(free, data))
        out[name + '_compile_s'] = round(time.time() - t0, 1)
        ts = []
        for _ in range(EVALS):
            t0 = time.time()
            float(fused(free, data))
            ts.append(time.time() - t0)
        out[name] = round(float(np.median(ts)), 4)
        print(f'[ab] {name}: {out[name]:.4f} s '
              f'(compile {out[name + "_compile_s"]:.1f} s)',
              file=sys.stderr, flush=True)

    data, free = bench.make_problem()
    timed('full_f64_secs_per_eval',
          jax.jit(lambda fr, d: jax.value_and_grad(
              lambda f_: lik.neglpost_full(f_, d, q_chunk=QC))(fr)),
          free, data)
    del data, free

    rep_data, rep_free = bench.make_rep_problem()
    timed('rep_f64_secs_per_eval',
          jax.jit(lambda fr, d: jax.value_and_grad(
              lambda f_: lik.neglpost_rep(f_, d, q_chunk=QC))(fr)),
          rep_free, rep_data)

    print(json.dumps(out))


if __name__ == '__main__':
    main()
