"""Headline benchmark (BASELINE.json north-star config).

Times NLL+gradient evaluations of the full-data loss at n=4096, p=1000,
q=20, d=8 on the default backend (TPU), in float64 (the reference's dtype —
the conservative apples-to-apples number) and float32 (the MXU fast path).

Prints ONE JSON line:
  {"metric": ..., "value": evals/sec (f64), "unit": "evals/s",
   "vs_baseline": value / CPU-reference-equivalent evals/sec, ...extras}

The denominator comes from benchmarks/bench_baseline.json, measured once by
benchmarks/baseline_cpu.py (JAX-CPU jit of the reference's per-k eigh path;
see that file's methodology note — it is equal-or-faster than the real
TF/GPflow reference, so vs_baseline is conservative).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

N, P_OUT, Q, D = 4096, 1000, 20, 8
WARMUP = 1
EVALS = 5


def make_problem():
    import jax.numpy as jnp
    from lcgp_tpu.models import basis as basis_mod
    from lcgp_tpu.models import likelihood as lik
    from lcgp_tpu.models import params as P

    rng = np.random.default_rng(0)
    xs = rng.uniform(0, 1, (N, D))
    t = np.linspace(0, 1, P_OUT)[:, None]
    ys = (np.sin(2 * np.pi * (t + xs[:, :1].T)) +
          0.05 * rng.standard_normal((P_OUT, N)))
    ys = (ys - ys.mean(1, keepdims=True)) / ys.std(1, keepdims=True)
    b = basis_mod.init_phi(ys, q=Q)
    data = lik.FullData(xs=jnp.asarray(xs), ys=jnp.asarray(ys),
                        phi=jnp.asarray(b.phi), diag_D=jnp.asarray(b.diag_D),
                        sigma_map=jnp.asarray(P.sigma_index_map([1] * P_OUT)))
    free = P.init_values(xs, ys, Q, [1] * P_OUT)
    return data, free


def time_evals(vg, free, data):
    import jax
    for _ in range(WARMUP):
        out = vg(free, data)
    jax.block_until_ready(out)
    times = []
    for _ in range(EVALS):
        t0 = time.time()
        out = vg(free, data)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    return float(np.median(times))


def main():
    import jax
    from functools import partial
    from lcgp_tpu.models import likelihood as lik

    data, free = make_problem()

    vg64 = jax.jit(jax.value_and_grad(
        lambda fr, d: lik.neglpost_full(fr, d)))
    secs64 = time_evals(vg64, free, data)

    vg32 = jax.jit(jax.value_and_grad(
        lambda fr, d: lik.neglpost_full(fr, d, compute_dtype=jax.numpy.float32,
                                        jitter=1e-6)))
    secs32 = time_evals(vg32, free, data)

    evals64 = 1.0 / secs64
    evals32 = 1.0 / secs32

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             'benchmarks', 'bench_baseline.json')
    vs64 = vs32 = None
    base_evals = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        base_evals = base.get('evals_per_sec_cpu')
        if base_evals:
            vs64 = evals64 / base_evals
            vs32 = evals32 / base_evals

    dev = str(jax.devices()[0])
    print(json.dumps({
        'metric': 'nll_grad_evals_per_sec_n4096_p1000_q20_f64',
        'value': round(evals64, 4),
        'unit': 'evals/s',
        'vs_baseline': round(vs64, 2) if vs64 else None,
        'secs_per_eval_f64': round(secs64, 4),
        'evals_per_sec_f32': round(evals32, 4),
        'vs_baseline_f32': round(vs32, 2) if vs32 else None,
        'baseline_cpu_evals_per_sec': base_evals,
        'device': dev,
    }))


if __name__ == '__main__':
    main()
