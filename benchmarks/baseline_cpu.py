"""Measure the CPU 'reference-equivalent' denominator for BENCH.

The reference (TF/GPflow, CPU) evaluates its full-data loss as a Python loop
of q eigendecompositions of the (n,n) Gram matrix per objective/gradient
evaluation (reference lcgp.py:650-652), inside TF graph mode, with autodiff
gradients.  No TF/GPflow install exists here, so we measure a faithful
stand-in: the same per-k eigh-based algebra in JAX on CPU (jit-compiled,
multithreaded LAPACK — if anything *generous* to the reference), with
jax.grad.

Writes benchmarks/bench_baseline.json with secs/eval at the north-star
config (n=4096, p=1000, q=20, d=8) — the denominator bench.py uses.

Usage: python benchmarks/baseline_cpu.py [--n 4096] [--evals 2]
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=4096)
    ap.add_argument('--p', type=int, default=1000)
    ap.add_argument('--q', type=int, default=20)
    ap.add_argument('--d', type=int, default=8)
    ap.add_argument('--evals', type=int, default=2)
    ap.add_argument('--extrapolate-to', type=int, default=None,
                    help='also report secs/eval extrapolated to this n by '
                         'the O(n^3) factorization scaling (conservative: '
                         'cache effects make real large-n slower than n^3)')
    ap.add_argument('--rep', action='store_true',
                    help='measure the rep-submethod denominator instead '
                         '(reference lcgp.py:554-630: per-k Python loop, '
                         'Woodbury solve + slogdet per component); merges '
                         'rep_* keys into the existing JSON')
    ap.add_argument('--rbar', type=int, default=10)
    ap.add_argument('--out', default=os.path.join(os.path.dirname(__file__),
                                                  'bench_baseline.json'))
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    import jax.numpy as jnp

    from lcgp_tpu.models import basis as basis_mod
    from lcgp_tpu.models import params as P
    from lcgp_tpu.ops.matern import matern32_gram

    rng = np.random.default_rng(0)
    xs = rng.uniform(0, 1, (args.n, args.d))
    t = np.linspace(0, 1, args.p)[:, None]
    ys = (np.sin(2 * np.pi * (t + xs[:, :1].T)) +
          0.05 * rng.standard_normal((args.p, args.n)))
    ys = (ys - ys.mean(1, keepdims=True)) / ys.std(1, keepdims=True)
    b = basis_mod.init_phi(ys, q=args.q)
    phi = jnp.asarray(b.phi)
    diag_D = jnp.asarray(b.diag_D)
    xs_j = jnp.asarray(xs)
    ys_j = jnp.asarray(ys)
    sigma_map = jnp.asarray(P.sigma_index_map([1] * args.p))
    free = P.init_values(xs, ys, args.q, [1] * args.p)

    if args.rep:
        # replicate-averaged data at the same sites (ybar == ys here; the
        # reference's rep cost does not depend on the raw replicate count,
        # only on n_unique — r enters as a vector)
        r_j = jnp.full(args.n, float(args.rbar))
        sr = jnp.sqrt(r_j)

        def neglpost_rep_ref(free):
            """Reference rep loss (lcgp.py:554-630): per-k Python loop,
            dense Woodbury solve + slogdet per component."""
            lLmb, lLmb0, lsig_g, lnug = P.constrain(free)
            lsig = P.expand_sigma(lsig_g, sigma_map)
            sigma = jnp.exp(lsig)
            n = xs_j.shape[0]
            p = ys_j.shape[0]
            sigma_inv_sqrt = 1.0 / jnp.sqrt(sigma)
            nlp = 0.5 * jnp.sum(r_j * jnp.sum(
                jnp.square(ys_j * sigma_inv_sqrt[:, None]), axis=0))
            nlp += 0.5 * n * jnp.sum(lsig)
            nlp += -0.5 * p * jnp.sum(jnp.log(r_j))
            for k in range(args.q):
                Ck = matern32_gram(xs_j, xs_j, lLmb[k][None], lLmb0[k][None],
                                   lnug[k][None], same=True)[0]
                v_k = sigma_inv_sqrt * phi[:, k]
                b_k = r_j * (ys_j.T @ v_k)
                d_k = diag_D[k]
                A = jnp.eye(n) + d_k * (Ck * sr[None, :] * sr[:, None])
                Cb = Ck @ b_k
                z = jnp.linalg.solve(A, jnp.sqrt(d_k) * sr * Cb)
                Sb = Cb - Ck @ (jnp.sqrt(d_k) * sr * z)
                nlp += -0.5 * (b_k @ Sb)
                nlp += 0.5 * jnp.linalg.slogdet(A)[1]
            return nlp / n

        vg = jax.jit(jax.value_and_grad(neglpost_rep_ref))
        t0 = time.time()
        v, g = vg(free)
        jax.block_until_ready((v, g))
        print(f'rep first eval (incl compile): {time.time() - t0:.1f}s '
              f'loss={float(v):.4f}', flush=True)
        times = []
        for _ in range(args.evals):
            t0 = time.time()
            v, g = vg(free)
            jax.block_until_ready((v, g))
            times.append(time.time() - t0)
            print(f'rep eval: {times[-1]:.1f}s', flush=True)
        secs = float(np.median(times))
        target_n = args.extrapolate_to or args.n
        scale = (target_n / args.n) ** 3
        rep_keys = {
            'rep_measured_n': args.n,
            'rep_rbar': args.rbar,
            'rep_secs_per_nll_grad_eval_cpu_measured': secs,
            'rep_secs_per_nll_grad_eval_cpu': secs * scale,
            'rep_evals_per_sec_cpu': 1.0 / (secs * scale),
        }
        existing = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                existing = json.load(f)
        existing.update(rep_keys)
        with open(args.out, 'w') as f:
            json.dump(existing, f, indent=2)
        print('wrote rep keys to', args.out, json.dumps(rep_keys),
              flush=True)
        return

    def neglpost_eigh(free):
        """Reference-path loss: Python loop over q, eigh per component."""
        lLmb, lLmb0, lsig_g, lnug = P.constrain(free)
        lsig = P.expand_sigma(lsig_g, sigma_map)
        sigma = jnp.exp(lsig)
        n = xs_j.shape[0]
        psi_c = phi / jnp.sqrt(sigma)[:, None]
        A = (ys_j.T @ psi_c).T  # (q, n)
        nlp = 0.0
        for k in range(args.q):
            Ck = matern32_gram(xs_j, xs_j, lLmb[k][None], lLmb0[k][None],
                               lnug[k][None], same=True)[0]
            W, U = jnp.linalg.eigh(Ck)
            Qk = (U * (1.0 / (diag_D[k] + 1.0 / W))[None, :]) @ U.T
            nlp += 0.5 * jnp.sum(jnp.log(1 + diag_D[k] * W))
            nlp += -0.5 * (A[k] @ Qk @ A[k])
        nlp += 0.5 * n * jnp.sum(lsig)
        nlp += 0.5 * jnp.sum(jnp.square(ys_j / jnp.sqrt(sigma)[:, None]))
        return nlp

    vg = jax.jit(jax.value_and_grad(neglpost_eigh))

    t0 = time.time()
    v, g = vg(free)
    jax.block_until_ready((v, g))
    compile_and_first = time.time() - t0
    print(f'first eval (incl compile): {compile_and_first:.1f}s '
          f'loss={float(v):.4f}', flush=True)

    times = []
    for _ in range(args.evals):
        t0 = time.time()
        v, g = vg(free)
        jax.block_until_ready((v, g))
        times.append(time.time() - t0)
        print(f'eval: {times[-1]:.1f}s', flush=True)

    secs = float(np.median(times))
    measured_n = args.n
    target_n = args.extrapolate_to or args.n
    scale = (target_n / measured_n) ** 3
    secs_target = secs * scale
    out = {
        'config': {'n': target_n, 'p': args.p, 'q': args.q, 'd': args.d,
                   'dtype': 'float64'},
        'measured_n': measured_n,
        'secs_per_nll_grad_eval_cpu_measured': secs,
        'extrapolation_factor_n_cubed': scale,
        'secs_per_nll_grad_eval_cpu': secs_target,
        'evals_per_sec_cpu': 1.0 / secs_target,
        'methodology': (
            'JAX-CPU jit of the reference computational path (per-k Python '
            'loop, eigh per component, autodiff gradient), float64, '
            'multithreaded LAPACK. The actual TF/GPflow reference cannot run '
            'here (no TF-probability/GPflow); this stand-in is equal-or-'
            'faster than the reference, so speedups vs it are conservative. '
            'Host has a single CPU core; when --extrapolate-to is used, the '
            'large-n cost is the measured cost scaled by (n_target/n)^3 — '
            'the exact flop scaling of the dominant per-k factorizations, '
            'and a lower bound on real cost (cache effects worsen with n).'),
    }
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=2)
    print('wrote', args.out, json.dumps(out['config']), secs, flush=True)


if __name__ == '__main__':
    main()
