"""f32 op-level breakdown at the headline config (VERDICT r2 item #2).

Times each op of the f32 loss eval at n=4096, p=1000, q=20, d=8 on the
default backend, and A/Bs a GEMM-blocked f32 Cholesky (panel factor via
XLA's expander at small block size + MXU GEMM trailing updates) against
XLA's stock batched Cholesky.  Prints each measurement as it lands
(remote compiles take minutes each).  Run:

  PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/f32_breakdown.py \
      [gram chol blocked256 blocked512 blocked1024 tri vjp e2e]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

N, P_OUT, Q, D = 4096, 1000, 20, 8
REPS = 5


def reduced(fn):
    """Wrap fn so it returns ONE on-device scalar: forces the whole
    computation (no DCE) while the host sync is exactly one transfer.
    (Per-leaf transfers each pay the tunnel's ~30 ms RTT — a 5-leaf
    grad pytree inflated the e2e number by ~150 ms before this fix; a
    full-array fetch is ~70 s.)"""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def wrapped(*args):
        out = fn(*args)
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(a, dtype=jnp.float64) for a in leaves)
    return wrapped


def sync_time(fn, *args, reps=REPS, warmup=1):
    """Time a `reduced` callable; the single-scalar host transfer is the
    only trustworthy sync on the axon backend."""
    for _ in range(warmup):
        float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    which = set(sys.argv[1:]) or {'gram', 'chol', 'blocked512', 'tri',
                                  'vjp', 'e2e'}
    import jax
    import jax.numpy as jnp
    from lcgp_tpu.models import basis as basis_mod
    from lcgp_tpu.models import likelihood as lik
    from lcgp_tpu.models import params as P
    from lcgp_tpu.ops import linalg
    from lcgp_tpu.ops.gram import gram_factor_target, gram_stack, gram_vjp

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

    lLmb, lLmb0, lsig_g, lnug = P.constrain(free)
    lsig = P.expand_sigma(lsig_g, data.sigma_map)
    sigma = jnp.exp(lsig)
    psi_c = data.phi / jnp.sqrt(sigma)[:, None]
    a = jnp.asarray((data.ys.T @ psi_c).T, dtype=jnp.float32)

    f32 = jnp.float32
    xs32 = jnp.asarray(xs, dtype=f32)
    jitter = 1e-6

    results = {}

    def rec(key, value):
        results[key] = value
        print(json.dumps({key: value}), flush=True)

    # -- Gram / factor-target build ------------------------------------
    def build_raw():
        return gram_factor_target(
            xs32, lLmb, lLmb0, lnug, row_scale=data.diag_D,
            diag_vec=jnp.full((Q, N), 1.0 + jitter, dtype=f32),
            compute_dtype=f32)
    if 'gram' in which:
        rec('gram_build_ms', sync_time(reduced(build_raw)) * 1e3)
    B = jax.block_until_ready(jax.jit(build_raw)())

    # -- stock XLA batched Cholesky ------------------------------------
    if 'chol' in which:
        rec('cholesky_xla_ms', sync_time(reduced(jnp.linalg.cholesky), B) * 1e3)
    L = jax.block_until_ready(jax.jit(jnp.linalg.cholesky)(B))

    # -- blocked GEMM-dominant Cholesky --------------------------------
    def blocked_chol(A, nb):
        n = A.shape[-1]
        Lout = jnp.zeros_like(A)
        for k in range(0, n, nb):
            kk = slice(k, k + nb)
            Lkk = jnp.linalg.cholesky(A[..., kk, kk])
            Lout = Lout.at[..., kk, kk].set(Lkk)
            if k + nb < n:
                below = slice(k + nb, n)
                eye = jnp.broadcast_to(jnp.eye(nb, dtype=A.dtype),
                                       A.shape[:-2] + (nb, nb))
                Linv = jax.lax.linalg.triangular_solve(
                    Lkk, eye, left_side=True, lower=True)
                Lik = A[..., below, kk] @ jnp.swapaxes(Linv, -1, -2)
                Lout = Lout.at[..., below, kk].set(Lik)
                A = A.at[..., below, below].add(
                    -(Lik @ jnp.swapaxes(Lik, -1, -2)))
        return Lout

    for nb in (256, 512, 1024):
        if f'blocked{nb}' not in which:
            continue
        fn = reduced(lambda A, nb=nb: blocked_chol(A, nb))
        key = f'cholesky_blocked{nb}_ms'
        try:
            rec(key, sync_time(fn, B) * 1e3)
            Lb = jax.jit(lambda A, nb=nb: blocked_chol(A, nb))(B)
            err = float(jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)) /
                        jnp.max(jnp.abs(b)))(Lb, L))
            rec(f'cholesky_blocked{nb}_relerr', err)
        except Exception as e:  # noqa: BLE001
            rec(key, f'FAIL {type(e).__name__}: {e}'[:200])

    # -- triangular pieces ---------------------------------------------
    if 'tri' in which:
        rec('cho_solve_vec_ms', sync_time(reduced(linalg.cho_solve_vec),
                                          L, a) * 1e3)
        rec('chol_logdet_ms', sync_time(reduced(linalg.chol_logdet), L) * 1e3)
        rec('chol_inverse_ms', sync_time(reduced(linalg.chol_inverse), L) * 1e3)

    # -- gram vjp -------------------------------------------------------
    if 'vjp' in which:
        @jax.jit
        def make_cbar(L, a):
            w = linalg.cho_solve_vec(L, a)
            Binv = linalg.chol_inverse(L)
            Dm = data.diag_D.astype(f32)
            return (0.5 * Dm[:, None, None] * Binv
                    - 0.5 * w[:, :, None] * w[:, None, :])
        Cbar = jax.block_until_ready(make_cbar(L, a))
        gvjp = reduced(lambda cb: gram_vjp(xs32, xs32, lLmb.astype(f32),
                                           lLmb0.astype(f32),
                                           lnug.astype(f32),
                                           same=True, cbar=cb))
        rec('gram_vjp_ms', sync_time(gvjp, Cbar) * 1e3)

    # -- end-to-end -----------------------------------------------------
    if 'e2e' in which:
        lossf = reduced(lambda fr: lik.neglpost_full(
            fr, data, compute_dtype=f32, jitter=jitter))
        rec('loss_fwd_ms', sync_time(lossf, free) * 1e3)
        vg = reduced(jax.value_and_grad(lambda fr: lik.neglpost_full(
            fr, data, compute_dtype=f32, jitter=jitter)))
        rec('loss_fwd_bwd_ms', sync_time(vg, free) * 1e3)

    results['device'] = str(jax.devices()[0])
    # Cholesky model FLOPs (n^3/3 per comp) for MFU context
    for k in ('cholesky_xla_ms', 'cholesky_blocked256_ms',
              'cholesky_blocked512_ms', 'cholesky_blocked1024_ms'):
        v = results.get(k)
        if isinstance(v, float):
            results[k.replace('_ms', '_tflops')] = round(
                Q * N**3 / 3 / (v * 1e-3) / 1e12, 2)
    print(json.dumps(results, indent=1, default=str))


if __name__ == '__main__':
    main()
