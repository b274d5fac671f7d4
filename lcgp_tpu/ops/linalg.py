"""Batched Cholesky primitives shared by the likelihood and predict paths.

All functions operate on a leading component/batch axis so XLA runs them as
batched linalg on the MXU — this replaces both the reference's per-k Python
loops (reference lcgp.py:605, 650) and its joblib thread fan-out
(lcgp.py:718-720, 792-794).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def add_diag(mats, vals):
    """mats: (..., n, n); vals: scalar, (n,), or broadcastable (..., n)."""
    n = mats.shape[-1]
    eye = jnp.eye(n, dtype=mats.dtype)
    vals = jnp.asarray(vals, dtype=mats.dtype)
    if vals.ndim == 0:
        return mats + vals * eye
    return mats + vals[..., :, None] * eye


def cholesky(mats):
    """Batched lower Cholesky."""
    return jnp.linalg.cholesky(mats)


def chol_logdet(chols):
    """logdet(A) from L with A = L L^T; batched over leading axes.

    The n-length sum accumulates in f64 even for f32 factors — at large n
    an f32 accumulation resolves the result only to ~sqrt(n)*eps32*|sum|,
    which starves optimizers of loss signal."""
    diag = jnp.diagonal(chols, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diag).astype(jnp.float64), axis=-1)


def solve_tri_lower(chols, rhs):
    """L^{-1} rhs with lower-triangular L; rhs (..., n, m)."""
    return lax.linalg.triangular_solve(
        chols, rhs, left_side=True, lower=True, transpose_a=False)


def cho_solve(chols, rhs):
    """(L L^T)^{-1} rhs; rhs (..., n, m)."""
    z = lax.linalg.triangular_solve(
        chols, rhs, left_side=True, lower=True, transpose_a=False)
    return lax.linalg.triangular_solve(
        chols, z, left_side=True, lower=True, transpose_a=True)


def cho_solve_vec(chols, vecs):
    """(L L^T)^{-1} v with v (..., n)."""
    return cho_solve(chols, vecs[..., :, None])[..., :, 0]


_TRI_INV_BLOCK = 512

# Precision for the f32 inverse-combination GEMMs: bf16_3x MXU passes
# (~1e-6 relative — plenty for the gradient-path inverse these feed) at
# ~2x the true-f32 (6-pass) rate.  NOT used for factorization updates,
# where bf16-grade error breaks PSD margins (see config.py).  f64 inputs
# ignore the setting (f64 matmul is its own emulation path).
_INV_GEMM_PRECISION = lax.Precision.HIGH


def _inv_mm(a, b):
    return jnp.matmul(a, b, precision=_INV_GEMM_PRECISION)


def tri_inverse_lower(chols):
    """L^{-1} for lower-triangular L, batched.

    For large f64 problems a blocked algorithm (invert the diagonal
    blocks, combine off-diagonal blocks with GEMMs) is ~2.2x faster than
    XLA's triangular_solve-against-identity on TPU (90 vs 200 ms at
    n=4096 f64), because the combination step rides the emulated-f64 GEMM
    path instead of the slow blocked substitution.  Values agree to the
    f64 roundoff of the accumulation order.
    """
    n = chols.shape[-1]
    nb = _TRI_INV_BLOCK
    if n % nb or n // nb < 2:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=chols.dtype), chols.shape)
        return solve_tri_lower(chols, eye)
    nd = n // nb
    batch = chols.shape[:-2]
    eye = jnp.broadcast_to(jnp.eye(nb, dtype=chols.dtype),
                           batch + (nb, nb))
    invs = [solve_tri_lower(chols[..., k * nb:(k + 1) * nb,
                                  k * nb:(k + 1) * nb], eye)
            for k in range(nd)]
    X = jnp.zeros_like(chols)
    for k in range(nd):
        ck = slice(k * nb, (k + 1) * nb)
        X = X.at[..., ck, ck].set(invs[k])
        for i in range(k + 1, nd):
            ci = slice(i * nb, (i + 1) * nb)
            mid = slice(k * nb, i * nb)
            acc = _inv_mm(chols[..., ci, mid], X[..., mid, ck])
            X = X.at[..., ci, ck].set(-_inv_mm(invs[i], acc))
    return X


def chol_inverse(chols):
    """(L L^T)^{-1} as Linv^T Linv with Linv = L^{-1} (LAPACK potri shape).

    One triangular inverse + one (MXU) symmetric matmul instead of the two
    chained triangular solves of ``cho_solve(L, I)`` — measured 1.8x faster
    on TPU in emulated f64 at n=4096 (136 vs 247 ms per component), where
    the GEMM runs at ~1.4 TFLOP/s but triangular solves crawl.  In f32
    this was the whole backward's bottleneck at true-f32 GEMM precision
    (120 of 190 ms/eval net); the bf16_3x combination GEMMs halve it.
    """
    linv = tri_inverse_lower(chols)
    return jnp.einsum('...kn,...km->...nm', linv, linv,
                      precision=_INV_GEMM_PRECISION)


def quad_chol(chols, vecs):
    """v^T (L L^T)^{-1} v, batched; v (..., n)."""
    z = solve_tri_lower(chols, vecs[..., :, None])[..., :, 0]
    return jnp.sum(z * z, axis=-1)
