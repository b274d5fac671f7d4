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
    """logdet(A) from L with A = L L^T; batched over leading axes."""
    diag = jnp.diagonal(chols, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1)


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


def chol_inverse(chols):
    """(L L^T)^{-1} as Linv^T Linv with Linv = L^{-1} (LAPACK potri shape).

    One triangular solve + one (MXU) symmetric matmul instead of the two
    chained triangular solves of ``cho_solve(L, I)`` — measured 1.5x faster
    on TPU in emulated f64 at n=4096, where the GEMM runs at ~1.4 TFLOP/s
    but triangular solves crawl.
    """
    n = chols.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=chols.dtype), chols.shape)
    linv = solve_tri_lower(chols, eye)
    return jnp.einsum('...kn,...km->...nm', linv, linv)


def quad_chol(chols, vecs):
    """v^T (L L^T)^{-1} v, batched; v (..., n)."""
    z = solve_tri_lower(chols, vecs[..., :, None])[..., :, 0]
    return jnp.sum(z * z, axis=-1)
