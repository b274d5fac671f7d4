"""Negative log marginal posterior — the training objectives.

Pure jitted functions of (FreeParams, data).  Mathematical contract is the
reference's two losses (``neglpost`` lcgp.py:635-666, ``neglpost_rep``
lcgp.py:554-630); see DESIGN.md for the eigh→Cholesky reformulation (values
agree to fp tolerance; the decompositions differ but every term is
basis-invariant).

TPU-native structure: the per-component loop becomes a (q,n,n) Gram stack
plus batched Cholesky/solves — no Python-level q loop, no joblib.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import linalg
from ..ops.matern import matern32_gram
from ..ops.gram import gram_stack
from . import params as P


class FullData(NamedTuple):
    """Static training tensors for submethod='full'."""
    xs: jnp.ndarray        # (n, d) standardized inputs
    ys: jnp.ndarray        # (p, n) standardized outputs
    phi: jnp.ndarray       # (p, q)
    diag_D: jnp.ndarray    # (q,)
    sigma_map: jnp.ndarray  # (p,) int32 output-dim -> error group


class RepData(NamedTuple):
    """Static training tensors for submethod='rep'.

    ``scale`` encodes the rep_standardize_ybar toggle uniformly: it equals
    ``ybar_std`` when standardizing (so sigma2_used = sigma2/scale^2,
    reference lcgp.py:576-584) and ones otherwise, with ``ybar`` holding
    whichever Y matrix the loss actually consumes.
    """
    xs: jnp.ndarray        # (n, d) standardized unique inputs
    ybar: jnp.ndarray      # (p, n) replicate-averaged outputs (std'ized or raw)
    scale: jnp.ndarray     # (p,) ybar_std (or ones)
    r: jnp.ndarray         # (n,) float replicate counts
    phi: jnp.ndarray       # (p, q)
    diag_D: jnp.ndarray    # (q,)
    sigma_map: jnp.ndarray  # (p,) int32


def _bmv(mats, vecs):
    """Batched matrix-vector: (q,n,m) @ (q,m) -> (q,n)."""
    return jnp.einsum('qnm,qm->qn', mats, vecs)


def _map_components(body, stacks, q_chunk):
    """Apply ``body`` over the q leading axis in memory-bounded chunks.

    q_chunk=None runs one fused batch (fastest when the (q,n,n) stacks fit
    in HBM).  Otherwise the stacks are reshaped to (q/q_chunk, q_chunk, ...)
    and body is lax.map'ed with rematerialization — backward recomputes each
    chunk's Gram/Cholesky instead of keeping all q of them resident, so peak
    memory scales with q_chunk at ~2x factorization FLOPs.
    """
    if q_chunk is None:
        return body(stacks)
    q = jax.tree_util.tree_leaves(stacks)[0].shape[0]
    if q % q_chunk:
        raise ValueError(f'q_chunk={q_chunk} must divide q={q}')
    chunked = jax.tree_util.tree_map(
        lambda x: x.reshape((q // q_chunk, q_chunk) + x.shape[1:]), stacks)
    out = jax.lax.map(jax.checkpoint(body), chunked)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((q,) + x.shape[2:]), out)


@partial(jax.jit, static_argnames=("compute_dtype", "jitter", "q_chunk", "kernel"))
def neglpost_full(free: P.FreeParams, data: FullData,
                  compute_dtype=None, jitter: float = 0.0,
                  q_chunk: int | None = None, kernel: str = "matern32"):
    """Full-data integrated negative log marginal posterior (lcgp.py:635-666).

    Per component k (C_k the Matérn Gram, D_k = diag_D[k], a_k = Y^T psi_ck):
        + 0.5 * logdet(I + D_k C_k)
        - 0.5 * (C_k a_k)^T (I + D_k C_k)^{-1} a_k
    plus the noise terms  (n/2) sum_p lsigma2_p + 0.5 ||Y / sigma||_F^2.
    NOT divided by n (asymmetry vs the rep loss is the reference's own,
    SURVEY §3.5.6).
    """
    lLmb, lLmb0, lsig_g, lnug = P.constrain(free)
    lsig = P.expand_sigma(lsig_g, data.sigma_map)          # (p,)
    sigma = jnp.exp(lsig)
    n = data.xs.shape[0]

    psi_c = data.phi / jnp.sqrt(sigma)[:, None]            # (p, q)
    a = (data.ys.T @ psi_c).T                              # (q, n)

    def body(stacks):
        lLmb_c, lLmb0_c, lnug_c, D_c, a_c = stacks
        C = gram_stack(data.xs, data.xs, lLmb_c, lLmb0_c, lnug_c, same=True,
                       compute_dtype=compute_dtype, kind=kernel)  # (qc, n, n)
        B = linalg.add_diag(D_c[:, None, None].astype(C.dtype) * C,
                            1.0 + jitter)
        LB = linalg.cholesky(B)
        Ca = _bmv(C, a_c.astype(C.dtype))
        w = linalg.cho_solve_vec(LB, a_c.astype(LB.dtype))
        quad = jnp.sum(Ca.astype(LB.dtype) * w, axis=-1)
        return 0.5 * linalg.chol_logdet(LB) - 0.5 * quad   # (qc,)

    terms = _map_components(body, (lLmb, lLmb0, lnug, data.diag_D, a),
                            q_chunk)
    nlp = jnp.sum(terms).astype(data.ys.dtype)
    nlp += 0.5 * n * jnp.sum(lsig)
    nlp += 0.5 * jnp.sum(jnp.square(data.ys / jnp.sqrt(sigma)[:, None]))
    return nlp


@partial(jax.jit, static_argnames=("compute_dtype", "jitter", "q_chunk", "kernel"))
def neglpost_rep(free: P.FreeParams, data: RepData,
                 compute_dtype=None, jitter: float = 0.0,
                 q_chunk: int | None = None, kernel: str = "matern32"):
    """Replication negative log marginal on unique points (lcgp.py:554-630).

    Woodbury on A_k = I + d_k sqrt(r) C_k sqrt(r):
        S_k b = C b - C sqrt(d_k r) A_k^{-1} sqrt(d_k r) C b
    terms: -0.5 b_k^T S_k b_k + 0.5 logdet A_k; plus the diagonal data terms;
    total divided by n.
    """
    lLmb, lLmb0, lsig_g, lnug = P.constrain(free)
    lsig = P.expand_sigma(lsig_g, data.sigma_map)          # (p,)
    sigma_raw = jnp.exp(lsig)
    n = data.xs.shape[0]
    p = data.ybar.shape[0]
    r = data.r
    sr = jnp.sqrt(r)

    sigma_var_used = sigma_raw / jnp.square(data.scale)
    sigma_inv_sqrt = data.scale / jnp.sqrt(sigma_raw)      # (p,)

    nlp = 0.5 * jnp.sum(r * jnp.sum(jnp.square(data.ybar * sigma_inv_sqrt[:, None]),
                                    axis=0))
    nlp += 0.5 * n * jnp.sum(jnp.log(sigma_var_used))
    nlp += -0.5 * p * jnp.sum(jnp.log(r))

    v = data.phi * sigma_inv_sqrt[:, None]                 # (p, q)
    b = r[None, :] * (data.ybar.T @ v).T                   # (q, n)

    def body(stacks):
        lLmb_c, lLmb0_c, lnug_c, D_c, b_c = stacks
        C = gram_stack(data.xs, data.xs, lLmb_c, lLmb0_c, lnug_c, same=True,
                       compute_dtype=compute_dtype, kind=kernel)  # (qc, n, n)
        D = D_c.astype(C.dtype)
        sd = jnp.sqrt(D)
        srr = sr.astype(C.dtype)
        Cb = _bmv(C, b_c.astype(C.dtype))
        A = linalg.add_diag(
            D[:, None, None] * (C * srr[None, None, :] * srr[None, :, None]),
            1.0 + jitter)
        LA = linalg.cholesky(A)
        z = linalg.cho_solve_vec(LA, sd[:, None] * srr[None, :] * Cb)
        Sb = Cb - _bmv(C, sd[:, None] * srr[None, :] * z)
        return (-0.5 * jnp.sum(b_c.astype(C.dtype) * Sb, axis=-1)
                + 0.5 * linalg.chol_logdet(LA))            # (qc,)

    terms = _map_components(body, (lLmb, lLmb0, lnug, data.diag_D, b),
                            q_chunk)
    nlp += jnp.sum(terms).astype(nlp.dtype)
    return nlp / n


def make_loss(submethod: str, data, compute_dtype=None, jitter: float = 0.0,
              q_chunk: int | None = None, kernel: str = 'matern32'):
    """Return loss(free_params) for the given submethod with data closed over."""
    if submethod == 'full':
        return lambda free: neglpost_full(free, data, compute_dtype=compute_dtype,
                                          jitter=jitter, q_chunk=q_chunk,
                                          kernel=kernel)
    if submethod == 'rep':
        return lambda free: neglpost_rep(free, data, compute_dtype=compute_dtype,
                                         jitter=jitter, q_chunk=q_chunk,
                                         kernel=kernel)
    raise ValueError("Invalid submethod. Choices are 'full' or 'rep'.")
