"""n-sharded FITC: the (q, n, m) Woodbury panel distributed over an ('n',)
or ('comp','n') mesh.

The single-chip FITC path (models/sparse.py) is m-bounded in FLOPs per data
point but n-bounded in memory: the resident (q, n, m) W panel plus the Knm
build cap one 16 GB chip near n ~ 3-500k (f32, m=512, q=5).  Every
n-contraction in the Woodbury core reduces into (m,) / (m, m) objects, so
sharding the panel's rows over the mesh and ``psum``-ing the contractions
computes the EXACT same estimator (floating-point sums reordered only)
with per-device memory and O(n m^2) GEMM time both divided by the mesh
size — n scales to the multi-million regime across chips.

Unlike the exact n-sharded path (nshard.py's distributed Cholesky with a
custom VJP), no custom VJP is needed here: the autodiff residuals are the
per-device panel blocks, the same footprint as the forward, and every
collective is a plain ``psum`` whose transpose JAX derives automatically.

On a 2-D ('comp','n') mesh (nshard.make_nc_mesh) the q components
additionally shard over 'comp': the bodies return per-component
(quad, logdet) with no cross-component coupling, so — exactly as in
nshard — the q axis maps onto 'comp' purely via the partition specs, with
q padded by neutral components (zero phi columns) when not divisible.
The scalar p-axis data terms are computed outside the shard_map on the
unpadded data.

Semantics anchors: the FITC losses approximate likelihood.neglpost_full /
neglpost_rep (reference lcgp.py:635-666 and lcgp.py:554-630); the Woodbury
algebra and the f64/(m,m)-factorization precision split mirror
models/sparse.py line for line, blockwise.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..models import params as Pm
from ..models.likelihood import RepData
from ..models.sparse import KMM_JITTER, FitcAux
from ..ops import linalg
from ..ops.gram import gram_stack
from .nshard import (AXIS, _n_size, _pad_q, _pad_q_params, _pad_to, _q_pad,
                     _qax)


def _woodbury_block(xblk, mblk, lam, b, z, lLmb, lLmb0, lnug, *,
                    kernel, compute_dtype):
    """Blockwise mirror of sparse._fitc_core + _fitc_terms.

    Runs inside shard_map: xblk (nb, d) / mblk (nb,) / lam, b (q, nb) are
    this device's rows; z and the params are replicated.  Padding rows
    (mblk == 0) get W-row 0, lam_t 1 and b 0, so they contribute nothing
    to any psum.  Returns per-component (quad, ld) — both replicated —
    plus the block state needed by the aux builder.
    """
    Kmm64 = gram_stack(z, z, lLmb, lLmb0, lnug, same=False,
                       compute_dtype=None, kind=kernel).astype(jnp.float64)
    amp64 = lLmb0.astype(jnp.float64)
    Lmm64 = linalg.cholesky(
        linalg.add_diag(Kmm64, KMM_JITTER * amp64[:, None]))
    Knm = gram_stack(xblk, z, lLmb, lLmb0, lnug, same=False,
                     compute_dtype=compute_dtype, kind=kernel)  # (q, nb, m)
    dt = Knm.dtype
    Lmm = Lmm64.astype(dt)
    W = jnp.swapaxes(
        linalg.solve_tri_lower(Lmm, jnp.swapaxes(Knm, -1, -2)), -1, -2)
    q_diag = jnp.sum(jnp.square(W), axis=-1)                    # (q, nb)
    c_diag = amp64.astype(dt)[:, None] * jnp.ones_like(q_diag)
    lam_t = jnp.maximum(
        lam.astype(dt) + jnp.maximum(c_diag - q_diag, 0.0),
        jnp.asarray(1e-10, dtype=dt))
    mb = mblk.astype(dt)
    lam_t = jnp.where(mb[None, :] > 0, lam_t, jnp.ones_like(lam_t))
    W = W * mb[None, :, None]
    b = b.astype(dt) * mb[None, :]

    WtLi = jnp.swapaxes(W, -1, -2) / lam_t[:, None, :]          # (q, m, nb)
    G = lax.psum((WtLi @ W).astype(jnp.float64), AXIS)          # (q, m, m)
    LM = linalg.cholesky(linalg.add_diag(G, 1.0))               # f64, replicated

    # u = (C_hat + Lam)^{-1} (lam b)   (sparse._fitc_solve, two psums)
    vi = (lam.astype(dt) * b) / lam_t
    t = lax.psum(jnp.einsum('qnm,qn->qm', W, vi), AXIS)
    s = linalg.cho_solve_vec(LM, t.astype(LM.dtype)).astype(dt)
    u = vi - jnp.einsum('qnm,qm->qn', W, s) / lam_t

    alpha = lax.psum(jnp.einsum('qnm,qn->qm', W, u), AXIS)      # (q, m)
    Cu = (jnp.einsum('qnm,qm->qn', W, alpha)
          + (lam_t - lam.astype(dt)) * u)
    quad = lax.psum(jnp.sum((b * Cu).astype(jnp.float64), axis=-1), AXIS)
    ld = (lax.psum(jnp.sum(jnp.log(lam_t.astype(jnp.float64)), axis=-1),
                   AXIS)
          + linalg.chol_logdet(LM))
    return quad, ld, (Lmm, G, LM, alpha, u)


def _full_fitc_local(xblk, mblk, ysblk, z, lLmb, lLmb0, lnug, lsig, phi, D,
                     *, kernel, compute_dtype):
    """Per-device full-data FITC Woodbury terms (likelihood.neglpost_full
    semantics, reference lcgp.py:635-666): all O(n) objects stay sharded.
    Returns per-component (quad, ld) — both 'n'-replicated; the q axis
    maps onto 'comp' when the mesh has one (no cross-component coupling).
    The p-axis data terms live outside the shard_map."""
    sigma = jnp.exp(lsig)
    ysblk = ysblk * mblk[None, :].astype(ysblk.dtype)
    psi_c = phi / jnp.sqrt(sigma)[:, None]
    a = (ysblk.T @ psi_c).T                                     # (q, nb)
    lam = jnp.broadcast_to((1.0 / D)[:, None], a.shape)
    quad, ld, _ = _woodbury_block(xblk, mblk, lam, a, z, lLmb, lLmb0, lnug,
                                  kernel=kernel, compute_dtype=compute_dtype)
    return quad, ld


def _rep_fitc_local(xblk, mblk, ybarblk, rblk, z, lLmb, lLmb0, lnug, lsig,
                    scale, phi, D, *, kernel, compute_dtype):
    """Per-device replication FITC Woodbury terms (likelihood.neglpost_rep
    semantics, reference lcgp.py:554-630).  Padding rows carry r=1 and
    mask 0 so they contribute nothing to any psum.  Per-component
    (quad, ld) out; the scalar data terms live outside the shard_map."""
    sigma_raw = jnp.exp(lsig)
    mb = mblk.astype(ybarblk.dtype)
    ybarblk = ybarblk * mb[None, :]
    sigma_inv_sqrt = scale / jnp.sqrt(sigma_raw)
    v = phi * sigma_inv_sqrt[:, None]
    b = rblk[None, :] * (ybarblk.T @ v).T                       # (q, nb)
    lam = 1.0 / (D[:, None] * rblk[None, :])
    quad, ld, _ = _woodbury_block(xblk, mblk, lam, b, z, lLmb, lLmb0, lnug,
                                  kernel=kernel, compute_dtype=compute_dtype)
    return quad, ld


def _pad_inputs(data, mesh: Mesh):
    """Pad the n axis to an n-submesh multiple; returns sharded-spec
    arrays."""
    ndev = _n_size(mesh)
    n = data.xs.shape[0]
    n_pad = -(-n // ndev) * ndev
    xs = _pad_to(data.xs, n_pad, axis=0, fill=0.5)
    mask = _pad_to(jnp.ones((n,), dtype=data.xs.dtype), n_pad, axis=0)
    return xs, mask, n, n_pad


def _pad_q_fitc(mesh, phi, D, lLmb, lLmb0, lnug):
    """Pad the q axis for a ('comp','n') mesh: phi gains zero columns
    (zero data weight for the padded components), D pads with 1.0, kernel
    params edge-tile (well-posed Kmm).  Padded components' (quad, ld) are
    sliced away by the callers."""
    qp = _q_pad(mesh, phi.shape[1])
    lLmb, lLmb0, lnug = _pad_q_params(mesh, lLmb, lLmb0, lnug)
    if qp != phi.shape[1]:
        phi = jnp.pad(phi, ((0, 0), (0, qp - phi.shape[1])))
    D = _pad_q(D, qp, fill=1.0)
    return phi, D, lLmb, lLmb0, lnug


@partial(jax.jit, static_argnames=('mesh', 'compute_dtype', 'kernel'))
def neglpost_full_fitc_nsharded(free: Pm.FreeParams, data, z, mesh: Mesh,
                                compute_dtype=None,
                                kernel: str = 'matern32'):
    """n-sharded FITC full-data loss — exact same estimator as
    sparse.neglpost_full_fitc, panel rows distributed over the mesh
    (('n',) or ('comp','n'): a comp axis also shards the q components)."""
    lLmb, lLmb0, lsig_g, lnug = Pm.constrain(free)
    lsig = Pm.expand_sigma(lsig_g, data.sigma_map)
    xs, mask, n, n_pad = _pad_inputs(data, mesh)
    ys = _pad_to(data.ys, n_pad, axis=1)
    q = data.phi.shape[1]
    phi, D, lLmb_p, lLmb0_p, lnug_p = _pad_q_fitc(
        mesh, data.phi, data.diag_D, lLmb, lLmb0, lnug)

    qa = _qax(mesh)
    body = partial(_full_fitc_local, kernel=kernel,
                   compute_dtype=compute_dtype)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(None, AXIS), P(None, None),
                  P(qa, None), P(qa), P(qa), P(None), P(None, qa),
                  P(qa)),
        out_specs=(P(qa), P(qa)))
    quad, ld = fn(xs, mask, ys, z, lLmb_p, lLmb0_p, lnug_p, lsig, phi, D)
    quad, ld = quad[:q], ld[:q]

    Dlog = jnp.log(data.diag_D.astype(ld.dtype))
    nlp = jnp.sum(0.5 * (n * Dlog + ld) - 0.5 * quad).astype(data.ys.dtype)
    sigma = jnp.exp(lsig)
    nlp += 0.5 * n * jnp.sum(lsig)
    nlp += 0.5 * jnp.sum(jnp.square(data.ys / jnp.sqrt(sigma)[:, None]))
    return nlp


@partial(jax.jit, static_argnames=('mesh', 'compute_dtype', 'kernel'))
def neglpost_rep_fitc_nsharded(free: Pm.FreeParams, data: RepData, z,
                               mesh: Mesh, compute_dtype=None,
                               kernel: str = 'matern32'):
    """n-sharded FITC replication loss — exact same estimator as
    sparse.neglpost_rep_fitc, panel rows distributed over the mesh
    (('n',) or ('comp','n'): a comp axis also shards the q components)."""
    lLmb, lLmb0, lsig_g, lnug = Pm.constrain(free)
    lsig = Pm.expand_sigma(lsig_g, data.sigma_map)
    xs, mask, n, n_pad = _pad_inputs(data, mesh)
    ybar = _pad_to(data.ybar, n_pad, axis=1)
    r = _pad_to(data.r, n_pad, axis=0, fill=1.0)
    q = data.phi.shape[1]
    phi, D, lLmb_p, lLmb0_p, lnug_p = _pad_q_fitc(
        mesh, data.phi, data.diag_D, lLmb, lLmb0, lnug)

    qa = _qax(mesh)
    body = partial(_rep_fitc_local, kernel=kernel,
                   compute_dtype=compute_dtype)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(None, AXIS), P(AXIS),
                  P(None, None), P(qa, None), P(qa), P(qa), P(None),
                  P(None), P(None, qa), P(qa)),
        out_specs=(P(qa), P(qa)))
    quad, ld = fn(xs, mask, ybar, r, z, lLmb_p, lLmb0_p, lnug_p, lsig,
                  data.scale, phi, D)
    quad, ld = quad[:q], ld[:q]

    # scalar data terms (plain sums over the unpadded data, no sharding)
    sigma_raw = jnp.exp(lsig)
    p = data.ybar.shape[0]
    sigma_var_used = sigma_raw / jnp.square(data.scale)
    sigma_inv_sqrt = data.scale / jnp.sqrt(sigma_raw)
    nlp = 0.5 * jnp.sum(data.r * jnp.sum(
        jnp.square(data.ybar * sigma_inv_sqrt[:, None]), axis=0))
    nlp += 0.5 * n * jnp.sum(jnp.log(sigma_var_used))
    nlp += -0.5 * p * jnp.sum(jnp.log(data.r))

    Dlog = jnp.log(data.diag_D.astype(ld.dtype))
    sum_log_r = jnp.sum(jnp.log(data.r.astype(ld.dtype)))
    terms = 0.5 * (n * Dlog + sum_log_r + ld) - 0.5 * quad
    nlp += jnp.sum(terms).astype(nlp.dtype)
    return nlp / n


def make_loss(submethod: str, data, z, mesh: Mesh, compute_dtype=None,
              kernel: str = 'matern32'):
    """AuxLoss(free, data) with z+mesh closed over (nshard.make_loss
    contract, FITC estimator).  Data rides through optimizer jits as a
    runtime argument, not an HLO constant (fit/auxloss.py)."""
    from ..fit.auxloss import AuxLoss
    loss_fn = (neglpost_rep_fitc_nsharded if submethod == 'rep'
               else neglpost_full_fitc_nsharded)

    def loss(free, data):
        return loss_fn(free, data, z, mesh, compute_dtype=compute_dtype,
                       kernel=kernel)
    from .nshard import data_shardings
    return AuxLoss(loss, data, aux_sharding=data_shardings(mesh, data))


# ---------------------------------------------------------------------------
# n-sharded predictive aux: the result (FitcAux) is m-sized and replicated,
# so sparse.predict_fitc_core serves it unchanged — only the O(n) build is
# distributed.
# ---------------------------------------------------------------------------

def _aux_fitc_local(xblk, mblk, datablk, rblk, z, lLmb, lLmb0, lnug, lsig,
                    scale, phi, D, *, mode, kernel, compute_dtype):
    mb = mblk.astype(datablk.dtype)
    datablk = datablk * mb[None, :]
    sigma_raw = jnp.exp(lsig)
    if mode == 'rep':
        sigma_inv_sqrt = scale / jnp.sqrt(sigma_raw)
        v = phi * sigma_inv_sqrt[:, None]
        b = rblk[None, :] * (datablk.T @ v).T
        lam = 1.0 / (D[:, None] * rblk[None, :])
    else:
        psi_c = phi / jnp.sqrt(sigma_raw)[:, None]
        b = (datablk.T @ psi_c).T
        lam = jnp.broadcast_to((1.0 / D)[:, None], b.shape)
    _, _, (Lmm, G, LM, alpha, u) = _woodbury_block(
        xblk, mblk, lam, b, z, lLmb, lLmb0, lnug,
        kernel=kernel, compute_dtype=compute_dtype)
    # variance reduction kernel G M^{-1} (sparse.compute_aux_fitc)
    Minv = linalg.chol_inverse(LM)
    inner = G @ Minv
    inner = 0.5 * (inner + jnp.swapaxes(inner, -1, -2))
    return Lmm, alpha, inner, u


@partial(jax.jit, static_argnames=('mesh', 'mode', 'compute_dtype',
                                   'kernel'))
def _aux_fitc_nsharded_jit(free, data, z, *, mesh, mode, compute_dtype,
                           kernel):
    lLmb, lLmb0, lsig_g, lnug = Pm.constrain(free)
    lsig = Pm.expand_sigma(lsig_g, data.sigma_map)
    xs, mask, n, n_pad = _pad_inputs(data, mesh)
    if mode == 'rep':
        yd = _pad_to(data.ybar, n_pad, axis=1)
        r = _pad_to(data.r, n_pad, axis=0, fill=1.0)
        scale = data.scale
    else:
        yd = _pad_to(data.ys, n_pad, axis=1)
        r = _pad_to(jnp.ones((n,), dtype=xs.dtype), n_pad, axis=0, fill=1.0)
        scale = jnp.ones((data.ys.shape[0],), dtype=xs.dtype)

    q = data.phi.shape[1]
    phi, D, lLmb, lLmb0, lnug = _pad_q_fitc(
        mesh, data.phi, data.diag_D, lLmb, lLmb0, lnug)

    qa = _qax(mesh)
    body = partial(_aux_fitc_local, mode=mode, kernel=kernel,
                   compute_dtype=compute_dtype)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(None, AXIS), P(AXIS),
                  P(None, None), P(qa, None), P(qa), P(qa), P(None),
                  P(None), P(None, qa), P(qa)),
        out_specs=(P(qa, None, None), P(qa, None),
                   P(qa, None, None), P(qa, AXIS)))
    Lmm, alpha, inner, u = fn(xs, mask, yd, r, z, lLmb, lLmb0, lnug, lsig,
                              scale, phi, D)
    return Lmm[:q], alpha[:q], inner[:q], u[:q, :n]


def compute_aux_fitc_nsharded(free: Pm.FreeParams, data, z, mode: str,
                              mesh: Mesh, compute_dtype=None,
                              kernel: str = 'matern32') -> FitcAux:
    """Distributed FITC predictive aux.  Returns the standard (replicated,
    m-sized) FitcAux, so the single-device sparse.predict_fitc_core — and
    therefore serving — consume it unchanged."""
    Lmm, alpha, inner, u = _aux_fitc_nsharded_jit(
        free, data, z, mesh=mesh, mode=mode, compute_dtype=compute_dtype,
        kernel=kernel)
    return FitcAux(Lmm=Lmm, alpha=alpha, inner=inner, u=u)
