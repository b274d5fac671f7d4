"""n-axis sharded linear algebra for the large-n regime.

The ('comp','out') mesh (mesh.py) parallelizes the q component stack and
the p output axis — the wrong axes once a single replica's Gram matrix no
longer fits one chip.  This module shards the *design-point* axis n:

- each device owns a block of Gram rows: the local working set is
  (q, n/ndev, n), so total HBM for the stack scales down linearly with
  devices;
- a ScaLAPACK-style right-looking blocked Cholesky runs over the block
  rows inside ``shard_map``, with exactly two small collectives per panel
  step (a psum of the (q, nb, nb) diagonal block and an all_gather of the
  panel column) riding ICI;
- blocked forward/back substitution and the logdet come from the same
  distributed factor;
- :func:`neglpost_full_nsharded` evaluates the full-data loss (reference
  lcgp.py:635-666 semantics, identical to ``likelihood.neglpost_full``)
  without any device ever materializing a whole (n, n) Gram.

The panel loop is a static Python loop of length ndev — under jit it
unrolls into a fixed program (no data-dependent control flow), and
autodiff through the psum/all_gather collectives gives gradients with the
same n-sharded layout.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import params as Pm
from ..models.likelihood import FullData, RepData
from ..ops.gram import gram_stack

AXIS = 'n'


def make_n_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D ('n',) mesh over the given (or all) devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def _is_mine(idx, k):
    return jnp.where(idx == k, 1.0, 0.0)


def _dist_cholesky_local(Ablk, ndev: int):
    """Distributed lower-Cholesky of a PSD (q, n, n) stack, block-rows local.

    Ablk: this device's (q, nb, n) block of rows.  Returns the matching
    (q, nb, n) block of rows of L with A = L L^T.  Right-looking blocked
    algorithm; panel k's diagonal block is psum-broadcast, the factored
    panel column is all_gathered, and each device applies its own trailing
    GEMM update.
    """
    q, nb, n = Ablk.shape
    assert nb * ndev == n
    idx = lax.axis_index(AXIS)
    L = jnp.zeros_like(Ablk)
    for k in range(ndev):
        cols = slice(k * nb, (k + 1) * nb)
        # true (updated) diagonal block, identical on every device
        diag = lax.psum(_is_mine(idx, k) * Ablk[:, :, cols], AXIS)
        Lkk = jnp.linalg.cholesky(diag)                      # (q, nb, nb)
        # my panel block: L_ik = A_ik Lkk^{-T} (valid for idx > k)
        Lik = lax.linalg.triangular_solve(
            Lkk, Ablk[:, :, cols], left_side=False, lower=True,
            transpose_a=True)
        panel_blk = jnp.where(idx == k, Lkk,
                              jnp.where(idx > k, Lik, jnp.zeros_like(Lik)))
        L = L.at[:, :, cols].set(panel_blk)
        if k + 1 < ndev:
            panel = lax.all_gather(panel_blk, AXIS)          # (ndev, q, nb, nb)
            below = jnp.moveaxis(panel[k + 1:], 0, 1)        # (q, m, nb, nb)
            below = below.reshape(q, (ndev - 1 - k) * nb, nb)
            upd = jnp.einsum('qab,qcb->qac', panel_blk, below)
            Ablk = Ablk.at[:, :, (k + 1) * nb:].add(
                -jnp.where(idx > k, 1.0, 0.0) * upd)
    return L


def _dist_cho_solve_vec_local(Lblk, bblk, ndev: int):
    """Solve (L L^T) x = b with the distributed factor; b block-local (q, nb)."""
    q, nb, n = Lblk.shape
    idx = lax.axis_index(AXIS)
    # forward substitution: y_k = Lkk^{-1} (b_k - sum_{j<k} L_kj y_j)
    y = jnp.zeros_like(bblk)
    acc = jnp.zeros_like(bblk)
    for k in range(ndev):
        cols = slice(k * nb, (k + 1) * nb)
        diag = lax.psum(_is_mine(idx, k) * Lblk[:, :, cols], AXIS)
        rhs = lax.psum(_is_mine(idx, k) * (bblk - acc), AXIS)
        yk = lax.linalg.triangular_solve(
            diag, rhs[..., None], left_side=True, lower=True)[..., 0]
        y = jnp.where(idx == k, yk, y)
        if k + 1 < ndev:
            acc = acc + jnp.where(idx > k, 1.0, 0.0) * \
                jnp.einsum('qab,qb->qa', Lblk[:, :, cols], yk)
    # back substitution: x_k = Lkk^{-T} (y_k - sum_{j>k} L_jk^T x_j)
    x = jnp.zeros_like(y)
    for k in reversed(range(ndev)):
        cols = slice(k * nb, (k + 1) * nb)
        contrib = jnp.where(idx > k, 1.0, 0.0) * \
            jnp.einsum('qab,qa->qb', Lblk[:, :, cols], x)
        s = lax.psum(contrib, AXIS)
        diag = lax.psum(_is_mine(idx, k) * Lblk[:, :, cols], AXIS)
        rhs = lax.psum(_is_mine(idx, k) * y, AXIS) - s
        xk = lax.linalg.triangular_solve(
            diag, rhs[..., None], left_side=True, lower=True,
            transpose_a=True)[..., 0]
        x = jnp.where(idx == k, xk, x)
    return x


def _dist_chol_logdet_local(Lblk, ndev: int):
    """logdet(A) = 2 sum log diag(L); diag entries live on the owner rows."""
    q, nb, n = Lblk.shape
    idx = lax.axis_index(AXIS)
    zero = jnp.zeros((), dtype=idx.dtype)
    mine = lax.dynamic_slice(Lblk, (zero, zero, idx * nb), (q, nb, nb))
    d = jnp.diagonal(mine, axis1=-2, axis2=-1)
    # n-length log-sum accumulates in f64 even for f32 factors, matching
    # linalg.chol_logdet (f32 sums starve the optimizer of loss signal)
    return lax.psum(2.0 * jnp.sum(jnp.log(d).astype(jnp.float64), axis=-1),
                    AXIS)


def dist_cholesky(mesh: Mesh, A):
    """Distributed Cholesky of a replicated-or-sharded (q, n, n) PSD stack.

    Returns L with the row axis sharded over 'n'.  n must divide evenly by
    the mesh size (use the loss wrapper for automatic padding).
    """
    ndev = mesh.devices.size
    fn = jax.shard_map(
        partial(_dist_cholesky_local, ndev=ndev), mesh=mesh,
        in_specs=P(None, AXIS, None), out_specs=P(None, AXIS, None))
    return fn(A)


def dist_cho_solve_vec(mesh: Mesh, L, b):
    """Distributed (L L^T)^{-1} b for the factor from :func:`dist_cholesky`."""
    ndev = mesh.devices.size
    fn = jax.shard_map(
        partial(_dist_cho_solve_vec_local, ndev=ndev), mesh=mesh,
        in_specs=(P(None, AXIS, None), P(None, AXIS)),
        out_specs=P(None, AXIS))
    return fn(L, b)


def dist_chol_logdet(mesh: Mesh, L):
    ndev = mesh.devices.size
    fn = jax.shard_map(
        partial(_dist_chol_logdet_local, ndev=ndev), mesh=mesh,
        in_specs=P(None, AXIS, None), out_specs=P(None))
    return fn(L)


# ---------------------------------------------------------------------------
# n-sharded full-data loss
# ---------------------------------------------------------------------------

def _pad_to(x, total, axis, fill=0.0):
    pad = total - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def _nshard_loss_local(xblk, yblk, mblk, a_blk, lLmb, lLmb0, lnug, D,
                       *, ndev, jitter, kernel, compute_dtype):
    """Per-device body: build my Gram rows, distributed factor/solve, local
    partial loss terms.  mblk masks padded rows (1 real, 0 pad)."""
    nb = xblk.shape[0]
    n = nb * ndev
    idx = lax.axis_index(AXIS)

    x_full = lax.all_gather(xblk, AXIS).reshape(n, xblk.shape[1])
    m_full = lax.all_gather(mblk, AXIS).reshape(n)
    a_full = lax.all_gather(a_blk, AXIS, axis=1).reshape(a_blk.shape[0], n)

    # my Gram rows: cross-build + nugget diagonal (the same=True semantics
    # of the kernel: C = amp*((1-eta) C0 + eta I), reference covmat.py:45-53)
    C = gram_stack(xblk, x_full, lLmb, lLmb0, lnug, same=False,
                   compute_dtype=compute_dtype, kind=kernel)  # (q, nb, n)
    rows_global = idx * nb + jnp.arange(nb)
    eye_blk = (jnp.arange(n)[None, :] == rows_global[:, None]).astype(C.dtype)
    eta = (lnug / (1.0 + lnug)).astype(C.dtype)
    amp = lLmb0.astype(C.dtype)
    C = C + (amp * eta)[:, None, None] * eye_blk[None]
    # zero padded rows/cols so B is block-diagonal with 1s on the pad diag
    C = C * mblk[None, :, None] * m_full[None, None, :]

    Dm = D.astype(C.dtype)
    diag_vals = 1.0 + jitter * mblk                     # pad diag stays 1
    B = Dm[:, None, None] * C + diag_vals[None, :, None] * eye_blk[None]

    LB = _dist_cholesky_local(B, ndev)
    w = _dist_cho_solve_vec_local(LB, a_blk.astype(LB.dtype), ndev)
    # C a = (B a - (1+jitter) a) / D, avoiding a second stack
    Ba = jnp.einsum('qab,qb->qa', B, a_full.astype(B.dtype))
    Ca = (Ba - (1.0 + jitter) * a_blk.astype(B.dtype)) / Dm[:, None]
    quad = lax.psum(jnp.sum(Ca * w, axis=-1), AXIS)
    logdet = _dist_chol_logdet_local(LB, ndev)
    terms = 0.5 * logdet - 0.5 * quad                   # (q,)
    return jnp.sum(terms)


def neglpost_full_nsharded(free: Pm.FreeParams, data: FullData, mesh: Mesh,
                           compute_dtype=None, jitter: float = 0.0,
                           kernel: str = 'matern32'):
    """Full-data loss with the n axis sharded over the mesh.

    Semantics identical to ``likelihood.neglpost_full`` (reference
    lcgp.py:635-666); n is padded to a multiple of the mesh size with
    loss-neutral rows (C zeroed, unit diagonal, zero data weight).
    """
    ndev = mesh.devices.size
    n = data.xs.shape[0]
    n_pad = -(-n // ndev) * ndev

    lLmb, lLmb0, lsig_g, lnug = Pm.constrain(free)
    lsig = Pm.expand_sigma(lsig_g, data.sigma_map)
    sigma = jnp.exp(lsig)

    psi_c = data.phi / jnp.sqrt(sigma)[:, None]             # (p, q)
    a = (data.ys.T @ psi_c).T                               # (q, n)

    xs = _pad_to(data.xs, n_pad, axis=0, fill=0.5)
    ys = _pad_to(data.ys, n_pad, axis=1)
    mask = _pad_to(jnp.ones((n,), dtype=data.xs.dtype), n_pad, axis=0)
    a = _pad_to(a, n_pad, axis=1)

    body = partial(_nshard_loss_local, ndev=ndev, jitter=jitter,
                   kernel=kernel, compute_dtype=compute_dtype)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS, None), P(None, AXIS), P(AXIS), P(None, AXIS),
                  P(None, None), P(None), P(None), P(None)),
        out_specs=P())
    comp_terms = fn(xs, ys, mask, a, lLmb, lLmb0, lnug, data.diag_D)

    nlp = comp_terms.astype(data.ys.dtype)
    nlp += 0.5 * n * jnp.sum(lsig)
    nlp += 0.5 * jnp.sum(jnp.square(data.ys / jnp.sqrt(sigma)[:, None]))
    return nlp


def _nshard_rep_local(xblk, mblk, lamblk, jit_q, b_blk, lLmb, lLmb0, lnug,
                      *, ndev, kernel, compute_dtype):
    """Rep-path per-device body: my rows of A = C + diag(lam + jit),
    distributed factor/solve, per-component partial terms."""
    nb = xblk.shape[0]
    n = nb * ndev
    idx = lax.axis_index(AXIS)

    x_full = lax.all_gather(xblk, AXIS).reshape(n, xblk.shape[1])
    m_full = lax.all_gather(mblk, AXIS).reshape(n)

    C = gram_stack(xblk, x_full, lLmb, lLmb0, lnug, same=False,
                   compute_dtype=compute_dtype, kind=kernel)  # (q, nb, n)
    rows_global = idx * nb + jnp.arange(nb)
    eye_blk = (jnp.arange(n)[None, :] == rows_global[:, None]).astype(C.dtype)
    eta = (lnug / (1.0 + lnug)).astype(C.dtype)
    amp = lLmb0.astype(C.dtype)
    C = C + (amp * eta)[:, None, None] * eye_blk[None]
    C = C * mblk[None, :, None] * m_full[None, None, :]

    # padded rows get a clean unit diagonal (zero logdet/quad contribution)
    diag_vals = jnp.where(mblk[None, :] > 0,
                          lamblk.astype(C.dtype) + jit_q.astype(C.dtype),
                          1.0)                                # (q, nb)
    A = C + diag_vals[:, :, None] * eye_blk[None]

    LT = _dist_cholesky_local(A, ndev)
    lb = lamblk.astype(LT.dtype) * b_blk.astype(LT.dtype)
    u = _dist_cho_solve_vec_local(LT, lb, ndev)
    Cu = lb - diag_vals * u
    quad = lax.psum(jnp.sum(b_blk.astype(LT.dtype) * Cu, axis=-1), AXIS)
    logdet = _dist_chol_logdet_local(LT, ndev)
    return jnp.sum(-0.5 * quad + 0.5 * logdet)


def neglpost_rep_nsharded(free: Pm.FreeParams, data: RepData, mesh: Mesh,
                          compute_dtype=None, jitter: float = 0.0,
                          kernel: str = 'matern32'):
    """Replication loss with the unique-point axis sharded over the mesh.

    Semantics identical to ``likelihood.neglpost_rep`` (reference
    lcgp.py:554-630); n padded with loss-neutral rows.
    """
    ndev = mesh.devices.size
    n = data.xs.shape[0]
    p = data.ybar.shape[0]
    n_pad = -(-n // ndev) * ndev

    lLmb, lLmb0, lsig_g, lnug = Pm.constrain(free)
    lsig = Pm.expand_sigma(lsig_g, data.sigma_map)
    sigma_raw = jnp.exp(lsig)
    r = data.r

    sigma_var_used = sigma_raw / jnp.square(data.scale)
    sigma_inv_sqrt = data.scale / jnp.sqrt(sigma_raw)

    # diagonal data terms: plain n-sums, no sharding needed
    nlp = 0.5 * jnp.sum(r * jnp.sum(
        jnp.square(data.ybar * sigma_inv_sqrt[:, None]), axis=0))
    nlp += 0.5 * n * jnp.sum(jnp.log(sigma_var_used))
    nlp += -0.5 * p * jnp.sum(jnp.log(r))

    v = data.phi * sigma_inv_sqrt[:, None]
    b = r[None, :] * (data.ybar.T @ v).T                       # (q, n)
    D = data.diag_D
    lam = 1.0 / (D[:, None] * r[None, :])                      # (q, n)
    nlp += 0.5 * jnp.sum(jnp.log(D[:, None] * r[None, :]))
    # amplitude-scaled jitter, matching likelihood._rep_terms_fwd_impl
    jit_q = jitter * (1.0 + lLmb0[:, None])                    # (q, 1)

    xs = _pad_to(data.xs, n_pad, axis=0, fill=0.5)
    mask = _pad_to(jnp.ones((n,), dtype=data.xs.dtype), n_pad, axis=0)
    b = _pad_to(b, n_pad, axis=1)
    lam = _pad_to(lam, n_pad, axis=1, fill=1.0)

    body = partial(_nshard_rep_local, ndev=ndev, kernel=kernel,
                   compute_dtype=compute_dtype)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(None, AXIS),
                  P(None, None), P(None, AXIS), P(None, None), P(None),
                  P(None)),
        out_specs=P())
    comp_terms = fn(xs, mask, lam, jit_q, b, lLmb, lLmb0, lnug)
    nlp += comp_terms.astype(nlp.dtype)
    return nlp / n


def make_nsharded_value_and_grad(mesh: Mesh, data,
                                 compute_dtype=None, jitter: float = 0.0,
                                 kernel: str = 'matern32'):
    """jit(value_and_grad) of the n-sharded loss over the mesh (full or
    rep data)."""
    loss_fn = (neglpost_rep_nsharded if isinstance(data, RepData)
               else neglpost_full_nsharded)

    def loss(free):
        return loss_fn(free, data, mesh, compute_dtype=compute_dtype,
                       jitter=jitter, kernel=kernel)
    return jax.jit(jax.value_and_grad(loss))
