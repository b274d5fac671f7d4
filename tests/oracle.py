"""Independent NumPy float64 re-derivation of the reference algebra.

Deliberately follows the *reference's* computational path (eigh in the full
path, Cholesky+explicit inverses in the rep path — reference lcgp.py:635-666,
554-630, 685-803) rather than the production code's Cholesky-only
reformulation, so agreement is a genuine cross-implementation check.
"""
from __future__ import annotations

import numpy as np


def matern32_np(x1, x2, llmb, llmb0, lnug, same):
    x1 = np.asarray(x1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    llmb = np.atleast_1d(np.asarray(llmb, dtype=np.float64))
    d = x1.shape[1]
    u = x1 / llmb
    v = x2 / llmb
    C0 = np.ones((x1.shape[0], x2.shape[0]))
    V = np.zeros_like(C0)
    for j in range(d):
        S = np.abs(u[:, j:j + 1] - v[None, :, j])
        C0 *= (1 + S)
        V -= S
    C0 *= np.exp(V)
    nug = lnug / (1 + lnug)
    C = (1 - nug) * C0
    if same:
        C = C + nug * np.eye(x1.shape[0])
    return llmb0 * C


def expand_sigma_np(lsig_groups, err_struct):
    return np.repeat(np.asarray(lsig_groups, dtype=np.float64),
                     np.asarray(err_struct, dtype=np.int64))


def neglpost_full_np(lLmb, lLmb0, lsig_groups, lnug, xs, ys, phi, diag_D,
                     err_struct):
    """Reference neglpost (lcgp.py:635-666), eigh formulation."""
    lsig = expand_sigma_np(lsig_groups, err_struct)
    n = xs.shape[0]
    q = phi.shape[1]
    psi_c = phi.T / np.sqrt(np.exp(lsig))  # (q, p)

    nlp = 0.0
    for k in range(q):
        Ck = matern32_np(xs, xs, lLmb[k], lLmb0[k], lnug[k], same=True)
        W, U = np.linalg.eigh(Ck)
        Qk = U @ np.diag(1.0 / (diag_D[k] + 1.0 / W)) @ U.T
        ak = ys.T @ psi_c[k]
        nlp += 0.5 * np.sum(np.log(1 + diag_D[k] * W))
        nlp += -0.5 * (ak @ Qk @ ak)
    nlp += n / 2 * np.sum(lsig)
    nlp += 0.5 * np.sum((ys.T / np.sqrt(np.exp(lsig))) ** 2)
    return nlp


def neglpost_rep_np(lLmb, lLmb0, lsig_groups, lnug, xs, ybar_used, scale, r,
                    phi, diag_D, err_struct):
    """Reference neglpost_rep (lcgp.py:554-630), explicit matrix algebra."""
    lsig = expand_sigma_np(lsig_groups, err_struct)
    n = xs.shape[0]
    p = ybar_used.shape[0]
    q = phi.shape[1]
    r = np.asarray(r, dtype=np.float64)

    sigma_raw = np.exp(lsig)
    sigma_var_used = sigma_raw / scale ** 2
    sigma_inv_sqrt = scale / np.sqrt(sigma_raw)

    nlp = 0.5 * np.sum(r * np.sum((ybar_used * sigma_inv_sqrt[:, None]) ** 2,
                                  axis=0))
    nlp += 0.5 * n * np.sum(np.log(sigma_var_used))
    nlp += -0.5 * p * np.sum(np.log(r))

    sr = np.sqrt(r)
    for k in range(q):
        Ck = matern32_np(xs, xs, lLmb[k], lLmb0[k], lnug[k], same=True)
        v_k = sigma_inv_sqrt * phi[:, k]
        b_k = r * (ybar_used.T @ v_k)
        d_k = diag_D[k]
        A = np.eye(n) + d_k * (Ck * sr[None, :] * sr[:, None])
        Cb = Ck @ b_k
        z = np.linalg.solve(A, np.sqrt(d_k) * sr * Cb)
        Sb = Cb - Ck @ (np.sqrt(d_k) * sr * z)
        nlp += -0.5 * (b_k @ Sb)
        nlp += 0.5 * np.linalg.slogdet(A)[1]
    return nlp / n


def predict_full_np(lLmb, lLmb0, lsig_groups, lnug, xs, ys, phi, diag_D,
                    err_struct, ymean, ystd, x0s, return_fullcov=False):
    """Reference compute_aux + predict_full (lcgp.py:685-726, 808-859)."""
    lsig = expand_sigma_np(lsig_groups, err_struct)
    sigma = np.exp(lsig)
    n = xs.shape[0]
    q = phi.shape[1]
    n0 = x0s.shape[0]

    B = (ys.T / np.sqrt(sigma)) @ phi  # (n, q)

    ghat = np.zeros((q, n0))
    gvar = np.zeros((q, n0))
    for k in range(q):
        Ck = matern32_np(xs, xs, lLmb[k], lLmb0[k], lnug[k], same=True)
        W, U = np.linalg.eigh(Ck)
        IpdkCkinv = U @ np.diag(1.0 / (1.0 + diag_D[k] * W)) @ U.T
        CkinvMk = IpdkCkinv @ B[:, k]
        Thk = U @ np.diag(np.sqrt(diag_D[k] * W ** 2 /
                                  (W ** 2 + diag_D[k] * W ** 3))) @ U.T
        c00k = lLmb0[k] * np.ones(n0)
        c0k = matern32_np(x0s, xs, lLmb[k], lLmb0[k], lnug[k], same=False)
        ghat[k] = c0k @ CkinvMk
        gvar[k] = c00k - np.sum((c0k @ Thk) ** 2, axis=1)

    psi = phi.T * np.sqrt(sigma)  # (q, p)
    predmean = psi.T @ ghat
    confvar = gvar.T @ psi ** 2  # (n0, p)
    predvar = confvar + sigma

    ypred = predmean * ystd + ymean
    yconfvar = confvar.T * ystd ** 2
    ypredvar = predvar.T * ystd ** 2
    if return_fullcov:
        CH = np.einsum('kn,kp->npk', np.sqrt(gvar), psi)
        cov = CH @ np.transpose(CH, (0, 2, 1)) + np.diag(sigma)[None]
        yv = ystd[:, 0]
        cov = cov * (yv[:, None] * yv[None, :])[None]
        return ypred, ypredvar, yconfvar, cov
    return ypred, ypredvar, yconfvar


def predict_rep_np(lLmb, lLmb0, lsig_groups, lnug, xs, ybar_used, scale, r,
                   phi, diag_D, err_struct, ybar_mean, ybar_std, use_std, x0s):
    """Reference rep aux + predict_rep (lcgp.py:728-803, 864-930), using the
    reference's explicit-inverse T_k construction."""
    lsig = expand_sigma_np(lsig_groups, err_struct)
    sigma_raw = np.exp(lsig)
    n = xs.shape[0]
    q = phi.shape[1]
    n0 = x0s.shape[0]
    r = np.asarray(r, dtype=np.float64)
    sr = np.sqrt(r)
    R = np.diag(r)

    sigma_inv_sqrt_used = scale / np.sqrt(sigma_raw)

    ghat = np.zeros((q, n0))
    gvar = np.zeros((q, n0))
    for k in range(q):
        Ck = matern32_np(xs, xs, lLmb[k], lLmb0[k], lnug[k], same=True)
        v_k = sigma_inv_sqrt_used * phi[:, k]
        b_k = r * (ybar_used.T @ v_k)
        d_k = diag_D[k]
        A = np.eye(n) + d_k * (Ck * sr[None, :] * sr[:, None])
        Cb = Ck @ b_k
        z = np.linalg.solve(A, np.sqrt(d_k) * sr * Cb)
        m_k = Cb - Ck @ (np.sqrt(d_k) * sr * z)
        CinvM_k = b_k - d_k * (R @ m_k)

        invC = np.linalg.inv(Ck)
        P_k = invC + d_k * R
        V_k = np.linalg.inv(P_k)
        Tk = invC - invC @ V_k @ invC

        c00k = lLmb0[k] * np.ones(n0)
        c0k = matern32_np(x0s, xs, lLmb[k], lLmb0[k], lnug[k], same=False)
        ghat[k] = c0k @ CinvM_k
        gvar[k] = c00k - np.sum((c0k @ Tk) * c0k, axis=1)

    sigma_sqrt_used = np.sqrt(sigma_raw) / scale
    sigma_var_used = sigma_raw / scale ** 2
    Psi = phi * sigma_sqrt_used[:, None]
    predmean_used = Psi @ ghat
    confvar_used = Psi ** 2 @ gvar
    predvar_used = confvar_used + sigma_var_used[:, None]

    if use_std:
        ypred = predmean_used * ybar_std + ybar_mean
        yconfvar = confvar_used * ybar_std ** 2
        ypredvar = predvar_used * ybar_std ** 2
    else:
        ypred, yconfvar, ypredvar = predmean_used, confvar_used, predvar_used
    return ypred, ypredvar, yconfvar
