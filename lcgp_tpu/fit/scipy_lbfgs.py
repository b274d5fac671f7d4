"""scipy L-BFGS-B driver over a jitted value_and_grad.

This mirrors the reference's training semantics — gpflow.optimizers.Scipy
wrapping scipy.optimize.minimize(method='L-BFGS-B') with default options
(reference lcgp.py:537-540) — but the objective+gradient are one compiled
XLA executable; the host only runs the optimizer's O(params) vector math.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np
import scipy.optimize

import jax
from jax.flatten_util import ravel_pytree

from .auxloss import split_aux


class FitResult(NamedTuple):
    params: object          # optimized pytree (same structure as params0)
    fun: float
    nit: int
    nfev: int
    success: bool
    message: str
    stop_reason: str = 'gtol'   # 'gtol' | 'plateau' | 'cap' | 'other'


def minimize_lbfgs(loss_fn: Callable, params0, verbose: bool = False,
                   callback: Callable = None,
                   plateau_patience: Optional[int] = None,
                   plateau_rtol: float = 1e-8,
                   **scipy_options) -> FitResult:
    """Minimize loss_fn(params_pytree) with scipy L-BFGS-B.

    scipy_options are forwarded to scipy's ``options`` dict (maxiter, ftol,
    gtol, ...); defaults are scipy's, matching gpflow's defaults.
    callback(iteration, loss, params) is invoked per L-BFGS iteration.

    plateau_patience: if set, stop once the relative loss decrease over the
    last ``plateau_patience`` iterations falls below ``plateau_rtol`` —
    a convergence-based cap replacing any hand-tuned maxiter (the optimizer
    routinely spends thousands of late evals on negligible gains).  The
    result's ``stop_reason`` records why optimization ended
    ('gtol'/'plateau'/'cap'/'other').
    """
    flat0, unravel = ravel_pytree(params0)
    # aux (training tensors) rides as a runtime jit argument, not a traced
    # closure constant — see fit/auxloss.py for why (HTTP 413 at n=2M)
    fn, aux = split_aux(loss_fn)
    _vg = jax.jit(jax.value_and_grad(
        lambda flat, aux: fn(unravel(flat), aux)))
    vg = lambda flat: _vg(flat, aux)

    neval = 0
    nit_seen = 0
    last_val = [np.inf]
    history: list = []
    plateaued = [False]

    last_xk = [None]

    def scipy_cb(xk):
        nonlocal nit_seen
        nit_seen += 1
        last_xk[0] = np.array(xk, copy=True)
        if callback is not None:
            callback(nit_seen, last_val[0], unravel(xk))
        if plateau_patience is not None:
            history.append(last_val[0])
            if len(history) > plateau_patience:
                prev = history[-plateau_patience - 1]
                cur = history[-1]
                denom = max(1.0, abs(cur))
                if np.isfinite(prev) and np.isfinite(cur) and \
                        (prev - cur) / denom < plateau_rtol:
                    plateaued[0] = True
                    raise StopIteration

    def fun_and_jac(z):
        nonlocal neval
        neval += 1
        v, g = vg(z)
        v = float(v)
        g = np.asarray(g, dtype=np.float64)
        if not np.isfinite(v):
            # L-BFGS-B backtracks reliably on inf but can stall on NaN:
            # map any non-finite objective to +inf and kill NaN gradients
            # so the line search can recover instead of poisoning the state.
            v = np.inf
            g = np.where(np.isfinite(g), g, 0.0)
        if verbose:
            print(f"[lcgp_tpu.fit] eval {neval:4d}  loss {v:.8g}")
        last_val[0] = v
        return v, g

    use_cb = callback is not None or plateau_patience is not None
    try:
        res = scipy.optimize.minimize(
            fun_and_jac,
            np.asarray(flat0, dtype=np.float64),
            jac=True,
            method="L-BFGS-B",
            callback=scipy_cb if use_cb else None,
            options=scipy_options or None,
        )
    except StopIteration:
        # scipy < 1.11 does not translate a callback StopIteration into a
        # graceful stop (ADVICE r3 medium); recover the best-seen iterate.
        res = scipy.optimize.OptimizeResult(
            x=last_xk[0] if last_xk[0] is not None
            else np.asarray(flat0, dtype=np.float64),
            fun=last_val[0], nit=nit_seen, nfev=neval, success=True,
            message='plateau stop (pre-1.11 scipy StopIteration path)')
    msg = str(res.message)
    if plateaued[0]:
        reason = 'plateau'
    elif 'MAXIMUM NUMBER OF ITERATION' in msg.upper() or \
            ('maxiter' in scipy_options
             and int(res.nit) >= int(scipy_options['maxiter'])):
        reason = 'cap'
    elif res.success:
        reason = 'gtol'
    else:
        reason = 'other'
    return FitResult(
        params=unravel(res.x),
        fun=float(res.fun),
        nit=int(res.nit),
        nfev=int(res.nfev),
        success=bool(res.success) or plateaued[0],
        message=msg,
        stop_reason=reason,
    )
