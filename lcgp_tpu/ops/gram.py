"""Gram-stack dispatch: Pallas TPU kernel when it applies, jnp otherwise.

The Pallas path (``matern_pallas``) builds the (q,n1,n2) stack in one pass
through VMEM — the d-dimensional outer-difference accumulation, exp, nugget,
and amplitude all fused — and only supports float32 on real TPUs.  Every
other case (float64, CPU, tiny shapes where launch overhead dominates) falls
back to the jnp implementation, which XLA fuses adequately.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .matern import matern32_gram

# Pallas pays off once the tile grid is non-trivial.
_PALLAS_MIN_N = 256


def _pallas_applicable(x1, x2, dtype, same: bool) -> bool:
    # Opt-in (LCGP_TPU_PALLAS=1): measured end-to-end at the headline
    # config, XLA's elementwise fusion of the jnp Gram is currently ~12%
    # faster than the Pallas kernel pair; the kernel is kept (correct and
    # TPU-verified) for its fused backward and further tuning.
    if not os.environ.get("LCGP_TPU_PALLAS"):
        return False
    if os.environ.get("LCGP_TPU_DISABLE_PALLAS"):
        return False
    if dtype != jnp.float32:
        return False
    if jax.default_backend() in ("cpu",):
        return False
    # Restricted to the square training Grams: the rectangular predict-time
    # cross-gram is a small fraction of the work, and the Pallas cross case
    # embedded in the larger predict program has crashed the v5e worker
    # (standalone it passes — under investigation); jnp/XLA handles it.
    if not same:
        return False
    return x1.shape[0] >= _PALLAS_MIN_N and x2.shape[0] >= _PALLAS_MIN_N


def gram_stack(x1, x2, lengthscales, amplitudes, nuggets, *, same: bool,
               compute_dtype=None, kind: str = 'matern32'):
    """Batched Gram stack with optional compute-dtype override.

    kind='matern32' (the reference's kernel, default) or 'rbf' (separable
    squared-exponential extra).  compute_dtype=None keeps the input dtype
    (float64 parity path); jnp.float32 selects the fast MXU/Pallas path.
    """
    if compute_dtype is not None:
        dt = jnp.dtype(compute_dtype)
        x1 = jnp.asarray(x1, dtype=dt)
        x2 = jnp.asarray(x2, dtype=dt)
        lengthscales = jnp.asarray(lengthscales, dtype=dt)
        amplitudes = jnp.asarray(amplitudes, dtype=dt)
        nuggets = jnp.asarray(nuggets, dtype=dt)
    else:
        dt = jnp.asarray(x1).dtype

    if kind == 'rbf':
        # SE factors through a batched MXU matmul; XLA is already optimal
        from .rbf import rbf_gram
        return rbf_gram(x1, x2, lengthscales, amplitudes, nuggets, same=same)
    if kind != 'matern32':
        raise ValueError(f"unknown kernel kind {kind!r}")

    if _pallas_applicable(jnp.asarray(x1), jnp.asarray(x2), dt, same):
        from .matern_pallas import matern32_gram_pallas
        # `same` positional: custom_vjp nondiff argument
        return matern32_gram_pallas(x1, x2, lengthscales, amplitudes, nuggets,
                                    same)
    return matern32_gram(x1, x2, lengthscales, amplitudes, nuggets, same=same)


def gram_vjp(x1, x2, lengthscales, amplitudes, nuggets, *, same: bool,
             cbar, kind: str = 'matern32'):
    """Analytic (glens, gamp, gnug) for a Gram-stack cotangent ``cbar``.

    Used by the custom-VJP loss paths; dispatches to the Pallas backward
    kernel when the forward would have used Pallas, else the jnp analytic
    form.  x carries no gradient (it is data).
    """
    if kind == 'rbf':
        from .rbf import rbf_gram_vjp
        return rbf_gram_vjp(x1, x2, lengthscales, amplitudes, nuggets,
                            same=same, cbar=cbar)
    if kind != 'matern32':
        raise ValueError(f"unknown kernel kind {kind!r}")
    if _pallas_applicable(jnp.asarray(x1), jnp.asarray(x2),
                          jnp.asarray(cbar).dtype, same):
        from .matern_pallas import _bwd_call
        return _bwd_call(x1, x2, lengthscales, amplitudes, nuggets, same,
                         cbar)
    from .matern import matern32_gram_vjp
    return matern32_gram_vjp(x1, x2, lengthscales, amplitudes, nuggets,
                             same=same, cbar=cbar)
