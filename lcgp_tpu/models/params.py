"""Hyperparameters: SoftClip-constrained pytree + data-driven init.

The reference stores four trainables as gpflow Parameters with
tfp.bijectors.SoftClip constraints (reference lcgp.py:181-211) and a
data-driven init (lcgp.py:490-513).  Here the *free* (unconstrained) values
are a plain NamedTuple pytree — the natural JAX shape for jax.grad and for
flattening into a scipy L-BFGS-B vector.

SoftClip (hinge softness 1, the gpflow default):

    f(x) = low + softplus(x - low) - softplus(x - high)

smooth, monotone, identity deep in the interior, range (low, high).  The
inverse is closed-form: with u = y - low and delta = high - low,

    f^{-1}(y) = low + u + log1p(-exp(-u)) - log1p(-exp(u - delta))

(derived by solving (1+e^{x-low})/(1+e^{x-high}) = e^{u}).  Both directions
are overflow-safe for the extreme bounds used here (e.g. [1e-6, 1e4]).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

import jax.numpy as jnp
from jax import nn


class SoftClip(NamedTuple):
    low: float
    high: float

    def forward(self, x):
        x = jnp.asarray(x)
        y = self.low + nn.softplus(x - self.low) - nn.softplus(x - self.high)
        # fp rounding can land an ulp outside (low, high) for narrow
        # intervals; clamp (gradient there is saturated-zero anyway)
        return jnp.clip(y, self.low, self.high)

    def inverse(self, y):
        y = jnp.asarray(y)
        u = y - self.low
        delta = self.high - self.low
        return self.low + u + jnp.log1p(-jnp.exp(-u)) - jnp.log1p(-jnp.exp(u - delta))


class Identity(NamedTuple):
    def forward(self, x):
        return jnp.asarray(x)

    def inverse(self, y):
        return jnp.asarray(y)


# Constraint ranges, exactly the reference's (lcgp.py:184-210)
LLMB_CLIP = SoftClip(1e-6, 1e4)      # per-dim lengthscales
LLMB0_CLIP = SoftClip(1e-4, 1e4)     # amplitudes
LNUG_CLIP = SoftClip(math.exp(-16.0), math.exp(-2.0))  # nugget scale
LSIGMA_ID = Identity()               # error log-variances: unconstrained


class FreeParams(NamedTuple):
    """Unconstrained pytree.  lLmb (q,d), lLmb0 (q,), lsigma2s (n_groups,),
    lnugGPs (q,)."""
    lLmb: jnp.ndarray
    lLmb0: jnp.ndarray
    lsigma2s: jnp.ndarray
    lnugGPs: jnp.ndarray


def constrain(free: FreeParams):
    """free -> constrained (lLmb, lLmb0, lsigma2s, lnugGPs)."""
    return (
        LLMB_CLIP.forward(free.lLmb),
        LLMB0_CLIP.forward(free.lLmb0),
        LSIGMA_ID.forward(free.lsigma2s),
        LNUG_CLIP.forward(free.lnugGPs),
    )


def unconstrain(lLmb, lLmb0, lsigma2s, lnugGPs) -> FreeParams:
    return FreeParams(
        lLmb=LLMB_CLIP.inverse(lLmb),
        lLmb0=LLMB0_CLIP.inverse(lLmb0),
        lsigma2s=LSIGMA_ID.inverse(lsigma2s),
        lnugGPs=LNUG_CLIP.inverse(lnugGPs),
    )


def sigma_index_map(diag_error_structure) -> np.ndarray:
    """(p,) int map: output dim -> error group.  Replaces the reference's
    scatter loop in get_param (lcgp.py:521-531) with a single gather."""
    return np.repeat(
        np.arange(len(diag_error_structure)),
        np.asarray(diag_error_structure, dtype=np.int64),
    ).astype(np.int32)


def expand_sigma(lsigma2s, index_map):
    """(n_groups,) grouped log-variances -> (p,) per-output, via gather."""
    return jnp.asarray(lsigma2s)[jnp.asarray(index_map)]


def init_values(x_std, y_for_sigma, q: int, diag_error_structure, dtype=jnp.float64):
    """Data-driven constrained init (reference init_params, lcgp.py:490-513).

    x_std : (N, d) the *standardized full* inputs (even in rep mode the
        reference uses the all-N standardized x here).
    y_for_sigma : (p, N) — the reference's ``self.y`` at init time: raw y in
        rep mode, standardized y in full mode (SURVEY §3.5.8; preserved).
    """
    x_std = np.asarray(x_std, dtype=np.float64)
    y = np.asarray(y_for_sigma, dtype=np.float64)
    d = x_std.shape[1]

    llmb = np.exp(0.5 * np.log(d) + np.log(np.std(x_std, axis=0)))
    lLmb = np.tile(llmb, q).reshape(q, d)
    lLmb0 = np.ones(q)
    lnug = np.exp(-10.0) * np.ones(q)

    groups = list(diag_error_structure)
    lsig = np.zeros(len(groups))
    col = 0
    for k, g in enumerate(groups):
        lsig[k] = np.log(np.var(y[col:col + g]))
        col += g

    free = unconstrain(
        jnp.asarray(lLmb, dtype=dtype),
        jnp.asarray(lLmb0, dtype=dtype),
        jnp.asarray(lsig, dtype=dtype),
        jnp.asarray(lnug, dtype=dtype),
    )
    return free
