"""Input/output standardization (reference lcgp.py:295-324, 383-395).

Pure, shape-stable functions.  Host-friendly (also used at construction time
on NumPy arrays) and jit-safe.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def standardize_x(x):
    """Min-max scale x to [0,1]^d (reference init_standard_x, lcgp.py:295-310).

    Returns (xs, x_min, x_max).  The reference also computes ``xnorm`` (mean
    positive pairwise distance per dim) which it never consumes; see
    :func:`xnorm` — kept separate so large-n construction doesn't pay O(n^2).
    """
    x = jnp.asarray(x)
    x_min = jnp.min(x, axis=0)
    x_max = jnp.max(x, axis=0)
    xs = (x - x_min) / (x_max - x_min)
    return xs, x_min, x_max


def xnorm(x, block: int = 1024):
    """Per-dimension mean positive pairwise |x_i - x_j| (lcgp.py:304-310).

    Unused by the model math (SURVEY §3.5.2) but part of the public state.
    Computed blockwise on host to avoid an (n,n,d) temporary.
    """
    x = np.asarray(x)
    n, d = x.shape
    out = np.zeros(d)
    for j in range(d):
        tot = 0.0
        cnt = 0
        col = x[:, j]
        for s in range(0, n, block):
            dist = np.abs(col[s:s + block, None] - col[None, :])
            pos = dist > 0
            tot += dist[pos].sum()
            cnt += int(pos.sum())
        out[j] = tot / cnt if cnt else 0.0
    return out


def center_spread(y, robust: bool, floor_zero_spread: bool = False):
    """Per-output-row center/spread (reference lcgp.py:312-324, 383-395).

    robust=True  -> median / median-absolute-deviation
    robust=False -> mean / population std
    floor_zero_spread replaces non-positive spreads with 1 (the rep path
    does this, lcgp.py:394; the full path does not).
    """
    y = jnp.asarray(y)
    if robust:
        c = jnp.percentile(y, 50.0, axis=1, keepdims=True)
        s = jnp.percentile(jnp.abs(y - c), 50.0, axis=1, keepdims=True)
    else:
        c = jnp.mean(y, axis=1, keepdims=True)
        s = jnp.std(y, axis=1, keepdims=True)
    if floor_zero_spread:
        s = jnp.where(s > 0, s, jnp.ones_like(s))
    return c, s


def standardize_y(y, robust: bool):
    """Full-path y standardization (reference init_standard_y, lcgp.py:312-324)."""
    c, s = center_spread(y, robust, floor_zero_spread=False)
    return (y - c) / s, c, s
