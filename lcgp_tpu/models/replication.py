"""Replication grouping (reference lcgp.py:329-434).

Grouping produces data-dependent shapes, so — like the reference — it runs on
the host with NumPy, *before* anything is jitted.  Unlike the reference's
O(n·N) Python loop over groups (lcgp.py:358-367), the replicate-average uses
a vectorized segment sum.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Replication(NamedTuple):
    x_unique: np.ndarray   # (n, d) unique raw inputs (lexicographically sorted)
    group_ids: np.ndarray  # (N,) int: row -> unique index
    r: np.ndarray          # (n,) int replicate counts
    ybar: np.ndarray       # (p, n) per-group mean of raw y


def group_replicates(x_raw, y_raw) -> Replication:
    """Group duplicate rows of x and average y within groups.

    x_raw: (N, d); y_raw: (p, N).  Matches np.unique(axis=0) semantics used
    by the reference (lcgp.py:349-356): unique rows sorted lexicographically.
    """
    xr = np.asarray(x_raw, dtype=np.float64)
    yr = np.asarray(y_raw, dtype=np.float64)
    assert xr.ndim == 2, "x_raw must be (N, d)"
    assert yr.ndim == 2, "y_raw must be (p, N)"
    assert yr.shape[1] == xr.shape[0], "y_raw columns must match x_raw rows"

    x_unique, inverse, counts = np.unique(
        xr, axis=0, return_inverse=True, return_counts=True)
    inverse = inverse.reshape(-1)
    n = x_unique.shape[0]

    # segment mean: scatter-add columns of y into their group, divide by count
    p = yr.shape[0]
    ysum = np.zeros((p, n), dtype=np.float64)
    np.add.at(ysum.T, inverse, yr.T)
    ybar = ysum / counts[None, :]

    return Replication(
        x_unique=x_unique,
        group_ids=inverse.astype(np.int32),
        r=counts.astype(np.int32),
        ybar=ybar,
    )
