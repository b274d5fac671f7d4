"""Pallas TPU kernel for the batched Matérn 3/2 Gram stack (float32).

Why a kernel: the separable product kernel needs a d-pass accumulation of
``prod *= (1+S_j)`` and ``sum += S_j`` over per-dimension outer differences.
XLA materializes the two (q,n,n) accumulators in HBM on every d-step
(~4·d·q·n² float reads+writes); this kernel keeps both accumulators in VMEM
registers per (TI,TJ) tile and writes the finished tile exactly once —
HBM traffic drops from O(d·q·n²) to O(q·n²).

Layout: x1 rides in naturally as (n1, d) — its per-dimension column
x1[:, j] is a *sublane* vector, broadcasting cheaply as the row axis of the
tile — while x2 is passed transposed (d, n2) so x2[j, :] is a *lane* vector
for the column axis.  The (TI,1)·(1,TJ) outer |difference| then maps
directly onto the VPU with no in-kernel transposes.  Grid is
(q, n1/TI, n2/TJ); per-component lengthscales/amplitude/nugget live whole
in SMEM, indexed by ``pl.program_id(0)``.

The backward pass (cotangents for lengthscales, amplitude, nugget — x is
data, no gradient) is its own kernel using grid-revisit accumulation: the
gradient outputs use constant-index full-array SMEM blocks, zeroed at the
first grid step and accumulated in place across the sequential TPU grid.

Reference behavior contract: covmat.py:5-55 (see ops/matern.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256


def _interpret() -> bool:
    """Interpreter mode (CPU testing): LCGP_TPU_PALLAS_INTERPRET=1."""
    return bool(os.environ.get("LCGP_TPU_PALLAS_INTERPRET"))


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _smem_full(shape):
    """Whole-array SMEM block.

    The index map derives its zeros from a program id (k*0) instead of
    Python-int constants: under jax_enable_x64, constant index maps trace to
    i64 and Mosaic fails to legalize them (observed on the v5e toolchain);
    program-id arithmetic stays i32."""
    return pl.BlockSpec(shape, lambda k, i, j: tuple(k * 0 for _ in shape),
                        memory_space=pltpu.SMEM)


def _fwd_kernel(invl_ref, amp_ref, nug_ref, x1_ref, x2_ref, out_ref, *,
                d: int, same: bool, ti: int, tj: int):
    k = pl.program_id(0)
    prod = jnp.ones((ti, tj), jnp.float32)
    ssum = jnp.zeros((ti, tj), jnp.float32)
    for j in range(d):
        il = invl_ref[k, j]
        a = x1_ref[:, j] * il        # (ti,) sublane vector
        b = x2_ref[j, :] * il        # (tj,) lane vector
        s = jnp.abs(a[:, None] - b[None, :])
        prod = prod * (1.0 + s)
        ssum = ssum + s
    c0 = prod * jnp.exp(-ssum)

    nug = nug_ref[k, 0]
    eta = nug / (1.0 + nug)
    c = (1.0 - eta) * c0
    if same:
        i = pl.program_id(1)
        jj = pl.program_id(2)
        row = jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0) + i * ti
        col = jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1) + jj * tj
        c = jnp.where(row == col, c + eta, c)
    out_ref[0, :, :] = amp_ref[k, 0] * c


def _bwd_kernel(invl_ref, amp_ref, nug_ref, x1_ref, x2_ref, gbar_ref,
                glens_ref, gamp_ref, gnug_ref, *,
                d: int, nq: int, same: bool, ti: int, tj: int):
    k = pl.program_id(0)
    i = pl.program_id(1)
    jj = pl.program_id(2)

    first = jnp.logical_and(k == 0, jnp.logical_and(i == 0, jj == 0))

    @pl.when(first)
    def _():
        # SMEM accepts only scalar stores; q and d are small and static
        for kk in range(nq):
            for j in range(d):
                glens_ref[kk, j] = 0.0
            gamp_ref[kk, 0] = 0.0
            gnug_ref[kk, 0] = 0.0

    # pass 1: rebuild C0 for this tile
    prod = jnp.ones((ti, tj), jnp.float32)
    ssum = jnp.zeros((ti, tj), jnp.float32)
    for j in range(d):
        il = invl_ref[k, j]
        a = x1_ref[:, j] * il        # (ti,) sublane vector
        b = x2_ref[j, :] * il        # (tj,) lane vector
        s = jnp.abs(a[:, None] - b[None, :])
        prod = prod * (1.0 + s)
        ssum = ssum + s
    c0 = prod * jnp.exp(-ssum)

    g = gbar_ref[0, :, :]
    amp = amp_ref[k, 0]
    nug = nug_ref[k, 0]
    eta = nug / (1.0 + nug)

    if same:
        row = jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0) + i * ti
        col = jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1) + jj * tj
        diag = (row == col).astype(jnp.float32)
    else:
        diag = None

    # d/d amp: (1-eta) C0 (+ eta on diag)
    damp = (1.0 - eta) * c0
    if same:
        damp = damp + eta * diag
    gamp_ref[k, 0] += jnp.sum(g * damp)

    # d/d eta: amp (delta_diag - C0); chain to raw nugget via 1/(1+nug)^2
    deta = -c0 if diag is None else (diag - c0)
    gnug_ref[k, 0] += jnp.sum(g * deta) * amp / ((1.0 + nug) * (1.0 + nug))

    # pass 2 (per dim): dC/dl_j = amp (1-eta) C0 S_j^2 / ((1+S_j) l_j)
    w = g * (amp * (1.0 - eta) * c0)
    for j in range(d):
        il = invl_ref[k, j]
        a = x1_ref[:, j] * il
        b = x2_ref[j, :] * il
        s = jnp.abs(a[:, None] - b[None, :])
        glens_ref[k, j] += jnp.sum(w * s * s / (1.0 + s)) * il


def _pad_cols(xt, tile):
    d, n = xt.shape
    return jnp.pad(xt, ((0, 0), (0, _round_up(n, tile) - n)))


def _pad_rows(x, tile):
    n, d = x.shape
    return jnp.pad(x, ((0, _round_up(n, tile) - n), (0, 0)))


def _fwd_call(x1, x2, lengthscales, amplitudes, nuggets, same: bool):
    q, d = lengthscales.shape
    n1, n2 = x1.shape[0], x2.shape[0]
    ti = tj = TILE
    x1p = _pad_rows(x1.astype(jnp.float32), ti)
    x2t = _pad_cols(x2.T.astype(jnp.float32), tj)
    n1p, n2p = x1p.shape[0], x2t.shape[1]
    invl = (1.0 / lengthscales).astype(jnp.float32)
    amp = amplitudes.astype(jnp.float32)[:, None]
    nug = nuggets.astype(jnp.float32)[:, None]

    grid = (q, n1p // ti, n2p // tj)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, d=d, same=same, ti=ti, tj=tj),
        grid=grid,
        in_specs=[
            _smem_full((q, d)),
            _smem_full((q, 1)),
            _smem_full((q, 1)),
            pl.BlockSpec((ti, d), lambda k, i, j: (i, k * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tj), lambda k, i, j: (k * 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ti, tj), lambda k, i, j: (k, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, n1p, n2p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=6 * d * q * n1p * n2p, transcendentals=q * n1p * n2p,
            bytes_accessed=4 * (q * n1p * n2p + d * (n1p + n2p))),
        interpret=_interpret(),
    )(invl, amp, nug, x1p, x2t)
    return out[:, :n1, :n2]


def _bwd_call(x1, x2, lengthscales, amplitudes, nuggets, same: bool, gbar):
    q, d = lengthscales.shape
    n1, n2 = x1.shape[0], x2.shape[0]
    ti = tj = TILE
    x1p = _pad_rows(x1.astype(jnp.float32), ti)
    x2t = _pad_cols(x2.T.astype(jnp.float32), tj)
    n1p, n2p = x1p.shape[0], x2t.shape[1]
    # zero-pad cotangent so padded lanes contribute nothing
    gbar_p = jnp.pad(gbar.astype(jnp.float32),
                     ((0, 0), (0, n1p - n1), (0, n2p - n2)))
    invl = (1.0 / lengthscales).astype(jnp.float32)
    amp = amplitudes.astype(jnp.float32)[:, None]
    nug = nuggets.astype(jnp.float32)[:, None]

    grid = (q, n1p // ti, n2p // tj)
    glens, gamp, gnug = pl.pallas_call(
        functools.partial(_bwd_kernel, d=d, nq=q, same=same, ti=ti, tj=tj),
        grid=grid,
        in_specs=[
            _smem_full((q, d)),
            _smem_full((q, 1)),
            _smem_full((q, 1)),
            pl.BlockSpec((ti, d), lambda k, i, j: (i, k * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tj), lambda k, i, j: (k * 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, tj), lambda k, i, j: (k, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # constant-index whole-array blocks: zeroed at the first grid
            # step, accumulated across the sequential grid
            _smem_full((q, d)),
            _smem_full((q, 1)),
            _smem_full((q, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, d), jnp.float32),
            jax.ShapeDtypeStruct((q, 1), jnp.float32),
            jax.ShapeDtypeStruct((q, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(invl, amp, nug, x1p, x2t, gbar_p)
    return glens, gamp[:, 0], gnug[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def matern32_gram_pallas(x1, x2, lengthscales, amplitudes, nuggets,
                         same: bool = False):
    """Float32 Pallas Gram stack; same contract as matern.matern32_gram."""
    return _fwd_call(x1, x2, lengthscales, amplitudes, nuggets, same)


def _vjp_fwd(x1, x2, lengthscales, amplitudes, nuggets, same):
    out = _fwd_call(x1, x2, lengthscales, amplitudes, nuggets, same)
    return out, (x1, x2, lengthscales, amplitudes, nuggets)


def _vjp_bwd(same, res, gbar):
    x1, x2, lengthscales, amplitudes, nuggets = res
    glens, gamp, gnug = _bwd_call(x1, x2, lengthscales, amplitudes, nuggets,
                                  same, gbar)
    return (jnp.zeros_like(x1), jnp.zeros_like(x2),
            glens.astype(lengthscales.dtype),
            gamp.astype(amplitudes.dtype),
            gnug.astype(nuggets.dtype))


matern32_gram_pallas.defvjp(_vjp_fwd, _vjp_bwd)
