"""Pallas TPU kernels for the batched Matérn 3/2 Gram stack (float32).

Why a kernel — and why this shape.  The separable product kernel needs, for
every component k, ``prod_j (1+S_jk) * exp(-sum_j S_jk)`` with
``S_jk = |x1_i - x2_j| / l_kj``.  The raw per-dimension distance
``D_j = |x1_i - x2_j|`` does NOT depend on k — only its scaling does.  XLA's
elementwise fusion recomputes the (n,n) outer differences for every k; this
kernel computes each tile's d distance planes ONCE into VMEM scratch (at the
first q-step of each (i,j) tile) and reuses them across all q components —
q× less broadcast work than any fusion of the jnp formulation, with the
exp/nugget/amplitude epilogue fused and each output tile written exactly
once.

Layout: x1 rides in naturally as (n1, d) — its per-dimension column
x1[:, j] is a *sublane* vector, broadcasting as the row axis of the tile —
while x2 is passed transposed (d, n2) so x2[j, :] is a *lane* vector for
the column axis.  Grid is (n1/TI, n2/TJ, q/QB) with the q-block axis
innermost so the distance scratch stays valid; per-component
lengthscale/amplitude/nugget scalars live whole in SMEM.

The backward pass (cotangents for lengthscales, amplitude, nugget — x is
data, no gradient) reuses the same structure and accumulates the (q,d)+2q
scalar gradients in SMEM outputs across the sequential grid (constant-index
whole-array blocks, zeroed at the first step).

Mosaic gotcha (v5e toolchain): index maps must not return Python-int
constants — under jax_enable_x64 they trace to i64 and fail to legalize.
All constant coordinates are derived from a program id (``i * 0``).

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
    """Whole-array SMEM block (constant coords via program-id arithmetic)."""
    return pl.BlockSpec(shape, lambda i, j, kq: tuple(i * 0 for _ in shape),
                        memory_space=pltpu.SMEM)


def _diag_mask(i, jj, ti, tj):
    row = jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0) + i * ti
    col = jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1) + jj * tj
    return row == col


def _fill_diffs(x1_ref, x2_ref, diffs_ref, d):
    for j in range(d):
        a = x1_ref[:, j]            # (ti,) sublane vector
        b = x2_ref[j, :]            # (tj,) lane vector
        diffs_ref[j, :, :] = jnp.abs(a[:, None] - b[None, :])


def _fwd_kernel(invl_ref, amp_ref, nug_ref, x1_ref, x2_ref, out_ref,
                diffs_ref, *, d: int, qb: int, same: bool, ti: int, tj: int):
    i = pl.program_id(0)
    jj = pl.program_id(1)
    kq = pl.program_id(2)

    @pl.when(kq == 0)
    def _():
        _fill_diffs(x1_ref, x2_ref, diffs_ref, d)

    if same:
        diag = _diag_mask(i, jj, ti, tj)

    for kk in range(qb):
        k = kq * qb + kk
        prod = jnp.ones((ti, tj), jnp.float32)
        ssum = jnp.zeros((ti, tj), jnp.float32)
        for j in range(d):
            s = diffs_ref[j, :, :] * invl_ref[k, j]
            prod = prod * (1.0 + s)
            ssum = ssum + s
        c0 = prod * jnp.exp(-ssum)
        nug = nug_ref[k, 0]
        eta = nug / (1.0 + nug)
        c = (1.0 - eta) * c0
        if same:
            c = jnp.where(diag, c + eta, c)
        out_ref[kk, :, :] = amp_ref[k, 0] * c


def _bwd_kernel(invl_ref, amp_ref, nug_ref, x1_ref, x2_ref, gbar_ref,
                glens_ref, gamp_ref, gnug_ref, diffs_ref, *,
                d: int, qb: int, nqp: int, same: bool, ti: int, tj: int):
    i = pl.program_id(0)
    jj = pl.program_id(1)
    kq = pl.program_id(2)

    first = jnp.logical_and(i == 0, jnp.logical_and(jj == 0, kq == 0))

    @pl.when(first)
    def _():
        # SMEM accepts only scalar stores; q and d are small and static
        for kk in range(nqp):
            for j in range(d):
                glens_ref[kk, j] = 0.0
            gamp_ref[kk, 0] = 0.0
            gnug_ref[kk, 0] = 0.0

    @pl.when(kq == 0)
    def _():
        _fill_diffs(x1_ref, x2_ref, diffs_ref, d)

    if same:
        diag = _diag_mask(i, jj, ti, tj).astype(jnp.float32)

    for kk in range(qb):
        k = kq * qb + kk
        g = gbar_ref[kk, :, :]
        prod = jnp.ones((ti, tj), jnp.float32)
        ssum = jnp.zeros((ti, tj), jnp.float32)
        for j in range(d):
            s = diffs_ref[j, :, :] * invl_ref[k, j]
            prod = prod * (1.0 + s)
            ssum = ssum + s
        c0 = prod * jnp.exp(-ssum)

        amp = amp_ref[k, 0]
        nug = nug_ref[k, 0]
        eta = nug / (1.0 + nug)

        # d/d amp: (1-eta) C0 (+ eta on diag)
        damp = (1.0 - eta) * c0
        if same:
            damp = damp + eta * diag
        gamp_ref[k, 0] += jnp.sum(g * damp)

        # d/d eta: amp (delta_diag - C0); chain via 1/(1+nug)^2
        deta = (diag - c0) if same else -c0
        gnug_ref[k, 0] += jnp.sum(g * deta) * amp / ((1.0 + nug) * (1.0 + nug))

        # dC/dl_j = amp (1-eta) C0 S_j^2 / ((1+S_j) l_j)
        w = g * (amp * (1.0 - eta) * c0)
        for j in range(d):
            il = invl_ref[k, j]
            s = diffs_ref[j, :, :] * il
            glens_ref[k, j] += jnp.sum(w * s * s / (1.0 + s)) * il


# v5e VMEM is ~16MB/core (raising Mosaic's limit past physical VMEM crashes
# the worker — verified the hard way).  Mosaic's stack accounting runs ~2x
# the naive buffer estimate, so budget well under 16MB.
_VMEM_BUDGET = 7 * 1024 * 1024


def _pick_qb(q, d, ti, tj, extra_blocks=0):
    """Largest q-block whose double-buffered output tiles + distance scratch
    fit in the VMEM budget.  Taking all of q in one block removes both the
    q-padding waste and per-step grid overhead."""
    scratch = d * ti * tj * 4
    for qb in range(q, 0, -1):
        need = (2 + extra_blocks) * qb * ti * tj * 4 + scratch
        if need <= _VMEM_BUDGET:
            return qb
    return 1


def _prep(x1, x2, lengthscales, amplitudes, nuggets, ti, tj, extra_blocks=0):
    """Pad inputs/params to tile/q-block multiples (benign values)."""
    q, d = lengthscales.shape
    qb = _pick_qb(q, d, ti, tj, extra_blocks)
    qp = _round_up(q, qb)
    x1p = jnp.pad(x1.astype(jnp.float32),
                  ((0, _round_up(x1.shape[0], ti) - x1.shape[0]), (0, 0)))
    x2t = jnp.pad(x2.T.astype(jnp.float32),
                  ((0, 0), (0, _round_up(x2.shape[0], tj) - x2.shape[0])))
    invl = jnp.pad((1.0 / lengthscales).astype(jnp.float32),
                   ((0, qp - q), (0, 0)), constant_values=1.0)
    amp = jnp.pad(amplitudes.astype(jnp.float32), (0, qp - q))[:, None]
    nug = jnp.pad(nuggets.astype(jnp.float32), (0, qp - q),
                  constant_values=1e-6)[:, None]
    return x1p, x2t, invl, amp, nug, q, d, qb, qp


def _fwd_call(x1, x2, lengthscales, amplitudes, nuggets, same: bool):
    n1, n2 = x1.shape[0], x2.shape[0]
    ti = tj = TILE
    x1p, x2t, invl, amp, nug, q, d, qb, qp = _prep(
        x1, x2, lengthscales, amplitudes, nuggets, ti, tj)
    n1p, n2p = x1p.shape[0], x2t.shape[1]

    grid = (n1p // ti, n2p // tj, qp // qb)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, d=d, qb=qb, same=same, ti=ti, tj=tj),
        grid=grid,
        in_specs=[
            _smem_full((qp, d)),
            _smem_full((qp, 1)),
            _smem_full((qp, 1)),
            pl.BlockSpec((ti, d), lambda i, j, kq: (i, j * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tj), lambda i, j, kq: (i * 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qb, ti, tj), lambda i, j, kq: (kq, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, n1p, n2p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((d, ti, tj), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=(4 * qp + 6) * d * n1p * n2p,
            transcendentals=qp * n1p * n2p,
            bytes_accessed=4 * (qp * n1p * n2p + d * (n1p + n2p))),
        interpret=_interpret(),
    )(invl, amp, nug, x1p, x2t)
    return out[:q, :n1, :n2]


def _bwd_call(x1, x2, lengthscales, amplitudes, nuggets, same: bool, gbar):
    n1, n2 = x1.shape[0], x2.shape[0]
    ti = tj = TILE
    x1p, x2t, invl, amp, nug, q, d, qb, qp = _prep(
        x1, x2, lengthscales, amplitudes, nuggets, ti, tj,
        extra_blocks=2)  # gbar input blocks are also double-buffered
    n1p, n2p = x1p.shape[0], x2t.shape[1]
    # zero-pad cotangent so padded lanes/components contribute nothing
    gbar_p = jnp.pad(gbar.astype(jnp.float32),
                     ((0, qp - q), (0, n1p - n1), (0, n2p - n2)))

    grid = (n1p // ti, n2p // tj, qp // qb)
    glens, gamp, gnug = pl.pallas_call(
        functools.partial(_bwd_kernel, d=d, qb=qb, nqp=qp, same=same,
                          ti=ti, tj=tj),
        grid=grid,
        in_specs=[
            _smem_full((qp, d)),
            _smem_full((qp, 1)),
            _smem_full((qp, 1)),
            pl.BlockSpec((ti, d), lambda i, j, kq: (i, j * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tj), lambda i, j, kq: (i * 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, ti, tj), lambda i, j, kq: (kq, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # constant-index whole-array SMEM blocks: zeroed at the first
            # grid step, accumulated across the sequential grid
            _smem_full((qp, d)),
            _smem_full((qp, 1)),
            _smem_full((qp, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, d), jnp.float32),
            jax.ShapeDtypeStruct((qp, 1), jnp.float32),
            jax.ShapeDtypeStruct((qp, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((d, ti, tj), jnp.float32)],
        interpret=_interpret(),
    )(invl, amp, nug, x1p, x2t, gbar_p)
    return glens[:q], gamp[:q, 0], gnug[:q, 0]


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
