"""Loss wrapper that keeps big data tensors out of jitted closures.

A loss built as ``lambda free: neglpost(free, data)`` embeds ``data`` in
the traced jaxpr as *constants*, which XLA inlines into the serialized
program.  At streaming-FITC scale (n=2M -> ~0.4 GB of training tensors)
that blows past remote-compile payload limits (observed: HTTP 413 from
the axon compile tunnel) and bloats every executable.  ``AuxLoss`` keeps
the loss a pure function of ``(params, aux)`` so optimizers can thread
``aux`` through their jitted blocks as a runtime argument — transferred
to the device once, never serialized into the program.

Host-eager callers can still treat an ``AuxLoss`` as a plain closure:
``loss(params)`` binds the stored aux (fine at small scale, e.g. the
validation harnesses' direct ``jax.grad`` probes).
"""
from __future__ import annotations

from typing import Callable

import jax


class AuxLoss:
    """``fn(params, aux)`` + the aux pytree, callable as ``loss(params)``."""

    def __init__(self, fn: Callable, aux):
        self.fn = fn
        self.aux = aux

    def __call__(self, params):
        return self.fn(params, self.aux)


def split_aux(loss_fn):
    """Normalize any loss to the ``(fn(params, aux), aux)`` form.

    For an :class:`AuxLoss` the aux pytree is also ``device_put`` once so
    repeated jitted-block calls pass committed device arrays (no per-call
    host->device transfer).  A plain closure gets ``aux=None`` (an empty
    pytree — free to thread through jit).
    """
    if isinstance(loss_fn, AuxLoss):
        # leave committed jax.Arrays alone (they may carry a sharding);
        # only host arrays need the one-time transfer
        aux = jax.tree.map(
            lambda a: a if isinstance(a, jax.Array) else jax.device_put(a),
            loss_fn.aux)
        return loss_fn.fn, aux
    return (lambda params, _aux: loss_fn(params)), None
