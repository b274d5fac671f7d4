"""Fully on-device optimization loops (no host round-trips per step).

The reference has no equivalent — its optimizer runs eagerly on the host.
These loops keep the whole fit inside one jitted ``lax.while_loop``:

- ``minimize_adam``: fixed-step Adam, good for the large-n 'fast' path.
- ``minimize_lbfgs_jax``: optax L-BFGS with zoom linesearch.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class DeviceFitResult(NamedTuple):
    params: object
    fun: jnp.ndarray
    nit: jnp.ndarray


def minimize_adam(loss_fn: Callable, params0, *, steps: int = 500,
                  learning_rate: float = 5e-2) -> DeviceFitResult:
    opt = optax.adam(learning_rate)
    vg = jax.value_and_grad(loss_fn)

    @jax.jit
    def run(params):
        state = opt.init(params)

        def body(carry, _):
            params, state = carry
            v, g = vg(params)
            updates, state = opt.update(g, state, params)
            params = optax.apply_updates(params, updates)
            return (params, state), v

        (params, _), losses = jax.lax.scan(body, (params, state), None,
                                           length=steps)
        return params, losses[-1]

    params, fun = run(params0)
    return DeviceFitResult(params=params, fun=fun, nit=jnp.asarray(steps))


def minimize_lbfgs_jax(loss_fn: Callable, params0, *, maxiter: int = 500,
                       tol: float = 1e-9) -> DeviceFitResult:
    opt = optax.lbfgs()
    vg = optax.value_and_grad_from_state(loss_fn)

    @jax.jit
    def run(params):
        state = opt.init(params)

        def cond(carry):
            params, state, it = carry
            grad = optax.tree.get(state, "grad")
            gnorm = optax.global_norm(grad)
            return jnp.logical_and(it < maxiter,
                                   jnp.logical_or(it == 0, gnorm > tol))

        def body(carry):
            params, state, it = carry
            value, grad = vg(params, state=state)
            updates, state = opt.update(grad, state, params, value=value,
                                        grad=grad, value_fn=loss_fn)
            params = optax.apply_updates(params, updates)
            return params, state, it + 1

        params, state, it = jax.lax.while_loop(cond, body,
                                               (params, state, jnp.asarray(0)))
        return params, optax.tree.get(state, "value"), it

    params, fun, nit = run(params0)
    return DeviceFitResult(params=params, fun=fun, nit=nit)
