from .scipy_lbfgs import minimize_lbfgs, FitResult
from .optax_fit import minimize_adam, minimize_lbfgs_jax, DeviceFitResult

__all__ = ["minimize_lbfgs", "FitResult", "minimize_adam",
           "minimize_lbfgs_jax", "DeviceFitResult"]
