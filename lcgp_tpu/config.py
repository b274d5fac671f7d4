"""Global numeric configuration.

The reference implementation forces float64 everywhere
(``tf.keras.backend.set_floatx('float64')``, reference covmat.py:2,
lcgp.py:16).  The JAX analogue is the x64 flag; we enable it at import
unless the user opts out with ``LCGP_TPU_NO_X64=1``.

Precision modes
---------------
``'high'``  : float64 end-to-end (parity with the reference; TPU f64 is
              software-emulated but still far faster than the CPU baseline).
``'mixed'`` : f64 data/Gram/reductions with mixed-precision factorizations
              (f32 Cholesky + f64-GEMM Newton refinement, ops/mixed.py) —
              ~3.4x faster factor at n=4096 with ~1e-8 logdet error in the
              moderate-conditioning regime.  Validated vs the f64 oracle;
              see RESULTS.md.
``'fast'``  : float32 Gram construction + factorizations with a jitter
              floor — the large-n speed path on the MXU.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

if not os.environ.get("LCGP_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# On TPU, f32 matmuls run at DEFAULT precision = bf16 MXU passes (~3
# decimal digits).  That silently downgrades every raw f32 GEMM in the
# 'fast' path (chol_inverse's syrk, predict recombinations, blocked
# trailing updates — measured: bf16-grade Schur updates break the PSD
# margin of factorization targets and NaN the factor).  Force true-f32
# matmul semantics; opt back into bf16 speed with LCGP_TPU_FAST_MATMUL=1
# only if ~1e-3 relative accuracy is acceptable.
if not os.environ.get("LCGP_TPU_FAST_MATMUL"):
    jax.config.update("jax_default_matmul_precision", "float32")


_PRECISION_DTYPES = {
    "high": jnp.float64,
    # sentinel string threaded through the static compute_dtype arg; the
    # Gram builds treat it as f64, the factorizations switch to ops/mixed
    "mixed": "mixed",
    "fast": jnp.float32,
}

# Jitter added to the diagonal of Cholesky targets in 'fast' (f32) mode to
# keep factorizations stable.  'high' mode adds nothing: the reference adds
# nothing, and parity demands the same conditioning behavior.
_PRECISION_JITTER = {
    "high": 0.0,
    "mixed": 0.0,   # semantics match 'high'; the f32 *seed* factor may use
                    # an internal jitter that refinement removes
    "fast": 1e-6,
}


def dtype_for(precision: str):
    try:
        return _PRECISION_DTYPES[precision]
    except KeyError:
        raise ValueError(
            f"precision must be one of {sorted(_PRECISION_DTYPES)}, got {precision!r}"
        ) from None


def jitter_for(precision: str) -> float:
    return _PRECISION_JITTER[precision]


def default_dtype():
    """float64 when x64 is on (the default), float32 otherwise."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
