"""Global configuration for mgtpu.

The reference framework (JuliaInv/Multigrid.jl) is {Float32,Float64,ComplexF32,
ComplexF64}-generic (reference: src/Multigrid.jl:19-20, MGdef.jl:91-116).  We keep
the same four value types.  float64/complex128 require `jax_enable_x64`; on TPU
f64 is emulated and slow, so the production path is f32/bf16 with f64 reserved
for host-side (CPU) verification and for norm accumulation where needed.
"""
from __future__ import annotations

import jax
import numpy as np

_X64_ENABLED = False


def enable_x64() -> None:
    """Enable float64/complex128 support in JAX (call before tracing)."""
    global _X64_ENABLED
    if not _X64_ENABLED:
        jax.config.update("jax_enable_x64", True)
        _X64_ENABLED = True


def supported_dtypes():
    return (np.float32, np.float64, np.complex64, np.complex128)


def real_dtype(dtype) -> np.dtype:
    return np.zeros((), dtype=dtype).real.dtype


def is_complex(dtype) -> bool:
    return np.issubdtype(np.dtype(dtype), np.complexfloating)


def single_variant(dtype) -> np.dtype:
    """Single-precision companion of a dtype.

    Mirrors the reference's `toSingle` (Vanka.jl:34-42): Vanka block inverses are
    always stored in single precision.
    """
    d = np.dtype(dtype)
    if d == np.float64:
        return np.dtype(np.float32)
    if d == np.complex128:
        return np.dtype(np.complex64)
    return d
