"""Global configuration for mgtpu.

The reference framework (JuliaInv/Multigrid.jl) is {Float32,Float64,ComplexF32,
ComplexF64}-generic (reference: src/Multigrid.jl:19-20, MGdef.jl:91-116).  We keep
the same four value types.  float64/complex128 require `jax_enable_x64`; on TPU
f64 is emulated and slow, so the production path is f32/bf16 with f64 reserved
for host-side (CPU) verification and for norm accumulation where needed.
"""
from __future__ import annotations

import os

import jax
import numpy as np

_X64_ENABLED = False


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (opt-out: MGTPU_COMPILE_CACHE=off).

    Cold-setup cost is dominated by one-time XLA compiles (measured: 22 s to
    compile the blocked device LU for a 4913-dof coarsest level on a v5e,
    1.6 ms per factorization after).  The persistent cache makes those
    one-per-machine instead of one-per-process — the steady-state jInv
    workflow (fresh process per inversion run) depends on it.
    """
    mode = os.environ.get("MGTPU_COMPILE_CACHE", "")
    if mode.lower() in ("off", "0", "none"):
        return
    path = mode if mode and os.path.isabs(mode) else os.path.join(
        os.path.expanduser("~"), ".cache", "mgtpu", "xla_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took noticeable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass                       # cache is an optimization, never fatal


_enable_compile_cache()


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
