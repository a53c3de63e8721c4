"""Krylov methods (the KrylovMethods.jl surface the reference drivers use)."""
from .cg import pcg
from .bicgstab import bicgstab
from .fgmres import fgmres, block_fgmres

__all__ = ["pcg", "bicgstab", "fgmres", "block_fgmres"]
