"""Krylov methods (the KrylovMethods.jl surface the reference drivers use)."""
from .cg import pcg
from .bicgstab import bicgstab
from .fgmres import fgmres, block_fgmres
from .block import block_pcg, block_bicgstab

__all__ = ["pcg", "bicgstab", "fgmres", "block_fgmres",
           "block_pcg", "block_bicgstab"]
