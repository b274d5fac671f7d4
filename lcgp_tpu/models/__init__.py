from .lcgp import LCGP

__all__ = ["LCGP"]
