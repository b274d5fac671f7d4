from .matern import Matern32, matern32_gram, matern32_diag
from .gram import gram_stack
from . import linalg

__all__ = ["Matern32", "matern32_gram", "matern32_diag", "gram_stack", "linalg"]
