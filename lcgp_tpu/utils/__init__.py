from .profiling import timed, trace, log_compiles
from .diagnostics import health_check

__all__ = ["timed", "trace", "log_compiles", "health_check"]
