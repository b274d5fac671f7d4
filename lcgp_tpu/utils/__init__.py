from .profiling import timed, trace, log_compiles

__all__ = ["timed", "trace", "log_compiles"]
