from . import cases, reference_dp, traceback

__all__ = ["cases", "reference_dp", "traceback"]
