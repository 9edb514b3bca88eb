from .profiling import StepTimer, trace

__all__ = ["StepTimer", "trace"]
