from .engine import Study, Trial, create_study

__all__ = ["Study", "Trial", "create_study"]
