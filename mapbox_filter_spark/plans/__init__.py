from .pipeline import run_filter_job

__all__ = ["run_filter_job"]
