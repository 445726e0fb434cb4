from . import jobs, stateful

__all__ = ["jobs", "stateful"]
