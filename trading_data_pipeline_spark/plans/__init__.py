"""Physical-plan shaping helpers.

The logical plans in operators/ are declarative; Catalyst owns most
physical decisions (pushdown, join strategy, AQE re-planning). The helpers
here cover the few physical properties Catalyst does NOT manage:
scan-parallelism floors for CPU-bound operators, and explicit broadcast /
partitioning hints that encode operator knowledge the optimizer lacks.
"""

from .parallelism import ensure_parallelism

__all__ = ["ensure_parallelism"]
