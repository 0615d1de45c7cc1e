"""Engine function library: cross-engine exact aggregation helpers."""

from .exact import dec, exact_avg, exact_sum  # noqa: F401
