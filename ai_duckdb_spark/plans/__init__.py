"""Physical-plan introspection utilities."""

from .inspect import executed_plan, plan_counts, read_schema_columns  # noqa: F401
