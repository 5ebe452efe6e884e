"""Physical-plan inspection — scale-readiness checks on Catalyst output."""

from cinegraph_spark.plans.inspect import (  # noqa: F401
    formatted_plan,
    plan_counts,
    pushed_filters,
    read_schemas,
)
