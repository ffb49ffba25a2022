"""Physical-plan inspection utilities (plan-quality regression tests)."""

from aw3d30_parquet_spark.plans.inspect import (  # noqa: F401
    count_node,
    formatted_plan,
    has_node,
    pushed_filters,
    read_schemas,
)
