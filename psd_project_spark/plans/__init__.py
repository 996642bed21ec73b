from psd_project_spark.plans.inspect import (
    codegen_stage_count,
    executed_plan,
    formatted_plan,
    has_broadcast_hash_join,
    partition_filters,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "codegen_stage_count",
    "executed_plan",
    "formatted_plan",
    "has_broadcast_hash_join",
    "partition_filters",
    "pushed_filters",
    "read_schema_columns",
]
