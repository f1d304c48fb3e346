"""Physical-plan introspection helpers (see PLANS.md for the posture
narrative these helpers verify; tests/test_plans.py for the pinned
assertions)."""

from data_pipeline_cursor_spark.plans.introspect import (
    codegen_span_count,
    exchange_count,
    executed_plan,
    has_broadcast_join,
    has_sort_merge_join,
    hash_exchange_count,
    plan_posture,
    pushed_filters,
    read_schema,
)

__all__ = [
    "codegen_span_count",
    "exchange_count",
    "executed_plan",
    "has_broadcast_join",
    "has_sort_merge_join",
    "hash_exchange_count",
    "plan_posture",
    "pushed_filters",
    "read_schema",
]
