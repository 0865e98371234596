"""Physical-plan hygiene helpers."""

from networkit_spark.plans.explain import (
    explain_str,
    has_pushed_filters,
    broadcast_join_count,
    wholestage_codegen_spans,
)

__all__ = [
    "explain_str",
    "has_pushed_filters",
    "broadcast_join_count",
    "wholestage_codegen_spans",
]
