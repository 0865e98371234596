"""Physical-plan hygiene helpers."""

from networkit_spark.plans.explain import (
    explain_str,
    has_pushed_filters,
    broadcast_join_count,
    wholestage_codegen_spans,
)
from networkit_spark.plans.rank import global_row_number

__all__ = [
    "explain_str",
    "has_pushed_filters",
    "broadcast_join_count",
    "wholestage_codegen_spans",
    "global_row_number",
]
