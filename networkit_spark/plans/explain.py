"""Plan inspection — the "is this the plan you'd want" checks.

The engine's performance claims rest on physical-plan properties, not
hope: filters reach the parquet scan (``PushedFilters``), column pruning
shrinks ``ReadSchema``, small dimension tables broadcast, and scalar
math stays inside whole-stage codegen.  These helpers make those
properties assertable in tests and inspectable in notebooks.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the scan node advertises non-empty PushedFilters."""
    s = explain_str(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", s)
    return bool(m and m.group(1).strip())


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the parquet scan actually reads (pruning check)."""
    s = explain_str(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", s)
    if not m:
        return []
    return [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]


def broadcast_join_count(df: DataFrame) -> int:
    return explain_str(df).count("BroadcastHashJoin")


def wholestage_codegen_spans(df: DataFrame) -> int:
    return len(re.findall(r"WholeStageCodegen \(\d+\)", explain_str(df)))
