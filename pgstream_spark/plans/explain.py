"""Plan inspection helpers.

The optimizer work the reference delegated to Postgres (SURVEY §4) is
Catalyst's job here; these helpers make its decisions *checkable* so
tests can pin the physical properties that matter at 100 TB:

* filters reached the parquet scan (``pushed_filters``),
* the scan reads only needed columns (``scan_columns``),
* a dimension join broadcast instead of shuffling (``uses_broadcast_join``),
* hot expressions stayed inside whole-stage codegen
  (``wholestage_codegen_ids``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "explain_string",
    "pushed_filters",
    "scan_columns",
    "uses_broadcast_join",
    "wholestage_codegen_ids",
]


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The text ``df.explain(mode)`` would print, as a string."""
    jvm = df.sparkSession._jvm  # type: ignore[attr-defined]
    jmode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)  # type: ignore[attr-defined]


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet scan accepted for pushdown."""
    text = explain_string(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        inner = m.group(1).strip()
        if inner:
            out.extend(p.strip() for p in inner.split(","))
    return out


def scan_columns(df: DataFrame) -> list[str]:
    """Columns actually read by the (first) file scan — column-pruning check."""
    text = explain_string(df, "formatted")
    m = re.search(r"ReadSchema: struct<([^>]*)>", text)
    if not m:
        return []
    return [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_string(df, "simple")


def wholestage_codegen_ids(df: DataFrame) -> list[int]:
    """Distinct WholeStageCodegen span ids — wider spans = more of the
    plan fused into generated code.

    Under AQE the pre-execution plan hides codegen annotations, so this
    executes the frame once (cheap on test data; don't call on a 100 TB
    frame) and reads the finalized adaptive plan.
    """
    text = explain_string(df, "simple")
    if "AdaptiveSparkPlan isFinalPlan=false" in text:
        df.collect()
        text = explain_string(df, "simple")
    # codegen'd operators carry a `*(n)` marker in simple mode
    return sorted({int(x) for x in re.findall(r"\*\((\d+)\)", text)})
