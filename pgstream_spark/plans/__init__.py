"""Plan inspection: explain text + structural assertions used to keep
operators on their intended physical strategy."""

from pgstream_spark.plans.metrics import executed_metrics, metric_totals
from pgstream_spark.plans.explain import (
    explain_string,
    pushed_filters,
    scan_columns,
    uses_broadcast_join,
    wholestage_codegen_ids,
)

__all__ = [
    "explain_string",
    "pushed_filters",
    "scan_columns",
    "uses_broadcast_join",
    "wholestage_codegen_ids",
]
