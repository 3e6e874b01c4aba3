"""Executed-plan metrics — measure, don't guess.

`plans/explain.py` answers "what plan WILL run"; this module answers
"what did the plan actually DO": per-operator SQL metrics (shuffle
bytes/records, scan rows, peak memory, spill) pulled from the executed
physical plan after an action.  This is the evidence layer behind the
scale claims — e.g. a map-side-combined aggregation must show
``shuffleRecordsWritten ≈ groups × maptasks``, orders of magnitude
below the scan's ``numOutputRows`` — asserted in tests instead of
eyeballed in a UI.

Works through py4j on the JVM plan tree, descending AQE wrappers
(``AdaptiveSparkPlan`` → ``executedPlan``, ``*QueryStage`` → ``plan``),
so metrics reflect the adaptively re-planned reality, not the initial
static plan.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

__all__ = ["executed_metrics", "metric_totals"]


def _node_metrics(p: Any) -> dict[str, int]:
    out: dict[str, int] = {}
    it = p.metrics().iterator()
    while it.hasNext():
        e = it.next()
        out[e._1()] = e._2().value()
    return out


def _walk(p: Any, depth: int, out: list[tuple[str, int, dict[str, int]]]) -> None:
    name = p.nodeName()
    out.append((name, depth, _node_metrics(p)))
    if name.startswith("AdaptiveSparkPlan"):
        _walk(p.executedPlan(), depth + 1, out)
        return
    if name.endswith("QueryStage"):
        _walk(p.plan(), depth + 1, out)
        return
    ch = p.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), depth + 1, out)


def executed_metrics(
    df: DataFrame, run: bool = True
) -> list[tuple[str, int, dict[str, int]]]:
    """Run ``df`` (``collect``, discarded) and return the executed plan
    as ``[(node_name, depth, {metric: value}), …]`` in pre-order.  Pass
    ``run=False`` when an action already executed THIS DataFrame's plan.
    """
    if run:
        df.collect()
    out: list[tuple[str, int, dict[str, int]]] = []
    _walk(df._jdf.queryExecution().executedPlan(), 0, out)
    return out


def metric_totals(df: DataFrame, run: bool = True) -> dict[str, int]:
    """Aggregate headline totals over the executed plan:

    * ``scan_rows`` — rows produced by scan/range leaves,
    * ``shuffle_records`` / ``shuffle_bytes`` — total exchange writes,
    * ``peak_memory`` — max operator peak,
    * ``spill_bytes`` — total disk spill (0 = everything fit).
    """
    nodes = executed_metrics(df, run=run)
    totals = {
        "scan_rows": 0,
        "shuffle_records": 0,
        "shuffle_bytes": 0,
        "peak_memory": 0,
        "spill_bytes": 0,
    }
    for name, _, m in nodes:
        if name in ("Scan parquet", "Range", "BatchScan", "FileScan") or name.startswith(
            "Scan "
        ):
            totals["scan_rows"] += m.get("numOutputRows", 0)
        if name == "Exchange":
            totals["shuffle_records"] += m.get("shuffleRecordsWritten", 0)
            totals["shuffle_bytes"] += m.get("shuffleBytesWritten", 0)
        totals["peak_memory"] = max(totals["peak_memory"], m.get("peakMemory", 0))
        totals["spill_bytes"] += m.get("spillSize", 0) + m.get(
            "diskBytesSpilled", 0
        )
    return totals
