"""In-flight metrics: ``DataFrame.observe`` + a streaming listener.

The reference surfaces execution feedback through its explain/metrics
path (A-21, covered by `plans/`); a pipeline that RUNS CONTINUOUSLY
needs the streaming half of that story — per-micro-batch row counts,
durations, and custom aggregates (null counts, value bounds, quality
gates) WITHOUT a second pass over the data.  Spark's built-in answer is
the observation API: metrics are computed inside the running plan as
accumulator-backed aggregates (zero extra scans, exactly the rows the
batch processed) and delivered through the progress event bus.

* `observe_batch` — batch-side: attach named aggregate expressions to a
  DataFrame; read them after any action.  The free audit rail for ETL
  jobs ("how many nulls did this write contain?") — one action, data
  plus audit.
* `observed` — wrap a STREAMING DataFrame with named metrics that every
  micro-batch reports through its progress event.
* `MetricsRecorder` — a ``StreamingQueryListener`` collecting per-batch
  progress rows (batch id, input rows, trigger duration, observed
  metrics) into a driver-side list: the evidence layer for streaming
  tests and back-pressure tuning (T-2's trigger limits are VISIBLE in
  the recorded per-batch row counts).

Scale shape: observations are accumulator merges inside existing tasks
(no shuffle, no extra job); the recorder keeps one small dict per
micro-batch on the driver — bounded by batch count, never by data.
Listener delivery is asynchronous (Spark's listener bus), so readers
use `wait_for_batches` rather than asserting immediately after
``awaitTermination``.
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql.streaming import StreamingQueryListener

__all__ = ["observe_batch", "observed", "MetricsRecorder"]


def observe_batch(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to a BATCH DataFrame: returns the
    (pass-through) DataFrame and an `Observation` whose ``.get`` yields
    the metric dict after the first action on the returned frame.
    Metrics must be aggregate expressions (the plan computes them on
    exactly the rows that flow through — no second scan)."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def observed(df: DataFrame, name: str, *metrics: Column) -> DataFrame:
    """Attach named aggregate metrics to a STREAMING DataFrame: every
    micro-batch evaluates them over its own rows and reports them in
    the progress event (``observedMetrics[name]``), where a
    `MetricsRecorder` picks them up."""
    return df.observe(name, *metrics)


class MetricsRecorder(StreamingQueryListener):
    """Collects per-micro-batch progress into ``.batches`` — one dict
    per batch: ``batch_id``, ``rows`` (numInputRows), ``duration_ms``
    (triggerExecution), and ``observed`` ({observation name → metric
    dict}).  Register with ``spark.streams.addListener(rec)``; remove
    with ``spark.streams.removeListener(rec)``.  Events for OTHER
    queries are filtered out when ``query_name`` is given."""

    def __init__(self, query_name: str | None = None) -> None:
        self.query_name = query_name
        self.batches: list[dict] = []
        self.terminated: list[str] = []

    # -- StreamingQueryListener contract --------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 — Spark API
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802 — Spark API
        p = event.progress
        if self.query_name and p.name != self.query_name:
            return
        self.batches.append(
            {
                "batch_id": p.batchId,
                "rows": p.numInputRows,
                "duration_ms": (p.durationMs or {}).get("triggerExecution"),
                "observed": {
                    k: dict(v.asDict())
                    for k, v in (p.observedMetrics or {}).items()
                },
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802 — Spark API
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802 — Spark API
        self.terminated.append(str(event.id))

    # -- reading side ----------------------------------------------------
    def wait_for_batches(
        self, n: int, timeout: float = 60.0, nonempty: bool = False
    ) -> list[dict]:
        """Block until ≥ n progress events arrived (listener delivery is
        asynchronous), optionally counting only batches with input rows;
        returns the batch list.  Raises TimeoutError past ``timeout``."""
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            got = [
                b for b in self.batches if not nonempty or b["rows"] > 0
            ]
            if len(got) >= n:
                return got
            time.sleep(0.2)
        raise TimeoutError(
            f"saw {len(self.batches)} progress events, wanted {n}"
        )

    def totals(self) -> dict:
        """Aggregate view across recorded batches: total rows, batch
        count, max trigger duration."""
        rows = sum(b["rows"] for b in self.batches)
        durs = [
            b["duration_ms"] for b in self.batches if b["duration_ms"]
        ]
        return {
            "batches": len(self.batches),
            "rows": int(rows),
            "max_duration_ms": max(durs) if durs else None,
        }
