"""Micro-batched source + batched delivery (SURVEY §2 T-1/S-3).

The reference streams a query as cursor batches inside one transaction
(`/root/reference/src/Database/PostgreSQL/Stream.hs:244-284`).  Spark's
equivalents, in increasing unboundedness:

* bounded results → ``Engine.stream`` (``toLocalIterator``, engine.py);
* growing directories → file-source Structured Streaming, rate-limited by
  ``maxFilesPerTrigger`` (the batch-size knob, ≈ ``FETCH FORWARD n``);
* ``stream_query`` below wires a parquet directory into a streaming
  DataFrame with a caller-supplied transformation, and
  ``run_available_now`` drains it exactly once — the batch==stream
  equivalence harness (T-1 declared check).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["stream_query", "run_available_now"]


def stream_query(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Build a streaming DataFrame over a (growing) parquet directory.

    ``max_files_per_trigger`` bounds each micro-batch — the back-pressure
    knob corresponding to the reference's cursor batch size / bounded
    channel (`Stream.hs:261`, `Parallel.hs:23`).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    sdf = reader.parquet(source_dir)
    return transform(sdf) if transform is not None else sdf


def run_available_now(
    sdf: DataFrame,
    checkpoint_dir: str,
    sink_dir: str,
    output_mode: str = "append",
) -> None:
    """Drain all currently-available input through the stream and stop.

    ``Trigger.AvailableNow`` + checkpoint gives the reference's
    txn-scoped stream semantics: every input file processed exactly once,
    restart-safe (T-3).
    """
    q = (
        sdf.writeStream.format("parquet")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", sink_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
