"""Structured Streaming layer — the reference's core competency mapped to
Spark (SURVEY §2 T-1..T-8)."""

from pgstream_spark.streaming.delivery import stream_query
from pgstream_spark.streaming.windows import (
    session_windowed_agg,
    tumbling_windowed_agg,
    stateful_dedup,
)
from pgstream_spark.streaming.exactly_once import idempotent_parquet_sink
from pgstream_spark.streaming.neardup import streaming_minhash_candidates
from pgstream_spark.streaming.pg_sink import postgres_exactly_once_sink
from pgstream_spark.streaming.drift import drift_monitor_sink, read_drift_log
from pgstream_spark.streaming.stateful import (
    gap_change_detector,
    running_totals,
    streaming_top_k,
)

__all__ = [
    "stream_query",
    "tumbling_windowed_agg",
    "session_windowed_agg",
    "stateful_dedup",
    "idempotent_parquet_sink",
    "running_totals",
    "gap_change_detector",
    "streaming_minhash_candidates",
    "postgres_exactly_once_sink",
    "streaming_top_k",
    "drift_monitor_sink",
    "read_drift_log",
]
