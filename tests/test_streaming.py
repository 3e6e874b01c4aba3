"""Structured Streaming semantics (SURVEY §2 T-*): batch==stream
equivalence, exactly-once restart, windows, watermark late-drop."""

from __future__ import annotations

import datetime
import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from pgstream_spark.sources.parquet import load_events
from pgstream_spark.streaming.delivery import run_available_now, stream_query
from pgstream_spark.streaming.exactly_once import idempotent_parquet_sink
from pgstream_spark.streaming.windows import (
    session_windowed_agg,
    stateful_dedup,
    tumbling_windowed_agg,
)


@pytest.fixture(scope="module")
def events_chunks_dir(spark, sf_dir, tmp_path_factory):
    """events split into 4 chronological parquet chunks (FIXTURES B.3)."""
    base = tmp_path_factory.mktemp("events_replay")
    ev = load_events(spark, sf_dir).orderBy("ts")
    rows = ev.collect()
    n = len(rows)
    chunk = (n + 3) // 4
    for i in range(4):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, ev.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(base / f"chunk={i}"))
    # flatten: file source wants a flat dir of parquet files
    flat = tmp_path_factory.mktemp("events_flat")
    idx = 0
    for f in sorted(glob.glob(str(base / "chunk=*" / "*.parquet"))):
        shutil.copy(f, flat / f"part-{idx:04d}.parquet")
        idx += 1
    return str(flat), ev.schema


class TestBatchStreamEquivalence:
    # T-1: union of micro-batch outputs == one-shot batch query

    def test_file_stream_counts_match_batch(self, spark, events_chunks_dir, tmp_path):
        src, schema = events_chunks_dir
        agg = lambda df: df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        )

        sdf = stream_query(
            spark, src, schema, transform=None, max_files_per_trigger=1
        )
        sink = str(tmp_path / "sink")
        ckpt = str(tmp_path / "ckpt")
        q = (
            sdf.writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        streamed = spark.read.parquet(sink)
        batch = spark.read.parquet(src)
        assert streamed.count() == batch.count()
        a = {(r.event_type, r.n) for r in agg(streamed).collect()}
        b = {(r.event_type, r.n) for r in agg(batch).collect()}
        assert a == b

    def test_restart_no_dupes_no_loss(self, spark, events_chunks_dir, tmp_path):
        # T-3: run the stream twice over the same checkpoint — the second
        # run must add nothing (exactly-once over restart).
        src, schema = events_chunks_dir
        sink = str(tmp_path / "sink2")
        ckpt = str(tmp_path / "ckpt2")

        def run_once():
            sdf = stream_query(spark, src, schema, max_files_per_trigger=2)
            q = (
                sdf.writeStream.foreachBatch(idempotent_parquet_sink(sink))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        n1 = spark.read.parquet(sink).count()
        run_once()  # "restart": same checkpoint, no new input
        n2 = spark.read.parquet(sink).count()
        total = spark.read.parquet(src).count()
        assert n1 == total
        assert n2 == total  # no duplicates after restart


class TestMapOnlyOpsStreamCompatible:
    # The stateless text-pipeline ops (PII scrub, mixture sampling) are
    # pure column expressions, so the SAME function must apply to a
    # readStream DataFrame unchanged and produce the batch answer —
    # that's the contract that lets a 100 TB backfill and its streaming
    # ingest path share one implementation.

    def test_pii_and_mixture_on_stream(self, spark, tmp_path):
        from pgstream_spark.operators.mixture import mixture_sample
        from pgstream_spark.operators.textstats import pii_scrub
        from tests.conftest import write_flat_parquet

        rows = [
            (i, f"user{i}@ex{i}.org says hi " + ("x " * (i % 5)), "a" if i % 2 else "b")
            for i in range(200)
        ]
        schema = "doc_id long, text string, source string"
        src = str(tmp_path / "src")
        write_flat_parquet(spark, rows, schema, src + "/a.parquet")

        pipeline = lambda df: mixture_sample(
            pii_scrub(df), {"a": 5_000, "b": 10_000}
        ).select("doc_id", "n_emails", "text_clean")

        sdf = spark.readStream.schema(schema).parquet(src)
        sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
        q = (
            pipeline(sdf)
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = {
            (r.doc_id, r.n_emails, r.text_clean)
            for r in spark.read.parquet(sink).collect()
        }
        want = {
            (r.doc_id, r.n_emails, r.text_clean)
            for r in pipeline(spark.read.parquet(src)).collect()
        }
        assert got == want and len(want) > 50
        assert all(n == 1 for _, n, _ in want)


class TestWindows:
    def test_tumbling_batch_matches_manual_trunc(self, spark, sf_dir):
        ev = load_events(spark, sf_dir)
        out = tumbling_windowed_agg(
            ev, "ts", "1 hour", [F.count(F.lit(1)).alias("n")]
        )
        manual = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
            F.count(F.lit(1)).alias("n")
        )
        a = {(r.window_start, r.n) for r in out.collect()}
        b = {(r.h, r.n) for r in manual.collect()}
        assert a == b

    def test_sliding_window_covers_each_row_twice(self, spark, sf_dir):
        ev = load_events(spark, sf_dir)
        out = tumbling_windowed_agg(
            ev, "ts", "2 hours", [F.count(F.lit(1)).alias("n")], slide="1 hour"
        )
        total = sum(r.n for r in out.collect())
        assert total == 2 * ev.count()  # every event in exactly 2 sliding windows

    def test_session_window_end_is_last_plus_gap(self, spark):
        import datetime

        rows = [
            (1, datetime.datetime(2024, 1, 1, 10, 0, 0)),
            (1, datetime.datetime(2024, 1, 1, 10, 10, 0)),   # same session
            (1, datetime.datetime(2024, 1, 1, 11, 30, 0)),   # new session
        ]
        df = spark.createDataFrame(rows, "user_id int, ts timestamp")
        out = session_windowed_agg(
            df, "ts", "30 minutes", [F.count(F.lit(1)).alias("n")], ["user_id"]
        ).orderBy("session_start").collect()
        assert len(out) == 2
        assert out[0].n == 2
        assert out[0].session_end == datetime.datetime(2024, 1, 1, 10, 40, 0)
        assert out[1].n == 1

    def test_watermark_finalizes_windows_exactly_once(self, spark, tmp_path):
        # T-6: append-mode watermark semantics.  Spark's hard guarantee is
        # eviction + finalization: once the watermark passes a window's
        # end, that window is emitted exactly once, and data arriving
        # later can never ALTER the emitted result (input-side drop of
        # late rows is best-effort and, observed on this Spark version,
        # does not happen — a late row surfaces as a separate, fresh
        # state entry).
        import datetime

        from tests.conftest import write_flat_parquet

        schema = "user_id int, ts timestamp"
        src = str(tmp_path / "wm_src")
        on_time = [
            (1, datetime.datetime(2024, 1, 1, 10, 0, 0)),
            (1, datetime.datetime(2024, 1, 1, 12, 0, 0)),  # advances watermark to 11:50
        ]
        late = [(1, datetime.datetime(2024, 1, 1, 9, 0, 0))]  # < watermark → dropped
        write_flat_parquet(spark, on_time, schema, src + "/a.parquet")
        write_flat_parquet(spark, late, schema, src + "/b.parquet")
        # the file source orders by modification time — make the late file
        # unambiguously arrive AFTER the watermark-advancing file
        import time as _time

        now = _time.time()
        os.utime(src + "/a.parquet", (now - 60, now - 60))
        os.utime(src + "/b.parquet", (now, now))

        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        sink = str(tmp_path / "wm_sink")
        ckpt = str(tmp_path / "wm_ckpt")
        q = (
            sdf.writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        files = glob.glob(sink + "/*.parquet")
        emitted = (
            spark.read.parquet(sink).collect() if files else []
        )
        on_time = [
            r for r in emitted
            if r.window.start == datetime.datetime(2024, 1, 1, 10, 0, 0)
        ]
        # the on-time window finalized exactly once, with only on-time data
        assert [(r.window.start, r.n) for r in on_time] == [
            (datetime.datetime(2024, 1, 1, 10, 0, 0), 1)
        ]
        # the late 09:00 row did not retroactively join any on-time window
        assert all(r.n == 1 for r in emitted)

    def test_dropduplicates_within_watermark_stream(self, spark, tmp_path):
        # T-7 (streaming): a duplicate event id arriving within the
        # watermark horizon of its first occurrence is dropped — this IS
        # a hard guarantee, unlike input-side late-row drop.
        import datetime

        from tests.conftest import write_flat_parquet

        schema = "event_id long, ts timestamp"
        src = str(tmp_path / "dd_src")
        b1 = [
            (1, datetime.datetime(2024, 1, 1, 10, 0, 0)),
            (2, datetime.datetime(2024, 1, 1, 12, 0, 0)),
        ]
        b2 = [(2, datetime.datetime(2024, 1, 1, 12, 1, 0))]  # dup of live key
        write_flat_parquet(spark, b1, schema, src + "/a.parquet")
        write_flat_parquet(spark, b2, schema, src + "/b.parquet")
        import time as _time

        now = _time.time()
        os.utime(src + "/a.parquet", (now - 60, now - 60))
        os.utime(src + "/b.parquet", (now, now))

        from pgstream_spark.streaming.windows import stateful_dedup

        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = stateful_dedup(sdf, ["event_id"], ts_col="ts", watermark="10 minutes")
        sink = str(tmp_path / "dd_sink")
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
            .option("path", sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(sink).collect()
        ids = sorted(r.event_id for r in rows)
        assert ids == [1, 2]  # the duplicate id=2 collapsed

    def test_stateful_dedup_batch(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c")], "k int, v string"
        )
        assert stateful_dedup(df, ["k"]).count() == 2


class TestStreamStreamJoin:
    # T-* extension: stream-stream time-bounded equi-join — batch output
    # is the oracle for the streaming run (same function, both modes).

    @pytest.fixture(scope="class")
    def impressions_clicks(self, spark, tmp_path_factory):
        from tests.conftest import write_flat_parquet

        base = 1_700_000_000
        imp_rows = [
            (u, i, _ts(base + u * 1000 + i * 60))
            for u in range(1, 6)
            for i in range(4)
        ]
        # clicks: one in-window (90 s later), one out-of-window (20 min)
        clk_rows = []
        for u in range(1, 6):
            clk_rows.append((u, 900 + u, _ts(base + u * 1000 + 90)))
            clk_rows.append((u, 990 + u, _ts(base + u * 1000 + 1200)))
        imp_dir = str(tmp_path_factory.mktemp("imp"))
        clk_dir = str(tmp_path_factory.mktemp("clk"))
        imp_schema = "user_id long, imp_id long, imp_ts timestamp"
        clk_schema = "user_id long, click_id long, click_ts timestamp"
        # two files per side so the join spans micro-batches
        half = len(imp_rows) // 2
        write_flat_parquet(spark, imp_rows[:half], imp_schema, imp_dir + "/a.parquet")
        write_flat_parquet(spark, imp_rows[half:], imp_schema, imp_dir + "/b.parquet")
        write_flat_parquet(spark, clk_rows[: len(clk_rows) // 2], clk_schema, clk_dir + "/a.parquet")
        write_flat_parquet(spark, clk_rows[len(clk_rows) // 2 :], clk_schema, clk_dir + "/b.parquet")
        return imp_dir, imp_schema, clk_dir, clk_schema

    def test_batch_mode_matches_manual_join(self, spark, impressions_clicks):
        from pgstream_spark.streaming.joins import stream_stream_time_join

        imp_dir, imp_schema, clk_dir, clk_schema = impressions_clicks
        imp = spark.read.schema(imp_schema).parquet(imp_dir)
        clk = spark.read.schema(clk_schema).parquet(clk_dir)
        out = stream_stream_time_join(
            imp, clk, "user_id", "imp_ts", "click_ts", tolerance="5 minutes"
        )
        got = {(r.user_id, r.imp_id, r.click_id) for r in out.collect()}
        manual = {
            (iu, ii, ci)
            for (iu, ii, its) in [(r.user_id, r.imp_id, r.imp_ts) for r in imp.collect()]
            for (cu, ci, cts) in [(r.user_id, r.click_id, r.click_ts) for r in clk.collect()]
            if iu == cu and its <= cts <= its + __import__("datetime").timedelta(minutes=5)
        }
        assert got == manual
        assert got  # non-vacuous: in-window clicks matched
        assert all(ci < 990 for _, _, ci in got)  # 20-min clicks excluded

    def test_stream_matches_batch(self, spark, impressions_clicks, tmp_path):
        from pgstream_spark.streaming.joins import stream_stream_time_join

        imp_dir, imp_schema, clk_dir, clk_schema = impressions_clicks
        imp_s = (
            spark.readStream.schema(imp_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(imp_dir)
        )
        clk_s = (
            spark.readStream.schema(clk_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(clk_dir)
        )
        joined = stream_stream_time_join(
            imp_s, clk_s, "user_id", "imp_ts", "click_ts", tolerance="5 minutes"
        )
        sink = str(tmp_path / "ssj_sink")
        q = (
            joined.writeStream.format("parquet")
            .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
            .option("path", sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        streamed = {
            (r.user_id, r.imp_id, r.click_id)
            for r in spark.read.parquet(sink).collect()
        }
        imp = spark.read.schema(imp_schema).parquet(imp_dir)
        clk = spark.read.schema(clk_schema).parquet(clk_dir)
        batch = {
            (r.user_id, r.imp_id, r.click_id)
            for r in stream_stream_time_join(
                imp, clk, "user_id", "imp_ts", "click_ts", tolerance="5 minutes"
            ).collect()
        }
        assert streamed == batch and streamed

    def test_left_outer_emits_unmatched_after_watermark(self, spark, tmp_path):
        """leftOuter stream-stream join: an impression with no click in
        its tolerance window must surface with NULL click columns once
        BOTH watermarks pass its eligibility bound."""
        import datetime

        from tests.conftest import write_flat_parquet
        from pgstream_spark.streaming.joins import stream_stream_time_join

        def ts(sec):
            return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec)

        imp_dir = str(tmp_path / "lo_imp")
        clk_dir = str(tmp_path / "lo_clk")
        i_schema = "user_id long, imp_id long, imp_ts timestamp"
        c_schema = "user_id long, click_id long, click_ts timestamp"
        write_flat_parquet(
            spark,
            [(1, 10, ts(0)), (2, 20, ts(10))],
            i_schema,
            imp_dir + "/b1.parquet",
        )
        write_flat_parquet(spark, [(1, 100, ts(30))], c_schema, clk_dir + "/b1.parquet")
        # watermark pushers: far-future rows on BOTH sides so the join
        # watermark passes imp 20's window and the NULL row can emit
        write_flat_parquet(
            spark, [(9, 90, ts(100000))], i_schema, imp_dir + "/b2.parquet"
        )
        write_flat_parquet(
            spark, [(9, 900, ts(100000))], c_schema, clk_dir + "/b2.parquet"
        )

        imp_s = (
            spark.readStream.schema(i_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(imp_dir)
        )
        clk_s = (
            spark.readStream.schema(c_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(clk_dir)
        )
        joined = stream_stream_time_join(
            imp_s, clk_s, "user_id", "imp_ts", "click_ts",
            tolerance="5 minutes", watermark="1 minute", how="leftOuter",
        )
        sink = str(tmp_path / "lo_sink")
        q = (
            joined.writeStream.format("parquet")
            .option("checkpointLocation", str(tmp_path / "lo_ckpt"))
            .option("path", sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {(r.imp_id, r.click_id) for r in spark.read.parquet(sink).collect()}
        assert (10, 100) in got          # matched pair
        assert (20, None) in got         # unmatched impression emitted NULL
        assert (10, None) not in got     # matched imp must NOT also emit NULL


def _ts(epoch):
    import datetime

    return datetime.datetime.utcfromtimestamp(epoch)


class TestCdcApply:
    def test_upsert_delete_insert_and_untouched(self, spark):
        from pgstream_spark.streaming.cdc import apply_changes

        base = spark.createDataFrame(
            [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)],
            "id long, name string, bal double",
        )
        changes = spark.createDataFrame(
            [
                (1, 100, "upsert", "alice2", 11.0),   # overwritten later
                (1, 101, "upsert", "alice3", 12.0),   # wins (higher seq)
                (2, 102, "delete", None, None),       # row removed
                (4, 103, "upsert", "dave", 40.0),     # insert of unseen key
                (5, 104, "delete", None, None),       # delete of unseen key: no row
            ],
            "id long, seq long, op string, name string, bal double",
        )
        out = {r.id: (r.name, r.bal) for r in
               apply_changes(base, changes, ["id"], "seq").collect()}
        assert out == {
            1: ("alice3", 12.0),
            3: ("carol", 30.0),      # untouched base row
            4: ("dave", 40.0),
        }

    def test_delete_then_reinsert_survives(self, spark):
        from pgstream_spark.streaming.cdc import apply_changes

        base = spark.createDataFrame([(1, "x")], "id long, name string")
        changes = spark.createDataFrame(
            [(1, 1, "delete", None), (1, 2, "upsert", "back")],
            "id long, seq long, op string, name string",
        )
        out = apply_changes(base, changes, ["id"], "seq").collect()
        assert [(r.id, r.name) for r in out] == [(1, "back")]

    def test_missing_columns_rejected(self, spark):
        from pgstream_spark.streaming.cdc import apply_changes
        import pytest as _pytest

        base = spark.createDataFrame([(1, "x")], "id long, name string")
        bad = spark.createDataFrame([(1, "x")], "id long, name string")  # no seq/op
        with _pytest.raises(ValueError):
            apply_changes(base, bad, ["id"], "seq")

    def test_incremental_fold_equals_one_shot(self, spark):
        # CDC streams deliver per-key monotonically increasing LSNs, so
        # folding apply_changes per micro-batch must equal applying the
        # whole changelog at once — the invariant the foreachBatch
        # deployment relies on.
        from pgstream_spark.streaming.cdc import apply_changes

        base = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "id long, name string, bal double"
        )
        batch1 = spark.createDataFrame(
            [(1, 10, "delete", None, None), (3, 11, "upsert", "c", 3.0)],
            "id long, seq long, op string, name string, bal double",
        )
        batch2 = spark.createDataFrame(
            [(1, 20, "upsert", "a2", 1.5), (3, 21, "delete", None, None)],
            "id long, seq long, op string, name string, bal double",
        )
        folded = apply_changes(
            apply_changes(base, batch1, ["id"], "seq"), batch2, ["id"], "seq"
        )
        one_shot = apply_changes(base, batch1.union(batch2), ["id"], "seq")
        f = sorted((r.id, r.name, r.bal) for r in folded.collect())
        o = sorted((r.id, r.name, r.bal) for r in one_shot.collect())
        assert f == o == [(1, "a2", 1.5), (2, "b", 2.0)]


class TestOhlcWindowed:
    """streaming/windows.ohlc_windowed — min_by/max_by bars, batch==stream."""

    def test_batch_matches_rank_operator(self, spark, sf_dir):
        import datetime

        from pgstream_spark.operators.ohlc import ohlc_bars
        from pgstream_spark.streaming.windows import ohlc_windowed

        ev = load_events(spark, sf_dir)
        epoch = lambda dt: int((dt - datetime.datetime(1970, 1, 1)).total_seconds())
        stream_style = {
            (r.event_type, epoch(r.window_start)): (
                r.open, r.high, r.low, r.close, r.n_events, r.avg_value,
            )
            for r in ohlc_windowed(
                ev, "ts", "value", "1 hour", ["event_type"], tie_col="event_id"
            ).collect()
        }
        rank_style = {
            (r.event_type, r.bar_epoch_s): (
                r.open, r.high, r.low, r.close, r.n_events, r.avg_value,
            )
            for r in ohlc_bars(
                ev, "ts", "value", ["event_type"], 3600, tie_col="event_id"
            ).collect()
        }
        assert stream_style == rank_style

    def test_stream_matches_batch(self, spark, events_chunks_dir, tmp_path):
        from pgstream_spark.streaming.windows import ohlc_windowed

        src, schema = events_chunks_dir
        # watermarks need an instant TIMESTAMP (UTC session → deterministic)
        bars = lambda df: ohlc_windowed(
            df.withColumn("ts", F.col("ts").cast("timestamp")),
            "ts", "value", "1 hour", ["event_type"],
            tie_col="event_id", watermark="2 hours",
        )
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        sink = str(tmp_path / "ohlc_sink")
        ckpt = str(tmp_path / "ohlc_ckpt")
        q = (
            bars(sdf)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        batch = {
            (r.event_type, r.window_start): (
                r.open, r.high, r.low, r.close, r.n_events, r.avg_value,
            )
            for r in bars(spark.read.parquet(src)).collect()
        }
        streamed_rows = spark.read.parquet(sink).collect()
        assert streamed_rows  # watermark passed most windows → bars emitted
        for r in streamed_rows:
            # every finalized streamed bar equals the batch bar exactly
            assert batch[(r.event_type, r.window_start)] == (
                r.open, r.high, r.low, r.close, r.n_events, r.avg_value,
            )
        # coverage: all windows that end >= 2h (the watermark) before the
        # final event time must have been finalized and emitted
        import datetime

        max_end = max(r.window_end for r in streamed_rows)
        emitted = {(r.event_type, r.window_start) for r in streamed_rows}
        horizon = max_end - datetime.timedelta(hours=2)
        expected = {k for k in batch if k[1] < horizon}
        assert expected <= emitted


class TestMaterializedReplicaSink:
    """streaming/cdc.materialized_replica_sink — streaming CDC upsert
    into a parquet replica, idempotent under micro-batch redo."""

    _SCHEMA = "k long, seq long, op string, val string"

    def _changes(self):
        b1 = [(1, 1, "upsert", "a1"), (2, 2, "upsert", "b1"), (3, 3, "upsert", "c1")]
        b2 = [(1, 4, "upsert", "a2"), (2, 5, "delete", None), (4, 6, "upsert", "d1")]
        return b1, b2

    def test_stream_fold_matches_batch_apply(self, spark, tmp_path):
        from pgstream_spark.streaming.cdc import (
            apply_changes,
            materialized_replica_sink,
        )
        from tests.conftest import write_flat_parquet

        b1, b2 = self._changes()
        src = str(tmp_path / "chg")
        write_flat_parquet(spark, b1, self._SCHEMA, src + "/b1.parquet")
        write_flat_parquet(spark, b2, self._SCHEMA, src + "/b2.parquet")

        replica = str(tmp_path / "replica")
        sink = materialized_replica_sink(spark, replica, ["k"], "seq")
        q = (
            spark.readStream.schema(self._SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        from pgstream_spark.streaming.cdc import read_replica

        got = {(r.k, r.val) for r in read_replica(spark, replica).collect()}
        base = spark.createDataFrame([], "k long, val string")
        want = {
            (r.k, r.val)
            for r in apply_changes(
                base, spark.createDataFrame(b1 + b2, self._SCHEMA), ["k"], "seq"
            ).collect()
        }
        assert got == want == {(1, "a2"), (3, "c1"), (4, "d1")}

    def test_redo_and_stale_batches_are_noops(self, spark, tmp_path):
        from pgstream_spark.streaming.cdc import materialized_replica_sink

        b1, b2 = self._changes()
        replica = str(tmp_path / "replica2")
        sink = materialized_replica_sink(spark, replica, ["k"], "seq")
        df1 = spark.createDataFrame(b1, self._SCHEMA)
        df2 = spark.createDataFrame(b2, self._SCHEMA)
        sink(df1, 0)
        sink(df2, 1)
        from pgstream_spark.streaming.cdc import read_replica

        snap = lambda: sorted(
            (r.k, r.val) for r in read_replica(spark, replica).collect()
        )
        applied = snap()
        sink(df2, 1)   # redo of the last committed batch (restart contract)
        assert snap() == applied
        sink(df1, 2)   # fully stale replay: every seq is older
        assert snap() == applied

    def test_interrupted_swap_recovers(self, spark, tmp_path):
        """Crash windows in the tmp/bak/current rename dance must never
        lose the replica: each stranded state is repaired on the next
        batch (and on read), not silently reinitialized to empty."""
        import os
        import shutil

        from pgstream_spark.streaming.cdc import (
            materialized_replica_sink,
            read_replica,
        )

        b1, b2 = self._changes()
        replica = str(tmp_path / "replica3")
        sink = materialized_replica_sink(spark, replica, ["k"], "seq")
        sink(spark.createDataFrame(b1, self._SCHEMA), 0)
        snap = lambda: sorted(
            (r.k, r.val) for r in read_replica(spark, replica).collect()
        )
        after_b1 = snap()
        cur = os.path.join(replica, "current")

        # Window 1: died between rename(cur, bak) and rename(tmp, cur) —
        # tmp is complete, current is missing.  Simulate by moving the
        # committed state into both stranded names.
        shutil.copytree(cur, os.path.join(replica, "__tmp__"))
        os.rename(cur, os.path.join(replica, "__bak__"))
        assert snap() == after_b1  # read-side recovery promotes tmp
        assert not os.path.exists(os.path.join(replica, "__bak__"))

        # Window 2: died between rename(tmp, cur) and rmtree(bak).
        shutil.copytree(cur, os.path.join(replica, "__bak__"))
        sink(spark.createDataFrame(b2, self._SCHEMA), 1)  # batch-side recovery
        assert not os.path.exists(os.path.join(replica, "__bak__"))
        assert snap() == [(1, "a2"), (3, "c1"), (4, "d1")]

        # Window 3: only bak survives (defensive) — restored, not empty.
        os.rename(cur, os.path.join(replica, "__bak__"))
        assert snap() == [(1, "a2"), (3, "c1"), (4, "d1")]


class TestStreamStaticJoin:
    """Stream enriched by a static dimension table — the broadcast
    enrichment pattern every streaming ingest uses.  The static side is
    planned per micro-batch; results must equal the batch join."""

    def test_stream_static_enrichment_matches_batch(self, spark, tmp_path):
        from tests.conftest import write_flat_parquet

        dim_rows = [(i, f"seg{i % 3}") for i in range(50)]
        dim = spark.createDataFrame(dim_rows, "user_id long, segment string")

        fact_rows = [(i, i % 50, float(i)) for i in range(400)]
        schema = "event_id long, user_id long, value double"
        src = str(tmp_path / "facts")
        write_flat_parquet(spark, fact_rows[:200], schema, src + "/a.parquet")
        write_flat_parquet(spark, fact_rows[200:], schema, src + "/b.parquet")

        enrich = lambda df: df.join(F.broadcast(dim), "user_id").groupBy(
            "segment"
        ).agg(F.count(F.lit(1)).alias("n"))

        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
        q = (
            enrich(sdf)
            .writeStream.format("memory")
            .queryName("enriched")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = {(r.segment, r.n) for r in spark.table("enriched").collect()}
        want = {
            (r.segment, r.n)
            for r in enrich(spark.read.parquet(src)).collect()
        }
        assert got == want and len(want) == 3


class TestStreamingIvfIngest:
    """The 100 TB vector-ingestion shape end-to-end: a stream of new
    embeddings folds into a persisted IVF index via foreachBatch →
    append_ivf_index — micro-batch appends land in bucket partitions,
    and the final index answers queries identically to a one-shot build
    with the same centroids."""

    def test_streamed_appends_match_batch_build(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        from pgstream_spark.operators.ivf import (
            append_ivf_index,
            ivf_query_index,
            train_centroids,
            write_ivf_index,
        )
        from pgstream_spark.sources.parquet import load_table
        from tests.conftest import write_flat_parquet

        emb = load_table(spark, sf_dir, "embeddings")
        seed_df = emb.filter(F.col("vec_id") < 100)
        cents = train_centroids(seed_df, n_lists=8, sample_size=256, iters=5)

        streamed = str(tmp_path / "ivf_streamed")
        write_ivf_index(seed_df, cents, streamed)

        # two micro-batches of "new" vectors arriving as files
        rows = emb.filter(F.col("vec_id") >= 100).collect()
        half = len(rows) // 2
        src = str(tmp_path / "arrivals")
        schema = "vec_id long, embedding array<float>, label string"
        cols = lambda rs: [(r.vec_id, r.embedding, r.label) for r in rs]
        write_flat_parquet(spark, cols(rows[:half]), schema, src + "/b1.parquet")
        write_flat_parquet(spark, cols(rows[half:]), schema, src + "/b2.parquet")

        def ingest(batch_df, batch_id):
            append_ivf_index(batch_df, streamed)

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        batch = str(tmp_path / "ivf_batch")
        write_ivf_index(emb, cents, batch)

        queries = emb.filter(F.col("vec_id") < 5)
        got = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in ivf_query_index(spark, streamed, queries, k=5, n_probes=4).collect()
        }
        want = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in ivf_query_index(spark, batch, queries, k=5, n_probes=4).collect()
        }
        assert got == want and len(got) == 25


class TestStreamingIncrementalDedup:
    """Continuous corpus ingestion: each micro-batch folds through
    dedup_against_history against the accumulated survivors and appends
    — the streaming form of l22.  The standing corpus after the stream
    must equal one-shot exact dedup of all arrivals."""

    def test_streamed_dedup_matches_batch(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from pgstream_spark.operators.dedup import (
            dedup_against_history,
            exact_dedup,
        )
        from tests.conftest import write_flat_parquet

        # 300 docs, every third a duplicate text of an earlier one,
        # arriving across three micro-batches (dupes cross batches)
        rows = [
            (i, f"document body number {i % 100} with shared text")
            for i in range(300)
        ]
        schema = "doc_id long, text string"
        src = str(tmp_path / "arrivals")
        for b in range(3):
            write_flat_parquet(
                spark, rows[b * 100 : (b + 1) * 100], schema, f"{src}/b{b}.parquet"
            )

        corpus = str(tmp_path / "corpus")

        def ingest(batch_df, batch_id):
            import os

            if os.path.exists(corpus):
                history = spark.read.parquet(corpus)
            else:
                history = spark.createDataFrame([], schema)
            survivors = dedup_against_history(
                batch_df, history, ["text"], keep_order_col="doc_id"
            )
            survivors.write.mode("append").parquet(corpus)

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        got = {
            (r.doc_id, r.text) for r in spark.read.parquet(corpus).collect()
        }
        want = {
            (r.doc_id, r.text)
            for r in exact_dedup(
                spark.createDataFrame(rows, schema), ["text"], keep_order_col="doc_id"
            ).collect()
        }
        assert got == want and len(want) == 100


class TestStreamingHllAccounting:
    """Incremental corpus cardinality: each micro-batch's HLL registers
    max-merge into a standing register table — mergeability is exactly
    what makes the sketch streamable.  The final estimate must equal the
    one-shot batch estimate over all arrivals."""

    def test_streamed_register_merge_matches_batch(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from pgstream_spark.operators.sketch import hll_estimate, hll_registers
        from tests.conftest import write_flat_parquet

        rows = [(f"src{i % 3}", f"token-{i % 700}") for i in range(2000)]
        schema = "source string, term string"
        src = str(tmp_path / "terms")
        write_flat_parquet(spark, rows[:1000], schema, src + "/b1.parquet")
        write_flat_parquet(spark, rows[1000:], schema, src + "/b2.parquet")

        regdir = str(tmp_path / "registers")

        def fold(batch_df, batch_id):
            import os

            regs = hll_registers(batch_df, "term", group_cols=["source"])
            if os.path.exists(regdir):
                regs = regs.union(spark.read.parquet(regdir))
            merged = regs.groupBy("source", "register").agg(
                F.max("max_rho").alias("max_rho")
            )
            merged.write.mode("overwrite").parquet(regdir + "__tmp")
            merged_back = spark.read.parquet(regdir + "__tmp")
            merged_back.write.mode("overwrite").parquet(regdir)

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        got = {
            (r.source, r.hll_est)
            for r in hll_estimate(
                spark.read.parquet(regdir), group_cols=["source"]
            ).collect()
        }
        want = {
            (r.source, r.hll_est)
            for r in hll_estimate(
                hll_registers(
                    spark.createDataFrame(rows, schema), "term", group_cols=["source"]
                ),
                group_cols=["source"],
            ).collect()
        }
        assert got == want and len(want) == 3


class TestPostgresExactlyOnceSink:
    """streaming/pg_sink.py — transactional batch-ledger delivery into a
    wire-protocol Postgres: replays skipped, mid-batch failure atomic."""

    def _settings(self, srv):
        from pgstream_spark.sources.pgwire import ConnSettings

        return ConnSettings(
            host="127.0.0.1", dbname="stub", user="t", password=None, port=srv.port
        )

    def test_stream_delivers_once_and_replay_skips(self, spark, tmp_path):
        import duckdb
        from tests.conftest import write_flat_parquet
        from tests.pg_stub import PgStubServer
        from pgstream_spark.streaming.pg_sink import (
            ensure_ledger,
            postgres_exactly_once_sink,
        )

        db = duckdb.connect(":memory:")
        db.execute("CREATE TABLE sunk (k BIGINT, v DOUBLE)")
        src = str(tmp_path / "src")
        schema = "k long, v double"
        write_flat_parquet(spark, [(1, 1.0), (2, 2.0)], schema, src + "/b1.parquet")
        write_flat_parquet(spark, [(3, 3.0), (4, 4.0)], schema, src + "/b2.parquet")

        with PgStubServer(db) as srv:
            st = self._settings(srv)
            ensure_ledger(st, "ledger")
            sink = postgres_exactly_once_sink(st, "sunk", "s1", "ledger")
            sdf = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = (
                sdf.writeStream.foreachBatch(sink)
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            # manual REPLAY of batch 0 (the crash-between-commits case)
            b0 = spark.read.parquet(src + "/b1.parquet")
            sink(b0, 0)

        rows = sorted(db.execute("SELECT k, v FROM sunk").fetchall())
        assert rows == [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)]  # no dupes
        assert db.execute("SELECT count(*) FROM ledger").fetchone()[0] == 2

    def test_mid_batch_failure_rolls_back_ledger_and_rows(self, spark):
        import duckdb
        from tests.pg_stub import PgStubServer
        from pgstream_spark.streaming.pg_sink import (
            ensure_ledger,
            postgres_exactly_once_sink,
        )

        db = duckdb.connect(":memory:")
        db.execute("CREATE TABLE sunk2 (k BIGINT)")
        with PgStubServer(db) as srv:
            st = self._settings(srv)
            ensure_ledger(st, "ledger2")
            # array column is unrenderable → fails after the ledger insert
            bad = spark.createDataFrame([([1, 2],)], "k array<int>")
            sink = postgres_exactly_once_sink(st, "sunk2", "s2", "ledger2")
            import pytest as _pytest

            with _pytest.raises(Exception):
                sink(bad, 7)
            # the aborted transaction must leave NO ledger row: the batch
            # stays redoable
            assert db.execute("SELECT count(*) FROM ledger2").fetchone()[0] == 0
            assert db.execute("SELECT count(*) FROM sunk2").fetchone()[0] == 0
            # and a good redo of the same batch id succeeds
            good = spark.createDataFrame([(9,)], "k long")
            sink(good, 7)
            assert db.execute("SELECT k FROM sunk2").fetchall() == [(9,)]


class TestScd2StreamSink:
    """streaming/cdc.scd2_stream_sink — the CDC-stream → versioned
    dimension lifecycle: micro-batched change feed folded through
    scd2_apply_batch must equal the one-shot history over all changes."""

    def test_stream_equals_one_shot_history(self, spark, tmp_path):
        import glob
        import os

        from pgstream_spark.operators.scd2 import scd2_history
        from pgstream_spark.streaming.cdc import scd2_stream_sink
        from tests.conftest import write_flat_parquet

        schema = "k long, ts date, seq long, op string, val double"
        b1 = [(1, datetime.date(2024, 1, 1), 1, "U", 10.0),
              (2, datetime.date(2024, 1, 5), 2, "U", 50.0)]
        b2 = [(1, datetime.date(2024, 2, 1), 3, "U", 20.0),
              (1, datetime.date(2024, 3, 1), 4, "D", None),
              (3, datetime.date(2024, 2, 10), 5, "U", 99.0)]
        src = str(tmp_path / "scd2_src")
        write_flat_parquet(spark, b1, schema, src + "/a.parquet")
        write_flat_parquet(spark, b2, schema, src + "/b.parquet")
        import time as _time

        now = _time.time()
        os.utime(src + "/a.parquet", (now - 60, now - 60))
        os.utime(src + "/b.parquet", (now, now))

        store = str(tmp_path / "scd2_store")
        ckpt = str(tmp_path / "scd2_ckpt")
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            sdf.writeStream.foreachBatch(
                scd2_stream_sink(
                    store, key_col="k", ts_col="ts",
                    seq_col="seq", op_col="op", payload_cols=["val"],
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = spark.read.parquet(os.path.join(store, "history", "current"))
        rows = b1 + b2
        want = scd2_history(
            spark.createDataFrame(rows, schema),
            "k", "ts", seq_col="seq", op_col="op", payload_cols=["val"],
        )
        cols = ["k", "valid_from", "valid_to", "val"]
        assert sorted(map(tuple, got.select(cols).collect())) == sorted(
            map(tuple, want.select(cols).collect())
        )

    def test_restart_replay_is_idempotent(self, spark, tmp_path):
        import os

        from pgstream_spark.streaming.cdc import scd2_stream_sink
        from tests.conftest import write_flat_parquet

        schema = "k long, ts date, seq long, op string, val double"
        rows = [(1, datetime.date(2024, 1, 1), 1, "U", 10.0),
                (2, datetime.date(2024, 1, 2), 2, "U", 20.0)]
        src = str(tmp_path / "scd2_rsrc")
        write_flat_parquet(spark, rows, schema, src + "/a.parquet")
        store = str(tmp_path / "scd2_rstore")

        def run(ckpt):
            sdf = spark.readStream.schema(schema).parquet(src)
            q = (
                sdf.writeStream.foreachBatch(
                    scd2_stream_sink(
                        store, key_col="k", ts_col="ts",
                        seq_col="seq", op_col="op", payload_cols=["val"],
                    )
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run(str(tmp_path / "ck1"))
        a = sorted(map(tuple, spark.read.parquet(
            os.path.join(store, "history", "current")).collect()))
        # fresh checkpoint -> the whole feed replays against the same store
        run(str(tmp_path / "ck2"))
        b = sorted(map(tuple, spark.read.parquet(
            os.path.join(store, "history", "current")).collect()))
        assert a == b


class TestIvfStreamSink:
    """streaming/ivf_ingest.ivf_stream_sink — continuous vector ingestion
    into a persisted IVF index: stream == full rewrite, replays leave no
    duplicates, layout stays the single-level bucket tree."""

    def _vec(self, i, dim=4):
        # deterministic unit-ish vectors spread across quadrants
        import math
        return [math.cos(0.7 * i + j) for j in range(dim)]

    def _base(self, spark, tmp_path):
        from pgstream_spark.operators.ivf import train_centroids, write_ivf_index

        base_rows = [(i, self._vec(i)) for i in range(64)]
        base = spark.createDataFrame(base_rows, "vec_id long, embedding array<float>")
        cents = train_centroids(base, n_lists=4, sample_size=64)
        path = str(tmp_path / "ivf_index")
        write_ivf_index(base, cents, path)
        return base, cents, path

    def test_stream_equals_full_rewrite(self, spark, tmp_path):
        from pgstream_spark.operators.ivf import (
            ivf_query_index,
            write_ivf_index,
        )
        from pgstream_spark.streaming.ivf_ingest import ivf_stream_sink
        from tests.conftest import write_flat_parquet

        base, cents, path = self._base(spark, tmp_path)
        new_rows_a = [(100 + i, self._vec(100 + i)) for i in range(16)]
        new_rows_b = [(200 + i, self._vec(200 + i)) for i in range(16)]
        schema = "vec_id long, embedding array<float>"
        src = str(tmp_path / "vec_src")
        write_flat_parquet(spark, new_rows_a, schema, src + "/a.parquet")
        write_flat_parquet(spark, new_rows_b, schema, src + "/b.parquet")

        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            sdf.writeStream.foreachBatch(ivf_stream_sink(path))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        n = spark.read.parquet(path + "/vectors").count()
        assert n == 64 + 32

        # reference: full rewrite with the SAME centroids over all rows
        all_rows = base.unionByName(
            spark.createDataFrame(new_rows_a + new_rows_b, schema)
        )
        ref_path = str(tmp_path / "ivf_ref")
        write_ivf_index(all_rows, cents, ref_path)
        queries = spark.createDataFrame(
            [(0, self._vec(150))], "vec_id long, embedding array<float>"
        )
        got = sorted(
            (r.query_id, r.neighbor_id, round(r.cosine, 6))
            for r in ivf_query_index(spark, path, queries, k=5, n_probes=4).collect()
        )
        want = sorted(
            (r.query_id, r.neighbor_id, round(r.cosine, 6))
            for r in ivf_query_index(spark, ref_path, queries, k=5, n_probes=4).collect()
        )
        assert got == want

    def test_replay_leaves_no_duplicates(self, spark, tmp_path):
        from pgstream_spark.streaming.ivf_ingest import ivf_stream_sink
        from tests.conftest import write_flat_parquet

        _, _, path = self._base(spark, tmp_path)
        schema = "vec_id long, embedding array<float>"
        rows = [(300 + i, self._vec(300 + i)) for i in range(8)]
        src = str(tmp_path / "vec_rsrc")
        write_flat_parquet(spark, rows, schema, src + "/a.parquet")

        def run(ck):
            sdf = spark.readStream.schema(schema).parquet(src)
            q = (
                sdf.writeStream.foreachBatch(ivf_stream_sink(path))
                .option("checkpointLocation", str(tmp_path / ck))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run("ck1")
        a = spark.read.parquet(path + "/vectors").count()
        run("ck2")  # fresh checkpoint: same batch replays as batch_id=0
        b = spark.read.parquet(path + "/vectors").count()
        assert a == b == 64 + 8


class TestDriftMonitor:
    """streaming/drift.drift_monitor_sink — the live twin of l60."""

    _SCHEMA = "id long, bucket long"
    # reference profile: uniform over 4 bins
    _REF = [(0, 25), (1, 25), (2, 25), (3, 25)]

    def _run(self, spark, tmp_path, batches, **kw):
        from pgstream_spark.streaming.drift import (
            drift_monitor_sink,
            read_drift_log,
        )
        from tests.conftest import write_flat_parquet

        src = str(tmp_path / "src")
        for i, rows in enumerate(batches):
            write_flat_parquet(spark, rows, self._SCHEMA, f"{src}/b{i}.parquet")
        store = str(tmp_path / "store")
        sink = drift_monitor_sink(store, self._REF, "bucket", 4, **kw)
        q = (
            spark.readStream.schema(self._SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return store, read_drift_log(spark, store).collect()

    def test_cumulative_drift_converges_and_alerts_on_skew(
        self, spark, tmp_path
    ):
        # batch 0 matches the reference mix; batch 1 floods bin 0
        match = [(i, i % 4) for i in range(100)]
        flood = [(1000 + i, 0) for i in range(300)]
        store, log = self._run(
            spark, tmp_path, [match, flood], alert_tv_micro=200_000
        )
        assert [r.batch_id for r in log] == [0, 1]
        assert log[0].batch_tv_micro < 20_000 and not log[0].alert
        # the flood batch alone is ~max drift; cumulative crosses the gate
        assert log[1].batch_tv_micro > 500_000
        assert log[1].cum_tv_micro > 200_000 and log[1].alert

    def test_cumulative_equals_batch_recomputation(self, spark, tmp_path):
        # stream-fold == one-shot l60 arithmetic over the union
        from pgstream_spark.operators.snapshot import histogram_drift_counts

        b0 = [(i, i % 4) for i in range(40)]
        b1 = [(100 + i, (i % 3)) for i in range(60)]
        _, log = self._run(spark, tmp_path, [b0, b1])
        union = spark.createDataFrame(b0 + b1, self._SCHEMA).groupBy(
            "bucket"
        ).count().selectExpr("bucket", "CAST(count AS BIGINT) AS cnt_a")
        ref = spark.createDataFrame(self._REF, "bucket long, cnt_b long")
        want = (
            sum(
                r.tv_micro
                for r in histogram_drift_counts(union, ref, 4).collect()
            )
            // 2
        )
        assert log[-1].cum_tv_micro == want

    def test_replay_is_idempotent(self, spark, tmp_path):
        from pgstream_spark.streaming.drift import (
            drift_monitor_sink,
            read_drift_log,
        )

        store = str(tmp_path / "store")
        sink = drift_monitor_sink(store, self._REF, "bucket", 4)
        batch = spark.createDataFrame([(i, i % 4) for i in range(50)], self._SCHEMA)
        sink(batch, 0)
        first = [tuple(r) for r in read_drift_log(spark, store).collect()]
        sink(batch, 0)  # crash-replay of a committed batch
        again = [tuple(r) for r in read_drift_log(spark, store).collect()]
        assert first == again and len(again) == 1

    def test_partial_crash_replay_overwrites_and_commits(
        self, spark, tmp_path
    ):
        # simulate a crash AFTER counts/log were written but BEFORE the
        # ledger append: pre-plant garbage versions with no ledger row —
        # the replay must overwrite them from scratch and commit once
        from pgstream_spark.streaming.drift import (
            drift_monitor_sink,
            read_drift_log,
        )

        store = str(tmp_path / "store")
        spark.createDataFrame([(0, 999)], "bucket long, cnt long").write.parquet(
            f"{store}/counts/v0"
        )
        spark.createDataFrame(
            [(0, 999, 999, 999, True)],
            "batch_id long, n_rows long, batch_tv_micro long, "
            "cum_tv_micro long, alert boolean",
        ).write.parquet(f"{store}/log/v0")
        sink = drift_monitor_sink(store, self._REF, "bucket", 4)
        batch = spark.createDataFrame(
            [(i, i % 4) for i in range(100)], self._SCHEMA
        )
        sink(batch, 0)
        log = read_drift_log(spark, store).collect()
        assert len(log) == 1 and log[0].n_rows == 100
        assert log[0].batch_tv_micro < 20_000  # garbage 999s are gone
        counts = {
            (r.bucket, r.cnt)
            for r in spark.read.parquet(f"{store}/counts/v0").collect()
        }
        assert counts == {(0, 25), (1, 25), (2, 25), (3, 25)}


class TestObserve:
    """streaming/observe.py — in-flight metrics, no second pass."""

    def test_observe_batch_audit_rail(self, spark):
        from pyspark.sql import functions as F

        from pgstream_spark.streaming.observe import observe_batch

        df = spark.createDataFrame(
            [(1, 10.0), (2, None), (3, 30.0), (4, None)],
            "id long, v double",
        )
        out, obs = observe_batch(
            df,
            "audit",
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("nulls"),
            F.max("id").alias("max_id"),
        )
        assert out.count() == 4  # the action that materializes metrics
        got = obs.get
        assert got == {"rows": 4, "nulls": 2, "max_id": 4}

    def test_streaming_observed_metrics_per_batch(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from pgstream_spark.streaming.observe import MetricsRecorder, observed

        src = str(tmp_path / "in")
        spark.createDataFrame(
            [(i, float(i % 5)) for i in range(60)], "id long, v double"
        ).coalesce(1).write.parquet(src)
        rec = MetricsRecorder(query_name="obs_q")
        spark.streams.addListener(rec)
        try:
            stream = (
                spark.readStream.schema("id long, v double")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            stream = observed(
                stream,
                "quality",
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("v") == 0.0, 1).otherwise(0)).alias(
                    "zeros"
                ),
            )
            q = (
                stream.writeStream.format("noop")
                .queryName("obs_q")
                .option("checkpointLocation", str(tmp_path / "ck"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            batches = rec.wait_for_batches(1, nonempty=True)
            # observed metrics cover exactly the batch's own rows
            n_total = sum(b["observed"]["quality"]["n"] for b in batches)
            z_total = sum(b["observed"]["quality"]["zeros"] for b in batches)
            assert n_total == 60 and z_total == 12
            assert rec.totals()["rows"] == 60
            assert all(
                b["rows"] == b["observed"]["quality"]["n"] for b in batches
            )
        finally:
            spark.streams.removeListener(rec)


class TestStreamStaticPointInTime:
    """streaming/joins.stream_static_point_in_time — SCD2 read side."""

    _CH = [
        (1, "2024-01-01", 1, "U", 10.0),
        (1, "2024-02-01", 2, "U", 20.0),
        (1, "2024-03-01", 3, "D", None),
        (1, "2024-04-01", 4, "U", 40.0),
        (2, "2024-01-15", 5, "U", 99.0),
    ]
    _FACTS = [
        (100, 1, "2024-01-20"),  # inside v1
        (101, 1, "2024-02-15"),  # inside v2
        (102, 1, "2024-03-10"),  # deletion hole -> NULL
        (103, 1, "2024-12-01"),  # current open version
        (104, 1, "2023-06-01"),  # before first version -> NULL
        (105, 2, "2024-06-01"),
    ]

    def _history(self, spark):
        from pyspark.sql import functions as F

        from pgstream_spark.operators.scd2 import scd2_history

        ch = spark.createDataFrame(
            self._CH, "k long, ts string, seq long, op string, val double"
        ).withColumn("ts", F.col("ts").cast("date"))
        return scd2_history(
            ch, key_col="k", ts_col="ts", seq_col="seq", op_col="op",
            payload_cols=["val"],
        )

    def _facts(self, spark):
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            self._FACTS, "fid long, k long, fts string"
        ).withColumn("fts", F.col("fts").cast("date"))

    def test_batch_form_matches_point_in_time_join(self, spark):
        from pgstream_spark.operators.scd2 import point_in_time_join
        from pgstream_spark.streaming.joins import stream_static_point_in_time

        h, f = self._history(spark), self._facts(spark)
        a = {
            r.fid: (r.val_r, r.valid_from_r, r.valid_to_r)
            for r in stream_static_point_in_time(f, h, "k", "fts").collect()
        }
        b = {
            r.fid: (r.val_r, r.valid_from_r, r.valid_to_r)
            for r in point_in_time_join(f, h, on="k", fact_ts="fts").collect()
        }
        assert a == b and a[102][0] is None and a[104][0] is None

    def test_streaming_form_matches_batch(self, spark, tmp_path):
        from pgstream_spark.streaming.joins import stream_static_point_in_time

        src = str(tmp_path / "facts")
        self._facts(spark).coalesce(2).write.parquet(src)
        h = self._history(spark)
        stream = (
            spark.readStream.schema("fid long, k long, fts date")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream_static_point_in_time(stream, h, "k", "fts")
            .writeStream.format("memory")
            .queryName("pit_out")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.fid: r.val_r
            for r in spark.sql("SELECT * FROM pit_out").collect()
        }
        assert got == {100: 10.0, 101: 20.0, 102: None, 103: 40.0,
                       104: None, 105: 99.0}


class TestStreamingPerceptualIngest:
    def test_stream_appends_exactly_once_and_probe_sees_all(
        self, spark, tmp_path
    ):
        # T-* extension: media assets arrive as a file stream; each
        # micro-batch is dHash-signed through the real codec and
        # appended to the perceptual index exactly once (batchId
        # ledger); a post-stream probe finds the cross-batch near-dup.
        import hashlib

        from pgstream_spark.operators.perceptual_index import (
            foreach_batch_perceptual_appender,
            probe_perceptual_index,
        )
        from pgstream_spark.operators.multimodal import dhash_signatures

        def img(seed):
            body = b"".join(
                hashlib.md5(f"{seed}:{b}".encode()).digest() for b in range(48)
            )
            return b"P6\n16 16\n255\n" + body

        src = tmp_path / "assets"
        src.mkdir()
        idx = str(tmp_path / "pidx")
        ck = str(tmp_path / "ck")
        # two files -> maxFilesPerTrigger=1 gives two micro-batches
        spark.createDataFrame(
            [(1, img("g0")), (2, img("g1"))], "asset_id long, payload binary"
        ).write.parquet(str(src / "f1"))
        spark.createDataFrame(
            [(3, img("g0")), (4, img("g2"))], "asset_id long, payload binary"
        ).write.parquet(str(src / "f2"))
        stream = (
            spark.readStream.schema("asset_id long, payload binary")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            stream.writeStream.foreachBatch(
                foreach_batch_perceptual_appender(
                    idx,
                    lambda df: dhash_signatures(df, "payload", "asset_id"),
                )
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # 4 assets x 4 band rows, across >= 2 ledger batches
        rows = spark.read.parquet(idx)
        assert rows.count() == 16
        import json as _json

        with open(f"{idx}/_manifest.json") as fh:
            m = _json.load(fh)
        assert m["n_sigs"] == 4 and len(m["ledger"]) >= 2
        # probe: a new asset identical to the g0 family finds BOTH
        # indexed g0 members (they arrived in different micro-batches)
        probe = dhash_signatures(
            spark.createDataFrame(
                [(99, img("g0"))], "asset_id long, payload binary"
            ),
            "payload",
            "asset_id",
        )
        got = {
            (r.id_new, r.id_indexed): r.hamming
            for r in probe_perceptual_index(spark, idx, probe).collect()
        }
        assert got == {(99, 1): 0, (99, 3): 0}
