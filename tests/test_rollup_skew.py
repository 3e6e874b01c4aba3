"""Hypertable rollup, skew-salted aggregation, Python UDTF."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgstream_spark.operators.rollup_time import time_rollup
from pgstream_spark.operators.skew import salted_agg
from pgstream_spark.sources.parquet import load_events


class TestTimeRollup:
    def test_tiers_consistent(self, spark, sf_dir):
        ev = load_events(spark, sf_dir).select(
            "ts", F.round(F.col("value") * 100).cast("bigint").alias("v")
        )
        out = time_rollup(ev, "ts", "v", resolutions=("minute", "hour", "day")).cache()

        totals = {
            r.resolution: (r.n, r.s)
            for r in out.groupBy("resolution")
            .agg(F.sum("n").alias("n"), F.sum("sum_value").alias("s"))
            .collect()
        }
        # every tier preserves total count and total sum
        assert totals["minute"] == totals["hour"] == totals["day"]

        # hour tier equals a direct hourly aggregation of the raw data
        direct = {
            (r.b, ): (r.n, r.s, r.mn, r.mx)
            for r in ev.groupBy(F.date_trunc("hour", "ts").alias("b"))
            .agg(
                F.count("v").alias("n"), F.sum("v").alias("s"),
                F.min("v").alias("mn"), F.max("v").alias("mx"),
            )
            .collect()
        }
        tier = {
            (r.bucket_start, ): (r.n, r.sum_value, r.min_value, r.max_value)
            for r in out.filter("resolution = 'hour'").collect()
        }
        assert tier == direct
        out.unpersist()

    def test_grouped_rollup(self, spark, sf_dir):
        ev = load_events(spark, sf_dir).select(
            "ts", "event_type", F.round(F.col("value")).cast("bigint").alias("v")
        )
        out = time_rollup(
            ev, "ts", "v", resolutions=("hour", "day"), group_cols=["event_type"]
        )
        day = out.filter("resolution = 'day'")
        direct = ev.groupBy(
            F.date_trunc("day", "ts").alias("bucket_start"), "event_type"
        ).agg(F.sum("v").alias("s"))
        a = {(r.bucket_start, r.event_type, r.sum_value) for r in day.collect()}
        b = {(r.bucket_start, r.event_type, r.s) for r in direct.collect()}
        assert a == b


class TestSaltedAgg:
    def test_equals_direct_groupby(self, spark, sf_dir):
        from pgstream_spark.sources.parquet import load_table

        li = load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", F.round(F.col("l_quantity")).cast("bigint").alias("q")
        )
        salted = salted_agg(li, ["l_returnflag"], sum_cols=["q"], salt_buckets=8)
        direct = li.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"), F.sum("q").alias("sum_q")
        )
        a = {(r.l_returnflag, r.n, r.sum_q) for r in salted.collect()}
        b = {(r.l_returnflag, r.n, r.sum_q) for r in direct.collect()}
        assert a == b

    def test_salt_spreads_hot_key(self, spark):
        # a single-key frame must occupy multiple salt buckets
        df = spark.range(10_000).select(F.lit("hot").alias("k"), F.col("id"))
        salt = (F.rand(seed=42) * 8).cast("int")
        n_buckets = df.withColumn("s", salt).select("s").distinct().count()
        assert n_buckets == 8


class TestPythonUDTF:
    def test_tokenize_rows_and_hash_prefix_property(self, spark):
        from pgstream_spark.functions.udtf_fns import register_tokenize_udtf

        register_tokenize_udtf(spark)
        spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta DELTA"), (3, None)],
            "doc_id long, text string",
        ).createOrReplaceTempView("__udtf_docs")
        rows = spark.sql(
            "SELECT t.doc_id, t.pos, t.token, t.rolling_hash "
            "FROM __udtf_docs d, LATERAL tokenize(d.doc_id, d.text) t"
        ).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, {})[r.pos] = (r.token, r.rolling_hash)
        assert 3 not in by_doc  # NULL text yields no rows
        assert [by_doc[1][i][0] for i in range(3)] == ["alpha", "beta", "gamma"]
        # shared 2-token prefix → equal rolling hashes at pos 0 and 1,
        # diverging at pos 2
        assert by_doc[1][0][1] == by_doc[2][0][1]
        assert by_doc[1][1][1] == by_doc[2][1][1]
        assert by_doc[1][2][1] != by_doc[2][2][1]


class TestSaltedJoin:
    def test_matches_plain_join_on_skewed_keys(self, spark):
        from pgstream_spark.operators.skew import salted_join

        # 90% of left rows share one key — the salted plan must still
        # produce exactly the plain join's result.
        left = spark.createDataFrame(
            [(1 if i % 10 else i, i) for i in range(1000)], "k long, v long"
        )
        right = spark.createDataFrame(
            [(k, f"dim{k}") for k in range(0, 200)], "k long, name string"
        )
        fast = salted_join(left, right, ["k"], salt_buckets=8)
        plain = left.join(right, ["k"])
        assert sorted((r.k, r.v, r.name) for r in fast.collect()) == sorted(
            (r.k, r.v, r.name) for r in plain.collect()
        )

    def test_left_join_keeps_unmatched_left_rows(self, spark):
        from pgstream_spark.operators.skew import salted_join

        left = spark.createDataFrame([(1, 10), (99, 20)], "k long, v long")
        right = spark.createDataFrame([(1, "x")], "k long, name string")
        out = {r.k: r.name for r in salted_join(left, right, ["k"], how="left").collect()}
        assert out == {1: "x", 99: None}

    def test_rejects_right_joins(self, spark):
        from pgstream_spark.operators.skew import salted_join
        import pytest as _pytest

        df = spark.createDataFrame([(1,)], "k long")
        with _pytest.raises(ValueError):
            salted_join(df, df, ["k"], how="full")

    def test_salt_spreads_hot_key(self, spark):
        from pgstream_spark.operators.skew import salted_join
        from pyspark.sql import functions as F

        left = spark.createDataFrame(
            [(1, i) for i in range(400)], "k long, v long"
        )
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
        n_buckets = left.select(salt.alias("s")).distinct().count()
        assert n_buckets >= 6          # one key fans out across buckets


class TestGapfillLocf:
    def test_gaps_filled_and_carried(self, spark):
        import datetime as dt
        from pgstream_spark.operators.rollup_time import gapfill_locf

        def t(h):
            return dt.datetime(2024, 1, 1, h, 30)

        ev = spark.createDataFrame(
            [  # user 1: events in hours 0 and 3 — hours 1, 2 are gaps
                (1, t(0), 10.0),
                (1, t(0), 2.5),
                (1, t(3), 7.0),
                # user 2: single hour, no gaps
                (2, t(5), 1.0),
            ],
            "user_id long, ts timestamp_ntz, value double",
        )
        out = {
            (r.user_id, r.bucket_epoch_s): r
            for r in gapfill_locf(ev, "ts", "value", ["user_id"]).collect()
        }
        base = 1704067200  # 2024-01-01T00:00Z — NTZ epochs are tz-free
        h = 3600
        assert len(out) == 5                     # 4 buckets user 1 + 1 user 2
        assert out[(1, base)].n_events == 2
        assert out[(1, base)].filled_value == 12.5
        for gap_h in (1, 2):                     # gap rows: 0 events, carried sum
            r = out[(1, base + gap_h * h)]
            assert r.n_events == 0 and r.filled_value == 12.5
        assert out[(1, base + 3 * h)].filled_value == 7.0
        assert out[(2, base + 5 * h)].n_events == 1

    def test_spine_is_per_key(self, spark):
        import datetime as dt
        from pgstream_spark.operators.rollup_time import gapfill_locf

        ev = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 0), 1.0), (2, dt.datetime(2024, 1, 2, 0), 1.0)],
            "user_id long, ts timestamp_ntz, value double",
        )
        # each key spans one bucket — no cross-key spine bleed
        assert gapfill_locf(ev, "ts", "value", ["user_id"]).count() == 2


class TestGapfillInterpolate:
    def test_linear_between_observations(self, spark):
        import datetime as dt
        from pgstream_spark.operators.rollup_time import gapfill_locf

        ev = spark.createDataFrame(
            [  # hour 0 sum=3.0, hour 3 sum=9.0 -> gaps at 1, 2 interpolate
                (1, dt.datetime(2024, 1, 1, 0, 15), 3.0),
                (1, dt.datetime(2024, 1, 1, 3, 15), 9.0),
            ],
            "user_id long, ts timestamp_ntz, value double",
        )
        out = {
            r.bucket_epoch_s: r.filled_value
            for r in gapfill_locf(
                ev, "ts", "value", ["user_id"], mode="interpolate"
            ).collect()
        }
        base = 1704067200
        assert out[base] == 3.0
        assert out[base + 3600] == 5.0       # 3 + (9-3) * 1/3
        assert out[base + 7200] == 7.0       # 3 + (9-3) * 2/3
        assert out[base + 10800] == 9.0

    def test_unknown_mode_raises(self, spark):
        import datetime as dt
        from pgstream_spark.operators.rollup_time import gapfill_locf
        import pytest as _pytest

        ev = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), 1.0)],
            "user_id long, ts timestamp_ntz, value double",
        )
        with _pytest.raises(ValueError):
            gapfill_locf(ev, "ts", "value", ["user_id"], mode="spline").collect()


class TestWindowSkewMitigation:
    """VERDICT r3 item 7: the window-heavy tier (trailing-frame
    aggregates, sessionize, weighted quantiles) under a deliberately
    skewed fixture — one key holding 50% of all rows.  Each mitigation
    must be BIT-IDENTICAL to the plain single-partition-per-key plan."""

    @pytest.fixture(scope="class")
    def skewed(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = []
        for i in range(20_000):  # hot key 0: 50% of all rows
            rows.append((0, base + dt.timedelta(seconds=17 * i), i, (i * 37) % 997))
        for i in range(20_000):  # 100 cold keys share the rest
            rows.append(
                (1 + i % 100, base + dt.timedelta(seconds=13 * i), 100_000 + i, (i * 61) % 997)
            )
        return spark.createDataFrame(
            rows, "k long, ts timestamp_ntz, eid long, x long"
        ).persist()

    def test_chunked_trailing_median_identical(self, spark, skewed):
        from pyspark.sql import Window

        from pgstream_spark.operators.chunked_window import chunked_trailing_agg

        plain_w = (
            Window.partitionBy("k")
            .orderBy(F.col("ts").asc(), F.col("eid").asc())
            .rowsBetween(-19, 0)
        )
        plain = skewed.withColumn(
            "med", F.percentile("x", F.lit(0.5)).over(plain_w)
        )
        chunked = chunked_trailing_agg(
            skewed,
            key_cols=["k"],
            order_cols=["ts", "eid"],
            bucket=F.date_trunc("hour", F.col("ts")),
            agg_builder=lambda w: F.percentile("x", F.lit(0.5)).over(w),
            frame_rows=20,
            out_col="med",
            target_rows=2_000,  # hot key spreads over ~10 chunks
        )
        key = lambda r: r.eid
        a = sorted(plain.select("eid", "med").collect(), key=key)
        b = sorted(chunked.select("eid", "med").collect(), key=key)
        assert a == b

    def test_chunked_trailing_sum_giant_bucket_slivers(self, spark):
        # adversarial chunking: one bucket overshoots several targets,
        # stranding sliver raw chunks — forward-merge must keep halos
        # complete (this is the corner a naive floor() chunking breaks).
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [(1, base, i, i % 23) for i in range(5_000)]  # 1 giant bucket
        rows += [
            (1, base + dt.timedelta(hours=1 + i // 3), 10_000 + i, i % 29)
            for i in range(30)  # tiny trailing buckets
        ]
        df = spark.createDataFrame(rows, "k long, ts timestamp_ntz, eid long, x long")
        from pyspark.sql import Window

        from pgstream_spark.operators.chunked_window import chunked_trailing_agg

        plain_w = (
            Window.partitionBy("k")
            .orderBy(F.col("ts").asc(), F.col("eid").asc())
            .rowsBetween(-19, 0)
        )
        plain = df.withColumn("s", F.sum("x").over(plain_w))
        chunked = chunked_trailing_agg(
            df,
            key_cols=["k"],
            order_cols=["ts", "eid"],
            bucket=F.date_trunc("hour", F.col("ts")),
            agg_builder=lambda w: F.sum("x").over(w),
            frame_rows=20,
            out_col="s",
            target_rows=1_000,
        )
        a = sorted(map(tuple, plain.select("eid", "s").collect()))
        b = sorted(map(tuple, chunked.select("eid", "s").collect()))
        assert a == b

    def test_chunked_target_must_cover_frame(self, spark, skewed):
        from pgstream_spark.operators.chunked_window import chunked_trailing_agg

        with pytest.raises(ValueError, match="target_rows"):
            chunked_trailing_agg(
                skewed, ["k"], ["ts", "eid"], F.date_trunc("hour", "ts"),
                lambda w: F.sum("x").over(w), frame_rows=20, out_col="s",
                target_rows=30,
            )

    def test_sessionize_chunked_identical(self, spark, skewed):
        from pgstream_spark.operators.chunked_window import sessionize_chunked
        from pgstream_spark.operators.sessionize import sessionize

        plain = sessionize(skewed, "ts", ["k"], gap_seconds=60, tie_col="eid")
        chunked = sessionize_chunked(
            skewed, "ts", ["k"], gap_seconds=60, tie_col="eid",
            bucket=F.date_trunc("hour", F.col("ts")), target_rows=2_000,
        )
        a = sorted(map(tuple, plain.select("eid", "session_idx").collect()))
        b = sorted(map(tuple, chunked.select("eid", "session_idx").collect()))
        assert a == b

    def test_weighted_quantiles_preagg_identical(self, spark, skewed):
        from pgstream_spark.operators.robust import weighted_quantiles

        wdf = skewed.withColumn("wt", F.col("x") % 7 + 1)
        qs = [0.1, 0.5, 0.9]
        pre = weighted_quantiles(
            wdf, "x", "wt", ["k"], qs, pre_aggregate=True
        )
        raw = weighted_quantiles(
            wdf, "x", "wt", ["k"], qs, pre_aggregate=False
        )
        a = sorted(map(tuple, pre.collect()))
        b = sorted(map(tuple, raw.collect()))
        assert a == b
        # the pre-aggregated sorted pass sees |distinct x| rows per key,
        # not the hot key's row count
        assert pre.count() == 101
