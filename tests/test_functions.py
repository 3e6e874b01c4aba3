"""Column functions: array kernels (null compaction), money semantics,
epoch conversions, plus tolerance-checked builtin stats (the inventory's
g8 uses exact formulas; here the builtins are validated against them)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgstream_spark.functions.arrays import array_dot, array_mean, compact_array
from pgstream_spark.functions.datetime import epoch_seconds, from_epoch_seconds
from pgstream_spark.functions.money import cents_to_money, money_to_cents


class TestArrayKernels:
    def test_null_compaction_matches_c_kernel_semantics(self, spark):
        # reference kernels skip NULL elements and compact
        # (array_conversion.c:83-90)
        df = spark.createDataFrame(
            [(1, [1, None, 3, None, 5])], "id int, a array<int>"
        )
        out = df.select(compact_array(F.col("a")).alias("c")).first()
        assert out.c == [1, 3, 5]

    def test_dot_product(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0])],
            "id int, a array<double>, b array<double>",
        )
        assert df.select(array_dot(F.col("a"), F.col("b")).alias("d")).first().d == 32.0

    def test_array_mean_ignores_nulls(self, spark):
        df = spark.createDataFrame([(1, [2.0, None, 4.0])], "id int, a array<double>")
        assert df.select(array_mean(F.col("a")).alias("m")).first().m == 3.0

    def test_array_mean_empty_is_null(self, spark):
        df = spark.createDataFrame([(1, [])], "id int, a array<double>")
        assert df.select(array_mean(F.col("a")).alias("m")).first().m is None


class TestMoney:
    def test_cents_roundtrip_exact(self, spark):
        # F-11: int8 cents ÷ 100 (reference FromRow.hs:281-293)
        df = spark.createDataFrame([(1, 12345), (2, -99)], "id int, cents long")
        out = df.select(
            "cents", cents_to_money(F.col("cents")).alias("m")
        ).withColumn("back", money_to_cents(F.col("m")))
        for r in out.collect():
            assert r.back == r.cents
        vals = {r.cents: str(r.m) for r in out.collect()}
        assert vals[12345] == "123.45"
        assert vals[-99] == "-0.99"

    def test_money_sum_is_exact(self, spark):
        # 0.1 + 0.2 style drift cannot happen in DECIMAL
        rows = [(i, 1) for i in range(1000)]  # 1000 × $0.01
        df = spark.createDataFrame(rows, "id int, cents long")
        total = df.select(cents_to_money(F.col("cents")).alias("m")).agg(
            F.sum("m").alias("s")
        ).first().s
        assert str(total) == "10.00"


class TestEpoch:
    def test_roundtrip(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-03-01 12:34:56")], "id int, s string"
        ).select("id", F.col("s").cast("timestamp").alias("ts"))
        out = df.select(
            epoch_seconds(F.col("ts")).alias("e")
        ).select("e", from_epoch_seconds(F.col("e")).alias("back"))
        r = out.first()
        assert r.e == 1709296496
        assert str(r.back).startswith("2024-03-01 12:34:56")


class TestBuiltinStatsAgainstExactFormulas:
    # The inventory's g8 computes stats via exact two-pass formulas for
    # oracle hash parity; here Spark's builtins are checked against the
    # same numbers with float tolerance (SURVEY §5.3).

    def test_stddev_var_corr(self, spark, sf_dir):
        from pgstream_spark.sources.parquet import load_table
        from pgstream_spark.inventory import QUERIES

        exact = QUERIES["g8_stats_agg"](spark, sf_dir).first()
        li = load_table(spark, sf_dir, "lineitem")
        builtin = li.agg(
            F.var_samp("l_extendedprice").alias("v"),
            F.stddev_samp("l_extendedprice").alias("s"),
            F.corr("l_extendedprice", "l_discount").alias("c"),
        ).first()
        assert builtin.v == pytest.approx(exact.var_price, rel=1e-9)
        assert builtin.s == pytest.approx(exact.stddev_price, rel=1e-9)
        assert builtin.c == pytest.approx(exact.corr_price_disc, rel=1e-6)

    def test_ln_exp_against_duckdb(self, spark, sf_dir, duck):
        # libm functions: tolerance-checked, never hash-checked
        from pgstream_spark.sources.parquet import load_table

        o = load_table(spark, sf_dir, "orders")
        s = o.agg(
            F.sum(F.log("o_totalprice")).alias("sum_ln")
        ).first().sum_ln
        d = duck.execute("SELECT SUM(ln(o_totalprice)) FROM orders").fetchone()[0]
        assert s == pytest.approx(d, rel=1e-12)


class TestApproxDistinct:
    def test_hll_within_tolerance(self, spark, sf_dir):
        from pgstream_spark.sources.parquet import load_table

        li = load_table(spark, sf_dir, "lineitem")
        r = li.agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("a"),
            F.count_distinct("l_partkey").alias("e"),
        ).first()
        assert r.a == pytest.approx(r.e, rel=0.1)


class TestEpochTzIndependence:
    def test_ntz_epoch_is_session_tz_independent(self, spark):
        # the ADVICE item: under a non-UTC session tz, the NTZ epoch must
        # not shift (tz-free field arithmetic, not an implicit cast)
        prev = spark.conf.get("spark.sql.session.timeZone")
        df = spark.createDataFrame(
            [(1, "2024-03-01 12:34:56")], "id int, s string"
        ).select(F.col("s").cast("timestamp_ntz").alias("ts"))
        try:
            vals = []
            for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
                spark.conf.set("spark.sql.session.timeZone", tz)
                vals.append(df.select(epoch_seconds(F.col("ts")).alias("e")).first().e)
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)
        assert vals == [1709296496] * 3

    def test_from_epoch_ntz_roundtrip(self, spark):
        df = spark.createDataFrame([(1709296496,)], "e long")
        r = df.select(from_epoch_seconds(F.col("e"), ntz=True).alias("back")).first()
        assert str(r.back) == "2024-03-01 12:34:56"
        out_type = df.select(from_epoch_seconds(F.col("e"), ntz=True)).dtypes[0][1]
        assert out_type == "timestamp_ntz"


class TestApproxPercentile:
    def test_sketch_within_tolerance_of_exact(self, spark, sf_dir):
        # g34's accuracy pin: the mergeable percentile sketch must land
        # within 1% of the exact interpolated percentile per group
        from pgstream_spark.sources.parquet import load_table

        li = load_table(spark, sf_dir, "lineitem")
        rows = li.groupBy("l_returnflag").agg(
            F.expr(
                "approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)"
            ).alias("a"),
            F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("e"),
        ).collect()
        assert rows
        for r in rows:
            for approx, exact in zip(r.a, r.e):
                assert approx == pytest.approx(exact, rel=0.01)



class TestUuid3:
    def test_format_determinism_distinctness(self, spark):
        import re

        from pgstream_spark.functions.ids import uuid3

        df = spark.createDataFrame(
            [("alpha",), ("beta",), ("alpha",)], "name string"
        )
        vals = [r.u for r in df.select(uuid3(F.col("name")).alias("u")).collect()]
        pat = re.compile(
            r"^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}$"
        )
        assert all(pat.match(v) for v in vals)
        assert vals[0] == vals[2] != vals[1]  # content-derived, not random
        # namespace separates id spaces
        other = df.select(uuid3(F.col("name"), namespace="else").alias("u")).collect()
        assert other[0].u != vals[0]


class TestSimilarTo:
    """functions/strings.py — Postgres SIMILAR TO compiled to regex."""

    def test_postgres_doc_examples(self):
        # the four examples from Postgres docs §9.7.2
        import re

        from pgstream_spark.functions.strings import similar_to_regex

        def m(s, p):
            return re.match(similar_to_regex(p), s) is not None

        assert m("abc", "abc")
        assert not m("abc", "a")
        assert m("abc", "%(b|d)%")
        assert not m("abc", "(b|c)%")

    def test_default_escape_is_backslash_and_dotall(self):
        # Postgres §9.7.2: the DEFAULT escape character is backslash;
        # SQL wildcards match across newlines (regex needs (?s))
        import re

        from pgstream_spark.functions.strings import similar_to_regex

        rx = similar_to_regex("50\\%")  # pattern: 50\%
        assert re.match(rx, "50%") and not re.match(rx, "50x")
        # ESCAPE NONE: backslash is an ordinary literal character
        rx = similar_to_regex("a\\b", escape=None)
        assert re.match(rx, "a\\b")
        assert re.match(similar_to_regex("a%b"), "a\nb")
        assert re.match(similar_to_regex("a_b"), "a\nb")

    def test_wildcards_classes_escape_anchoring(self):
        import re

        from pgstream_spark.functions.strings import similar_to_regex

        rx = similar_to_regex("a_c%")
        assert re.match(rx, "axc-tail") and not re.match(rx, "ac")
        # %/_ stay literal inside character classes
        rx = similar_to_regex("[%_]!")
        assert re.match(rx, "%!") and re.match(rx, "_!")
        assert not re.match(rx, "x!")
        # ESCAPE makes the wildcard literal
        rx = similar_to_regex("100!%", escape="!")
        assert re.match(rx, "100%") and not re.match(rx, "100x")
        # SIMILAR TO is full-string: no partial match
        assert not re.match(similar_to_regex("bc"), "abc")
        # literal regex metachars in the SQL dialect
        assert re.match(similar_to_regex("a.b"), "a.b")
        assert not re.match(similar_to_regex("a.b"), "axb")

    def test_error_cases(self):
        import pytest as _pytest

        from pgstream_spark.functions.strings import similar_to_regex

        with _pytest.raises(ValueError, match="escape"):
            similar_to_regex("a", escape="!!")
        with _pytest.raises(ValueError, match="ends with"):
            similar_to_regex("a!", escape="!")
        with _pytest.raises(ValueError, match="unterminated"):
            similar_to_regex("[abc")

    def test_column_form_matches_python_reference(self, spark, sf_dir):
        import re

        from pgstream_spark.functions.strings import (
            similar_to,
            similar_to_regex,
        )
        from pgstream_spark.sources.parquet import load_table

        c = load_table(spark, sf_dir, "customer")
        pat = "Customer#%(1|2)[0-9]"
        got = {
            r.c_name
            for r in c.filter(similar_to("c_name", pat)).collect()
        }
        rx = re.compile(similar_to_regex(pat))
        want = {
            r.c_name for r in c.collect() if rx.match(r.c_name)
        }
        assert got == want and len(got) > 0

    def test_bracket_class_edge_forms(self):
        import re

        import pytest as _pytest

        from pgstream_spark.functions.strings import similar_to_regex

        # POSIX literal-] as the first class member
        rx = similar_to_regex("[]a]x")
        assert re.match(rx, "]x") and re.match(rx, "ax")
        rx = similar_to_regex("[^]a]x")
        assert re.match(rx, "bx") and not re.match(rx, "]x")
        # POSIX bracket expressions: Java and RE2 disagree — refused
        with _pytest.raises(ValueError, match="bracket"):
            similar_to_regex("x[[:digit:]]")
