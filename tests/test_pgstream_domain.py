"""Milestone-0 end-to-end slice (FIXTURES B.1): the reference's example
query domain — ``deltas ⋈ security_groupings ⋈ currentprice`` with a range
predicate inside the join, epoch window binding, a float array column, and
multi-key ordered LIMIT (`/root/reference/Example.hs:22-56`) — re-expressed
through the engine's templated query API and differentially checked
against DuckDB on the same parquet bytes."""

from __future__ import annotations

import datetime
import random

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def domain_dir(spark, tmp_path_factory):
    """Deterministic pgstream_domain tables (seed=42)."""
    base = tmp_path_factory.mktemp("pgstream_domain")
    rng = random.Random(42)
    day0 = datetime.datetime(2015, 3, 1)
    n_sids, n_days = 50, 30

    deltas, prices, groups = [], [], []
    for sid in range(n_sids):
        for g in rng.sample(["SP900", "SP500", "R2000"], rng.randint(1, 3)):
            groups.append((sid, g))
        for d in range(n_days):
            day = day0 + datetime.timedelta(days=d)
            ohlc = [rng.uniform(1, 1000) for _ in range(4)]
            if rng.random() < 0.02:
                ohlc[rng.randrange(4)] = None  # NULL inside the array (§1.2)
            deltas.append((sid, day, ohlc))
            prices.append((sid, day, rng.uniform(0, 600)))

    schema_d = T.StructType(
        [
            T.StructField("sid", T.IntegerType(), False),
            T.StructField("day", T.TimestampNTZType(), False),
            T.StructField("ohlcs", T.ArrayType(T.FloatType(), True), False),
        ]
    )
    spark.createDataFrame(deltas, schema_d).write.mode("overwrite").parquet(
        str(base / "deltas.parquet")
    )
    spark.createDataFrame(
        groups, "sid int, name string"
    ).write.mode("overwrite").parquet(str(base / "security_groupings.parquet"))
    spark.createDataFrame(
        prices, "sid int, day timestamp_ntz, val double"
    ).write.mode("overwrite").parquet(str(base / "currentprice.parquet"))
    return str(base)


CANONICAL = (
    "SELECT d.sid, d.day, d.ohlcs "
    "FROM deltas d "
    "JOIN security_groupings g ON d.sid = g.sid "
    "JOIN currentprice c ON d.sid = c.sid AND d.day = c.day "
    "              AND c.val BETWEEN 0 AND 500 "
    "WHERE g.name = {1} "
    "  AND d.day BETWEEN TIMESTAMP '2015-03-05' AND TIMESTAMP '2015-03-20' "
    "ORDER BY d.sid ASC, d.day ASC NULLS LAST "
    "{2}"
)


@pytest.fixture(scope="module")
def registered(engine, domain_dir):
    for t in ("deltas", "security_groupings", "currentprice"):
        engine.spark.read.parquet(f"{domain_dir}/{t}.parquet").createOrReplaceTempView(t)
    return engine


def test_canonical_query_matches_duckdb(registered, domain_dir):
    # the reference's exact query shape, {n}-bound like Example.hs:50-56
    # (group name as a value splice, LIMIT as an SQL-fragment splice)
    from pgstream_spark.querybuilder import SQL

    rows = registered.rows(CANONICAL, ("SP900", SQL("LIMIT 100000")))

    con = duckdb.connect()
    for t in ("deltas", "security_groupings", "currentprice"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{domain_dir}/{t}.parquet/*.parquet'"
        )
    oracle = con.execute(
        CANONICAL.replace("{1}", "'SP900'").replace("{2}", "LIMIT 100000")
    ).fetchall()

    assert len(rows) == len(oracle)
    assert len(rows) > 0
    for srow, orow in zip(rows, oracle):
        assert srow.sid == orow[0]
        assert srow.day == orow[1]
        a = [None if x is None else pytest.approx(x, rel=1e-6) for x in orow[2]]
        assert list(srow.ohlcs) == a


def test_array_null_compaction_on_domain(registered):
    # the C-kernel semantics (array_conversion.c:83-90): NULL elements
    # dropped, order preserved
    from pgstream_spark.functions.arrays import compact_array

    df = registered.spark.table("deltas").select(
        "sid", "day", compact_array(F.col("ohlcs")).alias("c"), F.col("ohlcs")
    )
    some_null = df.filter(F.size("c") < F.size("ohlcs"))
    assert some_null.count() > 0  # fixture planted NULL elements
    for r in some_null.limit(5).collect():
        assert list(r.c) == [x for x in r.ohlcs if x is not None]


def test_streamed_equals_batch_on_domain(registered):
    from pgstream_spark.querybuilder import SQL

    sql, args = CANONICAL, ("SP900", SQL("LIMIT 1000"))
    one_shot = registered.rows(sql, args)
    streamed = [r for b in registered.stream(sql, args, batch_size=100) for r in b]
    assert streamed == one_shot
