"""Type-matrix round-trip (FIXTURES B.2): one column per reference-
supported type (SURVEY §1.2 decode matrix), parquet↔Spark↔DuckDB schema
and value fidelity — the role the reference's `check_pg_typeoids` script
played (OID drift detection, `/root/reference/check_pg_typeoids:12-24`)."""

from __future__ import annotations

import datetime
import uuid
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def matrix_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("typematrix") / "m.parquet")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("c_int16", T.ShortType(), True),
            T.StructField("c_int32", T.IntegerType(), True),
            T.StructField("c_int64", T.LongType(), True),
            T.StructField("c_float", T.FloatType(), True),
            T.StructField("c_double", T.DoubleType(), True),
            T.StructField("c_decimal", T.DecimalType(38, 18), True),
            T.StructField("c_money", T.DecimalType(19, 2), True),
            T.StructField("c_uuid", T.StringType(), True),
            T.StructField("c_char", T.StringType(), True),
            T.StructField("c_text", T.StringType(), True),
            T.StructField("c_bytea", T.BinaryType(), True),
            T.StructField("c_bool", T.BooleanType(), True),
            T.StructField("c_date", T.DateType(), True),
            T.StructField("c_ts_ntz", T.TimestampNTZType(), True),
            # FromRow.hs:244-278 decode rows: timestamptz (instant),
            # time-of-day, and interval
            T.StructField("c_ts_tz", T.TimestampType(), True),
            T.StructField("c_time", T.TimeType(), True),
            T.StructField("c_interval", T.DayTimeIntervalType(), True),
            T.StructField("c_epoch_s", T.LongType(), True),
            T.StructField("c_arr_i32", T.ArrayType(T.IntegerType(), True), True),
            T.StructField("c_arr_f32", T.ArrayType(T.FloatType(), True), True),
            T.StructField("c_arr_f64", T.ArrayType(T.DoubleType(), True), True),
        ]
    )

    def row(i: int):
        if i % 10 == 0:  # 10% NULL everywhere except id
            return (i,) + (None,) * (len(schema.fields) - 1)
        return (
            i,
            i % 32000,
            i * 7,
            i * 10_000_000_000,
            float(i) / 8,
            float(i) / 16,
            Decimal(i) / Decimal(7),
            Decimal(i * 100 + i % 100) / 100,
            str(uuid.UUID(int=i)),
            chr(65 + i % 26),
            f"text-{i}",
            bytes([i % 256, (i * 3) % 256]),
            i % 2 == 0,
            datetime.date(2020, 1, 1) + datetime.timedelta(days=i % 1000),
            datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=i * 977),
            datetime.datetime(
                2024, 6, 1, tzinfo=datetime.timezone.utc
            ) + datetime.timedelta(seconds=i * 733, microseconds=i),
            datetime.time(i % 24, (i * 7) % 60, (i * 13) % 60, (i * 101) % 1_000_000),
            datetime.timedelta(days=i % 30, seconds=i % 86400, microseconds=i % 1000),
            1700000000 + i,
            [i, None, i + 2],
            [float(i), None, float(i) / 3],
            [float(i) * 1.5, float(i) / 7],
        )

    df = spark.createDataFrame([row(i) for i in range(1000)], schema)
    df.write.mode("overwrite").parquet(path)
    return path, schema


def test_schema_roundtrip(spark, matrix_path):
    path, schema = matrix_path
    back = spark.read.parquet(path)
    got = {f.name: f.dataType for f in back.schema.fields}
    for f in schema.fields:
        assert got[f.name] == f.dataType, f.name


def test_values_roundtrip(spark, matrix_path):
    path, schema = matrix_path
    back = spark.read.parquet(path).orderBy("id").collect()
    assert len(back) == 1000
    r1 = back[1]
    assert r1.c_int16 == 1 and r1.c_int64 == 10_000_000_000
    assert str(r1.c_money) == "1.01"
    assert r1.c_uuid == str(uuid.UUID(int=1))
    assert r1.c_arr_i32 == [1, None, 3]
    r0 = back[0]
    assert all(r0[c] is None for c in r0.asDict() if c != "id")


def test_duckdb_reads_identical_values(matrix_path, duck):
    path, _ = matrix_path
    n, s_text, money = duck.execute(
        f"SELECT count(*), min(c_text), max(c_money) FROM '{path}/*.parquet'"
    ).fetchone()
    assert n == 1000
    assert s_text == "text-1"
    assert str(money) == "999.99"


def test_money_semantics(spark, matrix_path):
    # F-11: cents-exact arithmetic over the money column
    path, _ = matrix_path
    df = spark.read.parquet(path)
    total = df.agg(F.sum("c_money").alias("s")).first().s
    py_total = sum(
        (Decimal(i * 100 + i % 100) / 100 for i in range(1000) if i % 10 != 0),
        Decimal(0),
    )
    assert total == py_total


def test_array_null_compaction(spark, matrix_path):
    from pgstream_spark.functions.arrays import compact_array

    path, _ = matrix_path
    df = spark.read.parquet(path).filter("id = 1")
    out = df.select(compact_array(F.col("c_arr_f32")).alias("c")).first()
    assert out.c == [1.0, pytest.approx(1 / 3)]


def test_temporal_types_roundtrip(spark, matrix_path):
    # FromRow.hs:244-278 — timestamptz (instant), time-of-day, interval
    path, _ = matrix_path
    back = spark.read.parquet(path).orderBy("id").collect()
    r3 = back[3]
    # collect() renders instants as NAIVE datetimes in the session tz
    # (UTC here), so the expected value is the naive UTC wall time
    assert r3.c_ts_tz == datetime.datetime(2024, 6, 1) + datetime.timedelta(
        seconds=3 * 733, microseconds=3
    )
    assert r3.c_time == datetime.time(3, 21, 39, 303)
    assert r3.c_interval == datetime.timedelta(days=3, seconds=3, microseconds=3)


def test_temporal_sql_functions(spark, matrix_path):
    path, _ = matrix_path
    df = spark.read.parquet(path)
    r = (
        df.filter("id = 3")
        .select(
            F.hour("c_time").alias("h"),
            F.minute("c_time").alias("m"),
            (F.col("c_ts_tz") + F.col("c_interval")).alias("shifted"),
        )
        .first()
    )
    assert (r.h, r.m) == (3, 21)
    assert r.shifted == (
        datetime.datetime(2024, 6, 1)
        + datetime.timedelta(seconds=3 * 733, microseconds=3)
        + datetime.timedelta(days=3, seconds=3, microseconds=3)
    )


def test_duckdb_reads_temporal_types(matrix_path, duck):
    # instant lands as UTC TIMESTAMP, TIME is native, interval surfaces as
    # raw BIGINT microseconds in DuckDB's parquet reader — all checkable
    path, _ = matrix_path
    ts, t, iv = duck.execute(
        f"SELECT c_ts_tz, c_time, c_interval FROM '{path}/*.parquet' WHERE id = 3"
    ).fetchone()
    assert ts == datetime.datetime(2024, 6, 1) + datetime.timedelta(
        seconds=3 * 733, microseconds=3
    )
    assert t == datetime.time(3, 21, 39, 303)
    expected = datetime.timedelta(days=3, seconds=3, microseconds=3)
    assert iv == int(expected.total_seconds() * 1_000_000)
