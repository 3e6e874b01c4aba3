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
