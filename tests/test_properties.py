"""Property-based tests (SURVEY §5.2-4): templating/binding never alters
semantics; array null-compaction matches the reference kernel; money
cents round-trip exactly."""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pgstream_spark.querybuilder import format_query, render_literal

SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
)


@given(value=scalars)
@settings(**SETTINGS)
def test_literal_roundtrip_through_spark(engine, value):
    """render_literal(v) parsed by Spark SQL yields v back (P-9: binding
    is semantics-preserving)."""
    got = engine.rows("SELECT {1} AS v", (value,))[0].v
    if isinstance(value, float):
        assert got == pytest.approx(value, rel=1e-15)
    else:
        assert got == value


@given(
    a=st.integers(min_value=-1000, max_value=1000),
    b=st.text(max_size=20),
)
@settings(**SETTINGS)
def test_positional_substitution_is_order_correct(a, b):
    out = format_query("x={1} y={2} x2={1}", (a, b))
    assert out == f"x={a} y={render_literal(b)} x2={a}"


@given(
    cents=st.lists(
        st.integers(min_value=-(10**15), max_value=10**15), min_size=1, max_size=50
    )
)
@settings(**SETTINGS)
def test_money_sum_exact(spark, cents):
    """DECIMAL money sums equal exact integer-cent arithmetic (F-11)."""
    from pgstream_spark.functions.money import cents_to_money

    df = spark.createDataFrame([(c,) for c in cents], "cents long")
    total = (
        df.select(cents_to_money(F.col("cents")).alias("m"))
        .agg(F.sum("m").alias("s"))
        .first()
        .s
    )
    assert total == sum(Decimal(c) for c in cents) / 100


@given(
    arr=st.lists(
        st.one_of(st.none(), st.integers(min_value=-(2**31), max_value=2**31 - 1)),
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_null_compaction_matches_python(spark, arr):
    """compact_array == the C kernel's skip-NULL-and-compact semantics
    (array_conversion.c:83-90) for arbitrary arrays."""
    from pgstream_spark.functions.arrays import compact_array

    df = spark.createDataFrame([(arr,)], "a array<int>")
    got = df.select(compact_array(F.col("a")).alias("c")).first().c
    assert got == [x for x in arr if x is not None]
