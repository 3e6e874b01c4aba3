"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship query (smoke check, sf0.001).
``queries``    — SURVEY.md §2 declared-operator inventory
                 (pgstream_spark.inventory).
``oracle_sql`` — DuckDB-equivalent SQL for every hash-checkable entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001.

    Mirrors the reference's example workload
    (`/root/reference/Example.hs:22-40`): multi-table inner join with a
    range predicate inside the join condition, epoch extraction, grouped
    aggregation and multi-key ordered limit — every [E]-evidence operator
    of SURVEY §2 in one statement.
    """
    sf_dir = "/root/testdata/sf0.001"
    from pgstream_spark.inventory import dsum
    from pgstream_spark.sources.parquet import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer),
            (F.col("o_custkey") == F.col("c_custkey"))
            & F.col("c_acctbal").between(0, 5000),
        )
        .filter(
            F.col("o_orderdate").between("1995-01-01", "1997-12-31")
            & (F.col("c_mktsegment") == "BUILDING")
        )
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.min(
                F.datediff(
                    F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
                ).cast("bigint")
                * 86400
            ).alias("first_epoch_s"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(100)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pgstream_spark.inventory import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column aliases)."""
    from pgstream_spark.inventory import ORACLE

    return dict(ORACLE)
