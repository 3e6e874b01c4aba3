"""Parquet table catalog.

The reference's "source" is a live Postgres connection; the Spark-native
equivalent for bounded analytics is columnar files read by the vectorized
Parquet reader (predicate pushdown + column pruning come free from
Catalyst; check ``PushedFilters`` / ``ReadSchema`` in ``df.explain``).

At 100 TB these tables would be directories of many files, possibly
partitioned by date — the API below takes a directory and a table name, so
``{dir}/{name}.parquet`` may be a single file (testdata) or a
hive-partitioned tree (production) with zero code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Parquet TIMESTAMP(NANOS) (the `events.ts` column) is unreadable by Spark's
# converter; this legacy conf surfaces it as a raw nanosecond LongType.
_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"

# Timezone-proof ns-epoch → TIMESTAMP_NTZ (microsecond truncation, matching
# what DuckDB hands Python for TIMESTAMP_NS).  Deliberately avoids any
# instant/NTZ cast so the result is identical under ANY session timezone —
# the oracle harness may run with a different tz than ours.
_NS_TO_NTZ = (
    "timestampadd(MICROSECOND, ({c} DIV 1000) % 86400000000, "
    "CAST(date_add(DATE'1970-01-01', "
    "CAST(({c} DIV 1000) DIV 86400000000 AS INT)) AS TIMESTAMP_NTZ))"
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; ``events.ts`` is normalized to TIMESTAMP_NTZ."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load ``events`` with its ns-precision ``ts`` as TIMESTAMP_NTZ (µs)."""
    spark.conf.set(_NANOS_CONF, "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr(_NS_TO_NTZ.format(c="ts")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table present under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` sees the same
    names the DuckDB oracle uses."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
