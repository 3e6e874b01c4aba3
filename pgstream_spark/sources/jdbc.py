"""Postgres JDBC source — the live-database edge (SURVEY §2 S-2).

The reference's whole reason to exist is pulling binary result sets out of
Postgres (`/root/reference/src/Database/PostgreSQL/Stream.hs:97`).  The
binary wire protocol is Postgres-internal; Spark's idiomatic equivalent is
the JDBC source with **partitioned parallel reads** — each executor opens
its own connection and reads one key-range slice, which is what the
reference's connection pool + cursor batching approximated on one machine
(`Connection.hs:29-47`, `Stream.hs:244-284`).

No Postgres server exists in the test environment, so this module is the
thin, testable plan-construction layer: it builds the reader config; the
``.load()`` call is the only part that needs a live server.  For CDC-style
continuous ingest, pair a snapshot read with a Debezium→Kafka topic and
``spark.readStream.format("kafka")`` (T-1) — also server-side
infrastructure, also out of scope for the test env.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

__all__ = ["PostgresSource"]


@dataclass
class PostgresSource:
    """Partitioned JDBC read configuration.

    ``partition_column``/``num_partitions`` split the table into
    ``num_partitions`` key ranges read in parallel — size them so each
    slice is a few hundred MB; ``fetch_size`` is the row-batch size per
    round-trip (the reference's ``FETCH FORWARD n``, `Stream.hs:261`).
    """

    host: str
    database: str
    user: str
    password: str = ""
    port: int = 5432
    fetch_size: int = 50_000  # the reference example's batch size (Example.hs:74)

    @property
    def url(self) -> str:
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.database}"

    def reader(
        self,
        spark: SparkSession,
        table: str,
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        num_partitions: int = 8,
    ) -> DataFrameReader:
        """Build the configured (unexecuted) reader."""
        r = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .option("user", self.user)
            .option("password", self.password)
            .option("fetchsize", str(self.fetch_size))
        )
        if partition_column is not None:
            if lower_bound is None or upper_bound is None:
                raise ValueError("partitioned read needs lower_bound/upper_bound")
            r = (
                r.option("partitionColumn", partition_column)
                .option("lowerBound", str(lower_bound))
                .option("upperBound", str(upper_bound))
                .option("numPartitions", str(num_partitions))
            )
        return r

    def read(self, spark: SparkSession, table: str, **kw) -> DataFrame:
        """Execute the read (requires a live server)."""
        return self.reader(spark, table, **kw).load()
