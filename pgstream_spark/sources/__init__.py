"""Data sources: parquet test tables, JDBC (Postgres) edge, file streams."""

from pgstream_spark.sources.parquet import TABLES, load_tables, register_views

__all__ = ["TABLES", "load_tables", "register_views"]
