"""Delimited/JSONL file sources with explicit schemas and quarantine.

The reference reads exactly one source (a Postgres wire connection); a
pipeline engine also ingests files.  Two rules make file ingestion safe
at 100 TB, both enforced here:

* **Explicit schema, always.**  Schema inference is a full extra pass
  over the data (Spark reads everything once just to guess types) and
  non-deterministic under sampling — at scale it is both slow and a
  correctness hazard.  These helpers REQUIRE a schema string.
* **Quarantine, don't crash, don't silently drop.**  A malformed row in
  100 TB is a certainty.  PERMISSIVE mode + ``columnNameOfCorruptRecord``
  captures each bad line in a ``_corrupt`` column so the caller can
  route it to a quarantine sink and keep the job running — FAILFAST is
  for CI, DROPMALFORMED for nothing (silent loss).

Both readers are plain ``spark.read`` wrappers, so every downstream
optimization (column pruning, predicate pushdown into the parser,
partition-parallel splitting of large files) applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_jsonl", "read_csv", "split_corrupt"]

_CORRUPT = "_corrupt"


def _with_corrupt(schema: str) -> T.StructType:
    st = T.StructType.fromDDL(schema)
    return st.add(T.StructField(_CORRUPT, T.StringType(), True))


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read JSON-lines with a declared schema; malformed lines land in
    the ``_corrupt`` column (PERMISSIVE) instead of killing the job."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "PERMISSIVE",
    escape: str = '"',
) -> DataFrame:
    """Read CSV with a declared schema and corrupt-row quarantine.

    ``escape`` defaults to ``'"'`` — RFC 4180's doubled-quote escaping,
    the dialect every mainstream writer (DuckDB, pandas, Excel,
    Postgres COPY CSV) emits.  Spark's own default is backslash, under
    which an RFC file's ``"a""b"`` mis-parses; pass ``escape="\\\\"``
    for backslash-escaped input."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", mode)
        .option("escape", escape)
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .csv(path)
    )


def split_corrupt(
    df: DataFrame, cache: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): rows that parsed fully vs captured raw lines.
    Route the quarantine side to its own sink; never drop it silently.

    The quarantine side keeps the FULL row (any partially-parsed fields
    plus the raw line in ``_corrupt``).  The parsed frame is cached by
    default: Spark rejects any column-pruned query that reaches the raw
    file scan referencing only the corrupt column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN — e.g. ``quarantine.count()``),
    and caching the parse is the documented contract for it.  Pass
    ``cache=False`` only when both sides are written out once, full-row.
    """
    if cache:
        df = df.cache()
    clean = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.filter(F.col(_CORRUPT).isNotNull())
    return clean, bad
