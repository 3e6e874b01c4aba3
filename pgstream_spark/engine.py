"""Engine: the session + typed query API.

Maps the reference's library surface one-for-one
(`/root/reference/src/Database/PostgreSQL/Stream.hs`):

| reference                              | here                               |
|----------------------------------------|------------------------------------|
| ``connect`` (`Connection.hs:56-71`)    | ``connect()`` → ``Engine``         |
| ``query conn q args`` (`Stream.hs:92`) | ``Engine.query(sql, args)``        |
| ``execute`` (`Stream.hs:122-145`)      | ``Engine.execute(sql, args)``      |
| ``stream`` (`Stream.hs:244-284`)       | ``Engine.stream(sql, args, n)``    |
| connection pool (`Connection.hs:29-47`)| one shared ``SparkSession``        |
| ``printSQL`` (`Stream.hs:286-288`)     | ``Engine.explain(sql, args)``      |

Design notes for scale:

* ``query`` returns a **DataFrame** (lazy logical plan) — ``.rows()`` /
  ``collect()`` is the explicit materialization point, like the reference's
  eager ``IO [r]`` boundary.  Nothing is collected implicitly.
* ``stream`` delivers batches of ≤ ``batch_size`` rows through
  ``toLocalIterator`` — the Spark analogue of the reference's
  ``DECLARE … NO SCROLL CURSOR`` + ``FETCH FORWARD n`` loop
  (`Stream.hs:256-277`): demand-driven, bounded memory on the driver,
  partitions fetched one at a time.
* AQE, shuffle-partition sizing and session timezone are set at build time;
  tests and 100 TB clusters share this code path with different masters.
"""

from __future__ import annotations

from typing import Any, Iterator, Mapping, Sequence

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

from pgstream_spark.errors import ConversionError, QueryError
from pgstream_spark.querybuilder import format_query
from pgstream_spark.schema import assert_non_null, assert_schema
from pgstream_spark.sources.parquet import register_views

# Optimizer rules the engine excludes session-wide (rationale at the
# connect() config site); user extra_conf lists are merged with this.
_EXCLUDED_RULES = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def _merge_excluded_rules(user_rules: str | None) -> str:
    """Merge a user-supplied ``spark.sql.optimizer.excludedRules`` list
    with the engine's, deduplicated, engine rules first.  An explicit
    empty string opts out of the engine exclusions entirely (the
    stored-array-explode escape hatch, ADVICE r11)."""
    if user_rules is not None and user_rules.strip() == "":
        return ""
    merged = [
        r.strip()
        for r in (_EXCLUDED_RULES + "," + (user_rules or "")).split(",")
        if r.strip()
    ]
    return ",".join(dict.fromkeys(merged))

__all__ = ["Engine", "connect"]

# Spark error classes that correspond to the reference's ConversionError
# (a VALUE failed to decode/convert) rather than a query-level failure.
_CONVERSION_MARKERS = (
    "CAST_INVALID_INPUT",
    "CAST_OVERFLOW",
    "NUMERIC_VALUE_OUT_OF_RANGE",
    "ARITHMETIC_OVERFLOW",
    "CANNOT_PARSE",
    "INVALID_FRACTION_OF_SECOND",
    "DATETIME_OVERFLOW",
)


def _wrap_runtime_error(exc: Exception, sql: str) -> Exception:
    if isinstance(exc, (QueryError, ConversionError)):
        return exc
    msg = str(exc)
    first_line = msg.splitlines()[0] if msg else type(exc).__name__
    if any(m in msg for m in _CONVERSION_MARKERS):
        return ConversionError(first_line)
    return QueryError(first_line, sql)


class Engine:
    """A connected engine: SparkSession + registered catalog."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    # -- query path (reference Stream.hs:92-115) ---------------------------

    def bind(self, sql: str, args: Sequence[Any] | Mapping[str, Any] | None = None) -> str:
        """Render a ``{n}``/named-hole template to final SQL text."""
        return format_query(sql, args)

    def query(
        self,
        sql: str,
        args: Sequence[Any] | Mapping[str, Any] | None = None,
        schema: T.StructType | Mapping[str, T.DataType] | None = None,
        non_null: Sequence[str] | None = None,
    ) -> DataFrame:
        """Execute a templated query; return the (lazy) DataFrame.

        ``schema`` adds the reference's declared-type check (A-11);
        ``non_null`` adds the NULL-discipline check (A-12).  Analysis errors
        are wrapped in ``QueryError`` carrying the bound SQL, like the
        reference's error envelope (`Stream.hs:151-160`).
        """
        bound = self.bind(sql, args)
        try:
            df = self.spark.sql(bound)
        except Exception as exc:  # AnalysisException, ParseException, ...
            raise QueryError(str(exc), bound) from exc
        if schema is not None:
            assert_schema(df, schema)
        if non_null:
            assert_non_null(df, non_null)
        return df

    def rows(self, sql: str, args: Any = None, **kw: Any) -> list[Row]:
        """Eager variant — the reference's ``query :: … -> IO [r]``.

        Runtime failures keep the typed envelope too (A-20): value-level
        cast/overflow errors (ANSI mode) surface as ``ConversionError`` —
        the reference's decode-failure class — and anything else as
        ``QueryError`` carrying the SQL.
        """
        df = self.query(sql, args, **kw)
        try:
            return df.collect()
        except Exception as exc:
            raise _wrap_runtime_error(exc, self.bind(sql, args)) from exc

    # -- execute path (reference Stream.hs:122-145) ------------------------

    def execute(self, sql: str, args: Any = None) -> None:
        """Run DDL/DML for effect; no result rows (A-2)."""
        bound = self.bind(sql, args)
        try:
            self.spark.sql(bound).collect()
        except Exception as exc:
            raise QueryError(str(exc), bound) from exc

    # -- streaming delivery (reference Stream.hs:244-284) -------------------

    def stream(
        self,
        sql: str,
        args: Any = None,
        batch_size: int = 50_000,
    ) -> Iterator[list[Row]]:
        """Yield the result as batches of ≤ ``batch_size`` rows.

        Equivalent of the reference's cursor loop: each yielded batch
        corresponds to one ``FETCH FORWARD n`` (`Stream.hs:261,272-277`;
        the example uses 50,000 — `Example.hs:74`).  ``toLocalIterator``
        pulls one partition at a time, so driver memory is bounded by
        ``max(partition size)`` regardless of total result size, and
        executors compute partitions ahead of consumption
        (``prefetchPartitions`` ≈ the reference's bounded-channel pipeline,
        `Parallel.hs:23`).
        """
        df = self.query(sql, args)
        batch: list[Row] = []
        try:
            for row in df.toLocalIterator(prefetchPartitions=True):
                batch.append(row)
                if len(batch) >= batch_size:
                    yield batch
                    batch = []
        except Exception as exc:
            # abort the whole stream atomically, typed — the analogue of
            # the reference's rollback-on-error (Stream.hs:263-270)
            raise _wrap_runtime_error(exc, self.bind(sql, args)) from exc
        if batch:
            yield batch

    def stream_pg(
        self,
        settings: Any,
        sql: str,
        args: Any = None,
        batch_size: int = 50_000,
    ) -> "Iterator[list[tuple]]":
        """Stream a LIVE Postgres query in cursor batches — the
        reference's ``stream conn q args n`` verbatim (`Stream.hs:249-277`):
        ``{n}``-bound SQL, DECLARE NO SCROLL CURSOR inside a transaction,
        one yielded batch per FETCH FORWARD, commit on success, rollback
        on error.  ``settings`` is a ``sources.pgwire.ConnSettings``; the
        connection lives exactly as long as the stream.

        This is the pure-wire path (no JDBC jar, rows land driver-side) —
        for bulk extraction into a DataFrame use
        ``sources.pgwire.read_partitioned``, which opens per-task
        connections instead.
        """
        from pgstream_spark.querybuilder import format_query
        from pgstream_spark.sources.pgwire import PgWireClient

        bound = format_query(sql, args, dialect="postgres")
        with PgWireClient(settings) as client:
            for _fields, rows in client.stream_query(bound, batch_size=batch_size):
                yield rows

    def write_pg(
        self,
        df: "DataFrame",
        settings: Any,
        table: str,
        via_copy: bool = True,
        batch_rows: int = 500,
    ) -> int:
        """Write a DataFrame into a LIVE Postgres table — the sink
        symmetric to :meth:`stream_pg`'s source edge, delegating to
        ``sources.pgwire.write_partitioned`` (one wire connection per
        Spark partition).  ``via_copy`` (default) streams COPY text
        framing — the canonical bulk path; set False for portable
        multi-row INSERT batches of ``batch_rows``.  Returns rows
        written.
        """
        from pgstream_spark.sources.pgwire import write_partitioned

        return write_partitioned(
            df, settings, table, batch_rows=batch_rows, via_copy=via_copy
        )

    # -- transactions (reference Stream.hs:166-231) -------------------------

    def transaction(self, mode: "TransactionMode | None" = None):
        """``withTransactionMode`` bracket: snapshot-restore semantics on
        managed tables — rollback on exception, commit on normal exit.
        See ``pgstream_spark.transaction`` for the precise guarantees.
        """
        from pgstream_spark.transaction import transaction

        return transaction(self, mode)

    # -- debug (reference Stream.hs:286-288) --------------------------------

    def explain(self, sql: str, args: Any = None, mode: str = "formatted") -> str:
        """Physical-plan text for a bound query (the engine's ``printSQL``)."""
        from pgstream_spark.plans.explain import explain_string

        return explain_string(self.query(sql, args), mode)


def connect(
    master: str = "local[*]",
    app_name: str = "pgstream_spark",
    sf_dir: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: Mapping[str, str] | None = None,
) -> Engine:
    """Build a SparkSession with scale-appropriate defaults and register the
    catalog (the reference's ``connect``, `Connection.hs:56-71`).

    Defaults chosen for correctness-at-scale:
    * AQE on (runtime coalescing, skew-join splitting),
    * UTC session timezone (oracle parity, and the only sane 100 TB choice),
    * Arrow enabled for the pandas_udf kernel path.
    """
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # TIME (time-of-day) is feature-flagged in Spark 4.1; the
        # reference decodes Postgres time/timetz (FromRow.hs:244-278),
        # so the engine turns it on.
        .config("spark.sql.timeType.enabled", "true")
        # InferFiltersFromGenerate adds size(x)>0/isnotnull(x) above
        # every explode; predicate pushdown then substitutes the alias,
        # re-evaluating an EXPENSIVE generator child (tokenize+shingle
        # pipelines here) 2 extra times per row, below the repartition
        # that was spreading it.  The filters are redundant for explode
        # (it already emits nothing for null/empty arrays), so results
        # are identical with the rule off — and the win grows with
        # corpus size (measured: l11 9.7 s -> 2.2 s at sf0.1).
        # Scale-independent, so not parameterised.  Tradeoff (ADVICE
        # r11): for a STORED-array explode the inferred filters could
        # enable scan pruning — a caller who wants them back passes
        # spark.sql.optimizer.excludedRules="" (or their own list) in
        # extra_conf; user lists are MERGED with this rule below, never
        # silently clobbered in either direction.
        .config("spark.sql.optimizer.excludedRules", _EXCLUDED_RULES)
        # ANSI stays at Spark's default (true in 4.x): closest to the
        # Postgres semantics the reference delegated to — overflow and bad
        # casts error instead of silently wrapping/nulling.
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    extra = dict(extra_conf or {})
    # ADVICE r11 (engine.py:268): a user-supplied excludedRules list used
    # to replace the engine's (or vice versa, by dict order).  Merge the
    # two, deduplicated, preserving engine-rule-first order.  An explicit
    # EMPTY string opts out of the engine exclusion entirely.
    if "spark.sql.optimizer.excludedRules" in extra:
        builder = builder.config(
            "spark.sql.optimizer.excludedRules",
            _merge_excluded_rules(
                extra.pop("spark.sql.optimizer.excludedRules")
            ),
        )
    for k, v in extra.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if sf_dir:
        register_views(spark, sf_dir)
    return Engine(spark)
