"""`spark.read.format("pgwire")` — the wire client as a native Spark 4
Python DataSource.

`sources/pgwire.py` already implements partitioned reads as a
``mapInPandas`` helper; this module lifts the same machinery into
Spark's public DataSource V2 extension point (``pyspark.sql.datasource``,
Spark 4), so the live-Postgres edge composes like any built-in format:

    spark.dataSource.register(PgWireDataSource)
    df = (spark.read.format("pgwire")
          .option("host", h).option("port", p)
          .option("dbname", db).option("user", u)
          .option("table", "deltas")
          .option("partition_column", "sid")
          .option("lower_bound", 0).option("upper_bound", 100000)
          .option("num_partitions", 16)
          .load())

Planner integration the helper can't offer:

* **schema from the catalog probe** — a LIMIT 0 round-trip maps
  RowDescription OIDs to Spark types at plan time;
* **one InputPartition per key slice** — Spark schedules the slices as
  ordinary tasks (speculation, retries, locality all apply), each task
  opening its own wire connection exactly like `read_partitioned`;
* **filter pushdown** (``pushFilters``) — supported comparison/equality
  filters are rendered into the slice WHERE clause server-side, so the
  wire carries only surviving rows; unsupported filters are returned to
  Spark for post-scan evaluation.

Slicing follows Spark-JDBC semantics: first slice unbounded below, last
unbounded above — rows outside the stated bounds are never lost.

Filter pushdown requires ``spark.sql.python.filterPushdown.enabled=true``
(Spark refuses a pushFilters-implementing reader otherwise — set it or
drop the filters; the read itself works either way).
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from pgstream_spark.sources.pgwire import (
    ConnSettings,
    PgWireClient,
    pooled_connection,
    _OID_DECODE,
    _pg_literal,
)

def _conn_settings(o: dict) -> ConnSettings:
    """Options dict → ConnSettings, including the TLS knobs (sslmode /
    sslrootcert) so ``format("pgwire")`` reaches secured servers."""
    return ConnSettings(
        host=o.get("host", "127.0.0.1"),
        dbname=o.get("dbname", ""),
        user=o.get("user", ""),
        password=o.get("password"),
        port=int(o.get("port", 5432)),
        sslmode=o.get("sslmode", "disable"),
        sslrootcert=o.get("sslrootcert"),
    )


__all__ = ["PgWireDataSource"]


class _Slice(InputPartition):
    def __init__(self, lo: int | None, hi: int | None):
        self.lo = lo
        self.hi = hi


class _PgWireReader(DataSourceReader):
    def __init__(self, options: dict, schema_fields: list[tuple[str, int]]):
        self.options = options
        self.fields = schema_fields
        self.extra_where: list[str] = []

    def pushFilters(self, filters):  # noqa: N802 — Spark API name
        unsupported = []
        for f in filters:
            # public Filter dataclasses: EqualTo / GreaterThan / ... with
            # (attribute, value); render what maps to simple comparisons
            op = {
                "EqualTo": "=",
                "GreaterThan": ">",
                "GreaterThanOrEqual": ">=",
                "LessThan": "<",
                "LessThanOrEqual": "<=",
            }.get(type(f).__name__)
            col = getattr(f, "attribute", None)
            if op and col and len(col) == 1:
                try:
                    lit = _pg_literal(f.value)
                except Exception:
                    unsupported.append(f)
                    continue
                self.extra_where.append(f'"{col[0]}" {op} {lit}')
            else:
                unsupported.append(f)
        return iter(unsupported)

    def partitions(self) -> Sequence[InputPartition]:
        o = self.options
        n = int(o.get("num_partitions", 1))
        pcol = o.get("partition_column")
        if n <= 1 or not pcol:
            return [_Slice(None, None)]
        lo = int(o["lower_bound"])
        hi = int(o["upper_bound"])
        span = max(hi - lo, 1)
        step = span / n
        out: list[_Slice] = []
        for i in range(n):
            a = None if i == 0 else int(lo + round(i * step))
            b = None if i == n - 1 else int(lo + round((i + 1) * step))
            out.append(_Slice(a, b))
        return out

    def read(self, partition: _Slice) -> Iterator[tuple]:
        o = self.options
        settings = _conn_settings(o)
        pcol = o.get("partition_column")
        preds = list(self.extra_where)
        if pcol is not None:
            if partition.lo is not None:
                preds.append(f'"{pcol}" >= {partition.lo}')
            if partition.hi is not None:
                preds.append(f'"{pcol}" < {partition.hi}')
        where = f" WHERE {' AND '.join(preds)}" if preds else ""
        cols = o.get("columns", "*")
        sql = f"SELECT {cols} FROM {o['table']}{where}"
        with pooled_connection(settings) as c:
            _, rows = c.simple_query(sql)
        return iter(rows)


class PgWireDataSource(DataSource):
    """``format("pgwire")`` — partitioned live-Postgres reads over the
    pure-Python v3 wire client."""

    @classmethod
    def name(cls) -> str:
        return "pgwire"

    def schema(self) -> str:
        o = self.options
        settings = _conn_settings(o)
        cols = o.get("columns", "*")
        with pooled_connection(settings) as c:
            fields, _ = c.simple_query(f"SELECT {cols} FROM {o['table']} LIMIT 0")
        self._fields = fields
        return ", ".join(
            f"{name} {_OID_DECODE.get(oid, (str, 'string'))[1]}"
            for name, oid in fields
        )

    def reader(self, schema) -> _PgWireReader:
        return _PgWireReader(dict(self.options), getattr(self, "_fields", []))

    def simpleStreamReader(self, schema) -> "_PgWireStreamReader":  # noqa: N802
        return _PgWireStreamReader(dict(self.options))


class _PgWireStreamReader(SimpleDataSourceStreamReader):
    """``spark.readStream.format("pgwire")`` — offset-tracked micro-batch
    polling over the wire client: the Structured-Streaming form of the
    reference's continuous delivery loop (`/root/reference/src/Database/
    PostgreSQL/Stream.hs:244-284` streams one query through a server
    cursor; this streams the TABLE through time).

    Offset model: the high-water mark of a caller-named monotonically
    increasing ``cursor_column`` (a sequence/bigserial id).  Each
    ``read`` fetches rows with ``cursor > start`` (capped by
    ``max_rows_per_batch`` — the back-pressure knob, T-2) and returns the
    batch plus the new high-water mark; Spark checkpoints the offsets, so
    failure recovery replays a batch via ``readBetweenOffsets`` — which
    re-issues the SAME half-open range ``(start, end]`` and is therefore
    deterministic for the append-only tables this source is for.

    Exactly-once contract (T-3): requires the cursor column to be
    append-only and committed in order (rows with smaller cursor values
    must never become visible AFTER larger ones have been read — use an
    insert-ordered sequence, or poll with a lag barrier upstream).  That
    is the standard CDC-polling prerequisite, identical to what a
    timestamp-watermarked JDBC poller assumes.

    Scale: this driver-side reader is the LOW-RATE edge (dimension-table
    CDC, control streams).  The 100 TB ingest path remains log-based CDC
    (Debezium→Kafka) into `streaming/cdc.apply_changes`; this source
    exists so small live-Postgres deltas compose with it without a
    connector jar.
    """

    def __init__(self, options: dict):
        self.options = dict(options)
        if "cursor_column" not in self.options:
            raise ValueError(
                "pgwire streaming requires option 'cursor_column' — a "
                "monotonically increasing, append-only id column"
            )
        self.cursor = self.options["cursor_column"]
        cols = self.options.get("columns", "*").strip()
        if cols != "*":
            names = [c.strip().strip('"') for c in cols.split(",")]
            if self.cursor not in names:
                # read() locates the cursor in the returned field list to
                # advance the offset; a projection that drops it would fail
                # every micro-batch with an opaque ValueError — refuse now.
                raise ValueError(
                    f"pgwire streaming option 'columns' ({cols!r}) must "
                    f"include cursor_column {self.cursor!r} — the offset "
                    "high-water mark is computed from the returned rows"
                )
        cap = int(self.options.get("max_rows_per_batch", 0))
        self.max_rows = cap if cap > 0 else None

    def _client(self) -> PgWireClient:
        o = self.options
        return PgWireClient(_conn_settings(o))

    def initialOffset(self) -> dict:
        start = self.options.get("start_from", "earliest")
        if start == "earliest":
            return {"cursor": None}  # everything ever written
        if start == "latest":
            with self._client() as c:
                _, rows = c.simple_query(
                    f'SELECT max("{self.cursor}") AS m FROM {self.options["table"]}'
                )
            m = rows[0][0] if rows else None
            return {"cursor": int(m) if m is not None else None}
        return {"cursor": int(start)}

    def _select(self, start, end) -> str:
        preds = []
        if start is not None:
            preds.append(f'"{self.cursor}" > {int(start)}')
        if end is not None:
            preds.append(f'"{self.cursor}" <= {int(end)}')
        where = f" WHERE {' AND '.join(preds)}" if preds else ""
        cols = self.options.get("columns", "*")
        return f"SELECT {cols} FROM {self.options['table']}{where}"

    def read(self, start: dict):
        s = start.get("cursor")
        sql = self._select(s, None)
        if self.max_rows is not None:
            # ORDER BY is required only to make the cap a PREFIX of the
            # cursor order (so the skipped tail stays > the new offset)
            sql += f' ORDER BY "{self.cursor}" LIMIT {self.max_rows}'
        with self._client() as c:
            fields, rows = c.simple_query(sql)
        if not rows:
            return iter(()), {"cursor": s}
        cidx = [n for n, _ in fields].index(self.cursor)
        end = max(r[cidx] for r in rows)
        return iter(rows), {"cursor": int(end)}

    def readBetweenOffsets(self, start: dict, end: dict):
        s, e = start.get("cursor"), end.get("cursor")
        if e is None or s == e:
            return iter(())
        with self._client() as c:
            _, rows = c.simple_query(self._select(s, e))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # nothing to release: offsets live in Spark's checkpoint
