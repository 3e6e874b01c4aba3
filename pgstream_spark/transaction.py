"""Transaction bracket — SURVEY §2 A-17.

Maps the reference's transaction surface
(`/root/reference/src/Database/PostgreSQL/Stream.hs:166-231`):
``TransactionMode`` (isolation level × read/write mode), ``begin`` /
``commit`` / ``rollback``, and the ``withTransactionMode`` bracket that
rolls back on exception and commits on normal exit.

Spark has no server-side MVCC transaction on plain managed tables, so the
bracket implements **single-session snapshot-restore semantics**, stated
precisely:

* **Atomicity (session-scoped)**: before the FIRST write to any managed
  table inside the bracket, the table is snapshotted (CTAS copy-on-write).
  On exception every touched table is restored byte-for-byte and every
  table created inside the bracket is dropped; on normal exit snapshots
  are discarded.  Mid-statement crashes of the *process* are not covered —
  that is the job of a transactional table format's commit log, which
  plain Spark tables don't have.
* **Read-your-writes**: statements execute immediately, so queries inside
  the bracket observe earlier writes (≈ READ COMMITTED within the
  session).  The reference's stricter levels (REPEATABLE READ,
  SERIALIZABLE) are accepted and recorded but are no-ops here — there is
  no concurrent writer to isolate from in a single-session engine; they
  exist so reference code ports without edits.
* **ReadOnly mode**: write statements raise ``QueryError`` before
  executing — the useful half of ``READ ONLY`` enforcement.

At 100 TB, snapshot-by-copy is the wrong tool — there you'd run this
bracket against a table format with a transaction log and map
commit/rollback onto its snapshot API; the *surface* (this class) stays
the same, which is the point of shipping it.
"""

from __future__ import annotations

import re
import uuid
from contextlib import contextmanager
from enum import Enum
from typing import TYPE_CHECKING, Any, Iterator, Sequence

from pgstream_spark.errors import QueryError

if TYPE_CHECKING:  # pragma: no cover
    from pgstream_spark.engine import Engine

__all__ = [
    "IsolationLevel",
    "ReadWriteMode",
    "TransactionMode",
    "Transaction",
    "transaction",
]


class IsolationLevel(Enum):
    # Stream.hs:165-170
    DEFAULT = "DEFAULT"
    READ_COMMITTED = "READ COMMITTED"
    REPEATABLE_READ = "REPEATABLE READ"
    SERIALIZABLE = "SERIALIZABLE"


class ReadWriteMode(Enum):
    # Stream.hs:172-176
    DEFAULT = "DEFAULT"
    READ_WRITE = "READ WRITE"
    READ_ONLY = "READ ONLY"


class TransactionMode:
    """Stream.hs:178-181 — isolation level × read/write mode."""

    def __init__(
        self,
        isolation: IsolationLevel = IsolationLevel.DEFAULT,
        read_write: ReadWriteMode = ReadWriteMode.DEFAULT,
    ):
        self.isolation = isolation
        self.read_write = read_write

    def __repr__(self) -> str:  # pragma: no cover
        return f"TransactionMode({self.isolation.name}, {self.read_write.name})"


# (pattern, is_create): leading-keyword forms that WRITE a table.
_WRITE_PATTERNS: list[tuple[re.Pattern[str], bool]] = [
    (re.compile(r"^\s*INSERT\s+(?:INTO|OVERWRITE)\s+(?:TABLE\s+)?([\w.]+)", re.I), False),
    (re.compile(r"^\s*UPDATE\s+([\w.]+)", re.I), False),
    (re.compile(r"^\s*DELETE\s+FROM\s+([\w.]+)", re.I), False),
    (re.compile(r"^\s*MERGE\s+INTO\s+([\w.]+)", re.I), False),
    (re.compile(r"^\s*TRUNCATE\s+(?:TABLE\s+)?([\w.]+)", re.I), False),
    (re.compile(r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([\w.]+)", re.I), False),
    (re.compile(r"^\s*ALTER\s+TABLE\s+([\w.]+)", re.I), False),
    (
        re.compile(
            r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)",
            re.I,
        ),
        True,
    ),
]


def _write_target(sql: str) -> tuple[str, bool] | None:
    """(table, is_create) if ``sql`` writes a table, else None."""
    for pat, is_create in _WRITE_PATTERNS:
        m = pat.match(sql)
        if m:
            return m.group(1), is_create
    return None


class Transaction:
    """One open bracket: tracks snapshots and created tables."""

    def __init__(self, engine: "Engine", mode: TransactionMode):
        self.engine = engine
        self.mode = mode
        self._txn_id = uuid.uuid4().hex[:12]
        self._backups: dict[str, str] = {}  # table -> backup table
        self._created: set[str] = set()
        self._closed = False

    # -- statement surface (delegates read paths to the engine) ----------

    def query(self, sql: str, args: Any = None, **kw: Any):
        return self.engine.query(sql, args, **kw)

    def rows(self, sql: str, args: Any = None, **kw: Any):
        return self.engine.rows(sql, args, **kw)

    def execute(self, sql: str, args: Any = None) -> None:
        """Run a statement, snapshotting any table it is about to write."""
        if self._closed:
            raise QueryError("transaction is closed", sql)
        bound = self.engine.bind(sql, args)
        target = _write_target(bound)
        if target is not None:
            if self.mode.read_write is ReadWriteMode.READ_ONLY:
                raise QueryError(
                    "write statement in READ ONLY transaction", bound
                )
            table, is_create = target
            self._snapshot(table, is_create)
        self.engine.execute(bound)

    # -- snapshot bookkeeping --------------------------------------------

    def _snapshot(self, table: str, is_create: bool) -> None:
        if table in self._backups or table in self._created:
            return  # already protected by this bracket
        spark = self.engine.spark
        if spark.catalog.tableExists(table):
            backup = f"__txn_{self._txn_id}_{table.replace('.', '_')}"
            spark.sql(f"CREATE TABLE {backup} AS SELECT * FROM {table}")
            self._backups[table] = backup
        elif is_create:
            self._created.add(table)
        # write to a nonexistent, non-created table: let the statement
        # itself raise the engine's typed error

    def _commit(self) -> None:
        spark = self.engine.spark
        for backup in self._backups.values():
            spark.sql(f"DROP TABLE IF EXISTS {backup}")
        self._finish()

    def _rollback(self) -> None:
        spark = self.engine.spark
        for table, backup in self._backups.items():
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            spark.sql(f"ALTER TABLE {backup} RENAME TO {table}")
        for table in self._created:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        self._finish()

    def _finish(self) -> None:
        self._closed = True
        self._backups.clear()
        self._created.clear()


@contextmanager
def transaction(
    engine: "Engine", mode: TransactionMode | None = None
) -> Iterator[Transaction]:
    """``withTransactionMode`` (Stream.hs:225-231): rollback on exception,
    commit on normal exit."""
    txn = Transaction(engine, mode or TransactionMode())
    try:
        yield txn
    except BaseException:
        txn._rollback()
        raise
    txn._commit()
