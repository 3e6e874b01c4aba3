"""Typed error surface.

Mirrors the reference's exception hierarchy
(`/root/reference/src/Database/PostgreSQL/Stream/Types.hs:77-90`):

* ``QueryError``      — execution failure, carries the SQL text
  (raised at `Stream.hs:151-160`).
* ``ConversionError`` — decode / conversion failure
  (`FromRow.hs:480-500`), with two refinements the reference raises
  through the same constructor:

  * ``UnexpectedNull`` — NULL arrived in a non-nullable field
    (`FromRow.hs:296-303`: only ``Maybe a`` tolerates NULL).
  * ``Incompatible``   — wire type does not match the declared type
    (`FromRow.hs:109-118` ``checkTy``).

Spark raises ``AnalysisException`` / ``PySparkException`` internally; the
engine wraps those in this hierarchy so callers get the same typed contract
the reference gave its users.
"""

from __future__ import annotations


class PgStreamError(Exception):
    """Base class for all engine errors."""


class QueryError(PgStreamError):
    """A query failed to parse, analyze, or execute.

    Carries the offending SQL like the reference's ``QueryError ByteString
    Query`` (`Types.hs:80-82`).
    """

    def __init__(self, message: str, query: str | None = None):
        self.query = query
        if query is not None:
            message = f"{message}\n  query: {query}"
        super().__init__(message)


class ConversionError(PgStreamError):
    """A value could not be converted to the declared type."""


class UnexpectedNull(ConversionError):
    """NULL encountered in a column declared non-nullable (A-12)."""

    def __init__(self, column: str, null_count: int = 1):
        self.column = column
        self.null_count = null_count
        super().__init__(
            f"unexpected NULL in non-nullable column {column!r} "
            f"({null_count} offending row(s))"
        )


class Incompatible(ConversionError):
    """Result schema does not match the declared schema (A-11)."""

    def __init__(self, message: str):
        super().__init__(message)
