"""Schema discipline: declared-type assertion and NULL validation.

The reference validates each column's wire OID against the declared Haskell
type on row 0 (`/root/reference/src/Database/PostgreSQL/Stream/FromRow.hs:109-118,459-461`)
and throws ``ConversionError`` when a NULL reaches a non-``Maybe`` field
(`FromRow.hs:296-303`).  Spark does not enforce nullability on read, so the
engine makes both checks explicit operators:

* ``assert_schema(df, expected)``  — A-11: structural check, with the
  reference's int-widening allowance (`FromRow.hs:143`: int8 accepts
  int2/int4 wire types) mapped to Spark's numeric-widening chain.
* ``assert_non_null(df, cols)``    — A-12: distributed NULL scan that
  raises ``UnexpectedNull`` with an offending-row count.  One job, all
  columns at once — no per-column pass.

Both checks are O(scan) on executors with only a tiny aggregate collected,
so they hold at 100 TB (the NULL check is a map-side ``sum(isnull)``
aggregation — no shuffle beyond the final single-row reduce).
"""

from __future__ import annotations

from typing import Iterable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pgstream_spark.errors import Incompatible, UnexpectedNull

__all__ = ["assert_schema", "assert_non_null", "widens_to"]

# Widening chain, mirroring the reference's "int8 accepts int2/int4 OIDs"
# rule (`FromRow.hs:142-146`) extended along Spark's numeric lattice.
_WIDENING: dict[str, tuple[str, ...]] = {
    "smallint": (),
    "int": ("smallint",),
    "bigint": ("smallint", "int"),
    "float": ("smallint", "int"),
    "double": ("smallint", "int", "bigint", "float"),
}


def _as_datatype(dtype: T.DataType | str) -> T.DataType:
    """Accept a DataType or a DDL type string ("int", "decimal(19,2)")."""
    if isinstance(dtype, T.DataType):
        return dtype
    return T.DataType.fromDDL(dtype)


def widens_to(actual: T.DataType, declared: T.DataType | str) -> bool:
    """True if ``actual`` may be implicitly widened to ``declared``."""
    declared = _as_datatype(declared)
    if actual == declared:
        return True
    allowed = _WIDENING.get(declared.simpleString(), ())
    return actual.simpleString() in allowed


def assert_schema(df: DataFrame, expected: T.StructType | Mapping[str, T.DataType | str]) -> DataFrame:
    """Check ``df``'s schema against a declared one; raise ``Incompatible``
    on arity, name, or (widening-aware) type mismatch.

    Equivalent of the reference's first-row ``checkTy`` (`FromRow.hs:459-461`)
    — but statically, before execution, which Spark's analyzed schema allows.
    """
    if isinstance(expected, T.StructType):
        pairs = [(f.name, f.dataType) for f in expected.fields]
    else:
        pairs = [(name, _as_datatype(dtype)) for name, dtype in expected.items()]

    actual = df.schema.fields
    if len(actual) != len(pairs):
        raise Incompatible(
            f"declared {len(pairs)} column(s), result has {len(actual)}"
        )
    for field, (name, dtype) in zip(actual, pairs):
        if field.name != name:
            raise Incompatible(f"column {field.name!r} declared as {name!r}")
        if not widens_to(field.dataType, dtype):
            raise Incompatible(
                f"column {name!r}: result type {field.dataType.simpleString()} "
                f"incompatible with declared {dtype.simpleString()}"
            )
    return df


def assert_non_null(df: DataFrame, columns: Iterable[str]) -> DataFrame:
    """Raise ``UnexpectedNull`` if any listed column contains NULL.

    Single aggregation job over all columns (map-side partial aggregates,
    one-row result to the driver).  Returns ``df`` unchanged on success so
    it composes as a pipeline stage.
    """
    cols = list(columns)
    if not cols:
        return df
    counts = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    ).first()
    for c in cols:
        n = counts[c] or 0
        if n > 0:
            raise UnexpectedNull(c, n)
    return df
