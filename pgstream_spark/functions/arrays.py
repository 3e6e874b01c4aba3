"""Array-cell functions — the Spark analogue of the reference's C kernels.

The reference ships hand-written C to turn Postgres varlena arrays into
packed numeric vectors, silently dropping NULL elements
(`/root/reference/cbits/array_conversion.c:68-149`: the −1 length marker is
skipped and the output compacted, `:83-90,112-117`).  Spark arrays keep
NULLs, so ``compact_array`` reproduces the kernel semantics explicitly;
the arithmetic helpers stay in whole-stage codegen via higher-order
functions — no JNI, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["compact_array", "array_dot", "array_mean"]


def compact_array(arr: Column) -> Column:
    """Drop NULL elements, preserving order — the C-kernel null-compaction
    semantics (`array_conversion.c:83-90`)."""
    return F.filter(arr, lambda x: x.isNotNull())


def array_dot(a: Column, b: Column) -> Column:
    """Elementwise dot product folded in DOUBLE (kernel-grade math without
    leaving the JVM)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def array_mean(arr: Column) -> Column:
    """Mean of non-NULL elements; NULL for empty/all-NULL arrays."""
    clean = compact_array(arr)
    return F.when(
        F.size(clean) > 0,
        F.aggregate(clean, F.lit(0.0), lambda a, x: a + x.cast("double"))
        / F.size(clean),
    )
