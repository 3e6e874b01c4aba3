"""Corpus snapshot diff — dataset-version auditing.

A training corpus is rebuilt continuously (new crawls in, takedowns out,
cleaning rules change); every release needs an auditable answer to "what
changed since the last snapshot?".  ``corpus_diff`` computes the per-doc
status between two versions: ``added`` / ``removed`` / ``modified`` /
``unchanged``.

Spark-first shape: content equality is compared through a single md5 of
the concatenated content columns (computed map-side on each snapshot —
the full-outer join then carries one 32-char digest per row instead of
the document body), and the diff itself is ONE full-outer shuffle join
on the doc key.  With both snapshots bucketed by the key (`sinks.py`)
the exchange disappears entirely — the natural layout for a corpus that
diffs every release.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corpus_diff"]


def corpus_diff(
    v1: DataFrame,
    v2: DataFrame,
    id_col: str = "doc_id",
    content_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document status between snapshot ``v1`` (old) and ``v2`` (new).

    Returns ``(id_col, status)`` with status in
    ``added | removed | modified | unchanged``.  ``content_cols`` default
    to every shared non-key column; values are null-marked before
    hashing so (NULL, 'x') never collides with ('x', NULL).
    """
    if content_cols is None:
        shared = [c for c in v1.columns if c in set(v2.columns) and c != id_col]
        content_cols = shared
    if not content_cols:
        raise ValueError("corpus_diff needs at least one content column")

    def digest(df: DataFrame, side: str) -> DataFrame:
        h = F.md5(
            F.concat_ws(
                "\x1f",
                *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in content_cols],
            )
        )
        return df.select(F.col(id_col).alias(f"__id_{side}"), h.alias(f"__h_{side}"))

    a = digest(v1, "a")
    b = digest(v2, "b")
    joined = a.join(b, a["__id_a"] == b["__id_b"], "full_outer")
    status = (
        F.when(F.col("__id_a").isNull(), F.lit("added"))
        .when(F.col("__id_b").isNull(), F.lit("removed"))
        .when(F.col("__h_a") != F.col("__h_b"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.coalesce(F.col("__id_a"), F.col("__id_b")).alias(id_col),
        status.alias("status"),
    )
