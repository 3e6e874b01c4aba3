"""Declarative data-quality expectations — the ingest QA gate.

A 100 TB pipeline cannot afford one scan per quality rule.  ``expect``
compiles a rule list into ONE conditional-aggregation pass over the
table (every rule a ``sum(case when violated)`` column — map-side
combinable, so the exchange carries one partial row per partition
however many rules are declared), plus at most one extra aggregate for
uniqueness rules (count vs count-distinct on the declared key) and one
broadcast anti-join per referential rule.  Output is a small report
frame ``(check, violations, total, passed)`` — the thing a pipeline
asserts on, publishes beside a shard manifest (l30), or trends for
drift.

Rules (each a plain tuple, so rule sets are data, not code):

* ``("not_null", col)`` — NULL values
* ``("in_range", col, lo, hi)`` — values outside ``[lo, hi]`` (NULLs
  don't violate; combine with not_null to forbid them)
* ``("matches", col, regex)`` — non-NULL values not fully matching
* ``("accepted", col, (v1, v2, …))`` — non-NULL values outside the set
* ``("unique", (col, …))`` — rows beyond the first per key (total −
  distinct)
* ``("ref", col, dim_df, dim_col)`` — orphaned foreign keys (broadcast
  anti-join; dimension side must be broadcast-sized)
* ``("check", name, sql_bool)`` — free-form row predicate (any SQL
  boolean over the row's columns, e.g. cross-column invariants like
  ``valid_to IS NULL OR valid_to > valid_from``); violation = predicate
  NOT satisfied (NULL counts as a violation — unproven is failed)

Every count is exact integer arithmetic, so the whole report is
oracle-checkable (`l43_expectations`).
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["expect", "expect_split"]


def _violation(rule: tuple) -> Column:
    kind = rule[0]
    if kind == "not_null":
        return F.col(rule[1]).isNull()
    if kind == "in_range":
        _, col, lo, hi = rule
        c = F.col(col)
        return c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
    if kind == "matches":
        _, col, regex = rule
        c = F.col(col)
        return c.isNotNull() & ~c.rlike(regex)
    if kind == "accepted":
        _, col, values = rule
        c = F.col(col)
        return c.isNotNull() & ~c.isin(list(values))
    if kind == "check":
        _, _name, sql_bool = rule
        # NOT-true (false or NULL): an unprovable invariant is a failure
        return ~F.coalesce(F.expr(sql_bool), F.lit(False))
    raise ValueError(f"unknown rowwise rule kind {kind!r}")


def _label(rule: tuple) -> str:
    kind = rule[0]
    if kind == "unique":
        cols = rule[1]
        key = ",".join([cols] if isinstance(cols, str) else list(cols))
        return f"unique({key})"
    if kind == "ref":
        return f"ref({rule[1]}->{rule[3]})"
    return f"{kind}({rule[1]})"  # for "check", rule[1] IS the name


def expect(df: DataFrame, rules: Sequence[tuple]) -> DataFrame:
    """Evaluate ``rules`` against ``df`` → ``(check, violations, total,
    passed)`` report, one row per rule.  See module docstring for the
    rule grammar and the scan economics.
    """
    spark = df.sparkSession
    rowwise = [r for r in rules if r[0] in ("not_null", "in_range", "matches", "accepted", "check")]
    uniques = [r for r in rules if r[0] == "unique"]
    refs = [r for r in rules if r[0] == "ref"]
    unknown = [r for r in rules if r[0] not in ("not_null", "in_range", "matches", "accepted", "check", "unique", "ref")]
    if unknown:
        raise ValueError(f"unknown rule kinds: {[r[0] for r in unknown]}")

    reports: list[DataFrame] = []

    if rowwise:
        aggs = [F.count(F.lit(1)).alias("__total")] + [
            F.sum(_violation(r).cast("bigint")).alias(f"__v{i}")
            for i, r in enumerate(rowwise)
        ]
        row = df.agg(*aggs)
        pairs = ", ".join(
            f"'{_label(r)}', CAST(coalesce(__v{i}, 0) AS BIGINT)"
            for i, r in enumerate(rowwise)
        )
        reports.append(
            row.select(
                F.expr(f"stack({len(rowwise)}, {pairs}) AS (check, violations)"),
                F.col("__total").alias("total"),
            ).select("check", "violations", "total")
        )

    for r in uniques:
        cols = [r[1]] if isinstance(r[1], str) else list(r[1])
        # uniqueness is judged over COMPLETE keys: count_distinct skips
        # any-NULL tuples, so the minuend must too — otherwise every
        # NULL-keyed row would count as a duplicate
        complete = F.count(
            F.when(
                reduce(lambda a, c: a & F.col(c).isNotNull(), cols, F.lit(True)),
                1,
            )
        )
        reports.append(
            df.agg(
                F.count(F.lit(1)).alias("total"),
                complete.alias("__c"),
                F.count_distinct(*[F.col(c) for c in cols]).alias("__d"),
            ).select(
                F.lit(_label(r)).alias("check"),
                (F.col("__c") - F.col("__d")).cast("bigint").alias("violations"),
                "total",
            )
        )

    for r in refs:
        _, col, dim, dim_col = r
        keys = F.broadcast(dim.select(F.col(dim_col).alias("__k")).distinct())
        orphans = df.join(
            keys, df[col] == F.col("__k"), "left_anti"
        ).filter(F.col(col).isNotNull())
        reports.append(
            df.agg(F.count(F.lit(1)).alias("total"))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("violations")))
            .select(
                F.lit(_label(r)).alias("check"),
                F.col("violations").cast("bigint").alias("violations"),
                "total",
            )
        )

    if not reports:
        return spark.createDataFrame(
            [], "check string, violations bigint, total bigint, passed boolean"
        )
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.withColumn("passed", F.col("violations") == 0)


def expect_split(
    df: DataFrame, rules: Sequence[tuple]
) -> tuple[DataFrame, DataFrame]:
    """Row-level enforcement of the row-wise rule subset: returns
    ``(clean, quarantined)`` where ``quarantined`` carries a
    ``_violations`` array naming every failed rule — the quarantine
    pattern `sources/text.py` applies to unparseable rows, extended to
    semantic rules.  One map-only pass, no shuffle; aggregate rules
    (unique/ref) don't identify rows and belong to :func:`expect`.
    """
    rowwise = [
        r
        for r in rules
        if r[0] in ("not_null", "in_range", "matches", "accepted", "check")
    ]
    other = [r for r in rules if r not in rowwise]
    if other:
        raise ValueError(
            f"expect_split handles row-wise rules only, got {[r[0] for r in other]}"
        )
    tags = F.array_compact(
        F.array(
            *[
                F.when(_violation(r), F.lit(_label(r)))
                for r in rowwise
            ]
        )
    )
    tagged = df.withColumn("_violations", tags)
    clean = tagged.filter(F.size("_violations") == 0).drop("_violations")
    quarantined = tagged.filter(F.size("_violations") > 0)
    return clean, quarantined
