"""Blocked fuzzy (edit-distance) join — approximate string matching at scale.

Entity resolution's workhorse: find record pairs whose names/addresses
differ by at most ``max_dist`` edits.  The naive form is an all-pairs
nested loop (|L|·|R| Levenshtein calls — 10^16 at 100 TB); the standard
fix is **blocking**: a cheap deterministic key (phonetic code, token,
prefix, LSH bucket) that any true match must share, turning the plan into
an equi-join on the block key with the expensive distance as a residual
filter on candidate pairs only.

Scale properties:

* the join is a plain hash/sort-merge equi-join on ``block`` — one
  shuffle per side, AQE-skew-splittable;
* cost is Σ_b |L_b|·|R_b| — *the block size bounds the quadratic term*.
  Choose keys whose blocks stay small (add more key columns to shrink
  them); a degenerate block (half the table sharing one key) is the skew
  to watch for, and `F.levenshtein`'s threshold form below keeps even
  that cheap per pair;
* Levenshtein runs JVM-side with the ``threshold`` early-exit: the DP
  band aborts once the distance provably exceeds ``max_dist``, so each
  candidate pair costs O(len·max_dist) instead of O(len²).

Recall is exactly the blocking key's recall: pairs that disagree on the
key are never compared (that is the point).  Use multiple passes with
different keys (union + dedup) when one key can miss true matches —
the same multi-probe discipline as `dedup.minhash_lsh_candidates`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_join"]


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_block: Column,
    right_block: Column,
    left_text: str,
    right_text: str,
    max_dist: int,
    dist_col: str = "edit_dist",
    probe_partitions: int | None = None,
) -> DataFrame:
    """Equi-join on the blocking key, keep pairs within ``max_dist``
    Levenshtein edits.  Returns left columns + right columns +
    ``dist_col``; callers disambiguate overlapping names upstream.

    The residual is CPU-bound, not byte-bound, so the probe side is
    explicitly repartitioned on the block key: when the small side
    broadcasts, the probe stage inherits the left SCAN's partitioning —
    a dimension-sized single-file input would otherwise run millions of
    Levenshtein calls in ONE task (and AQE's byte-based coalescing
    cannot see CPU cost, so it makes the same mistake after a shuffle).
    ``probe_partitions`` defaults to the session's default parallelism.
    """
    n_parts = probe_partitions or left.sparkSession.sparkContext.defaultParallelism
    # round-robin, NOT by block: block cardinality may be far below the
    # core count, and with a broadcast build side any left partitioning
    # is join-compatible
    lt = left.withColumn("__block", left_block).repartition(n_parts)
    rt = right.withColumn("__block", right_block)
    paired = lt.join(rt, "__block")
    # threshold form: -1 when the banded DP exceeds max_dist early
    d = F.levenshtein(F.col(left_text), F.col(right_text), max_dist)
    return (
        paired.withColumn(dist_col, d)
        .filter(F.col(dist_col) >= 0)
        .drop("__block")
    )
