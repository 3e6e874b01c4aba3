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

__all__ = ["fuzzy_join", "jaro_winkler_micro"]


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


def _jaro_winkler_micro_py(s1: str, s2: str) -> int:
    """Jaro-Winkler similarity in EXACT half-up micro units (0..1e6).

    Standard Winkler variant (match window = max(len)//2 - 1, transposi-
    tions = half the out-of-order matches, prefix scale p = 1/10 over at
    most 4 common leading chars, boost threshold 0.7 — the prefix bonus
    applies only when jaro >= 0.7, decided EXACTLY as 10·num >= 7·den)
    computed entirely in Python integer arithmetic: jaro = (m·l2·m +
    m·l1·m + (m-t)·l1·l2) / (3·l1·l2·m) and jw = jaro + ℓ·(1-jaro)/10
    stay exact rationals, and the only rounding is the final half-up
    division to micro units — deterministic and engine-independent (no
    float chain; DuckDB's float build agrees to ±1 micro, fuzz-pinned).
    """
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0  # DuckDB convention: empty vs anything (incl. empty) = 0
    if s1 == s2:
        return 1_000_000
    window = max(l1, l2) // 2 - 1
    taken = [False] * l2
    match1 = []  # (s2 index, char) in s1 scan order
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not taken[j] and s2[j] == c:
                taken[j] = True
                match1.append((j, c))
                break
    m = len(match1)
    if m == 0:
        return 0
    # transpositions: matched chars compared s1-order vs s2-order
    s1_matched = [c for _, c in match1]
    s2_matched = [s2[j] for j, _ in sorted(match1)]
    t2 = sum(a != b for a, b in zip(s1_matched, s2_matched)) // 2
    # jaro = (m/l1 + m/l2 + (m - t)/m) / 3 as an exact rational
    num = m * l2 * m + m * l1 * m + (m - t2) * l1 * l2
    den = 3 * l1 * l2 * m
    # winkler prefix boost: jw = jaro + ℓ·(1 - jaro)/10, only at/past
    # the 0.7 boost threshold (exact: jaro >= 7/10 ⇔ 10·num >= 7·den;
    # inclusive — a jaro of exactly 0.7 boosts, matching DuckDB's
    # float evaluation on the boundary)
    ell = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        ell += 1
    if 10 * num >= 7 * den:
        jw_num = 10 * num + ell * (den - num)
        jw_den = 10 * den
    else:
        jw_num, jw_den = num, den
    return (2 * jw_num * 1_000_000 + jw_den) // (2 * jw_den)


def jaro_winkler_micro(s1_col: str, s2_col: str) -> Column:
    """Vectorized (Arrow-batched) Jaro-Winkler in exact micro units —
    Spark has no built-in JW; this is the documented pandas-UDF slow
    path, kept off hot loops by the same blocking discipline as
    :func:`fuzzy_join` (compare CANDIDATE pairs, never all pairs)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

# no type annotations: postponed-evaluation strings ('pd.Series')
    # are unresolvable by the pandas_udf type-hint inspector here (the
    # textstats.py idiom)
    @pandas_udf("long")
    def _jw(a, b):
        return pd.Series(
            [
                _jaro_winkler_micro_py(x or "", y or "")
                for x, y in zip(a, b)
            ],
            dtype="int64",
        )

    return _jw(F.col(s1_col), F.col(s2_col))
