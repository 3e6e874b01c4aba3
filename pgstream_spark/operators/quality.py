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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "expect",
    "expect_split",
    "benford_audit",
    "profile_columns",
    "hashed_linear_score",
    "gopher_rules",
    "roc_auc",
    "k_anonymity_audit",
    "k_anonymize",
]


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


# Benford first-digit audit — the forensic data-quality check: naturally
# occurring multiplicative quantities (amounts, populations, counts)
# follow P(d) = log10(1 + 1/d); fabricated or truncated data does not
# (Benford 1938; Nigrini's audit practice).  A large chi-square against
# the Benford expectation flags a column worth investigating.
#
# Determinism discipline: the first significant digit comes from the
# INTEGER cents representation (string head of a BIGINT — no float
# log10, whose libm varies across engines at powers of ten); the nine
# expected probabilities are Python-computed literals embedded
# identically in both engines; each chi-square term is rounded to a
# scaled integer before the sum so the 9-term reduction is exact and
# order-free.
_BENFORD_P = [0.0] + [__import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)]


def benford_audit(
    df: DataFrame,
    value_col: str,
    scale: int = 100,
    round_digits: int = 6,
) -> DataFrame:
    """First-significant-digit distribution of ``value_col`` vs the
    Benford expectation, one row per digit 1-9:

    ``(digit, n, observed_p, expected_p, chi2_term, chi2_total)``

    Only strictly positive values participate.  One scan + one 9-row
    aggregation; every window below runs over those 9 rows.  ``scale``
    converts values to integers first (100 = cents).
    """
    assert round_digits == 6, "integer rounding is pinned to 6 decimals"
    c = F.round(F.col(value_col) * scale).cast("bigint")
    digit = F.substring(c.cast("string"), 1, 1).cast("int")
    counts = (
        df.where(c > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    total = F.sum("n").over(w_all)
    # element_at is 1-indexed: array holds p(1)..p(9)
    p_expr = F.element_at(
        F.array(*[F.lit(p) for p in _BENFORD_P[1:]]), F.col("digit")
    )
    p6_expr = F.element_at(
        F.array(*[F.lit(round(p, round_digits)) for p in _BENFORD_P[1:]]),
        F.col("digit"),
    )
    scored = counts.select(
        "digit",
        "n",
        total.alias("__N"),
        p_expr.alias("__p_full"),
        p6_expr.alias("expected_p"),
    )
    exp_n = F.col("__p_full") * F.col("__N").cast("double")
    term = (F.col("n").cast("double") - exp_n) * (
        F.col("n").cast("double") - exp_n
    ) / exp_n
    # observed_p is an integer ratio -> round in exact integer
    # arithmetic (the changepoint.py recipe); chi-square terms round to
    # INTEGERS (scale-0 rounding has no 10^s float step on either
    # engine), so the 9-term sum is exact and order-free
    scored = scored.withColumn(
        "observed_p",
        F.expr("CAST((2000000 * n + __N) DIV (2 * __N) AS DOUBLE)")
        / 1000000.0,
    ).withColumn("__term_scaled", F.round(term * 1000000).cast("bigint"))
    w9 = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    chi2_total = F.sum("__term_scaled").over(w9).cast("double") / 1000000.0
    return scored.select(
        "digit",
        "n",
        "observed_p",
        "expected_p",
        (F.col("__term_scaled").cast("double") / 1000000.0).alias("chi2_term"),
        chi2_total.alias("chi2_total"),
    )


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Generic one-pass data profile: per column — row count, NULL
    count, exact distinct count, min/max (rendered as strings so mixed
    types share one report schema).  The first look every pipeline takes
    at a new table.

    TWO aggregations, deliberately split: the multi-``count_distinct``
    rewrite (Expand, one copy of the input per distinct column) and the
    string-rendered min/max cannot share one aggregate without forcing
    the WHOLE expanded row set through a multi-key SortAggregate —
    min/max over string buffers are hash-agg-ineligible, so Catalyst
    demotes the combined plan to sort-based aggregation (measured 2.2×
    the split cost at sf0.1).  Split, the non-distinct statistics run
    as one scan-speed conditional aggregate (hash, map-side combinable)
    and the exact distinct counts run hash-aggregated over the Expand
    (at extreme cardinality swap in ``approx_count_distinct``, same
    report shape); both reduce to ONE row, joined by a broadcast nested
    loop that moves two rows.  Output is one row per column via a
    literal-struct explode.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    nd = [F.count_distinct(F.col(c)).alias(f"__nd_{c}") for c in cols]
    s = df.agg(*aggs).crossJoin(F.broadcast(df.agg(*nd)))
    rows = s.select(
        F.col("__n"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__null_{c}").alias("n_null"),
                        F.col(f"__nd_{c}").alias("n_distinct"),
                        F.col(f"__min_{c}").alias("min_value"),
                        F.col(f"__max_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p"),
    )
    return rows.select(
        F.col("p.column").alias("column"),
        F.col("__n").alias("n_rows"),
        F.col("p.n_null").cast("bigint").alias("n_null"),
        F.col("p.n_distinct").cast("bigint").alias("n_distinct"),
        F.col("p.min_value").alias("min_value"),
        F.col("p.max_value").alias("max_value"),
    )


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    weights: Sequence[float] | None = None,
    seed: str = "w",
    round_digits: int = 6,
) -> DataFrame:
    """Model-based quality scoring with a frozen hashed linear model —
    the "quality classifier" stage of a curation pipeline (the
    fastText/logistic filter in CCNet/C4-class pipelines), as a pure
    relational plan: feature = token's md5 bucket in [0, n_buckets),
    score = sigmoid(mean bucket weight).  No model runtime, no UDF —
    tokenize → bucket → weight lookup → one per-doc aggregate, all
    whole-stage codegen; at 100 TB this runs at scan speed with one
    doc-keyed combine.

    Two weight sources:

    * ``weights`` — a trained model's coefficient vector (len
      n_buckets), embedded as micro-unit integer literals via
      element_at (broadcast-free: the vector is part of the plan);
    * default — deterministic md5-derived weights
      (``md5(seed:bucket)`` → uniform integer in [0, 2·10⁶]), the
      engine-agnostic stand-in that lets the full pipeline be
      oracle-verified bit-exactly (real deployments pass ``weights``).

    Determinism discipline: weights are integer micro-units and the
    per-doc sum is BIGINT (exact, associative); the mean uses integer
    DIV (operands kept non-negative — both engines truncate
    identically there); only the final sigmoid touches libm and is
    rounded (default 6), the inventory's standard treatment for a
    single transcendental.

    Returns (id, ``n_tokens``, ``mean_w_micro``, ``score``, ``keep``)
    — ``keep`` is the score ≥ 0.5 filter verdict.  Docs with zero
    tokens produce no row (nothing to score).
    """
    from pgstream_spark.operators.textstats import _tokens

    from pgstream_spark.operators.dedup import _spread

    toks = _spread(df, id_col).select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("__t")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("__t")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    shift = 1
    if weights is not None:
        if len(weights) != n_buckets:
            raise ValueError(
                f"weights must have n_buckets={n_buckets} entries, got {len(weights)}"
            )
        # micro-unit literals, shifted non-negative for the DIV
        # discipline — shift derived from max(|w|), not a fixed 1.0:
        # logistic coefficients below -1.0 are common, and a fixed
        # shift would leave negative sums whose truncation direction
        # differs across engines
        import math as _math

        shift = max(1, _math.ceil(max(abs(w) for w in weights)))
        lits = F.array(
            *[
                F.lit(int(round(w * 1_000_000)) + shift * 1_000_000).cast(
                    "bigint"
                )
                for w in weights
            ]
        )
        wq = F.element_at(lits, (bucket + 1).cast("int"))
    else:
        wq = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{seed}:"), bucket.cast("string"))),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            % 2_000_001
        )
    agg = toks.select(F.col(id_col), wq.alias("__wq")).groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("__wq").cast("long").alias("__z"),
    )
    mean_micro = F.expr("__z DIV n_tokens")
    # un-shift by the same amount the literals were shifted (the
    # md5-seed path's domain [0, 2e6) is centered at 1.0 → shift 1)
    x = mean_micro.cast("double") / 1_000_000.0 - float(shift)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-x)), round_digits)
    return agg.select(
        id_col,
        "n_tokens",
        mean_micro.cast("bigint").alias("mean_w_micro"),
        score.alias("score"),
        (score >= 0.5).alias("keep"),
    )


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    stopwords: tuple = _GOPHER_STOPWORDS,
    min_stopwords: int = 2,
) -> DataFrame:
    """The Gopher repetition-free quality RULES (Rae et al. 2021,
    MassiveText §A1.1) as per-rule boolean flags — the rule-based
    filtering stage every LLM data pipeline runs before model-based
    scoring, kept as individual verdicts (not a collapsed score) so a
    curation report can show WHICH rule removed a document:

    * ``ok_word_count`` — word count in ``[min_words, max_words]``;
    * ``ok_mean_word_len`` — mean word length in
      ``[min_mean_word_len, max_mean_word_len]`` characters, tested by
      exact cross-multiplication (``min·n ≤ Σlen ≤ max·n``) — no float
      division crosses engines;
    * ``ok_symbol_ratio`` — '#' + '…' occurrences ≤ 10 % of words
      (``10·symbols ≤ n_words``);
    * ``ok_bullet_lines`` — < 90 % of lines may start with a bullet
      (``10·bullet_lines < 9·n_lines`` violates → flag is the
      complement);
    * ``ok_ellipsis_lines`` — ≤ 30 % of lines end with '…' or '...'
      (``10·ellipsis_lines ≤ 3·n_lines``);
    * ``ok_alpha_words`` — ≥ 80 % of words contain an alphabetic
      character (``10·alpha_words ≥ 8·n_words``);
    * ``ok_stopwords`` — at least ``min_stopwords`` DISTINCT members
      of the stop list appear (the "is this prose" tripwire);
    * ``keep`` — every rule passed.

    One map-only pass: words split on whitespace, every count an exact
    integer, every ratio test an integer cross-multiplication — the
    whole verdict frame is oracle-checkable bit-for-bit and runs at
    scan speed on 100 TB (no shuffle, no UDF).  Returns
    ``(id, n_words, n_lines, <flags...>, keep)``.
    """
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
    )
    lines = F.split(F.col(text_col), r"\n")
    d = df.select(
        F.col(id_col),
        F.size(words).alias("n_words"),
        F.size(lines).alias("n_lines"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("__word_chars"),
        F.size(
            F.filter(words, lambda w: w.rlike("[A-Za-z]"))
        ).alias("__alpha_words"),
        F.size(
            F.array_intersect(
                F.transform(words, F.lower),
                F.array(*[F.lit(s) for s in stopwords]),
            )
        ).alias("__stop_distinct"),
        (
            F.length(text_col)
            - F.length(F.replace(F.col(text_col), F.lit("#"), F.lit("")))
            + F.length(text_col)
            - F.length(F.replace(F.col(text_col), F.lit("…"), F.lit("")))
        ).cast("bigint").alias("__symbols"),
        F.size(
            F.filter(lines, lambda ln: ln.rlike(r"^\s*([-*•])"))
        ).alias("__bullet_lines"),
        F.size(
            F.filter(lines, lambda ln: ln.rlike(r"(…|\.\.\.)\s*$"))
        ).alias("__ellipsis_lines"),
    )
    n_w = F.col("n_words").cast("bigint")
    n_l = F.col("n_lines").cast("bigint")
    flags = {
        "ok_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "ok_mean_word_len": (n_w > 0)
        & (F.col("__word_chars") >= F.lit(min_mean_word_len) * n_w)
        & (F.col("__word_chars") <= F.lit(max_mean_word_len) * n_w),
        "ok_symbol_ratio": F.lit(10) * F.col("__symbols") <= n_w,
        "ok_bullet_lines": F.lit(10) * F.col("__bullet_lines") < F.lit(9) * n_l,
        "ok_ellipsis_lines": F.lit(10) * F.col("__ellipsis_lines")
        <= F.lit(3) * n_l,
        "ok_alpha_words": F.lit(10) * F.col("__alpha_words")
        >= F.lit(8) * n_w,
        "ok_stopwords": F.col("__stop_distinct") >= min_stopwords,
    }
    out = d.select(
        id_col,
        "n_words",
        "n_lines",
        *[c.alias(name) for name, c in flags.items()],
    )
    keep = reduce(lambda a, b: a & b, [F.col(n) for n in flags])
    return out.withColumn("keep", keep)


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact tie-aware ROC-AUC (Mann–Whitney U) per group — the
    classifier-calibration member of the eval-harness tier: after
    `hashed_linear_score` (or any model-based filter) assigns scores,
    this measures how well the score separates a labelled positive
    class, the number a curation pipeline trends per source/language
    before trusting a quality threshold.

    AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻), computed exactly
    from the SCORE HISTOGRAM, never from row-level ranks:

    1. one grouped aggregate to ``(group, score) → (n_pos, n_neg)`` —
       map-side combinable, output bounded by |group| × |distinct
       scores| (house quantization discipline: scores are integers or
       integer micros, so the histogram is bounded by the score RANGE,
       not the corpus — the l94 lesson applied from the start);
    2. a running sum of negatives over the histogram (window over
       histogram rows, partition = group — thousands of rows at most,
       nothing corpus-sized; contrast the per-language ntile VERDICT
       r9 flagged, whose window ran over raw documents);
    3. ``2U = Σ_s n_pos(s)·(2·neg_below(s) + n_neg(s))`` — doubling
       makes the tie half-credit an exact integer.

    Output per group: ``(group_cols…, n_pos, n_neg, u2, auc_bp,
    auc)`` — ``u2`` = 2U (BIGINT, exact), ``auc_bp`` = exact
    basis points ``u2·10000 DIV (2·n_pos·n_neg)``, ``auc`` the
    conventional double rounded to 6 (one division of two exact
    integers — both below 2^53 up to ~67M pos·neg pairs per group;
    past that trust ``u2``/``auc_bp`` whose BIGINT headroom reaches
    ~4.6·10¹⁴ pairs).  Groups with no positives or no negatives have
    undefined AUC and are dropped (document the filter, don't NaN).
    """
    g = list(group_cols)
    lab = F.col(label_col).cast("boolean")
    hist = df.groupBy(*g, F.col(score_col).alias("__s")).agg(
        F.sum(F.when(lab, 1).otherwise(0)).cast("long").alias("__p"),
        F.sum(F.when(lab, 0).otherwise(1)).cast("long").alias("__n"),
    )
    w = (
        Window.partitionBy(*g)
        .orderBy(F.col("__s").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.withColumn(
        "__nb", F.coalesce(F.sum("__n").over(w), F.lit(0)).cast("long")
    )
    agg = cum.groupBy(*g).agg(
        F.sum("__p").cast("long").alias("n_pos"),
        F.sum("__n").cast("long").alias("n_neg"),
        F.sum(
            F.col("__p") * (F.lit(2) * F.col("__nb") + F.col("__n"))
        ).cast("long").alias("u2"),
    )
    pairs2 = F.lit(2) * F.col("n_pos") * F.col("n_neg")
    return agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0)).select(
        *g,
        "n_pos",
        "n_neg",
        "u2",
        F.expr("u2 * 10000 DIV (2 * n_pos * n_neg)")
        .cast("bigint")
        .alias("auc_bp"),
        F.round(F.col("u2").cast("double") / pairs2.cast("double"), 6).alias(
            "auc"
        ),
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns — the
    privacy-governance gate a training-data release runs after PII
    scrubbing (`pii_scrub` removes direct identifiers; this measures
    re-identification risk from the INDIRECT ones): every equivalence
    class (distinct quasi-identifier combination) smaller than ``k``
    marks its rows re-identifiable (Sweeney 2002).

    One grouped count — map-side combinable, output bounded by the
    class count — per class: ``(quasi_cols…, class_size, at_risk)``.
    All integers; NULL quasi-values form their own class (groupBy's
    NULL-key semantics, same in the oracle's GROUP BY).
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    g = list(quasi_cols)
    return df.groupBy(*g).agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size")
    ).withColumn("at_risk", F.col("class_size") < int(k))


def k_anonymize(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """Suppression-based k-anonymization: keep only rows whose
    quasi-identifier class has at least ``k`` members — the baseline
    release transform (suppress rare combinations rather than
    generalize them).  Implemented as the audit's class counts joined
    back on the quasi columns (shuffle join on the class key; AQE
    broadcasts when the class table is small), so the decision and the
    audit can never disagree.  Returns the input rows + ``class_size``.
    """
    g = list(quasi_cols)
    counts = (
        k_anonymity_audit(df, g, k)
        .filter(~F.col("at_risk"))
        .drop("at_risk")
        .select(
            *[F.col(c).alias(f"__q_{c}") for c in g], "class_size"
        )
    )
    # NULL-SAFE join back: groupBy treats NULL quasi-values as one
    # class, so the join must too — a plain equi-join would silently
    # suppress every row of a NULL-valued class even when it is safe
    cond = None
    for c in g:
        eq = F.col(c).eqNullSafe(F.col(f"__q_{c}"))
        cond = eq if cond is None else (cond & eq)
    return df.join(counts, cond).drop(*[f"__q_{c}" for c in g])
