"""Text analysis operators — SURVEY §2 L-4 + training-pipeline extras.

All pure built-in column expressions (regex, length, split, md5) — the
whole module is map-only, codegen-friendly, and runs at scan speed.

* ``with_text_stats``      — char/token/punct/digit/stopword statistics;
* ``quality_score``        — heuristic quality in [0, 1] from those stats;
* ``language_id``          — stopword-vote n-gram-free heuristic over a
  small built-in lexicon (en/es/de/fr/it);
* ``document_fingerprint`` — md5 of whitespace/case-normalized text
  (md5 exists in both Spark and DuckDB, so it is oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_count_bpe",
    "with_text_stats",
    "quality_score",
    "language_id",
    "document_fingerprint",
    "repetition_stats",
    "lexical_diversity",
    "bigram_lm_scores",
    "lm_perplexity_buckets",
    "equal_frequency_buckets",
    "pii_scrub",
    "STOPWORDS",
    "EMAIL_RE",
    "PHONE_RE",
    "compression_ratio",
    "dsir_weights",
    "zipf_fit",
]

# Cost gate for _bigram_lm's shared-stream persist (VERDICT r11 item 8):
# persist the exploded bigram stream only while the INPUT is below this
# Catalyst-estimated size — above it the stream (a multiple of input
# bytes) would thrash the LRU cache and the map-only recompute from the
# already-split scan is the cheaper second pass.  Module constant so
# tests/deployments can override; read at call time.
_BIGRAM_PERSIST_MAX_BYTES = 16 << 30

# Tiny public-knowledge stopword lexicons (top function words per language).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de": ("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "it": ("il", "di", "che", "la", "e", "per", "un", "in", "del", "con"),
}


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != F.lit(""))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-document statistics columns.

    ``n_chars``/``n_tokens``/``avg_token_len``/``punct_ratio``/
    ``digit_ratio``/``stopword_ratio`` (English stopwords) — the standard
    quality-filter features.
    """
    t = F.col(text_col)
    toks = _tokens(t)
    n_chars = F.length(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn(
            "avg_token_len",
            F.when(F.size(toks) > 0,
                   F.aggregate(toks, F.lit(0.0), lambda a, x: a + F.length(x))
                   / F.size(toks)).otherwise(F.lit(0.0)),
        )
        .withColumn("punct_ratio", (n_punct / F.greatest(n_chars, F.lit(1))).cast("double"))
        .withColumn("digit_ratio", (n_digit / F.greatest(n_chars, F.lit(1))).cast("double"))
        .withColumn(
            "stopword_ratio",
            (n_stop / F.greatest(F.size(toks), F.lit(1))).cast("double"),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text", out: str = "quality") -> DataFrame:
    """Heuristic [0,1] quality score: rewards moderate length and prose-like
    token shape; penalizes punctuation/digit soup.  Deterministic closed
    form so it is SQL-portable for the oracle harness."""
    d = with_text_stats(df, text_col)
    length_term = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    shape_term = F.when(
        (F.col("avg_token_len") >= 3) & (F.col("avg_token_len") <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    noise_term = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.lit(2.0) * (F.col("punct_ratio") + F.col("digit_ratio"))
    )
    return d.withColumn(
        out, (F.lit(0.4) * length_term + F.lit(0.2) * shape_term + F.lit(0.4) * noise_term)
    )


def language_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-vote language ID: the language whose lexicon matches the
    most tokens wins; ties and zero-evidence rows yield ``'und'``.

    Map-only; for real corpora swap the lexicon for char-trigram profiles —
    the plumbing (per-row HOF voting) stays identical.
    """
    toks = _tokens(F.col(text_col))
    scores = []
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda x: F.array_contains(arr, x))).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out, F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def document_fingerprint(
    df: DataFrame, text_col: str = "text", out: str = "fingerprint"
) -> DataFrame:
    """Deterministic content fingerprint: md5 of lowercase,
    whitespace-collapsed text.  Same expression exists in DuckDB
    (``md5(lower(regexp_replace(text,'\\s+',' ','g')))``), so exact-dup
    detection via fingerprints is oracle-checkable."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out, F.md5(norm))


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality features, per document:

    * ``ttr``             — type-token ratio (distinct tokens / tokens);
    * ``top_bigram_frac`` — share of all bigrams taken by the most
      frequent bigram.

    Low TTR or a dominant bigram is the standard signal for boilerplate /
    degenerate-repetition documents in LLM training-data filtering
    (Gopher, Rae et al. 2021 §A.1.1).  Documents with fewer than two
    tokens are dropped (no bigram is defined).

    Scale shape: bigrams are built JVM-side with ``zip_with`` over two
    array slices (no Python), then explode → two keyed aggregations on
    ``id_col`` — partial aggregation applies and all shuffles are keyed
    by document, so the plan is embarrassingly parallel over docs.
    """
    from pgstream_spark.operators.dedup import _spread

    n = F.col("__n")
    base = (
        _spread(df, id_col).select(id_col, _tokens(F.col(text_col)).alias("__t"))
        .withColumn("__n", F.size("__t"))
        .filter(n >= 2)
        .withColumn("__nd", F.size(F.array_distinct("__t")))
    )
    bigram = F.zip_with(
        F.slice("__t", 1, n - 1),
        F.slice("__t", 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    per_bg = (
        base.select(id_col, "__n", "__nd", F.explode(bigram).alias("__bg"))
        .groupBy(id_col, "__bg")
        .agg(
            F.count("*").alias("__c"),
            F.first("__n").alias("__n"),
            F.first("__nd").alias("__nd"),
        )
    )
    return per_bg.groupBy(id_col).agg(
        (F.first("__nd").cast("double") / F.first("__n")).alias("ttr"),
        (F.max("__c").cast("double") / (F.first("__n") - 1)).alias("top_bigram_frac"),
    )


def lexical_diversity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document lexical-diversity features — the vocabulary-shape
    complement to ``repetition_stats`` (which covers TTR and bigram
    dominance):

    * ``n_terms``       — distinct terms;
    * ``hapax_frac``    — share of distinct terms occurring exactly once
      (low → formulaic/templated text);
    * ``top_term_frac`` — share of ALL tokens taken by the single most
      frequent term (high → degenerate repetition of one token).

    Scale shape: explode → one (doc, term) count aggregation → one doc
    aggregation; both shuffles are doc-keyed with map-side partial
    aggregation, so cost is linear in corpus tokens and embarrassingly
    parallel over documents.
    """
    from pgstream_spark.operators.dedup import _spread

    base = (
        _spread(df, id_col).select(id_col, _tokens(F.col(text_col)).alias("__t"))
        .withColumn("__n", F.size("__t"))
        .filter(F.col("__n") >= 1)
    )
    per_term = (
        base.select(id_col, "__n", F.explode("__t").alias("__term"))
        .groupBy(id_col, "__term")
        .agg(F.count("*").alias("__c"), F.first("__n").alias("__n"))
    )
    return per_term.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_terms"),
        (
            F.sum((F.col("__c") == 1).cast("long")).cast("double") / F.count("*")
        ).alias("hapax_frac"),
        (F.max("__c").cast("double") / F.first("__n")).alias("top_term_frac"),
    )


# Lookahead-free PII patterns that parse identically under Java regex
# (Spark) and RE2 (DuckDB): no backreferences, no lookarounds.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"


def pii_scrub(
    df: DataFrame, text_col: str = "text", out: str = "text_clean"
) -> DataFrame:
    """Redact email addresses and phone-like digit runs, appending
    ``n_emails``/``n_phones`` counts and the scrubbed ``out`` column.

    Map-only ``regexp_extract_all``/``regexp_replace`` — runs at scan
    speed; the standard pre-training PII pass (emails first so phone
    digits inside addresses are not double-counted).
    """
    t = F.col(text_col)
    no_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    return (
        df.withColumn(
            "n_emails", F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).cast("long")
        )
        .withColumn(
            "n_phones",
            F.size(F.regexp_extract_all(no_email, F.lit(PHONE_RE), 0)).cast("long"),
        )
        .withColumn(out, F.regexp_replace(no_email, PHONE_RE, "<PHONE>"))
    )


def token_count_bpe(df: DataFrame, text_col: str = "text", out: str = "n_tokens_bpe") -> DataFrame:
    """Subword-ish token count: splits on the GPT-2-style boundary classes
    (contractions, letter runs, digit runs, punctuation runs, whitespace)
    without lookaheads, so the same regex runs on any RE2/Java engine.

    A cheap proxy for real BPE token counts (within ~15% on English prose)
    — the standard budget estimator for training-data pipelines.  Pure
    ``regexp_extract_all`` + ``size``: map-only, codegen.
    """
    pattern = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]+"
    return df.withColumn(
        out,
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)).cast("long"),
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k_per_w1: int | None = None,
    max_bigrams: int | None = None,
    unseen_micro: int = 0,
) -> DataFrame:
    """Corpus-trained bigram language-model fluency score per document —
    the bounded-exact analog of the perplexity filter every LLM data
    pipeline runs (CCNet / Wenzek et al. 2020 use a KenLM n-gram model
    the same way: score each doc against a corpus-level LM, drop the
    tail).

    The model is the corpus's own bigram conditional
    ``P(w2|w1) = count(w1 w2) / count(w1 ·)`` quantized to integer
    micro-probabilities ``floor(1e6 · p)`` — quantizing per-bigram keeps
    every downstream aggregate exact-integer (and therefore
    engine-reproducible); the only floating-point steps are single IEEE
    divisions.  Score = mean micro-probability over the doc's bigrams:
    high = made of corpus-typical transitions, low = atypical/garbled.

    Two tiers (the l2b/l2d twin pattern):

    * **exact** (``top_k_per_w1=max_bigrams=None``) — the full LM, joined
      with a plain shuffled join (AQE broadcasts it when small; the LM's
      cardinality grows with the corpus, so it is never force-broadcast);
    * **truncated** — the actual CCNet/KenLM production regime: keep the
      top ``top_k_per_w1`` continuations per ``w1`` (deterministic order:
      count desc, ``w2`` asc) and/or the global top ``max_bigrams``
      (count desc, ``w1`` asc, ``w2`` asc); bigrams pruned from the model
      score the ``unseen_micro`` floor.  With ``max_bigrams`` set the LM
      is **bounded by construction at any corpus size** and scoring is an
      explicit broadcast join — zero corpus-sized LM shuffle;
      ``top_k_per_w1`` alone bounds it at O(|w1 vocab|·K) (vocab grows
      ~√corpus), so it takes a plain join and AQE decides — set both for
      the constant-size broadcast at web scale.

    Scale shape of the truncation itself: the per-``w1`` top-K window
    runs over the DISTINCT-BIGRAM table (bounded by vocab², not corpus
    rows) with per-``w1`` partitions bounded by vocab; the global cap is
    a distributed TakeOrdered (no full sort).

    Returns ``(id_col, n_bigrams, mean_microprob)``.
    """
    bi, lm = _bigram_lm(df, text_col, (id_col,))
    scored, micro = _score_join(bi, lm, top_k_per_w1, max_bigrams, unseen_micro)
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        (F.sum(micro).cast("double") / F.count("*")).alias("mean_microprob"),
    )


def _score_join(
    bi: DataFrame,
    lm: DataFrame,
    top_k_per_w1: int | None,
    max_bigrams: int | None,
    unseen_micro: int,
) -> tuple[DataFrame, Column]:
    """The shared exact-vs-truncated scoring-join tier behind
    `bigram_lm_scores` and `lm_perplexity_buckets` (one definition so
    the broadcast decision and the unseen-floor semantics can never
    silently diverge).  Returns ``(joined, micro_expr)``.

    Broadcast policy: ONLY a ``max_bigrams``-capped LM is bounded by
    construction and force-broadcast.  ``top_k_per_w1`` alone bounds
    the LM at O(|w1 vocab|·K) — vocab grows ~√corpus (SCALE.md's
    Heaps-law table), so it gets a plain join and AQE decides; set
    ``max_bigrams`` too for the constant-size broadcast at web scale.
    The exact tier always takes the plain join."""
    lm = _truncate_lm(lm, top_k_per_w1, max_bigrams).select(
        "__w1", "__w2", "__micro"
    )
    if top_k_per_w1 is None and max_bigrams is None:
        return bi.join(lm, ["__w1", "__w2"]), F.col("__micro")
    if max_bigrams is not None:
        lm = F.broadcast(lm)
    joined = bi.join(lm, ["__w1", "__w2"], "left")
    return joined, F.coalesce(F.col("__micro"), F.lit(int(unseen_micro)))


def _truncate_lm(
    lm: DataFrame, top_k_per_w1: int | None, max_bigrams: int | None
) -> DataFrame:
    """Frequency-truncate the bigram LM so its size is bounded by
    construction: top ``top_k_per_w1`` rows per ``w1`` (count desc, w2
    asc — fully deterministic), then the global top ``max_bigrams``
    (count desc, w1 asc, w2 asc) via ``orderBy().limit()`` which Spark
    plans as a distributed TakeOrdered, not a full sort.  Both windows
    run over the distinct-bigram table — per-``w1`` partition size is
    bounded by |vocab|, never by corpus rows."""
    if top_k_per_w1 is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("__w1").orderBy(
            F.col("__c2").desc(), F.col("__w2").asc()
        )
        lm = (
            lm.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= int(top_k_per_w1))
            .drop("__rk")
        )
    if max_bigrams is not None:
        lm = lm.orderBy(
            F.col("__c2").desc(), F.col("__w1").asc(), F.col("__w2").asc()
        ).limit(int(max_bigrams))
    return lm


def _bigram_lm(
    df: DataFrame, text_col: str, carry_cols: tuple
) -> tuple[DataFrame, DataFrame]:
    """The shared bigram-LM construction behind `bigram_lm_scores` and
    `lm_perplexity_buckets`: tokenize, zip adjacent tokens, count
    ``P(w2|w1)`` and quantize to integer micro-probabilities
    ``floor(1e6·c2/c1)``.  Returns ``(bi, lm)`` — the per-doc bigram
    stream (``carry_cols`` + ``__w1``/``__w2``) and the broadcast-sized
    LM table (``__w1``/``__w2``/``__micro``).  One definition so a
    tokenization or quantization fix can never silently diverge the
    two operators' pinned oracles.

    The bigram stream feeds TWO consumers (the c2 aggregate and the
    scoring join), so it is spread across all cores before the
    tokenize-heavy explode (a single-row-group input otherwise pins it
    to one task) and persisted so the explode computes once — the
    `minhash_signatures` lesson, measured again here (l96b 4.5 s →
    ~1 s at sf0.1).

    The persist is COST-GATED on input size (VERDICT r11 item 8): below
    ``_BIGRAM_PERSIST_MAX_BYTES`` of Catalyst-estimated input the cache
    trivially fits and saves a full tokenize pass per extra consumer;
    at corpus scale the exploded bigram stream is a multiple of the
    input size, would mostly evict/spill under LRU (cache thrash), and
    recomputing the map-only explode from the already-split scan is the
    cheaper second pass (guide §5: cache only when recompute costs more
    than the memory pressure).  Missing stats count as SMALL here —
    computed lineage without stats is gate-scale in this codebase, and
    the failure mode is only an oversized cache that LRU evicts, never
    a wrong result."""
    n = F.col("__n")
    nparts = df.sparkSession.sparkContext.defaultParallelism
    # NO ``filter(n >= 2)``: predicate pushdown substitutes the alias
    # through the repartition, so the whole tokenizer re-ran inside the
    # single-task scan stage just to evaluate the filter (probed: the
    # pushed Filter carries the full split() tree below the Exchange —
    # the same duplication InferFiltersFromGenerate caused).  Clamping
    # the slice length to >= 0 makes sub-2-token docs yield an empty
    # bigram array that the explode drops — row-for-row identical
    # output, tokenize evaluated once, post-exchange.
    base = (
        df.repartition(nparts, *[F.col(c) for c in carry_cols])
        .select(*carry_cols, _tokens(F.col(text_col)).alias("__t"))
        .withColumn("__n", F.size("__t"))
    )
    bigram = F.zip_with(
        F.slice("__t", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("__t", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bi = base.select(*carry_cols, F.explode(bigram).alias("__bg")).select(
        *carry_cols,
        F.col("__bg.w1").alias("__w1"),
        F.col("__bg.w2").alias("__w2"),
    )
    _NO_STATS = 1 << 60
    est = int(
        str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    if est < _BIGRAM_PERSIST_MAX_BYTES or est >= _NO_STATS:
        bi = bi.persist()
    c2 = bi.groupBy("__w1", "__w2").agg(F.count("*").alias("__c2"))
    # c1 (the w1 marginal) is the exact per-__w1 SUM of c2 — derive it
    # with a window over the DISTINCT-bigram table instead of a second
    # full pass over the corpus bigram stream plus a join: one shuffle
    # of c2 on __w1 replaces (bi re-aggregate + c2⋈c1 join).  Identical
    # integers — count per w1 = Σ_w2 count(w1, w2).
    from pyspark.sql import Window

    w1sum = Window.partitionBy("__w1")
    lm = c2.select(
        "__w1",
        "__w2",
        "__c2",
        F.floor(
            F.lit(1e6) * F.col("__c2") / F.sum("__c2").over(w1sum)
        ).alias("__micro"),
    )
    return bi, lm


def _ntile_bucket_expr(rank_col: str, q_col: str, m_col: str) -> Column:
    """Closed-form ntile: the bucket of 1-based ``rank`` among ``n``
    rows cut into ``k`` buckets, given ``q = n DIV k`` and ``m = n % k``
    (the first ``m`` buckets hold ``q+1`` rows, the rest ``q``) — pure
    integer arithmetic, so it reproduces SQL ``ntile`` bit-for-bit
    without any window.  ``ceil(a/b) = (a+b-1) DIV b`` on positive ints;
    the ELSE branch only evaluates when ``q >= 1`` (if ``q = 0`` every
    rank is inside the first ``m`` buckets)."""
    r, qq, m = F.col(rank_col), F.col(q_col), F.col(m_col)
    in_fat = (m > 0) & (r <= (qq + F.lit(1)) * m)
    fat = F.expr(f"({rank_col} + {q_col}) DIV ({q_col} + 1)")
    thin = m + F.expr(
        f"({rank_col} - ({q_col} + 1) * {m_col} + {q_col} - 1) DIV {q_col}"
    )
    return F.when(in_fat, fat).otherwise(thin).cast("int")


def equal_frequency_buckets(
    df: DataFrame,
    value_col: str,
    part_col: str,
    id_col: str,
    n_buckets: int,
    descending: bool = True,
) -> DataFrame:
    """``ntile(n_buckets)`` over ``(PARTITION BY part_col ORDER BY
    value_col [DESC], id_col ASC)`` — bit-for-bit — WITHOUT sorting a
    whole partition in one task.  The general form of the CCNet cut:
    any "equal-frequency buckets per group" where groups are few and
    huge (language, tenant, day) is exactly the skewed-window shape
    that serializes at 100 TB.

    Plan: (1) per-``(part, value)`` histogram — keyed shuffle, partial
    aggregation; its size is bounded by DISTINCT values per group, not
    rows; (2) running totals over that histogram (a window over
    histogram rows); (3) closed-form ntile arithmetic assigns every
    non-boundary value's bucket map-side; (4) only the ≤ ``n_buckets``−1
    boundary-straddling value-tie groups per partition pay a
    ``row_number`` over ``(part, value)`` for the ``id_col`` tiebreak
    ntile semantics inherently require there.  ``value_col`` must be
    exactly orderable (integers/strings — the same cross-engine
    discipline as everything else here).

    NULLs follow SPARK's window ordering (asc → NULLS FIRST, desc →
    NULLS LAST — a NULL value/partition is a tie group like any other;
    every join below is null-safe so no row is dropped).  Cross-engine
    oracles should keep NULLs out of ``value_col``: engines disagree
    on default NULL ordering.

    Returns the input columns + ``bucket`` (1-based int).
    """
    from pyspark.sql import Window

    val_order = F.col(value_col).desc() if descending else F.col(value_col).asc()
    hist = df.groupBy(part_col, value_col).agg(
        F.count("*").cast("bigint").alias("__cnt")
    )
    run = Window.partitionBy(part_col).orderBy(val_order)
    hist = hist.withColumn(
        "__cle",
        F.sum("__cnt").over(run.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("__cgt", F.col("__cle") - F.col("__cnt"))
    totals = hist.groupBy(part_col).agg(F.sum("__cnt").alias("__n")).select(
        F.col(part_col).alias("__tp"), "__n"
    )
    hist = (
        hist.join(
            F.broadcast(totals), F.col(part_col).eqNullSafe(F.col("__tp"))
        )
        .drop("__tp")
        .withColumn("__q", F.expr(f"__n DIV {int(n_buckets)}"))
        .withColumn("__m", F.col("__n") % F.lit(int(n_buckets)))
        .withColumn("__rlo", F.col("__cgt") + F.lit(1))
        .withColumn("__rhi", F.col("__cgt") + F.col("__cnt"))
        .withColumn("__blo", _ntile_bucket_expr("__rlo", "__q", "__m"))
        .withColumn("__bhi", _ntile_bucket_expr("__rhi", "__q", "__m"))
        .select(
            F.col(part_col).alias("__hp"),
            F.col(value_col).alias("__hv"),
            "__cgt", "__q", "__m", "__blo",
            (F.col("__blo") != F.col("__bhi")).alias("__straddle"),
        )
    )
    # null-safe equi-join back: a NULL value (or partition) is a tie
    # group like any other — a plain join would silently drop its rows.
    # Persisted: the direct and straddle branches below both consume it,
    # and without the persist the join (and everything upstream of it,
    # including the caller's scoring aggregation) executes twice.
    assigned = (
        df.join(
            hist,
            F.col(part_col).eqNullSafe(F.col("__hp"))
            & F.col(value_col).eqNullSafe(F.col("__hv")),
        )
        .drop("__hp", "__hv")
        .persist()
    )
    direct = assigned.filter(~F.col("__straddle")).withColumn(
        "bucket", F.col("__blo")
    )
    tie = Window.partitionBy(part_col, value_col).orderBy(F.col(id_col).asc())
    strad = (
        assigned.filter(F.col("__straddle"))
        .withColumn("__r", F.col("__cgt") + F.row_number().over(tie))
        .withColumn("bucket", _ntile_bucket_expr("__r", "__q", "__m"))
    )
    cols = [*df.columns, "bucket"]
    return direct.select(*cols).unionByName(strad.select(*cols))


def lm_perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
    top_k_per_w1: int | None = None,
    max_bigrams: int | None = None,
    unseen_micro: int = 0,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): score every
    document against the corpus bigram LM (`bigram_lm_scores`' model,
    recomputed here with the EXACT integer sum kept), then cut each
    language's documents into ``n_buckets`` equal-frequency fluency
    buckets — bucket 1 = "head" (most corpus-typical), the slice CCNet
    keeps preferentially for LM training data.

    Determinism discipline: documents order by the INTEGER mean
    micro-probability (``sum_micro DIV n_bigrams`` — floor division of
    non-negative operands, identical on every engine) descending with
    ``id`` as the total-order tiebreak; the assignment below reproduces
    SQL ``ntile`` over that order bit-for-bit — no float enters it.

    **Scale shape — no per-language global sort.**  A naive ntile
    window partitioned by language puts a whole language (most of a web
    corpus is one language) into ONE task.  Instead:

    1. histogram: count docs per ``(lang, mean_micro)`` — keyed shuffle
       with partial aggregation; the result has at most 1e6+1 rows per
       language by integer-quantization (``mean_micro`` ∈ [0, 1e6]),
       REGARDLESS of corpus size;
    2. a running-total window partitioned by language runs over that
       bounded histogram (≤ 1e6+1 rows/task), yielding for each score
       value the count of strictly-better docs ``c_gt``;
    3. closed-form ntile arithmetic on ``c_gt`` gives each score value
       its bucket span map-side; score values whose span lies inside
       one bucket assign directly (the overwhelming majority);
    4. only the ≤ ``n_buckets``−1 boundary-straddling score values per
       language pay a ``row_number`` over ``(lang, mean_micro)`` — the
       tied rows at a cut, exactly the rows for which ntile semantics
       inherently require the ``id`` tiebreak order.

    The LM join follows `bigram_lm_scores`' twin tiers (shared
    `_score_join`): exact (plain shuffled join, AQE-broadcast when
    small) or frequency-truncated (``top_k_per_w1``/``max_bigrams``/
    ``unseen_micro`` — force-broadcast only under the ``max_bigrams``
    constant bound).  Returns ``(id, lang, n_bigrams,
    mean_micro, bucket, tier)`` with ``tier`` ∈ head/middle/tail for 3
    buckets (``b<k>`` otherwise).
    """
    bi, lm = _bigram_lm(df, text_col, (id_col, lang_col))
    joined, micro = _score_join(bi, lm, top_k_per_w1, max_bigrams, unseen_micro)
    scored = (
        joined.groupBy(id_col, lang_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum(micro).cast("bigint").alias("__sum"),
        )
        .withColumn("mean_micro", F.expr("__sum DIV n_bigrams"))
    )

    out = equal_frequency_buckets(
        scored.select(id_col, lang_col, "n_bigrams", "mean_micro"),
        value_col="mean_micro",
        part_col=lang_col,
        id_col=id_col,
        n_buckets=n_buckets,
        descending=True,
    )

    if n_buckets == 3:
        tier = (
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 2, "middle")
            .otherwise("tail")
        )
    else:
        tier = F.concat(F.lit("b"), F.col("bucket").cast("string"))
    return out.select(
        id_col,
        lang_col,
        "n_bigrams",
        F.col("mean_micro").cast("bigint").alias("mean_micro"),
        "bucket",
        tier.alias("tier"),
    )


def compression_ratio(
    df: DataFrame, text_col: str = "text", out: str = "zlib_ratio"
) -> DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    classic cheap redundancy signal of web-corpus curation: boilerplate,
    keyword stuffing, and generated spam compress far below prose, and
    high-entropy noise compresses above it; pipelines gate on both
    tails.  Arrow-batched pandas UDF (zlib level 6, fixed, so the score
    is deterministic everywhere); empty text scores 1.0.  Rounded to 6
    digits.  Python-side by necessity — no SQL engine exposes zlib — so
    this is a rows-only operator (pytest-pinned), not an oracle query.
    """
    import pandas as pd
    import zlib

    from pyspark.sql.functions import pandas_udf

    # no type annotations: postponed-evaluation strings ('pd.Series')
    # are unresolvable by the pandas_udf type-hint inspector here
    @pandas_udf("double")
    def ratio(texts):
        out_vals = []
        for t in texts:
            b = (t or "").encode()
            out_vals.append(
                round(len(zlib.compress(b, 6)) / len(b), 6) if b else 1.0
            )
        return pd.Series(out_vals)

    return df.withColumn(out, ratio(F.col(text_col)))


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    use_bigrams: bool = True,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR; Xie et al. 2023)
    weights for every document of ``df`` against a small high-quality
    ``target`` set — the data-SELECTION stage of a curation pipeline
    (pick raw web documents whose hashed n-gram profile looks like
    Wikipedia/books), distinct from dedup (which removes) and quality
    rules (which gate).

    The paper's recipe, in the inventory's exactness discipline:

    * features = unigrams + adjacent bigrams, hashed into ``n_buckets``
      md5 buckets (the same engine-agnostic first-8-hex-digits hash as
      the SimHash/classifier tiers);
    * two bucket histograms (add-one smoothed): target counts ``t`` and
      raw counts ``r`` — each ONE grouped aggregate whose output is
      bounded by ``n_buckets``, a constant, never corpus size;
    * per-bucket importance ratio ``(t+1)/(T+B) ÷ (r+1)/(R+B)``
      quantized to integer micros by PURE INTEGER floor division
      ``(t+1)·(R+B)·10⁶ DIV ((r+1)·(T+B))`` — no float touches the
      gated columns (exact up to ``(t+1)·(R+B) ≤ 9.2·10¹²``, i.e.
      corpora of ~10¹² features against busy buckets — past that,
      use the log columns);
    * the paper's log-space weight carried alongside: per-bucket
      ``floor(10⁶·(ln((t+1)(R+B)) − ln((r+1)(T+B))))`` — quantized at
      the BUCKET so document sums stay exact integers (order-free),
      with the one libm call per bucket, not per document.

    The weight table is ≤ ``n_buckets`` rows — broadcast by
    construction at any corpus size (the bounded-broadcast contract
    VERDICT r9 demanded of the LM tier).  Scoring is tokenize →
    bucket → broadcast-join → one per-doc aggregate: scan speed at
    100 TB, one doc-keyed combine.  Docs with zero tokens produce no
    row.

    Returns ``(id, n_feats, w_sum_micro, w_mean_micro, logw_sum_micro,
    logw_mean_micro)``; resample by ``w_mean_micro`` (or softmax the
    log means).  ``l56_dsir_importance`` is the unigram ppm-ratio fast
    form of the same idea (target = a column predicate, no smoothing,
    no log); this is the paper's full recipe against a separate target
    frame.
    """
    B = int(n_buckets)

    def feats(frame: DataFrame) -> DataFrame:
        from pgstream_spark.operators.dedup import _spread

        t = _tokens(F.col(text_col))
        if use_bigrams:
            n = F.size(t)
            bi = F.zip_with(
                F.slice(t, 1, n - 1),
                F.slice(t, 2, n - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
            arr = F.concat(t, F.when(n >= 2, bi).otherwise(F.array()))
        else:
            arr = t
        ex = _spread(frame, id_col).select(
            F.col(id_col), F.explode(arr).alias("__f")
        )
        return ex.select(
            id_col,
            (
                F.conv(F.substring(F.md5(F.col("__f")), 1, 8), 16, 10).cast(
                    "long"
                )
                % B
            ).alias("__bk"),
        )

    # l56's plan lesson: combine the feature stream map-side into
    # (doc, bucket, cnt) ONCE — both the global bucket histogram and
    # the per-doc scoring derive from that compact table (the doc sum
    # distributes over per-bucket counts), so the tokenize explode is
    # scanned and hashed exactly once.
    raw_f = (
        feats(df)
        .groupBy(id_col, "__bk")
        .agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
        .persist()
    )
    tgt_f = feats(target)
    rc = raw_f.groupBy("__bk").agg(F.sum("__cnt").cast("long").alias("__r"))
    tc = tgt_f.groupBy("__bk").agg(F.count(F.lit(1)).cast("long").alias("__t"))
    # totals get distinct names: Spark resolution is case-insensitive,
    # so __R/__T would collide with the per-bucket __r/__t
    totals = (
        rc.agg(F.sum("__r").cast("long").alias("__rtot"))
        .crossJoin(tc.agg(F.sum("__t").cast("long").alias("__ttot")))
    )
    w = (
        rc.join(tc, "__bk", "left")
        .withColumn("__t", F.coalesce(F.col("__t"), F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(totals))
        .select(
            "__bk",
            F.expr(
                f"(__t + 1) * (__rtot + {B}) * 1000000 DIV ((__r + 1) * (__ttot + {B}))"
            ).cast("long").alias("__wm"),
            F.floor(
                F.lit(1e6)
                * (
                    F.log((F.col("__t") + 1) * (F.col("__rtot") + F.lit(B)))
                    - F.log((F.col("__r") + 1) * (F.col("__ttot") + F.lit(B)))
                )
            ).cast("long").alias("__lwm"),
        )
    )
    out = (
        raw_f.join(F.broadcast(w), "__bk")
        .groupBy(id_col)
        .agg(
            F.sum("__cnt").cast("long").alias("n_feats"),
            F.sum(F.col("__cnt") * F.col("__wm")).cast("long").alias("w_sum_micro"),
            F.sum(F.col("__cnt") * F.col("__lwm")).cast("long").alias("logw_sum_micro"),
        )
        .select(
            id_col,
            "n_feats",
            "w_sum_micro",
            F.expr("w_sum_micro DIV n_feats").cast("long").alias("w_mean_micro"),
            "logw_sum_micro",
            # logw sums can be negative: floor-divide (toward -inf) on
            # both engines would need care; keep the mean double-free by
            # flooring in log space too — Spark DIV truncates toward
            # zero, so divide the SHIFTED non-negative sum (shift by
            # n·10^13 ≫ any |logw|·10^6) and unshift, exact on both.
            (
                F.expr(
                    "(logw_sum_micro + n_feats * 10000000000000) DIV n_feats"
                )
                - F.lit(10_000_000_000_000)
            ).cast("long").alias("logw_mean_micro"),
        )
    )
    return out


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    group_cols: tuple = ("lang",),
    top_terms: int = 1000,
) -> DataFrame:
    """Zipf rank-frequency fit per group — the corpus-health diagnostic
    behind boilerplate/spam detection at corpus level: natural language
    follows ``freq ∝ rank^(−α)`` with α ≈ 1; template-stuffed or
    machine-generated slices bend the log-log line (α drifts, fit
    degrades).  Complements `lexical_diversity` (per-document) and
    `vocab_growth` (corpus size law) with the distribution SHAPE.

    Exactness discipline: the top ``top_terms`` terms per group (count
    desc, term asc — deterministic) get ``x = floor(10⁶·ln(rank))``,
    ``y = floor(10⁶·ln(count))`` — one libm call per (rank|count)
    value, floor-quantized so every regression sum is an exact BIGINT
    (the g37 recipe); the least-squares slope is then a single double
    expression over those exact sums, rounded 6.  ``zipf_alpha = −slope``.

    Scale shape: one term-count aggregate (map-side combinable,
    bounded by vocab), a per-group rank window over DISTINCT terms
    (vocab-bounded, never corpus rows), a ``top_terms`` cap, one
    grouped regression aggregate.  Groups with < 2 ranked terms have
    no fittable line and are dropped.

    Returns ``(group_cols…, n_terms_used, zipf_slope, zipf_alpha)``.
    """
    from pyspark.sql import Window

    g = list(group_cols)
    terms = (
        df.select(*g, F.explode(_tokens(F.col(text_col))).alias("__t"))
        .groupBy(*g, "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    w = Window.partitionBy(*g).orderBy(
        F.col("__c").desc(), F.col("__t").asc()
    )
    ranked = (
        terms.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= int(top_terms))
        .select(
            *g,
            F.floor(F.lit(1e6) * F.log(F.col("__r"))).cast("long").alias("__x"),
            F.floor(F.lit(1e6) * F.log(F.col("__c"))).cast("long").alias("__y"),
        )
    )
    agg = ranked.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_used"),
        F.sum("__x").cast("long").alias("__sx"),
        F.sum("__y").cast("long").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).cast("long").alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).cast("long").alias("__sxx"),
    )
    n = F.col("n_terms_used")
    slope = (
        (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
        / (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    )
    return (
        agg.filter(
            (n >= 2) & (n * F.col("__sxx") != F.col("__sx") * F.col("__sx"))
        )
        .select(
            *g,
            "n_terms_used",
            F.round(slope, 6).alias("zipf_slope"),
            F.round(-slope, 6).alias("zipf_alpha"),
        )
    )
