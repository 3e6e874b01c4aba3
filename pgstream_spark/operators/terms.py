"""Corpus-level term analysis — inverted index + keyword extraction.

The reference's text surface stops at per-row functions (its term-level
analytics were delegated to Postgres ``ts_stat``-style queries); a
training-data pipeline needs the corpus-level versions: per-document
keyword extraction (TF-IDF family) and an inverted index over the corpus
(`SURVEY.md §2` L-4 extension class).

Everything here is exact integer / lexicographic arithmetic so results
are bit-reproducible against a SQL oracle:

* ``tficf_top_terms`` scores ``tf * scale * n_docs div df`` in BIGINT —
  a *linearized* tf-idf (inverse collection frequency without the log).
  The log changes only monotonicity-irrelevant spacing for ranking by a
  single term statistic, and dropping it keeps the score exact across
  engines (no libm ``ln`` 1-ulp divergence).
* ``posting_lists`` builds sorted doc-id postings ONLY for terms whose
  document frequency sits inside ``[min_df, max_df]`` — the df filter is
  applied on a count-only aggregate BEFORE any posting list is
  materialized, so stop-term postings (df ~ |corpus|) are never built.

Shuffle shape at scale: tokenize is map-only; ``(doc, term)`` counts and
``term`` counts are two hash aggregations with map-side partial combine;
the tf-df join broadcasts the vocabulary side when small.  Nothing here
collects to the driver.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from pgstream_spark.operators.dedup import _spread
from pgstream_spark.operators.textstats import _tokens

__all__ = ["term_frequencies", "tficf_top_terms", "posting_lists", "encode_token_ids", "apply_bpe_merges"]


def term_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per (document, term) with its in-document count ``tf``."""
    return (
        _spread(df, id_col).select(
            F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def tficf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by exact TF-ICF.

    ``score = tf * scale * n_docs div df`` on BIGINT (all positive, so
    floor division is identical in Spark ``div`` and DuckDB ``//``).
    ``scale`` bounds: keep ``max_tf * scale * n_docs < 2^63`` — at
    trillion-document scale drop ``scale`` to 1e3 or rank on
    ``(tf, -df)`` directly.
    Ties break toward the lexicographically smaller term.
    """
    from pyspark.sql.window import Window

    tf = term_frequencies(df, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").cast("bigint").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.expr(f"tf * {scale}L * n_docs div df"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df", "score")
    )


def posting_lists(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_df: int | None = 20,
    rarest_k: int | None = None,
) -> DataFrame:
    """Inverted index restricted to informative (low-df) terms.

    Term selection happens on a count-only aggregate BEFORE any posting
    list is gathered, via either an absolute band (``min_df``/``max_df``
    — the production contract: a stop term's posting list, df ~
    |corpus|, is never materialized) or ``rarest_k`` (keep the ``k``
    rarest vocabulary entries by ``(df, term)`` — rank-relative, so it
    stays non-vacuous on corpora whose whole vocabulary is common).
    Postings are then gathered with a broadcast semi-join on the kept
    vocabulary.
    """
    from pyspark.sql.window import Window

    pairs = (
        _spread(df, id_col).select(
            F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term")
        )
        .distinct()
    )
    dfreq = pairs.groupBy("term").agg(F.count("*").alias("df"))
    if rarest_k is not None:
        w = Window.orderBy(F.asc("df"), F.asc("term"))
        keep = (
            dfreq.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= rarest_k)
            .drop("_r")
        )
    else:
        keep = dfreq.filter(F.col("df") >= min_df)
        if max_df is not None:
            keep = keep.filter(F.col("df") <= max_df)
    return (
        pairs.join(F.broadcast(keep), "term")
        .groupBy("term", "df")
        .agg(F.sort_array(F.collect_list(id_col)).alias("postings"))
    )


def encode_token_ids(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Tokenize and encode every document as an array of integer token
    ids against a corpus-derived vocabulary — the step that turns raw
    text into the numeric sequences :func:`packing.pack_sequences`
    consumes.

    The vocabulary assigns ids by sorted term order (``row_number`` over
    the distinct-term set), which makes the mapping deterministic and
    oracle-checkable with no trained artifact.  That global window runs
    on ONE partition by design: the vocabulary is vocab-sized (bounded,
    Zipf-truncated in practice), not corpus-sized — the same bounded-
    small-side reasoning as IVF's centroid sample.  Encoding is then a
    broadcast join on the token stream plus one keyed aggregation that
    reassembles positions (``array_sort`` on (pos, id) structs).

    Returns ``(id_col, ids: array<int>, n_tokens)``; documents with no
    tokens yield no row (nothing to encode), matching the SQL shape.
    """
    from pyspark.sql import Window

    from pgstream_spark.operators.dedup import tokens_col

    tok = _spread(docs, id_col).select(
        F.col(id_col),
        F.posexplode(tokens_col(F.col(text_col))).alias("__pos", "__term"),
    )
    vocab = (
        tok.select("__term")
        .distinct()
        .withColumn(
            "__tid", F.row_number().over(Window.orderBy("__term")).cast("int")
        )
    )
    assembled = (
        tok.join(F.broadcast(vocab), "__term")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos"), F.col("__tid")))
            ).alias("__seq")
        )
    )
    ids = F.transform(F.col("__seq"), lambda s: s["__tid"])
    return assembled.select(
        id_col, ids.alias("ids"), F.size("__seq").cast("long").alias("n_tokens")
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    max_token_chars: int = 20,
) -> DataFrame:
    """Adjacent symbol-pair frequencies — the inner statistic of BPE
    tokenizer training (Sennrich et al. 2016): every merge decision is
    ``argmax`` over exactly this table.

    Symbols start as characters within word tokens (lowercased,
    ``[^a-z0-9]+``-split, capped at ``max_token_chars`` so pathological
    unbroken strings cannot explode the pair space quadratically).  The
    plan is explode → explode → one map-side-combinable count: linear in
    corpus characters, the same shape at any scale.  Returns
    ``(left, right, cnt)``.
    """
    toks = F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
            lambda t: t != F.lit(""),
        )
    ).alias("__tok")
    chars = docs.select(toks).select(
        F.split(F.substring("__tok", 1, max_token_chars), "").alias("__cs")
    )
    pairs = chars.select(
        F.explode(
            F.when(
                F.size("__cs") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("__cs") - 2),
                    lambda i: F.struct(
                        F.element_at("__cs", i + 1).alias("left"),
                        F.element_at("__cs", i + 2).alias("right"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
        ).alias("__p")
    )
    return pairs.groupBy(
        F.col("__p")["left"].alias("left"), F.col("__p")["right"].alias("right")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    max_token_chars: int = 20,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules from the corpus.

    Each round: distributed adjacent-pair count over the CURRENT symbol
    sequences, then the driver takes the argmax (ties broken
    lexicographically, so the learned table is deterministic on any
    partitioning) and rewrites the sequences with the merged symbol.
    The rewrite runs as an Arrow-batched ``mapInPandas`` fold over the
    word list — one distributed pass per merge, ``num_merges`` is a
    small constant, and only the (pair, count) argmax row ever reaches
    the driver.  Word sequences are cached between rounds.

    Returns the ordered merge list — apply with any standard BPE encoder.
    """
    import pandas as pd

    toks = F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
            lambda t: t != F.lit(""),
        )
    ).alias("__tok")
    seqs = docs.select(toks).select(
        F.split(F.substring("__tok", 1, max_token_chars), "").alias("__cs")
    )
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        seqs = seqs.cache()
        pairs = (
            seqs.select(
                F.explode(
                    F.when(
                        F.size("__cs") >= 2,
                        F.transform(
                            F.sequence(F.lit(0), F.size("__cs") - 2),
                            lambda i: F.concat_ws(
                                "\x00",
                                F.element_at("__cs", i + 1),
                                F.element_at("__cs", i + 2),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<string>"))
                ).alias("__pair")
            )
            .groupBy("__pair")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("__pair").asc())
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["cnt"] < 2:
            break
        left, right = pairs[0]["__pair"].split("\x00")
        merges.append((left, right))

        def rewrite(pdfs, left=left, right=right):
            for pdf in pdfs:
                out = []
                for cs in pdf["__cs"]:
                    cs = list(cs)
                    merged, i = [], 0
                    while i < len(cs):
                        if i + 1 < len(cs) and cs[i] == left and cs[i + 1] == right:
                            merged.append(left + right)
                            i += 2
                        else:
                            merged.append(cs[i])
                            i += 1
                    out.append(merged)
                yield pd.DataFrame({"__cs": out})

        seqs = seqs.mapInPandas(rewrite, "__cs array<string>")
    return merges


def apply_bpe_merges(
    docs: DataFrame,
    merges: Sequence[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_token_chars: int = 20,
) -> DataFrame:
    """Encode documents with a learned BPE merge list — the apply half of
    :func:`learn_bpe_merges` (train on the corpus once, encode every
    shard with the frozen table; the tokenizer-training pipeline's
    serving step).

    Pure function of (text, merges): each word's character sequence is
    folded through the merge rules IN ORDER (standard BPE greedy apply —
    each rule replaces every adjacent occurrence of its pair before the
    next rule runs), so the encoding is deterministic on any
    partitioning.  Runs as one Arrow-batched ``mapInPandas`` map stage —
    the merge table broadcasts via closure capture (vocab-bounded, KBs),
    payload never shuffles.

    Returns ``(id, bpe_tokens array<string>, n_chars, n_bpe_tokens)`` —
    the compression ratio n_chars/n_bpe_tokens is the tokenizer-quality
    metric training pipelines monitor.
    """
    import pandas as pd

    rules = [tuple(m) for m in merges]

    def encode_word(chars: list[str]) -> list[str]:
        for a, b in rules:
            if len(chars) < 2:
                break
            out: list[str] = []
            i = 0
            while i < len(chars):
                if i + 1 < len(chars) and chars[i] == a and chars[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(chars[i])
                    i += 1
            chars = out
        return chars

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("bpe_tokens", T.ArrayType(T.StringType()), False),
            T.StructField("n_chars", T.LongType(), False),
            T.StructField("n_bpe_tokens", T.LongType(), False),
        ]
    )
    word_re = re.compile(r"[^a-z0-9]+")

    def batches(it):
        for pdf in it:
            ids, toks, ncs, nts = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in word_re.split((text or "").lower()) if w]
                encoded: list[str] = []
                nc = 0
                for w in words:
                    w = w[:max_token_chars]
                    nc += len(w)
                    encoded.extend(encode_word(list(w)))
                ids.append(int(doc_id))
                toks.append(encoded)
                ncs.append(nc)
                nts.append(len(encoded))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "bpe_tokens": toks,
                    "n_chars": ncs,
                    "n_bpe_tokens": nts,
                }
            )

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        batches, schema=out_schema
    )
