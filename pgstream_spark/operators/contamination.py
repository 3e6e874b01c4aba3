"""Benchmark-contamination check: n-gram overlap between a training
corpus and an evaluation set.

The standard decontamination step of an LLM data pipeline: for every
(train document, eval document) pair sharing at least ``min_shared``
distinct word n-grams, report the overlap count and the contamination
ratio relative to the eval document's n-gram inventory.  Pairs above a
ratio threshold are dropped from (or flagged in) the training mix.

Scale shape: the eval side (benchmarks — thousands of documents) is
broadcast, so the train side streams map-only through the join with no
shuffle of the 100 TB corpus; the only aggregation shuffles the matched
pairs, which are sparse.  The overlap ratio is reported in integer basis
points so the threshold comparison is float-free on every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_col, tokens_col

__all__ = ["contamination_pairs"]


def contamination_pairs(
    train: DataFrame,
    evalset: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """All (train_id, eval_id) pairs sharing ``>= min_shared`` distinct
    word ``n``-grams, with ``contamination_bp`` = shared / eval-total in
    basis points (integer division — engine-portable).

    Shingles are distinct per document (``shingles_col``), so the
    equi-join match count IS the distinct-overlap count — no second
    dedup pass.
    """
    sh = lambda df, alias: df.select(  # noqa: E731 — tiny local shaper
        F.col(id_col).alias(alias),
        shingles_col(tokens_col(F.col(text_col)), n).alias("sh"),
    )
    # spread the corpus side across all cores before the tokenize-heavy
    # explode: the eval side broadcasts, so this map stage IS the whole
    # wall, and a single-row-group train file pinned it to one task
    # (measured 13.5 s -> ~1 s at sf0.1 — the minhash_signatures lesson)
    nparts = train.sparkSession.sparkContext.defaultParallelism
    tr = sh(train.repartition(nparts, F.col(id_col)), "train_id").select(
        "train_id", F.explode("sh").alias("s")
    )
    # the eval side is consumed twice (sizes + the broadcast join build):
    # spread its tokenize too and persist so it computes once
    ev_sh = sh(evalset.repartition(nparts, F.col(id_col)), "eval_id").persist()
    ev_sizes = ev_sh.select("eval_id", F.size("sh").alias("eval_ngrams"))
    ev = ev_sh.select("eval_id", F.explode("sh").alias("s"))
    pairs = (
        tr.join(F.broadcast(ev), "s")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )
    return pairs.join(F.broadcast(ev_sizes), "eval_id").select(
        "train_id",
        "eval_id",
        "shared_ngrams",
        "eval_ngrams",
        F.expr("shared_ngrams * 10000 DIV eval_ngrams").alias("contamination_bp"),
    )
