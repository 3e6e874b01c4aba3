"""Sequence packing: assign documents to fixed token-budget context
windows (the concat-and-chunk step of an LLM pretraining pipeline).

The packing model is *streaming concatenation*: within a shard, documents
are laid end-to-end in a deterministic order and the resulting token
stream is cut into fixed-size chunks.  Each document therefore lands in a
first chunk and (if it straddles a boundary) a last chunk; downstream
loaders read chunk ``c`` as tokens ``[c*cap, (c+1)*cap)`` of the shard
stream.

Scale shape: one hash-partitioned window per shard — the only shuffle is
the exchange on ``shard``, and each shard sorts independently, so
parallelism equals the shard count (pick shards ≈ cluster cores at 100 TB;
a single global window would serialize into one task).  Everything is
JVM-side window arithmetic; no Python, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_col

__all__ = ["pack_sequences"]


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cap: int = 256,
    shards: int = 8,
    n_tokens: Column | None = None,
) -> DataFrame:
    """Chunk assignment per document under a ``cap``-token window budget.

    Returns ``(id, shard, n_tokens, chunk_first, chunk_last, straddles)``
    where ``chunk_first``/``chunk_last`` index the shard's chunk stream
    and ``straddles`` marks documents split across a chunk boundary
    (loaders may drop or re-join those).  Deterministic: shard is
    ``id mod shards`` and the in-shard order is ``id`` ascending, so the
    assignment is reproducible run-to-run and engine-to-engine.

    ``n_tokens`` defaults to the whitespace/punctuation token count of
    ``text_col``; pass a Column (e.g. a real tokenizer's length) to
    override.  Zero-token documents are floored to one token so every
    document occupies a chunk.
    """
    tok = n_tokens if n_tokens is not None else F.size(tokens_col(F.col(text_col)))
    d = docs.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(shards)).alias("shard"),
        F.greatest(tok.cast("bigint"), F.lit(1)).alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    d = d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return d.select(
        id_col,
        "shard",
        "n_tokens",
        F.expr(f"(cum_tokens - n_tokens) DIV {cap}").alias("chunk_first"),
        F.expr(f"(cum_tokens - 1) DIV {cap}").alias("chunk_last"),
        F.expr(f"(cum_tokens - n_tokens) DIV {cap} <> (cum_tokens - 1) DIV {cap}").alias(
            "straddles"
        ),
    )
