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

__all__ = ["pack_sequences", "chunk_windows"]


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


def chunk_windows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Split each document into overlapping ``window``-token chunks every
    ``stride`` tokens — the RAG / embedding-preparation step (one output
    row per context window, with ``window - stride`` tokens of overlap so
    no span falls on a hard boundary).

    Complements :func:`pack_sequences`: packing assigns whole documents
    to training-context budgets; chunking materializes sub-document
    windows as rows.  Pure per-row array arithmetic (``sequence`` of
    chunk starts → ``posexplode`` → ``slice``) — map-only, runs at scan
    speed, output is at most ``ceil(n/stride)`` rows per doc.

    Returns ``(id_col, chunk_idx, n_chunk_tokens, chunk_text)``;
    zero-token documents yield no row.
    """
    if stride <= 0 or window < stride:
        raise ValueError("need stride >= 1 and window >= stride")
    t = tokens_col(F.col(text_col))
    base = docs.select(F.col(id_col), t.alias("__t")).filter(F.size("__t") >= 1)
    starts = F.sequence(F.lit(0), F.size("__t") - 1, F.lit(stride))
    exploded = base.select(
        id_col, "__t", F.posexplode(starts).alias("__i", "__s")
    )
    chunk = F.slice("__t", F.col("__s") + 1, window)
    return exploded.select(
        id_col,
        F.col("__i").cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )
