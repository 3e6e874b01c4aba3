"""Streaming near-duplicate detection — MinHash+LSH over managed state.

Batch near-dup (`operators/dedup.py`) buckets MinHash band hashes and
self-joins within buckets.  A *stream* cannot self-join its own history,
so the LSH bucket table becomes **state**: each (band, bucket) key
remembers the first document that claimed it (the canonical), and every
later arrival in the same bucket is emitted as a near-dup candidate
against that canonical — the streaming analogue of the batch
candidate-pair set, shaped as a star around the first-seen member.

Pipeline (one shuffle per micro-batch, keyed by bucket):

1. ``mapInPandas`` — per-document MinHash signature + band buckets,
   computed with the SAME tokenize/shingle/md5-affine semantics as the
   batch ``minhash_signatures(hash_fn="md5")`` (`dedup.py:232-301`), in
   vectorized Python (md5 is reproducible in Python; xxhash64 is not).
   Stateless, so it composes with streaming.
2. ``groupBy(bucket).applyInPandasWithState`` — canonical-per-bucket
   state; emits ``(doc_id, dup_of, band, bucket)`` rows in append mode.

Equivalence contract (pinned by tests/test_stateful.py): the set of
*dup-involved* documents — flagged docs plus their canonicals — equals
the batch LSH bucket membership (every doc sharing a bucket with
another) at the same parameters, regardless of how the stream is cut
into micro-batches.  Within one batch, ties for an unclaimed bucket go
to the smallest doc id, so replays are deterministic.

State sizing at scale: one row per distinct (band, bucket) ≈ bands ×
|corpus| worst case.  Rotate state by corpus epoch (new checkpoint per
ingest wave) or wrap with a TTL timeout when dedup only needs to look
back a bounded window; exact long-horizon dedup belongs to the batch
``dedup_against_history`` anti-join (`dedup.py:94`).
"""

from __future__ import annotations

import hashlib
import random
import re
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["minhash_band_rows", "streaming_minhash_candidates", "batch_band_rows"]

_MASK = (1 << 31) - 1
_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _coeffs(num_perm: int, seed: int) -> list[tuple[int, int]]:
    # identical family to dedup.minhash_signatures (same seed → same perms)
    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 31) | 1, rng.randrange(0, 1 << 31))
        for _ in range(num_perm)
    ]


def _shingles(text: str, n: int) -> set[str]:
    toks = [t for t in _TOKEN_RE.split(text.lower()) if t]
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _band_rows_for_doc(
    doc_id: Any,
    text: str,
    coeffs: list[tuple[int, int]],
    n: int,
    bands: int,
    rows_per_band: int,
) -> list[tuple[Any, int, str]]:
    hashes = [
        int(hashlib.md5(s.encode()).hexdigest()[:8], 16) & _MASK
        for s in _shingles(text, n)
    ]
    sig = [min(h * a + b for h in hashes) for a, b in coeffs]
    out = []
    for i in range(bands):
        chunk = sig[i * rows_per_band : (i + 1) * rows_per_band]
        digest = hashlib.md5(
            (str(i) + ":" + ",".join(map(str, chunk))).encode()
        ).hexdigest()[:16]
        out.append((doc_id, i, digest))
    return out


def minhash_band_rows(
    pdfs: Iterator[pd.DataFrame],
    id_col: str,
    text_col: str,
    n: int,
    num_perm: int,
    seed: int,
    bands: int,
    rows_per_band: int,
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: documents → (doc_id, band, bucket) rows."""
    coeffs = _coeffs(num_perm, seed)
    for pdf in pdfs:
        rows: list[tuple[Any, int, str]] = []
        for doc_id, text in zip(pdf[id_col], pdf[text_col]):
            rows.extend(
                _band_rows_for_doc(doc_id, text or "", coeffs, n, bands, rows_per_band)
            )
        yield pd.DataFrame(rows, columns=["doc_id", "band", "bucket"])


def batch_band_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    seed: int = 42,
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Batch view of the same banding — the stream==batch comparator."""
    return docs.select(id_col, text_col).mapInPandas(
        lambda it: minhash_band_rows(
            it, id_col, text_col, n, num_perm, seed, bands, rows_per_band
        ),
        "doc_id long, band int, bucket string",
    )


def streaming_minhash_candidates(
    sdf: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    seed: int = 42,
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Streaming MinHash+LSH near-dup candidates.

    Emits ``(doc_id, dup_of, band, bucket)`` append rows: ``doc_id``
    shares LSH bucket ``bucket`` (of band ``band``) with the earlier-
    seen canonical ``dup_of``.  A document colliding in several bands
    yields one row per colliding band — downstream consumers dedupe with
    ``dropDuplicates(["doc_id"])`` or aggregate for confidence.
    """
    band_rows = sdf.select(id_col, text_col).mapInPandas(
        lambda it: minhash_band_rows(
            it, id_col, text_col, n, num_perm, seed, bands, rows_per_band
        ),
        "doc_id long, band int, bucket string",
    )

    def flag(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band, bucket = key
        (canonical,) = state.get if state.exists else (None,)
        out: list[tuple[int, int]] = []
        for pdf in pdfs:
            for doc_id in sorted(pdf["doc_id"]):  # smallest id claims first
                doc_id = int(doc_id)
                if canonical is None:
                    canonical = doc_id
                elif doc_id != canonical:
                    out.append((doc_id, canonical))
        state.update((canonical,))
        if out:
            yield pd.DataFrame(
                [(d, c, band, bucket) for d, c in out],
                columns=["doc_id", "dup_of", "band", "bucket"],
            )

    return band_rows.groupBy("band", "bucket").applyInPandasWithState(
        flag,
        outputStructType="doc_id long, dup_of long, band int, bucket string",
        stateStructType="canonical long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
