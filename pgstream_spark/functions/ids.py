"""Deterministic content-derived identifiers.

The reference decodes Postgres ``uuid`` columns (`FromRow.hs:217-230`)
and F-10 covers random UUID generation (nondeterministic by nature, so
rows-only in the gate).  Pipelines at scale want the OTHER uuid: a
*content-derived* id (RFC 4122 v3 shape — name hashed into a namespace)
so re-runs, retries, and two independent clusters mint the SAME id for
the same record — the idempotency primitive behind exactly-once sinks
and cross-corpus record linkage.

Pure column expressions (md5 + substrings), no UDF: runs at scan speed
and is oracle-checkable — this closes the UUID family's determinism gap.
The version nibble is '3' (md5-name-based per RFC 4122); the variant
nibble is pinned to '8' rather than masked from the hash — ids remain
RFC-shaped and collision-resistant, losing only 2 bits of hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["uuid3"]


def uuid3(name: Column, namespace: str = "pgstream") -> Column:
    """Deterministic RFC-4122-v3-shaped UUID string for ``name``."""
    h = F.md5(F.concat(F.lit(namespace + ":"), name))
    return F.concat(
        F.substring(h, 1, 8),
        F.lit("-"),
        F.substring(h, 9, 4),
        F.lit("-3"),
        F.substring(h, 14, 3),
        F.lit("-8"),
        F.substring(h, 18, 3),
        F.lit("-"),
        F.substring(h, 21, 12),
    )
