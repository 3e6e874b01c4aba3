"""Iterative graph algorithms as unrolled DataFrame plans.

Connected components (large-star/small-star) lives with the dedup
pipeline (`operators/dedup.py`); this module holds the *weighted
propagation* family — PageRank-style scores used to weight documents by
link centrality in corpus curation.

``pagerank_integer`` runs a FIXED number of power iterations with every
quantity held as scaled BIGINT ("micro-units" of total rank mass):

* rank₀(v)      = M DIV N                      (M = 10¹² mass units)
* contrib(u)    = rank(u) DIV outdeg(u)        (truncating division)
* rankₜ₊₁(v)    = (15·(M DIV N)) DIV 100
                + (85·Σ_in contrib(u)) DIV 100  (damping 0.85 = 85/100)

Integer addition is associative and commutative, so the shuffle-order
nondeterminism that makes floating-point PageRank drift between runs
(and between engines) cannot appear: the result is bit-identical on any
partitioning, any engine — which is what lets a SQL oracle hash-check an
iterative algorithm.  Max intermediate 85·10¹² < 2⁵³.

Each iteration is one shuffle (groupBy dst) plus one join back to the
rank table; the edge table is scan-pruned to (src, dst, outdeg).  At
100 TB-scale graphs the same plan holds — iterations are a fixed small
constant, and each round's exchange is keyed by dst exactly like any
large aggregation.  Dangling mass (sinks) is deliberately NOT
redistributed — truncation already leaks sub-unit mass, and the oracle
mirrors the same rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_integer"]

MASS = 10**12  # total rank mass in integer units


def pagerank_integer(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Integer-exact PageRank over ``nodes(node)`` / ``edges(src, dst)``.

    Returns ``(node, rank_units)`` with rank in MASS units (BIGINT).
    ``damping_pct`` is the damping factor in percent (85 → 0.85), kept
    integral so every arithmetic step is exact.
    """
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            F.col("node"), F.lit(0).cast("bigint").alias("rank_units")
        )
    base = MASS // n_nodes
    teleport = ((100 - damping_pct) * base) // 100

    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranked = nodes.select("node", F.lit(base).cast("bigint").alias("rank_units"))

    for _ in range(iterations):
        contrib = (
            edges.join(ranked, edges["src"] == ranked["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst"),
                F.expr("rank_units DIV outdeg").alias("contrib"),
            )
        )
        inflow = contrib.groupBy("dst").agg(F.sum("contrib").alias("inflow"))
        ranked = (
            nodes.join(inflow, nodes["node"] == inflow["dst"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * coalesce(inflow, 0)) DIV 100"
                    )
                )
                .cast("bigint")
                .alias("rank_units"),
            )
        )
    return ranked


# Broadcast knee for triangle_count's degree/adjacency attaches: below
# this Catalyst-estimated size of the (cached) edge set, the degree
# table and the out-neighbor adjacency (both O(m) or smaller) broadcast
# safely and every attach is map-side over the edge cache — measured
# r12 at sf0.1 (1.2M edges, 36.5 MiB): the two SMJ exchange+sort pairs
# per attach dominated the query.  Above the knee the r11 shape is
# kept: persist+materialize `oriented`, sort-merge the attaches —
# broadcasting an O(m) adjacency at 100 TB is impossible (8 GB cap).
# Missing stats count as LARGE (the safe, shuffle-based side).  Same
# 256 MiB constant as the dedup transport / rollup persist / asof
# detection knees.
_TRI_BROADCAST_MAX_BYTES = 256 << 20


def triangle_count(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Exact triangle count by degree-ordered orientation + per-edge
    adjacency intersection (compact-forward / edge-iterator).

    Input: undirected edges as ``a < b`` pairs (dedup upstream).  Each
    edge is oriented from its lower-(degree, id) endpoint to the higher;
    the orientation is acyclic, and every triangle then has EXACTLY one
    node with two out-edges (u→v, u→w, v→w), so it is counted once at
    its base edge (u, v): w ∈ N⁺(u) ∩ N⁺(v).

    Why this shape instead of wedge-generation + semi-join: the wedge
    set is Σ out-deg(u)² rows (41 M at sf0.1 for 1.2 M edges) and every
    wedge crosses the semi-join exchange.  Attaching out-neighbor ARRAYS
    to each edge shuffles only O(m) rows whose total payload is O(m)
    ints — the intersection runs inside the stage, codegen'd, no
    shuffle.  The per-task intersection work is Σ_(u,v)∈E
    (d⁺(u)+d⁺(v)) ≤ 2m·max-out-deg, and degree-ordering bounds
    max-out-deg by O(sqrt(m)) — a star vertex's edges all point inward,
    so it contributes empty arrays, not 10¹² wedges.  The naive
    ordered-triple join (the oracle's spelling) has no such bound.

    Returns a single row ``(n_triangles)``.
    """
    # The distinct edge set feeds three plan branches (degree count, the
    # two ed orientation joins); upstream `edges` is typically an
    # expensive generator (l49: per-order pair expansion + distinct).
    # Persist + eager materialization so it computes exactly once: lazy
    # persist alone still duplicates work when Spark launches a join's
    # two map stages concurrently (both sides racing to fill the cache).
    e = edges.select(F.col(a).alias("x"), F.col(b).alias("y")).distinct()
    e = e.persist()
    e.count()
    # Broadcast regime (r12): after the count the cache carries REAL
    # stats; below the knee every attach becomes a map-side
    # BroadcastHashJoin over the edge cache — the r11 plan paid two
    # exchange+sort pairs per attach (4 shuffles of the full edge set)
    # plus a second persist+count materialization, all job overhead at
    # this size.  Results are identical in both regimes (same joins,
    # same keys — only the physical strategy and caching points move).
    est = int(
        str(e._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    small = est < _TRI_BROADCAST_MAX_BYTES
    deg = (
        e.select(F.explode(F.array("x", "y")).alias("n"))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    if small:
        # deg feeds FOUR broadcast builds across the remaining jobs (two
        # attaches × oriented evaluated in both the adj job and the
        # final job); persist+materialize so each build scans |V| cached
        # rows instead of re-aggregating the edge cache (measured r12:
        # each rebuild was a full e-cache explode+agg pass).
        deg = deg.persist()
        deg.count()
        deg = F.broadcast(deg)
    key = lambda dcol, ncol: F.struct(F.col(dcol).alias("d"), F.col(ncol).alias("n"))  # noqa: E731
    ed = (
        e.join(deg.select(F.col("n").alias("x"), F.col("d").alias("__dx")), "x")
        .join(deg.select(F.col("n").alias("y"), F.col("d").alias("__dy")), "y")
        .select(
            "x", "y", key("__dx", "x").alias("__kx"), key("__dy", "y").alias("__ky")
        )
    )
    oriented = ed.select(
        F.when(F.col("__kx") < F.col("__ky"), F.col("x")).otherwise(F.col("y")).alias("src"),
        F.when(F.col("__kx") < F.col("__ky"), F.col("y")).otherwise(F.col("x")).alias("dst"),
    )
    if not small:
        # Large regime (the r11 shape): `oriented` feeds three branches
        # (adjacency build + both sides of the edge⋈adjacency attach);
        # materialize it once, then the edge cache can go — the
        # returned plan references only `oriented`.
        oriented = oriented.persist()
        oriented.count()
        e.unpersist()
    # N⁺ arrays (order irrelevant — intersection is a set operation).
    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("__nbrs"))
    if small:
        # adj feeds two broadcast builds; persist+materialize so the
        # exchange+collect_list runs once (a broadcast build per side
        # would otherwise race to fill a lazy cache and compute twice).
        # `oriented` itself stays UNmaterialized — it is a map-side
        # derivation over the edge cache (broadcast deg attaches), so
        # re-evaluating it per consumer is one in-memory scan, cheaper
        # than a third persist+count job.
        adj = adj.persist()
        adj.count()
    au = adj.select(F.col("src"), F.col("__nbrs").alias("__nu"))
    av = adj.select(F.col("src").alias("dst"), F.col("__nbrs").alias("__nv"))
    if small:
        au, av = F.broadcast(au), F.broadcast(av)
    # Inner joins are exact: (u,v) ∈ oriented ⇒ u has out-edges, and a
    # v with no out-edges has N⁺(v) = ∅ ⇒ contributes 0 triangles.
    return (
        oriented.join(au, "src")
        .join(av, "dst")
        .select(F.size(F.array_intersect("__nu", "__nv")).alias("__c"))
        .agg(F.coalesce(F.sum("__c"), F.lit(0)).cast("bigint").alias("n_triangles"))
    )
