"""Physical-plan assertions: the properties that matter at 100 TB —
predicate pushdown, column pruning, broadcast joins, codegen — pinned as
tests so regressions are loud (SURVEY §4.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgstream_spark.plans import (
    pushed_filters,
    scan_columns,
    uses_broadcast_join,
    wholestage_codegen_ids,
)
from pgstream_spark.sources.parquet import load_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 1000
    ).select("o_orderkey")
    filters = pushed_filters(df)
    assert any("o_totalprice" in f for f in filters), filters


def test_column_pruning(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cols = scan_columns(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}


def test_small_dim_join_broadcasts(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    df = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    assert uses_broadcast_join(df)


def test_aggregation_uses_codegen(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity"))
    )
    assert wholestage_codegen_ids(df), "aggregate fell out of codegen"


def test_inventory_scan_heavy_queries_push_filters(spark, sf_dir):
    # p4_between filters on both columns it scans — both must push down
    from pgstream_spark.inventory import QUERIES

    df = QUERIES["p4_between"](spark, sf_dir)
    filters = pushed_filters(df)
    assert any("o_totalprice" in f for f in filters)
    assert any("o_orderdate" in f for f in filters)


def test_tpch_q10_shape_broadcasts_dims_and_pushes_returnflag(spark, sf_dir):
    # g19: lineitem must stay the streaming side (never broadcast), the
    # returnflag filter must reach its scan, and the dimension joins
    # must be broadcast — the only plan that survives 100x data.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["g19_tpch_q10_returns"](spark, sf_dir)
    assert any("EqualTo(l_returnflag" in f for f in pushed_filters(df))
    txt = explain_string(df, "simple")
    assert "BroadcastHashJoin" in txt
    assert "CartesianProduct" not in txt


def test_tpch_q19_disjunction_partially_pushes_to_scan(spark, sf_dir):
    # g20: Catalyst must extract the per-side disjuncts — the lineitem
    # scan carries the OR of quantity ranges even though the full
    # predicate spans the join.
    from pgstream_spark.inventory import QUERIES

    df = QUERIES["g20_tpch_q19_disjunctive"](spark, sf_dir)
    filters = pushed_filters(df)
    assert any("l_quantity" in f and "Or(" in f for f in filters)


def test_mixture_sample_is_map_only(spark, sf_dir):
    # l9: the sampler must add no shuffle — filter straight on the scan.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["l9_source_mixture"](spark, sf_dir)
    txt = explain_string(df, "simple")
    assert "Exchange" not in txt


def test_engine_explain_returns_plan(engine):
    text = engine.explain("SELECT count(*) AS n FROM orders", mode="formatted")
    assert "Physical Plan" in text or "AdaptiveSparkPlan" in text


def test_jdbc_reader_configuration(spark):
    # S-2: plan-construction layer only — no live Postgres in the test env
    from pgstream_spark.sources.jdbc import PostgresSource

    src = PostgresSource(host="db.example", database="invest", user="u")
    assert src.url == "jdbc:postgresql://db.example:5432/invest"
    reader = src.reader(
        spark, "deltas", partition_column="sid", lower_bound=0,
        upper_bound=100_000, num_partitions=16,
    )
    assert reader is not None
    import pytest

    with pytest.raises(ValueError):
        src.reader(spark, "deltas", partition_column="sid")


def test_asof_join_plan_shape(spark, sf_dir):
    # SCALE.md claim: as-of join = one shuffle + ONE in-partition sort,
    # never a nested loop or a range-exploded join.
    from pgstream_spark.operators import asof_join
    from pgstream_spark.plans.explain import explain_string
    from pgstream_spark.sources.parquet import load_events, load_table

    ev = load_events(spark, sf_dir).select("event_id", "user_id", "ts")
    ordd = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .withColumnRenamed("o_custkey", "user_id")
    )
    j = asof_join(ev, ordd, on="user_id", left_ts="ts", right_ts="o_orderdate")
    txt = explain_string(j, "simple")
    assert "NestedLoop" not in txt
    assert txt.count("Sort") == 1, txt  # the single window sort
    assert "Join" not in txt  # no join operator at all — union+window


def test_interval_join_plan_shape(spark, sf_dir):
    # SCALE.md claim: bucketed range join plans as an equi hash/merge join
    # with a residual filter — never BroadcastNestedLoopJoin.
    from pgstream_spark.operators import interval_join
    from pgstream_spark.plans.explain import explain_string
    from pgstream_spark.sources.parquet import load_events

    ev = load_events(spark, sf_dir)
    intervals = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("s"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("e"),
    )
    ij = interval_join(
        ev.select("event_id", "user_id", "ts"), intervals,
        "ts", "s", "e", bucket_seconds=3600, extra_on=["user_id"],
    )
    txt = explain_string(ij, "simple")
    assert "NestedLoop" not in txt
    assert ("HashJoin" in txt) or ("SortMergeJoin" in txt)


def test_embedding_neardup_lsh_has_no_cross_join(spark, sf_dir):
    # VERDICT r1: the shipped near-dup path must not be the all-pairs
    # crossJoin — candidates come from an equi-join on the LSH bucket.
    from pgstream_spark.operators import embedding_neardup_lsh
    from pgstream_spark.plans.explain import explain_string
    from pgstream_spark.sources.parquet import load_table

    e = load_table(spark, sf_dir, "embeddings")
    txt = explain_string(embedding_neardup_lsh(e), "simple")
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoop" not in txt


def test_q21_shape_has_no_nested_loop_or_cartesian(spark, sf_dir):
    # g26 rewrites EXISTS/NOT-EXISTS as aggregate semi-joins — the plan
    # must contain only hash/merge joins, never a correlated re-scan
    # shape (BroadcastNestedLoop / CartesianProduct).
    from pgstream_spark.inventory import QUERIES

    plan = (
        QUERIES["g26_tpch_q21_sole_late"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "LeftSemi" in plan


def test_q8_market_share_broadcasts_dimensions(spark, sf_dir):
    from pgstream_spark.inventory import QUERIES

    df = QUERIES["g27_tpch_q8_market_share"](spark, sf_dir)
    assert uses_broadcast_join(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_contamination_query_broadcasts_eval_side(spark, sf_dir):
    from pgstream_spark.inventory import QUERIES

    plan = (
        QUERIES["l11_contamination"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # train side streams map-only


def test_pivot_uses_declared_values_no_distinct_job(spark, sf_dir):
    # pivot with an explicit value list avoids the eager distinct-values
    # collection (a separate Spark job before planning); the remaining
    # plan is Spark's standard two-phase pivot aggregate — pin that no
    # third exchange (e.g. an Expand-based distinct) sneaks in.
    from pgstream_spark.inventory import QUERIES

    plan = (
        QUERIES["g29_pivot"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 2, plan


def test_tficf_broadcasts_vocabulary_side(spark, sf_dir):
    from pgstream_spark.operators.terms import tficf_top_terms
    from pgstream_spark.plans.explain import explain_string

    d = load_table(spark, sf_dir, "documents")
    plan = explain_string(tficf_top_terms(d))
    assert "BroadcastHashJoin" in plan  # df-vocabulary join stays shuffle-free


def test_posting_lists_filter_before_collect(spark, sf_dir):
    from pgstream_spark.operators.terms import posting_lists
    from pgstream_spark.plans.explain import explain_string

    d = load_table(spark, sf_dir, "documents")
    plan = explain_string(posting_lists(d))
    # the df-bounded term set joins broadcast; collect_list happens after
    assert "BroadcastHashJoin" in plan
    assert "collect_list" in plan


def test_quantize_is_map_only(spark, sf_dir):
    # l19: int8 quantization must run at scan speed — two higher-order
    # functions per row, zero exchanges.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["l19_embedding_quantize"](spark, sf_dir), "simple")
    assert "Exchange" not in txt
    assert "BatchScan" in txt or "FileScan" in txt


def test_containment_reads_only_needed_columns(spark, sf_dir):
    # l18: column pruning must reach the documents scan — doc_id + text,
    # not lang/source/n_chars.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import scan_columns

    cols = scan_columns(QUERIES["l18_containment_dedup"](spark, sf_dir))
    assert cols, "no scan found"
    assert "lang" not in cols and "n_chars" not in cols, cols


def test_truncated_lm_join_is_broadcast(spark, sf_dir):
    # l96: the TRUNCATED LM is bounded by construction
    # (min(|w1 vocab|·K, max_bigrams) rows) — scoring must broadcast it.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["l96_truncated_lm"](spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in txt


def test_exact_lm_join_not_force_broadcast(spark, sf_dir):
    # l21's exact LM grows with the corpus — the plan must NOT carry an
    # explicit broadcast hint (AQE may still broadcast at gate scale,
    # which is fine; a hard hint at 100 TB is an OOM).
    from pgstream_spark.inventory import QUERIES

    df = QUERIES["l21_bigram_lm_score"](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed


def test_ccnet_buckets_no_language_sort_window(spark, sf_dir):
    # l94 (VERDICT r9 "weak"): the equal-frequency cut must not sort a
    # whole language in one task.  The plan may keep two windows —
    # the running total over the (lang, mean_micro) HISTOGRAM
    # (≤ 1e6+1 rows per language by integer quantization) and the
    # row_number tiebreak over (lang, mean_micro) boundary-tie groups —
    # but never ntile, and never a rank over a lang-alone partition.
    import re

    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["l94_ccnet_buckets"](spark, sf_dir), "simple")
    assert "ntile" not in txt.lower()

    def partition_cols(spec: str) -> list[str]:
        # partition columns precede the first ordered (ASC/DESC) column
        cols = []
        for tok in spec.split(", "):
            if " ASC" in tok or " DESC" in tok:
                break
            cols.append(tok)
        return cols

    found = 0
    for m in re.finditer(r"(\w+\([^)]*\)) windowspecdefinition\(([^)]*)\)", txt):
        fn, spec = m.group(1), m.group(2)
        found += 1
        part = ", ".join(partition_cols(spec))
        if "mean_micro" not in part:
            # lang-alone partition: only the bounded-histogram running
            # total may live there — never a rank over corpus rows
            assert fn.startswith("sum("), (fn, spec)
    assert found >= 2  # the running total + the tie row_number


def test_ohlc_bars_single_exchange(spark, sf_dir):
    import re

    from pgstream_spark.operators.ohlc import ohlc_bars
    from pgstream_spark.plans.explain import explain_string
    from pgstream_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = explain_string(
        ohlc_bars(ev, "ts", "value", ["event_type"], 3600, tie_col="event_id")
    )
    # both rank windows and the aggregate share ONE hash exchange on
    # (key, bucket); only an in-partition re-sort sits between them
    assert len(re.findall(r"\(\d+\) Exchange\s*$", plan, re.M)) == 1
    assert len(re.findall(r"\(\d+\) Window\s*$", plan, re.M)) == 2


def test_ewma_single_exchange_no_python(spark, sf_dir):
    import re

    from pgstream_spark.operators.decay import ewma_time_decay
    from pgstream_spark.plans.explain import explain_string
    from pgstream_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = explain_string(
        ewma_time_decay(
            ev, "ts", "value", ["event_type"], tau_seconds=7200.0,
            t0_epoch_s=1_704_067_200, tie_col="event_id",
        )
    )
    assert len(re.findall(r"\(\d+\) Exchange\s*$", plan, re.M)) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_robust_zscore_broadcasts_stats(spark, sf_dir):
    from pgstream_spark.operators.robust import robust_zscore_stats
    from pgstream_spark.plans.explain import explain_string
    from pgstream_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = explain_string(robust_zscore_stats(ev, "event_type", "value"))
    # group-sized stats tables broadcast back onto the fact rows — the
    # fact side must never sort-merge
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bm25_broadcasts_query_side(spark, sf_dir):
    from pgstream_spark.operators.retrieval import bm25_scores
    from pgstream_spark.plans.explain import explain_string
    from pgstream_spark.sources.parquet import load_table

    d = load_table(spark, sf_dir, "documents")
    plan = explain_string(bm25_scores(d, ["spark", "window"]))
    # query-term df table broadcast; corpus side never sort-merges
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sessionize_single_exchange(spark, sf_dir):
    import re

    from pgstream_spark.operators.sessionize import sessionize
    from pgstream_spark.plans.explain import explain_string
    from pgstream_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = explain_string(
        sessionize(ev, "ts", ["user_id"], 1800, tie_col="event_id")
    )
    # lag + running-sum share one partition and order: one exchange
    assert len(re.findall(r"\(\d+\) Exchange\s*$", plan, re.M)) == 1
    assert "BatchEvalPython" not in plan


def test_weighted_sample_uses_window_group_limit(spark, sf_dir):
    from pgstream_spark.operators.mixture import weighted_sample_ares
    from pgstream_spark.plans.explain import explain_string
    from pgstream_spark.sources.parquet import load_table

    d = load_table(spark, sf_dir, "documents")
    plan = explain_string(
        weighted_sample_ares(d, "n_chars", k=20, group_cols=["source"])
    )
    # rank-limit pushdown: per-partition top-k heaps truncate BEFORE the
    # exchange, so the shuffle carries <= k rows per group per map task
    assert "WindowGroupLimit" in plan


def test_hybrid_rrf_ann_vector_side_has_no_cross_join(spark, sf_dir):
    # VERDICT r2: l27's vector ranking was brute-force all-pairs cosine —
    # a scale-killer at corpus size.  l27b must source vector candidates
    # from the LSH (table, bucket) equi-join: no cartesian / nested-loop
    # anywhere in the fused plan except the one-row full-outer RRF join.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["l27b_hybrid_rrf_ann"](spark, sf_dir)
    txt = explain_string(df, "simple")
    assert "CartesianProduct" not in txt


def test_salted_asof_plan_has_no_join_node(spark, sf_dir):
    # j8b: salting must keep the union + window carry-forward shape (no
    # Join operator — the salt only widens the window partitioning key).
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["j8b_asof_salted"](spark, sf_dir)
    txt = explain_string(df, "simple")
    assert "SortMergeJoin" not in txt
    assert "ShuffledHashJoin" not in txt
    assert "CartesianProduct" not in txt


def test_duplicate_spans_has_no_doc_self_join(spark, sf_dir):
    # l37's verdict join is hash-keyed (window-hash), never a doc×doc
    # self-join — the property that keeps span dedup linear at corpus
    # scale.  No cartesian/nested-loop anywhere.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["l37_duplicate_spans"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoop" not in txt


def test_source_quota_cap_uses_window_group_limit(spark, sf_dir):
    # l39: the cap must truncate per partition BEFORE the exchange
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["l39_source_quota_cap"](spark, sf_dir))
    assert "WindowGroupLimit" in txt


def test_bloom_prefilter_join_plan_shape(spark, sf_dir):
    # j12: the Bloom probes must be BROADCAST semi-joins (map-only on
    # the fact side — no exchange before the filters), and the final
    # exact join must not be a cartesian/nested-loop.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["j12_bloom_prefilter_join"](spark, sf_dir), "simple")
    assert txt.count("BroadcastHashJoin") >= 2  # one per Bloom seed
    assert "LeftSemi" in txt
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoop" not in txt


def test_pagerank_iterations_have_no_cartesian(spark, sf_dir):
    # l42: every iteration joins by key (hash/sort-merge); the classic
    # failure mode — an accidental cross product from a missing join
    # condition in the rank re-attach — must never appear.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["l42_pagerank"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoop" not in txt


def test_null_safe_join_compiles_to_hash_join(spark, sf_dir):
    # j13: eqNullSafe must become a hash join on (coalesce(k), isnull(k))
    # — NOT a nested-loop theta join; NULL-safe equality is still an
    # equi-join to the planner.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["j13_null_safe_join"](spark, sf_dir), "simple")
    assert "HashJoin" in txt and "coalesce" in txt
    assert "BroadcastNestedLoop" not in txt and "CartesianProduct" not in txt


def test_recursive_cte_uses_union_loop(spark, sf_dir):
    # p12: native recursion executes as UnionLoop — proof the engine
    # feature (not a hand-unrolled emulation) carries the query.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["p12_recursive_cte"](spark, sf_dir), "simple")
    assert "UnionLoop" in txt


class TestExecutedMetrics:
    """plans/metrics.py — evidence, not eyeballs: executed-plan metrics
    prove the shuffle-economy claims the docstrings make."""

    def test_map_side_combine_shrinks_shuffle(self, spark, sf_dir):
        from pgstream_spark.inventory import QUERIES
        from pgstream_spark.plans.metrics import metric_totals

        t = metric_totals(QUERIES["g1_tpch_q1"](spark, sf_dir))
        # partial aggregation must combine before the exchange: the
        # shuffle carries per-(partition, group) partials, orders of
        # magnitude below the scanned lineitem rows
        assert t["scan_rows"] >= 6000
        assert 0 < t["shuffle_records"] < t["scan_rows"] / 10
        assert t["spill_bytes"] == 0

    def test_bloom_prefilter_reduces_join_shuffle(self, spark, sf_dir):
        import pyspark.sql.functions as F
        from pgstream_spark.operators.bloom import bloom_prefilter_join
        from pgstream_spark.plans.metrics import metric_totals
        from pgstream_spark.sources.parquet import load_table

        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
        urgent = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        # model the big-dimension case the operator exists for: broadcast
        # off, so both joins must shuffle — the filter tables themselves
        # stay broadcast (explicit F.broadcast hint survives the config)
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plain = li.join(urgent, li["l_orderkey"] == urgent["o_orderkey"])
            pre = bloom_prefilter_join(
                li, urgent, "l_orderkey", "o_orderkey", m_bits=10
            )
            t_plain = metric_totals(plain)
            t_pre = metric_totals(pre)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        # identical results (proven elsewhere); the prefilter must move
        # FEWER fact rows through the join exchange
        assert t_pre["shuffle_records"] < t_plain["shuffle_records"]

    def test_executed_metrics_node_listing(self, spark, sf_dir):
        from pgstream_spark.inventory import QUERIES
        from pgstream_spark.plans.metrics import executed_metrics

        nodes = executed_metrics(QUERIES["g2_global_agg"](spark, sf_dir))
        names = [n for n, _, _ in nodes]
        assert names[0].startswith("AdaptiveSparkPlan") or "HashAggregate" in names
        assert any("HashAggregate" in n for n in names)


def test_keyset_pagination_pushes_leading_bound(spark, sf_dir):
    # o7: the decomposed keyset predicate must reach the scan — the
    # leading-column bound is what makes seek pagination O(page) via
    # row-group skipping (a struct comparison never pushes; verified
    # when this query was authored).
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["o7_keyset_pagination"](spark, sf_dir)
    txt = explain_string(df, "formatted")
    assert "PushedFilters" in txt
    assert "GreaterThanOrEqual(o_orderdate" in txt
    # Non-vacuous (VERDICT r4): the cursor sits inside the data range,
    # so page 2 must be a real, full page — 0 rows here means the
    # pagination logic is never exercised by the oracle.
    rows = df.collect()
    assert len(rows) == 50
    keys = [(r.o_orderdate, r.o_orderkey) for r in rows]
    assert keys == sorted(keys)


def test_basket_pairs_broadcasts_counts_no_cartesian(spark, sf_dir):
    # g43: the only cross join is the broadcast scalar totals attach;
    # item counts broadcast; no nested loop anywhere
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["g43_basket_pairs"](spark, sf_dir)
    txt = explain_string(df, "simple")
    assert "CartesianProduct" not in txt
    assert "BroadcastHashJoin" in txt


def test_prefix_filter_join_has_no_global_window(spark, sf_dir):
    # l52: the rarity order is per-document sort_array — a global
    # row_number over the vocabulary would serialize at corpus scale
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["l52_prefix_filter_join"](spark, sf_dir)
    txt = explain_string(df, "simple")
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoop" not in txt
    # any Window node over a constant/empty partitionBy is a global sort
    assert "windowspecdefinition()" not in txt.replace(" ", "").lower()
    # the PPJoin positional filter must survive optimization — it is the
    # 3.8× candidate cut that lets the 500k-doc decade leg complete
    # (SCALE.md round-6); its integer-ceiling overlap bound renders as a
    # DIV by (1e6 + tm) in the join condition.  Checked on the OPTIMIZED
    # plan (the extended explain also prints the pre-optimization
    # analyzed plan, where the predicate would appear even if the
    # optimizer later dropped it).
    optimized = df._jdf.queryExecution().optimizedPlan().toString().lower()
    assert " div 1600000" in optimized


def test_threshold_sweep_prefix_no_full_shingle_self_join(spark, sf_dir):
    # l72b: the shipped sweep plan must be the PPJoin prefix-filtered
    # form — l72's exact all-pairs twin self-joins FULL exploded shingle
    # sets (hot-shingle quadratic blowup on a shared-vocabulary corpus);
    # the at-scale plan self-joins only SLICED rarity prefixes with the
    # positional overlap bound intact.  Same oracle SQL, different plan
    # (the l55/l87b two-plans-one-hash discipline).
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["l72b_dedup_threshold_sweep_prefix"](spark, sf_dir)
    txt = explain_string(df, "simple")
    assert "CartesianProduct" not in txt
    # one BroadcastNestedLoopJoin IS expected: the bounded cut-list
    # cross join (5 broadcast rows against the stats frame) — but never
    # more than that one
    assert txt.count("BroadcastNestedLoop") <= 1
    optimized = df._jdf.queryExecution().optimizedPlan().toString().lower()
    # the PPJoin positional filter at the lowest cut (t=0.5 → integer
    # ceiling DIV by 1e6+tm = 1500000) survived optimization — it only
    # exists on the prefix-candidate path, never in the all-pairs twin
    # (a raw "slice(" marker would NOT distinguish the plans:
    # shingles_col builds its n-gram windows with slice in both)
    assert " div 1500000" in optimized
    # and the rarity order is per-document sort_array — no global window
    assert "windowspecdefinition()" not in optimized.replace(" ", "")
    # differential pin: the exact twin's plan lacks the positional
    # filter, so the assertion genuinely distinguishes the two plans
    exact = (
        QUERIES["l72_dedup_threshold_sweep"](spark, sf_dir)
        ._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    assert " div 1500000" not in exact


def test_fuzzy_join_probe_side_parallelized(spark, sf_dir):
    # j15: the CPU-bound Levenshtein probe must not inherit a single-file
    # scan's one-partition layout — the operator repartitions round-robin
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["j15_fuzzy_blocked"](spark, sf_dir)
    txt = explain_string(df, "simple")
    assert "RoundRobinPartitioning" in txt


def test_transition_and_cusum_single_key_shuffle(spark, sf_dir):
    # t25/t27: exactly ONE hash exchange on the key feeds every window —
    # lag/prefix/total share the partitioning; the only other exchanges
    # are over the tiny aggregate (t25) or the final single partition
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    t27 = explain_string(QUERIES["t27_cusum_changepoint"](spark, sf_dir), "simple")
    assert t27.count("hashpartitioning(user_id") <= 2  # window + argmax agg
    assert "CartesianProduct" not in t27


def test_kmv_pair_stats_joins_are_sketch_sized(spark, sf_dir):
    # l50: after the bottom-k windows every join input is <= k rows per
    # group — no cartesian blowup, no nested loop over the corpus
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["l50_kmv_setops"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in txt


def test_dsir_stats_join_is_broadcast(spark, sf_dir):
    # l56: the bucket-stats table is <= 1024 rows — the scoring pass
    # must broadcast it, never shuffle the exploded token table for a
    # sort-merge join (that shuffle would dominate at corpus scale)
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["l56_dsir_importance"](spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in txt
    assert "SortMergeJoin" not in txt
    assert "CartesianProduct" not in txt


def test_streaks_single_user_partitioning(spark, sf_dir):
    # w17: row_number window, runs agg, and per-user rollup all key on
    # user_id — one hashpartitioning lineage (AQE-reused), no extra
    # exchanges sneaking in between the three stages
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["w17_streaks"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in txt
    # distinct + window + two aggs: at most 3 user-keyed exchanges
    assert txt.count("hashpartitioning(user_id") <= 3


def test_moment_stats_single_aggregation_pass(spark, sf_dir):
    # g49: all four power sums come from ONE partial+final aggregate
    # over the scan (map-side combinable) — exactly 1 shuffle, no join
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["g49_moment_stats"](spark, sf_dir), "simple")
    assert "Join" not in txt
    assert txt.count("Exchange hashpartitioning") == 1


def test_dsir_shuffle_carries_combined_counts(spark, sf_dir):
    # l56 executed-metric proof: the exchange moves per-(doc,bucket)
    # COMBINED counts, not the raw token stream — the partial aggregate
    # must shrink the shuffle well below the exploded token count
    import pyspark.sql.functions as F
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.metrics import metric_totals
    from pgstream_spark.sources.parquet import load_table

    d = load_table(spark, sf_dir, "documents")
    n_tokens = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .count()
    )
    t = metric_totals(QUERIES["l56_dsir_importance"](spark, sf_dir))
    assert t["shuffle_records"] > 0
    assert t["shuffle_records"] < n_tokens / 2
    assert t["spill_bytes"] == 0


def test_semdedup_pairs_are_equi_join(spark, sf_dir):
    # l58: the within-cluster pair generation must be an equi-join on
    # the cluster key — never a cartesian/nested-loop — and the whole
    # quantized-cosine rule stays JVM-side
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["l58_semdedup"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoop" not in txt
    assert "BatchEvalPython" not in txt


def test_span_scrub_no_doc_self_join(spark, sf_dir):
    # l59: coverage comes from the hash-agg dup table joined back on the
    # window hash — no doc×doc join, everything JVM-side
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["l59_span_scrub"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoop" not in txt
    assert "BatchEvalPython" not in txt


def test_snapshot_drift_broadcast_only_joins(spark, sf_dir):
    # l60: bin-table joins are broadcast (O(bins) rows); the only
    # nested-loop is the documented one-row scalar attach
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["l60_snapshot_drift"](spark, sf_dir), "simple")
    assert "SortMergeJoin" not in txt
    assert "CartesianProduct" not in txt
    assert "BatchEvalPython" not in txt


def test_stratified_split_single_exchange(spark, sf_dir):
    # l61: count-over + row_number + boundaries ride ONE strata-keyed
    # hash partitioning — no join, no second shuffle
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["l61_stratified_split"](spark, sf_dir), "simple")
    assert "Join" not in txt
    assert txt.count("Exchange hashpartitioning") == 1


def test_autocorr_two_exchanges_no_union_blowup(spark, sf_dir):
    # t32: mean agg + (window sort → final agg) = 2 key exchanges; the
    # per-lag rows come from ONE explode, not a 3-leg union that would
    # re-run the pipeline per leg (6 exchanges before the fix)
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["t32_autocorr"](spark, sf_dir), "simple")
    assert txt.count("Exchange hashpartitioning") <= 2
    assert "SortMergeJoin" not in txt and "CartesianProduct" not in txt


def test_tpch_completion_tier_broadcasts_dims(spark, sf_dir):
    # g58/g59/g61: every dimension side (part, customer, nation) rides a
    # BroadcastHashJoin; the only shuffle is the fact-key exchange.  No
    # cartesian anywhere in the completion tier.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    for name in (
        "g58_tpch_q10_returned_items",
        "g59_tpch_q14_promo_effect",
        "g61_tpch_q19_discounted_revenue",
    ):
        txt = explain_string(QUERIES[name](spark, sf_dir), "simple")
        assert "CartesianProduct" not in txt, name
        assert "BroadcastHashJoin" in txt, name


def test_tpch_q22_anti_join_and_scalar_broadcast(spark, sf_dir):
    # g62: the above-average threshold attaches as a broadcast of ONE
    # stats row (the sanctioned scalar cross join); the "no recent
    # orders" probe is a broadcast anti-join, not a subquery re-scan.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["g62_tpch_q22_global_sales"](spark, sf_dir), "simple")
    assert "LeftAnti" in txt
    assert "CartesianProduct" not in txt


def test_ann_recall_ground_truth_is_bounded_nested_loop(spark, sf_dir):
    # l65: exactly ONE nested-loop — the 50-probe broadcast against the
    # corpus scan (the sanctioned bounded ground-truth pass); the ANN
    # candidate tier must be an equi BroadcastHashJoin on the bucket key.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(QUERIES["l65_ann_recall"](spark, sf_dir), "simple")
    assert txt.count("BroadcastNestedLoopJoin") == 1
    assert "BroadcastHashJoin" in txt
    assert "CartesianProduct" not in txt


def test_cross_source_dup_matrix_equi_join_only(spark, sf_dir):
    # l66: the self-join is an EQUI-join on the fingerprint — a
    # cartesian/nested-loop here would be the all-pairs blowup the
    # fingerprint exists to avoid.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    txt = explain_string(
        QUERIES["l66_cross_source_dup_matrix"](spark, sf_dir), "simple"
    )
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoop" not in txt


def test_mixture_manifest_values_consistent(spark, sf_dir):
    # l67: deciles partition the corpus; token totals reconcile; repeat
    # factors are positive and equalize toward the uniform target.
    from pgstream_spark.inventory import QUERIES

    rows = QUERIES["l67_quality_mixture_manifest"](spark, sf_dir).collect()
    assert rows
    assert {r.decile for r in rows} <= set(range(1, 11))
    assert all(r.n_docs > 0 and r.n_tokens > 0 for r in rows)
    assert all(r.repeat_milli > 0 for r in rows)
    total = sum(r.n_tokens for r in rows)
    target = total // len(rows)
    for r in rows:
        # repeat_milli == round-half-up(1000 * target / n_tokens)
        assert r.repeat_milli == (2 * target * 1000 + r.n_tokens) // (
            2 * r.n_tokens
        )

def test_temperature_mixture_shares_sum_to_one_million(spark, sf_dir):
    # l68: sqrt-temperature shares form a probability vector (ppm sums
    # to 1e6 within half-up rounding slack of one per language) and
    # low-resource languages are boosted above proportional share.
    from pgstream_spark.inventory import QUERIES

    rows = QUERIES["l68_temperature_mixture"](spark, sf_dir).collect()
    assert rows
    n_langs = len(rows)
    assert abs(sum(r.sample_ppm for r in rows) - 1_000_000) <= n_langs
    assert abs(sum(r.prop_ppm for r in rows) - 1_000_000) <= n_langs
    smallest = min(rows, key=lambda r: r.n_docs)
    largest = max(rows, key=lambda r: r.n_docs)
    if smallest.n_docs < largest.n_docs:
        # temperature flattens: the rarest language gains share, the
        # most common loses it.
        assert smallest.boost_milli >= 1000
        assert largest.boost_milli <= 1000


def test_ngram_novelty_stays_equi_join(spark, sf_dir):
    # l69: first-occurrence attach is an equi-join on the shingle (the
    # exact-dedup shape) — no nested loop; counts reconcile per source.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["l69_ngram_novelty"](spark, sf_dir)
    txt = explain_string(df, "simple")
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoop" not in txt
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 < r.novel_shingles <= r.total_shingles
        assert 0 <= r.novelty_bps <= 10000

def test_phrase_search_broadcasts_phrase_list(spark, sf_dir):
    # l70: the phrase list must broadcast (corpus never shuffles for
    # the join) and the corpus is scanned exactly once — no self-join.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["l70_phrase_search"](spark, sf_dir)
    txt = explain_string(df, "simple")
    assert "BroadcastHashJoin" in txt
    assert "SortMergeJoin" not in txt
    assert "CartesianProduct" not in txt
    rows = {r.phrase: r for r in df.collect()}
    assert rows
    for r in rows.values():
        # every matched doc contributes at least one hit
        assert r.n_hits >= r.n_docs > 0

def test_dup_family_sizes_reconcile(spark, sf_dir):
    # l73: histogram rows partition the corpus — n_docs sums to the
    # corpus size and family_size * n_families == n_docs per row.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.sources.parquet import load_table

    rows = QUERIES["l73_dup_family_sizes"](spark, sf_dir).collect()
    assert rows
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert r.family_size * r.n_families == r.n_docs


def test_filter_funnel_single_scan_monotone(spark, sf_dir):
    # l74: one conditional-aggregation scan (no join/window) and the
    # funnel is monotone non-increasing with exact drop accounting.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["l74_filter_funnel"](spark, sf_dir)
    txt = explain_string(df, "simple")
    assert "Join" not in txt
    assert "Window" not in txt
    rows = sorted(df.collect(), key=lambda r: r.stage)
    assert [r.stage for r in rows] == [0, 1, 2, 3, 4]
    for prev, cur in zip(rows, rows[1:]):
        assert cur.survivors <= prev.survivors
        assert cur.dropped == prev.survivors - cur.survivors


def test_key_skew_profile_consistent(spark, sf_dir):
    # t34: profile invariants — p50 <= p90 <= max, shares bounded, and
    # the diagnosis never touches the fact table more than the one
    # group-by (no self-join of the raw events).
    from pgstream_spark.inventory import QUERIES

    r = QUERIES["t34_key_skew_profile"](spark, sf_dir).collect()[0]
    assert r.p50_cnt <= r.p90_cnt <= r.max_cnt
    assert r.max_over_mean_milli >= 1000
    assert 0 < r.top10_share_bps <= 10000
    assert r.n_keys > 0 and r.total_rows > 0

def test_scorer_agreement_partitions_corpus(spark, sf_dir):
    # l71: the 10x10 matrix partitions the corpus; deciles in range;
    # diagonal non-empty (the two scorers agree on SOME stratum).
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.operators.dedup import tokens_col
    from pyspark.sql import functions as F
    from pgstream_spark.sources.parquet import load_table

    rows = QUERIES["l71_scorer_agreement"](spark, sf_dir).collect()
    nonempty = (
        load_table(spark, sf_dir, "documents")
        .filter(F.size(tokens_col(F.col("text"))) > 0)
        .count()
    )
    assert sum(r.n_docs for r in rows) == nonempty
    assert all(1 <= r.decile_div <= 10 and 1 <= r.decile_len <= 10 for r in rows)
    assert any(r.decile_div == r.decile_len for r in rows)


def test_dedup_threshold_sweep_monotone(spark, sf_dir):
    # l72: higher thresholds keep fewer pairs and remove fewer docs —
    # the sweep must be monotone non-increasing in the cut.
    from pgstream_spark.inventory import QUERIES

    rows = sorted(
        QUERIES["l72_dedup_threshold_sweep"](spark, sf_dir).collect(),
        key=lambda r: r.threshold_bps,
    )
    assert [r.threshold_bps for r in rows] == [5000, 6000, 7000, 8000, 9000]
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_pairs <= prev.n_pairs
        assert cur.n_docs_removed <= prev.n_docs_removed
    assert all(r.n_docs_removed <= r.n_pairs for r in rows)


def test_keyset_mixed_order_pushdown(spark, sf_dir):
    # o9: the leading <= conjunct reaches the parquet scan so row-group
    # stats can skip; the page is a real 50-row page.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["o9_keyset_mixed_order"](spark, sf_dir)
    txt = explain_string(df, "formatted")
    assert "PushedFilters" in txt
    assert "o_orderdate" in txt.split("PushedFilters")[1][:200]
    assert df.count() == 50


def test_interarrival_quantiles_ordered(spark, sf_dir):
    # t33: discrete-ladder quantiles are actual gap values with
    # p50 <= p90 <= max per type.
    from pgstream_spark.inventory import QUERIES

    rows = QUERIES["t33_interarrival_quantiles"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.p50_gap_s <= r.p90_gap_s <= r.max_gap_s
        assert r.n_gaps > 0

def test_minhash_calibration_error_decreases_with_agreement(spark, sf_dir):
    # l75: the estimator's mean error at full signature agreement (k=8)
    # must not exceed the error at the lowest candidate agreement — the
    # calibration table's raison d'etre; est levels are k/8 exactly.
    from pgstream_spark.inventory import QUERIES

    rows = {r.k_equal: r for r in QUERIES["l75_minhash_calibration"](spark, sf_dir).collect()}
    assert rows
    assert all(4 <= k <= 8 for k in rows)  # band pass => half sig equal
    lo, hi = min(rows), max(rows)
    if lo < hi:
        assert rows[hi].mean_abs_err_micro <= rows[lo].mean_abs_err_micro
    for r in rows.values():
        assert 0 <= r.mean_exact_micro <= 1_000_000


def test_cogrouped_arrow_matches_join(spark, sf_dir):
    # x9: the Arrow kernel's per-key reconciliation == the plain SQL
    # full-outer aggregate join, column for column.
    from pgstream_spark.inventory import QUERIES
    from pyspark.sql import functions as F
    from pgstream_spark.sources.parquet import load_table

    got = {r.k: r for r in QUERIES["x9_cogrouped_arrow"](spark, sf_dir).collect()}
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 1500)
        .select(
            F.col("o_orderkey").alias("k"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("oc"),
        )
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 1500)
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("lc"),
            F.max(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("mx"),
        )
    )
    want = o.join(li, "k", "full_outer").collect()
    assert len(want) == len(got)
    for w in want:
        g = got[w.k]
        assert g.order_cents == w.oc
        assert g.n_lines == (w.n or 0)
        assert g.line_cents == (w.lc or 0)
        assert g.max_line_cents == w.mx


def test_bitwise_agg_bitmap_semantics(spark, sf_dir):
    # f24: popcount matches the distinct-type count exactly (the bitmap
    # IS the distinct set at bounded domain) and bitmaps stay in range.
    from pgstream_spark.inventory import QUERIES
    from pyspark.sql import functions as F
    from pgstream_spark.sources.parquet import load_table

    rows = {r.user_id: r for r in QUERIES["f24_bitwise_agg"](spark, sf_dir).collect()}
    exact = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("n"))
        .collect()
    }
    assert rows.keys() == exact.keys()
    for uid, r in rows.items():
        assert r.n_types == exact[uid]
        assert 1 <= r.type_bitmap <= 31

def test_langid_confusion_reconciles(spark, sf_dir):
    # l76: the confusion matrix partitions the corpus; diagonal cells
    # carry cell_hit_bps == 10000, off-diagonal == 0.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.sources.parquet import load_table

    rows = QUERIES["l76_langid_confusion"](spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert r.cell_hit_bps == (10000 if r.true_lang == r.pred_lang else 0)


def test_rate_limit_audit_bounds(spark, sf_dir):
    # t35: violations never exceed events; the peak window is at least 1
    # (each event counts itself).
    from pgstream_spark.inventory import QUERIES

    rows = QUERIES["t35_rate_limit_audit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_violations <= r.n_events
        assert r.peak_60s >= 1


def test_mom_change_window_over_aggregate(spark, sf_dir):
    # g64: the lag window runs over the months AGGREGATE (tiny), not the
    # raw orders — first month per priority is NULL, rest bounded.
    from pgstream_spark.inventory import QUERIES

    rows = QUERIES["g64_mom_revenue_change"](spark, sf_dir).collect()
    by_pri = {}
    for r in rows:
        by_pri.setdefault(r.pri, []).append(r)
    for pri, rs in by_pri.items():
        rs.sort(key=lambda r: r.mon)
        assert rs[0].mom_change_bps is None
        for prev, cur in zip(rs, rs[1:]):
            if cur.mom_change_bps is not None and prev.rev_cents:
                expect = round(
                    (cur.rev_cents - prev.rev_cents) / prev.rev_cents * 10000
                )
                assert abs(cur.mom_change_bps - expect) <= 1

def test_lsh_precision_recall_bounds(spark, sf_dir):
    # l77: hits bounded by both sets; ratios in [0, 10000].
    from pgstream_spark.inventory import QUERIES

    r = QUERIES["l77_lsh_precision_recall"](spark, sf_dir).collect()[0]
    assert 0 < r.n_hit <= min(r.n_cand, r.n_exact)
    assert 0 < r.precision_bps <= 10000
    assert 0 < r.recall_bps <= 10000


def test_pack_efficiency_reconciles_with_l12(spark, sf_dir):
    # l78: the audit must agree with the packing it audits — same
    # shards, per-shard window count == l12's max chunk_last + 1,
    # straddlers == l12's straddles sum; fill never exceeds 100%.
    from pgstream_spark.inventory import QUERIES
    from pyspark.sql import functions as F

    audit = {r.shard: r for r in QUERIES["l78_pack_efficiency"](spark, sf_dir).collect()}
    l12 = (
        QUERIES["l12_sequence_pack"](spark, sf_dir)
        .groupBy("shard")
        .agg(
            (F.max("chunk_last") + 1).alias("nw"),
            F.sum(F.col("straddles").cast("int")).alias("ns"),
        )
        .collect()
    )
    assert {r.shard for r in l12} == set(audit)
    for r in l12:
        a = audit[r.shard]
        assert a.n_windows == r.nw
        assert a.n_straddlers == r.ns
        assert 0 < a.fill_bps <= 10000


def test_vocab_growth_monotone(spark, sf_dir):
    # l79: vocabulary and token totals grow monotonically with the
    # corpus fraction; 100% vocab == the full distinct-token count.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.operators.dedup import tokens_col
    from pyspark.sql import functions as F
    from pgstream_spark.sources.parquet import load_table

    rows = sorted(
        QUERIES["l79_vocab_growth"](spark, sf_dir).collect(),
        key=lambda r: r.pct,
    )
    assert [r.pct for r in rows] == [25, 50, 75, 100]
    for prev, cur in zip(rows, rows[1:]):
        assert cur.vocab_size >= prev.vocab_size
        assert cur.total_tokens >= prev.total_tokens
    full_vocab = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.array_distinct(tokens_col(F.col("text")))).alias("w"))
        .select("w")
        .distinct()
        .count()
    )
    assert rows[-1].vocab_size == full_vocab


def test_active_user_ratios_bounds(spark, sf_dir):
    # t36: mean DAU can never exceed WAU (stickiness <= 100%), and the
    # daily sum is at least the weekly distinct count.
    from pgstream_spark.inventory import QUERIES

    rows = QUERIES["t36_active_user_ratios"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.stickiness_bps <= 10000
        assert r.sum_dau >= r.wau
        assert 1 <= r.n_days <= 7


def test_revenue_concentration_monotone(spark, sf_dir):
    # g65: covering more revenue needs at least as many customers.
    from pgstream_spark.inventory import QUERIES

    rows = sorted(
        QUERIES["g65_revenue_concentration"](spark, sf_dir).collect(),
        key=lambda r: r.pct,
    )
    assert [r.pct for r in rows] == [50, 80, 90]
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_customers >= prev.n_customers
        assert cur.customer_share_bps >= prev.customer_share_bps
    # concentration means 50% of revenue takes < 50% of customers
    assert rows[0].customer_share_bps < 5000

def test_tokenizer_fertility_bounds(spark, sf_dir):
    # l80: fertility >= 1000 milli on this alnum-word corpus (the
    # subword regex never splits below word count here) and totals
    # reconcile per language.
    from pgstream_spark.inventory import QUERIES

    rows = QUERIES["l80_tokenizer_fertility"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.fertility_milli >= 1000
        assert r.subword_tokens >= r.word_tokens > 0


def test_dedup_quality_shift_consistent(spark, sf_dir):
    # l81: survivors are a subset (n_surv <= n_all) and the shift
    # column is exactly the difference of the two means.
    from pgstream_spark.inventory import QUERIES

    rows = QUERIES["l81_dedup_quality_shift"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_surv <= r.n_all
        assert r.shift_bps == r.mean_surv_bps - r.mean_all_bps


def test_burstiness_poisson_reference(spark, sf_dir):
    # t37: Fano is positive; a manual recompute from the hourly counts
    # matches the query's integer recipe exactly.
    from pgstream_spark.inventory import QUERIES
    from pyspark.sql import functions as F
    from pgstream_spark.sources.parquet import load_table

    rows = {r.event_type: r for r in QUERIES["t37_burstiness"](spark, sf_dir).collect()}
    hc = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .count()
        .collect()
    )
    from collections import defaultdict

    xs = defaultdict(list)
    for r in hc:
        xs[r.event_type].append(r["count"])
    for et, counts in xs.items():
        n, sx, sxx = len(counts), sum(counts), sum(x * x for x in counts)
        expect = (2 * (n * sxx - sx * sx) * 1000 + n * sx) // (2 * n * sx)
        assert rows[et].fano_milli == expect
        assert rows[et].n_hours == n and rows[et].n_events == sx


def test_map_in_pandas_partition_invariant(spark, sf_dir):
    # x10: batch-local partial aggregation re-combines to the same
    # result under any partitioning.
    from pgstream_spark.inventory import QUERIES

    base = {
        r.l_returnflag: (r.n_lines, r.price_cents)
        for r in QUERIES["x10_map_in_pandas"](spark, sf_dir).collect()
    }
    assert base
    from pgstream_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    exact = {
        r.l_returnflag: (r.n, r.c)
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("c"),
        )
        .collect()
    }
    assert base == exact

def test_simpson_diversity_bounds(spark, sf_dir):
    # l82: repeat probability is a probability (0..1e6 micro) and the
    # vocabulary can't exceed the token total.
    from pgstream_spark.inventory import QUERIES

    rows = QUERIES["l82_simpson_diversity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.repeat_micro <= 1_000_000
        assert 0 < r.vocab <= r.total


def test_local_peaks_reference(spark, sf_dir):
    # t38: recompute peaks from the hourly series in plain python.
    from pgstream_spark.inventory import QUERIES
    from pyspark.sql import functions as F
    from pgstream_spark.sources.parquet import load_table

    got = {r.event_type: r for r in QUERIES["t38_local_peaks"](spark, sf_dir).collect()}
    hc = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .count()
        .collect()
    )
    from collections import defaultdict

    series = defaultdict(list)
    for r in hc:
        series[r.event_type].append((r.h, r["count"]))
    for et, pts in series.items():
        pts.sort()
        peaks = [
            (h, x)
            for (hp, xp), (h, x), (hn, xn) in zip(pts, pts[1:], pts[2:])
            if x > xp and x > xn
        ]
        if not peaks:
            assert et not in got
            continue
        assert got[et].n_peaks == len(peaks)
        assert got[et].tallest_peak == max(x for _, x in peaks)


def test_symmetric_diff_sides_disjoint(spark, sf_dir):
    # u6: the two sides are disjoint key sets with correct provenance.
    from pgstream_spark.inventory import QUERIES

    rows = QUERIES["u6_symmetric_diff"](spark, sf_dir).collect()
    early = {r.k for r in rows if r.side == "early_only"}
    late = {r.k for r in rows if r.side == "late_only"}
    assert early or late
    assert not (early & late)
    assert len(rows) == len(early) + len(late)

def test_char_trigram_profile_shape(spark, sf_dir):
    # l83: exactly 5 ranked rows per language, rank-consistent counts.
    from pgstream_spark.inventory import QUERIES

    rows = QUERIES["l83_char_trigram_profile"](spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert by_lang
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == [1, 2, 3, 4, 5]
        for prev, cur in zip(rs, rs[1:]):
            assert cur.n <= prev.n
        assert all(len(r.trigram) == 3 for r in rs)


def test_hourly_profile_reconciles(spark, sf_dir):
    # t39: per-type event totals across the 24-hour profile equal the
    # raw event counts.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.sources.parquet import load_table

    rows = QUERIES["t39_hourly_profile"](spark, sf_dir).collect()
    totals = {}
    for r in rows:
        assert 0 <= r.hour_of_day <= 23
        totals[r.event_type] = totals.get(r.event_type, 0) + r.n_events
    raw = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert totals == raw


def test_adoption_curve_monotone_and_complete(spark, sf_dir):
    # w18: cumulative count is non-decreasing and ends at the total
    # distinct user count.
    from pgstream_spark.inventory import QUERIES
    from pyspark.sql import functions as F
    from pgstream_spark.sources.parquet import load_table

    rows = sorted(
        QUERIES["w18_adoption_curve"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert rows
    for prev, cur in zip(rows, rows[1:]):
        assert cur.cum_users == prev.cum_users + cur.n_new
    total = (
        load_table(spark, sf_dir, "events")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()[0]
        .n
    )
    assert rows[-1].cum_users == total


def test_top_percent_exact_count(spark, sf_dir):
    # o10: the slice is exactly ceil(n/100) rows regardless of value ties.
    import math

    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.sources.parquet import load_table

    got = QUERIES["o10_top_percent"](spark, sf_dir).count()
    n = load_table(spark, sf_dir, "orders").count()
    assert got == math.ceil(n / 100)


def test_roc_auc_windows_run_over_histogram_not_rows(spark, sf_dir):
    # l100: the only Window in the plan must consume the grouped score
    # HISTOGRAM (an Aggregate below it), never raw document rows — the
    # l94 windowless-discipline pin for the AUC operator.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["l100_roc_auc"](spark, sf_dir)
    txt = explain_string(df, "extended")
    assert "Window" in txt
    # optimized plan: the window's child chain contains the partial/
    # final aggregate pair that builds the histogram
    opt = txt.split("== Optimized Logical Plan ==")[1].split("== Physical Plan ==")[0]
    win_pos = opt.index("Window")
    assert "Aggregate" in opt[win_pos:], "window must sit above the histogram aggregate"


def test_dsir_weight_join_is_broadcast(spark, sf_dir):
    # l101: the bucket-weight table is bounded at n_buckets rows — the
    # scoring join must be a BroadcastHashJoin (never a corpus-sized
    # SortMergeJoin) and nothing may cartesian.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["l101_dsir_weights"](spark, sf_dir)
    txt = explain_string(df, "simple")
    assert "BroadcastHashJoin" in txt
    assert "CartesianProduct" not in txt


def test_dhash_pairs_join_on_band_buckets_no_cartesian(spark, sf_dir):
    # l102b: candidates come from the (band, key) equi-join — any
    # cartesian/nested-loop shape would be the quadratic scan the
    # banding exists to avoid.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["l102b_dhash_pairs"](spark, sf_dir)
    txt = explain_string(df, "simple")
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt


def test_perceptual_probe_broadcasts_batch_not_index(spark, sf_dir):
    # l104: the index scan is the big side and must stream; the probe
    # batch must be the broadcast side.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.explain import explain_string

    df = QUERIES["l104_incremental_perceptual"](spark, sf_dir)
    txt = explain_string(df, "simple")
    assert "BroadcastHashJoin" in txt
    assert "CartesianProduct" not in txt


def test_plan_digest_stable_across_construction_order(spark, sf_dir):
    # The bench's plan-digest rail must not flip when an UNRELATED
    # DataFrame is built first: RewriteDistinctAggregates orders its
    # Expand projections / gid assignment by attribute exprId, which
    # depends on the session-global expression counter (probed: g3's
    # digest was bistable across rounds purely by construction order).
    # digest.py canonicalizes gid-bearing lines; a multi-count(DISTINCT)
    # plan must digest identically before and after the counter moves.
    from pgstream_spark.inventory import QUERIES
    from pgstream_spark.plans.digest import plan_digest

    d0 = plan_digest(QUERIES["g3_count_distinct"](spark, sf_dir))
    # burn a few hundred exprIds so the distinct-rewrite ordering flips
    QUERIES["x1_pandas_kernel"](spark, sf_dir)
    spark.range(10).selectExpr(*[f"id + {i} AS c{i}" for i in range(40)])
    d1 = plan_digest(QUERIES["g3_count_distinct"](spark, sf_dir))
    assert d0 == d1

    # and a real plan change must still flip it (limit() would be
    # optimized away on a 1-row aggregate; project a new column instead)
    li = QUERIES["g3_count_distinct"](spark, sf_dir)
    assert plan_digest(li.selectExpr("*", "n_parts + 1 AS np1")) != d0


def test_plan_digest_canon_numpartitions():
    # VERDICT r11 item 9: partition COUNTS track $SPARK_GRAFT_CPUS /
    # shuffle.partitions — environment, not plan shape.  The digest must
    # neutralize them (all 17 "changes" in the driver's c8 run were
    # hashpartitioning(..., 32) vs (..., 8)) while keeping the key list,
    # including nested-paren keys, so a real partitioning change flips.
    from pgstream_spark.plans.digest import _canon_numpartitions

    a = "Exchange hashpartitioning(coalesce(a#, b#), doc_id#L, 32), X"
    b = "Exchange hashpartitioning(coalesce(a#, b#), doc_id#L, 8), X"
    assert _canon_numpartitions(a) == _canon_numpartitions(b)
    # different KEYS must stay different
    c = "Exchange hashpartitioning(coalesce(a#, c#), doc_id#L, 32), X"
    assert _canon_numpartitions(c) != _canon_numpartitions(a)
    # other numeric literals on the line are untouched
    d = "Project [slice(arr#, 1, 3) AS s#]"
    assert _canon_numpartitions(d) == d
    assert (
        _canon_numpartitions("Exchange RoundRobinPartitioning(32), Y")
        == _canon_numpartitions("Exchange RoundRobinPartitioning(8), Y")
    )
    assert (
        _canon_numpartitions("+- RepartitionByExpression [id#L], 32")
        == _canon_numpartitions("+- RepartitionByExpression [id#L], 8")
    )


def test_engine_merges_excluded_rules():
    # ADVICE r11 (engine.py:268): user extra_conf excludedRules must
    # MERGE with the engine's, not clobber; empty string opts out.
    from pgstream_spark.engine import _EXCLUDED_RULES, _merge_excluded_rules

    assert _merge_excluded_rules(None) == _EXCLUDED_RULES
    got = _merge_excluded_rules("org.example.MyRule")
    assert got.split(",") == [_EXCLUDED_RULES, "org.example.MyRule"]
    # duplicates collapse, engine rule stays first
    assert _merge_excluded_rules(_EXCLUDED_RULES) == _EXCLUDED_RULES
    assert _merge_excluded_rules("") == ""
