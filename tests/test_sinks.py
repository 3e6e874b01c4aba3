"""Sink layout tests: bucketed co-located joins and partition pruning —
the write-time choices that delete shuffles/IO at read time."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pgstream_spark.plans.explain import explain_string
from pgstream_spark.sinks import co_located_join, write_bucketed, write_partitioned
from pgstream_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    import shutil

    # a killed previous run can leave the managed-table DIRECTORY
    # behind with no catalog entry (the metastore is per-session) —
    # saveAsTable then fails LOCATION_ALREADY_EXISTS; clear both
    for t in ("t_orders_b", "t_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join("spark-warehouse", t), ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o.withColumnRenamed("o_orderkey", "orderkey"),
                   "t_orders_b", ["orderkey"], 8, sort_cols=["orderkey"])
    write_bucketed(li.withColumnRenamed("l_orderkey", "orderkey"),
                   "t_lineitem_b", ["orderkey"], 8, sort_cols=["orderkey"])
    yield "t_orders_b", "t_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


class TestBucketedJoin:
    def test_no_exchange_on_either_side(self, spark, bucketed_tables):
        # At sf0.001 the planner would broadcast (and skip the bucketed
        # scan entirely); force the sort-merge path the join would take
        # at real scale — THAT plan must carry no Exchange on either side.
        lt, rt = bucketed_tables
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = co_located_join(spark, lt, rt, on=["orderkey"])
            txt = explain_string(j, "simple")
            assert "SortMergeJoin" in txt, txt
            assert "Exchange" not in txt, txt
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_join_result_matches_plain_join(self, spark, sf_dir, bucketed_tables):
        lt, rt = bucketed_tables
        n_bucketed = co_located_join(spark, lt, rt, on=["orderkey"]).count()
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        n_plain = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert n_bucketed == n_plain

    def test_one_file_per_bucket(self, spark, bucketed_tables):
        # the repartition-before-bucketBy hygiene: 8 buckets -> 8 files,
        # not input_partitions x 8
        lt, _ = bucketed_tables
        files = spark.sql(f"DESCRIBE TABLE EXTENDED {lt}").collect()
        loc = next(r.data_type for r in files if r.col_name == "Location")
        import glob
        import os

        parts = [p for p in glob.glob(os.path.join(loc.replace("file:", ""), "*"))
                 if not os.path.basename(p).startswith("_")]
        assert len(parts) == 8, parts


class TestPartitionedWrite:
    def test_partition_pruning(self, spark, sf_dir, tmp_path):
        o = load_table(spark, sf_dir, "orders").withColumn(
            "o_year", F.year("o_orderdate")
        )
        path = str(tmp_path / "orders_by_year")
        write_partitioned(o, path, ["o_year"])
        back = spark.read.parquet(path).filter(F.col("o_year") == 1996)
        txt = explain_string(back, "formatted")
        assert "PartitionFilters" in txt
        # pruned scan must read only the one directory
        m = [ln for ln in txt.splitlines() if "PartitionFilters" in ln]
        assert any("o_year" in ln for ln in m)
        # correctness: equals the unpartitioned filter
        want = o.filter(F.col("o_year") == 1996).count()
        assert back.count() == want


class TestClusteredWrite:
    def test_file_ranges_are_disjoint(self, spark, sf_dir, tmp_path):
        import glob

        import pyarrow.parquet as pq

        from pgstream_spark.sinks import write_clustered

        o = load_table(spark, sf_dir, "orders")
        path = str(tmp_path / "orders_clustered")
        write_clustered(o, path, ["o_totalprice"], n_files=4)

        spans = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.read_metadata(f)
            idx = md.schema.names.index("o_totalprice")
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            spans.append((min(mins), max(maxs)))
        assert len(spans) >= 3  # range partitioner used the file budget
        spans.sort()
        for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2  # disjoint value ranges → footer-stat skipping
        # row parity
        assert spark.read.parquet(path).count() == o.count()

    def test_zorder_skips_on_both_columns(self, spark, sf_dir, tmp_path):
        """write_zordered: per-file min/max must be materially narrower
        than the global domain on BOTH z-columns — the multi-column
        data-skipping property lexicographic clustering cannot give
        (its trailing column's spans cover the whole domain)."""
        import glob

        import pyarrow.parquet as pq

        from pgstream_spark.sinks import write_clustered, write_zordered

        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
        )

        def spans(path, col):
            out = []
            for f in glob.glob(path + "/*.parquet"):
                md = pq.read_metadata(f)
                idx = md.schema.names.index(col)
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    mins.append(st.min)
                    maxs.append(st.max)
                out.append((min(mins), max(maxs)))
            return out

        zpath = str(tmp_path / "li_zorder")
        write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=16)
        lpath = str(tmp_path / "li_lex")
        write_clustered(li, lpath, ["l_partkey", "l_suppkey"], n_files=16)

        def mean_cover(path, col):
            sp = spans(path, col)
            glo = min(s[0] for s in sp), max(s[1] for s in sp)
            width = glo[1] - glo[0] or 1
            return sum((hi - lo) / width for lo, hi in sp) / len(sp)

        # z-order: BOTH columns' per-file coverage is a fraction of the
        # domain; lexicographic: the trailing column's files each cover
        # ~the whole domain (no skipping possible)
        for col in ("l_partkey", "l_suppkey"):
            assert mean_cover(zpath, col) < 0.6, (col, "z-order not local")
        assert mean_cover(lpath, "l_suppkey") > 0.8  # the failure z-order fixes
        assert mean_cover(zpath, "l_suppkey") < mean_cover(lpath, "l_suppkey")
        # row parity
        assert spark.read.parquet(zpath).count() == li.count()

    def test_zorder_rejects_single_column_and_overflow(self, spark, sf_dir):
        import pytest as _pytest

        from pgstream_spark.sinks import write_zordered

        li = load_table(spark, sf_dir, "lineitem")
        with _pytest.raises(ValueError):
            write_zordered(li, "/tmp/x", ["l_partkey"], n_files=4)
        with _pytest.raises(ValueError):
            write_zordered(
                li, "/tmp/x", ["l_partkey", "l_suppkey"], n_files=4, bits=32
            )

    def test_compact_dir_reduces_files_preserves_rows(self, spark, sf_dir, tmp_path):
        import glob

        from pgstream_spark.sinks import compact_dir

        o = load_table(spark, sf_dir, "orders")
        path = str(tmp_path / "orders_shredded")
        o.repartition(32).write.parquet(path)
        before_files = len(glob.glob(path + "/*.parquet"))
        assert before_files >= 32
        before_rows = o.count()
        before_keys = {r.o_orderkey for r in spark.read.parquet(path).collect()}

        n_after = compact_dir(spark, path, target_file_bytes=64 << 20)
        after_files = len(glob.glob(path + "/*.parquet"))
        assert n_after == after_files < before_files
        after = spark.read.parquet(path)
        assert after.count() == before_rows
        assert {r.o_orderkey for r in after.collect()} == before_keys


class TestExportShards:
    def test_assignment_is_content_deterministic(self, spark, sf_dir, tmp_path):
        from pgstream_spark.sinks import export_shards

        d = load_table(spark, sf_dir, "documents")
        p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
        export_shards(d, p1, 8, "doc_id")
        # same data, radically different input partitioning → same shards
        export_shards(d.repartition(17), p2, 8, "doc_id")

        a = {(r.doc_id, r.shard) for r in spark.read.parquet(p1).collect()}
        b = {(r.doc_id, r.shard) for r in spark.read.parquet(p2).collect()}
        assert a == b
        assert len(a) == d.count()
        # balance: hash sharding keeps every shard populated and no shard
        # over ~3x the mean at this corpus size
        from collections import Counter

        sizes = Counter(s for _, s in a)
        assert len(sizes) == 8
        assert max(sizes.values()) < 3 * (len(a) / 8)


def test_orc_roundtrip_parity(spark, tmp_path):
    """ORC is the second columnar format Spark ships natively — a sink
    target must round-trip values and schema identically to parquet
    (the interchange case: ORC-consuming warehouses downstream)."""
    import pyspark.sql.functions as F

    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 1.5).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("maybe"),
    )
    orc_path = str(tmp_path / "orc_out")
    pq_path = str(tmp_path / "pq_out")
    df.write.orc(orc_path)
    df.write.parquet(pq_path)
    a = sorted(map(tuple, spark.read.orc(orc_path).collect()))
    b = sorted(map(tuple, spark.read.parquet(pq_path).collect()))
    assert a == b and len(a) == 1000
    # ORC reads everything nullable — names and types must survive
    assert [(f.name, f.dataType) for f in spark.read.orc(orc_path).schema] == [
        (f.name, f.dataType) for f in df.schema
    ]


def test_parquet_schema_evolution_merge_read(spark, tmp_path):
    """A table whose writes gained a column over time reads as ONE
    evolved schema via mergeSchema — old files surface NULL for the new
    column; without the option the read sees only the footer-sampled
    subset.  The on-disk half of u5's by-name union semantics."""
    import pyspark.sql.functions as F

    path = str(tmp_path / "evolving")
    spark.range(0, 50).select(F.col("id"), F.lit("v1").alias("src")).write.parquet(
        path + "/batch=1"
    )
    spark.range(50, 100).select(
        F.col("id"), F.lit("v2").alias("src"), (F.col("id") * 2).alias("extra")
    ).write.parquet(path + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "src", "extra", "batch"}
    assert merged.count() == 100
    old = merged.filter("batch = 1")
    assert old.filter(F.col("extra").isNull()).count() == 50
    new = merged.filter("batch = 2")
    assert new.filter(F.col("extra") == F.col("id") * 2).count() == 50


class TestRowGroupTargets:
    """VERDICT r6 item 6: scan splits are row-group-bounded, so a writer
    emitting one giant row group caps every later read's parallelism
    (the l69 sf1-single-file pathology, SCALE.md).  Every sinks.py
    writer threads ``parquet.block.size``; these tests pin that the knob
    reaches the files — a sub-target write must produce MULTIPLE row
    groups per file, never one monolith."""

    @staticmethod
    def _row_groups(path):
        import glob
        import os

        import pyarrow.parquet as pq

        out = []
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
            md = pq.ParquetFile(f).metadata
            out.append((f, md.num_row_groups, md.num_rows))
        assert out, f"no parquet files under {path}"
        return out

    def test_export_shards_emits_bounded_row_groups(self, spark, sf_dir, tmp_path):
        from pgstream_spark.sinks import export_shards

        d = load_table(spark, sf_dir, "documents")
        path = str(tmp_path / "shard_rg")
        # one shard = one writer task holding the whole corpus; a 64 KB
        # target must still split it into several row groups
        export_shards(d, path, 1, "doc_id", row_group_bytes=64 << 10)
        groups = self._row_groups(path)
        assert all(n > 1 for _, n, _ in groups), groups

    def test_compact_dir_emits_bounded_row_groups(self, spark, sf_dir, tmp_path):
        from pgstream_spark.sinks import compact_dir

        d = load_table(spark, sf_dir, "documents")
        path = str(tmp_path / "compact_rg")
        d.repartition(16).write.parquet(path)  # small-files ingest shape
        n_files = compact_dir(
            spark, path, target_file_bytes=1 << 30, row_group_bytes=64 << 10
        )
        assert n_files == 1  # compacted to one file...
        groups = self._row_groups(path)
        assert all(n > 1 for _, n, _ in groups), groups  # ...but splittable

    def test_clustered_write_emits_bounded_row_groups(self, spark, sf_dir, tmp_path):
        from pgstream_spark.sinks import write_clustered

        li = load_table(spark, sf_dir, "lineitem")
        path = str(tmp_path / "clustered_rg")
        write_clustered(li, path, ["l_orderkey"], 1, row_group_bytes=64 << 10)
        groups = self._row_groups(path)
        assert all(n > 1 for _, n, _ in groups), groups

    def test_write_version_emits_bounded_row_groups(self, spark, sf_dir, tmp_path):
        from pgstream_spark.operators.snapshot import write_version

        d = load_table(spark, sf_dir, "documents").coalesce(1)
        store = str(tmp_path / "versions_rg")
        v = write_version(store, d, row_group_bytes=64 << 10)
        groups = self._row_groups(f"{store}/v{v:04d}/data")
        assert all(n > 1 for _, n, _ in groups), groups


class TestDataSkipping:
    """sources/skipping.py — file-level stats manifest + pruned reads."""

    def _make(self, spark, tmp_path, method="footers"):
        from pgstream_spark.sinks import write_clustered
        from pgstream_spark.sources.skipping import write_stats_manifest

        df = spark.range(0, 800).selectExpr(
            "id AS k", "CAST(id % 7 AS INT) AS v"
        )
        tbl = str(tmp_path / "tbl")
        write_clustered(df, tbl, ["k"], n_files=8)
        write_stats_manifest(spark, tbl, ["k"], method=method)
        return tbl

    def test_pruned_equals_full_scan_and_skips_files(self, spark, tmp_path):
        from pgstream_spark.sources.skipping import pruned_parquet

        tbl = self._make(spark, tmp_path)
        pruned = pruned_parquet(spark, tbl, "k", lower=100, upper=199)
        full = spark.read.parquet(tbl).filter("k BETWEEN 100 AND 199")
        assert sorted(map(tuple, pruned.collect())) == sorted(
            map(tuple, full.collect())
        )
        n_total = len(spark.read.parquet(tbl).inputFiles())
        assert n_total == 8
        assert len(pruned.inputFiles()) < n_total  # files actually skipped

    def test_scan_method_matches_footers(self, spark, tmp_path):
        from pgstream_spark.sources.skipping import read_stats_manifest

        tbl_a = self._make(spark, tmp_path / "a", method="footers")
        tbl_b = self._make(spark, tmp_path / "b", method="scan")
        cols = ["file", "n_rows", "min_k", "max_k", "nulls_k"]
        a = sorted(map(tuple, read_stats_manifest(spark, tbl_a).select(cols).collect()))
        b = sorted(map(tuple, read_stats_manifest(spark, tbl_b).select(cols).collect()))
        # file names differ per write; compare the stats payload
        assert [t[1:] for t in a] == [t[1:] for t in b]

    def test_empty_range_returns_typed_empty(self, spark, tmp_path):
        from pgstream_spark.sources.skipping import pruned_parquet

        tbl = self._make(spark, tmp_path)
        out = pruned_parquet(spark, tbl, "k", lower=10_000, upper=20_000)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == ["k", "v"]

    def test_manifest_survives_table_rename(self, spark, tmp_path):
        import os

        from pgstream_spark.sources.skipping import pruned_parquet

        tbl = self._make(spark, tmp_path)
        moved = str(tmp_path / "moved")
        os.rename(tbl, moved)  # relative file names: manifest stays valid
        out = pruned_parquet(spark, moved, "k", lower=0, upper=9)
        assert out.count() == 10

    def test_manifest_not_read_as_data(self, spark, tmp_path):
        tbl = self._make(spark, tmp_path)
        # the underscore-prefixed manifest must be invisible to a plain scan
        assert spark.read.parquet(tbl).count() == 800

    def test_incremental_update_after_append_and_compaction(self, spark, tmp_path):
        import os

        from pgstream_spark.sources.skipping import (
            pruned_parquet,
            read_stats_manifest,
            update_stats_manifest,
        )

        tbl = self._make(spark, tmp_path)
        # append a batch out-of-band (new file, ids 800-899)
        spark.range(800, 900).selectExpr(
            "id AS k", "CAST(id % 7 AS INT) AS v"
        ).coalesce(1).write.mode("append").parquet(tbl)
        update_stats_manifest(spark, tbl, ["k"])
        m = {r.file: r for r in read_stats_manifest(spark, tbl).collect()}
        assert len(m) == 9
        out = pruned_parquet(spark, tbl, "k", lower=850, upper=860)
        assert out.count() == 11 and len(out.inputFiles()) == 1
        # remove a file (compaction-style) — row must drop from the manifest
        victim = sorted(
            n for n in os.listdir(tbl)
            if n.endswith(".parquet") and not n.startswith("_")
        )[0]
        os.remove(os.path.join(tbl, victim))
        update_stats_manifest(spark, tbl, ["k"])
        assert read_stats_manifest(spark, tbl).count() == 8
        assert victim not in {
            r.file for r in read_stats_manifest(spark, tbl).collect()
        }

    def test_update_refuses_silent_stat_set_change(self, spark, tmp_path):
        import pytest as _pytest

        from pgstream_spark.sources.skipping import update_stats_manifest

        tbl = self._make(spark, tmp_path)
        with _pytest.raises(ValueError, match="rebuild"):
            update_stats_manifest(spark, tbl, ["v"])

    def test_zorder_prunes_on_every_z_column(self, spark, tmp_path):
        """The reason write_zordered exists: a lexicographic layout on
        (a, b) leaves b's per-file min/max spanning the whole domain, so
        a b-only filter skips nothing; the Morton layout skips on both."""
        from pgstream_spark.sinks import write_clustered, write_zordered
        from pgstream_spark.sources.skipping import (
            pruned_parquet,
            write_stats_manifest,
        )

        df = spark.range(0, 4096).selectExpr(
            "CAST(id % 64 AS DOUBLE) AS a", "CAST(id DIV 64 AS DOUBLE) AS b"
        )
        zt, ct = str(tmp_path / "z"), str(tmp_path / "c")
        write_zordered(df, zt, ["a", "b"], n_files=16, bits=6)
        write_clustered(df, ct, ["a", "b"], n_files=16)
        for t in (zt, ct):
            write_stats_manifest(spark, t, ["a", "b"])
        rng = {"b": (0.0, 7.0)}  # trailing column only
        z = pruned_parquet(spark, zt, ranges=rng)
        c = pruned_parquet(spark, ct, ranges=rng)
        assert sorted(map(tuple, z.collect())) == sorted(map(tuple, c.collect()))
        assert len(z.inputFiles()) < 16           # z-order: b stats bite
        assert len(c.inputFiles()) == 16          # lexicographic: they don't
        # conjunction prunes deeper than either axis alone
        both = pruned_parquet(
            spark, zt, ranges={"a": (0.0, 7.0), "b": (0.0, 7.0)}
        )
        assert len(both.inputFiles()) <= len(z.inputFiles())
        full = spark.read.parquet(zt).filter(
            "a BETWEEN 0 AND 7 AND b BETWEEN 0 AND 7"
        )
        assert sorted(map(tuple, both.collect())) == sorted(
            map(tuple, full.collect())
        )

    def test_pruned_parquet_arg_validation(self, spark, tmp_path):
        import pytest as _pytest

        from pgstream_spark.sources.skipping import pruned_parquet

        tbl = self._make(spark, tmp_path)
        with _pytest.raises(ValueError, match="exactly one"):
            pruned_parquet(spark, tbl)
        with _pytest.raises(ValueError, match="exactly one"):
            pruned_parquet(spark, tbl, "k", 0, 1, ranges={"k": (0, 1)})

    def test_delete_where_touches_only_matching_files(self, spark, tmp_path):
        import os

        from pgstream_spark.sources.skipping import (
            delete_where,
            pruned_parquet,
            read_stats_manifest,
        )

        tbl = self._make(spark, tmp_path)
        untouched_before = {
            n: os.path.getmtime(os.path.join(tbl, n))
            for n in os.listdir(tbl)
            if n.endswith(".parquet") and not n.startswith("_")
        }
        res = delete_where(spark, tbl, "k", lower=150, upper=249)
        assert res["rows_deleted"] == 100
        assert 0 < res["files_touched"] < res["files_total"]
        # table content == original minus the range
        out = sorted(r.k for r in spark.read.parquet(tbl).collect())
        assert out == [k for k in range(800) if not 150 <= k <= 249]
        # non-matching files byte-untouched (same path, same mtime)
        after = {
            n: os.path.getmtime(os.path.join(tbl, n))
            for n in os.listdir(tbl)
            if n.endswith(".parquet") and not n.startswith("_")
        }
        survived = set(untouched_before) & set(after)
        assert len(survived) == res["files_total"] - res["files_touched"]
        assert all(untouched_before[n] == after[n] for n in survived)
        # manifest reconciled: pruned reads stay correct post-delete
        assert read_stats_manifest(spark, tbl).count() == len(after)
        assert pruned_parquet(spark, tbl, "k", 150, 249).count() == 0
        assert pruned_parquet(spark, tbl, "k", 100, 299).count() == 100

    def test_delete_where_values_and_idempotence(self, spark, tmp_path):
        from pgstream_spark.sources.skipping import delete_where

        tbl = self._make(spark, tmp_path)
        res = delete_where(spark, tbl, "k", values=[3, 500, 799])
        assert res["rows_deleted"] == 3
        again = delete_where(spark, tbl, "k", values=[3, 500, 799])
        assert again["rows_deleted"] == 0  # idempotent on the predicate
        assert spark.read.parquet(tbl).count() == 797

    def test_delete_where_no_match_is_metadata_only(self, spark, tmp_path):
        from pgstream_spark.sources.skipping import delete_where

        tbl = self._make(spark, tmp_path)
        res = delete_where(spark, tbl, "k", lower=5000, upper=6000)
        assert res == {
            "files_touched": 0,
            "files_total": 8,
            "rows_deleted": 0,
        }

    def test_delete_where_arg_validation(self, spark, tmp_path):
        import pytest as _pytest

        from pgstream_spark.sources.skipping import delete_where

        tbl = self._make(spark, tmp_path)
        with _pytest.raises(ValueError, match="exactly one"):
            delete_where(spark, tbl, "k")
        with _pytest.raises(ValueError, match="exactly one"):
            delete_where(spark, tbl, "k", lower=1, values=[2])

    def test_streaming_ingest_into_stats_indexed_table(self, spark, tmp_path):
        from pgstream_spark.sources.skipping import (
            foreach_batch_stats_appender,
            pruned_parquet,
            read_stats_manifest,
        )

        src = str(tmp_path / "incoming")
        spark.range(0, 300).selectExpr("id AS k").write.parquet(src)
        tbl = str(tmp_path / "tbl")
        fn = foreach_batch_stats_appender(tbl, ["k"])
        q = (
            spark.readStream.schema("k long")
            .parquet(src)
            .writeStream.foreachBatch(fn)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.read.parquet(tbl).count() == 300
        n_manifest = read_stats_manifest(spark, tbl).count()
        assert n_manifest >= 1
        # a replayed micro-batch overwrites its own files — no duplicates
        fn(spark.range(0, 300).selectExpr("id AS k"), 0)
        assert spark.read.parquet(tbl).count() == 300
        assert read_stats_manifest(spark, tbl).count() == n_manifest
        out = pruned_parquet(spark, tbl, "k", 10, 19)
        assert out.count() == 10

    def test_compact_dir_rebuilds_manifest(self, spark, tmp_path):
        from pgstream_spark.sinks import compact_dir
        from pgstream_spark.sources.skipping import (
            pruned_parquet,
            read_stats_manifest,
        )

        tbl = self._make(spark, tmp_path)  # 8 files + manifest
        n = compact_dir(spark, tbl, target_file_bytes=1 << 30)
        assert n == 1  # data files only — the manifest is not counted
        m = read_stats_manifest(spark, tbl)
        assert m.count() == 1  # rebuilt for the compacted layout
        out = pruned_parquet(spark, tbl, "k", 100, 199)
        assert out.count() == 100  # prune still correct post-compaction

    def test_delete_preserves_other_columns_stats(self, spark, tmp_path):
        """A delete keyed on one column must not null out the OTHER stat
        columns for the rewritten files (reported by review: the manifest
        rebuild used only the projected delete column)."""
        from pgstream_spark.sinks import write_zordered
        from pgstream_spark.sources.skipping import (
            delete_where,
            pruned_parquet,
            read_stats_manifest,
            write_stats_manifest,
        )

        df = spark.range(0, 4096).selectExpr(
            "CAST(id % 64 AS DOUBLE) AS a", "CAST(id DIV 64 AS DOUBLE) AS b"
        )
        tbl = str(tmp_path / "z")
        write_zordered(df, tbl, ["a", "b"], n_files=16, bits=6)
        write_stats_manifest(spark, tbl, ["a", "b"])
        res = delete_where(spark, tbl, "a", lower=0.0, upper=3.0)
        assert res["rows_deleted"] == 4 * 64
        m = read_stats_manifest(spark, tbl)
        assert m.filter("min_b IS NULL").count() == 0  # b stats intact
        out = pruned_parquet(spark, tbl, ranges={"b": (0.0, 7.0)})
        full = spark.read.parquet(tbl).filter("b BETWEEN 0 AND 7")
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, full.collect())
        )

    def test_delete_where_spares_null_keys(self, spark, tmp_path):
        """NULL keys match no value/range predicate — they must survive
        the delete (a bare ~pred is NULL for them and filter() drops
        NULL: the review-reported silent-deletion hazard)."""
        from pgstream_spark.sources.skipping import (
            delete_where,
            write_stats_manifest,
        )

        df = spark.createDataFrame(
            [(1, 5), (2, None), (3, 7), (4, None)],
            "id long, k int",
        )
        tbl = str(tmp_path / "t")
        df.coalesce(1).write.parquet(tbl)
        write_stats_manifest(spark, tbl, ["k"])
        res = delete_where(spark, tbl, "k", values=[5, 7])
        assert res["rows_deleted"] == 2
        left = sorted(r.id for r in spark.read.parquet(tbl).collect())
        assert left == [2, 4]  # the NULL-keyed rows survive

    def test_unbounded_range_never_prunes(self, spark, tmp_path):
        """ranges={col: (None, None)} adds no predicate — it must not
        prune all-NULL-stat files either (superset contract)."""
        from pgstream_spark.sources.skipping import (
            pruned_parquet,
            write_stats_manifest,
        )

        spark.createDataFrame(
            [(1, 10)], "id long, k int"
        ).coalesce(1).write.parquet(str(tmp_path / "t"))
        spark.createDataFrame(
            [(2, None)], "id long, k int"
        ).coalesce(1).write.mode("append").parquet(str(tmp_path / "t"))
        tbl = str(tmp_path / "t")
        write_stats_manifest(spark, tbl, ["id", "k"])
        out = pruned_parquet(
            spark, tbl, ranges={"id": (0, 10), "k": (None, None)}
        )
        assert sorted(r.id for r in out.collect()) == [1, 2]

    def test_metadata_aggregate_matches_scan(self, spark, tmp_path):
        from pgstream_spark.sources.skipping import (
            metadata_aggregate,
            write_stats_manifest,
        )

        df = spark.createDataFrame(
            [(i, None if i % 5 == 0 else i * 2) for i in range(200)],
            "id long, v long",
        )
        tbl = str(tmp_path / "t")
        df.repartition(4).write.parquet(tbl)
        write_stats_manifest(spark, tbl, ["id", "v"])
        got = {r.column: r for r in metadata_aggregate(spark, tbl).collect()}
        assert got["id"].n_rows == 200 and got["id"].n_nonnull == 200
        assert got["id"].min == "0" and got["id"].max == "199"
        assert got["v"].n_nonnull == 160  # 40 NULLs (every 5th)
        assert got["v"].min == "2" and got["v"].max == "398"

    def test_pruned_read_still_pushes_filters(self, spark, tmp_path):
        """File pruning COMPOSES with parquet pushdown: inside the
        surviving files the exact predicate still reaches the scan
        (row-group stats prune further)."""
        from pgstream_spark.sources.skipping import pruned_parquet

        tbl = self._make(spark, tmp_path)
        plan = (
            pruned_parquet(spark, tbl, "k", 100, 199)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [IsNotNull(k), GreaterThanOrEqual(k,100)" in plan

    def test_vacuum_staging_respects_grace(self, spark, tmp_path):
        import os
        import time

        from pgstream_spark.sources.skipping import vacuum_staging

        tbl = self._make(spark, tmp_path)
        old = os.path.join(tbl, "_delete_stage_crashed")
        new = os.path.join(tbl, "_ingest_stage_live")
        os.makedirs(old)
        os.makedirs(new)
        past = time.time() - 7200
        os.utime(old, (past, past))
        assert vacuum_staging(tbl, grace_seconds=3600) == 1
        assert not os.path.exists(old) and os.path.exists(new)
        assert spark.read.parquet(tbl).count() == 800  # data untouched

    def test_metadata_aggregate_unknown_nulls_not_zero(self, spark, tmp_path):
        """A file whose stat column is entirely NULL has no min/max; its
        null count must flow through as known (or the aggregate as
        unknown) — never silently as 'zero nulls'."""
        from pgstream_spark.sources.skipping import (
            metadata_aggregate,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        spark.createDataFrame([(1, 10)], "id long, v int").coalesce(1).write.parquet(tbl)
        spark.createDataFrame(
            [(2, None), (3, None)], "id long, v int"
        ).coalesce(1).write.mode("append").parquet(tbl)
        write_stats_manifest(spark, tbl, ["v"])
        got = {r.column: r for r in metadata_aggregate(spark, tbl).collect()}
        # parquet footers DO carry null counts for all-null chunks, so
        # the exact answer is available: 3 rows, 1 non-null
        assert got["v"].n_rows == 3 and got["v"].n_nonnull == 1

    def test_bloom_prunes_scattered_keys(self, spark, tmp_path):
        """The layout min/max can't help: keys scattered uniformly mod 8
        put every file's [min,max] across the domain — the bloom still
        prunes a point lookup to the one file holding the key."""
        from pgstream_spark.sources.skipping import (
            add_bloom_sidecar,
            bloom_pruned_parquet,
            write_stats_manifest,
        )

        df = spark.range(0, 800).selectExpr("id AS k", "id % 8 AS bucket")
        tbl = str(tmp_path / "t")
        df.repartition(8, "bucket").write.parquet(tbl)  # k scattered
        write_stats_manifest(spark, tbl, ["k"])
        add_bloom_sidecar(spark, tbl, "k")
        out = bloom_pruned_parquet(spark, tbl, "k", [5])
        full = spark.read.parquet(tbl).filter("k IN (5)")
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, full.collect())
        )
        n_total = len(spark.read.parquet(tbl).inputFiles())
        assert len(out.inputFiles()) < n_total  # min/max could never prune here
        # a value present nowhere: most files bloom-pruned, result empty
        miss = bloom_pruned_parquet(spark, tbl, "k", [999999])
        assert miss.count() == 0

    def test_bloom_superset_never_false_negative(self, spark, tmp_path):
        from pgstream_spark.sources.skipping import (
            add_bloom_sidecar,
            bloom_pruned_parquet,
            write_stats_manifest,
        )

        df = spark.range(0, 500).selectExpr(
            "id AS k", "CAST(concat('u', id % 97) AS string) AS name"
        )
        tbl = str(tmp_path / "t")
        df.repartition(6).write.parquet(tbl)
        write_stats_manifest(spark, tbl, ["k"])
        add_bloom_sidecar(spark, tbl, "name")
        # every probe value must come back complete (superset contract)
        for probe in (["u0"], ["u13", "u95"], ["u96", "nope"]):
            got = sorted(
                r.k for r in bloom_pruned_parquet(
                    spark, tbl, "name", probe
                ).collect()
            )
            want = sorted(
                r.k
                for r in spark.read.parquet(tbl).collect()
                if r.name in probe
            )
            assert got == want

    def test_bloom_unbuilt_files_never_pruned(self, spark, tmp_path):
        from pgstream_spark.sources.skipping import (
            add_bloom_sidecar,
            bloom_pruned_parquet,
            update_stats_manifest,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        spark.range(0, 100).selectExpr("id AS k").coalesce(1).write.parquet(tbl)
        write_stats_manifest(spark, tbl, ["k"])
        add_bloom_sidecar(spark, tbl, "k")
        # append AFTER the bloom build: new file has no bloom
        spark.range(100, 200).selectExpr("id AS k").coalesce(1).write.mode(
            "append"
        ).parquet(tbl)
        update_stats_manifest(spark, tbl, ["k"])
        out = bloom_pruned_parquet(spark, tbl, "k", [150])
        assert [r.k for r in out.collect()] == [150]  # found despite no bloom

    def test_bloom_float_column_refused(self, spark, tmp_path):
        import pytest as _pytest

        from pgstream_spark.sources.skipping import (
            add_bloom_sidecar,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, 1.5)], "k long, v double"
        ).coalesce(1).write.parquet(tbl)
        write_stats_manifest(spark, tbl, ["k"])
        with _pytest.raises(TypeError, match="float"):
            add_bloom_sidecar(spark, tbl, "v")

    # -- round-9 regressions + incremental bloom maintenance ----------

    @staticmethod
    def _one_file(spark, tmp_path, name, lo, hi, dest):
        """Write [lo, hi) as a SINGLE deterministically-named data file
        (Spark part names embed random UUIDs — the r8 manifest-rewrite
        bug only fired when a bloom-less name happened to sort first,
        so regressions must control the sort order explicitly)."""
        import shutil

        stage = str(tmp_path / f"__stage_{name}")
        spark.range(lo, hi).selectExpr("id AS k").coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        os.makedirs(dest, exist_ok=True)
        part = next(
            f for f in os.listdir(stage)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        os.replace(os.path.join(stage, part), os.path.join(dest, name))
        shutil.rmtree(stage, ignore_errors=True)

    def test_bloom_column_survives_reconcile_any_sort_order(
        self, spark, tmp_path
    ):
        """r8 regression: a refreshed (bloom-less) manifest row sorting
        FIRST must not drop the bloom column from the rewrite — the
        schema is the explicit old∪new union, not first-row inference."""
        import pyarrow.parquet as pq

        from pgstream_spark.sources.skipping import (
            MANIFEST_NAME,
            add_bloom_sidecar,
            bloom_pruned_parquet,
            update_stats_manifest,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        self._one_file(spark, tmp_path, "zz.parquet", 0, 100, tbl)
        write_stats_manifest(spark, tbl, ["k"])
        add_bloom_sidecar(spark, tbl, "k")
        # append a file that sorts BEFORE the bloom-carrying row
        self._one_file(spark, tmp_path, "aa.parquet", 100, 200, tbl)
        update_stats_manifest(spark, tbl, ["k"])
        man = pq.read_table(os.path.join(tbl, MANIFEST_NAME)).to_pylist()
        by = {r["file"]: r for r in man}
        assert "bloom_k" in man[0]  # column survived the rewrite
        assert by["zz.parquet"]["bloom_k"] is not None  # old blob kept
        assert by["aa.parquet"]["bloom_k"] is None  # new file: no bloom yet
        out = bloom_pruned_parquet(spark, tbl, "k", [50, 150])
        assert sorted(r.k for r in out.collect()) == [50, 150]

    def test_update_bloom_sidecar_builds_only_missing(self, spark, tmp_path):
        import pyarrow.parquet as pq

        from pgstream_spark.sources.skipping import (
            MANIFEST_NAME,
            add_bloom_sidecar,
            bloom_pruned_parquet,
            update_bloom_sidecar,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        self._one_file(spark, tmp_path, "f0.parquet", 0, 100, tbl)
        self._one_file(spark, tmp_path, "f1.parquet", 100, 200, tbl)
        write_stats_manifest(spark, tbl, ["k"])
        add_bloom_sidecar(spark, tbl, "k")
        before = {
            r["file"]: r["bloom_k"]
            for r in pq.read_table(os.path.join(tbl, MANIFEST_NAME)).to_pylist()
        }
        self._one_file(spark, tmp_path, "f2.parquet", 200, 300, tbl)
        res = update_bloom_sidecar(spark, tbl, "k")
        assert res == {"files_built": 1, "files_total": 3}
        after = {
            r["file"]: r["bloom_k"]
            for r in pq.read_table(os.path.join(tbl, MANIFEST_NAME)).to_pylist()
        }
        # old blobs byte-identical (old files were NOT re-read/rebuilt)
        assert after["f0.parquet"] == before["f0.parquet"]
        assert after["f1.parquet"] == before["f1.parquet"]
        assert after["f2.parquet"] is not None  # appended file gained one
        # point lookup now prunes: value 250 lives only in f2
        out = bloom_pruned_parquet(spark, tbl, "k", [250])
        assert [r.k for r in out.collect()] == [250]
        assert len(out.inputFiles()) == 1
        # idempotent: nothing left to build
        assert update_bloom_sidecar(spark, tbl, "k")["files_built"] == 0

    def test_update_bloom_sidecar_geometry_guard(self, spark, tmp_path):
        import pytest as _pytest

        from pgstream_spark.sources.skipping import (
            add_bloom_sidecar,
            update_bloom_sidecar,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        self._one_file(spark, tmp_path, "f0.parquet", 0, 100, tbl)
        write_stats_manifest(spark, tbl, ["k"])
        add_bloom_sidecar(spark, tbl, "k", m_bits=4096, k=4)
        self._one_file(spark, tmp_path, "f1.parquet", 100, 200, tbl)
        with _pytest.raises(ValueError, match="geometry"):
            update_bloom_sidecar(spark, tbl, "k", m_bits=8192)
        # parameterless call recovers the existing geometry and builds
        assert update_bloom_sidecar(spark, tbl, "k")["files_built"] == 1

    def test_add_bloom_reconciles_unknown_files_first(self, spark, tmp_path):
        """ADVICE r8: a file appended between manifest build and bloom
        build must get a stat row + bloom, not KeyError the build."""
        from pgstream_spark.sources.skipping import (
            add_bloom_sidecar,
            bloom_pruned_parquet,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        self._one_file(spark, tmp_path, "f0.parquet", 0, 100, tbl)
        write_stats_manifest(spark, tbl, ["k"])
        self._one_file(spark, tmp_path, "f1.parquet", 100, 200, tbl)
        add_bloom_sidecar(spark, tbl, "k")  # must not raise
        out = bloom_pruned_parquet(spark, tbl, "k", [150])
        assert [r.k for r in out.collect()] == [150]
        assert len(out.inputFiles()) == 1

    def test_bloom_read_degrades_without_sidecar_column(
        self, spark, tmp_path
    ):
        from pgstream_spark.sources.skipping import (
            bloom_pruned_parquet,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        self._one_file(spark, tmp_path, "f0.parquet", 0, 100, tbl)
        write_stats_manifest(spark, tbl, ["k"])
        # no sidecar built: superset read, never an error
        out = bloom_pruned_parquet(spark, tbl, "k", [42])
        assert [r.k for r in out.collect()] == [42]

    def test_compact_dir_rebuilds_bloom_sidecar(self, spark, tmp_path):
        import pyarrow.parquet as pq

        from pgstream_spark.sinks import compact_dir
        from pgstream_spark.sources.skipping import (
            MANIFEST_NAME,
            add_bloom_sidecar,
            bloom_pruned_parquet,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        for i in range(4):
            self._one_file(
                spark, tmp_path, f"f{i}.parquet", i * 50, (i + 1) * 50, tbl
            )
        write_stats_manifest(spark, tbl, ["k"])
        add_bloom_sidecar(spark, tbl, "k", m_bits=4096, k=4)
        compact_dir(spark, tbl, target_file_bytes=1 << 30)
        man = pq.read_table(os.path.join(tbl, MANIFEST_NAME)).to_pylist()
        blobs = [r.get("bloom_k") for r in man]
        assert blobs and all(b is not None for b in blobs)  # rebuilt
        # same geometry as before compaction (k under the format tag)
        assert all(
            b[0] & 0x7F == 4 and (len(b) - 1) * 8 == 4096 for b in blobs
        )
        out = bloom_pruned_parquet(spark, tbl, "k", [123])
        assert [r.k for r in out.collect()] == [123]

    def test_statless_file_never_range_pruned(self, spark, tmp_path):
        """ADVICE r8: min/max ABSENT (write_statistics=False) is not
        the same as all-NULL — the file must still be read."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pgstream_spark.sources.skipping import (
            pruned_parquet,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        self._one_file(spark, tmp_path, "f0.parquet", 0, 100, tbl)
        pq.write_table(
            pa.table({"k": pa.array([500, 501], pa.int64())}),
            os.path.join(tbl, "nostats.parquet"),
            write_statistics=False,
        )
        write_stats_manifest(spark, tbl, ["k"])
        out = pruned_parquet(spark, tbl, "k", lower=500, upper=600)
        assert sorted(r.k for r in out.collect()) == [500, 501]

    def test_all_null_proven_file_is_pruned(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pgstream_spark.sources.skipping import (
            pruned_parquet,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        self._one_file(spark, tmp_path, "f0.parquet", 0, 100, tbl)
        pq.write_table(
            pa.table({"k": pa.array([None, None], pa.int64())}),
            os.path.join(tbl, "allnull.parquet"),
        )
        write_stats_manifest(spark, tbl, ["k"])
        out = pruned_parquet(spark, tbl, "k", lower=0, upper=1000)
        assert out.count() == 100
        # the all-NULL file is PROVEN unmatchable and skipped
        assert len(out.inputFiles()) == 1

    def test_delete_where_rewrites_statless_files(self, spark, tmp_path):
        """ADVICE r8 data-safety: rows in a stats-less file must not
        silently survive a targeted delete."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pgstream_spark.sources.skipping import (
            delete_where,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        self._one_file(spark, tmp_path, "f0.parquet", 0, 100, tbl)
        pq.write_table(
            pa.table({"k": pa.array([42, 900], pa.int64())}),
            os.path.join(tbl, "nostats.parquet"),
            write_statistics=False,
        )
        write_stats_manifest(spark, tbl, ["k"])
        res = delete_where(spark, tbl, "k", values=[42])
        # both the stats-carrying f0 (contains 42) and the stats-less
        # file (might) are rewritten; both 42s are gone, 900 survives
        assert res["files_touched"] == 2 and res["rows_deleted"] == 2
        remaining = sorted(r.k for r in spark.read.parquet(tbl).collect())
        assert 42 not in remaining and 900 in remaining

    def test_streaming_ingest_keeps_bloom_pruning_live(
        self, spark, tmp_path
    ):
        import pyarrow.parquet as pq

        from pgstream_spark.sources.skipping import (
            MANIFEST_NAME,
            bloom_pruned_parquet,
            foreach_batch_stats_appender,
        )

        tbl = str(tmp_path / "t")
        fn = foreach_batch_stats_appender(tbl, ["k"], bloom_cols=["k"])
        fn(spark.range(0, 100).selectExpr("id AS k"), 0)
        fn(spark.range(100, 200).selectExpr("id AS k"), 1)
        man = pq.read_table(os.path.join(tbl, MANIFEST_NAME)).to_pylist()
        assert all(r.get("bloom_k") is not None for r in man)
        out = bloom_pruned_parquet(spark, tbl, "k", [150])
        assert [r.k for r in out.collect()] == [150]
        assert len(out.inputFiles()) < len(man)  # bloom actually pruned
        # replay of batch 1 keeps blooms consistent (idempotent)
        fn(spark.range(100, 200).selectExpr("id AS k"), 1)
        assert spark.read.parquet(tbl).count() == 200
        assert bloom_pruned_parquet(spark, tbl, "k", [150]).count() == 1


class TestDataSkippingHadoopFS:
    """The skipping tier over a SCHEME'D path (file:// exercises the
    Hadoop FileSystem routing end-to-end: listing, identity, manifest
    replace-commit, footer reads, bloom builds, staged renames — the
    exact calls an hdfs:///s3a:// table makes)."""

    def test_scheme_path_end_to_end(self, spark, tmp_path):
        from pgstream_spark.sources.skipping import (
            add_bloom_sidecar,
            bloom_pruned_parquet,
            delete_where,
            metadata_aggregate,
            pruned_parquet,
            read_stats_manifest,
            update_bloom_sidecar,
            update_stats_manifest,
            write_stats_manifest,
        )

        tbl = "file://" + str(tmp_path / "t")
        spark.range(0, 400).selectExpr("id AS k").repartition(4).write.parquet(
            tbl
        )
        # build
        write_stats_manifest(spark, tbl, ["k"])
        assert read_stats_manifest(spark, tbl).count() == 4
        # prune (bit-identical superset contract)
        pruned = pruned_parquet(spark, tbl, "k", lower=10, upper=29)
        full = spark.read.parquet(tbl).filter("k BETWEEN 10 AND 29")
        assert sorted(r.k for r in pruned.collect()) == sorted(
            r.k for r in full.collect()
        )
        # append + reconcile
        spark.range(400, 500).selectExpr("id AS k").coalesce(1).write.mode(
            "append"
        ).parquet(tbl)
        update_stats_manifest(spark, tbl, ["k"])
        assert read_stats_manifest(spark, tbl).count() == 5
        assert pruned_parquet(spark, tbl, "k", 450, 459).count() == 10
        # metadata-only aggregate sees the appended rows
        agg = {r.column: r for r in metadata_aggregate(spark, tbl).collect()}
        assert agg["k"].n_rows == 500 and agg["k"].max == "499"
        # bloom build + incremental update over the scheme'd path
        add_bloom_sidecar(spark, tbl, "k")
        spark.range(500, 600).selectExpr("id AS k").coalesce(1).write.mode(
            "append"
        ).parquet(tbl)
        assert update_bloom_sidecar(spark, tbl, "k")["files_built"] == 1
        out = bloom_pruned_parquet(spark, tbl, "k", [550])
        assert [r.k for r in out.collect()] == [550]
        # targeted delete: staged rename swap-in through Hadoop FS
        res = delete_where(spark, tbl, "k", values=[42, 550])
        assert res["rows_deleted"] == 2
        left = spark.read.parquet(tbl)
        assert left.count() == 598
        assert left.filter("k IN (42, 550)").count() == 0
        # manifest reconciled after the delete
        assert pruned_parquet(spark, tbl, "k", 40, 44).count() == 4

    def test_legacy_untagged_blooms_still_probe(self, spark, tmp_path):
        """Sidecars built by the pre-round-9 per-digest scheme (bare-k
        first byte) must keep probing correctly next to round-9 tagged
        blobs — the probe dispatches per blob."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pgstream_spark.sources.skipping import (
            MANIFEST_NAME,
            _bloom_hashes,
            bloom_pruned_parquet,
            update_bloom_sidecar,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        TestDataSkipping._one_file(spark, tmp_path, "f0.parquet", 0, 100, tbl)
        write_stats_manifest(spark, tbl, ["k"])
        # hand-build a LEGACY blob for f0 exactly as the old code did
        m_bits, k = 4096, 6
        bits = bytearray(m_bits // 8)
        for v in range(100):
            for pos in _bloom_hashes(v, m_bits, k):
                bits[pos // 8] |= 1 << (pos % 8)
        man = pq.read_table(os.path.join(tbl, MANIFEST_NAME)).to_pylist()
        man[0]["bloom_k"] = bytes([k]) + bytes(bits)  # untagged legacy
        pq.write_table(
            pa.Table.from_pylist(man), os.path.join(tbl, MANIFEST_NAME)
        )
        # legacy blob answers the probe
        out = bloom_pruned_parquet(spark, tbl, "k", [42])
        assert [r.k for r in out.collect()] == [42]
        # a definitely-absent value is pruned through the LEGACY hash
        assert bloom_pruned_parquet(spark, tbl, "k", [987654321]).count() == 0
        # incremental update alongside it: new file gets a TAGGED blob,
        # geometry recovered from the legacy one, and both keep working
        TestDataSkipping._one_file(
            spark, tmp_path, "f1.parquet", 100, 200, tbl
        )
        assert update_bloom_sidecar(spark, tbl, "k")["files_built"] == 1
        man2 = {
            r["file"]: r["bloom_k"]
            for r in pq.read_table(
                os.path.join(tbl, MANIFEST_NAME)
            ).to_pylist()
        }
        assert man2["f0.parquet"][0] == k  # legacy blob untouched
        assert man2["f1.parquet"][0] == (k | 0x80)  # tagged, same k
        assert len(man2["f1.parquet"]) == len(man2["f0.parquet"])  # same m
        got = bloom_pruned_parquet(spark, tbl, "k", [42, 150])
        assert sorted(r.k for r in got.collect()) == [42, 150]

    def test_scan_method_blooms_byte_identical_to_footers(
        self, spark, tmp_path
    ):
        """The executor-side (applyInPandas) build must emit the SAME
        blobs as the driver pyarrow build — one shared hash kernel —
        including over a nullable int column (the Arrow float64
        conversion hazard)."""
        import pyarrow.parquet as pq

        from pgstream_spark.sources.skipping import (
            MANIFEST_NAME,
            add_bloom_sidecar,
            bloom_pruned_parquet,
            update_bloom_sidecar,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        spark.createDataFrame(
            [(i, i if i % 7 else None) for i in range(200)],
            "k long, v long",
        ).repartition(3).write.parquet(tbl)
        write_stats_manifest(spark, tbl, ["k"])
        add_bloom_sidecar(spark, tbl, "v", m_bits=4096, k=4)
        a = {
            r["file"]: r["bloom_v"]
            for r in pq.read_table(os.path.join(tbl, MANIFEST_NAME)).to_pylist()
        }
        add_bloom_sidecar(spark, tbl, "v", m_bits=4096, k=4, method="scan")
        b = {
            r["file"]: r["bloom_v"]
            for r in pq.read_table(os.path.join(tbl, MANIFEST_NAME)).to_pylist()
        }
        assert a == b and all(v is not None for v in a.values())
        # probe correctness through the scan-built blobs (int rendering
        # survived the pandas float64 detour)
        out = bloom_pruned_parquet(spark, tbl, "v", [50])
        assert [r.k for r in out.collect()] == [50]
        # incremental scan-method build on an appended file
        spark.createDataFrame([(500, 500)], "k long, v long").coalesce(
            1
        ).write.mode("append").parquet(tbl)
        res = update_bloom_sidecar(spark, tbl, "v", method="scan")
        assert res["files_built"] == 1
        assert bloom_pruned_parquet(spark, tbl, "v", [500]).count() == 1

    def test_scan_method_refuses_non_int_string_columns(
        self, spark, tmp_path
    ):
        import pytest as _pytest

        from pgstream_spark.sources.skipping import (
            add_bloom_sidecar,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, 1.5, True)], "k long, v double, b boolean"
        ).coalesce(1).write.parquet(tbl)
        write_stats_manifest(spark, tbl, ["k"])
        with _pytest.raises(TypeError, match="integer and string"):
            add_bloom_sidecar(spark, tbl, "v", method="scan")
        # non-float but render-divergent types are refused too
        with _pytest.raises(TypeError, match="integer and string"):
            add_bloom_sidecar(spark, tbl, "b", method="scan")

    def test_scan_method_exact_above_2_53_with_nulls(self, spark, tmp_path):
        """ids above 2^53 in a NULL-carrying int column must survive the
        Arrow pandas conversion exactly (float64 would corrupt them into
        bloom false negatives)."""
        from pgstream_spark.sources.skipping import (
            add_bloom_sidecar,
            bloom_pruned_parquet,
            write_stats_manifest,
        )

        big = (1 << 60) + 12345  # not representable in float64
        tbl = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, big), (2, None), (3, 7)], "k long, v long"
        ).coalesce(1).write.parquet(tbl)
        spark.createDataFrame(
            [(4, 99)], "k long, v long"
        ).coalesce(1).write.mode("append").parquet(tbl)
        write_stats_manifest(spark, tbl, ["k"])
        add_bloom_sidecar(spark, tbl, "v", method="scan")
        out = bloom_pruned_parquet(spark, tbl, "v", [big])
        assert [r.k for r in out.collect()] == [1]  # found, not corrupted
        assert len(out.inputFiles()) == 1  # and the other file pruned

    def test_scan_update_handles_zero_row_files(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pgstream_spark.sources.skipping import (
            add_bloom_sidecar,
            bloom_pruned_parquet,
            update_bloom_sidecar,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        TestDataSkipping._one_file(spark, tmp_path, "f0.parquet", 0, 50, tbl)
        write_stats_manifest(spark, tbl, ["k"])
        add_bloom_sidecar(spark, tbl, "k")
        # an EMPTY part file appended (an empty micro-batch's artifact)
        pq.write_table(
            pa.table({"k": pa.array([], pa.int64())}),
            os.path.join(tbl, "f1-empty.parquet"),
        )
        res = update_bloom_sidecar(spark, tbl, "k", method="scan")
        assert res["files_built"] == 1  # the empty file got a blob
        # empty bitmap prunes the empty file; data still found
        out = bloom_pruned_parquet(spark, tbl, "k", [42])
        assert [r.k for r in out.collect()] == [42]
        assert len(out.inputFiles()) == 1

    def test_bloom_pruned_join_skips_files_and_matches_plain_join(
        self, spark, tmp_path
    ):
        from pgstream_spark.sources.skipping import (
            add_bloom_sidecar,
            bloom_pruned_join,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        for i in range(4):
            TestDataSkipping._one_file(
                spark, tmp_path, f"f{i}.parquet", i * 100, (i + 1) * 100, tbl
            )
        write_stats_manifest(spark, tbl, ["k"])
        add_bloom_sidecar(spark, tbl, "k")
        dim = spark.createDataFrame(
            [(50, "a"), (350, "b"), (50, "dup"), (None, "n")],
            "key long, tag string",
        )
        semi = bloom_pruned_join(spark, tbl, "k", dim, "key", how="left_semi")
        assert sorted(r.k for r in semi.collect()) == [50, 350]
        assert len(semi.inputFiles()) == 2  # f0 and f3 only
        inner = bloom_pruned_join(spark, tbl, "k", dim, "key", how="inner")
        # inner keeps dim multiplicity (50 appears twice in dim)
        assert sorted(r.k for r in inner.collect()) == [50, 50, 350]
        # plain-join parity
        full = spark.read.parquet(tbl)
        plain = full.join(dim, full.k == dim.key, "inner")
        assert inner.count() == plain.count()

    def test_bloom_pruned_join_guards(self, spark, tmp_path):
        import pytest as _pytest

        from pgstream_spark.sources.skipping import (
            bloom_pruned_join,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        TestDataSkipping._one_file(spark, tmp_path, "f0.parquet", 0, 50, tbl)
        write_stats_manifest(spark, tbl, ["k"])
        dim = spark.range(10).selectExpr("id AS key")
        with _pytest.raises(ValueError, match="outer"):
            bloom_pruned_join(spark, tbl, "k", dim, "key", how="left")
        with _pytest.raises(ValueError, match="max_keys"):
            bloom_pruned_join(spark, tbl, "k", dim, "key", max_keys=5)
        # all-NULL dim keys: typed empty result, no crash
        nulls = spark.createDataFrame([(None,)], "key long")
        assert bloom_pruned_join(spark, tbl, "k", nulls, "key").count() == 0

    def test_bloom_fpr_within_design_bound(self, spark, tmp_path):
        """The sidecar's one approximation is its false-positive rate —
        measure it against planted membership (deterministic md5 hashing:
        this is a fixed number, not a flake).  8 files x 2000 distinct
        ids at m=16384, k=6 gives a theoretical FPR ~2%
        ((1 - e^(-kn/m))^k); assert the empirical rate stays under 5%
        and false NEGATIVES are exactly zero (the failure a bloom must
        never have)."""
        from pgstream_spark.sources.skipping import (
            add_bloom_sidecar,
            bloom_pruned_parquet,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        per_file = 2000
        for i in range(8):
            TestDataSkipping._one_file(
                spark, tmp_path, f"f{i}.parquet",
                i * per_file, (i + 1) * per_file, tbl,
            )
        write_stats_manifest(spark, tbl, ["k"])
        add_bloom_sidecar(spark, tbl, "k", m_bits=16384, k=6)
        # present keys: every probe must open EXACTLY its owning file
        # (zero false negatives by construction; extra files = FPs)
        fp = total_checks = 0
        for v in (3, 4001, 9500, 15999):
            df = bloom_pruned_parquet(spark, tbl, "k", [v])
            assert [r.k for r in df.collect()] == [v]  # never lost
            fp += len(df.inputFiles()) - 1
            total_checks += 8
        # absent keys: every file kept is a false positive (inputFiles
        # inspects the planned scan — no job needs to run)
        absent = list(range(100_000, 100_250))
        for v in absent:
            df = bloom_pruned_parquet(spark, tbl, "k", [v])
            fp += len(df.inputFiles())
            total_checks += 8
        rate = fp / total_checks
        assert rate < 0.05, f"bloom FPR {rate:.4f} above the design bound"


class TestAdviceR9Regressions:
    """Round-10 fixes for the ADVICE-r9 findings."""

    def test_unified_table_empty_rows_keeps_prior_schema(self):
        import pyarrow as pa

        from pgstream_spark.sources.skipping import _unified_table

        prior = pa.schema(
            [("file", pa.string()), ("n_rows", pa.int64()), ("bloom_k", pa.binary())]
        )
        tbl = _unified_table([], prior)
        assert tbl.num_rows == 0
        assert tbl.schema.names == ["file", "n_rows", "bloom_k"]
        assert tbl.schema.field("bloom_k").type == pa.binary()

    def test_scan_bloom_spaced_filename_not_bloomed_empty(self, spark, tmp_path):
        # input_file_name() URL-encodes the URI; a space in the file name
        # used to miss the listdir-keyed dict and silently bloom the file
        # EMPTY (prune-everything) — a false negative.  Now the basename
        # is unquoted, so the blob keys match and the probe finds the row.
        from pgstream_spark.sources.skipping import (
            bloom_pruned_parquet,
            update_bloom_sidecar,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        TestDataSkipping._one_file(spark, tmp_path, "f one.parquet", 0, 50, tbl)
        TestDataSkipping._one_file(spark, tmp_path, "f%2Etwo.parquet", 50, 100, tbl)
        write_stats_manifest(spark, tbl, ["k"])
        update_bloom_sidecar(spark, tbl, "k", method="scan")
        assert [r.k for r in bloom_pruned_parquet(spark, tbl, "k", [42]).collect()] == [42]
        assert [r.k for r in bloom_pruned_parquet(spark, tbl, "k", [77]).collect()] == [77]

    def test_scan_bloom_missing_group_raises_not_empty(
        self, spark, tmp_path, monkeypatch
    ):
        # a missing applyInPandas group for a NON-empty file must raise,
        # never record the prune-everything bitmap
        import pytest as _pytest

        from pgstream_spark.sources import skipping

        tbl = str(tmp_path / "t")
        TestDataSkipping._one_file(spark, tmp_path, "f0.parquet", 0, 50, tbl)
        skipping.write_stats_manifest(spark, tbl, ["k"])
        monkeypatch.setattr(skipping, "_scan_blooms", lambda *a, **kw: {})
        with _pytest.raises(RuntimeError, match="non-empty file"):
            skipping.update_bloom_sidecar(spark, tbl, "k", method="scan")

    def test_unmanifested_append_still_read_by_pruned_scans(self, spark, tmp_path):
        # a data file appended WITHOUT a reconcile has no manifest row —
        # both pruned readers must still read it (superset contract)
        from pgstream_spark.sources.skipping import (
            add_bloom_sidecar,
            bloom_pruned_parquet,
            pruned_parquet,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        TestDataSkipping._one_file(spark, tmp_path, "f0.parquet", 0, 100, tbl)
        write_stats_manifest(spark, tbl, ["k"])
        add_bloom_sidecar(spark, tbl, "k")
        TestDataSkipping._one_file(spark, tmp_path, "f1-late.parquet", 100, 200, tbl)
        got = pruned_parquet(spark, tbl, "k", 150, 160)
        assert got.count() == 11
        got2 = bloom_pruned_parquet(spark, tbl, "k", [150])
        assert [r.k for r in got2.collect()] == [150]

    def test_delete_where_reconciles_before_pruning(self, spark, tmp_path):
        # rows in an unreconciled append must not dodge a delete
        from pgstream_spark.sources.skipping import delete_where, write_stats_manifest

        tbl = str(tmp_path / "t")
        TestDataSkipping._one_file(spark, tmp_path, "f0.parquet", 0, 100, tbl)
        write_stats_manifest(spark, tbl, ["k"])
        TestDataSkipping._one_file(spark, tmp_path, "f1-late.parquet", 100, 200, tbl)
        res = delete_where(spark, tbl, "k", values=[150, 151])
        assert res["rows_deleted"] == 2
        assert spark.read.parquet(tbl).filter("k IN (150, 151)").count() == 0
        assert spark.read.parquet(tbl).count() == 198

    def test_bloom_pruned_join_shuffle_fallback_matches(self, spark, tmp_path):
        from pgstream_spark.sources.skipping import (
            add_bloom_sidecar,
            bloom_pruned_join,
            write_stats_manifest,
        )

        tbl = str(tmp_path / "t")
        for i in range(3):
            TestDataSkipping._one_file(
                spark, tmp_path, f"f{i}.parquet", i * 100, (i + 1) * 100, tbl
            )
        write_stats_manifest(spark, tbl, ["k"])
        add_bloom_sidecar(spark, tbl, "k")
        dim = spark.range(0, 40).selectExpr("id * 7 AS key")  # 40 keys
        pruned = bloom_pruned_join(spark, tbl, "k", dim, "key", how="left_semi")
        fb = bloom_pruned_join(
            spark, tbl, "k", dim, "key", how="left_semi",
            max_keys=10, fallback="shuffle",
        )
        assert sorted(r.k for r in fb.collect()) == sorted(
            r.k for r in pruned.collect()
        )
        inner_fb = bloom_pruned_join(
            spark, tbl, "k", dim, "key", max_keys=10, fallback="shuffle"
        )
        assert inner_fb.count() == pruned.count()
        import pytest as _pytest

        with _pytest.raises(ValueError, match="fallback"):
            bloom_pruned_join(spark, tbl, "k", dim, "key", fallback="nope")


class TestVersionedDelete:
    """delete_where(versioned=True) — copy-on-write delete on a
    snapshot store; the crash window of the in-place form is gone."""

    @staticmethod
    def _store(spark, tmp_path):
        from pgstream_spark.sources.skipping import snapshot_table, write_stats_manifest

        tbl = str(tmp_path / "t")
        for i in range(3):
            TestDataSkipping._one_file(
                spark, tmp_path, f"f{i}.parquet", i * 100, (i + 1) * 100, tbl
            )
        write_stats_manifest(spark, tbl, ["k"])
        store = str(tmp_path / "store")
        assert snapshot_table(spark, tbl, store) == 1
        return tbl, store

    def test_versioned_delete_commits_new_version(self, spark, tmp_path):
        from pgstream_spark.operators.snapshot import list_versions, read_version
        from pgstream_spark.sources.skipping import delete_where

        tbl, store = self._store(spark, tmp_path)
        res = delete_where(spark, store, "k", values=[150, 151], versioned=True)
        assert res["version"] == 2 and res["rows_deleted"] == 2
        assert res["files_touched"] == 1 and res["files_total"] == 3
        latest = read_version(spark, store)
        assert latest.count() == 298
        assert latest.filter("k IN (150, 151)").count() == 0
        # old version time-travels untouched
        assert read_version(spark, store, 1).count() == 300
        assert list_versions(store) == [1, 2]
        # untouched files are HARDLINKED, not copied (same inode)
        f0_old = os.path.join(store, "v0001", "data", "f0.parquet")
        f0_new = os.path.join(store, "v0002", "data", "f0.parquet")
        assert os.stat(f0_old).st_ino == os.stat(f0_new).st_ino

    def test_crash_before_commit_never_shows_both(self, spark, tmp_path, monkeypatch):
        # kill at the exact commit point (manifest.json rename): the
        # reader must see the OLD version in full — never a state with
        # both the rewritten and original rows (the in-place window)
        import pytest as _pytest

        from pgstream_spark.operators.snapshot import list_versions, read_version
        from pgstream_spark.sources.skipping import delete_where

        tbl, store = self._store(spark, tmp_path)
        real_rename = os.rename

        def boom(src, dst):
            if str(dst).endswith("manifest.json"):
                raise OSError("injected crash at commit")
            return real_rename(src, dst)

        monkeypatch.setattr(os, "rename", boom)
        with _pytest.raises(OSError, match="injected"):
            delete_where(spark, store, "k", values=[150], versioned=True)
        monkeypatch.undo()
        # old version is still the committed latest and fully intact
        assert list_versions(store) == [1]
        latest = read_version(spark, store)
        assert latest.count() == 300
        assert latest.filter("k = 150").count() == 1  # exactly once, no dup
        # re-running the same delete completes cleanly
        res = delete_where(spark, store, "k", values=[150], versioned=True)
        assert res["version"] == 2 and res["rows_deleted"] == 1
        assert read_version(spark, store).count() == 299

    def test_versioned_no_match_is_metadata_only(self, spark, tmp_path):
        from pgstream_spark.operators.snapshot import list_versions
        from pgstream_spark.sources.skipping import delete_where

        tbl, store = self._store(spark, tmp_path)
        res = delete_where(spark, store, "k", values=[99999], versioned=True)
        assert res == {
            "files_touched": 0, "files_total": 3,
            "rows_deleted": 0, "version": 1,
        }
        assert list_versions(store) == [1]  # nothing committed

    def test_versioned_requires_bootstrapped_store(self, spark, tmp_path):
        import pytest as _pytest

        from pgstream_spark.sources.skipping import delete_where

        with _pytest.raises(FileNotFoundError, match="snapshot_table"):
            delete_where(
                spark, str(tmp_path / "nostore"), "k", values=[1], versioned=True
            )

    def test_snapshot_table_refuses_rebootstrap(self, spark, tmp_path):
        # review r10: re-running the bootstrap must not mutate committed
        # immutable versions or reset the latest pointer
        import pytest as _pytest

        from pgstream_spark.sources.skipping import delete_where, snapshot_table

        tbl, store = TestVersionedDelete._store(spark, tmp_path)
        delete_where(spark, store, "k", values=[5], versioned=True)
        with _pytest.raises(FileExistsError, match="committed versions"):
            snapshot_table(spark, tbl, store)
        with open(os.path.join(store, "latest")) as f:
            assert f.read().strip() == "2"  # pointer untouched

    def test_vacuum_versions_retention(self, spark, tmp_path):
        from pgstream_spark.operators.snapshot import list_versions, read_version
        from pgstream_spark.sources.skipping import delete_where, vacuum_versions

        tbl, store = TestVersionedDelete._store(spark, tmp_path)
        delete_where(spark, store, "k", values=[5], versioned=True)
        delete_where(spark, store, "k", values=[6], versioned=True)
        res = vacuum_versions(store, keep_last=2)
        assert res == {"dropped": [1], "kept": [2, 3]}
        assert list_versions(store) == [2, 3]
        # hardlink-shared files survive for the kept versions
        assert read_version(spark, store).count() == 298
        assert read_version(spark, store, 2).count() == 299
        # keep_last floors at 1 — latest always survives
        res2 = vacuum_versions(store, keep_last=0)
        assert res2["kept"] == [3] and list_versions(store) == [3]
