"""Engine API: templating, binding, errors, schema/NULL discipline,
streaming delivery — the reference's library surface (SURVEY §2.A)."""

from __future__ import annotations

import datetime
import uuid

import pytest
from pyspark.sql import types as T

import pgstream_spark as pg
from pgstream_spark.querybuilder import SQL, Identifier, format_query, render_literal
from pgstream_spark.schema import assert_non_null, assert_schema


class TestRenderLiteral:
    # ToField semantics (reference QueryBuilder.hs:40-100)

    def test_numbers_plain(self):
        assert render_literal(42) == "42"
        # floats carry the D suffix: a bare decimal literal would be
        # parsed as exact DECIMAL under ANSI mode
        assert render_literal(4.5) == "4.5D"

    def test_none_is_null(self):
        assert render_literal(None) == "null"

    def test_bool_lowercase(self):
        assert render_literal(True) == "true"
        assert render_literal(False) == "false"

    def test_string_quoted_and_escaped(self):
        assert render_literal("abc") == "'abc'"
        assert render_literal("o'brien") == "'o\\'brien'"

    def test_uuid_quoted(self):
        u = uuid.UUID("12345678-1234-5678-1234-567812345678")
        assert render_literal(u) == f"'{u}'"

    def test_sql_fragment_raw(self):
        # the reference splices "LIMIT 100000" raw (Example.hs:55)
        assert render_literal(SQL("LIMIT 100000")) == "LIMIT 100000"

    def test_identifier_backquoted(self):
        assert render_literal(Identifier("my table")) == "`my table`"

    def test_datetime(self):
        d = datetime.datetime(2024, 1, 2, 3, 4, 5)
        assert render_literal(d) == "TIMESTAMP '2024-01-02 03:04:05'"

    def test_array(self):
        assert render_literal([1, 2, 3]) == "array(1, 2, 3)"


class TestFormatQuery:
    def test_positional_holes(self):
        assert format_query("a={1} b={2}", (1, "x")) == "a=1 b='x'"

    def test_single_arg_only_style(self):
        assert format_query("a={1}", 5) == "a=5"

    def test_named_params(self):
        assert format_query("a=:a b=:b", {"a": 1, "b": "y"}) == "a=1 b='y'"

    def test_arity_mismatch_raises(self):
        with pytest.raises(pg.QueryError):
            format_query("a={1} b={2}", (1,))

    def test_excess_args_raise(self):
        with pytest.raises(pg.QueryError):
            format_query("a={1}", (1, 2))

    def test_binding_never_alters_semantics(self, engine):
        # P-9: bound vs manually inlined give identical results
        bound = engine.rows(
            "SELECT count(*) AS n FROM orders WHERE o_totalprice BETWEEN {1} AND {2}",
            (1000.0, 80000.0),
        )
        inlined = engine.rows(
            "SELECT count(*) AS n FROM orders WHERE o_totalprice BETWEEN 1000.0 AND 80000.0"
        )
        assert bound == inlined

    def test_injection_via_value_is_inert(self, engine):
        rows = engine.rows(
            "SELECT count(*) AS n FROM customer WHERE c_name = {1}",
            ("x' OR '1'='1",),
        )
        assert rows[0].n == 0


class TestErrors:
    def test_query_error_carries_sql(self, engine):
        with pytest.raises(pg.QueryError) as ei:
            engine.query("SELECT nope FROM nowhere")
        assert "nowhere" in str(ei.value)

    def test_incompatible_schema(self, engine):
        df = engine.query("SELECT c_custkey FROM customer")
        with pytest.raises(pg.Incompatible):
            assert_schema(df, {"c_custkey": T.StringType()})

    def test_widening_allowed(self, engine):
        # int may be declared bigint (reference FromRow.hs:142-146)
        df = engine.query("SELECT n_nationkey FROM nation")
        assert_schema(df, {"n_nationkey": T.LongType()})

    def test_unexpected_null(self, engine):
        df = engine.query(
            "SELECT CASE WHEN c_custkey = 3 THEN NULL ELSE c_custkey END AS k "
            "FROM customer"
        )
        with pytest.raises(pg.UnexpectedNull) as ei:
            assert_non_null(df, ["k"])
        assert ei.value.column == "k"

    def test_non_null_passes_clean(self, engine):
        df = engine.query("SELECT c_custkey FROM customer")
        assert assert_non_null(df, ["c_custkey"]) is df


class TestStreamDelivery:
    # the reference's cursor-batch semantics (Stream.hs:244-284)

    def test_stream_equals_one_shot(self, engine):
        sql = "SELECT o_orderkey FROM orders ORDER BY o_orderkey"
        streamed = [r for batch in engine.stream(sql, batch_size=400) for r in batch]
        assert streamed == engine.rows(sql)

    def test_batch_size_respected(self, engine):
        batches = list(
            engine.stream("SELECT o_orderkey FROM orders", batch_size=400)
        )
        assert all(len(b) <= 400 for b in batches)
        assert sum(len(b) for b in batches) == 1500

    def test_empty_stream_terminates(self, engine):
        out = list(engine.stream("SELECT * FROM orders WHERE o_orderkey < 0"))
        assert out == []


class TestExecute:
    def test_ddl_dml_roundtrip(self, engine):
        # S-5: CREATE ... AS SELECT / INSERT / SELECT back
        engine.execute("DROP VIEW IF EXISTS t_s5")
        engine.execute(
            "CREATE TEMPORARY VIEW t_s5 AS "
            "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 10"
        )
        n = engine.rows("SELECT count(*) AS n FROM t_s5")[0].n
        assert n == engine.rows(
            "SELECT count(*) AS n FROM orders WHERE o_orderkey < 10"
        )[0].n


class TestTransactions:
    """A-17 — reference Stream.hs:166-231: bracket semantics on managed tables."""

    def test_commit_keeps_writes(self, engine):
        engine.execute("DROP TABLE IF EXISTS txn_t1")
        engine.execute("CREATE TABLE txn_t1 (k BIGINT, v STRING)")
        engine.execute("INSERT INTO txn_t1 VALUES (1, 'a')")
        with engine.transaction() as txn:
            txn.execute("INSERT INTO txn_t1 VALUES (2, 'b')")
            # read-your-writes inside the bracket
            assert txn.rows("SELECT count(*) AS n FROM txn_t1")[0].n == 2
        assert engine.rows("SELECT count(*) AS n FROM txn_t1")[0].n == 2
        # no backup tables left behind
        assert not [t for t in engine.spark.catalog.listTables() if t.name.startswith("__txn_")]
        engine.execute("DROP TABLE txn_t1")

    def test_rollback_restores_table_and_drops_created(self, engine):
        from pgstream_spark.errors import QueryError

        engine.execute("DROP TABLE IF EXISTS txn_t2")
        engine.execute("CREATE TABLE txn_t2 (k BIGINT)")
        engine.execute("INSERT INTO txn_t2 VALUES (1)")
        with pytest.raises(RuntimeError):
            with engine.transaction() as txn:
                txn.execute("INSERT INTO txn_t2 VALUES (2)")
                txn.execute("CREATE TABLE txn_t3 AS SELECT 99 AS x")
                assert txn.rows("SELECT count(*) AS n FROM txn_t2")[0].n == 2
                raise RuntimeError("boom")
        rows = engine.rows("SELECT k FROM txn_t2")
        assert [r.k for r in rows] == [1]  # insert rolled back
        assert not engine.spark.catalog.tableExists("txn_t3")  # create rolled back
        assert not [t for t in engine.spark.catalog.listTables() if t.name.startswith("__txn_")]
        engine.execute("DROP TABLE txn_t2")

    def test_rollback_restores_dropped_table(self, engine):
        engine.execute("DROP TABLE IF EXISTS txn_t4")
        engine.execute("CREATE TABLE txn_t4 AS SELECT 7 AS x")
        with pytest.raises(ValueError):
            with engine.transaction() as txn:
                txn.execute("DROP TABLE txn_t4")
                raise ValueError("abort")
        assert engine.rows("SELECT x FROM txn_t4")[0].x == 7
        engine.execute("DROP TABLE txn_t4")

    def test_read_only_mode_rejects_writes(self, engine):
        import pgstream_spark as pg
        from pgstream_spark.errors import QueryError

        engine.execute("DROP TABLE IF EXISTS txn_t5")
        engine.execute("CREATE TABLE txn_t5 (k BIGINT)")
        mode = pg.TransactionMode(read_write=pg.ReadWriteMode.READ_ONLY)
        with pytest.raises(QueryError):
            with engine.transaction(mode) as txn:
                txn.execute("INSERT INTO txn_t5 VALUES (1)")
        assert engine.rows("SELECT count(*) AS n FROM txn_t5")[0].n == 0
        engine.execute("DROP TABLE txn_t5")

    def test_stricter_isolation_levels_accepted(self, engine):
        import pgstream_spark as pg

        mode = pg.TransactionMode(isolation=pg.IsolationLevel.SERIALIZABLE)
        with engine.transaction(mode) as txn:
            assert txn.rows("SELECT 1 AS one")[0].one == 1


class TestFileSources:
    """sources/text — explicit-schema JSONL/CSV readers with quarantine."""

    def test_jsonl_corrupt_rows_quarantined(self, spark, tmp_path):
        from pgstream_spark.sources.text import read_jsonl, split_corrupt

        p = tmp_path / "docs.jsonl"
        p.write_text(
            '{"doc_id": 1, "text": "alpha"}\n'
            "this is not json at all\n"
            '{"doc_id": 2, "text": "beta"}\n'
            '{"doc_id": "not-a-number", "text": "gamma"}\n'
        )
        df = read_jsonl(spark, str(p), "doc_id long, text string")
        clean, bad = split_corrupt(df)
        got = {(r.doc_id, r.text) for r in clean.collect()}
        assert got == {(1, "alpha"), (2, "beta")}
        bad_lines = [r._corrupt for r in bad.collect()]
        assert len(bad_lines) == 2
        assert any("not json" in b for b in bad_lines)
        # quarantine keeps the raw line, so nothing is silently lost
        assert any("not-a-number" in b for b in bad_lines)

    def test_csv_schema_and_quarantine(self, spark, tmp_path):
        from pgstream_spark.sources.text import read_csv, split_corrupt

        p = tmp_path / "t.csv"
        p.write_text("id,price\n1,10.5\n2,oops\n3,30.25\n")
        df = read_csv(spark, str(p), "id long, price double")
        clean, bad = split_corrupt(df)
        assert {(r.id, r.price) for r in clean.collect()} == {
            (1, 10.5),
            (3, 30.25),
        }
        assert [r._corrupt for r in bad.collect()] == ["2,oops"]

    def test_csv_rfc_quote_roundtrip(self, spark, tmp_path):
        # DuckDB (like Excel/pandas/Postgres COPY CSV) writes RFC 4180
        # doubled-quote escaping; read_csv's default escape='\"' must
        # parse embedded quotes, delimiters, and newlines-in-values back
        # bit-identically (Spark's own backslash default mis-parses
        # "a""b").
        import duckdb

        from pgstream_spark.sources.text import read_csv, split_corrupt

        p = str(tmp_path / "rfc.csv")
        duckdb.connect().execute(
            "COPY (SELECT * FROM (VALUES "
            "(1, 'plain'), "
            "(2, 'comma, inside'), "
            "(3, 'quote \" and doubled \"\" inside'), "
            "(4, 'both \",\" mixed')) v(id, txt)) "
            f"TO '{p}' (FORMAT CSV, HEADER)"
        )
        df = read_csv(spark, p, "id long, txt string")
        clean, bad = split_corrupt(df)
        assert bad.count() == 0
        assert {(r.id, r.txt) for r in clean.collect()} == {
            (1, "plain"),
            (2, "comma, inside"),
            (3, 'quote " and doubled "" inside'),
            (4, 'both "," mixed'),
        }

    def test_failfast_mode_raises(self, spark, tmp_path):
        from pgstream_spark.errors import QueryError  # noqa: F401  (import parity)
        from pgstream_spark.sources.text import read_jsonl

        p = tmp_path / "bad.jsonl"
        p.write_text('{"doc_id": 1}\nnot json\n')
        df = read_jsonl(spark, str(p), "doc_id long", mode="FAILFAST")
        with pytest.raises(Exception):
            df.collect()

    def test_quarantine_supports_pruned_queries(self, spark, tmp_path):
        # count() prunes to zero columns — without the cached parse Spark
        # rejects corrupt-only queries off the raw scan; split_corrupt
        # must keep this working (the monitoring query every quarantine
        # pipeline runs)
        from pgstream_spark.sources.text import read_jsonl, split_corrupt

        p = tmp_path / "c.jsonl"
        p.write_text('{"a": 1}\nbroken\n')
        clean, bad = split_corrupt(read_jsonl(spark, str(p), "a long"))
        assert bad.count() == 1 and clean.count() == 1


def test_concurrent_queries_share_one_session(engine):
    """A-5/A-18: one Engine serves concurrent callers — eight threads
    running distinct parameterized queries all return correct results
    (Spark actions are thread-safe on a shared session; this pins the
    Engine wrapper doesn't break that)."""
    from concurrent.futures import ThreadPoolExecutor

    def one(i: int) -> tuple[int, int]:
        rows = engine.rows(
            "SELECT count(*) AS n FROM orders WHERE o_orderkey % {1} = 0",
            (i + 2,),
        )
        return i, rows[0][0]

    with ThreadPoolExecutor(max_workers=8) as ex:
        got = dict(ex.map(one, range(8)))
    serial = {
        i: engine.rows(
            "SELECT count(*) AS n FROM orders WHERE o_orderkey % {1} = 0", (i + 2,)
        )[0][0]
        for i in range(8)
    }
    assert got == serial and all(v > 0 for v in got.values())
