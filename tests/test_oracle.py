"""Differential tests: every oracle-declared inventory query, Spark vs
DuckDB on the same parquet bytes (SURVEY §5.2-1) — the in-repo mirror of
the driver's correctness gate."""

from __future__ import annotations

import pytest

from pgstream_spark.inventory import ORACLE, QUERIES

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
from diffcheck import compare  # noqa: E402


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match(name, spark, sf_dir, duck):
    problems = compare(name, QUERIES[name](spark, sf_dir), duck, ORACLE[name])
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_execute(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
