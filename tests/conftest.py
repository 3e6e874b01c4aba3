"""Shared fixtures: one SparkSession per test session (startup ~15 s)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PGSTREAM_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def engine():
    import pgstream_spark as pg

    eng = pg.connect(
        master="local[8]",
        app_name="pgstream_spark-tests",
        sf_dir=SF_DIR,
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    eng.spark.sparkContext.setLogLevel("ERROR")
    yield eng
    eng.spark.stop()


@pytest.fixture(scope="session")
def spark(engine):
    return engine.spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con
