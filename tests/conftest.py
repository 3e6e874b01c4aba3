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

    # local[16] (r12, VERDICT r11 item 7 — suite duration): the host has
    # 32 cores and the suite is one session; 16 task slots roughly halve
    # the wide scan/union stages of the oracle and property tiers.
    # shuffle_partitions stays 8 so every shuffle-derived plan shape the
    # tests pin is unchanged.
    eng = pg.connect(
        master="local[16]",
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


def write_flat_parquet(spark, rows, schema, dest_file):
    """Write rows as ONE parquet FILE (not a directory) — the shape the
    file-stream source expects when files are dropped into a watched dir
    (non-partition subdirectories are ignored by the source)."""
    import glob
    import shutil
    import tempfile

    staging = tempfile.mkdtemp()
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        staging + "/out"
    )
    part = glob.glob(staging + "/out/part-*.parquet")[0]
    os.makedirs(os.path.dirname(dest_file), exist_ok=True)
    shutil.copy(part, dest_file)
    shutil.rmtree(staging)


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
