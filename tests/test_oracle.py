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


def test_all_oracles_gate_compatible(duck):
    """Registry-wide oracle-shape scan (FIXTURES.md 'Driver-gate oracle
    contract'): DESCRIBE every oracle SQL and reject the column types the
    driver's typed hash is known to break on even when values match —
    HUGEINT/UHUGEINT (the r1-f11 / r3-l12+t17 failure class) and
    container types (the r2 l5/f12 class).  Runs in seconds, no Spark:
    a new query cannot register a gate-incompatible oracle and pass the
    suite."""
    bad: list[str] = []
    for name, sql in ORACLE.items():
        try:
            desc = duck.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: DESCRIBE failed — {str(e).splitlines()[0]}")
            continue
        for row in desc:
            cname, ctype = row[0], row[1].upper()
            if ctype in ("HUGEINT", "UHUGEINT"):
                bad.append(
                    f"{name}.{cname}: {ctype} — CAST the SUM to BIGINT"
                )
            if "[]" in ctype or ctype.startswith(("STRUCT", "MAP", "LIST")):
                bad.append(
                    f"{name}.{cname}: container type {ctype} — serialize "
                    "to string for the gate"
                )
    assert not bad, "\n".join(bad)
