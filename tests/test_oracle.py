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


def test_no_vacuous_oracles(duck):
    """Registration-time zero-row rejection (VERDICT r4 item 2): an
    oracle-backed query whose result is empty at test scale produces a
    gate row that verifies nothing — the hash of an empty frame matches
    trivially (the o7/u3 disease).  DuckDB-only, so it runs in seconds;
    the Spark side is hash-pinned to the same row count by
    test_oracle_match."""
    from pgstream_spark.inventory import EMPTY_OK

    vacuous: list[str] = []
    for name, sql in ORACLE.items():
        if name in EMPTY_OK:
            continue
        try:
            n = duck.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
        except Exception:  # noqa: BLE001 — DESCRIBE test reports these
            continue
        if n == 0:
            vacuous.append(name)
    assert not vacuous, (
        "vacuous oracle rows (0 rows at test scale — tag empty_ok=True "
        f"only if empty-by-design): {vacuous}"
    )
