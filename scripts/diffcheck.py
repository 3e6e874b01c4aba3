"""Local differential gate: run every inventory query on Spark AND DuckDB,
compare row count + canonicalized values — a local mirror of the driver's
CORRECTNESS check.  Usage:

    python scripts/diffcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def connect_duckdb(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(v):
    """Canonicalize a value for cross-engine comparison.

    Deliberately type-preserving: the driver's hash is typed (round-1
    f11 lesson — DuckDB HUGEINT vs Spark BIGINT hashed differently while
    float(v) made them look identical locally).  Decimals stay Decimal
    (normalized so equal values sort identically); int stays int; a
    cross-engine int-vs-Decimal-vs-float divergence must FAIL here.
    """
    if v is None:
        return None
    if isinstance(v, Decimal):
        return v.normalize()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def rowset(columns, rows):
    """(sorted-by-name column order, multiset of canonicalized tuples)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    names = tuple(columns[i] for i in order)
    data = sorted(
        (tuple(canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )
    return names, data


# DESCRIBE-based oracle type gate (round-3 l12/t17 lesson, the round-1
# f11 failure class).  The driver's hash canonicalizes within a type
# FAMILY (empirically: Spark int vs DuckDB BIGINT, timestamp_ntz vs
# TIMESTAMP were driver-GREEN in rounds 1-3), but int128 (HUGEINT —
# DuckDB widens integer window/grouped SUMs to it) has no pandas dtype
# and value-renders differently, and Decimal-vs-float diverged in round
# 1 (f11).  So: reject HUGEINT outright; require family agreement
# (int/float/decimal/string/bool/date/timestamp/binary) per column.
_DUCK_FAMILY = {
    "BOOLEAN": "bool",
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int",
    "UBIGINT": "int",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str",
    "DATE": "date",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "TIMESTAMP_NS": "ts", "TIMESTAMP_MS": "ts", "TIMESTAMP_S": "ts",
    "BLOB": "bin",
}

_SPARK_FAMILY = {
    "boolean": "bool",
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str",
    "date": "date",
    "timestamp": "ts", "timestamp_ntz": "ts",
    "binary": "bin",
}


def oracle_type_problems(con, sql, sdtypes):
    """DESCRIBE the oracle SQL; flag HUGEINT (always driver-red even with
    identical values) and any cross-family divergence from the Spark
    column's dtype.  A flag here means 'add a CAST to the oracle SQL'."""
    probs = []
    spark_types = dict(sdtypes)
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:  # DESCRIBE itself failing is a finding too
        return [f"oracle DESCRIBE failed: {type(e).__name__}: {str(e)[:200]}"]
    for row in desc:
        cname, ctype = row[0], row[1].upper()
        if ctype in ("HUGEINT", "UHUGEINT"):
            probs.append(
                f"oracle column '{cname}' is {ctype} (int128 — no pandas "
                "dtype, driver hash diverges even on identical values): "
                "CAST the SUM/expression to BIGINT"
            )
            continue
        if ctype.startswith("DECIMAL"):
            fam = "decimal"
        else:
            fam = _DUCK_FAMILY.get(ctype)
        have = spark_types.get(cname)
        if have is None:
            continue  # name mismatch reported by the column compare
        sfam = (
            "decimal" if have.startswith("decimal") else _SPARK_FAMILY.get(have)
        )
        if fam is None or sfam is None or fam != sfam:
            probs.append(
                f"typed-hash family divergence on '{cname}': spark dtype "
                f"'{have}' vs oracle {ctype} — align with CASTs"
            )
    return probs


def compare(name, sdf, con, sql):
    srows = sdf.collect()
    scols = sdf.columns
    problems = []
    # Driver-shape guard (round-2 lesson, l5/f12): the driver's pandas
    # canonicalizer sorts the result frame and cannot hash/sort container
    # cells — any array/map/struct output column errors its gate row even
    # when values match.  Local-green must imply driver-green for shape.
    for cname, dtype in sdf.dtypes:
        if dtype.startswith(("array", "map", "struct")):
            problems.append(
                f"driver-unsortable column '{cname}' ({dtype}): serialize "
                "to string (concat_ws/to_json) for the gate"
            )
    problems.extend(oracle_type_problems(con, sql, sdf.dtypes))
    if problems:
        return problems
    ores = con.execute(sql)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()

    sn, sd = rowset(scols, srows)
    on, od = rowset(ocols, orows)
    if sn != on:
        problems.append(f"columns differ: spark={sn} oracle={on}")
    if len(sd) != len(od):
        problems.append(f"row count: spark={len(sd)} oracle={len(od)}")
    # Vacuous-row guard (round-4 o7/u3 lesson): a 0-row result makes the
    # driver's hash match trivially without exercising the query at all.
    if not problems and len(sd) == 0:
        from pgstream_spark.inventory import EMPTY_OK

        if name not in EMPTY_OK:
            problems.append(
                "VACUOUS: both engines returned 0 rows — the gate row "
                "verifies nothing; move predicates inside the data range "
                "or register with empty_ok=True if empty-by-design"
            )
    # Per-column Python-type signature: catches typed-hash divergence
    # (int vs Decimal vs float) even when the numeric values are equal.
    if not problems:
        for ci, cname in enumerate(sn):
            st = {type(r[ci]).__name__ for r in sd if r[ci] is not None}
            ot = {type(r[ci]).__name__ for r in od if r[ci] is not None}
            if st != ot:
                problems.append(
                    f"type mismatch on '{cname}': spark={sorted(st)} oracle={sorted(ot)}"
                )
    if not problems and sd != od:
        for i, (a, b) in enumerate(zip(sd, od)):
            if a != b:
                problems.append(f"first diff at sorted row {i}:\n  spark : {a}\n  oracle: {b}")
                break
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    # Session timezone is configurable so the gate can prove the queries
    # are tz-independent (the driver's session tz is unknown to us).
    tz = os.environ.get("DIFFCHECK_TZ", "UTC")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("diffcheck")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", tz)
        # engine.connect parity: verify the plans the engine ships
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pgstream_spark.inventory import ORACLE, QUERIES

    con = connect_duckdb(sf_dir)
    passed = failed = skipped = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        if name not in ORACLE:
            # rows-only check: just verify the query runs
            try:
                n = fn(spark, sf_dir).count()
                print(f"  ~ {name}: rows-only, {n} rows")
                skipped += 1
            except Exception as e:
                print(f"  ✗ {name}: EXEC FAIL {type(e).__name__}: {str(e)[:300]}")
                failed += 1
            continue
        try:
            problems = compare(name, fn(spark, sf_dir), con, ORACLE[name])
        except Exception as e:
            print(f"  ✗ {name}: ERROR {type(e).__name__}: {str(e)[:500]}")
            failed += 1
            continue
        if problems:
            print(f"  ✗ {name}:")
            for p in problems:
                print(f"      {p}")
            failed += 1
        else:
            passed += 1
            print(f"  ✓ {name}")
    print(f"\n{passed} passed, {failed} failed, {skipped} rows-only")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
