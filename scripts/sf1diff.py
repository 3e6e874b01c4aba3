"""sf1 DIFFERENTIAL sweep (VERDICT r2 item 7): prove the cross-engine
canonicalization discipline — exact integer-scaled sums, bounded window
moments, md5-derived signatures — holds at 10× the driver-gate scale,
not just that timings slope linearly (scaleprobe.py covers timing).

Builds a full sf1 table set under /tmp (testdata is read-only):
documents/events/embeddings via ``scaleprobe.generate`` (near-dup
replica families, ns-timestamps preserved), lineitem replicated 10×
with offset order keys, the remaining dimension tables copied through.
Then runs the diffcheck compare (Spark vs DuckDB, typed canonical
rowsets) for the exact-arithmetic-heavy queries and prints one JSON
line {query: "ok" | [problems]}.

Usage:
    python scripts/sf1diff.py [query ...]      # named queries
    python scripts/sf1diff.py --rotate [--budget SECS]
    python scripts/sf1diff.py --seed-digests   # one-time migration

The standing gate is INCREMENTAL (VERDICT r5 item 4): every green
entry records a definition digest — sha256 of the query's oracle SQL
plus its normalized analyzed-plan string (exprIds / object addresses
stripped; verified process-stable) — and ``--rotate`` skips entries
whose digest is unchanged since their last green, so the 841-1503 s
one-shot proofs (l72/l75/l77/l55) never re-run for free.  A changed
operator changes the plan, which changes the digest, which re-queues
the proof.  ``--seed-digests`` stamps the current digests onto
already-green entries without re-running them (baseline: the round-6
tree, full registry diffcheck-green at sf0.001+sf0.01 and sf1-covered
across rounds 1-5).

``--rotate`` (VERDICT r3 item 6: the sf1 sweep as a STANDING gate, not a
sample) walks the ENTIRE oracle registry in registration order from a
persisted cursor (``scripts/sf1_state.json``, committed), spending up to
``--budget`` seconds (default 900) per invocation and wrapping around —
so every operator's exact-arithmetic discipline is re-proven at 10× the
driver-gate scale every few rounds, like bench.py's budgeted sweep.
Results accumulate in the state file; queries that change verdict
overwrite their entry.  Named-query mode is unchanged.

Default named queries: g1 (dsum 2^53 discipline), w9 (five-sum windows),
g37 (regression slopes), t19 (two-level OHLC rollup), l4b (md5
fingerprints), l2d (MinHash+LSH signature pipeline — slowest, last).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/pgstream_scale/sf1"
REPLICAS = 10
DEFAULT = [
    "g1_tpch_q1",
    "w9_rolling_corr",
    "g37_regression_slope",
    "t19_ohlc_daily_rollup",
    "l4b_fingerprint",
    "l2d_minhash_lsh_md5",
]
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def generate_full(spark) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from scripts.scaleprobe import generate

    generate(spark)  # documents / events / embeddings (10×)

    if not os.path.exists(f"{DST}/lineitem.parquet"):
        li = pq.read_table(f"{SRC}/lineitem.parquet")
        max_ok = pc.max(li.column("l_orderkey")).as_py() + 1
        parts = []
        for k in range(REPLICAS):
            parts.append(
                li.set_column(
                    li.schema.get_field_index("l_orderkey"),
                    "l_orderkey",
                    pc.add(li.column("l_orderkey"), k * max_ok),
                )
            )
        pq.write_table(pa.concat_tables(parts), f"{DST}/lineitem.parquet")

    for t in TABLES:
        dst = f"{DST}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{SRC}/{t}.parquet", dst)


STATE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sf1_state.json")


def _load_state() -> dict:
    if os.path.exists(STATE):
        with open(STATE) as f:
            return json.load(f)
    return {"cursor": 0, "results": {}}


_MODULE_SRC_SHA: dict[str, str] = {}


def _module_source(modname: str) -> str:
    try:
        import importlib
        import inspect

        return inspect.getsource(importlib.import_module(modname))
    except Exception:  # noqa: BLE001 — missing source ⇒ empty
        return ""


def _module_sha(modname: str) -> str:
    if modname not in _MODULE_SRC_SHA:
        src = _module_source(modname)
        _MODULE_SRC_SHA[modname] = (
            hashlib.sha256(src.encode()).hexdigest() if src else "unavailable"
        )
    return _MODULE_SRC_SHA[modname]


_PGS_ABS_RE = re.compile(
    r"from\s+(pgstream_spark(?:\.\w+)*)\s+import"
    r"|import\s+(pgstream_spark(?:\.\w+)*)"
)
_PGS_REL_RE = re.compile(r"from\s+(\.+)(\w+(?:\.\w+)*)\s+import")

_MODULE_DIRECT: dict[str, frozenset] = {}


def _pgs_imports_in(src: str, package: str) -> set:
    """pgstream_spark modules imported by ``src`` (absolute + relative)."""
    found = set()
    for m in _PGS_ABS_RE.finditer(src):
        found.add(m.group(1) or m.group(2))
    for m in _PGS_REL_RE.finditer(src):
        dots, tail = m.group(1), m.group(2)
        parts = package.split(".")
        if len(dots) > 1:
            parts = parts[: len(parts) - (len(dots) - 1)]
        if parts and parts[0] == "pgstream_spark":
            found.add(".".join(parts + [tail]))
    return found


def _direct_pgs_imports(modname: str) -> frozenset:
    if modname not in _MODULE_DIRECT:
        package = modname.rsplit(".", 1)[0] if "." in modname else modname
        try:
            import importlib

            pkg = importlib.import_module(modname).__package__
            if pkg:
                package = pkg
        except Exception:  # noqa: BLE001 — fall back to the name split
            pass
        _MODULE_DIRECT[modname] = frozenset(
            _pgs_imports_in(_module_source(modname), package)
        )
    return _MODULE_DIRECT[modname]


def _import_closure(seeds: set) -> set:
    """Transitive closure over pgstream_spark imports (ADVICE r6: an edit
    to a module reached only transitively — e.g. dedup.py's inline import
    of similarity — must still flip the digests of queries that import
    dedup)."""
    closure: set = set()
    frontier = list(seeds)
    while frontier:
        mod = frontier.pop()
        if mod in closure or not mod.startswith("pgstream_spark"):
            continue
        closure.add(mod)
        frontier.extend(_direct_pgs_imports(mod) - closure)
    return closure


_TOPLEVEL_BINDINGS: dict[str, dict] = {}


def _toplevel_bindings(modname: str) -> dict:
    """name -> defining pgstream_spark module, for every name bound by a
    module-level ``from pgstream_spark... import name`` in ``modname``
    (ADVICE r6: callables that use a module-top import — e.g.
    ``exact_dedup`` from the inventory header — carried no module hash).
    Re-exported names are resolved to the module that actually defines
    them so a package ``__init__`` import doesn't drag the whole package
    closure into every digest."""
    if modname not in _TOPLEVEL_BINDINGS:
        out: dict = {}
        try:
            import ast
            import importlib
            import inspect

            tree = ast.parse(_module_source(modname))
            for node in tree.body:
                if not (
                    isinstance(node, ast.ImportFrom)
                    and node.module
                    and node.module.startswith("pgstream_spark")
                    and node.level == 0
                ):
                    continue
                for alias in node.names:
                    bound = alias.asname or alias.name
                    target = node.module
                    try:  # resolve re-exports to the defining module
                        obj = getattr(
                            importlib.import_module(node.module), alias.name
                        )
                        defmod = inspect.getmodule(obj)
                        if defmod is not None and defmod.__name__.startswith(
                            "pgstream_spark"
                        ):
                            target = defmod.__name__
                    except Exception:  # noqa: BLE001 — keep the import target
                        pass
                    out[bound] = target
        except Exception:  # noqa: BLE001 — no bindings ⇒ empty map
            pass
        _TOPLEVEL_BINDINGS[modname] = out
    return _TOPLEVEL_BINDINGS[modname]


def _definition_digest(name: str, df, oracle_sql: str) -> str:
    """sha256 over everything that defines the query's behavior:

    * the oracle SQL;
    * the ANALYZED plan string, with run-varying tokens normalized
      away — exprIds ``#123``, object addresses ``0x...``, and HOF
      lambda variables (``lambda x_1#`` vs ``lambda x_6#``: a
      SESSION-GLOBAL counter, observed flipping l52's digest between
      sessions; every occurrence of a lambda var in the analyzed-plan
      string carries the ``lambda `` prefix — probed — so the rewrite
      is anchored to it and real columns like ``x_1`` or ``day_7``
      keep their identity, ADVICE r6);
    * the query callable's SOURCE — the plan string shows a Python/
      pandas UDF only by name, so a UDF body edit would otherwise be
      invisible to the digest;
    * the source hash of every ``pgstream_spark.*`` module the
      callable reaches — inline imports in its own body, module-top
      imports whose bound names the body references (resolved through
      package re-exports to the defining module), and the TRANSITIVE
      closure of those modules' own imports (ADVICE r6: dedup.py's
      inline import of similarity must flip dedup-importing digests).

    Stable across processes (probed on plain SQL, pandas-UDF and
    IVF-training queries)."""
    plan = df._jdf.queryExecution().analyzed().toString()
    plan = re.sub(r"#\d+", "#", plan)
    plan = re.sub(r"0x[0-9a-fA-F]+", "0x", plan)
    plan = re.sub(r"\blambda (\w+?)_\d+#", r"lambda \1_#", plan)
    parts = [oracle_sql, plan]
    try:
        import inspect

        from pgstream_spark.inventory import QUERIES as _Q

        fn = _Q[name]
        src = inspect.getsource(fn)
        parts.append(src)
        holder = getattr(fn, "__module__", "pgstream_spark.inventory")
        seeds = _pgs_imports_in(src, holder.rsplit(".", 1)[0])
        for bound, target in _toplevel_bindings(holder).items():
            if re.search(rf"\b{re.escape(bound)}\b", src):
                seeds.add(target)
        parts.extend(
            f"{m}:{_module_sha(m)}" for m in sorted(_import_closure(seeds))
        )
    except Exception:  # noqa: BLE001 — source unavailable ⇒ plan-only
        pass
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:16]


def main() -> None:
    import time

    args = sys.argv[1:]
    rotate = "--rotate" in args
    seed = "--seed-digests" in args
    budget = 900.0
    if "--budget" in args:
        budget = float(args[args.index("--budget") + 1])
    only = [a for a in args if not a.startswith("--") and a != str(budget)]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("sf1diff")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    generate_full(spark)

    from pgstream_spark.inventory import ORACLE, QUERIES
    from scripts.diffcheck import compare, connect_duckdb

    con = connect_duckdb(DST)
    out: dict[str, object] = {}
    fails = 0

    # Oracles whose DUCKDB side is super-linear at sf1 and cannot be
    # interrupted per-query (observed: l8-family recursive-reachability
    # CTE ran >55 min at 52 GB RSS on the first window-2 slot without
    # completing).  The SPARK side of these operators is scale-proven
    # elsewhere (l38 is pinned to l8's oracle at gate scale + a 64-node
    # pytest; the all-pairs tiers l52/l55 DID complete here in window
    # 1); what cannot run at sf1 is the *oracle*, so these record an
    # explicit skipped status instead of silently stalling the sweep.
    SF1_ORACLE_SKIP = {
        "l8_dedup_clusters": "recursive-reachability oracle super-linear at sf1",
        "l38_dedup_clusters_twostar": "shares l8's recursive oracle",
        # Fixed-bucket LSH pairwise: candidate pairs grow ~n²/buckets, so
        # the sf1 run (>40 min, killed) is the documented bounded-oracle
        # tier exceeding its envelope, not a defect.  Scale evidence at
        # sf1 comes from the partition-pruned IVF twins (l3d/l19/l36,
        # covered) and the sf0.01 gate carries bit-exactness.
        "l3c_embedding_neardup": "fixed-bucket LSH pairwise quadratic at sf1",
        # All-pairs canonical tier: the oracle's shingle self-join pair
        # set explodes at sf1 (>22 min in DuckDB, killed).  Its scale
        # twin l55_canonical_prefix — the prefix-filter swap hashed
        # against the SAME output contract — is sf1-covered green, so
        # the operator's scale claim carries; the bounded all-pairs
        # oracle tier stays at gate scale.
        "l29_canonical_docs": "all-pairs oracle quadratic at sf1; twin l55 covered",
        "l64_entity_resolution": "shares l8's recursive-reachability oracle class",
        # Same pipeline as l29 (cluster-closure CTE) feeding the split
        # rule; the split/audit stages themselves are map-only + one
        # family-key aggregate (sf1-covered transitively by l55's
        # cluster tier + the l61/l6 md5-rule rows).
        "l87_cluster_safe_split": "composes l29's all-pairs/recursive oracle; split rule sf1-covered via l55+l61 tiers",
        # The Spark plan here (prefix-filter pairs) IS the sf1-surviving
        # form — only the recursive-closure ORACLE cannot run at sf1.
        "l87b_cluster_split_prefix": "shares l87's recursive-closure oracle; its prefix-pair plan is the sf1-surviving form (l55-covered)",
    }

    if seed:
        # Digest-algorithm migration: re-stamp current definition digests
        # onto entries that are green AND ALREADY CARRY a digest, without
        # re-running them.  Entries whose digest was deliberately STRIPPED
        # (the pending re-proof queue) are never stamped here — seeding
        # must not silently clear the queue.
        state = _load_state()
        stamped = skipped = 0
        for name, entry in sorted(state.get("results", {}).items()):
            if entry.get("status") != "ok" or "digest" not in entry:
                skipped += 1
                continue
            try:
                entry["digest"] = _definition_digest(
                    name, QUERIES[name](spark, DST), ORACLE[name]
                )
                stamped += 1
                print(f"  + {name} {entry['digest']}", file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                print(f"  ! {name}: {e}", file=sys.stderr)
        with open(STATE, "w") as f:
            json.dump(state, f, indent=1, sort_keys=True)
        print(
            f"seeded {stamped} digests "
            f"({skipped} not green or queued for re-proof)"
        )
        spark.stop()
        return

    if rotate:
        state = _load_state()
        names = [n for n in QUERIES if n in ORACLE]
        start = state.get("cursor", 0) % len(names)
        # Never-covered names FIRST (registry order), then the covered
        # ones from the cursor for wraparound re-proving.  The cursor
        # alone is position-based and silently re-runs old entries
        # whenever the registry grows mid-round (observed: a t12 re-run
        # burning 594 s while five new queries waited at the tail).
        done = set(state.get("results", {}))
        rotated = names[start:] + names[:start]
        order = [n for n in rotated if n not in done] + [
            n for n in rotated if n in done
        ]
        t0 = time.monotonic()
        ran = unchanged = 0
        for name in order:
            if time.monotonic() - t0 > budget:
                break
            if name in SF1_ORACLE_SKIP:
                state["results"][name] = {
                    "status": f"skipped: {SF1_ORACLE_SKIP[name]}",
                    "secs": 0.0,
                }
                ran += 1
                print(f"  - {name} (skipped)", file=sys.stderr)
                continue
            q0 = time.monotonic()
            prev = state["results"].get(name)
            df = digest = None
            try:
                df = QUERIES[name](spark, DST)
                digest = _definition_digest(name, df, ORACLE[name])
            except Exception:  # noqa: BLE001 — fall through to a real run
                pass
            if (
                prev is not None
                and prev.get("status") == "ok"
                and digest is not None
                and prev.get("digest") == digest
            ):
                # definition unchanged since its last green — the
                # standing gate is incremental, don't re-prove for free
                unchanged += 1
                ran += 1
                continue
            try:
                if df is None:
                    df = QUERIES[name](spark, DST)
                problems = compare(name, df, con, ORACLE[name])
            except Exception as e:  # noqa: BLE001 — report, keep sweeping
                problems = [f"ERROR {type(e).__name__}: {str(e)[:200]}"]
            secs = round(time.monotonic() - q0, 1)
            verdict = "ok" if not problems else problems
            entry: dict[str, object] = {"status": verdict, "secs": secs}
            if digest is not None and not problems:
                entry["digest"] = digest
            state["results"][name] = entry
            out[name] = verdict
            fails += bool(problems)
            ran += 1
            print(
                f"  {'✓' if not problems else '✗'} {name} ({secs}s)",
                file=sys.stderr,
            )
        state["cursor"] = (start + ran) % len(names)
        state["registry_size"] = len(names)
        with open(STATE, "w") as f:
            json.dump(state, f, indent=1, sort_keys=True)
        covered = len(state["results"])
        bad = [
            n
            for n, r in state["results"].items()
            if r["status"] != "ok"
            and not str(r["status"]).startswith("skipped:")
        ]
        print(
            f"rotation: ran {ran} ({unchanged} unchanged-skipped), "
            f"cursor -> {state['cursor']}, "
            f"cumulative {covered}/{len(names)} covered, "
            f"{len(bad)} failing: {bad[:10]}",
            file=sys.stderr,
        )
    else:
        # Named runs PERSIST into the standing-gate state exactly like a
        # rotation row (status + secs + definition digest) — a freshly
        # added query needs one named run, not a full --rotate, to be
        # sf1-covered.  (Round-10 lesson: named runs that only printed
        # left 9 green proofs unrecorded.)  Read-modify-write of the
        # state file assumes one sf1diff at a time, same as --rotate.
        state = _load_state()
        for name in only or DEFAULT:
            if name not in QUERIES or name not in ORACLE:
                # never persist a typo'd name into the committed state
                print(f"  ! unknown query {name!r} — not recorded",
                      file=sys.stderr)
                out[name] = "unknown query name"
                fails += 1
                continue
            if name in SF1_ORACLE_SKIP:
                out[name] = f"skipped: {SF1_ORACLE_SKIP[name]}"
                state["results"][name] = {
                    "status": f"skipped: {SF1_ORACLE_SKIP[name]}",
                    "secs": 0.0,
                }
                print(f"  - {name} (skipped)", file=sys.stderr)
                continue
            q0 = time.monotonic()
            df = digest = None
            try:
                df = QUERIES[name](spark, DST)
                digest = _definition_digest(name, df, ORACLE[name])
                problems = compare(name, df, con, ORACLE[name])
            except Exception as e:  # noqa: BLE001 — report, keep sweeping
                problems = [f"ERROR {type(e).__name__}: {str(e)[:200]}"]
            out[name] = "ok" if not problems else problems
            entry: dict[str, object] = {
                "status": out[name],
                "secs": round(time.monotonic() - q0, 1),
            }
            if digest is not None and not problems:
                entry["digest"] = digest
            state["results"][name] = entry
            fails += bool(problems)
            print(f"  {'✓' if not problems else '✗'} {name}", file=sys.stderr)
        state["registry_size"] = len([n for n in QUERIES if n in ORACLE])
        with open(STATE, "w") as f:
            json.dump(state, f, indent=1, sort_keys=True)
    print(json.dumps(out))
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
