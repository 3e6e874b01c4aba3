"""File-level data skipping: per-file min/max manifests + a pruned reader.

Parquet footers already give Spark ROW-GROUP skipping, but the scan
still opens every file to read its footer — at 100 TB (hundreds of
thousands of files) listing + footer reads dominate a selective query.
Table formats (Iceberg/Delta) fix this with a FILE-level stats manifest
consulted before the scan plans; this module is that mechanism for the
engine's plain-parquet artifacts:

* `write_stats_manifest` — one row per data file with min/max/null/row
  counts for chosen columns.  Default ``method="footers"`` reads ONLY
  parquet footers via pyarrow (metadata-only: no data pages touched —
  the Iceberg manifest-build strategy); ``method="scan"`` derives the
  same rows with a column-pruned Spark aggregate for filesystems pyarrow
  can't reach.  The manifest lands INSIDE the table directory as
  ``_file_stats.parquet`` — the underscore prefix keeps every Spark scan
  of the table from picking it up as data.
* `pruned_parquet` — plans a read over only the files whose [min, max]
  can overlap a ``BETWEEN``-style predicate, then applies the exact
  predicate on top.  Pruning is a SUPERSET pre-filter, so the result is
  bit-identical to the full scan no matter how the table is laid out;
  the layout (``sinks.write_clustered`` / ``write_zordered``) only
  decides how MUCH gets skipped.

Works best over `sinks.write_clustered` output (disjoint per-file
ranges → selectivity ≈ files skipped); still correct over any layout.
Append workflows call `update_stats_manifest` after each batch —
O(new files) footer reads reconcile the manifest in place (rows are
per-file, so appends compose by concatenation and compactions by
removal).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_stats_manifest",
    "update_stats_manifest",
    "read_stats_manifest",
    "pruned_parquet",
    "delete_where",
    "foreach_batch_stats_appender",
    "metadata_aggregate",
    "vacuum_staging",
    "add_bloom_sidecar",
    "bloom_pruned_parquet",
]

MANIFEST_NAME = "_file_stats.parquet"


def _data_files(table_path: str) -> list[str]:
    return sorted(
        os.path.join(table_path, n)
        for n in os.listdir(table_path)
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    )


def _footer_stats(
    table_path: str, cols: list[str], files: list[str] | None = None
) -> list[dict]:
    import pyarrow.parquet as pq

    rows = []
    for f in (files if files is not None else _data_files(table_path)):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        st_f = os.stat(f)
        row: dict = {
            "file": os.path.basename(f),
            "n_rows": md.num_rows,
            # content identity: update_stats_manifest refreshes a row
            # whose file was REPLACED under the same name (idempotent
            # batch-replay overwrites) — without this the stale stats
            # misdescribe the new bytes and pruning drops real matches
            "size": st_f.st_size,
            "mtime_ns": st_f.st_mtime_ns,
        }
        for c in cols:
            # null counts are tracked INDEPENDENTLY of min/max presence:
            # an all-NULL chunk has no min/max but a perfectly good
            # null_count, and metadata_aggregate must not mistake
            # "stats missing" for "zero nulls"
            mins, maxs = [], []
            nulls, nulls_known = 0, True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None:
                    mins, maxs, nulls_known = None, None, False
                    break
                if st.has_null_count:
                    nulls += st.null_count
                else:
                    nulls_known = False
                if not st.has_min_max:
                    mins, maxs = None, None
                    continue
                if mins is not None:
                    mins.append(st.min)
                    maxs.append(st.max)
            row[f"min_{c}"] = min(mins) if mins else None
            row[f"max_{c}"] = max(maxs) if maxs else None
            row[f"nulls_{c}"] = nulls if nulls_known else None
        rows.append(row)
    return rows


def write_stats_manifest(
    spark: SparkSession,
    table_path: str,
    cols: list[str],
    method: str = "footers",
) -> str:
    """Build ``<table>/_file_stats.parquet`` (one row per data file:
    ``file``, ``n_rows``, and ``min_/max_/nulls_<col>`` per stat column).
    Returns the manifest path.  File names are stored RELATIVE to the
    table directory, so the table (manifest included) can be moved or
    renamed atomically after the build.  ``method="footers"`` is
    metadata-only;
    ``method="scan"`` runs a column-pruned Spark aggregate grouped by
    ``input_file_name()`` (any Spark-readable filesystem)."""
    dest = os.path.join(table_path, MANIFEST_NAME)
    if method == "footers":
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = _footer_stats(table_path, cols)
        if not rows:
            raise ValueError(f"no data files under {table_path}")
        tbl = pa.Table.from_pylist(rows)
        tmp = f"{dest}.tmp-{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, dest)  # atomic publish
        return dest
    if method != "scan":
        raise ValueError(f"method must be 'footers' or 'scan', got {method!r}")
    df = spark.read.parquet(table_path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}"),
        ]
    stats = (
        df.groupBy(F.input_file_name().alias("file")).agg(*aggs).toPandas()
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    stats["file"] = stats["file"].map(lambda u: os.path.basename(u))

    def _ident(name, what):
        try:  # local FS only; None elsewhere → update always refreshes
            st_f = os.stat(os.path.join(table_path, name))
            return getattr(st_f, what)
        except OSError:
            return None

    stats["size"] = stats["file"].map(lambda n: _ident(n, "st_size"))
    stats["mtime_ns"] = stats["file"].map(lambda n: _ident(n, "st_mtime_ns"))
    tmp = f"{dest}.tmp-{os.getpid()}"
    pq.write_table(pa.Table.from_pandas(stats.sort_values("file")), tmp)
    os.replace(tmp, dest)
    return dest


def update_stats_manifest(
    spark: SparkSession,
    table_path: str,
    cols: list[str],
) -> str:
    """Incrementally reconcile the manifest with the directory: add
    footer-stat rows for files the manifest doesn't know (a fresh
    append batch), drop rows whose file is gone (compaction), keep the
    rest untouched — O(new + removed) footer reads, never a table
    rescan, so a streaming ``foreachBatch`` can call this after every
    append.  Metadata-only and atomic (same tmp + os.replace publish
    as the full build).  Raises if the existing manifest lacks one of
    ``cols`` (stat sets must not silently diverge across appends)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dest = os.path.join(table_path, MANIFEST_NAME)
    old = pq.read_table(dest).to_pylist() if os.path.exists(dest) else []
    for c in cols:
        if old and f"min_{c}" not in old[0]:
            raise ValueError(
                f"existing manifest has no stats for {c!r} — rebuild with "
                "write_stats_manifest to change the stat column set"
            )
    present = {os.path.basename(f) for f in _data_files(table_path)}
    by_name = {r["file"]: r for r in old}
    kept, refresh = [], []
    for n in sorted(present):
        r = by_name.get(n)
        st_f = os.stat(os.path.join(table_path, n))
        if (
            r is not None
            and r.get("size") == st_f.st_size
            and r.get("mtime_ns") == st_f.st_mtime_ns
        ):
            kept.append(r)  # unchanged bytes: reuse the stats row
        else:
            refresh.append(n)  # new file OR replaced under the same name
    if refresh:
        kept.extend(
            _footer_stats(
                table_path,
                cols,
                files=[os.path.join(table_path, n) for n in refresh],
            )
        )
    kept.sort(key=lambda r: r["file"])
    tmp = f"{dest}.tmp-{os.getpid()}"
    pq.write_table(pa.Table.from_pylist(kept), tmp)
    os.replace(tmp, dest)
    return dest


def read_stats_manifest(spark: SparkSession, table_path: str) -> DataFrame:
    """The manifest as a DataFrame.  Loaded via pyarrow: Spark's reader
    skips underscore-prefixed files even when named explicitly (the
    same convention that hides the manifest from table scans), and the
    manifest is file-count-sized — driver-side by design."""
    import pyarrow.parquet as pq

    pdf = pq.read_table(os.path.join(table_path, MANIFEST_NAME)).to_pandas()
    return spark.createDataFrame(pdf)


def pruned_parquet(
    spark: SparkSession,
    table_path: str,
    col: str | None = None,
    lower=None,
    upper=None,
    ranges: dict | None = None,
) -> DataFrame:
    """Read the table with FILE-level skipping on a range predicate,
    then apply the exact predicate.  Single column:
    ``pruned_parquet(spark, path, "k", lo, hi)``; conjunction (the
    ``write_zordered`` use case — every z-column's stats bite):
    ``pruned_parquet(spark, path, ranges={"a": (lo, hi), "b": (lo,
    None)})`` — bounds may be None = unbounded on that side.

    A file survives iff EVERY ranged column's [min, max] can overlap
    its range (all-NULL stat → prunable: NULL never satisfies a range
    predicate).  The manifest is driver-side and file-count-sized —
    the same economics as a table format's manifest scan; the data
    read is then limited to surviving files, inside which parquet
    row-group stats prune further."""
    import pyarrow.parquet as pq

    if (col is None) == (ranges is None):
        raise ValueError("pass exactly one of col or ranges")
    if ranges is None:
        ranges = {col: (lower, upper)}
    cols = sorted(ranges)
    manifest = pq.read_table(
        os.path.join(table_path, MANIFEST_NAME),
        columns=["file"] + [p for c in cols for p in (f"min_{c}", f"max_{c}")],
    ).to_pylist()
    keep = []
    for r in manifest:
        ok = True
        for c in cols:
            want_lo, want_hi = ranges[c]
            if want_lo is None and want_hi is None:
                continue  # unbounded both sides: no predicate, no pruning
            lo, hi = r[f"min_{c}"], r[f"max_{c}"]
            if lo is None or hi is None:
                ok = False  # no stats or all-NULL: range can't match
                break
            if (want_hi is not None and lo > want_hi) or (
                want_lo is not None and hi < want_lo
            ):
                ok = False
                break
        if ok:
            keep.append(os.path.join(table_path, r["file"]))
    pred = F.lit(True)
    for c in cols:
        want_lo, want_hi = ranges[c]
        if want_lo is not None:
            pred = pred & (F.col(c) >= F.lit(want_lo))
        if want_hi is not None:
            pred = pred & (F.col(c) <= F.lit(want_hi))
    if not keep:
        schema = spark.read.parquet(table_path).schema
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*sorted(keep)).filter(pred)


def delete_where(
    spark: SparkSession,
    table_path: str,
    col: str,
    lower=None,
    upper=None,
    values: list | None = None,
) -> dict:
    """Targeted row deletion with file-level pruning: consult the
    manifest for the files that CAN contain matches (range overlap, or
    min ≤ v ≤ max for any of ``values``), rewrite only those files with
    the matching rows removed, leave every other file untouched
    byte-for-byte, and reconcile the manifest — the "delete these user
    ids from 100 TB" operation, costed at the files-containing-them,
    not the corpus.  Pass a range (``lower``/``upper``) or an explicit
    ``values`` list (broadcast-sized: it becomes a literal NOT IN).

    Sequencing is stage → swap-in → remove → reconcile: survivors are
    fully written to a staging directory before any original file is
    touched, so a crash never loses undeleted rows; a crash between
    swap-in and removal can leave BOTH the rewritten and original
    files visible (duplicates, repaired by re-running the same delete
    — it is idempotent on the data predicate).  For full
    copy-on-write atomicity compose with `operators/snapshot`'s
    versioned writes instead; this is the in-place form for artifact
    directories the engine owns.

    Returns ``{"files_touched", "files_total", "rows_deleted"}``.
    """
    import shutil
    import tempfile
    import uuid

    if (values is None) == (lower is None and upper is None):
        raise ValueError("pass exactly one of values or a lower/upper range")
    import pyarrow.parquet as pq

    dest = os.path.join(table_path, MANIFEST_NAME)
    manifest = pq.read_table(
        dest, columns=["file", f"min_{col}", f"max_{col}"]
    ).to_pylist()
    touched = []
    for r in manifest:
        lo, hi = r[f"min_{col}"], r[f"max_{col}"]
        if lo is None or hi is None:
            continue  # all-NULL/statless file cannot match a value/range
        if values is not None:
            if any(lo <= v <= hi for v in values):
                touched.append(r["file"])
        elif (upper is None or lo <= upper) and (lower is None or hi >= lower):
            touched.append(r["file"])
    if not touched:
        return {
            "files_touched": 0,
            "files_total": len(manifest),
            "rows_deleted": 0,
        }
    if values is not None:
        pred = F.col(col).isin(list(values))
    else:
        pred = F.lit(True)
        if lower is not None:
            pred = pred & (F.col(col) >= F.lit(lower))
        if upper is not None:
            pred = pred & (F.col(col) <= F.lit(upper))
    paths = [os.path.join(table_path, f) for f in touched]
    # footer-exact baseline from the touched files THEMSELVES (metadata-
    # only): immune to a stale manifest row after an unreconciled
    # same-name replace, unlike trusting manifest n_rows
    before = sum(r["n_rows"] for r in _footer_stats(table_path, [], files=paths))
    src = spark.read.parquet(*paths)
    # NULL keys never match a value/range predicate, so they SURVIVE —
    # a bare ~pred is NULL for them and filter() would silently delete
    # exactly the rows the predicate does not cover
    survivors = src.filter(~pred | F.col(col).isNull())
    # stage INSIDE the table's filesystem: /tmp may be another mount and
    # os.replace across devices raises EXDEV (the compact_dir lesson);
    # the underscore prefix keeps scans from seeing the staging dir
    staging = tempfile.mkdtemp(prefix="_delete_stage_", dir=table_path)
    survivors.write.mode("overwrite").parquet(staging)
    # count the STAGED bytes (footers), not the lazy plan — the plan's
    # source files are about to be removed
    kept_rows = sum(r["n_rows"] for r in _footer_stats(staging, []))
    staged = _data_files(staging)
    # swap-in under per-INVOCATION-unique names: a pid-only prefix
    # collides with this process's earlier delete's files — the replace
    # would overwrite a live data file that is also in `paths` and then
    # be removed with it (observed: repeated value-deletes lost rows)
    token = uuid.uuid4().hex[:12]
    for i, f in enumerate(staged):
        os.replace(
            f, os.path.join(table_path, f"del-{token}-{i:05d}.parquet")
        )
    for p in paths:
        os.remove(p)
    shutil.rmtree(staging, ignore_errors=True)
    # stat columns from the manifest's FULL schema — the projected read
    # above only carried the delete column, and rebuilding with a subset
    # would null out every other column's stats for the rewritten files
    cols = sorted(
        c[len("min_"):]
        for c in pq.read_schema(dest).names
        if c.startswith("min_")
    )
    update_stats_manifest(spark, table_path, cols)
    return {
        "files_touched": len(touched),
        "files_total": len(manifest),
        "rows_deleted": int(before - kept_rows),
    }


def foreach_batch_stats_appender(table_path: str, cols: list[str]):
    """``writeStream.foreachBatch`` sink that streams micro-batches into
    a stats-indexed parquet table EXACTLY ONCE: each batch's files land
    under batch-id-derived names (``ingest-<batchId>-*``), a replayed
    micro-batch (failure between the append and the checkpoint commit)
    first removes its own previous files and writes fresh — an
    idempotent overwrite, the `streaming/exactly_once` ledger pattern
    keyed on Spark's restart-stable ``batchId`` — and the manifest is
    reconciled incrementally (O(batch files) footer reads) so
    `pruned_parquet` stays correct batch-over-batch::

        (stream.writeStream
            .foreachBatch(foreach_batch_stats_appender(path, ["k"]))
            .option("checkpointLocation", ck).start())

    Bootstrap: the table directory need not exist — the first batch
    creates it and `update_stats_manifest` builds the manifest from
    scratch (stat columns fixed by ``cols`` for the table's lifetime).
    """
    import glob
    import shutil
    import tempfile

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(table_path, exist_ok=True)
        # stage inside the table's filesystem (os.replace across mounts
        # raises EXDEV); the underscore prefix hides it from scans
        staging = tempfile.mkdtemp(prefix="_ingest_stage_", dir=table_path)
        batch_df.write.mode("overwrite").parquet(staging)
        for stale in glob.glob(
            os.path.join(table_path, f"ingest-{int(batch_id):09d}-*.parquet")
        ):
            os.remove(stale)  # replayed batch: overwrite, don't duplicate
        for i, f in enumerate(_data_files(staging)):
            os.replace(
                f,
                os.path.join(
                    table_path, f"ingest-{int(batch_id):09d}-{i:05d}.parquet"
                ),
            )
        shutil.rmtree(staging, ignore_errors=True)
        update_stats_manifest(batch_df.sparkSession, table_path, cols)

    return _apply


def metadata_aggregate(spark: SparkSession, table_path: str) -> DataFrame:
    """Answer the metadata-expressible aggregates — per stat column:
    ``count(*)``, ``count(col)`` (rows minus nulls), ``min``, ``max`` —
    from the MANIFEST ALONE: no data file is opened (the
    metadata-optimized aggregate path a table format's engine takes for
    ``SELECT count(*) FROM t``).  One row per stat column:
    ``(column, n_rows, n_nonnull, min, max)`` with min/max rendered as
    strings (column types differ).  At 100 TB this is a driver-side
    read of file-count-sized metadata — milliseconds against any table
    the engine stats-indexed.

    Exactness: n_rows/null counts are footer-exact; parquet footer
    min/max are exact for the types the writers here emit (numeric,
    date, short strings) — pyarrow surfaces truncated statistics only
    for long binary values, where a stats-indexed column is the wrong
    layout anyway."""
    import pyarrow.parquet as pq

    rows = pq.read_table(os.path.join(table_path, MANIFEST_NAME)).to_pylist()
    cols = sorted(c[len("min_"):] for c in (rows[0] if rows else {}) if c.startswith("min_"))
    n = sum(r["n_rows"] for r in rows)
    out = []
    for c in cols:
        per_file = [r.get(f"nulls_{c}") for r in rows]
        # any file with an UNKNOWN null count -> n_nonnull is unknown,
        # not silently overstated (None is "no stats", never "0 nulls")
        nulls = None if any(v is None for v in per_file) else sum(per_file)
        mins = [r[f"min_{c}"] for r in rows if r[f"min_{c}"] is not None]
        maxs = [r[f"max_{c}"] for r in rows if r[f"max_{c}"] is not None]
        out.append(
            (
                c,
                int(n),
                None if nulls is None else int(n - nulls),
                str(min(mins)) if mins else None,
                str(max(maxs)) if maxs else None,
            )
        )
    return spark.createDataFrame(
        out, "column string, n_rows long, n_nonnull long, min string, max string"
    )


def vacuum_staging(table_path: str, grace_seconds: float = 3600.0) -> int:
    """Remove crashed writes' leftover staging directories
    (``_delete_stage_*`` / ``_ingest_stage_*``) older than
    ``grace_seconds``.  They are invisible to scans (underscore prefix)
    and harmless to correctness — this reclaims their space.  The grace
    window keeps a LIVE operation's staging safe: never call with a
    grace shorter than your longest running delete/ingest.  Returns the
    number of directories removed."""
    import shutil
    import time

    removed = 0
    now = time.time()
    for n in os.listdir(table_path):
        p = os.path.join(table_path, n)
        if not n.startswith(("_delete_stage_", "_ingest_stage_")):
            continue
        try:  # a live operation may remove its own staging concurrently
            if os.path.isdir(p) and now - os.path.getmtime(p) > grace_seconds:
                shutil.rmtree(p, ignore_errors=True)
                removed += 1
        except OSError:
            continue
    return removed


# ---------------------------------------------------------------------
# Per-file Bloom sidecars: point-lookup skipping on ANY layout
# ---------------------------------------------------------------------

def _bloom_hashes(value, m_bits: int, k: int) -> list[int]:
    """k bit positions for a value — md5 of ``f"{i}:{value}"`` per
    hash, deterministic across build and probe (values are rendered
    with ``str``, so int and string key columns are exact; float keys
    are rejected at build time — repr drift would create false
    NEGATIVES, the one failure a Bloom prune must never have)."""
    import hashlib

    return [
        int.from_bytes(
            hashlib.md5(f"{i}:{value}".encode()).digest()[:8], "big"
        )
        % m_bits
        for i in range(k)
    ]


def add_bloom_sidecar(
    spark: SparkSession,
    table_path: str,
    col: str,
    m_bits: int = 8192,
    k: int = 6,
) -> str:
    """Extend the stats manifest with a per-file BLOOM FILTER over
    ``col`` (stored as ``bloom_<col>`` binary: one k byte + ⌈m/8⌉
    bitmap bytes — self-describing), enabling POINT-lookup file
    skipping on layouts where min/max is useless: a high-cardinality
    key scattered uniformly across files has every file's [min, max]
    spanning the domain, but each file holds only its own values, so a
    membership probe prunes to the files that can contain the key —
    the file-level Bloom feature of the big table formats.

    Cost: one column-pruned read per file (distinct values hashed into
    the bitmap) — a build-time pass like any index; ~1 KB per file per
    column at the default 8192 bits (≲1 % false-positive rate at ~570
    distinct values/file; size the bits ~14× expected distincts for
    1 %).  Files appended AFTER the build carry no bloom and are never
    bloom-pruned (safe superset) until the sidecar is rebuilt.

    Integer and string key columns only (see `_bloom_hashes`).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    dest = os.path.join(table_path, MANIFEST_NAME)
    rows = pq.read_table(dest).to_pylist()
    by_name = {r["file"]: r for r in rows}
    for f in _data_files(table_path):
        tbl = pq.read_table(f, columns=[col])
        vals = pc.unique(tbl.column(col)).to_pylist()
        bits = bytearray(m_bits // 8)
        for v in vals:
            if v is None:
                continue
            if isinstance(v, float):
                raise TypeError(
                    f"bloom sidecar on float column {col!r} unsupported: "
                    "repr drift would create false negatives"
                )
            for pos in _bloom_hashes(v, m_bits, k):
                bits[pos // 8] |= 1 << (pos % 8)
        by_name[os.path.basename(f)][f"bloom_{col}"] = bytes([k]) + bytes(bits)
    tmp = f"{dest}.tmp-{os.getpid()}"
    pq.write_table(pa.Table.from_pylist(list(by_name.values())), tmp)
    os.replace(tmp, dest)
    return dest


def bloom_pruned_parquet(
    spark: SparkSession,
    table_path: str,
    col: str,
    values: list,
) -> DataFrame:
    """Point-lookup read through the Bloom sidecar: open only the files
    whose bloom CAN contain at least one probe value (plus any file
    with no bloom — membership unknown is never pruned), then apply
    the exact IN predicate.  Superset contract like `pruned_parquet`:
    bit-identical to the full scan on any layout; the bloom only
    decides how much is skipped.  NULL-keyed rows are never IN-matches,
    so bloom contents ignore NULLs soundly."""
    import pyarrow.parquet as pq

    if not values:
        raise ValueError("values must be non-empty")
    manifest = pq.read_table(
        os.path.join(table_path, MANIFEST_NAME),
        columns=["file", f"bloom_{col}"],
    ).to_pylist()
    keep = []
    for r in manifest:
        blob = r.get(f"bloom_{col}")
        if not blob:
            keep.append(os.path.join(table_path, r["file"]))
            continue  # no bloom: membership unknown, never prune
        k, bits = blob[0], blob[1:]
        m_bits = len(bits) * 8
        hit = any(
            all(
                bits[pos // 8] & (1 << (pos % 8))
                for pos in _bloom_hashes(v, m_bits, k)
            )
            for v in values
        )
        if hit:
            keep.append(os.path.join(table_path, r["file"]))
    if not keep:
        schema = spark.read.parquet(table_path).schema
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*sorted(keep)).filter(
        F.col(col).isin(list(values))
    )
