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

Filesystem routing: bare paths use the local OS fast path (os.*,
memory-mapped pyarrow reads) unchanged; paths with a scheme
(``hdfs://``, ``s3a://``, ``file://``) route every byte — listing,
file identity, manifest read/write/replace, footer reads, bloom
builds, staged renames — through the JVM Hadoop FileSystem already on
Spark's classpath, with ``FileContext.rename(OVERWRITE)`` as the
atomic manifest commit (the `operators/neardup_index` pattern).  The
manifest itself stays driver-side and file-count-sized either way —
the same economics as a table format's manifest scan.
"""

from __future__ import annotations

import io
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
    "update_bloom_sidecar",
    "bloom_pruned_parquet",
    "bloom_pruned_join",
    "snapshot_table",
    "vacuum_versions",
]

MANIFEST_NAME = "_file_stats.parquet"


# ---------------------------------------------------------------------
# filesystem adapter — local OS calls for bare paths (the fast path,
# unchanged), Hadoop FileSystem via the live JVM for scheme'd paths
# ---------------------------------------------------------------------

class _LocalFS:
    """POSIX path operations; atomic publish is ``os.replace``."""

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def stat(self, path: str) -> tuple[int, int]:
        st = os.stat(path)
        return st.st_size, st.st_mtime_ns

    def mtime_seconds(self, path: str) -> float:
        return os.path.getmtime(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def open_parquet(self, path: str):
        return path  # pyarrow memory-maps local paths directly

    def write_bytes_atomic(self, dest: str, data: bytes) -> None:
        tmp = f"{dest}.tmp-{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, dest)  # atomic publish

    def remove(self, path: str) -> None:
        os.remove(path)

    def rename_overwrite(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rmtree(self, path: str) -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)


class _HadoopFile:
    """Seekable read-only file over a Hadoop ``FSDataInputStream``,
    shaped for pyarrow's python-file protocol (read/seek/tell/close).
    Footer reads seek to the tail and pull a few KB — the positioned
    reads FSDataInputStream exists for; bytes cross the py4j bridge
    via ``commons-io IOUtils.toByteArray`` (one call per read, not
    per byte)."""

    def __init__(self, jvm, stream, size: int):
        self._jvm = jvm
        self._in = stream
        self._size = size
        self._pos = 0
        self.closed = False

    def readable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def seekable(self) -> bool:
        return True

    def size(self) -> int:
        return self._size

    def tell(self) -> int:
        return self._pos

    def seek(self, pos: int, whence: int = 0) -> int:
        if whence == 1:
            pos += self._pos
        elif whence == 2:
            pos += self._size
        self._pos = max(0, min(pos, self._size))
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self._pos
        n = min(n, self._size - self._pos)
        if n <= 0:
            return b""
        self._in.seek(self._pos)
        raw = self._jvm.org.apache.commons.io.IOUtils.toByteArray(self._in, n)
        data = bytes(raw)
        self._pos += len(data)
        return data

    def close(self) -> None:
        if not self.closed:
            self._in.close()
            self.closed = True


class _HadoopFS:
    """The same surface as `_LocalFS` over ``hdfs://``/``s3a://``/
    ``file://`` via the JVM Hadoop FileSystem.  Identity is (length,
    modificationTime ms × 10^6) — self-consistent within the adapter,
    which is all `update_stats_manifest`'s refresh check needs.
    Manifest publish is ``FileContext.rename(Rename.OVERWRITE)`` —
    an atomic replace-commit on HDFS and local ``file://`` (plain
    ``FileSystem.rename`` refuses to clobber on HDFS, and
    delete-then-rename would leave a manifest-less table if the
    process died between the two).  On object stores (``s3a://``)
    rename is copy+delete — NOT atomic — and many stock configs lack
    the ``fs.AbstractFileSystem.<scheme>.impl`` binding FileContext
    needs; there the publish falls back to delete+rename with the
    narrower guarantee (a crash between the two can leave the
    manifest missing until the next reconcile rebuilds it — data
    files are never touched by this path)."""

    def __init__(self, spark: SparkSession, any_path: str):
        self._jvm = spark._jvm
        self._gw = spark.sparkContext._gateway
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._jpath(any_path).getFileSystem(self._conf)

    def _jpath(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def listdir(self, path: str) -> list[str]:
        return [
            st.getPath().getName()
            for st in self._fs.listStatus(self._jpath(path))
        ]

    def stat(self, path: str) -> tuple[int, int]:
        st = self._fs.getFileStatus(self._jpath(path))
        return st.getLen(), st.getModificationTime() * 1_000_000

    def mtime_seconds(self, path: str) -> float:
        st = self._fs.getFileStatus(self._jpath(path))
        return st.getModificationTime() / 1000.0

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._jpath(path))

    def isdir(self, path: str) -> bool:
        p = self._jpath(path)
        return self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory()

    def open_parquet(self, path: str):
        jp = self._jpath(path)
        size = self._fs.getFileStatus(jp).getLen()
        return _HadoopFile(self._jvm, self._fs.open(jp), size)

    def write_bytes_atomic(self, dest: str, data: bytes) -> None:
        tmp = self._jpath(f"{dest}.tmp-{os.getpid()}")
        out = self._fs.create(tmp, True)
        out.write(bytearray(data))
        out.close()
        self._rename_overwrite_j(tmp, self._jpath(dest))

    def _rename_overwrite_j(self, jsrc, jdst) -> None:
        try:
            ren = self._jvm.org.apache.hadoop.fs.Options.Rename
            opts = self._gw.new_array(ren, 1)
            opts[0] = ren.OVERWRITE
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                jdst.toUri(), self._conf
            )
            fc.rename(jsrc, jdst, opts)
        except Exception as e:  # noqa: BLE001 — py4j surfaces one type
            # schemes without an AbstractFileSystem binding (common for
            # s3a) can't go through FileContext at all; fall back to
            # delete+rename — non-atomic, but on those stores rename is
            # copy+delete anyway, so FileContext never bought atomicity
            if "UnsupportedFileSystem" not in str(e):
                raise
            self._fs.delete(jdst, False)
            if not self._fs.rename(jsrc, jdst):
                raise IOError(f"rename {jsrc} -> {jdst} failed") from e

    def remove(self, path: str) -> None:
        self._fs.delete(self._jpath(path), False)

    def rename_overwrite(self, src: str, dst: str) -> None:
        self._rename_overwrite_j(self._jpath(src), self._jpath(dst))

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._jpath(path))

    def rmtree(self, path: str) -> None:
        try:
            self._fs.delete(self._jpath(path), True)
        except Exception:
            pass


def _fs_for(spark: SparkSession | None, path: str):
    if "://" not in path:
        return _LocalFS()
    if spark is None:
        raise ValueError(
            f"a SparkSession is required for scheme'd path {path!r} "
            "(Hadoop FileSystem access runs through the live JVM)"
        )
    return _HadoopFS(spark, path)


def _data_files(table_path: str, fs=None) -> list[str]:
    fs = fs or _LocalFS()
    return sorted(
        os.path.join(table_path, n)
        for n in fs.listdir(table_path)
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    )


def _read_manifest_table(fs, path: str, columns: list[str] | None = None):
    import pyarrow.parquet as pq

    src = fs.open_parquet(path)
    try:
        return pq.read_table(src, columns=columns)
    finally:
        if hasattr(src, "close"):
            src.close()


def _read_manifest_schema(fs, path: str):
    import pyarrow.parquet as pq

    src = fs.open_parquet(path)
    try:
        return pq.read_schema(src)
    finally:
        if hasattr(src, "close"):
            src.close()


def _write_manifest_table(fs, dest: str, tbl) -> None:
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(tbl, buf)
    fs.write_bytes_atomic(dest, buf.getvalue())


def _unified_table(rows: list[dict], prior_schema=None):
    """``pa.Table`` over rows that may carry DIFFERENT key sets — the
    manifest-rewrite hazard: ``pa.Table.from_pylist`` takes its column
    set from the FIRST row only, so a footer-stat row (no ``bloom_*``)
    sorting ahead of an old manifest row would silently drop the Bloom
    sidecar column (and Spark part names embed random UUIDs, making
    the drop a coin flip on sort order).  Here the column set is the
    explicit union — prior schema order first, then new keys in first
    appearance order — every row normalized with NULLs for its missing
    keys, and prior-known columns cast back to their prior types (an
    all-NULL column would otherwise infer as the useless ``null``
    type, losing the binary bloom type across a rewrite).

    An EMPTY row list (a delete/compaction drained the table) returns
    an empty table WITH the prior schema — ``pa.Table.from_pylist([])``
    would yield a zero-column table, silently dropping ``file``/
    ``n_rows``/stat columns and breaking every projected manifest read
    afterwards."""
    import pyarrow as pa

    if not rows and prior_schema is not None:
        return prior_schema.empty_table()

    keys: list[str] = []
    seen: set[str] = set()
    if prior_schema is not None:
        for name in prior_schema.names:
            keys.append(name)
            seen.add(name)
    for r in rows:
        for k in r:
            if k not in seen:
                keys.append(k)
                seen.add(k)
    norm = [{k: r.get(k) for k in keys} for r in rows]
    tbl = pa.Table.from_pylist(norm)
    if prior_schema is not None:
        fields = []
        changed = False
        for f in tbl.schema:
            if f.name in prior_schema.names:
                pf = prior_schema.field(f.name)
                if pf.type != f.type:
                    fields.append(pf)
                    changed = True
                    continue
            fields.append(f)
        if changed:
            tbl = tbl.cast(pa.schema(fields))
    return tbl


def _unmanifested_files(table_path: str, fs, manifest_rows: list[dict]) -> list[str]:
    """Data files present on disk but absent from the manifest (appended
    without a reconcile).  Pruned reads must treat them as unprunable —
    content unknown — or the superset contract silently breaks.  One
    file-count-sized listing; no data file is opened."""
    known = {r["file"] for r in manifest_rows}
    return [
        f
        for f in _data_files(table_path, fs)
        if os.path.basename(f) not in known
    ]


def _footer_stats(
    table_path: str,
    cols: list[str],
    files: list[str] | None = None,
    fs=None,
) -> list[dict]:
    import pyarrow.parquet as pq

    fs = fs or _LocalFS()
    rows = []
    for f in (files if files is not None else _data_files(table_path, fs)):
        src = fs.open_parquet(f)
        pf = pq.ParquetFile(src)
        try:
            md = pf.metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            size, mtime_ns = fs.stat(f)
            row: dict = {
                "file": os.path.basename(f),
                "n_rows": md.num_rows,
                # content identity: update_stats_manifest refreshes a row
                # whose file was REPLACED under the same name (idempotent
                # batch-replay overwrites) — without this the stale stats
                # misdescribe the new bytes and pruning drops real matches
                "size": size,
                "mtime_ns": mtime_ns,
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
        finally:
            pf.close()
            if hasattr(src, "close"):
                src.close()
    return rows


def _stat_cols_of(schema) -> list[str]:
    return sorted(
        c[len("min_"):] for c in schema.names if c.startswith("min_")
    )


def _bloom_cols_of(schema) -> list[str]:
    return sorted(
        c[len("bloom_"):] for c in schema.names if c.startswith("bloom_")
    )


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
    fs = _fs_for(spark, table_path)
    dest = os.path.join(table_path, MANIFEST_NAME)
    if method == "footers":
        rows = _footer_stats(table_path, cols, fs=fs)
        if not rows:
            raise ValueError(f"no data files under {table_path}")
        _write_manifest_table(fs, dest, _unified_table(rows))
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

    stats["file"] = stats["file"].map(lambda u: os.path.basename(u))

    def _ident(name, which):
        try:  # absent file (renamed mid-scan) → None → update refreshes
            size, mtime_ns = fs.stat(os.path.join(table_path, name))
            return size if which == "size" else mtime_ns
        except Exception:
            return None

    stats["size"] = stats["file"].map(lambda n: _ident(n, "size"))
    stats["mtime_ns"] = stats["file"].map(lambda n: _ident(n, "mtime_ns"))
    _write_manifest_table(
        fs, dest, pa.Table.from_pandas(stats.sort_values("file"))
    )
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
    append.  Metadata-only and atomic (same tmp + atomic-replace
    publish as the full build).  Raises if the existing manifest lacks
    one of ``cols`` (stat sets must not silently diverge across
    appends).  Sidecar columns the manifest carries beyond the footer
    stats (``bloom_<col>``) are PRESERVED on kept rows and NULL on
    refreshed ones — the rewrite schema is the explicit union of the
    old manifest schema and the stat columns, never inferred from
    whichever row happens to sort first."""
    fs = _fs_for(spark, table_path)
    dest = os.path.join(table_path, MANIFEST_NAME)
    prior_schema = None
    old: list[dict] = []
    if fs.exists(dest):
        tbl = _read_manifest_table(fs, dest)
        prior_schema = tbl.schema
        old = tbl.to_pylist()
    for c in cols:
        if old and f"min_{c}" not in old[0]:
            raise ValueError(
                f"existing manifest has no stats for {c!r} — rebuild with "
                "write_stats_manifest to change the stat column set"
            )
    present = {os.path.basename(f) for f in _data_files(table_path, fs)}
    by_name = {r["file"]: r for r in old}
    kept, refresh = [], []
    for n in sorted(present):
        r = by_name.get(n)
        size, mtime_ns = fs.stat(os.path.join(table_path, n))
        if (
            r is not None
            and r.get("size") == size
            and r.get("mtime_ns") == mtime_ns
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
                fs=fs,
            )
        )
    kept.sort(key=lambda r: r["file"])
    _write_manifest_table(fs, dest, _unified_table(kept, prior_schema))
    return dest


def read_stats_manifest(spark: SparkSession, table_path: str) -> DataFrame:
    """The manifest as a DataFrame.  Loaded via pyarrow: Spark's reader
    skips underscore-prefixed files even when named explicitly (the
    same convention that hides the manifest from table scans), and the
    manifest is file-count-sized — driver-side by design."""
    fs = _fs_for(spark, table_path)
    pdf = _read_manifest_table(
        fs, os.path.join(table_path, MANIFEST_NAME)
    ).to_pandas()
    return spark.createDataFrame(pdf)


def _all_null_proven(r: dict, c: str) -> bool:
    """True only when the manifest PROVES the file is all-NULL for
    ``c`` (``nulls_<c> == n_rows``, both known).  Missing min/max alone
    proves nothing: parquet writers drop stats for long values, under
    ``write_statistics=False``, and past ``max_statistics_size`` — a
    file in that state still holds real rows."""
    nulls, n = r.get(f"nulls_{c}"), r.get("n_rows")
    return nulls is not None and n is not None and nulls == n


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
    its range.  Missing min/max prunes ONLY when the null counts prove
    the file all-NULL for that column (NULL never satisfies a range
    predicate); stats merely absent → the file is read (superset
    contract — pruning must never drop a real match).  The manifest is
    driver-side and file-count-sized — the same economics as a table
    format's manifest scan; the data read is then limited to surviving
    files, inside which parquet row-group stats prune further."""
    fs = _fs_for(spark, table_path)
    if (col is None) == (ranges is None):
        raise ValueError("pass exactly one of col or ranges")
    if ranges is None:
        ranges = {col: (lower, upper)}
    cols = sorted(ranges)
    manifest = _read_manifest_table(
        fs,
        os.path.join(table_path, MANIFEST_NAME),
        columns=["file", "n_rows"]
        + [p for c in cols for p in (f"min_{c}", f"max_{c}", f"nulls_{c}")],
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
                if _all_null_proven(r, c):
                    ok = False  # proven all-NULL: range can't match
                    break
                continue  # stats absent, content unknown: must read
            if (want_hi is not None and lo > want_hi) or (
                want_lo is not None and hi < want_lo
            ):
                ok = False
                break
        if ok:
            keep.append(os.path.join(table_path, r["file"]))
    # data files with NO manifest row (appended without a reconcile)
    # have unknown content — the superset contract means they are
    # always read, never silently excluded from the scan
    keep.extend(_unmanifested_files(table_path, fs, manifest))
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
    versioned: bool = False,
) -> dict:
    """Targeted row deletion with file-level pruning: consult the
    manifest for the files that CAN contain matches (range overlap, or
    min ≤ v ≤ max for any of ``values``), rewrite only those files with
    the matching rows removed, leave every other file untouched
    byte-for-byte, and reconcile the manifest — the "delete these user
    ids from 100 TB" operation, costed at the files-containing-them,
    not the corpus.  Pass a range (``lower``/``upper``) or an explicit
    ``values`` list (broadcast-sized: it becomes a literal NOT IN).

    A file with NO min/max stats is REWRITTEN unless the null counts
    prove it all-NULL for ``col`` — "can't see the stats" must never
    mean "the rows survive the delete" (data-safety: the advertised
    use is removing specific user ids).

    Sequencing is stage → swap-in → remove → reconcile: survivors are
    fully written to a staging directory before any original file is
    touched, so a crash never loses undeleted rows; a crash between
    swap-in and removal can leave BOTH the rewritten and original
    files visible (duplicates, repaired by re-running the same delete
    — it is idempotent on the data predicate).

    ``versioned=True`` removes that crash window entirely: ``table_path``
    must then be an `operators/snapshot` version store (bootstrap a
    plain table with `snapshot_table`), the delete lands as a NEW
    version — untouched files hardlinked (metadata-only; copied where
    the filesystem can't link), touched files rewritten — and the
    commit is the snapshot manifest rename, so a reader sees the old
    version or the new one, never both and never a duplicate.  The old
    version stays time-travelable.  Returns the in-place dict plus
    ``{"version"}`` in that mode.

    Returns ``{"files_touched", "files_total", "rows_deleted"}``.
    """
    import uuid

    if (values is None) == (lower is None and upper is None):
        raise ValueError("pass exactly one of values or a lower/upper range")
    if versioned:
        return _delete_where_versioned(
            spark, table_path, col, lower, upper, values
        )
    fs = _fs_for(spark, table_path)
    dest = os.path.join(table_path, MANIFEST_NAME)
    # reconcile FIRST: a file appended since the last manifest build has
    # no row here, and a delete that silently skips it lets exactly the
    # rows the caller asked to remove survive (O(changed) footer reads)
    update_stats_manifest(
        spark, table_path, _stat_cols_of(_read_manifest_schema(fs, dest))
    )
    manifest = _read_manifest_table(
        fs,
        dest,
        columns=["file", "n_rows", f"min_{col}", f"max_{col}", f"nulls_{col}"],
    ).to_pylist()
    touched = _delete_touched(manifest, col, lower, upper, values)
    if not touched:
        return {
            "files_touched": 0,
            "files_total": len(manifest),
            "rows_deleted": 0,
        }
    pred = _delete_pred(col, lower, upper, values)
    paths = [os.path.join(table_path, f) for f in touched]
    # footer-exact baseline from the touched files THEMSELVES (metadata-
    # only): immune to a stale manifest row after an unreconciled
    # same-name replace, unlike trusting manifest n_rows
    before = sum(
        r["n_rows"] for r in _footer_stats(table_path, [], files=paths, fs=fs)
    )
    src = spark.read.parquet(*paths)
    # NULL keys never match a value/range predicate, so they SURVIVE —
    # a bare ~pred is NULL for them and filter() would silently delete
    # exactly the rows the predicate does not cover
    survivors = src.filter(~pred | F.col(col).isNull())
    # stage INSIDE the table's filesystem: /tmp may be another mount and
    # os.replace across devices raises EXDEV (the compact_dir lesson);
    # the underscore prefix keeps scans from seeing the staging dir
    staging = os.path.join(
        table_path, f"_delete_stage_{uuid.uuid4().hex[:12]}"
    )
    survivors.write.mode("overwrite").parquet(staging)
    # count the STAGED bytes (footers), not the lazy plan — the plan's
    # source files are about to be removed
    kept_rows = sum(r["n_rows"] for r in _footer_stats(staging, [], fs=fs))
    staged = _data_files(staging, fs)
    # swap-in under per-INVOCATION-unique names: a pid-only prefix
    # collides with this process's earlier delete's files — the replace
    # would overwrite a live data file that is also in `paths` and then
    # be removed with it (observed: repeated value-deletes lost rows)
    token = uuid.uuid4().hex[:12]
    for i, f in enumerate(staged):
        fs.rename_overwrite(
            f, os.path.join(table_path, f"del-{token}-{i:05d}.parquet")
        )
    for p in paths:
        fs.remove(p)
    fs.rmtree(staging)
    # stat columns from the manifest's FULL schema — the projected read
    # above only carried the delete column, and rebuilding with a subset
    # would null out every other column's stats for the rewritten files
    cols = _stat_cols_of(_read_manifest_schema(fs, dest))
    update_stats_manifest(spark, table_path, cols)
    return {
        "files_touched": len(touched),
        "files_total": len(manifest),
        "rows_deleted": int(before - kept_rows),
    }


def _delete_touched(
    stats_rows: list[dict], col: str, lower, upper, values
) -> list[str]:
    """File names that CAN contain delete matches — shared by the
    in-place and versioned delete paths so the pruning decision can
    never diverge.  Statless files are always touched unless proven
    all-NULL (see `delete_where`'s data-safety note)."""
    touched = []
    for r in stats_rows:
        lo, hi = r[f"min_{col}"], r[f"max_{col}"]
        if lo is None or hi is None:
            if _all_null_proven(r, col):
                continue  # proven all-NULL: no value/range can match
            touched.append(r["file"])  # stats absent: must rewrite
            continue
        if values is not None:
            if any(lo <= v <= hi for v in values):
                touched.append(r["file"])
        elif (upper is None or lo <= upper) and (lower is None or hi >= lower):
            touched.append(r["file"])
    return touched


def _delete_pred(col: str, lower, upper, values):
    if values is not None:
        return F.col(col).isin(list(values))
    pred = F.lit(True)
    if lower is not None:
        pred = pred & (F.col(col) >= F.lit(lower))
    if upper is not None:
        pred = pred & (F.col(col) <= F.lit(upper))
    return pred


def snapshot_table(spark: SparkSession, table_path: str, store_dir: str) -> int:
    """Bootstrap a version store from a plain parquet table directory:
    hardlink (or copy, where linking is impossible) every data file as
    ``v0001/data`` and commit it with the `operators/snapshot` manifest
    — metadata-only on a POSIX filesystem, so 'make this 100 TB table
    versioned' costs one inode per file, not a rewrite.  Local paths
    only (the snapshot store is an `os`-level layout, like
    `operators/snapshot` itself)."""
    import json
    import shutil

    if "://" in table_path or "://" in store_dir:
        raise ValueError("snapshot_table supports local paths only")
    from pgstream_spark.operators.snapshot import list_versions

    if list_versions(store_dir):
        # committed versions are IMMUTABLE: re-bootstrapping would
        # mutate v0001's content and reset `latest` past newer versions
        raise FileExistsError(
            f"{store_dir} already holds committed versions — append new "
            "data as a new version (snapshot.write_version) or delete "
            "through delete_where(versioned=True)"
        )
    files = _data_files(table_path)
    vdir = os.path.join(store_dir, "v0001")
    data = os.path.join(vdir, "data")
    os.makedirs(data, exist_ok=True)
    for f in files:
        dst = os.path.join(data, os.path.basename(f))
        if not os.path.exists(dst):
            try:
                os.link(f, dst)
            except OSError:
                shutil.copy2(f, dst)
    n = sum(r["n_rows"] for r in _footer_stats(data, []))
    schema = spark.read.parquet(data).schema.simpleString() if files else ""
    manifest = {"version": 1, "rows": n, "schema": schema, "note": "snapshot_table"}
    tmp = os.path.join(vdir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, os.path.join(vdir, "manifest.json"))  # commit point
    with open(os.path.join(store_dir, "latest.tmp"), "w") as f:
        f.write("1")
    os.rename(os.path.join(store_dir, "latest.tmp"), os.path.join(store_dir, "latest"))
    return 1


def _delete_where_versioned(
    spark: SparkSession, store_dir: str, col: str, lower, upper, values
) -> dict:
    """Copy-on-write delete on an `operators/snapshot` version store —
    the atomic form of `delete_where`:

    1. plan against the CURRENT version's parquet footers (same
       `_delete_touched` decision as the in-place path);
    2. build ``v<N+1>/data``: untouched files HARDLINKED (metadata-only
       — the 100 TB economics survive; copy where the fs can't link),
       touched files rewritten without the matching rows;
    3. commit = the snapshot ``manifest.json`` rename then the
       ``latest`` pointer — a crash anywhere before the rename leaves
       the old version the committed latest, a crash after it leaves
       the new one.  No state ever shows BOTH (the in-place swap-in/
       remove window does not exist here), and the old version remains
       readable via `operators.snapshot.read_version` (time travel /
       takedown audit)."""
    import json
    import shutil
    import uuid

    from pgstream_spark.operators.snapshot import list_versions

    if "://" in store_dir:
        raise ValueError("versioned delete supports local version stores only")
    versions = list_versions(store_dir)
    if not versions:
        raise FileNotFoundError(
            f"no committed versions under {store_dir} — bootstrap a plain "
            "table with snapshot_table(spark, table_path, store_dir) first"
        )
    cur = versions[-1]
    cur_data = os.path.join(store_dir, f"v{cur:04d}", "data")
    files = _data_files(cur_data)
    stats = _footer_stats(cur_data, [col], files=files)
    touched = set(_delete_touched(stats, col, lower, upper, values))
    n_before = sum(r["n_rows"] for r in stats)
    if not touched:
        return {
            "files_touched": 0,
            "files_total": len(files),
            "rows_deleted": 0,
            "version": cur,  # nothing to commit: latest is unchanged
        }
    new_v = cur + 1
    vdir = os.path.join(store_dir, f"v{new_v:04d}")
    data = os.path.join(vdir, "data")
    # a previous crashed attempt may have left an uncommitted vdir
    # (no manifest.json => readers already skip it): rebuild from scratch
    if os.path.isdir(vdir) and not os.path.exists(
        os.path.join(vdir, "manifest.json")
    ):
        shutil.rmtree(vdir)
    os.makedirs(data, exist_ok=True)
    for f in files:
        if os.path.basename(f) in touched:
            continue
        dst = os.path.join(data, os.path.basename(f))
        try:
            os.link(f, dst)
        except OSError:
            shutil.copy2(f, dst)
    pred = _delete_pred(col, lower, upper, values)
    src = spark.read.parquet(*[os.path.join(cur_data, t) for t in sorted(touched)])
    survivors = src.filter(~pred | F.col(col).isNull())
    staging = os.path.join(vdir, "_stage")
    from pgstream_spark.sinks import ROW_GROUP_BYTES

    # bounded row groups like snapshot.write_version: every committed
    # version stays splittable for parallel re-reads (VERDICT r6)
    survivors.write.mode("overwrite").option(
        "parquet.block.size", ROW_GROUP_BYTES
    ).parquet(staging)
    token = uuid.uuid4().hex[:12]
    for i, f in enumerate(_data_files(staging)):
        os.replace(f, os.path.join(data, f"del-{token}-{i:05d}.parquet"))
    shutil.rmtree(staging, ignore_errors=True)
    n_after = sum(r["n_rows"] for r in _footer_stats(data, []))
    manifest = {
        "version": new_v,
        "rows": n_after,
        "schema": spark.read.parquet(data).schema.simpleString(),
        "note": f"delete_where({col})",
    }
    tmp = os.path.join(vdir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, os.path.join(vdir, "manifest.json"))  # THE commit point
    with open(os.path.join(store_dir, "latest.tmp"), "w") as f:
        f.write(str(new_v))
    os.rename(
        os.path.join(store_dir, "latest.tmp"), os.path.join(store_dir, "latest")
    )
    return {
        "files_touched": len(touched),
        "files_total": len(files),
        "rows_deleted": int(n_before - n_after),
        "version": new_v,
    }


def vacuum_versions(store_dir: str, keep_last: int = 2) -> dict:
    """Retention for a snapshot store: drop all but the newest
    ``keep_last`` COMMITTED versions (plus any uncommitted leftover
    directories below the newest kept version — crashed attempts whose
    missing ``manifest.json`` already hides them from readers).
    Hardlink-shared data files are only unlinked, never destroyed,
    while a newer version still references them.  ``latest`` always
    survives (``keep_last`` floors at 1).

    Returns ``{"dropped": [...], "kept": [...]}``."""
    import shutil

    from pgstream_spark.operators.snapshot import list_versions

    if "://" in store_dir:
        raise ValueError("vacuum_versions supports local version stores only")
    keep_last = max(1, int(keep_last))
    versions = list_versions(store_dir)
    kept = versions[-keep_last:]
    dropped = [v for v in versions if v not in kept]
    for v in dropped:
        shutil.rmtree(os.path.join(store_dir, f"v{v:04d}"), ignore_errors=True)
    if kept:
        for name in os.listdir(store_dir):
            if not name.startswith("v") or not name[1:].isdigit():
                continue
            v = int(name[1:])
            committed = os.path.exists(
                os.path.join(store_dir, name, "manifest.json")
            )
            if not committed and v < kept[-1]:
                shutil.rmtree(os.path.join(store_dir, name), ignore_errors=True)
    return {"dropped": dropped, "kept": kept}


def foreach_batch_stats_appender(
    table_path: str, cols: list[str], bloom_cols: list[str] | None = None
):
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

    ``bloom_cols`` keeps POINT-lookup pruning live across the stream:
    after each reconcile, `update_bloom_sidecar` builds blooms for
    exactly the new batch's files (O(batch), never a table re-read) so
    `bloom_pruned_parquet` prunes rather than superset-reads them.

    Bootstrap: the table directory need not exist — the first batch
    creates it and `update_stats_manifest` builds the manifest from
    scratch (stat columns fixed by ``cols`` for the table's lifetime).
    """
    import uuid

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fs = _fs_for(spark, table_path)
        fs.mkdirs(table_path)
        # stage inside the table's filesystem (rename across mounts
        # raises EXDEV); the underscore prefix hides it from scans
        staging = os.path.join(
            table_path, f"_ingest_stage_{uuid.uuid4().hex[:12]}"
        )
        batch_df.write.mode("overwrite").parquet(staging)
        prefix = f"ingest-{int(batch_id):09d}-"
        for n in fs.listdir(table_path):
            if n.startswith(prefix) and n.endswith(".parquet"):
                # replayed batch: overwrite, don't duplicate
                fs.remove(os.path.join(table_path, n))
        for i, f in enumerate(_data_files(staging, fs)):
            fs.rename_overwrite(
                f, os.path.join(table_path, f"{prefix}{i:05d}.parquet")
            )
        fs.rmtree(staging)
        update_stats_manifest(spark, table_path, cols)
        for bc in bloom_cols or []:
            # the manifest was reconciled two lines up — don't pay a
            # full listing + stat pass again per bloom column
            update_bloom_sidecar(spark, table_path, bc, skip_reconcile=True)

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
    fs = _fs_for(spark, table_path)
    dest = os.path.join(table_path, MANIFEST_NAME)
    # project ONLY the stat columns: a bloom-indexed manifest carries
    # KB-sized bitmap blobs per file per column, and reading them here
    # doubled the "metadata-only" wall at the 256-file probe (the
    # remaining ~0.3 s is fixed createDataFrame overhead, flat in
    # table size — the economics this path exists for)
    cols = _stat_cols_of(_read_manifest_schema(fs, dest))
    rows = _read_manifest_table(
        fs,
        dest,
        columns=["file", "n_rows"]
        + [p for c in cols for p in (f"min_{c}", f"max_{c}", f"nulls_{c}")],
    ).to_pylist()
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


def vacuum_staging(
    table_path: str,
    grace_seconds: float = 3600.0,
    spark: SparkSession | None = None,
) -> int:
    """Remove crashed writes' leftover staging directories
    (``_delete_stage_*`` / ``_ingest_stage_*``) older than
    ``grace_seconds``.  They are invisible to scans (underscore prefix)
    and harmless to correctness — this reclaims their space.  The grace
    window keeps a LIVE operation's staging safe: never call with a
    grace shorter than your longest running delete/ingest.  Pass
    ``spark`` for scheme'd paths (Hadoop FileSystem routing).  Returns
    the number of directories removed."""
    import time

    fs = _fs_for(spark, table_path)
    removed = 0
    now = time.time()
    for n in fs.listdir(table_path):
        p = os.path.join(table_path, n)
        if not n.startswith(("_delete_stage_", "_ingest_stage_")):
            continue
        try:  # a live operation may remove its own staging concurrently
            if fs.isdir(p) and now - fs.mtime_seconds(p) > grace_seconds:
                fs.rmtree(p)
                removed += 1
        except Exception:  # noqa: BLE001 — the Hadoop route surfaces the
            # same race as Py4JJavaError(FileNotFoundException), not
            # OSError; either way the entry is simply gone — skip it
            continue
    return removed


# ---------------------------------------------------------------------
# Per-file Bloom sidecars: point-lookup skipping on ANY layout
# ---------------------------------------------------------------------

def _bloom_hashes(value, m_bits: int, k: int) -> list[int]:
    """LEGACY (pre-round-9) position scheme: md5 of ``f"{i}:{value}"``
    per hash — k digests per value.  Kept verbatim so sidecars built
    by earlier rounds keep probing correctly (their blobs carry a bare
    ``k`` first byte; see `_bloom_positions` for the current tagged
    format)."""
    import hashlib

    return [
        int.from_bytes(
            hashlib.md5(f"{i}:{value}".encode()).digest()[:8], "big"
        )
        % m_bits
        for i in range(k)
    ]


_BLOOM_KM = 0x80  # blob-format tag: k | 0x80 = Kirsch-Mitzenmacher


def _bloom_positions(value, m_bits: int, k: int) -> list[int]:
    """k bit positions from ONE md5 digest (Kirsch–Mitzenmacher 2006
    double hashing: ``pos_i = (h1 + i·h2) mod m`` with h1/h2 the two
    u64 halves of the digest) — asymptotically the same false-positive
    rate as k independent hashes at 1/k the hashing cost, which is
    what makes a build over ~10^5 distinct values per file (the
    high-cardinality row-id use case) tractable.  Values are rendered
    with ``str`` (int and string keys exact; float keys rejected at
    build time — repr drift would create false NEGATIVES, the one
    failure a Bloom prune must never have)."""
    import hashlib

    d = hashlib.md5(str(value).encode()).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1  # odd: full-period stride
    # wrap mod 2^64 BEFORE the modulus — the vectorized build computes
    # in uint64, and the two paths must land on identical bits
    return [((h1 + i * h2) & 0xFFFFFFFFFFFFFFFF) % m_bits for i in range(k)]


def _bloom_might_contain(
    blob: bytes, value, m_bits: int, _pos_cache: dict | None = None
) -> bool:
    """Membership probe dispatching on the blob's format tag.  Pass a
    dict as ``_pos_cache`` when probing MANY blobs with the same
    values: positions depend only on (value, tag, m_bits), so caching
    them turns a files × values md5 bill into one per value per
    geometry — the difference between a 10^5-file probe planning in
    milliseconds and in minutes."""
    k = blob[0]
    bits = blob[1:]
    key = (value, k, m_bits)
    poss = _pos_cache.get(key) if _pos_cache is not None else None
    if poss is None:
        if k & _BLOOM_KM:
            poss = _bloom_positions(value, m_bits, k & ~_BLOOM_KM)
        else:
            poss = _bloom_hashes(value, m_bits, k)
        if _pos_cache is not None:
            _pos_cache[key] = poss
    return all(bits[p // 8] & (1 << (p % 8)) for p in poss)


def _bloom_bitmap(vals, col: str, m_bits: int, k: int) -> bytes:
    """Tagged bloom blob (``k | 0x80`` byte + ⌈m/8⌉ bitmap bytes) over
    an iterable of values: one md5 per value (Kirsch–Mitzenmacher),
    the k strides and the bit sets as numpy array ops — ~10^5 distinct
    ids bloom in ~100 ms where the pre-round-9 per-position Python
    loop took seconds.  Shared verbatim by the driver footer-path
    build and the executor-side ``method="scan"`` build, so every blob
    probes identically whichever path wrote it."""
    import hashlib

    import numpy as np

    h1s, h2s = [], []
    for v in vals:
        if v is None:
            continue
        if isinstance(v, float):
            raise TypeError(
                f"bloom sidecar on float column {col!r} unsupported: "
                "repr drift would create false negatives"
            )
        d = hashlib.md5(str(v).encode()).digest()
        h1s.append(int.from_bytes(d[:8], "big"))
        h2s.append(int.from_bytes(d[8:], "big") | 1)
    bits = bytearray(m_bits // 8)
    if h1s:
        h1 = np.asarray(h1s, dtype=np.uint64)
        h2 = np.asarray(h2s, dtype=np.uint64)
        strides = np.arange(k, dtype=np.uint64)[:, None]
        # uint64 arithmetic wraps mod 2^64 — exactly Python's
        # (h1 + i*h2) % 2^64 before the final % m_bits, so positions
        # agree with the scalar probe path bit-for-bit
        pos = np.unique((h1 + strides * h2) % np.uint64(m_bits))
        bytes_idx, bit_off = np.divmod(pos, np.uint64(8))
        arr = np.zeros(m_bits // 8, dtype=np.uint8)
        np.bitwise_or.at(arr, bytes_idx.astype(np.int64), np.left_shift(np.uint8(1), bit_off.astype(np.uint8)))
        bits = bytearray(arr.tobytes())
    return bytes([k | _BLOOM_KM]) + bytes(bits)


def _build_bloom(fs, path: str, col: str, m_bits: int, k: int) -> bytes:
    """One file's bloom blob via a column-pruned pyarrow read —
    the driver-side build path (metadata-economy like the footer
    manifest build; right up to ~10^7 total distinct values)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = fs.open_parquet(path)
    try:
        tbl = pq.read_table(src, columns=[col])
    finally:
        if hasattr(src, "close"):
            src.close()
    return _bloom_bitmap(
        pc.unique(tbl.column(col)).to_pylist(), col, m_bits, k
    )


def _scan_blooms(
    spark: SparkSession, paths: list[str], col: str, m_bits: int, k: int
) -> dict[str, bytes]:
    """EXECUTOR-side bloom build: one Arrow-batched ``applyInPandas``
    group per data file (keyed on ``input_file_name()``), each task
    hashing its own file's distinct values with the same
    `_bloom_bitmap` kernel and returning only the KB-sized blob to the
    driver.  This is the 100 TB build path — the md5 work parallelizes
    across the cluster and the driver handles file-count-sized rows,
    where the driver build is serial in total distinct values
    (measured at the 60M-id probe: 137 s serial → 19.8 s on 32 local
    threads; the local ratio is capped by Arrow transfer + per-group
    overhead — on a real cluster each executor blooms its own files).
    The scan reads only the bloom column (column pruning pushes to
    the parquet scan)."""
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    raw = spark.read.parquet(*paths)
    kind = raw.schema[col].dataType.simpleString()
    if kind not in ("tinyint", "smallint", "int", "bigint", "string"):
        raise TypeError(
            f"bloom sidecar method='scan' supports integer and string "
            f"key columns only, got {kind!r} for {col!r} — other types' "
            "JVM-vs-Python string renderings can drift, and drift means "
            "false negatives"
        )
    # render to string JVM-SIDE: Arrow hands a nullable int column to
    # pandas as float64, and the float64→int64 round trip silently
    # corrupts ids above 2^53 (str(wrong int) → bloom false NEGATIVES,
    # the one failure this module must never have).  Spark's
    # bigint→string cast renders exactly like Python's str(int), so
    # the kernel hashes identical bytes on both build paths.
    df = raw.select(
        F.input_file_name().alias("__f"), F.col(col).cast("string").alias(col)
    )

    def _one(pdf):
        import os as _os
        import urllib.parse as _up

        import pandas as pd

        blob = _bloom_bitmap(pdf[col].dropna().unique(), col, m_bits, k)
        # input_file_name() is a URL-encoded URI — unquote so names with
        # space/%/# match the raw fs.listdir / manifest spelling (a
        # mismatch here would mis-key the blob and the caller would
        # treat the file as missing from the scan)
        name = _up.unquote(_os.path.basename(pdf["__f"].iloc[0]))
        return pd.DataFrame({"file": [name], "blob": [blob]})

    out = (
        df.groupBy("__f")
        .applyInPandas(
            _one,
            StructType(
                [
                    StructField("file", StringType()),
                    StructField("blob", BinaryType()),
                ]
            ),
        )
        .collect()
    )
    return {r["file"]: bytes(r["blob"]) for r in out}


def add_bloom_sidecar(
    spark: SparkSession,
    table_path: str,
    col: str,
    m_bits: int = 8192,
    k: int = 6,
    method: str = "footers",
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
    1 %).  The manifest is RECONCILED first (`update_stats_manifest`),
    so files appended since the last build get stat rows rather than
    KeyError-ing the build.  For the incremental form after appends —
    blooms built only for the files missing them — use
    `update_bloom_sidecar`; files without a bloom are never
    bloom-pruned (safe superset) in the meantime.

    ``method="footers"`` builds on the DRIVER (pyarrow column-pruned
    reads — right up to ~10^7 total distinct values);
    ``method="scan"`` ships the build to the EXECUTORS (one
    `applyInPandas` group per file, same hash kernel, only KB-sized
    blobs return) — the 100 TB path (measured: 137 s → 19.8 s at the
    60M-id probe on 32 local threads; cluster-side it scales with
    executors since each blooms its own files).

    Integer and string key columns only (see `_bloom_positions`).
    """
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    if method not in ("footers", "scan"):
        raise ValueError(f"method must be 'footers' or 'scan', got {method!r}")
    fs = _fs_for(spark, table_path)
    dest = os.path.join(table_path, MANIFEST_NAME)
    # reconcile first: a file appended after the manifest build would
    # otherwise have no row to attach its bloom to
    update_stats_manifest(
        spark, table_path, _stat_cols_of(_read_manifest_schema(fs, dest))
    )
    tbl = _read_manifest_table(fs, dest)
    prior_schema = tbl.schema
    rows = tbl.to_pylist()
    by_name = {r["file"]: r for r in rows}
    if method == "scan":
        for name, blob in _scan_blooms(
            spark, _data_files(table_path, fs), col, m_bits, k
        ).items():
            by_name[name][f"bloom_{col}"] = blob
    else:
        for f in _data_files(table_path, fs):
            by_name[os.path.basename(f)][f"bloom_{col}"] = _build_bloom(
                fs, f, col, m_bits, k
            )
    _write_manifest_table(
        fs, dest, _unified_table(list(by_name.values()), prior_schema)
    )
    return dest


def update_bloom_sidecar(
    spark: SparkSession,
    table_path: str,
    col: str,
    m_bits: int | None = None,
    k: int | None = None,
    method: str = "footers",
    skip_reconcile: bool = False,
) -> dict:
    """Incrementally extend the Bloom sidecar to files that lack one:
    reconcile the manifest (O(changed) footer reads — refreshed rows
    surface with a NULL ``bloom_<col>``), then build bitmaps ONLY for
    the NULL-bloom rows — O(new files) column-pruned reads, never the
    `add_bloom_sidecar` full-table pass.  The maintenance half of the
    sidecar: `foreach_batch_stats_appender(bloom_cols=[...])` calls
    this per micro-batch so streaming ingest keeps point-lookup
    pruning without ever re-reading old files.

    ``m_bits``/``k`` default to the parameters recovered from any
    existing blob (self-describing: k byte + bitmap length) so
    incremental builds can never mix bloom geometries; they are
    required only when NO blob exists yet (first build on an empty
    sidecar — equivalent to `add_bloom_sidecar` at that point).
    ``method="scan"`` builds the missing files' bitmaps EXECUTOR-side
    (see `add_bloom_sidecar`) — same blobs, byte for byte.
    ``skip_reconcile=True`` trusts the manifest as already reconciled
    — for callers that just ran `update_stats_manifest` themselves
    (the streaming appender: one reconcile per batch, not one per
    bloom column plus one).

    Returns ``{"files_built", "files_total"}``."""
    fs = _fs_for(spark, table_path)
    dest = os.path.join(table_path, MANIFEST_NAME)
    if not skip_reconcile:
        update_stats_manifest(
            spark, table_path, _stat_cols_of(_read_manifest_schema(fs, dest))
        )
    tbl = _read_manifest_table(fs, dest)
    prior_schema = tbl.schema
    rows = tbl.to_pylist()
    blob = next(
        (r[f"bloom_{col}"] for r in rows if r.get(f"bloom_{col}")), None
    )
    if blob is not None:
        got_k, got_m = blob[0] & ~_BLOOM_KM, (len(blob) - 1) * 8
        if (m_bits is not None and m_bits != got_m) or (
            k is not None and k != got_k
        ):
            raise ValueError(
                f"bloom geometry mismatch: existing blobs are m_bits={got_m} "
                f"k={got_k}; rebuild with add_bloom_sidecar to change"
            )
        m_bits, k = got_m, got_k
    else:
        m_bits = 8192 if m_bits is None else m_bits
        k = 6 if k is None else k
        if m_bits % 8:
            raise ValueError("m_bits must be a multiple of 8")
    if method not in ("footers", "scan"):
        raise ValueError(f"method must be 'footers' or 'scan', got {method!r}")
    missing = [r for r in rows if not r.get(f"bloom_{col}")]
    if method == "scan" and missing:
        blobs = _scan_blooms(
            spark,
            [os.path.join(table_path, r["file"]) for r in missing],
            col,
            m_bits,
            k,
        )
        # a ZERO-ROW part file (an empty micro-batch still lands one)
        # contributes no applyInPandas group — its bloom is the empty
        # bitmap, same as the footers path would build.  The empty
        # fallback is taken ONLY when the manifest PROVES n_rows == 0:
        # any other missing blob is a file-name keying bug, and blooming
        # a non-empty file as empty would be a false NEGATIVE (pruning
        # a file that contains probe values — silent missing rows).
        empty = _bloom_bitmap([], col, m_bits, k)
        for r in missing:
            blob_r = blobs.get(r["file"])
            if blob_r is None:
                if r.get("n_rows") == 0:
                    blob_r = empty
                else:
                    raise RuntimeError(
                        f"executor bloom scan produced no group for "
                        f"non-empty file {r['file']!r} "
                        f"(n_rows={r.get('n_rows')}) — refusing to record "
                        "an empty (prune-everything) bloom for it"
                    )
            r[f"bloom_{col}"] = blob_r
    else:
        for r in missing:
            r[f"bloom_{col}"] = _build_bloom(
                fs, os.path.join(table_path, r["file"]), col, m_bits, k
            )
    if missing:
        _write_manifest_table(fs, dest, _unified_table(rows, prior_schema))
    return {"files_built": len(missing), "files_total": len(rows)}


def _bloom_prune_names(
    manifest_rows: list[dict], col: str, values: list
) -> list[str]:
    """File names whose bloom CAN contain at least one probe value —
    plus every blob-less row (membership unknown, never pruned).

    Vectorized planning: blobs sharing a geometry (length, tag byte)
    stack into one ``(n_files, bytes)`` uint8 matrix; each probe value
    hashes ONCE per geometry (k positions) and its bit test runs across
    ALL files as a single numpy gather.  The planning bill at the
    10^5-file × 10^3-key regime is a few numpy passes (~10^8 byte ops
    vectorized), where the per-(file, value) Python loop was minutes —
    the driver-side cost law SCALE.md records.  Early-exit once every
    file in a geometry group is kept."""
    import numpy as np

    keep: list[str] = []
    groups: dict[tuple[int, int], tuple[list[str], list[bytes]]] = {}
    for r in manifest_rows:
        blob = r.get(f"bloom_{col}")
        if not blob:
            keep.append(r["file"])  # no bloom: membership unknown
            continue
        g = groups.setdefault((len(blob), blob[0]), ([], []))
        g[0].append(r["file"])
        g[1].append(bytes(blob))
    for (blen, tag), (names, blobs) in groups.items():
        m_bits = (blen - 1) * 8
        k = tag & ~_BLOOM_KM
        mat = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(
            len(blobs), blen
        )[:, 1:]
        kept = np.zeros(len(blobs), dtype=bool)
        for v in values:
            if tag & _BLOOM_KM:
                pos = _bloom_positions(v, m_bits, k)
            else:
                pos = _bloom_hashes(v, m_bits, k)
            pos = np.asarray(pos, dtype=np.int64)
            masks = np.left_shift(
                np.uint8(1), (pos % 8).astype(np.uint8)
            )
            hit = ((mat[:, pos // 8] & masks) != 0).all(axis=1)
            kept |= hit
            if kept.all():
                break
        keep.extend(n for n, kf in zip(names, kept) if kf)
    return keep


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
    fs = _fs_for(spark, table_path)
    if not values:
        raise ValueError("values must be non-empty")
    dest = os.path.join(table_path, MANIFEST_NAME)
    if f"bloom_{col}" not in _read_manifest_schema(fs, dest).names:
        # no sidecar for this column (never built, or a maintenance op
        # rebuilt the manifest): membership unknown for EVERY file —
        # degrade to the unpruned superset read, never an error
        return spark.read.parquet(table_path).filter(
            F.col(col).isin(list(values))
        )
    manifest = _read_manifest_table(
        fs, dest, columns=["file", f"bloom_{col}"]
    ).to_pylist()
    keep = [
        os.path.join(table_path, n)
        for n in _bloom_prune_names(manifest, col, values)
    ]
    # files with no manifest row at all (unreconciled append): content
    # unknown — read them, same as a manifested row with no bloom
    keep.extend(_unmanifested_files(table_path, fs, manifest))
    if not keep:
        schema = spark.read.parquet(table_path).schema
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*sorted(keep)).filter(
        F.col(col).isin(list(values))
    )


def bloom_pruned_join(
    spark: SparkSession,
    table_path: str,
    col: str,
    dim: DataFrame,
    dim_key: str,
    how: str = "inner",
    max_keys: int = 100_000,
    fallback: str | None = None,
) -> DataFrame:
    """FILE-level semi-join pushdown through the Bloom sidecar — the
    file-granularity analog of dynamic partition pruning: collect the
    dimension's distinct keys (broadcast-sized by contract — the same
    bound a broadcast join already imposes on `dim`), open only the
    fact files whose bloom can contain at least one key, then run the
    ordinary broadcast equi-join on the survivors.  "Join 100 TB of
    events to this 10k-user cohort" becomes a read of the files that
    contain the cohort, not the corpus — before the scan even plans.

    Result is bit-identical to joining the full table (the bloom read
    is a superset; the join applies the exact predicate).  ``how``
    supports the key-filtering family (``inner``/``left_semi``);
    outer joins need non-matching rows and would be wrong under file
    pruning, so they are refused.  Raises if `dim` holds more than
    ``max_keys`` distinct keys — past that the key list stops being
    driver-sized and the honest plan is a shuffled join over the full
    scan instead; pass ``fallback="shuffle"`` to take that plan
    automatically (same results, no pruning) so pipeline code survives
    cohort-size drift without try/except."""
    if fallback not in (None, "shuffle"):
        raise ValueError(f"fallback must be None or 'shuffle', got {fallback!r}")
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_pruned_join supports inner/left_semi, got {how!r} — "
            "outer joins need non-matching rows, which file pruning drops"
        )
    keys = [
        r[0]
        for r in dim.select(dim_key)
        .filter(F.col(dim_key).isNotNull())  # NULL never equi-matches —
        # and must not count toward the cap either
        .distinct()
        .limit(max_keys + 1)
        .collect()
    ]
    if len(keys) > max_keys:
        if fallback == "shuffle":
            # cohort outgrew the driver-sized key list: same join, full
            # scan, no broadcast hint — Catalyst/AQE plan the shuffle
            fact = spark.read.parquet(table_path)
            if how == "left_semi":
                return fact.join(
                    dim.select(dim_key).distinct(),
                    fact[col] == dim[dim_key],
                    "left_semi",
                )
            return fact.join(dim, fact[col] == dim[dim_key], "inner")
        raise ValueError(
            f"dim has more than max_keys={max_keys} distinct keys — "
            "use a plain shuffled join (or pass fallback='shuffle'); a "
            "driver-side key list this large defeats the pruning economics"
        )
    if not keys:
        schema = spark.read.parquet(table_path).schema
        fact = spark.createDataFrame([], schema)
    else:
        fact = bloom_pruned_parquet(spark, table_path, col, keys)
    if how == "left_semi":
        return fact.join(
            F.broadcast(dim.select(dim_key).distinct()),
            fact[col] == dim[dim_key],
            "left_semi",
        )
    return fact.join(F.broadcast(dim), fact[col] == dim[dim_key], "inner")
