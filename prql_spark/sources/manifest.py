"""Manifest-committed versioned parquet datasets (mini table format).

The missing layer between "a directory of parquet files" and a real
lakehouse table, built with nothing but parquet + a JSON manifest per
commit — the same core idea as Iceberg/Delta (public designs), sized
to this engine:

* **Atomic commits.** A writer stages parquet files into a fresh
  ``data/<commit>/`` directory, then publishes ONE manifest file via
  an atomic rename. Readers either see the whole commit or none of
  it; a writer that dies mid-job leaves only unreferenced files.
* **Time travel.** Every version's manifest is retained; reading
  version N plans from its file list — reproducible training runs
  pin the exact bytes they trained on.
* **O(1) read planning.** ``snapshot_read`` never lists the data
  tree: the manifest IS the file index. At 100 TB / 400k files an
  S3 recursive listing is minutes of driver time per query; a
  manifest read is one small GET.
* **Zero-deletion-window compaction.** ``compact_snapshot`` writes
  the repacked files and commits a manifest pointing at them; the
  old version stays fully readable. Space is reclaimed later by an
  explicit ``vacuum_snapshot`` — data files are deleted ONLY when no
  retained manifest references them. (Contrast with in-place
  ``compact_parquet``, which must swap directories under readers.)
* **Optimistic concurrency.** The version number is claimed by the
  manifest rename; a loser's rename fails (file exists) and retries
  on top of the winner's commit.

Layout::

    <path>/data/<commit-id>/part-*.parquet   immutable once published
    <path>/data/<commit-id>/<col>=<v>/part-*.parquet  (partitioned)
    <path>/_manifests/v{N:010d}.json         one per version
    <path>/_manifests/.v{N}.json.tmp         stage, renamed into place

Partition specs (``snapshot_write(partition_by=...)``): files land in
hive-style ``col=value`` directories INSIDE the commit dir, and each
file's partition values are recorded in the manifest — both as a
``partition`` dict (powers :func:`snapshot_partitions`, the
SHOW PARTITIONS that never lists directories) and as degenerate
``[v, v]`` entries in the file's ``stats`` map, so every existing
pruning consumer (:func:`snapshot_scan`, :func:`snapshot_pruned_read`,
the PRQL predicate pushdown) prunes on partition columns with zero
extra machinery. Partition stats are parsed from the staged paths
driver-side (typed via the writer's schema) — no extra Spark job per
commit. Reads restore partition columns per commit directory
(``basePath`` + the manifest's ordered schema, so types match the
writer exactly and never depend on path inference).

All filesystem access goes through Hadoop's FileSystem API, so
READS (planning, time travel, history, fsck) behave identically on
file:// , hdfs:// and s3a://. The COMMIT point is exists-check +
rename, which is a true atomic claim only on filesystems whose
rename is atomic and refuses an existing destination — HDFS. On the
local filesystem Hadoop's ``RawLocalFileSystem.rename`` also refuses
an existing destination (pinned in tests), leaving only the tiny
check-then-rename window; on S3A rename is copy+delete and two
racing writers CAN both believe they committed the same version —
single-writer (or externally locked) operation is required there.
The seam to replace for object stores is :class:`CommitProtocol`
(install with :func:`set_commit_protocol`): the default
:class:`RenameCommitProtocol` relies on atomic rename-refuses-
existing (HDFS/local); :class:`LockFileCommitProtocol` serializes
publishers through an exclusive-create lock file with TTL crash
recovery (non-atomic-rename stores); a conditional-put protocol
(like Delta's LogStore or an Iceberg catalog) plugs into the same
three-line interface.
Manifests carry RELATIVE file paths — a dataset can be cloned or
mounted elsewhere.

Single-manifest simplification (documented trade-off vs Iceberg's
manifest lists): each commit's manifest holds the FULL file list.
At 400k files × ~60 bytes that is a ~25 MB driver-side JSON per
commit — acceptable; beyond that, shard the manifest the way
Iceberg does.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _hidden(name: str) -> bool:
    """Spark's hidden-path rule for data trees: underscore/dot
    prefixes are writer metadata (_SUCCESS, .crc, staged tmp dirs) —
    EXCEPT the hive NULL-partition directory, which is real data."""
    return name.startswith(("_", ".")) and name != _HIVE_NULL


def _hidden_rel(rel: str) -> bool:
    return any(_hidden(c) for c in rel.split("/"))


def _norm_ts_path(s: str) -> str:
    """Hive-dir timestamp value → the exact string ``_stats_enc``
    produces for the same instant. Two mismatches to normalize:
    the separator (hive uses a space, isoformat a ``T``) and the
    fractional seconds (Spark TRIMS trailing fraction zeros in hive
    dirs — ``.123`` — while ``datetime.isoformat()`` always emits 6
    digits when microsecond != 0 — ``.123000``). Without the pad, a
    lexicographic equality compare against the query literal wrongly
    prunes the file (e.g. ``'...00:00:00.123' != '...00:00:00.123000'``),
    violating the "pruning is conservative, never wrong" contract."""
    s = s.replace(" ", "T")
    if "." in s:
        head, _, frac = s.partition(".")
        frac = (frac + "000000")[:6]
        if frac == "000000":
            return head  # isoformat omits an all-zero fraction
        return f"{head}.{frac}"
    return s


# partition-path value parsers by Spark simpleString type. Types not
# listed get NO stats entry (display-only partition value) — pruning
# on them is simply skipped, never wrong.
_PART_PARSERS = {
    "tinyint": int,
    "smallint": int,
    "int": int,
    "bigint": int,
    "float": float,
    "double": float,
    "boolean": lambda s: s.lower() == "true",
    "string": lambda s: s,
    "date": lambda s: s,  # hive path is ISO, same as _stats_enc
    # hive path uses a space separator and trims fraction zeros;
    # stats compare isoformat — normalize to isoformat's exact form
    "timestamp": _norm_ts_path,
    "timestamp_ntz": _norm_ts_path,
}


def _parse_partition(
    rel_inside_commit: str, types: dict
) -> tuple[dict, set]:
    """``a=1/b=x%3Ay/part-0.parquet`` → ``({"a": ..., "b": ...},
    stats_ok)`` with values typed via the writer's schema
    (``types``: col → simpleString). Hive-escaped chars are
    unquoted; the hive NULL dir maps to None. ``stats_ok`` names the
    columns whose value is safe to use as a pruning bound — typed by
    a known parser (a raw-string fallback for an unlisted type like
    decimal is display-only: lexicographic bounds on it could prune
    wrongly)."""
    out: dict = {}
    stats_ok: set = set()
    for seg in rel_inside_commit.split("/")[:-1]:
        if "=" not in seg:
            continue
        k, _, raw = seg.partition("=")
        k = unquote(k)
        if raw == _HIVE_NULL:
            out[k] = None
            continue
        v = unquote(raw)
        parser = _PART_PARSERS.get(types.get(k, ""))
        if parser is not None:
            try:
                out[k] = parser(v)
                stats_ok.add(k)
                continue
            except ValueError:
                pass
        out[k] = v
    return out, stats_ok


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


class CommitProtocol:
    """The pluggable manifest-publish seam. ``publish`` must put
    ``text`` at ``dir_path/name`` such that concurrent publishers of
    the SAME name see exactly one winner (return True) and everyone
    else False — the losers re-list versions and retry on the next
    number. Swap the protocol for stores whose rename lacks
    conditional semantics (S3 without a catalog): the same seam
    Delta fills with a LogStore and Iceberg with a catalog."""

    def publish(self, fs, jvm, dir_path: str, name: str, text: str) -> bool:
        raise NotImplementedError


class RenameCommitProtocol(CommitProtocol):
    """Default: stage under a dotted tmp name, then rename to
    ``name`` — the rename is the commit point.

    Atomicity is the filesystem's: HDFS rename atomically refuses an
    existing destination, so the loser of a race always sees False.
    Hadoop's local ``RawLocalFileSystem.rename`` also returns False
    on an existing destination (behavior pinned in
    tests/test_manifest.py), leaving only the narrow window between
    the exists() probe and the rename. S3A rename is copy+delete
    with no conditional semantics — use
    :class:`LockFileCommitProtocol` (or a conditional-put protocol)
    there instead."""

    def publish(self, fs, jvm, dir_path: str, name: str, text: str) -> bool:
        Path = jvm.org.apache.hadoop.fs.Path
        tmp = Path(f"{dir_path}/.{name}.{uuid.uuid4().hex[:8]}.tmp")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        dst = Path(f"{dir_path}/{name}")
        if fs.exists(dst) or not fs.rename(tmp, dst):
            fs.delete(tmp, False)
            return False
        return True


class LockFileCommitProtocol(CommitProtocol):
    """Mutual exclusion via an exclusive-create lock file — for
    stores whose rename is not atomic. ``fs.create(path,
    overwrite=False)`` refuses an existing path on HDFS/local (and
    on S3 maps to a conditional PUT with If-None-Match under recent
    S3A); while the lock is held, the existence check, full staging
    of the manifest under a hidden tmp name, and the rename that
    publishes it cannot race — and a crash at any point leaves
    either no head or the previous head, never a truncated one. A
    writer that dies holding the lock
    is healed by ``lock_ttl_s``: a lock older than the TTL is broken
    by the next publisher (crash recovery, same posture as Delta's
    S3 LogStore recovery). Contenders return False and re-enter the
    caller's list-and-retry loop."""

    def __init__(self, lock_ttl_s: float = 300.0):
        self.lock_ttl_s = lock_ttl_s

    def publish(self, fs, jvm, dir_path: str, name: str, text: str) -> bool:
        import time

        Path = jvm.org.apache.hadoop.fs.Path
        lock = Path(f"{dir_path}/.commit.lock")
        try:
            out = fs.create(lock, False)  # exclusive create
        except Exception:
            # lock held: break it only when provably stale
            try:
                age_ms = time.time() * 1000.0 - fs.getFileStatus(
                    lock
                ).getModificationTime()
                if age_ms > self.lock_ttl_s * 1000.0:
                    fs.delete(lock, False)
            except Exception:
                pass  # lock vanished between probe and stat: fine
            time.sleep(0.02)  # backoff: the caller retries immediately
            return False
        try:
            out.write(bytearray(uuid.uuid4().hex.encode("utf-8")))
            out.close()
            dst = Path(f"{dir_path}/{name}")
            if fs.exists(dst):
                return False  # someone published this version earlier
            # stage the FULL content under a dotted tmp name first —
            # a writer crashing mid-write leaves only a hidden tmp
            # (readers ignore dotted names), never a truncated head
            # that _versions would list as committed. The rename
            # under the lock is then the commit point: an atomic
            # metadata op on HDFS/local, and a single server-side
            # atomic PUT on S3A's copy — the head appears fully
            # formed or not at all.
            tmp = Path(f"{dir_path}/.{name}.{uuid.uuid4().hex[:8]}.tmp")
            o2 = fs.create(tmp, True)
            staged = False
            try:
                o2.write(bytearray(text.encode("utf-8")))
                staged = True
            finally:
                o2.close()
                if not staged:
                    fs.delete(tmp, False)
            if not fs.rename(tmp, dst):
                # double-slip defense for stores whose lock create is
                # exists+create rather than O_EXCL (Hadoop local FS):
                # rename refuses an existing destination there, so if
                # two publishers both passed the lock, exactly one
                # wins and the other sees False. (On S3 the lock
                # create IS a conditional PUT, so a double-slip
                # cannot happen in the first place.)
                fs.delete(tmp, False)
                return False
            return True
        finally:
            fs.delete(lock, False)


_COMMIT_PROTOCOL: CommitProtocol = RenameCommitProtocol()


def set_commit_protocol(protocol: CommitProtocol) -> None:
    """Install the manifest-publish protocol for this process (e.g.
    ``set_commit_protocol(LockFileCommitProtocol())`` before writing
    manifest tables on an object store)."""
    global _COMMIT_PROTOCOL
    _COMMIT_PROTOCOL = protocol


def get_commit_protocol() -> CommitProtocol:
    return _COMMIT_PROTOCOL


def _write_text_atomic(fs, jvm, dir_path: str, name: str, text: str) -> bool:
    """Publish via the installed :class:`CommitProtocol` (default:
    rename-based). Every commit point in this module funnels here."""
    return _COMMIT_PROTOCOL.publish(fs, jvm, dir_path, name, text)


def _read_text(fs, jvm, path: str) -> str:
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(path))
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def _versions(fs, jvm, base: str) -> list[int]:
    Path = jvm.org.apache.hadoop.fs.Path
    mdir = Path(f"{base}/{_MANIFEST_DIR}")
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        # tmp stages are dot-prefixed; published manifests only
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _load_manifest(fs, jvm, base: str, version: int) -> dict:
    return json.loads(
        _read_text(fs, jvm, f"{base}/{_MANIFEST_DIR}/v{version:010d}.json")
    )


_STATS_MAX_CHARS = 32


def _trunc_lo(s: str, n: int = _STATS_MAX_CHARS) -> str:
    """Safe LOWER bound for a long string stat: a prefix sorts <=
    every string it prefixes, so truncation alone is valid."""
    return s if len(s) <= n else s[:n]


def _trunc_hi(s: str, n: int = _STATS_MAX_CHARS) -> str | None:
    """Safe UPPER bound for a long string stat: truncate, then
    increment the last code point (skipping the surrogate gap) so
    the result sorts >= every string sharing the prefix — the same
    scheme Iceberg uses for bounded metadata. Returns None when no
    safe bound exists (every prefix char is at the code-point
    ceiling) — the caller must then drop the bound entirely
    (conservative: the file is always read)."""
    if len(s) <= n:
        return s
    p = s[:n]
    for i in range(len(p) - 1, -1, -1):
        c = ord(p[i])
        if c >= 0x10FFFF:
            continue
        nc = c + 1
        if 0xD800 <= nc <= 0xDFFF:
            nc = 0xE000
        return p[:i] + chr(nc)
    return None


def _bound_stat(lo, hi):
    """Bound one [lo, hi] stats pair for the manifest: long strings
    truncate (manifests must stay small — a text column's raw
    min/max would embed whole documents, megabytes per file entry at
    100 TB); everything else passes through. Returns None when no
    safe bounded form exists."""
    if isinstance(lo, str) and isinstance(hi, str):
        hi_b = _trunc_hi(hi)
        if hi_b is None:
            return None
        return [_trunc_lo(lo), hi_b]
    return [lo, hi]


def _stats_enc(v):
    """JSON-encode a stats bound the way snapshot_scan compares them
    (timestamps/dates → ISO strings, bytes → utf-8)."""
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", "replace")
    return v


def _staged_stats(
    spark, data_dir: str, staged: list, cols: tuple, schema=None
) -> int:
    """Exact per-file [min, max] for ``cols`` over the just-staged
    files, attached into ``staged`` in place; returns the number of
    files that got stats.

    One COLUMN-PRUNED distributed scan of the NEW files only
    (``groupBy(input_file_name())``) — runs executor-side on any
    filesystem (where :func:`attach_stats`'s driver-side pyarrow
    footer reads cannot, i.e. object stores), and the ranges are
    exact-from-data, so there is no "footer lacks statistics" miss
    case. The ``collect()`` is bounded at one row per staged file.
    Cost: re-reading only ``cols`` of the files this very commit just
    wrote (typically still in page cache) — proportional to the
    commit, never the table."""
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs.append(F.min(F.col(c)).alias(f"mn_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"mx_{c}"))
    reader = spark.read
    if schema is not None:
        # partitioned commit dir: basePath + the writer's exact
        # schema restore the partition columns with the writer's
        # types (never path inference)
        reader = reader.schema(schema).option("basePath", data_dir)
    rows = (
        reader.parquet(data_dir)
        .groupBy(F.input_file_name().alias("f"))
        .agg(*aggs)
        .collect()
    )
    # key on the path RELATIVE to the commit dir, not the basename:
    # a partitioned write reuses part-file names across partition
    # directories (one task, many partitions), so basenames collide
    marker = "/" + data_dir.rstrip("/").rsplit("/", 1)[1] + "/"
    by_rel: dict[str, dict] = {}
    n_by_rel: dict[str, int] = {}
    for r in rows:
        st = {}
        for c in cols:
            lo, hi = r[f"mn_{c}"], r[f"mx_{c}"]
            # an all-NULL file has no usable range for c; scans then
            # always read it (safe), same as a stats-less footer
            if lo is not None and hi is not None:
                rng = _bound_stat(_stats_enc(lo), _stats_enc(hi))
                if rng is not None:
                    st[c] = rng
        rel = unquote(r["f"].split(marker, 1)[1])
        n_by_rel[rel] = r["__n_rows"]
        if st:
            by_rel[rel] = st
    n_ok = 0
    for f in staged:
        rel = f["path"].split("/", 2)[2]  # after data/<commit>/
        # per-file row count rides the same scan for free — powers
        # metadata-only counts (snapshot_count) and history rows
        if rel in n_by_rel:
            f["n_rows"] = int(n_by_rel[rel])
        st = by_rel.get(rel)
        if st:
            f["stats"] = {**f.get("stats", {}), **st}
            n_ok += 1
    return n_ok


def _footer_local_dir(data_dir: str) -> str | None:
    """The local-filesystem directory for ``data_dir`` when its
    scheme allows DRIVER-side footer reads, else None (object-store
    paths take the executor-side footer job). Separated out so tests
    can force the executor path on a local directory."""
    from urllib.parse import urlparse

    u = urlparse(data_dir)
    if u.scheme not in ("", "file"):
        return None
    return u.path if u.scheme == "file" else data_dir


def _staged_stats_footers(
    data_dir: str, staged: list, cols: tuple, partition_by: tuple,
    max_files: int = 256, spark=None,
) -> bool:
    """Write-time stats fast path (round 11): the files this commit
    just wrote already carry exact per-column min/max and row counts
    in their parquet FOOTERS, so the stats can be read metadata-only
    (no data pages) instead of re-scanning the staged files. On a
    local filesystem the footers are read driver-side (zero Spark
    jobs); on any other scheme (round 12) they are read
    EXECUTOR-side — one tiny task per staged file resolving the
    directory through ``pyarrow.fs.FileSystem.from_uri`` — so object
    stores keep the no-data-pages win instead of falling back to the
    full stats re-scan. Returns True when every staged file yielded
    usable stats for every requested data column (rows + stats
    attached in place) — the caller then skips
    :func:`_staged_stats`; False falls back to the distributed scan
    unchanged (a footer lacking min/max, a filesystem pyarrow cannot
    resolve, or a commit wider than ``max_files``, where one
    distributed scan beats per-file task scheduling).
    Partition columns never live in footers — their exact [v, v]
    stats are already parsed from the staged paths. Footer values
    feed the same :func:`_bound_stat` encoding `attach_stats` uses,
    so pruning semantics are identical."""
    if len(staged) > max_files:
        return False
    try:
        import pyarrow.parquet as pq  # noqa: F401
    except ImportError:
        return False
    data_cols = tuple(c for c in cols if c not in partition_by)
    rels = [f["path"].split("/", 2)[2] for f in staged]  # data/<c>/
    local_dir = _footer_local_dir(data_dir)
    if local_dir is not None:
        per_file = [
            _footer_rows_and_stats(os.path.join(local_dir, rel),
                                   data_cols)
            for rel in rels
        ]
    else:
        if spark is None:
            return False
        per_file = _footer_rows_and_stats_exec(
            spark, data_dir, rels, data_cols
        )
    results = []
    for f, (n_rows, st) in zip(staged, per_file):
        if n_rows is None or st is None:
            return False  # unreadable / footer lacks min/max
        results.append((f, n_rows, st))
    for f, n_rows, st in results:
        f["n_rows"] = int(n_rows)
        if st:
            f["stats"] = {**f.get("stats", {}), **st}
    return True


def _footer_rows_and_stats(
    path_or_file, data_cols: tuple
) -> tuple[int | None, dict | None]:
    """(n_rows, bounded stats) for one parquet footer; (None, None)
    when unreadable, (n, None) when a requested column lacks usable
    min/max. Empty/no-column files report ``{}`` (usable, no
    ranges). Runs driver-side or inside an executor task."""
    import pyarrow.parquet as pq

    try:
        meta = pq.read_metadata(path_or_file)
    except Exception:
        return None, None
    n_rows = meta.num_rows
    st: dict | None = {}
    if data_cols and n_rows > 0:
        st = _stats_from_footer_meta(meta, data_cols)
    return n_rows, st


def _footer_rows_and_stats_exec(
    spark, data_dir: str, rels: list, data_cols: tuple
) -> list:
    """Executor-side footer reads: one task per staged file, each
    opening only the parquet FOOTER through the pyarrow filesystem
    for ``data_dir``'s scheme (s3/abfs/gcs/hdfs where pyarrow has a
    binding). The per-task payload is a path string; the result rows
    are JSON-safe (stats already encoded/bounded), so the collect is
    bounded at one slim row per staged file. Any resolution or read
    failure yields (None, None) for that file — the caller then
    falls back to the distributed stats scan, preserving the
    every-file-or-fallback contract."""
    root = data_dir if "://" in data_dir else "file://" + data_dir

    def one(rel: str):
        from pyarrow import fs as pafs

        try:
            fsys, base = pafs.FileSystem.from_uri(root)
            with fsys.open_input_file(f"{base}/{rel}") as f:
                return _footer_rows_and_stats(f, data_cols)
        except Exception:
            return None, None

    indexed = (
        spark.sparkContext.parallelize(
            list(enumerate(rels)), max(len(rels), 1)
        )
        .map(lambda ir: (ir[0], one(ir[1])))
        .collect()
    )
    return [rs for _, rs in sorted(indexed)]


def _stage_commit(
    df: DataFrame,
    base: str,
    fs,
    jvm,
    partition_by: tuple,
    col_types: dict,
    stats_cols: tuple | None,
) -> tuple[str, list]:
    """Write ``df``'s files into a fresh ``data/<commit>/`` dir and
    return ``(commit_id, staged file entries)`` — relative paths,
    sizes, partition values (parsed from the hive paths, typed via
    the writer's schema) and optional write-time column stats. The
    commit is INVISIBLE until a manifest referencing it is published;
    a writer that dies here leaves only unreferenced files (vacuum
    reclaims them after the grace window)."""
    spark = df.sparkSession
    commit_id = uuid.uuid4().hex[:16]
    data_dir = f"{base}/{_DATA_DIR}/{commit_id}"
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(data_dir)

    # relative paths of the freshly staged files (partitioned writes
    # nest them under col=value dirs — keep the FULL relative path)
    Path = jvm.org.apache.hadoop.fs.Path
    data_prefix = Path(data_dir).toUri().getPath()
    staged = []
    it = fs.listFiles(Path(data_dir), True)
    while it.hasNext():
        st = it.next()
        rel = st.getPath().toUri().getPath()[len(data_prefix):]
        rel = rel.lstrip("/")
        if _hidden_rel(rel):
            continue
        entry = {
            "path": f"{_DATA_DIR}/{commit_id}/{rel}",
            "bytes": st.getLen(),
        }
        if partition_by:
            values, ok = _parse_partition(rel, col_types)
            entry["partition"] = {
                c: values.get(c) for c in partition_by
            }
            stats = {}
            for c in partition_by:
                if c in ok and values.get(c) is not None:
                    rng = _bound_stat(values[c], values[c])
                    if rng is not None:
                        stats[c] = rng
            if stats:
                entry["stats"] = stats
        staged.append(entry)

    if stats_cols and not _staged_stats_footers(
        data_dir, staged, tuple(stats_cols), partition_by, spark=spark
    ):
        _staged_stats(
            spark,
            data_dir,
            staged,
            tuple(stats_cols),
            schema=df.schema if partition_by else None,
        )
    return commit_id, staged


def snapshot_write(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    max_commit_attempts: int = 20,
    extra: dict | None = None,
    allow_new_columns: bool = False,
    stats_cols: tuple | None = None,
    partition_by: tuple | None = None,
) -> dict:
    """Commit ``df`` as a new version of the dataset at ``path``.

    ``mode="overwrite"`` makes the new version's content exactly
    ``df``; ``mode="append"`` adds ``df``'s files to the parent
    version's list (the parent's files are REFERENCED, never
    rewritten — an append of 1 GB to a 100 TB table moves 1 GB) and
    raises on a schema mismatch vs the parent (a mixed-schema
    version would fail or silently null-fill at read). Schema
    EVOLUTION is opt-in: ``allow_new_columns=True`` accepts an
    append whose schema is a SUPERSET of the parent's (add a
    column; never drop or retype one) — the version is flagged so
    reads merge schemas and old files null-fill the new columns.
    ``extra`` merges caller metadata into the manifest (e.g. the
    streaming sink's ``stream_id``/``epoch`` idempotence keys); a
    ``stream_id``/``epoch`` pair is ALSO folded into the manifest's
    per-stream high-water map (``streams``), which every commit
    carries forward from its parent — so the exactly-once replay
    check survives :func:`vacuum_snapshot` trimming old manifests
    (the latest manifest alone knows every stream's high water).
    ``stats_cols`` collects exact per-file [min, max] for those
    columns AT WRITE TIME (one column-pruned distributed scan of the
    new files — works on any filesystem, unlike the driver-side
    footer reads of :func:`attach_stats`) and embeds them in the
    manifest, powering :func:`snapshot_scan` file skipping with no
    separate stats commit.
    ``partition_by`` lays the commit out hive-style
    (``col=value`` dirs inside the commit dir) and records each
    file's partition values in the manifest — as a ``partition``
    dict AND as exact ``[v, v]`` stats, so file skipping and PRQL
    pushdown prune on partition columns for free (no scan: values
    are parsed from the staged paths driver-side, typed via the
    writer's schema). Appends must keep the parent's partitioning;
    an overwrite may change it.
    Returns ``{"version", "n_files", "operation"}``.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"snapshot_write: unknown mode {mode!r}")
    partition_by = tuple(partition_by or ())
    missing = [c for c in partition_by if c not in df.columns]
    if missing:
        raise ValueError(
            f"snapshot_write: partition_by columns {missing} not in "
            f"dataframe columns {df.columns}"
        )
    # a partition column named `_x`/`.x` writes hive dirs `_x=v` that
    # BOTH this layer's _hidden_rel and Spark's own FileIndex classify
    # as writer metadata: staging would record zero files and publish
    # an empty manifest while the real data sits unreferenced until
    # vacuum deletes it — refuse loudly instead of losing data
    bad = [c for c in partition_by if c.startswith(("_", "."))]
    if bad:
        raise ValueError(
            f"snapshot_write: partition_by columns {bad} start with "
            "'_' or '.' — hive directories named after them are "
            "treated as hidden writer metadata (by Spark's FileIndex "
            "and by this manifest layer) and the staged files would "
            "be silently dropped; rename the columns"
        )
    spark = df.sparkSession
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    # (name, type) pairs — nullability differences are benign
    schema_sig = sorted(
        (f.name, f.dataType.simpleString()) for f in df.schema.fields
    )
    # ordered (name, type): reconstructs the writer's exact schema at
    # read time (partitioned reads pass it explicitly so partition
    # column types never depend on path inference)
    schema_ddl = [
        (f.name, f.dataType.simpleString()) for f in df.schema.fields
    ]
    col_types = dict(schema_ddl)
    commit_id, staged = _stage_commit(
        df, base, fs, jvm, partition_by, col_types, stats_cols
    )

    fs.mkdirs(
        jvm.org.apache.hadoop.fs.Path(f"{base}/{_MANIFEST_DIR}")
    )
    for _ in range(max_commit_attempts):
        seen = _versions(fs, jvm, base)
        parent = seen[-1] if seen else None
        version = (parent or 0) + 1
        files = list(staged)
        merge_schema = False
        streams: dict = {}
        if parent is not None:
            pm = _load_manifest(fs, jvm, base, parent)
            # the per-stream high-water map rides EVERY commit (incl.
            # overwrites), so it survives vacuum trimming manifests
            streams = dict(pm.get("streams") or {})
        if mode == "append" and parent is not None:
            ppart = tuple(pm.get("partition_by") or ())
            if ppart != partition_by:
                raise ValueError(
                    "snapshot_write: append partitioning mismatch vs "
                    f"version {parent}: {ppart} != {partition_by} — "
                    "a version mixing layouts cannot be planned with "
                    "one partition scheme; overwrite to re-partition"
                )
            psig = [tuple(p) for p in pm.get("schema", [])]
            if psig and psig != schema_sig:
                superset = allow_new_columns and set(psig) < set(
                    schema_sig
                )
                if not superset:
                    raise ValueError(
                        "snapshot_write: append schema mismatch vs "
                        f"version {parent}: {psig} != {schema_sig} — "
                        "a mixed-schema version would fail (or "
                        "silently null-fill) at read; adding columns "
                        "needs allow_new_columns=True"
                    )
                merge_schema = True
            merge_schema = merge_schema or bool(pm.get("merge_schema"))
            files = pm["files"] + files
        if extra and "stream_id" in extra and "epoch" in extra:
            sid = str(extra["stream_id"])
            streams[sid] = max(int(extra["epoch"]), streams.get(sid, -1))
        manifest = {
            "version": version,
            "parent": parent,
            "operation": mode,
            "commit": commit_id,
            "schema": schema_sig,
            "schema_ddl": schema_ddl,
            "partition_by": list(partition_by),
            "merge_schema": merge_schema,
            "streams": streams,
            "files": files,
            **(extra or {}),
        }
        if _write_text_atomic(
            fs, jvm, f"{base}/{_MANIFEST_DIR}",
            f"v{version:010d}.json", json.dumps(manifest),
        ):
            return {
                "version": version,
                "n_files": len(files),
                "operation": mode,
            }
        # another writer claimed this version — rebase and retry
    raise RuntimeError(
        f"snapshot_write: lost {max_commit_attempts} commit races at "
        f"{path!r}"
    )


def _manifest_ddl(m: dict) -> str | None:
    """The writer's exact schema as a DDL string (ordered), or None
    for manifests written before ``schema_ddl`` existed."""
    sd = m.get("schema_ddl")
    if not sd:
        return None
    return ", ".join(f"`{n}` {t}" for n, t in sd)


def _plan_read(spark, base: str, m: dict, files=None) -> DataFrame:
    """Plan a scan of ``files`` (manifest file dicts; default: all of
    ``m``'s). Plans per COMMIT DIRECTORY, not per file: passing N
    explicit paths costs Spark one driver-side stat each (~2 ms/file
    locally, a remote call each on object stores). Commit dirs are
    immutable, so a dir whose visible data files EQUAL the referenced
    set is passed as one path — verified with one (recursive) listing
    per dir, so a hand-planted stray file inside a commit dir still
    falls back to exact file paths and is never read. Planning is
    O(#commits), not O(#files).

    Partitioned tables read per commit dir with ``basePath`` (so the
    ``col=value`` dirs surface as columns) and the manifest's exact
    ordered schema (types never depend on path inference; with
    schema evolution, old files null-fill newer columns), then the
    commits union — plan-level only, no shuffle."""
    fs, jvm = _fs(spark, base)
    Path = jvm.org.apache.hadoop.fs.Path
    if files is None:
        files = m["files"]
    # commit dir -> referenced paths relative to it
    groups: dict[str, set] = {}
    for f in files:
        d, cid, rel = f["path"].split("/", 2)
        groups.setdefault(f"{d}/{cid}", set()).add(rel)

    def visible_rels(full_dir: str) -> set:
        prefix = Path(full_dir).toUri().getPath()
        out = set()
        it = fs.listFiles(Path(full_dir), True)
        while it.hasNext():
            st = it.next()
            rel = st.getPath().toUri().getPath()[len(prefix):]
            rel = rel.lstrip("/")
            if not _hidden_rel(rel):
                out.add(rel)
        return out

    per_dir: dict[str, list] = {}
    for d, rels in groups.items():
        full = f"{base}/{d}"
        if visible_rels(full) == rels:
            per_dir[d] = [full]
        else:
            per_dir[d] = [f"{full}/{r}" for r in sorted(rels)]

    if not m.get("partition_by"):
        paths = [p for ps in per_dir.values() for p in ps]
        reader = spark.read
        if m.get("merge_schema"):
            # schema-evolved version: files span schemas; merge so
            # old files null-fill columns added later
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*paths)

    ddl = _manifest_ddl(m)
    order = [n for n, _t in m["schema_ddl"]]
    out = None
    for d, paths in per_dir.items():
        part_df = (
            spark.read.schema(ddl)
            .option("basePath", f"{base}/{d}")
            .parquet(*paths)
            # Spark surfaces partition columns LAST regardless of the
            # user schema's order — restore the writer's order (a
            # plan-level projection, free)
            .select(*order)
        )
        out = part_df if out is None else out.unionByName(part_df)
    return out


def snapshot_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the dataset at ``path`` as of ``version`` (default: the
    latest). Plans from the manifest's file list — one listing per
    referenced commit directory (to validate dir-grouped planning),
    never a recursive data-tree walk."""
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    seen = _versions(fs, jvm, base)
    if not seen:
        raise ValueError(f"snapshot_read: no versions at {path!r}")
    if version is None:
        version = seen[-1]
    if version not in seen:
        raise ValueError(
            f"snapshot_read: version {version} not in {seen} at {path!r}"
        )
    manifest = _load_manifest(fs, jvm, base, version)
    if not manifest["files"]:
        raise ValueError(
            f"snapshot_read: version {version} is empty at {path!r}"
        )
    return _plan_read(spark, base, manifest)


def snapshot_history(spark: SparkSession, path: str) -> DataFrame:
    """One row per committed version: version, parent, operation,
    n_files, total_bytes, n_rows (NULL when any of the version's
    files lacks a recorded row count — see :func:`snapshot_count`)."""
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    rows = []
    for v in _versions(fs, jvm, base):
        m = _load_manifest(fs, jvm, base, v)
        counts = [f.get("n_rows") for f in m["files"]]
        rows.append(
            (
                m["version"],
                m["parent"],
                m["operation"],
                len(m["files"]),
                sum(f["bytes"] for f in m["files"]),
                sum(counts) if all(c is not None for c in counts)
                else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "version INT, parent INT, operation STRING, n_files INT,"
        " total_bytes LONG, n_rows LONG",
    )


def snapshot_count(
    spark: SparkSession, path: str, version: int | None = None
) -> int:
    """Row count of the given version (default latest) answered from
    the MANIFEST when every referenced file carries a recorded
    ``n_rows`` (written for free by the ``stats_cols=`` scan and by
    :func:`attach_stats` footer reads) — zero tasks, zero file
    opens; the 100 TB ``SELECT count(*)`` that doesn't scan 100 TB.
    Falls back to one real ``count()`` job when any file lacks a
    recorded count (plain writes without stats)."""
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    seen = _versions(fs, jvm, base)
    if not seen:
        raise ValueError(f"snapshot_count: no versions at {path!r}")
    v = seen[-1] if version is None else version
    if v not in seen:
        raise ValueError(
            f"snapshot_count: version {v} not in {seen} at {path!r}"
        )
    m = _load_manifest(fs, jvm, base, v)
    counts = [f.get("n_rows") for f in m["files"]]
    if counts and all(c is not None for c in counts):
        return int(sum(counts))
    if not m["files"]:
        return 0
    return snapshot_read(spark, path, v).count()


def snapshot_partitions(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """One row per partition of the given version (default latest):
    the partition columns (as strings; NULL for the hive default
    partition) plus ``n_files`` and ``total_bytes`` — read from the
    MANIFEST alone. The SHOW PARTITIONS that never lists a
    directory: at 100 TB / 10k partitions this is one small JSON
    read, not 10k object-store LISTs. Raises on an unpartitioned
    table."""
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    seen = _versions(fs, jvm, base)
    if not seen:
        raise ValueError(f"snapshot_partitions: no versions at {path!r}")
    v = seen[-1] if version is None else version
    if v not in seen:
        raise ValueError(
            f"snapshot_partitions: version {v} not in {seen} at {path!r}"
        )
    m = _load_manifest(fs, jvm, base, v)
    pby = list(m.get("partition_by") or ())
    if not pby:
        raise ValueError(
            f"snapshot_partitions: version {v} at {path!r} is not "
            "partitioned"
        )
    agg: dict[tuple, list] = {}
    for f in m["files"]:
        pv = f.get("partition") or {}
        key = tuple(
            None if pv.get(c) is None else str(pv.get(c)) for c in pby
        )
        slot = agg.setdefault(key, [0, 0])
        slot[0] += 1
        slot[1] += f["bytes"]
    rows = [
        (*key, n, b) for key, (n, b) in sorted(
            agg.items(), key=lambda kv: tuple(x or "" for x in kv[0])
        )
    ]
    ddl = ", ".join(f"`{c}` STRING" for c in pby)
    return spark.createDataFrame(
        rows, f"{ddl}, n_files INT, total_bytes LONG"
    )


def _maintenance_subset(
    spark, m: dict, where: str | None, op: str
) -> tuple[list, list]:
    """Split a manifest's files into (subset to rewrite, rest kept
    verbatim) for a partition-scoped maintenance op. ``where`` must
    PROVABLY depend only on partition columns (same machinery as the
    metadata-only delete) — at 100 TB nobody rewrites the whole
    table; maintenance runs per partition range."""
    if where is None:
        return m["files"], []
    verdicts = _pure_partition_verdicts(spark, m, where)
    if verdicts is None:
        raise ValueError(
            f"{op}: where={where!r} must provably depend only on "
            "partition columns (resolvable against them alone, "
            "deterministic, cast-faithful recorded values) — "
            "row-level scoping of a rewrite is not meaningful"
        )
    subset = [f for i, f in enumerate(m["files"]) if verdicts.get(i)]
    rest = [f for i, f in enumerate(m["files"]) if not verdicts.get(i)]
    return subset, rest


def compact_snapshot(
    spark: SparkSession,
    path: str,
    target_mb: int = 256,
    max_replan: int = 0,
    where: str | None = None,
) -> dict:
    """Commit a compacted version: the latest version's rows repacked
    into ``ceil(total_bytes / target_mb)`` files. Rows are untouched;
    the previous version remains readable (time travel) — there is NO
    deletion window at all. No-op when already at the target count.
    The repack is a narrow ``coalesce`` of a manifest-planned scan.

    A partitioned table keeps its partitioning: rows shuffle once on
    the partition columns (so each hive dir is written by one task —
    one file per partition value) and the floor on achievable file
    count is the partition count, which the no-op check honors.

    The commit is CONFLICT-VALIDATED (:func:`_commit_replacing`): a
    concurrent append landing between this function's read of the
    head and its manifest publish raises instead of being silently
    dropped from the compacted version — the same lost-update guard
    merge/delete have (a plain ``snapshot_write(mode="overwrite")``
    would rebase the version NUMBER and re-publish only the
    compactor's own content). A stats-only commit racing in is
    harmless and rebases. ``max_replan`` opts a maintenance job into
    automatic re-planning: on a conflict the compaction re-reads the
    new head and retries up to that many times (each retry compacts
    the CURRENT content, racing appends included); the default 0
    keeps the raise-and-let-the-caller-decide contract.

    ``where`` SCOPES the compaction to the files of matching
    partitions (predicate provably over partition columns only, like
    the metadata-only delete); everything else is referenced
    verbatim — the way maintenance actually runs at 100 TB: compact
    yesterday's partition, not the table.
    """
    import math

    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    for attempt in range(max_replan + 1):
        seen = _versions(fs, jvm, base)
        if not seen:
            raise ValueError(f"compact_snapshot: no versions at {path!r}")
        m = _load_manifest(fs, jvm, base, seen[-1])
        subset, rest = _maintenance_subset(
            spark, m, where, "compact_snapshot"
        )
        total = sum(f["bytes"] for f in subset)
        want = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
        pby = tuple(m.get("partition_by") or ())
        if pby:
            n_parts = len(
                {
                    tuple(sorted((f.get("partition") or {}).items()))
                    for f in subset
                }
            )
            want = max(want, n_parts)
        if len(subset) <= want:
            return {"compacted": False, "n_files": len(m["files"])}
        # plan from the exact manifest the commit will validate
        # against (not "latest again" — a racing append between the
        # two reads must surface as a conflict, not silently join
        # the rewrite)
        df = _plan_read(spark, base, m, subset)
        if pby:
            df = df.repartition(want, *pby)
        else:
            df = df.coalesce(want)
        # stage the repacked files, then publish through the
        # validated commit path (kept: only out-of-scope files) —
        # stats coverage is re-collected so file skipping never
        # degrades across a compaction
        col_types = dict(m.get("schema_ddl") or [])
        commit_id, staged = _stage_commit(
            df, base, fs, jvm, pby, col_types,
            stats_cols=_table_stats_cols(m, pby),
        )
        try:
            res = _commit_replacing(
                spark, path, m, {f["path"] for f in rest}, staged,
                "compact", commit_id=commit_id,
            )
        except RuntimeError:
            if attempt >= max_replan:
                raise
            continue  # conflict: re-plan against the new head
        return {
            "compacted": True,
            "version": res["version"],
            "n_files_before": len(subset),
            "n_files_after": res["n_files_new"],
            "n_files_kept": res["n_files_kept"],
        }


def optimize_snapshot(
    spark: SparkSession,
    path: str,
    zorder_by: tuple,
    target_mb: int = 256,
    stats_cols: tuple | None = None,
    target_files: int | None = None,
    max_replan: int = 0,
    where: str | None = None,
) -> dict:
    """OPTIMIZE for manifest tables: rewrite the latest version
    CLUSTERED by z-order over ``zorder_by`` (multi-column layout —
    per-file [min, max] stays narrow on EVERY participating column),
    re-collect write-time stats for those columns, and commit it all
    as ONE new version (operation ``optimize``). The previous
    version stays readable (time travel; vacuum reclaims later), so
    there is no deletion window — the same pattern as
    :func:`compact_snapshot`, plus clustering, plus stats.

    This is the scan-side 100 TB lever assembled end to end: after
    one optimize, a sargable predicate on ANY z column — through
    :func:`snapshot_scan`, :func:`snapshot_pruned_read`, or the PRQL
    pushdown — plans in O(matching files). Partitioned tables keep
    their partition spec; rows range-partition on
    ``(partition cols, z)`` so each hive directory's files cover
    contiguous z-ranges.

    Cost: one stats pass (``approxQuantile`` over the z columns) +
    one range shuffle + the write — the same stage count as a plain
    compaction rewrite.

    The commit is conflict-validated like :func:`compact_snapshot`'s:
    a concurrent data commit between plan and publish raises (re-run
    on the new head) rather than being silently dropped; ``max_replan``
    opts into automatic re-planning against the new head and
    ``where`` scopes the rewrite to matching partitions' files, both
    exactly as in :func:`compact_snapshot`."""
    import math

    from prql_spark.sources.layout import zorder_expr
    from pyspark.sql import functions as F

    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    for attempt in range(max_replan + 1):
        seen = _versions(fs, jvm, base)
        if not seen:
            raise ValueError(f"optimize_snapshot: no versions at {path!r}")
        m = _load_manifest(fs, jvm, base, seen[-1])
        subset, rest = _maintenance_subset(
            spark, m, where, "optimize_snapshot"
        )
        total = sum(f["bytes"] for f in subset)
        # target_files pins the output file count directly (small
        # tables, tests); otherwise size to target_mb
        want = target_files or max(
            1, math.ceil(total / (target_mb * 1024 * 1024))
        )
        pby = tuple(m.get("partition_by") or ())
        if not subset:
            raise ValueError(
                f"optimize_snapshot: nothing to optimize at {path!r}"
                + (f" under where={where!r}" if where else "")
            )
        # plan from the exact manifest the commit will validate
        # against — a concurrent append between plan and publish
        # raises via _commit_replacing (never silently dropped)
        df = _plan_read(spark, base, m, subset)
        missing = [c for c in zorder_by if c not in df.columns]
        if missing:
            raise ValueError(
                f"optimize_snapshot: zorder_by columns {missing} not in "
                f"table columns {df.columns}"
            )
        z = zorder_expr(df, list(zorder_by))
        keyed = df.withColumn("__z", F.expr(z))
        range_key = [*pby, "__z"]
        out = (
            keyed.repartitionByRange(want, *range_key)
            .sortWithinPartitions(*range_key)
            .drop("__z")
        )
        col_types = dict(m.get("schema_ddl") or [])
        commit_id, staged = _stage_commit(
            out, base, fs, jvm, pby, col_types,
            stats_cols=tuple(stats_cols or zorder_by),
        )
        try:
            res = _commit_replacing(
                spark, path, m, {f["path"] for f in rest}, staged,
                "optimize", commit_id=commit_id,
            )
        except RuntimeError:
            if attempt >= max_replan:
                raise
            continue  # conflict: re-plan against the new head
        return {
            "version": res["version"],
            "operation": "optimize",
            "zorder_by": list(zorder_by),
            "n_files_before": len(subset),
            "n_files_after": res["n_files_new"],
            "n_files_kept": res["n_files_kept"],
        }


def vacuum_snapshot(
    spark: SparkSession,
    path: str,
    keep_versions: int = 2,
    min_age_s: float = 3600.0,
    dry_run: bool = False,
) -> dict:
    """Reclaim space: drop all but the newest ``keep_versions``
    manifests, then delete every data file no retained manifest
    references AND whose modification time is at least ``min_age_s``
    seconds old.

    The age threshold closes a real race: a concurrent
    ``snapshot_write`` STAGES its files before publishing the
    manifest that references them, so "unreferenced" alone also
    describes a commit in flight — deleting those files would let
    the writer publish a manifest pointing at nothing (the same race
    Iceberg's remove-orphan-files guards with an age threshold).
    With the default one-hour grace, vacuum is safe to run alongside
    writers whose stage→commit gap is shorter than the grace window;
    ``min_age_s=0`` restores pure unreferenced-set semantics for
    quiesced tables (and tests). Old behavior otherwise unchanged:
    only files no retained manifest references are ever deleted.
    ``dry_run=True`` deletes NOTHING and reports what a real run
    would reclaim (including the relative paths) — run it before
    the first vacuum of a table you didn't create."""
    import time

    if keep_versions < 1:
        raise ValueError("vacuum_snapshot: keep_versions must be >= 1")
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    Path = jvm.org.apache.hadoop.fs.Path
    seen = _versions(fs, jvm, base)
    keep = seen[-keep_versions:]
    referenced: set[str] = set()
    for v in keep:
        m = _load_manifest(fs, jvm, base, v)
        referenced.update(f["path"] for f in m["files"])
    dropped_files = 0
    skipped_young = 0
    cutoff_ms = (time.time() - min_age_s) * 1000.0
    data_root = Path(f"{base}/{_DATA_DIR}")
    if fs.exists(data_root):
        it = fs.listFiles(data_root, True)
        doomed = []
        while it.hasNext():
            st = it.next()
            full = st.getPath().toUri().getPath()
            rel = full[len(
                Path(base).toUri().getPath()
            ):].lstrip("/")
            # hidden entries (_SUCCESS, .crc) are writer metadata,
            # not data — leave them to their commit directory. The
            # hive NULL-partition dir is NOT hidden (real data).
            if _hidden_rel(rel):
                continue
            if rel not in referenced:
                if st.getModificationTime() > cutoff_ms:
                    skipped_young += 1  # possibly a commit in flight
                    continue
                doomed.append(st.getPath())
        if dry_run:
            return {
                "dry_run": True,
                "dropped_files": len(doomed),
                "skipped_young_files": skipped_young,
                "dropped_manifests": len(
                    [v for v in seen if v not in keep]
                ),
                "kept_versions": keep,
                "would_delete": sorted(
                    p.toUri().getPath()[
                        len(Path(base).toUri().getPath()):
                    ].lstrip("/")
                    for p in doomed
                ),
            }
        for p in doomed:
            fs.delete(p, False)
            dropped_files += 1
        # sweep commit directories holding no data files anymore
        # (only writer metadata like _SUCCESS/.crc — or, for
        # partitioned commits, emptied col=value dirs — remains)
        for st in fs.listStatus(data_root):
            if not st.isDirectory():
                continue
            dir_prefix = st.getPath().toUri().getPath()
            it2 = fs.listFiles(st.getPath(), True)
            empty = True
            while it2.hasNext():
                rel2 = (
                    it2.next().getPath().toUri().getPath()
                )[len(dir_prefix):].lstrip("/")
                if not _hidden_rel(rel2):
                    empty = False
                    break
            if empty:
                fs.delete(st.getPath(), True)
    elif dry_run:
        return {
            "dry_run": True,
            "dropped_files": 0,
            "skipped_young_files": 0,
            "dropped_manifests": len([v for v in seen if v not in keep]),
            "kept_versions": keep,
            "would_delete": [],
        }
    dropped_manifests = 0
    for v in seen:
        if v not in keep:
            fs.delete(
                Path(f"{base}/{_MANIFEST_DIR}/v{v:010d}.json"), False
            )
            dropped_manifests += 1
    return {
        "dropped_files": dropped_files,
        "skipped_young_files": skipped_young,
        "dropped_manifests": dropped_manifests,
        "kept_versions": keep,
    }


def committed_epochs(
    spark: SparkSession, path: str, stream_id: str
) -> set:
    """Epoch ids a streaming sink has already committed to the table
    at ``path`` under ``stream_id``, read from the RETAINED
    manifests. NOTE: after a vacuum trims manifests this set is
    incomplete — :func:`stream_high_water` (which every commit
    carries forward) is the vacuum-safe check the streaming sink
    actually uses; this remains for inspection/debugging."""
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    out = set()
    for v in _versions(fs, jvm, base):
        m = _load_manifest(fs, jvm, base, v)
        if m.get("stream_id") == stream_id and "epoch" in m:
            out.add(m["epoch"])
    return out


def stream_high_water(
    spark: SparkSession, path: str, stream_id: str
) -> int:
    """Highest epoch any commit recorded for ``stream_id`` at
    ``path``, or -1 when none. This is the exactly-once replay check
    that SURVIVES :func:`vacuum_snapshot`: every commit folds its
    parent's per-stream high-water map into its own manifest, so the
    latest manifest alone knows every stream's high water even after
    older manifests (the per-epoch ledger rows) are vacuumed away.
    foreachBatch epochs are monotonic per checkpoint and commit in
    order, so ``epoch <= high_water`` ⇔ already committed. Retained
    per-manifest ``(stream_id, epoch)`` rows are ALSO scanned, which
    covers tables written before the ``streams`` map existed."""
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    hw = -1
    for v in _versions(fs, jvm, base):
        m = _load_manifest(fs, jvm, base, v)
        if m.get("stream_id") == stream_id and "epoch" in m:
            hw = max(hw, int(m["epoch"]))
        s = m.get("streams") or {}
        if stream_id in s:
            hw = max(hw, int(s[stream_id]))
    return hw


def snapshot_changes(
    spark: SparkSession, path: str, since_version: int,
    end_version: int | None = None,
) -> DataFrame:
    """Incremental read: the rows ADDED after ``since_version`` —
    exactly the files referenced by ``end_version``'s manifest
    (default: the latest version AT CALL TIME) but not by
    ``since_version``'s. The training-pipeline primitive for
    incremental processing: score/dedup/decontaminate ONLY the new
    slice (e.g. feed ``dedup.dedup_against`` with the reference
    corpus), never rescanning the 100 TB already processed.

    Callers that BOOKMARK their progress must pass the version they
    will record as ``end_version``: with a live appender on the
    source, "latest" can advance between the caller's own version
    listing and this one, and an unpinned read would include rows
    the bookmark doesn't cover — the next run would process them
    twice (see :func:`~prql_spark.sources.incremental
    .process_increment`, which pins it).

    Only valid across append-only history: if any version in
    ``(since_version, end_version]`` was an overwrite (or a
    compaction, which rewrites files), "added files" no longer means
    "added rows" and this raises instead of silently returning
    rewritten data.
    """
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    seen = _versions(fs, jvm, base)
    if since_version not in seen:
        raise ValueError(
            f"snapshot_changes: version {since_version} not in {seen} "
            f"at {path!r}"
        )
    if end_version is None:
        end_version = seen[-1]
    elif end_version not in seen:
        raise ValueError(
            f"snapshot_changes: end version {end_version} not in "
            f"{seen} at {path!r}"
        )
    if end_version < since_version:
        raise ValueError(
            f"snapshot_changes: end version {end_version} < since "
            f"version {since_version}"
        )
    for v in seen:
        if since_version < v <= end_version:
            op = _load_manifest(fs, jvm, base, v).get("operation")
            # "stats" commits change no files — safe to cross
            if op not in ("append", "stats"):
                raise ValueError(
                    f"snapshot_changes: version {v} is {op!r}, not "
                    "append — added files no longer mean added rows; "
                    "read the full version instead"
                )
    old = {
        f["path"]
        for f in _load_manifest(fs, jvm, base, since_version)["files"]
    }
    em = _load_manifest(fs, jvm, base, end_version)
    new_files = [f for f in em["files"] if f["path"] not in old]
    if not new_files:
        return snapshot_read(spark, path, end_version).limit(0)
    return _plan_read(spark, base, em, new_files)


def _rel_from_uri(uri: str) -> str:
    """``input_file_name()`` URI → manifest-relative path
    (``data/<commit>/...``). The URI percent-encodes raw bytes (a
    literal ``%`` in a hive-escaped dir name arrives as ``%25``), so
    one unquote restores the on-disk name the manifest recorded.
    rsplit: the TABLE's data dir is the last ``/data/`` segment (a
    base path like ``/mnt/data/tbl`` must not split first; nothing
    under the commit dir can contain a raw ``/data/`` — commit ids
    are hex and hive escapes slashes in partition values)."""
    return _DATA_DIR + "/" + unquote(uri.rsplit(f"/{_DATA_DIR}/", 1)[1])


def _table_stats_cols(m: dict, partition_by: tuple) -> tuple | None:
    """The data columns the table's manifest already carries stats
    for — merge/delete re-collect these on the files they rewrite,
    so file-skipping coverage never degrades across row-level
    commits. (Partition columns are excluded: their [v, v] stats are
    re-derived from the staged paths for free.)"""
    cols = sorted(
        {c for f in m["files"] for c in (f.get("stats") or {})}
        - set(partition_by)
    )
    return tuple(cols) or None


_DT_SHAPE = re.compile(r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}")


def _lt_for_prune(a, b) -> bool:
    """``a < b`` strictly enough to justify PRUNING. For plain
    strings where either side is datetime-shaped, the true ordering
    depends on the column's type, which the bound extractor cannot
    see: a timestamp column's stats are isoformat (``T`` separator,
    zero-trimmed fraction handled by :func:`_norm_ts_path`) while a
    query literal is often space-separated (``ts <= '2024-01-01
    23:59:59'``) — raw lexicographic compare would mis-prune
    (``'T' > ' '``); conversely a STRING column holding
    datetime-shaped text really does compare raw. Pruning is only
    sound when BOTH orderings agree, so require both; disagreement
    keeps the file (conservative, never wrong)."""
    if isinstance(a, str) and isinstance(b, str) and (
        _DT_SHAPE.match(a) or _DT_SHAPE.match(b)
    ):
        return a < b and _norm_ts_path(a) < _norm_ts_path(b)
    return a < b


def _overlaps_bounds(f: dict, bounds: dict) -> bool:
    """Can file entry ``f`` contain a row satisfying every bound in
    ``bounds`` (``{col: (lo, hi)}`` or ``{col: [(lo, hi), ...]}``, an
    interval UNION per column)? Conservative: files lacking stats
    for a bounded column are kept, incomparable types keep the file.
    Exact skips: a hive NULL partition on a bounded column (a range
    or equality bound is never TRUE on NULL), and an empty interval
    list (the caller proved the conjunction unsatisfiable)."""
    st = f.get("stats") or {}
    pv = f.get("partition") or {}
    for col, ivs in bounds.items():
        if isinstance(ivs, tuple):
            ivs = [ivs]
        if col in pv and pv[col] is None:
            return False
        if not ivs:
            return False
        rng = st.get(col)
        if rng is None:
            continue  # no stats for this col: keep (safe)
        fmin, fmax = rng

        def hits(lo, hi) -> bool:
            try:
                if lo is not None and _lt_for_prune(fmax, _stats_enc(lo)):
                    return False
                if hi is not None and _lt_for_prune(_stats_enc(hi), fmin):
                    return False
            except TypeError:
                return True  # incomparable: keep (safe)
            return True

        if not any(hits(lo, hi) for lo, hi in ivs):
            return False
    return True


_SQL_TOKEN = re.compile(
    r"(?:"
    r"(?P<str>'(?:[^']|'')*')"
    r"|(?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<op><=|>=|==|!=|<>|=|<|>)"
    r"|(?P<lp>\()|(?P<rp>\))|(?P<comma>,)"
    r"|(?P<word>`[^`]+`|[A-Za-z_][A-Za-z0-9_.]*)"
    r")"
)


def _sql_bounds(predicate: str) -> dict | None:
    """Extract conservative per-column pruning bounds from a Spark
    SQL boolean ``predicate`` string, in :func:`_overlaps_bounds`
    shape — or None when nothing sargable was found.

    Soundness posture (the caller ALWAYS re-applies the exact
    predicate, so pruning only needs a SUPERSET of matching files):
    only top-level AND conjuncts contribute; any conjunct that isn't
    ``col <op> literal`` / ``literal <op> col`` / ``col BETWEEN a
    AND b`` / ``col IN (...)`` is simply SKIPPED (IS NULL, NOT,
    functions, subqueries — skipping a conjunct keeps more files,
    never fewer). A disjunction at any group's top level makes that
    whole group contribute nothing. Strict bounds widen to
    inclusive. TIMESTAMP literals normalize like the partition-path
    parser (space → T, fraction padded) so lexicographic compares
    against isoformat stats stay exact."""
    toks = _tok_sql(predicate)
    if not toks:
        return None
    out: dict = {}
    _bounds_walk(toks, out)
    return out or None


def _tok_sql(s: str) -> list | None:
    toks: list = []
    i, n = 0, len(s)
    while i < n:
        if s[i].isspace():
            i += 1
            continue
        m = _SQL_TOKEN.match(s, i)
        if not m:
            return None  # unknown character: give up (no pruning)
        i = m.end()
        if m.group("str") is not None:
            toks.append(("lit", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("num") is not None:
            t = m.group("num")
            toks.append(
                ("lit", float(t) if "." in t or "e" in t.lower() else int(t))
            )
        elif m.group("op"):
            toks.append(("op", m.group("op")))
        elif m.group("lp"):
            toks.append(("lp", "("))
        elif m.group("rp"):
            toks.append(("rp", ")"))
        elif m.group("comma"):
            toks.append(("comma", ","))
        else:
            toks.append(("word", m.group("word").strip("`")))
    return toks


def _bounds_walk(toks: list, out: dict) -> None:
    def is_kw(t, *names):
        return t[0] == "word" and t[1].upper() in names

    # a top-level OR anywhere: this group proves nothing
    depth = 0
    for t in toks:
        if t[0] == "lp":
            depth += 1
        elif t[0] == "rp":
            depth -= 1
        elif depth == 0 and is_kw(t, "OR"):
            return
    # split on top-level AND (BETWEEN's AND belongs to its atom)
    segs, depth, start, between = [], 0, 0, False
    for idx, t in enumerate(toks):
        if t[0] == "lp":
            depth += 1
        elif t[0] == "rp":
            depth -= 1
        elif depth == 0 and t[0] == "word":
            u = t[1].upper()
            if u == "BETWEEN":
                between = True
            elif u == "AND":
                if between:
                    between = False
                else:
                    segs.append(toks[start:idx])
                    start = idx + 1
    segs.append(toks[start:])
    for seg in segs:
        if not seg:
            continue
        if seg[0][0] == "lp" and seg[-1][0] == "rp" and _wrapped(seg):
            _bounds_walk(seg[1:-1], out)
        else:
            _bounds_atom(seg, out)


def _wrapped(seg: list) -> bool:
    depth = 0
    for idx, t in enumerate(seg):
        if t[0] == "lp":
            depth += 1
        elif t[0] == "rp":
            depth -= 1
            if depth == 0:
                return idx == len(seg) - 1
    return False


def _bounds_lit(seg: list, i: int):
    """Literal at position ``i`` → (value, next_i) or None."""
    if i < len(seg) and seg[i][0] == "lit":
        return seg[i][1], i + 1
    if (
        i + 1 < len(seg)
        and seg[i][0] == "word"
        and seg[i][1].upper() in ("DATE", "TIMESTAMP")
        and seg[i + 1][0] == "lit"
        and isinstance(seg[i + 1][1], str)
    ):
        v = seg[i + 1][1]
        if seg[i][1].upper() == "TIMESTAMP":
            v = _norm_ts_path(v)
        return v, i + 2
    if i < len(seg) and seg[i][0] == "word":
        u = seg[i][1].upper()
        if u in ("TRUE", "FALSE"):
            return u == "TRUE", i + 1
    return None


_REV_OP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "=", "==": "=="}


def _bounds_atom(seg: list, out: dict) -> None:
    def add_iv(col, lo, hi):
        cur = out.get(col)
        if cur is None:
            out[col] = (lo, hi)
            return
        if isinstance(cur, list):
            return  # an IN already bound this col; extra is skipped (safe)
        clo, chi = cur
        try:
            if lo is not None:
                clo = lo if clo is None else max(clo, lo)
            if hi is not None:
                chi = hi if chi is None else min(chi, hi)
        except TypeError:
            return  # incomparable intersection: keep the old (safe)
        out[col] = (clo, chi)

    def add_op(col, op, v):
        if op in ("=", "=="):
            add_iv(col, v, v)
        elif op in ("<", "<="):
            add_iv(col, None, v)  # strict widens to inclusive (safe)
        elif op in (">", ">="):
            add_iv(col, v, None)
        # != / <> prove nothing for interval pruning: skip

    n = len(seg)
    if n >= 3 and seg[0][0] == "word":
        col = seg[0][1]
        if seg[1][0] == "op":
            lit = _bounds_lit(seg, 2)
            if lit and lit[1] == n:
                add_op(col, seg[1][1], lit[0])
            return
        if seg[1][0] == "word":
            u = seg[1][1].upper()
            if u == "BETWEEN":
                l1 = _bounds_lit(seg, 2)
                if l1:
                    j = l1[1]
                    if (
                        j < n
                        and seg[j][0] == "word"
                        and seg[j][1].upper() == "AND"
                    ):
                        l2 = _bounds_lit(seg, j + 1)
                        if l2 and l2[1] == n:
                            add_iv(col, l1[0], l2[0])
                return
            if u == "IN" and n >= 5 and seg[2][0] == "lp" and seg[-1][0] == "rp":
                vals, j = [], 3
                while j < n - 1:
                    lit = _bounds_lit(seg, j)
                    if not lit:
                        return
                    vals.append(lit[0])
                    j = lit[1]
                    if j < n - 1:
                        if seg[j][0] != "comma":
                            return
                        j += 1
                if vals and col not in out:
                    out[col] = [(v, v) for v in vals]
                return
    # literal <op> col (reversed)
    lit = _bounds_lit(seg, 0)
    if (
        lit
        and lit[1] == n - 2
        and seg[lit[1]][0] == "op"
        and seg[n - 1][0] == "word"
    ):
        op = _REV_OP.get(seg[lit[1]][1])
        if op:
            add_op(seg[n - 1][1], op, lit[0])
    # anything else: unknown conjunct — contribute nothing (safe)


def _commit_replacing(
    spark,
    path: str,
    planned: dict,
    keep_paths: set,
    staged: list,
    operation: str,
    commit_id: str | None = None,
    schema_sig: list | None = None,
    schema_ddl: list | None = None,
    merge_schema: bool | None = None,
) -> dict:
    """Publish a manifest whose file list is ``planned``'s files
    minus the replaced ones (``keep_paths`` survivors) plus
    ``staged`` — the conflict-validated commit primitive under every
    rewrite: :func:`merge_snapshot` / :func:`delete_snapshot`
    (copy-on-write) and :func:`compact_snapshot` /
    :func:`optimize_snapshot` (full rewrite, ``keep_paths`` empty).
    If another writer committed since ``planned`` was read, the
    commit retries ONLY when the head still references exactly the
    same data files (e.g. a ``stats`` commit landed — kept entries
    are then taken from the head so fresher stats survive); any real
    data change raises, because the rewrite was planned against
    files that are no longer the table — the caller must re-run on
    the new head (same validation posture as Iceberg's conflict
    detection). A concurrent APPEND therefore can never be silently
    dropped by a maintenance rewrite.

    The manifest is rebuilt from the head's STRUCTURAL keys only
    (schema, partitioning, merge flag, stream high-water map) —
    never a blind spread — so ``commit`` identifies the directory
    this version's new files actually live in (``commit_id`` from
    :func:`_stage_commit`) and a parent's one-shot extras (e.g. a
    streaming append's ``stream_id``/``epoch``) don't leak into an
    unrelated rewrite's manifest."""
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    planned_paths = [f["path"] for f in planned["files"]]
    for _ in range(20):
        seen = _versions(fs, jvm, base)
        head = seen[-1]
        hm = (
            planned
            if head == planned["version"]
            else _load_manifest(fs, jvm, base, head)
        )
        if [f["path"] for f in hm["files"]] != planned_paths:
            raise RuntimeError(
                f"{operation}_snapshot: concurrent commit changed "
                f"{path!r} (planned against v{planned['version']}, "
                f"head v{head} references different files) — re-run "
                "against the new head"
            )
        kept = [f for f in hm["files"] if f["path"] in keep_paths]
        manifest = {
            "version": head + 1,
            "parent": head,
            "operation": operation,
            "commit": commit_id or hm.get("commit"),
            # schema overrides serve merge's opt-in evolution: the
            # published version's schema is the SOURCE's superset and
            # reads merge-fill the untouched files' missing columns
            "schema": schema_sig if schema_sig is not None
            else hm.get("schema"),
            "schema_ddl": schema_ddl if schema_ddl is not None
            else hm.get("schema_ddl"),
            "partition_by": hm.get("partition_by") or [],
            "merge_schema": bool(hm.get("merge_schema"))
            if merge_schema is None else bool(merge_schema),
            "streams": hm.get("streams") or {},
            "files": kept + staged,
        }
        if _write_text_atomic(
            fs, jvm, f"{base}/{_MANIFEST_DIR}",
            f"v{head + 1:010d}.json", json.dumps(manifest),
        ):
            return {
                "version": head + 1,
                "operation": operation,
                "n_files_rewritten": len(planned_paths)
                - len(keep_paths),
                "n_files_kept": len(kept),
                "n_files_new": len(staged),
            }
    raise RuntimeError(f"{operation}_snapshot: lost commit races at {path!r}")


def merge_snapshot(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    on: tuple,
    broadcast_key_limit: int = 2_000_000,
    allow_new_columns: bool = False,
) -> dict:
    """Row-level UPSERT into a manifest table, copy-on-write: rows of
    ``source`` REPLACE target rows with the same ``on`` key; source
    rows with no match insert. Only the files that actually contain a
    matched key are rewritten — untouched files are referenced
    verbatim in the new manifest, so merging 1 GB of updates into a
    100 TB table moves (touched files + 1 GB), never the table.

    Touched-file discovery is two-stage, both scale levers explicit:

    1. **Stats prune (no data read).** The source keys' [min, max]
       (one tiny agg) are compared against each file's manifest
       stats — on a table written with ``stats_cols=`` (or
       partitioned by) the key columns, only overlapping files go to
       stage 2. Files without key stats are always candidates (safe).
    2. **Exact probe (candidates only).** One semi-join of the
       candidate files against the distinct source keys, grouped by
       ``input_file_name`` — returns at most one row per file.

    Whole-row replace semantics: the source schema must equal the
    table schema; duplicate keys WITHIN the source all land (the
    matched target row is removed once). Schema EVOLUTION is opt-in
    like append's: ``allow_new_columns=True`` accepts a source whose
    schema is a SUPERSET of the table's (add columns; never drop or
    retype) — the new version's schema becomes the source's,
    survivors and untouched files null-fill the added columns at
    read (the version is flagged ``merge_schema``). Time travel
    keeps the pre-merge version readable; ``snapshot_changes``
    refuses to cross a merge (rewritten files ≠ added rows). A
    concurrent data commit between plan and publish raises (see
    :func:`_commit_replacing`); re-run on the new head.

    The distinct source keys are broadcast to both probe joins only
    while they stay under ``broadcast_key_limit`` (default 2M keys —
    comfortably driver-safe); a bulk backfill with more distinct
    keys drops the hint and lets Spark/AQE pick the join strategy
    instead of OOMing a forced broadcast."""
    from pyspark.sql import functions as F

    on = tuple(on)
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    seen = _versions(fs, jvm, base)
    if not seen:
        raise ValueError(f"merge_snapshot: no versions at {path!r}")
    m = _load_manifest(fs, jvm, base, seen[-1])
    src_sig = sorted(
        (f.name, f.dataType.simpleString()) for f in source.schema.fields
    )
    tbl_sig = [tuple(p) for p in m.get("schema", [])]
    evolve = False
    if tbl_sig and src_sig != tbl_sig:
        superset = allow_new_columns and set(tbl_sig) < set(src_sig)
        if not superset:
            raise ValueError(
                f"merge_snapshot: source schema {src_sig} != table "
                f"schema {tbl_sig} — merge is whole-row replace; "
                "align the source first (adding columns needs "
                "allow_new_columns=True)"
            )
        evolve = True
    missing = [c for c in on if c not in source.columns]
    if missing:
        raise ValueError(
            f"merge_snapshot: key columns {missing} not in source"
        )

    # stage 1: prune candidates by manifest stats vs source key range.
    # The bounds agg, the key-count (broadcast gate) and the two probe
    # joins all consume the same distinct key set, so it is computed
    # ONCE here: one job returns min/max/count over the persisted
    # keys (min/max over distinct keys == min/max over the source —
    # one fewer full source scan than a separate source-side agg).
    keys = source.select(*on).dropDuplicates().persist()
    krow = keys.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.min(c).alias(f"mn_{c}") for c in on],
        *[F.max(c).alias(f"mx_{c}") for c in on],
    ).collect()[0]
    n_keys = krow["__n"]
    bounds = {
        c: (krow[f"mn_{c}"], krow[f"mx_{c}"])
        for c in on
        if krow[f"mn_{c}"] is not None
    }

    def overlaps(f) -> bool:
        st = f.get("stats") or {}
        pv = f.get("partition") or {}
        for c, (lo, hi) in bounds.items():
            # NULL keys never equi-join: a hive NULL partition on a
            # key column cannot contain a matchable row — exact skip
            if c in pv and pv[c] is None:
                return False
            rng = st.get(c)
            if rng is None:
                continue
            try:
                if rng[0] > _stats_enc(hi) or rng[1] < _stats_enc(lo):
                    return False
            except TypeError:
                continue
        return True

    candidates = [f for f in m["files"] if overlaps(f)]

    # stage 2: exact touched set — semi-join candidates vs keys,
    # one output row per file. Broadcast the keys only when they are
    # actually small: the designed shape is "1 GB of updates into
    # 100 TB", but a bulk backfill (10^8+ distinct keys) would OOM a
    # forced broadcast — above the cap, drop the hint and let
    # Spark/AQE pick the join strategy (shuffle join degrades
    # gracefully; the semantics are identical)
    hint = F.broadcast if n_keys <= broadcast_key_limit else (lambda d: d)
    touched: set = set()
    if candidates:
        probe = (
            _plan_read(spark, base, m, candidates)
            .withColumn("__file", F.input_file_name())
            .join(hint(keys), list(on), "left_semi")
            .select("__file")
            .distinct()
            .collect()
        )
        touched = {_rel_from_uri(r["__file"]) for r in probe}

    partition_by = tuple(m.get("partition_by") or ())
    src_ddl = [
        (f.name, f.dataType.simpleString()) for f in source.schema.fields
    ]
    col_types = dict(src_ddl if evolve else (m.get("schema_ddl") or []))
    if touched:
        touched_entries = [f for f in m["files"] if f["path"] in touched]
        survivors = _plan_read(spark, base, m, touched_entries).join(
            hint(keys), list(on), "left_anti"
        )
        if evolve:
            # survivors (old schema) null-fill the source's added
            # columns; the rewritten files carry the full new schema
            new_data = survivors.unionByName(
                source, allowMissingColumns=True
            ).select(*source.columns)
        else:
            new_data = survivors.unionByName(
                source.select(*survivors.columns)
            )
    else:
        new_data = source
    try:
        commit_id, staged = _stage_commit(
            new_data, base, fs, jvm, partition_by, col_types,
            stats_cols=_table_stats_cols(m, partition_by),
        )
    finally:
        keys.unpersist()
    keep = {f["path"] for f in m["files"]} - touched
    return _commit_replacing(
        spark, path, m, keep, staged, "merge", commit_id=commit_id,
        schema_sig=src_sig if evolve else None,
        schema_ddl=src_ddl if evolve else None,
        merge_schema=True if evolve else None,
    )


def _pure_partition_verdicts(
    spark, m: dict, predicate: str
) -> dict | None:
    """Per-file True/False verdict of ``predicate`` evaluated on the
    file's PARTITION VALUES alone — or None whenever the fast path
    cannot be PROVEN sound: unpartitioned table, predicate resolves
    without referencing any real column (literal/rand()-only —
    row-level semantics must hold), predicate references data
    columns, predicate is non-deterministic, a file lacks recorded
    partition values, or a stored partition value fails to cast back
    to the column's type (the verdict would silently become NULL).
    When a dict IS returned, each file's rows ALL share its partition
    values, so the verdict decides every row of the file at once."""
    from pyspark.sql import functions as F

    pby = tuple(m.get("partition_by") or ())
    if not pby:
        return None
    col_types = dict(m.get("schema_ddl") or [])
    try:
        # resolves against a decoy schema ⇒ references no real column
        spark.createDataFrame([(1,)], "`__prql_decoy` INT").select(
            F.expr(predicate)
        )
        return None
    except Exception:
        pass  # good: the predicate references actual columns
    # one verdict per DISTINCT partition tuple (≤ #files), evaluated
    # over a VALUES inline table — a LocalRelation, so the collect
    # launches ZERO jobs (createDataFrame would parallelize an RDD
    # and cost one)
    by_tuple: dict = {}
    file_tuple: list = []
    for f in m["files"]:
        pv = f.get("partition")
        if pv is None or set(pv) < set(pby):
            return None  # no recorded values: cannot prove anything
        key = tuple(pv.get(c) for c in pby)
        by_tuple.setdefault(key, len(by_tuple))
        file_tuple.append(key)
    if not by_tuple:
        return {}

    def lit(v):
        if v is None:
            return "CAST(NULL AS STRING)"
        return "'" + str(v).replace("'", "''") + "'"

    values = ",".join(
        f"({j},{','.join(lit(v) for v in key)})"
        for key, j in by_tuple.items()
    )
    names = ", ".join(f"`{c}`" for c in pby)
    casts = ", ".join(
        f"CAST(`{c}` AS {col_types.get(c, 'string')}) AS `{c}`"
        for c in pby
    )
    nulls = ", ".join(
        f"(`{c}` IS NULL) AS `__n_{c}`" for c in pby
    )
    q = (
        f"SELECT `__j`, ({predicate}) AS `__m`, {nulls} FROM ("
        f"SELECT `__j`, {casts} FROM VALUES {values} "
        f"AS t(`__j`, {names}))"
    )
    try:
        evald = spark.sql(q)
        exprs = evald._jdf.queryExecution().analyzed().expressions()
        for j in range(exprs.size()):
            if not exprs.apply(j).deterministic():
                return None  # rand()-style: each row must decide
        got = evald.collect()
    except Exception:
        return None  # references data columns / malformed: row-level
    raw_by_j = {j: key for key, j in by_tuple.items()}
    verdict_by_j: dict = {}
    for r in got:
        key = raw_by_j[r["__j"]]
        for ci, c in enumerate(pby):
            # a non-NULL stored value that casts to NULL would turn
            # the verdict into a silent "keep" — bail to row-level
            if r[f"__n_{c}"] and key[ci] is not None:
                return None
        verdict_by_j[r["__j"]] = r["__m"] is True
    return {
        i: verdict_by_j[by_tuple[key]]
        for i, key in enumerate(file_tuple)
    }


def delete_snapshot(
    spark: SparkSession, path: str, predicate: str
) -> dict:
    """Row-level DELETE from a manifest table, copy-on-write: files
    containing at least one row matching ``predicate`` (a Spark SQL
    boolean expression) are rewritten without those rows; every
    other file is referenced verbatim in the new manifest.

    **Partition fast path (transactional DROP PARTITION):** when the
    predicate provably depends ONLY on partition columns (it
    resolves against a frame holding just those columns, is
    deterministic, and every file carries cast-faithful partition
    values — :func:`_pure_partition_verdicts`), each file's verdict
    is constant across its rows, so matching files are DROPPED from
    the manifest and the rest referenced verbatim — ZERO Spark
    tasks, no data file opened, one manifest write. The 100 TB
    retention delete (``ds < '2024-01-01'``) is pure metadata.
    Anything not provable falls through to the row-level path:

    Touched discovery is two-stage, like :func:`merge_snapshot`'s:

    1. **Stats prune (no data read).** When the predicate is
       sargable (:func:`_sql_bounds` — AND-conjuncts of ``col <op>
       literal`` / BETWEEN / IN), each conjunct's bounds are compared
       against the manifest's per-file stats and partition values —
       on a stats-covered table a delete of one key range plans
       tasks over the overlapping files only, not all of them. Files
       without stats, and non-sargable predicates, keep every file
       as a candidate (safe — the exact predicate decides below).
    2. **Exact probe (candidates only).** One filtered scan grouped
       by ``input_file_name`` (parquet row-group stats make the
       non-matching candidates cheap).

    Time travel keeps the pre-delete version readable — GDPR-style
    erasure is complete only after :func:`vacuum_snapshot` reclaims
    the old files."""
    from pyspark.sql import functions as F

    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    seen = _versions(fs, jvm, base)
    if not seen:
        raise ValueError(f"delete_snapshot: no versions at {path!r}")
    m = _load_manifest(fs, jvm, base, seen[-1])
    verdicts = _pure_partition_verdicts(spark, m, predicate)
    if verdicts is not None:
        doomed = {
            f["path"]
            for i, f in enumerate(m["files"])
            if verdicts.get(i)
        }
        if not doomed:
            return {
                "version": m["version"],
                "operation": "delete",
                "n_files_rewritten": 0,
                "n_files_kept": len(m["files"]),
                "n_files_new": 0,
                "n_candidates": 0,
                "partition_only": True,
                "noop": True,
            }
        keep = {f["path"] for f in m["files"]} - doomed
        res = _commit_replacing(spark, path, m, keep, [], "delete")
        res["n_candidates"] = 0
        res["partition_only"] = True
        return res
    bounds = _sql_bounds(predicate)
    candidates = (
        [f for f in m["files"] if _overlaps_bounds(f, bounds)]
        if bounds
        else m["files"]
    )
    touched: set = set()
    if candidates:
        probe = (
            _plan_read(spark, base, m, candidates)
            .where(predicate)
            .select(F.input_file_name().alias("__file"))
            .distinct()
            .collect()
        )
        touched = {_rel_from_uri(r["__file"]) for r in probe}
    if not touched:
        return {
            "version": m["version"],
            "operation": "delete",
            "n_files_rewritten": 0,
            "n_files_kept": len(m["files"]),
            "n_files_new": 0,
            "n_candidates": len(candidates),
            "noop": True,
        }
    partition_by = tuple(m.get("partition_by") or ())
    col_types = dict(m.get("schema_ddl") or [])
    touched_entries = [f for f in m["files"] if f["path"] in touched]
    survivors = _plan_read(spark, base, m, touched_entries).where(
        f"NOT ({predicate}) OR ({predicate}) IS NULL"
    )
    commit_id, staged = _stage_commit(
        survivors, base, fs, jvm, partition_by, col_types,
        stats_cols=_table_stats_cols(m, partition_by),
    )
    keep = {f["path"] for f in m["files"]} - touched
    res = _commit_replacing(
        spark, path, m, keep, staged, "delete", commit_id=commit_id
    )
    res["n_candidates"] = len(candidates)
    return res


def _file_stats(local_path: str, cols: tuple) -> dict | None:
    """Per-column [min, max] from one parquet footer (driver-side,
    metadata only — no data pages read). JSON-serializable values
    (timestamps/dates → ISO strings). None when the footer lacks
    statistics."""
    import pyarrow.parquet as pq

    try:
        meta = pq.read_metadata(local_path)
    except Exception:
        return None
    return _stats_from_footer_meta(meta, cols)


def _stats_from_footer_meta(meta, cols: tuple) -> dict | None:
    """Bounded per-column [min, max] from a pyarrow FileMetaData —
    the shared core of the driver-side (:func:`_file_stats`) and
    executor-side (:func:`_staged_stats_footers`) footer readers.
    None when any requested column lacks usable statistics."""
    out: dict = {}
    want = set(cols)
    for rg in range(meta.num_row_groups):
        g = meta.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            if name not in want:
                continue
            st = c.statistics
            if st is None or not st.has_min_max:
                return None  # stats unusable for pruning this file
            lo, hi = st.min, st.max
            if name in out:
                lo = min(lo, out[name][0])
                hi = max(hi, out[name][1])
            out[name] = [lo, hi]
    if set(out) != want:
        return None

    def enc(v):
        if hasattr(v, "isoformat"):
            # tz-AWARE datetimes (TIMESTAMP_MICROS/MILLIS footers with
            # isAdjustedToUTC) are UNUSABLE here: every other stats
            # producer/consumer (_staged_stats via Spark collect,
            # _norm_ts_path, snapshot_scan's query-bound encoding)
            # compares NAIVE isoformat strings, and a '+00:00' suffix
            # sorts GREATER than any naive bound with the same prefix
            # — a file whose min equals the query hi bound would be
            # wrongly pruned, and a non-UTC session timezone shifts
            # the wall-clock value itself. Converting correctly needs
            # the Spark session timezone, which this driver-side
            # helper does not know — so signal "no usable stats" and
            # let the exact distributed scan (or no-stats = always
            # read) handle the file. Naive values (DATE,
            # TIMESTAMP_NTZ, unadjusted footers) keep the fast path.
            if getattr(v, "tzinfo", None) is not None:
                return None
            return v.isoformat()
        if isinstance(v, bytes):
            return v.decode("utf-8", "replace")
        return v

    bounded = {}
    for k, (lo, hi) in out.items():
        lo_e, hi_e = enc(lo), enc(hi)
        if lo_e is None or hi_e is None:
            return None  # tz-aware bound: stats unusable for pruning
        rng = _bound_stat(lo_e, hi_e)
        if rng is not None:
            bounded[k] = rng
    return bounded or None


def attach_stats(
    spark: SparkSession, path: str, cols: tuple, version: int | None = None
) -> dict:
    """Collect per-file [min, max] footer stats for ``cols`` on the
    given version's files and commit them as a new manifest version
    (operation ``stats``). The commit always REBASES onto the
    current head: its file list is the head's file list (stats
    merged in by path), so `snapshot_changes` crosses it safely,
    time travel still reads identical content, and a commit that
    raced in between is never rolled back — its files stay in the
    table (they just carry no stats until re-attached).

    Stats power :func:`snapshot_scan`'s driver-side file skipping.
    Collection is footer-only (no data pages); local-filesystem
    paths are read directly via pyarrow — on remote stores use
    ``snapshot_write(stats_cols=...)`` instead, which collects exact
    stats executor-side at write time on any filesystem. Combine
    with the z-order writer: clustered layout → tight per-file
    ranges → most files skip.
    """
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    seen = _versions(fs, jvm, base)
    if not seen:
        raise ValueError(f"attach_stats: no versions at {path!r}")
    v = seen[-1] if version is None else version
    m = _load_manifest(fs, jvm, base, v)
    scheme = jvm.org.apache.hadoop.fs.Path(base).toUri().getScheme()
    if scheme not in (None, "file"):
        raise ValueError(
            f"attach_stats: footer reads need a local path, got "
            f"scheme {scheme!r} — collect stats from a staging copy"
        )
    local_base = jvm.org.apache.hadoop.fs.Path(base).toUri().getPath()
    stats_by_path: dict[str, dict] = {}
    nrows_by_path: dict[str, int] = {}
    for f in m["files"]:
        st = _file_stats(f"{local_base}/{f['path']}", cols)
        if st is not None:
            stats_by_path[f["path"]] = st
        try:
            import pyarrow.parquet as pq

            nrows_by_path[f["path"]] = pq.read_metadata(
                f"{local_base}/{f['path']}"
            ).num_rows
        except Exception:
            pass
    # Publish on top of the CURRENT head, never on version v's file
    # list: a concurrent commit (or an explicit older ``version=``)
    # means v's list is stale, and re-publishing it would silently
    # drop the newer commit's files from the table head (an
    # unintended rollback). Stats are keyed by file path, so they
    # attach to whatever subset of v's files the head still
    # references; files the head added since v simply carry no
    # stats (scans read them — safe).
    for _ in range(20):
        seen = _versions(fs, jvm, base)
        head = seen[-1]
        hm = m if head == v else _load_manifest(fs, jvm, base, head)
        n_ok = 0
        files = []
        for f in hm["files"]:
            nf = dict(f)
            st = stats_by_path.get(f["path"])
            if st is not None:
                nf["stats"] = {**nf.get("stats", {}), **st}
                n_ok += 1
            nr = nrows_by_path.get(f["path"])
            if nr is not None:
                nf["n_rows"] = nr
            files.append(nf)
        manifest = {
            **hm,
            "files": files,
            "operation": "stats",
            "parent": head,
            "version": head + 1,
        }
        if _write_text_atomic(
            fs, jvm, f"{base}/{_MANIFEST_DIR}",
            f"v{head + 1:010d}.json", json.dumps(manifest),
        ):
            return {"version": head + 1, "files_with_stats": n_ok,
                    "n_files": len(files)}
    raise RuntimeError(f"attach_stats: lost commit races at {path!r}")


def snapshot_scan(
    spark: SparkSession,
    path: str,
    col: str,
    lo=None,
    hi=None,
    version: int | None = None,
) -> DataFrame:
    """Read ``col BETWEEN lo AND hi`` (either bound optional) off a
    manifest table, SKIPPING every file whose manifest [min, max]
    range cannot overlap — the driver never opens skipped files'
    footers, let alone their data. Files without stats are always
    read (safe), and the real predicate is still applied, so the
    result is exact regardless of stats coverage.

    This is the scan-side 100 TB lever for snapshot tables: after a
    z-ordered (or sorted) write + :func:`attach_stats`, a selective
    range predicate plans in O(#files-matching) instead of scanning
    the table — the same file-skipping contract Iceberg/Delta get
    from their manifest stats.
    """
    from pyspark.sql import functions as F

    if lo is None and hi is None:
        raise ValueError("snapshot_scan: need lo and/or hi")
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    seen = _versions(fs, jvm, base)
    if not seen:
        raise ValueError(f"snapshot_scan: no versions at {path!r}")
    v = seen[-1] if version is None else version
    m = _load_manifest(fs, jvm, base, v)

    def enc(x):
        return x.isoformat() if hasattr(x, "isoformat") else x

    lo_e, hi_e = enc(lo), enc(hi)
    keep = []
    for f in m["files"]:
        # a hive NULL partition holds ONLY NULLs for its column — no
        # row can satisfy a range bound (SQL: NULL >= x is never
        # TRUE), so the skip is exact, not just conservative
        pv = f.get("partition") or {}
        if col in pv and pv[col] is None:
            continue
        rng = (f.get("stats") or {}).get(col)
        if rng is not None:
            fmin, fmax = rng
            if lo_e is not None and fmax < lo_e:
                continue
            if hi_e is not None and fmin > hi_e:
                continue
        keep.append(f)
    if not keep:
        return snapshot_read(spark, path, v).limit(0).where(F.lit(False))
    df = _plan_read(spark, base, m, keep)
    c = F.col(col)
    if lo is not None:
        df = df.where(c >= F.lit(lo))
    if hi is not None:
        df = df.where(c <= F.lit(hi))
    return df


def snapshot_pruned_read(
    spark: SparkSession,
    path: str,
    bounds: dict,
    version: int | None = None,
):
    """File-skipping read for PREDICATE PUSHDOWN callers (the PRQL
    catalog): keep only files whose manifest [min, max] ranges can
    overlap EVERY bound in ``bounds`` — ``{col: (lo, hi)}`` or
    ``{col: [(lo, hi), ...]}`` (a UNION of intervals, e.g. the
    multi-partition ``ds == a or ds == b`` query; a file survives a
    column's bound when it overlaps ANY of its intervals, and an
    EMPTY interval list — a provably unsatisfiable conjunction —
    prunes every file). Unlike :func:`snapshot_scan` the predicate
    is NOT applied here — the caller re-applies its exact original
    filter on top, so pruning only has to be CONSERVATIVE: files
    lacking stats for a bounded column are kept, and any comparison
    that fails (type mismatch between a literal and the stored
    stats) keeps the file. Returns ``(df, n_kept, n_total)`` so the
    caller can decide whether pruning was worth re-planning."""
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    seen = _versions(fs, jvm, base)
    if not seen:
        raise ValueError(f"snapshot_pruned_read: no versions at {path!r}")
    v = seen[-1] if version is None else version
    if v not in seen:
        raise ValueError(
            f"snapshot_pruned_read: version {v} not in {seen} at {path!r}"
        )
    m = _load_manifest(fs, jvm, base, v)
    keep = [f for f in m["files"] if _overlaps_bounds(f, bounds)]
    n_total = len(m["files"])
    if not keep:
        return snapshot_read(spark, path, v).limit(0), 0, n_total
    return _plan_read(spark, base, m, keep), len(keep), n_total


def snapshot_restore(
    spark: SparkSession, path: str, version: int
) -> dict:
    """Roll the table back: commit ``version``'s exact file list as
    the NEW latest version (operation ``restore``). Nothing is
    copied or deleted — one manifest write undoes a bad commit, and
    the bad version stays inspectable until vacuumed. The
    manifest-table answer to "the 3 am backfill wrote garbage"."""
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    seen = _versions(fs, jvm, base)
    if version not in seen:
        raise ValueError(
            f"snapshot_restore: version {version} not in {seen} at "
            f"{path!r}"
        )
    m = _load_manifest(fs, jvm, base, version)
    for _ in range(20):
        latest = _versions(fs, jvm, base)[-1]
        # restore rolls back DATA, never the exactly-once ledger: the
        # head's per-stream high-water map is merged forward (max per
        # stream), else a replayed epoch would re-append post-restore
        lm = _load_manifest(fs, jvm, base, latest)
        streams = dict(m.get("streams") or {})
        for sid, ep in (lm.get("streams") or {}).items():
            streams[sid] = max(int(ep), streams.get(sid, -1))
        manifest = {
            **m,
            "version": latest + 1,
            "parent": latest,
            "operation": "restore",
            "restored_from": version,
            "streams": streams,
        }
        if _write_text_atomic(
            fs, jvm, f"{base}/{_MANIFEST_DIR}",
            f"v{latest + 1:010d}.json", json.dumps(manifest),
        ):
            return {
                "version": latest + 1,
                "restored_from": version,
                "n_files": len(m["files"]),
            }
    raise RuntimeError(f"snapshot_restore: lost commit races at {path!r}")


def snapshot_describe(
    spark: SparkSession, path: str, version: int | None = None
) -> dict:
    """Metadata-only table summary (the DESCRIBE EXTENDED of
    manifest tables — one JSON read, zero Spark jobs): version,
    operation, schema, partitioning, file/byte/row totals, the
    per-stream exactly-once high-water map, and per-column STATS
    COVERAGE — how many files carry [min, max] for each column plus
    the global bounds — so an operator can see at a glance whether a
    predicate on a column will actually skip files before relying on
    it at 100 TB."""
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    seen = _versions(fs, jvm, base)
    if not seen:
        raise ValueError(f"snapshot_describe: no versions at {path!r}")
    v = seen[-1] if version is None else version
    if v not in seen:
        raise ValueError(
            f"snapshot_describe: version {v} not in {seen} at {path!r}"
        )
    m = _load_manifest(fs, jvm, base, v)
    counts = [f.get("n_rows") for f in m["files"]]
    cov: dict = {}
    for f in m["files"]:
        for c, (lo, hi) in (f.get("stats") or {}).items():
            slot = cov.setdefault(
                c, {"files_with_stats": 0, "min": lo, "max": hi}
            )
            slot["files_with_stats"] += 1
            try:
                if lo < slot["min"]:
                    slot["min"] = lo
                if hi > slot["max"]:
                    slot["max"] = hi
            except TypeError:
                pass  # mixed types across files: keep first-seen bounds
    return {
        "version": v,
        "versions_retained": seen,
        "operation": m.get("operation"),
        "parent": m.get("parent"),
        "schema": [list(p) for p in (m.get("schema_ddl") or [])],
        "partition_by": list(m.get("partition_by") or ()),
        "merge_schema": bool(m.get("merge_schema")),
        "n_files": len(m["files"]),
        "total_bytes": sum(f["bytes"] for f in m["files"]),
        "n_rows": sum(counts)
        if counts and all(c is not None for c in counts)
        else None,
        "streams": dict(m.get("streams") or {}),
        "stats_coverage": cov,
    }


def validate_snapshot(spark: SparkSession, path: str) -> dict:
    """Integrity check (fsck) for a manifest table: every file the
    LATEST manifest references must exist with its recorded size,
    the version chain must be gapless back to the oldest retained
    manifest, and every parent pointer must match. Returns a report
    dict with ``ok`` plus the specific violations — run it before
    trusting a table handed over from another system, after a
    manual copy/restore, or on a vacuum schedule. Driver-side
    metadata only; no Spark job."""
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    Path = jvm.org.apache.hadoop.fs.Path
    seen = _versions(fs, jvm, base)
    report: dict = {
        "ok": True,
        "versions": seen,
        "missing_files": [],
        "size_mismatches": [],
        "version_gaps": [],
        "bad_parents": [],
    }
    if not seen:
        report["ok"] = False
        report["version_gaps"] = ["no versions"]
        return report
    for a, b in zip(seen, seen[1:]):
        if b != a + 1:
            report["version_gaps"].append(f"{a} -> {b}")
    prev = None
    for v in seen:
        m = _load_manifest(fs, jvm, base, v)
        if prev is not None and m.get("parent") not in (prev, None):
            # a parent pointing below the retained range is fine
            # only when that version was vacuumed away
            if m.get("parent") > prev:
                report["bad_parents"].append(
                    f"v{v} parent {m.get('parent')} != {prev}"
                )
        prev = v
    latest = _load_manifest(fs, jvm, base, seen[-1])
    for f in latest["files"]:
        p = Path(f"{base}/{f['path']}")
        if not fs.exists(p):
            report["missing_files"].append(f["path"])
        elif fs.getFileStatus(p).getLen() != f["bytes"]:
            report["size_mismatches"].append(f["path"])
    report["ok"] = not (
        report["missing_files"]
        or report["size_mismatches"]
        or report["version_gaps"]
        or report["bad_parents"]
    )
    return report
