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
    <path>/_manifests/v{N:010d}.json         one per version
    <path>/_manifests/.v{N}.json.tmp         stage, renamed into place

All filesystem access goes through Hadoop's FileSystem API, so
file:// , hdfs:// and s3a:// behave identically. Manifests carry
RELATIVE file paths — a dataset can be cloned or mounted elsewhere.

Single-manifest simplification (documented trade-off vs Iceberg's
manifest lists): each commit's manifest holds the FULL file list.
At 400k files × ~60 bytes that is a ~25 MB driver-side JSON per
commit — acceptable; beyond that, shard the manifest the way
Iceberg does.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _write_text_atomic(fs, jvm, dir_path: str, name: str, text: str) -> bool:
    """Stage ``text`` under a dotted tmp name, then rename to
    ``name``. Returns False when ``name`` already exists (another
    writer won the version) — the rename is the commit point."""
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


def snapshot_write(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    max_commit_attempts: int = 20,
    extra: dict | None = None,
    allow_new_columns: bool = False,
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
    streaming sink's ``stream_id``/``epoch`` idempotence keys).
    Returns ``{"version", "n_files", "operation"}``.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"snapshot_write: unknown mode {mode!r}")
    spark = df.sparkSession
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    # (name, type) pairs — nullability differences are benign
    schema_sig = sorted(
        (f.name, f.dataType.simpleString()) for f in df.schema.fields
    )
    commit_id = uuid.uuid4().hex[:16]
    data_dir = f"{base}/{_DATA_DIR}/{commit_id}"
    df.write.mode("errorifexists").parquet(data_dir)

    # relative paths of the freshly staged files
    Path = jvm.org.apache.hadoop.fs.Path
    staged = []
    it = fs.listFiles(Path(data_dir), True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        staged.append(
            {
                "path": f"{_DATA_DIR}/{commit_id}/{name}",
                "bytes": st.getLen(),
            }
        )

    fs.mkdirs(Path(f"{base}/{_MANIFEST_DIR}"))
    for _ in range(max_commit_attempts):
        seen = _versions(fs, jvm, base)
        parent = seen[-1] if seen else None
        version = (parent or 0) + 1
        files = list(staged)
        merge_schema = False
        if mode == "append" and parent is not None:
            pm = _load_manifest(fs, jvm, base, parent)
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
        manifest = {
            "version": version,
            "parent": parent,
            "operation": mode,
            "commit": commit_id,
            "schema": schema_sig,
            "merge_schema": merge_schema,
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


def snapshot_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the dataset at ``path`` as of ``version`` (default: the
    latest). Plans from the manifest's file list — one listStatus
    per referenced commit directory (to validate dir-grouped
    planning), never a recursive data-tree walk."""
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
    # Plan per COMMIT DIRECTORY, not per file: passing N explicit
    # paths costs Spark one driver-side stat each (~2 ms/file
    # locally, a remote call each on object stores). Commit dirs are
    # immutable, so a dir whose visible data files EQUAL the
    # referenced set can be passed as one path — verified with one
    # listStatus per dir, so a hand-planted stray file inside a
    # commit dir still falls back to exact file paths and is never
    # read. Planning is O(#commits), not O(#files).
    Path = jvm.org.apache.hadoop.fs.Path
    groups: dict[str, set] = {}
    for f in manifest["files"]:
        d, name = f["path"].rsplit("/", 1)
        groups.setdefault(d, set()).add(name)
    paths = []
    for d, names in groups.items():
        visible = {
            s.getPath().getName()
            for s in fs.listStatus(Path(f"{base}/{d}"))
            if not s.getPath().getName().startswith(("_", "."))
        }
        if visible == names:
            paths.append(f"{base}/{d}")
        else:
            paths.extend(f"{base}/{d}/{n}" for n in sorted(names))
    reader = spark.read
    if manifest.get("merge_schema"):
        # schema-evolved version: files span schemas; merge so old
        # files null-fill columns added later
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*paths)


def snapshot_history(spark: SparkSession, path: str) -> DataFrame:
    """One row per committed version: version, parent, operation,
    n_files, total_bytes."""
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    rows = []
    for v in _versions(fs, jvm, base):
        m = _load_manifest(fs, jvm, base, v)
        rows.append(
            (
                m["version"],
                m["parent"],
                m["operation"],
                len(m["files"]),
                sum(f["bytes"] for f in m["files"]),
            )
        )
    return spark.createDataFrame(
        rows,
        "version INT, parent INT, operation STRING, n_files INT,"
        " total_bytes LONG",
    )


def compact_snapshot(
    spark: SparkSession, path: str, target_mb: int = 256
) -> dict:
    """Commit a compacted version: the latest version's rows repacked
    into ``ceil(total_bytes / target_mb)`` files. Rows are untouched;
    the previous version remains readable (time travel) — there is NO
    deletion window at all. No-op when already at the target count.
    The repack is a narrow ``coalesce`` of a manifest-planned scan.
    """
    import math

    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    seen = _versions(fs, jvm, base)
    if not seen:
        raise ValueError(f"compact_snapshot: no versions at {path!r}")
    m = _load_manifest(fs, jvm, base, seen[-1])
    total = sum(f["bytes"] for f in m["files"])
    want = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    if len(m["files"]) <= want:
        return {"compacted": False, "n_files": len(m["files"])}
    df = snapshot_read(spark, path).coalesce(want)
    # operation tag "compact" (extra overrides the mode label):
    # history reads honestly, and snapshot_changes rejects crossing
    # it just like any other rewrite
    res = snapshot_write(
        df, path, mode="overwrite", extra={"operation": "compact"}
    )
    return {
        "compacted": True,
        "version": res["version"],
        "n_files_before": len(m["files"]),
        "n_files_after": res["n_files"],
    }


def vacuum_snapshot(
    spark: SparkSession, path: str, keep_versions: int = 2
) -> dict:
    """Reclaim space: drop all but the newest ``keep_versions``
    manifests, then delete every data file no retained manifest
    references. The only operation that ever deletes data, and it
    provably deletes only unreferenced files (the referenced set is
    computed from the manifests that remain)."""
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
            # not data — leave them to their commit directory
            if any(c.startswith(("_", ".")) for c in rel.split("/")):
                continue
            if rel not in referenced:
                doomed.append(st.getPath())
        for p in doomed:
            fs.delete(p, False)
            dropped_files += 1
        # sweep commit directories holding no data files anymore
        # (only writer metadata like _SUCCESS/.crc remains)
        for st in fs.listStatus(data_root):
            if not st.isDirectory():
                continue
            remaining = [
                s.getPath().getName() for s in fs.listStatus(st.getPath())
            ]
            if all(n.startswith(("_", ".")) for n in remaining):
                fs.delete(st.getPath(), True)
    dropped_manifests = 0
    for v in seen:
        if v not in keep:
            fs.delete(
                Path(f"{base}/{_MANIFEST_DIR}/v{v:010d}.json"), False
            )
            dropped_manifests += 1
    return {
        "dropped_files": dropped_files,
        "dropped_manifests": dropped_manifests,
        "kept_versions": keep,
    }


def committed_epochs(
    spark: SparkSession, path: str, stream_id: str
) -> set:
    """Epoch ids a streaming sink has already committed to the table
    at ``path`` under ``stream_id`` — the idempotence ledger
    :func:`prql_spark.streaming.pipeline.stream_append_snapshot`
    consults to turn foreachBatch's at-least-once into
    exactly-once-effect. One small-directory listing."""
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    out = set()
    for v in _versions(fs, jvm, base):
        m = _load_manifest(fs, jvm, base, v)
        if m.get("stream_id") == stream_id and "epoch" in m:
            out.add(m["epoch"])
    return out


def snapshot_changes(
    spark: SparkSession, path: str, since_version: int
) -> DataFrame:
    """Incremental read: the rows ADDED after ``since_version`` —
    exactly the files referenced by the latest manifest but not by
    ``since_version``'s. The training-pipeline primitive for
    incremental processing: score/dedup/decontaminate ONLY the new
    slice (e.g. feed ``dedup.dedup_against`` with the reference
    corpus), never rescanning the 100 TB already processed.

    Only valid across append-only history: if any version after
    ``since_version`` was an overwrite (or a compaction, which
    rewrites files), "added files" no longer means "added rows" and
    this raises instead of silently returning rewritten data.
    """
    fs, jvm = _fs(spark, path)
    base = path.rstrip("/")
    seen = _versions(fs, jvm, base)
    if since_version not in seen:
        raise ValueError(
            f"snapshot_changes: version {since_version} not in {seen} "
            f"at {path!r}"
        )
    latest = seen[-1]
    for v in seen:
        if v > since_version:
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
    new_files = [
        f"{base}/{f['path']}"
        for f in _load_manifest(fs, jvm, base, latest)["files"]
        if f["path"] not in old
    ]
    if not new_files:
        return snapshot_read(spark, path, latest).limit(0)
    return spark.read.parquet(*new_files)


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
            return v.isoformat()
        if isinstance(v, bytes):
            return v.decode("utf-8", "replace")
        return v

    return {k: [enc(lo), enc(hi)] for k, (lo, hi) in out.items()}


def attach_stats(
    spark: SparkSession, path: str, cols: tuple, version: int | None = None
) -> dict:
    """Collect per-file [min, max] footer stats for ``cols`` on the
    given version's files and commit them as a new manifest version
    (operation ``stats`` — the FILE LIST is unchanged, so
    `snapshot_changes` crosses it safely and time travel still
    reads identical content).

    Stats power :func:`snapshot_scan`'s driver-side file skipping.
    Collection is footer-only (no data pages); local-filesystem
    paths are read directly via pyarrow — on remote stores collect
    at write time from a local staging copy, or skip (scan falls
    back to reading every file). Combine with the z-order writer:
    clustered layout → tight per-file ranges → most files skip.
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
    n_ok = 0
    files = []
    for f in m["files"]:
        st = _file_stats(f"{local_base}/{f['path']}", cols)
        nf = dict(f)
        if st is not None:
            nf["stats"] = {**nf.get("stats", {}), **st}
            n_ok += 1
        files.append(nf)
    manifest = {
        **m,
        "files": files,
        "operation": "stats",
        "parent": v,
    }
    for _ in range(20):
        seen = _versions(fs, jvm, base)
        nv = seen[-1] + 1
        manifest["version"] = nv
        if _write_text_atomic(
            fs, jvm, f"{base}/{_MANIFEST_DIR}",
            f"v{nv:010d}.json", json.dumps(manifest),
        ):
            return {"version": nv, "files_with_stats": n_ok,
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
        rng = (f.get("stats") or {}).get(col)
        if rng is not None:
            fmin, fmax = rng
            if lo_e is not None and fmax < lo_e:
                continue
            if hi_e is not None and fmin > hi_e:
                continue
        keep.append(f"{base}/{f['path']}")
    if not keep:
        return snapshot_read(spark, path, v).limit(0).where(F.lit(False))
    df = spark.read.parquet(*keep)
    c = F.col(col)
    if lo is not None:
        df = df.where(c >= F.lit(lo))
    if hi is not None:
        df = df.where(c <= F.lit(hi))
    return df


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
        manifest = {
            **m,
            "version": latest + 1,
            "parent": latest,
            "operation": "restore",
            "restored_from": version,
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
