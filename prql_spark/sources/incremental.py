"""Exactly-once batch-incremental processing over manifest tables.

The training-pipeline shape this serves: a 100 TB corpus table grows
by appends (crawl waves, streaming sinks); a derived table (scored /
deduped / tokenized) must keep up WITHOUT rescanning what it already
processed. :func:`process_increment` composes two primitives the
manifest layer already guarantees:

- :func:`~prql_spark.sources.manifest.snapshot_changes` plans exactly
  the files ADDED since a version (and refuses to cross a rewrite,
  where "added files" would stop meaning "added rows");
- the per-stream high-water map in every manifest (the streaming
  sink's exactly-once ledger, vacuum- and restore-proof) records the
  last SOURCE version folded into the DESTINATION — in the SAME
  atomic commit as the data, so there is no window where the data
  landed but the bookmark didn't (or vice versa).

Crash semantics: a run that dies before its commit left nothing (the
staged files are unreferenced until vacuumed); the retry re-reads the
same increment. A run that dies after its commit advanced the high
water; the retry is a no-op. Either way each source row is processed
exactly once into the destination.

Reference parity: prql/prql has no incremental layer (it compiles SQL
text); this belongs to the training-data-pipeline surface of the
brief, mirroring what Delta's CDF + checkpoints or an Airflow
watermark table provide.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from prql_spark.sources import manifest as mf


def process_increment(
    spark: SparkSession,
    source_path: str,
    dest_path: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    source_name: str | None = None,
) -> dict:
    """Apply ``transform`` to the rows of the manifest table at
    ``source_path`` added since the last processed version and append
    the result to the manifest table at ``dest_path`` — exactly once.

    The first run (no destination, or no bookmark for this source)
    processes the FULL current source version and creates/overwrites
    the destination. Later runs read only the increment. Returns
    ``{"processed", "source_version", "since_version", "n_rows_in"}``
    (``processed=False`` when the source has nothing new).

    ``source_name`` keys the bookmark (default: derived from
    ``source_path``) — one destination can track several sources.
    A source OVERWRITE/compaction/merge between runs surfaces as
    ``snapshot_changes``'s refusal (process the full version or
    re-derive the destination); it is never silently misread.
    """
    fs, jvm = mf._fs(spark, source_path)
    src_base = source_path.rstrip("/")
    seen = mf._versions(fs, jvm, src_base)
    if not seen:
        raise ValueError(
            f"process_increment: no versions at {source_path!r}"
        )
    latest = seen[-1]
    sname = source_name or f"incr:{src_base}"

    dfs, djvm = mf._fs(spark, dest_path)
    dest_exists = bool(mf._versions(dfs, djvm, dest_path.rstrip("/")))
    done = (
        mf.stream_high_water(spark, dest_path, sname)
        if dest_exists
        else -1
    )
    if latest <= done:
        return {
            "processed": False,
            "source_version": latest,
            "since_version": done,
            "n_rows_in": 0,
        }
    if done == -1:
        inc = mf.snapshot_read(spark, source_path, latest)
    else:
        # raises if a rewrite landed since `done` — never misreads
        inc = mf.snapshot_changes(spark, source_path, since_version=done)
    out = transform(inc) if transform is not None else inc
    n_in = inc.count()
    mf.snapshot_write(
        out,
        dest_path,
        mode="append" if dest_exists else "overwrite",
        # the bookmark rides the SAME commit as the data (atomic);
        # source versions are monotonic, so the high-water replay
        # check gives exactly-once across crashes and retries
        extra={"stream_id": sname, "epoch": latest},
    )
    return {
        "processed": True,
        "source_version": latest,
        "since_version": done,
        "n_rows_in": n_in,
    }
