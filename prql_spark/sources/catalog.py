"""Table catalog: name → lazily-planned Spark DataFrame.

Scale posture: tables resolve to format readers (parquet by default)
so Catalyst sees the scan directly — filters/projections push down to
the file source. Tiny fixed-cardinality dims (region: 5 rows,
nation: 25) are marked for broadcast so joins against them never
shuffle the fact side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Dims that stay tiny at ANY scale factor (fixed cardinality in the
# TPC-H-ish generator) — always broadcast-joinable. customer/part/
# supplier GROW with SF, so they are left to AQE + the
# autoBroadcastJoinThreshold rather than force-broadcast.
ALWAYS_BROADCAST = frozenset({"region", "nation"})


class Catalog:
    def __init__(
        self,
        spark: SparkSession,
        data_dir: str | None = None,
        fmt: str = "parquet",
        broadcast: frozenset = ALWAYS_BROADCAST,
        options: dict | None = None,
    ):
        self.spark = spark
        # the events table carries TIMESTAMP(NANOS) parquet columns,
        # which Spark rejects unless read as int64 nanos (converted
        # back in _fix_nanos). Set here so ANY session — including a
        # driver-provided one — can read the test tables.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        self.data_dir = data_dir
        self.fmt = fmt
        if options is None:
            # csv needs these to be usable as a relational source
            options = (
                {"header": "true", "inferSchema": "true"}
                if fmt == "csv"
                else {}
            )
        self.options = options
        self.broadcast_names = set(broadcast)
        self._registered: dict[str, DataFrame] = {}
        # manifest tables seen by load() — the PRQL compiler asks for
        # these to route sargable filters through file-skipping reads
        self._manifest_paths: dict[str, str] = {}

    def register(self, name: str, df: DataFrame, broadcast: bool = False):
        self._registered[name] = df
        if broadcast:
            self.broadcast_names.add(name)

    def load(self, name: str, version: int | None = None) -> DataFrame:
        if name in self._registered:
            if version is not None:
                raise ValueError(
                    f"table {name!r}: version= only applies to "
                    "manifest-committed tables, not registered frames"
                )
            return self._registered[name]
        if self.data_dir is None:
            raise KeyError(f"table {name!r} not registered and no data_dir set")
        path = os.path.join(self.data_dir, f"{name}.{self.fmt}")
        if not os.path.exists(path):
            # allow directory-style datasets (partitioned writes) and
            # manifest-committed versioned tables (PRQL `from tbl`
            # reads the latest committed version; Python callers pass
            # version= for time travel)
            alt = os.path.join(self.data_dir, name)
            if os.path.isdir(os.path.join(alt, "_manifests")):
                from prql_spark.sources.manifest import snapshot_read

                self._manifest_paths[name] = alt
                return snapshot_read(self.spark, alt, version)
            if os.path.exists(alt):
                path = alt
            else:
                raise KeyError(f"table {name!r}: no file at {path}")
        if version is not None:
            raise ValueError(
                f"table {name!r}: version= only applies to "
                "manifest-committed tables"
            )
        df = self.spark.read.format(self.fmt).options(**self.options).load(path)
        if self.fmt == "parquet":
            df = self._fix_nanos(df, path)
        return df

    def _fix_nanos(self, df: DataFrame, path: str):
        """Spark rejects parquet TIMESTAMP(NANOS); with
        ``spark.sql.legacy.parquet.nanosAsLong`` they surface as int64
        nanos — convert those columns back to real timestamps (footer
        inspection is driver-side metadata only, no data read)."""
        try:
            import pyarrow.parquet as pq

            if os.path.isdir(path):
                files = [
                    os.path.join(path, f)
                    for f in os.listdir(path)
                    if f.endswith(".parquet")
                ]
                if not files:
                    return df
                schema = pq.read_schema(files[0])
            else:
                schema = pq.read_schema(path)
        except Exception:
            return df
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        for field in schema:
            if str(field.type) != "timestamp[ns]":
                continue
            # Spark-written INT96 timestamps also read as
            # timestamp[ns] in pyarrow but load as real TIMESTAMPs in
            # Spark — only convert when Spark actually surfaced int64
            # nanos (the nanosAsLong case).
            spark_field = next(
                (f for f in df.schema.fields if f.name == field.name), None
            )
            if spark_field is None or not isinstance(
                spark_field.dataType, LongType
            ):
                continue
            # integer DIV, not float division: double's 53-bit
            # mantissa loses sub-microsecond exactness for epoch-range
            # nanos, giving occasional off-by-1µs vs an exact reader
            df = df.withColumn(
                field.name,
                F.expr(
                    f"timestamp_micros(CAST(`{field.name}` DIV 1000 "
                    f"AS LONG))"
                ),
            )
        return df

    def is_broadcast(self, name: str) -> bool:
        return name in self.broadcast_names

    def load_pruned(self, name: str, bounds: dict):
        """Manifest-table FILE-SKIPPING load for predicate pushdown:
        re-plan ``name``'s latest version keeping only files whose
        manifest [min, max] stats can overlap every bound in
        ``bounds`` (``{col: (lo, hi)}`` or ``{col: [(lo, hi), ...]}``
        — an interval UNION from a same-column OR). Returns the pruned
        DataFrame, or None when ``name`` is not a manifest table or
        nothing was actually pruned (caller keeps its original
        plan). The caller MUST still apply its exact predicate —
        pruning is conservative, not exact."""
        path = self._manifest_paths.get(name)
        if path is None or not bounds:
            return None
        from prql_spark.sources.manifest import snapshot_pruned_read

        df, n_kept, n_total = snapshot_pruned_read(
            self.spark, path, bounds
        )
        return df if n_kept < n_total else None

    def metadata_count(self, name: str) -> int | None:
        """Row count of a manifest table's latest version for the
        PRQL count fast path, or None when ``name`` isn't a manifest
        table. Answered from the manifest alone (ZERO Spark tasks)
        when every file carries a write-time/footer row count;
        otherwise snapshot_count falls back to one real count() job
        — same result either way, so the compiler may always route
        through here."""
        path = self._manifest_paths.get(name)
        if path is None:
            return None
        from prql_spark.sources.manifest import snapshot_count

        return snapshot_count(self.spark, path)
