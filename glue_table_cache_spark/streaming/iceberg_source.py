"""Structured-Streaming SOURCE over this repo's Iceberg tables.

The Iceberg sibling of :mod:`.delta_source`, same Spark-native shape
(PySpark 4 Python Data Source API): tables published by
:func:`..sinks.iceberg_write.write_iceberg_append` stream as
micro-batches — ``spark.readStream.format("iceberg_lite")`` — with
offsets = SEQUENCE NUMBERS (``{"seq": N}`` = snapshots with sequence
number ≤ N consumed), checkpointed by Spark.

Per micro-batch the driver walks only the manifest lists of the
snapshots in the offset range (metadata-scale) and emits one input
partition per file the snapshot ADDED (its manifest rows, entries
with inherited sequence numbers); executors read the parquet via the
shared Arrow partition reader.  Append-only semantics, like the real
Iceberg streaming read: a non-append snapshot (overwrite / DELETE
manifests / ``status=2`` tombstones) refuses loudly — re-delivering
rewritten files would duplicate rows, and an append stream cannot
represent removals.  ``readChangeFeed=true`` lifts that to a
CHANGELOG stream instead: consecutive-snapshot file diffs along the
sequence axis emit the table columns + ``_change_type``
(insert/delete) + ``_commit_version``, compaction (``replace``)
emits nothing, and only row-level delete-file changes still refuse
(their per-row delta is not reconstructible from file diffs) — or
process such windows in batch via
:func:`..sources.iceberg.iceberg_cdf`.  Metadata-only
commits (snapshot expiry bumps the sequence number without adding a
snapshot) are legitimate gaps in the sequence axis and stream as
empty batches.

A stream must keep up within the snapshot-retention window: once
:func:`..sinks.iceberg_optimize.expire_iceberg_snapshots` prunes a
snapshot the consumer never read, the range is gone — the unread
snapshot no longer appears in the metadata and the stream cannot
detect it (documented retention semantics, same as every lakehouse
streaming source).
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from glue_table_cache_spark.errors import GlueSparkError
from glue_table_cache_spark.streaming.delta_source import (
    read_file_partition,
)

def _spark_type(t):
    """Iceberg primitive type string → Spark type (built directly —
    no DDL parse: the data-source worker has no SparkContext)."""
    from pyspark.sql import types as T

    simple = {
        "long": T.LongType,
        "int": T.IntegerType,
        "double": T.DoubleType,
        "float": T.FloatType,
        "string": T.StringType,
        "boolean": T.BooleanType,
        "date": T.DateType,
        "timestamptz": T.TimestampType,
        "timestamp": T.TimestampNTZType,
        "binary": T.BinaryType,
    }
    if t in simple:
        return simple[t]()
    if isinstance(t, str) and t.startswith("decimal("):
        p, s = t[len("decimal("):-1].split(",")
        return T.DecimalType(int(p), int(s))
    return None


def _latest_meta(location: str) -> dict:
    from glue_table_cache_spark.sinks.iceberg_write import (
        _latest_metadata,
    )

    meta = _latest_metadata(Path(location) / "metadata")
    if meta is None:
        raise GlueSparkError(
            f"no Iceberg metadata under {location!r}"
        )
    return meta


def _spark_schema(meta: dict):
    from pyspark.sql.types import StructField, StructType

    schemas = meta.get("schemas") or []
    current = next(
        (
            s
            for s in schemas
            if s.get("schema-id") == meta.get("current-schema-id")
        ),
        schemas[-1] if schemas else None,
    )
    if current is None:
        raise GlueSparkError(
            "Iceberg table has no schema in its metadata"
        )
    fields = []
    for f in current.get("fields", []):
        t = _spark_type(f.get("type"))
        if t is None:
            raise GlueSparkError(
                f"iceberg_lite cannot stream column {f.get('name')!r} "
                f"of type {f.get('type')!r} (primitives only)"
            )
        fields.append(StructField(f["name"], t, True))
    return StructType(fields)


def _stream_adds(
    location: str, since_seq: int, until_seq: int
) -> list[tuple[str, dict[str, str]]]:
    from glue_table_cache_spark.sources.avro_lite import read_avro
    from glue_table_cache_spark.sources.iceberg import _resolve_path

    meta = _latest_meta(location)
    adds: list[tuple[str, dict[str, str]]] = []
    for snap in meta.get("snapshots") or []:
        seq = snap.get("sequence-number", 0)
        if not (since_seq < seq <= until_seq):
            continue
        op = (snap.get("summary") or {}).get("operation")
        if op is not None and op != "append":
            # an overwrite can retire files by manifest-list
            # EXCLUSION (no tombstones to trip over below) — refuse
            # any non-append snapshot up front rather than silently
            # delivering replacement rows as appends
            raise GlueSparkError(
                f"Iceberg snapshot seq {seq} of {location!r} is "
                f"{op!r}, not an append — an append stream cannot "
                "represent it; use readChangeFeed=true or process "
                "the window in batch via iceberg_cdf()"
            )
        ml = _resolve_path(location, snap["manifest-list"])
        for row in read_avro(ml):
            # only the manifests this snapshot ADDED are new content;
            # prior snapshots' manifests were already streamed
            if row.get("sequence_number") != seq and (
                row.get("added_snapshot_id") != snap.get("snapshot-id")
            ):
                continue
            if row.get("content", 0) == 1:
                raise GlueSparkError(
                    f"Iceberg snapshot seq {seq} of {location!r} adds "
                    "a DELETE manifest — the table is not append-only; "
                    "process the window in batch via iceberg_cdf()"
                )
            m = _resolve_path(location, row["manifest_path"])
            for entry in read_avro(m):
                if entry.get("status") == 2:
                    raise GlueSparkError(
                        f"Iceberg snapshot seq {seq} of {location!r} "
                        "replaces/deletes files (status=2 entries) — "
                        "an append stream cannot represent that; "
                        "process the window in batch via iceberg_cdf()"
                    )
                # carried entries (explicit older seq) were streamed
                # with their own snapshot; new entries inherit (None)
                # or carry this snapshot's seq
                eseq = entry.get("sequence_number")
                if eseq is not None and eseq != seq:
                    continue
                df_rec = entry["data_file"]
                pv = df_rec.get("partition") or {}
                adds.append(
                    (
                        _resolve_path(location, df_rec["file_path"]),
                        {k: str(v) for k, v in pv.items()},
                    )
                )
    return adds


def _files_at_snapshot(
    location: str, snap: dict
) -> tuple[dict[str, dict[str, str]], set[str]]:
    """One snapshot's live file state from its manifest list:
    ``(data_files, delete_files)`` where data_files maps path →
    stringified partition values and delete_files holds row-level
    delete file paths (position AND equality).  Metadata-scale: the
    driver reads Avro manifests only, never data."""
    from glue_table_cache_spark.sources.avro_lite import read_avro
    from glue_table_cache_spark.sources.iceberg import _resolve_path

    data: dict[str, dict[str, str]] = {}
    deletes: set[str] = set()
    ml = _resolve_path(location, snap["manifest-list"])
    for row in read_avro(ml):
        is_delete = row.get("content", 0) == 1
        m = _resolve_path(location, row["manifest_path"])
        for entry in read_avro(m):
            if entry.get("status") == 2:
                continue  # tombstone: the file is not in this state
            df_rec = entry["data_file"]
            path = _resolve_path(location, df_rec["file_path"])
            if is_delete:
                deletes.add(path)
            else:
                pv = df_rec.get("partition") or {}
                data[path] = {k: str(v) for k, v in pv.items()}
    return data, deletes


def _stream_changes(
    location: str, since_seq: int, until_seq: int
) -> list[tuple[str, dict[str, str], str, int]]:
    """``(path, partition_values, change_type, sequence_number)`` per
    change-delivering file in snapshots ``(since, until]`` — the
    streaming slice of :func:`..sources.iceberg.iceberg_cdf`'s
    semantics, computed as consecutive-snapshot file-set diffs along
    the sequence axis (the stream's own offset order, so a RESTORE
    branch streams as the delete+insert a linear consumer must see):

    * data files present in a snapshot but not its predecessor →
      their rows are inserts;
    * data files present in the predecessor but not the snapshot →
      deletes (write-once files answer reads until expiry removes
      them — then the read fails loudly, never silently);
    * a ``replace`` snapshot (compaction) is content-preserving by
      definition and emits nothing;
    * a snapshot that CHANGES the row-level delete-file set (position
      or equality) refuses — the per-row delta is not recoverable
      from file diffs; process that window with an Iceberg runtime's
      changelog."""
    meta = _latest_meta(location)
    snaps = sorted(
        meta.get("snapshots") or [],
        key=lambda s: s.get("sequence-number", 0),
    )
    prev: dict | None = None
    for s in snaps:
        if s.get("sequence-number", 0) <= since_seq:
            prev = s
    prev_data, prev_dels = (
        _files_at_snapshot(location, prev)
        if prev is not None
        else ({}, set())
    )
    out: list[tuple[str, dict[str, str], str, int]] = []
    for snap in snaps:
        seq = snap.get("sequence-number", 0)
        if not (since_seq < seq <= until_seq):
            continue
        cur_data, cur_dels = _files_at_snapshot(location, snap)
        op = (snap.get("summary") or {}).get("operation")
        if op == "replace":
            # compaction rewrites bytes, not content — but only a
            # true rewrite: a "replace" that changed delete files
            # still refuses below
            if cur_dels != prev_dels:
                raise GlueSparkError(
                    f"Iceberg snapshot seq {seq} of {location!r} "
                    "is a replace that changed row-level delete "
                    "files — not reconstructible as a changelog"
                )
            prev_data, prev_dels = cur_data, cur_dels
            continue
        if cur_dels != prev_dels:
            raise GlueSparkError(
                f"Iceberg snapshot seq {seq} of {location!r} "
                "changed row-level delete files (position/equality) "
                "— the per-row delta is not reconstructible from "
                "file diffs; process the window through an Iceberg "
                "runtime's changelog"
            )
        for path in sorted(set(prev_data) - set(cur_data)):
            out.append((path, prev_data[path], "delete", seq))
        for path in sorted(set(cur_data) - set(prev_data)):
            out.append((path, cur_data[path], "insert", seq))
        prev_data, prev_dels = cur_data, cur_dels
    return out


class IcebergFilePartition(InputPartition):
    def __init__(self, path: str, partition_values: dict[str, str]):
        self.path = path
        self.partition_values = partition_values


class IcebergChangePartition(InputPartition):
    """One CDF input partition: a data file whose rows all take the
    synthesized ``change_type``, tagged with the snapshot's sequence
    number as ``_commit_version``."""

    def __init__(
        self,
        path: str,
        partition_values: dict[str, str],
        change_type: str,
        sequence_number: int,
    ):
        self.path = path
        self.partition_values = partition_values
        self.change_type = change_type
        self.sequence_number = sequence_number


class IcebergLiteStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self._location = options.get("location") or options.get("path")
        if not self._location:
            raise GlueSparkError(
                "iceberg_lite needs a table location: "
                ".option('location', ...) or .load(path)"
            )
        self._schema = schema
        self._cdf = (
            str(options.get("readchangefeed", "false")).lower()
            == "true"
        )
        start = options.get("startingsequence")
        self._initial = int(start) - 1 if start is not None else 0

    def initialOffset(self) -> dict:
        return {"seq": self._initial}

    def latestOffset(self) -> dict:
        return {
            "seq": _latest_meta(self._location).get(
                "last-sequence-number", 0
            )
        }

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        if self._cdf:
            return [
                IcebergChangePartition(path, pv, ct, seq)
                for path, pv, ct, seq in _stream_changes(
                    self._location,
                    int(start["seq"]),
                    int(end["seq"]),
                )
            ]
        return [
            IcebergFilePartition(path, pv)
            for path, pv in _stream_adds(
                self._location, int(start["seq"]), int(end["seq"])
            )
        ]

    def read(self, partition) -> Iterator:
        if isinstance(partition, IcebergChangePartition):
            yield from read_file_partition(
                partition.path,
                partition.partition_values,
                self._schema,
                constants={
                    "_change_type": partition.change_type,
                    "_commit_version": partition.sequence_number,
                },
            )
            return
        yield from read_file_partition(
            partition.path, partition.partition_values, self._schema
        )

    def commit(self, end: dict) -> None:
        pass


class IcebergLiteDataSource(DataSource):
    """``spark.dataSource.register(IcebergLiteDataSource)`` then
    ``spark.readStream.format("iceberg_lite").option("location", loc)``."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_lite"

    def schema(self):
        location = self.options.get("location") or self.options.get(
            "path"
        )
        if not location:
            raise GlueSparkError(
                "iceberg_lite needs a table location: "
                ".option('location', ...) or .load(path)"
            )
        schema = _spark_schema(_latest_meta(location))
        if (
            str(self.options.get("readchangefeed", "false")).lower()
            == "true"
        ):
            # CDF mode: change rows = data columns + the change
            # metadata, the same shape delta_lite's CDF mode emits
            # (version = the snapshot's sequence number)
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
            )

            return schema.add(
                StructField("_change_type", StringType())
            ).add(StructField("_commit_version", LongType()))
        return schema

    def streamReader(self, schema) -> IcebergLiteStreamReader:
        return IcebergLiteStreamReader(schema, self.options)


def read_iceberg_stream(
    spark,
    location: str,
    starting_sequence: int | None = None,
    read_change_feed: bool = False,
):
    """Convenience wrapper: a streaming DataFrame over the Iceberg
    table at ``location``.

    ``read_change_feed=True`` streams CHANGE rows instead of appends:
    the table's columns plus ``_change_type`` (insert / delete,
    synthesized from consecutive-snapshot file diffs along the
    sequence axis) and ``_commit_version`` (the sequence number), so
    a mid-stream DELETE/overwrite arrives as change rows downstream
    instead of refusing; compaction (``replace``) emits nothing and
    row-level delete-file changes refuse."""
    spark.dataSource.register(IcebergLiteDataSource)
    reader = spark.readStream.format("iceberg_lite").option(
        "location", location
    )
    if starting_sequence is not None:
        reader = reader.option(
            "startingSequence", str(starting_sequence)
        )
    if read_change_feed:
        reader = reader.option("readChangeFeed", "true")
    return reader.load()
