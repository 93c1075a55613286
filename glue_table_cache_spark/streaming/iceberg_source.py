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
Iceberg streaming read: a snapshot carrying DELETE manifests or
``status=2`` tombstones (an OPTIMIZE/row-delete commit) refuses
loudly — re-delivering rewritten files would duplicate rows, and an
append stream cannot represent removals; process such windows in
batch via :func:`..sources.iceberg.iceberg_cdf`.  Metadata-only
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


class IcebergFilePartition(InputPartition):
    def __init__(self, path: str, partition_values: dict[str, str]):
        self.path = path
        self.partition_values = partition_values


class IcebergLiteStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self._location = options.get("location") or options.get("path")
        if not self._location:
            raise GlueSparkError(
                "iceberg_lite needs a table location: "
                ".option('location', ...) or .load(path)"
            )
        self._schema = schema
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
        return [
            IcebergFilePartition(path, pv)
            for path, pv in _stream_adds(
                self._location, int(start["seq"]), int(end["seq"])
            )
        ]

    def read(self, partition: IcebergFilePartition) -> Iterator:
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
        return _spark_schema(_latest_meta(location))

    def streamReader(self, schema) -> IcebergLiteStreamReader:
        return IcebergLiteStreamReader(schema, self.options)


def read_iceberg_stream(
    spark, location: str, starting_sequence: int | None = None
):
    """Convenience wrapper: a streaming DataFrame over the Iceberg
    table at ``location``."""
    spark.dataSource.register(IcebergLiteDataSource)
    reader = spark.readStream.format("iceberg_lite").option(
        "location", location
    )
    if starting_sequence is not None:
        reader = reader.option(
            "startingSequence", str(starting_sequence)
        )
    return reader.load()
