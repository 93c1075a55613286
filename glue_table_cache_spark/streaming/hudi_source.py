"""Structured-Streaming SOURCE over this repo's Hudi COW tables.

The Hudi sibling of :mod:`.delta_source` / :mod:`.iceberg_source`,
same Spark-native shape (PySpark 4 Python Data Source API): tables
published by :func:`..sinks.hudi_write.write_hudi_append` stream as
micro-batches — ``spark.readStream.format("hudi_lite")`` — with
offsets = completed REQUEST-INSTANT timestamps (``{"instant": T}`` =
completed commits with instant ≤ T consumed), checkpointed by Spark.

Per micro-batch the driver reads only the commit JSONs in the offset
range (metadata-scale) and emits one input partition per base file the
commit's write stats added; executors read the parquet via the shared
Arrow partition reader, with partition-path values re-attached.

Append-only semantics, mirroring Hudi's own incremental read contract:

* a ``deltacommit`` in the range refuses (MOR log blocks update rows
  in place — an append stream cannot represent that; compact first or
  process via the batch MOR snapshot read);
* a ``replacecommit`` refuses (clustering / row-level DELETE rewrote
  file groups — re-delivering rewritten files would duplicate rows;
  process the window in batch via ``hudi_changes``, or stream it as
  a CHANGELOG: ``readChangeFeed=true`` emits the table columns +
  ``_change_type`` (insert/delete) + ``_commit_version`` from
  consecutive-instant timeline diffs, so replacecommits arrive as
  delete+insert rows — only deltacommits still refuse there);
* the schema comes from the newest commit's ``extraMetadata.schema``
  (what :func:`..sinks.hudi_write.write_hudi_append` records) — a
  table without one refuses rather than sampling a file whose schema
  may predate evolution.
"""

from __future__ import annotations

import json
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


def _completed(location: str) -> list[tuple[int, str, str]]:
    from glue_table_cache_spark.sources.hudi import (
        _completed_instants,
        _timeline_files,
    )

    names = _timeline_files(location)
    try:
        return _completed_instants(names, location)
    except GlueSparkError:
        return []


def _stream_schema(location: str):
    from glue_table_cache_spark.sources.hudi import hudi_table_schema

    schema = hudi_table_schema(location)
    if schema is None:
        raise GlueSparkError(
            f"hudi_lite needs a recorded table schema: no completed "
            f"instant of {location!r} carries extraMetadata.schema "
            "(write the table with write_hudi_append, or read it in "
            "batch through the engine)"
        )
    return schema


def _stream_adds(
    location: str, since: int, until: int
) -> list[tuple[str, dict[str, str]]]:
    from glue_table_cache_spark.sources.hudi import (
        _pv_from_partition_path,
        _resolve_path,
    )
    from glue_table_cache_spark.sources.iceberg import _read_bytes

    adds: list[tuple[str, dict[str, str]]] = []
    for ts, kind, p in _completed(location):
        if not (since < ts <= until):
            continue
        if kind == "deltacommit":
            raise GlueSparkError(
                f"Hudi instant {ts} of {location!r} is a deltacommit "
                "(MOR log blocks update rows in place) — an append "
                "stream cannot represent that; compact_hudi() first, "
                "or read the snapshot in batch"
            )
        if kind == "replacecommit":
            raise GlueSparkError(
                f"Hudi instant {ts} of {location!r} replaces file "
                "groups (clustering / row-level delete) — an append "
                "stream cannot represent that; process the window in "
                "batch via hudi_changes()"
            )
        data = json.loads(_read_bytes(p))
        for part, stats in (
            data.get("partitionToWriteStats") or {}
        ).items():
            for st in stats:
                path = st.get("path")
                if not path or ".log." in path.rsplit("/", 1)[-1]:
                    continue
                adds.append(
                    (
                        _resolve_path(location, path),
                        _pv_from_partition_path(
                            st.get("partitionPath", part)
                        ),
                    )
                )
    return adds


def _state_at(
    location: str, names: list[str], ts: int | None
) -> dict[str, str]:
    """The COW table state at instant ``ts``: base-file path →
    partition path, from a timeline walk.  Live MOR logs refuse —
    their row-level upserts are not file-diff reconstructible."""
    from glue_table_cache_spark.sources.hudi import _walk_timeline

    slices, logs = _walk_timeline(
        location, names, as_of_instant=ts
    )
    if logs:
        raise GlueSparkError(
            f"Hudi table {location!r} carries un-compacted MOR log "
            "blocks at instant {} — row-level upserts are not "
            "reconstructible as a file-diff changelog; "
            "compact_hudi() first".format(ts)
        )
    return {path: part for _i, path, part in slices.values()}


def _stream_changes(
    location: str, since: int, until: int
) -> list[tuple[str, dict[str, str], str, int]]:
    """``(path, partition_values, change_type, instant)`` per
    change-delivering base file in instants ``(since, until]`` —
    consecutive-instant timeline diffs, the Hudi sibling of the
    Iceberg source's sequence-axis file diffs: a ``commit`` adds
    slices (inserts), a ``replacecommit`` (clustering / COW
    DELETE/UPDATE/MERGE) retires slices and adds their replacements
    (deletes + inserts — clustering's rewrites cancel at row level
    only if content matched, so clustering windows DO emit; Hudi
    replacecommits don't record content-preservation the way Iceberg
    ``replace`` does), and a ``deltacommit`` refuses."""
    from glue_table_cache_spark.sources.hudi import (
        _completed_instants,
        _pv_from_partition_path,
        _resolve_path,
        _timeline_files,
    )

    names = _timeline_files(location)
    try:
        instants = _completed_instants(names, location)
    except GlueSparkError:
        return []
    prev = _state_at(location, names, since) if since else {}
    out: list[tuple[str, dict[str, str], str, int]] = []
    for ts, kind, _p in instants:
        if not (since < ts <= until):
            continue
        if kind == "deltacommit":
            raise GlueSparkError(
                f"Hudi instant {ts} of {location!r} is a deltacommit "
                "(MOR log blocks update rows in place) — not "
                "reconstructible as a file-diff changelog; "
                "compact_hudi() first or read the snapshot in batch"
            )
        cur = _state_at(location, names, ts)
        for path in sorted(set(prev) - set(cur)):
            out.append(
                (
                    _resolve_path(location, path),
                    _pv_from_partition_path(prev[path]),
                    "delete",
                    ts,
                )
            )
        for path in sorted(set(cur) - set(prev)):
            out.append(
                (
                    _resolve_path(location, path),
                    _pv_from_partition_path(cur[path]),
                    "insert",
                    ts,
                )
            )
        prev = cur
    return out


class HudiFilePartition(InputPartition):
    def __init__(self, path: str, partition_values: dict[str, str]):
        self.path = path
        self.partition_values = partition_values


class HudiChangePartition(InputPartition):
    """One CDF input partition: a base file whose rows all take the
    synthesized ``change_type``, tagged with the instant as
    ``_commit_version``."""

    def __init__(
        self,
        path: str,
        partition_values: dict[str, str],
        change_type: str,
        instant: int,
    ):
        self.path = path
        self.partition_values = partition_values
        self.change_type = change_type
        self.instant = instant


class HudiLiteStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self._location = options.get("location") or options.get("path")
        if not self._location:
            raise GlueSparkError(
                "hudi_lite needs a table location: "
                ".option('location', ...) or .load(path)"
            )
        self._schema = schema
        self._cdf = (
            str(options.get("readchangefeed", "false")).lower()
            == "true"
        )
        start = options.get("startinginstant")
        self._initial = int(start) if start is not None else 0

    def initialOffset(self) -> dict:
        return {"instant": self._initial}

    def latestOffset(self) -> dict:
        done = _completed(self._location)
        return {"instant": done[-1][0] if done else self._initial}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        if self._cdf:
            return [
                HudiChangePartition(path, pv, ct, ts)
                for path, pv, ct, ts in _stream_changes(
                    self._location,
                    int(start["instant"]),
                    int(end["instant"]),
                )
            ]
        return [
            HudiFilePartition(path, pv)
            for path, pv in _stream_adds(
                self._location,
                int(start["instant"]),
                int(end["instant"]),
            )
        ]

    def read(self, partition) -> Iterator:
        if isinstance(partition, HudiChangePartition):
            yield from read_file_partition(
                partition.path,
                partition.partition_values,
                self._schema,
                constants={
                    "_change_type": partition.change_type,
                    "_commit_version": partition.instant,
                },
            )
            return
        yield from read_file_partition(
            partition.path, partition.partition_values, self._schema
        )

    def commit(self, end: dict) -> None:
        pass


class HudiLiteDataSource(DataSource):
    """``spark.dataSource.register(HudiLiteDataSource)`` then
    ``spark.readStream.format("hudi_lite").option("location", loc)``."""

    @classmethod
    def name(cls) -> str:
        return "hudi_lite"

    def schema(self):
        location = self.options.get("location") or self.options.get(
            "path"
        )
        if not location:
            raise GlueSparkError(
                "hudi_lite needs a table location: "
                ".option('location', ...) or .load(path)"
            )
        schema = _stream_schema(location)
        if (
            str(self.options.get("readchangefeed", "false")).lower()
            == "true"
        ):
            # CDF mode: change rows = data columns + the change
            # metadata, the same shape the delta_lite/iceberg_lite
            # CDF modes emit (version = the instant)
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
            )

            return schema.add(
                StructField("_change_type", StringType())
            ).add(StructField("_commit_version", LongType()))
        return schema

    def streamReader(self, schema) -> HudiLiteStreamReader:
        return HudiLiteStreamReader(schema, self.options)


def read_hudi_stream(
    spark,
    location: str,
    starting_instant: int | None = None,
    read_change_feed: bool = False,
):
    """Convenience wrapper: a streaming DataFrame over the Hudi COW
    table at ``location`` (instants AFTER ``starting_instant`` are
    delivered).

    ``read_change_feed=True`` streams CHANGE rows instead of appends
    (table columns + ``_change_type`` insert/delete +
    ``_commit_version`` = the instant), so a replacecommit (COW
    DELETE/UPDATE/MERGE, clustering) arrives as delete+insert rows
    downstream instead of refusing; deltacommits (MOR) still
    refuse."""
    spark.dataSource.register(HudiLiteDataSource)
    reader = spark.readStream.format("hudi_lite").option(
        "location", location
    )
    if starting_instant is not None:
        reader = reader.option(
            "startingInstant", str(starting_instant)
        )
    if read_change_feed:
        reader = reader.option("readChangeFeed", "true")
    return reader.load()
