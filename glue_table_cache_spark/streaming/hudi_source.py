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
  ``_change_type`` + ``_commit_version`` from the shared window walk
  (:func:`..sources.hudi.hudi_window_units`), so replacecommits
  arrive as delete+insert rows — a retired group still carrying
  LIVE logs delivers deletes of its MERGED pre-state, merged
  executor-side per group (r12) — AND deltacommits arrive as their
  log-decoded update_postimage/delete rows — compaction commits are
  content-preserving and deliver nothing);
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


def _stream_changes(
    location: str, since: int, until: int
) -> list[tuple]:
    """Change partitions for instants ``(since, until]``, from the
    SHARED window walk
    (:func:`..sources.hudi.hudi_window_units` — the same units the
    batch ``table_changes()`` TVF reads): ``("file", path,
    partition_values, change_type, instant)`` per base-slice diff
    (commit adds = inserts; replacecommit retire/replace =
    deletes + inserts; compaction commits advance silently) and
    ``("log", paths, partition_values, instant)`` per deltacommit
    FILE GROUP — all of the group's log files for that instant in
    numeric version order, so netting happens per (instant, group)
    exactly like the batch path; keys are disjoint across groups
    (Hudi's one-file-group-per-key contract), so groups decode in
    parallel.  Row-level upserts/deletes decode EXECUTOR-side in
    :func:`read_log_change_partition`."""
    from glue_table_cache_spark.sources.hudi import (
        _completed_instants,
        _log_version,
        _pv_from_partition_path,
        _resolve_path,
        _timeline_files,
        hudi_window_units,
    )

    names = _timeline_files(location)
    try:
        _completed_instants(names, location)
    except GlueSparkError:
        return []
    out: list[tuple] = []
    for ts, kind, payload in hudi_window_units(
        location, since, until, names=names
    ):
        if kind == "logs":
            groups: dict[str, list[tuple[str, str]]] = {}
            for p, part, fid in payload:
                groups.setdefault(fid, []).append((p, part))
            for fid in sorted(groups):
                items = sorted(
                    groups[fid],
                    key=lambda x: (_log_version(x[0]), x[0]),
                )
                out.append(
                    (
                        "log",
                        [p for p, _part in items],
                        _pv_from_partition_path(items[0][1]),
                        ts,
                    )
                )
            continue
        if kind == "mor_deletes":
            # one partition per retired live-log file group: the
            # group is Hudi's bounded merge unit (base + logs fit the
            # file-group size budget) and groups hold disjoint keys,
            # so they merge executor-side in parallel
            out += [
                ("mor", base_entry, log_entries, ts)
                for base_entry, log_entries in payload
            ]
            continue
        added, removed = payload
        out += [
            (
                "file",
                _resolve_path(location, p),
                _pv_from_partition_path(part),
                "delete",
                ts,
            )
            for p, part in removed
        ]
        out += [
            (
                "file",
                _resolve_path(location, p),
                _pv_from_partition_path(part),
                "insert",
                ts,
            )
            for p, part in added
        ]
    return out


def read_log_change_partition(
    paths: list[str],
    partition_values: dict[str, str],
    schema,
    instant: int,
    record_key_field: str,
) -> Iterator:
    """Executor-side decode of ONE file group's deltacommit log files
    into CDF rows: the block codec runs locally (pure Python), actions
    net to the LAST one per record key across the group's files in
    the caller's (numeric log version) order — the same
    per-(instant, group) netting the batch path performs, so a commit
    whose group rolled over into ``.log.2`` folds after ``.log.1``
    instead of emitting two conflicting rows for one key — and the
    result yields as Arrow batches in the stream's schema: upserts as
    ``update_postimage`` with their decoded payloads, delete blocks
    as key-carrying ``delete`` rows (the key-only posture of Hudi's
    own CDC ``op_key_only`` logging mode), partition columns attached
    from the log files' directory."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    from glue_table_cache_spark.sources.hudi_log import (
        read_log_blocks,
    )
    from glue_table_cache_spark.sources.iceberg import _read_bytes

    last: dict[str, tuple[str, dict | None]] = {}
    for path in paths:
        blocks = read_log_blocks(_read_bytes(path), name=path)
        rolled = {
            b["target_instant"]
            for b in blocks
            if b["type"] == "command" and b.get("target_instant")
        }
        for b in blocks:
            if b["instant"] in rolled:
                continue
            # only THIS instant's blocks: real Hudi appends blocks to
            # existing log files (blocks without an instant header
            # inherit the file's commit = this instant)
            if b["instant"] not in ("", str(instant)):
                continue
            for rec in b["records"]:
                if record_key_field not in rec:
                    raise ValueError(
                        f"log record in {path} lacks record key "
                        f"field {record_key_field!r}"
                    )
                last[str(rec[record_key_field])] = (
                    "update_postimage", rec,
                )
            for k, _part in b["deletes"]:
                last[str(k)] = ("delete", None)
    rows = list(last.items())
    n = len(rows)
    target = to_arrow_schema(schema)
    cols = []
    for field in target:
        nm = field.name
        if nm == "_change_type":
            arr = pa.array([op for _k, (op, _r) in rows])
        elif nm == "_commit_version":
            arr = pa.array([int(instant)] * n)
        elif nm == record_key_field:
            arr = pa.array([k for k, _ in rows])
        elif nm in (partition_values or {}):
            arr = pa.array([partition_values[nm]] * n)
        else:
            arr = pa.array(
                [(r or {}).get(nm) for _k, (_op, r) in rows]
            )
        cols.append(arr.cast(field.type))
    yield from pa.table(cols, schema=target).to_batches()


def read_mor_delete_partition(
    base_entry,
    log_entries,
    schema,
    instant: int,
    record_key_field: str,
) -> Iterator:
    """Executor-side merged pre-state of ONE retired live-log file
    group, emitted as CDF ``delete`` rows: the base parquet and the
    group's version-ordered log files fold to the newest action per
    record key — exactly the snapshot resolution
    :func:`~glue_table_cache_spark.sources.hudi_mor.hudi_mor_read`
    computes with a window, done locally because a file group is
    Hudi's bounded merge unit (its keys are disjoint from every other
    group's, so groups parallelize).  Rows whose newest action is a
    delete block died BEFORE the replacecommit and do not re-emit."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    from glue_table_cache_spark.sources.hudi_log import (
        read_log_blocks,
    )
    from glue_table_cache_spark.sources.iceberg import _read_bytes

    from glue_table_cache_spark.sources.hudi import _log_version

    # key -> (order, op, record, source_pv); order mirrors the MOR
    # window sort (commit, NUMERIC log version, src, blk, rec) —
    # newest wins, and '.log.10' folds after '.log.9' (the
    # lexicographic path string alone would misorder a rollover
    # past version 9).  base_entry=None is a LOG-BORN group (r13):
    # the fold runs without a base seed.
    state: dict[str, tuple] = {}
    if base_entry is not None:
        base_path, base_pv, base_ts = base_entry
        tbl = pq.read_table(io.BytesIO(_read_bytes(base_path)))
        if record_key_field not in tbl.schema.names:
            raise ValueError(
                f"record key field {record_key_field!r} is not in "
                f"the Hudi base file {base_path!r}"
            )
        for rec in tbl.to_pylist():
            k = str(rec[record_key_field])
            state[k] = (
                (str(base_ts), -1, "", -1, -1), "U", rec, base_pv,
            )
    for lpath, lts, lpv in log_entries:
        blocks = read_log_blocks(_read_bytes(lpath), name=lpath)
        rolled = {
            b["target_instant"]
            for b in blocks
            if b["type"] == "command" and b.get("target_instant")
        }
        for bi, b in enumerate(blocks):
            if b["instant"] in rolled:
                continue
            commit = b["instant"] or str(lts)
            ver = _log_version(lpath)
            for ri, rec in enumerate(b["records"]):
                if record_key_field not in rec:
                    raise ValueError(
                        f"log record in {lpath} lacks record key "
                        f"field {record_key_field!r}"
                    )
                k = str(rec[record_key_field])
                order = (commit, ver, lpath, bi, ri)
                if k not in state or order > state[k][0]:
                    state[k] = (order, "U", rec, lpv)
            for ri, (k, _part) in enumerate(b["deletes"]):
                k = str(k)
                order = (commit, ver, lpath, bi, ri)
                if k not in state or order > state[k][0]:
                    state[k] = (order, "D", None, lpv)
    rows = [
        (k, rec, pv)
        for k, (_o, op, rec, pv) in state.items()
        if op == "U"
    ]
    n = len(rows)
    target = to_arrow_schema(schema)
    cols = []
    for field in target:
        nm = field.name
        if nm == "_change_type":
            arr = pa.array(["delete"] * n)
        elif nm == "_commit_version":
            arr = pa.array([int(instant)] * n)
        elif nm == record_key_field:
            arr = pa.array([k for k, _r, _p in rows])
        else:
            arr = pa.array(
                [
                    (
                        r[nm]
                        if r is not None and nm in r
                        else (p or {}).get(nm)
                    )
                    for _k, r, p in rows
                ]
            )
        cols.append(arr.cast(field.type))
    yield from pa.table(cols, schema=target).to_batches()


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


class HudiLogChangePartition(InputPartition):
    """One CDF input partition for ONE FILE GROUP's deltacommit log
    files (version-ordered): the block codec decodes them
    executor-side into per-(instant, group)-netted
    update_postimage/delete rows (:func:`read_log_change_partition`)."""

    def __init__(
        self,
        paths: list[str],
        partition_values: dict[str, str],
        instant: int,
        record_key_field: str,
    ):
        self.paths = paths
        self.partition_values = partition_values
        self.instant = instant
        self.record_key_field = record_key_field


class HudiMorDeletePartition(InputPartition):
    """One CDF input partition for a retired live-log FILE GROUP: its
    base + logs merge executor-side into the pre-state that died with
    the replacecommit (:func:`read_mor_delete_partition`)."""

    def __init__(
        self,
        base_entry,
        log_entries,
        instant: int,
        record_key_field: str,
    ):
        self.base_entry = base_entry
        self.log_entries = log_entries
        self.instant = instant
        self.record_key_field = record_key_field


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
        from glue_table_cache_spark.sources.hudi_mor import (
            DEFAULT_RECORD_KEY,
        )

        self._record_key = options.get(
            "recordkeyfield", DEFAULT_RECORD_KEY
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
            parts: list[InputPartition] = []
            for unit in _stream_changes(
                self._location,
                int(start["instant"]),
                int(end["instant"]),
            ):
                if unit[0] == "log":
                    _kind, paths, pv, ts = unit
                    parts.append(
                        HudiLogChangePartition(
                            paths, pv, ts, self._record_key
                        )
                    )
                elif unit[0] == "mor":
                    _kind, base_entry, log_entries, ts = unit
                    parts.append(
                        HudiMorDeletePartition(
                            base_entry,
                            log_entries,
                            ts,
                            self._record_key,
                        )
                    )
                else:
                    _kind, path, pv, ct, ts = unit
                    parts.append(
                        HudiChangePartition(path, pv, ct, ts)
                    )
            return parts
        return [
            HudiFilePartition(path, pv)
            for path, pv in _stream_adds(
                self._location,
                int(start["instant"]),
                int(end["instant"]),
            )
        ]

    def read(self, partition) -> Iterator:
        if isinstance(partition, HudiMorDeletePartition):
            yield from read_mor_delete_partition(
                partition.base_entry,
                partition.log_entries,
                self._schema,
                partition.instant,
                partition.record_key_field,
            )
            return
        if isinstance(partition, HudiLogChangePartition):
            yield from read_log_change_partition(
                partition.paths,
                partition.partition_values,
                self._schema,
                partition.instant,
                partition.record_key_field,
            )
            return
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
    record_key_field: str | None = None,
):
    """Convenience wrapper: a streaming DataFrame over the Hudi
    table at ``location`` (instants AFTER ``starting_instant`` are
    delivered).

    ``read_change_feed=True`` streams CHANGE rows instead of appends
    (table columns + ``_change_type`` + ``_commit_version`` = the
    instant): a replacecommit (COW DELETE/UPDATE/MERGE, clustering)
    arrives as delete+insert rows, and a MOR deltacommit arrives as
    its log-decoded update_postimage/delete rows (``record_key_field``
    names the key column, default ``_hoodie_record_key``); compaction
    commits deliver nothing (content-preserving)."""
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
    if record_key_field is not None:
        reader = reader.option("recordKeyField", record_key_field)
    return reader.load()
