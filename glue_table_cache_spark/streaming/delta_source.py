"""Structured-Streaming SOURCE over this repo's Delta tables.

Closes the streaming loop the r5 sink opened: tables published by
:func:`..sinks.delta_write.write_delta_append` (or the exactly-once
sink :func:`.delta_sink.stream_to_delta`) can now be CONSUMED as a
micro-batch stream — ``spark.readStream.format("delta_lite")`` — with
Spark's own checkpointing tracking the consumed log version, so a
restarted query resumes exactly where it stopped.  Composed with the
sink's SetTransaction idempotence, source→transform→sink is
exactly-once end to end across crashes.

Implementation is the public PySpark 4 Python Data Source API
(``pyspark.sql.datasource.DataSourceStreamReader``), the Spark-native
shape for a custom streaming source:

* OFFSETS are Delta log versions (``{"version": N}`` = commits ≤ N
  consumed) — checkpointed by Spark, replayed deterministically;
* ``partitions(start, end)`` walks the JSON commits in the range
  driver-side (metadata-scale, the same walk as
  :func:`..sources.delta.delta_changes`) and emits ONE input
  partition per added data file, so the actual parquet reads are
  DISTRIBUTED across executors;
* ``read`` runs on executors and yields Arrow record batches
  (pyarrow read, cast to the table's logical schema; hive partition
  values from the add action's ``partitionValues`` are attached as
  constant columns) — no row-at-a-time Python;
* append-only semantics, like a real Delta streaming source: a
  ``remove`` with ``dataChange`` in the range refuses loudly unless
  ``ignoreChanges`` is set (updates/deletes cannot be represented in
  an append stream), while OPTIMIZE's ``dataChange: false``
  bookkeeping is always skipped — compaction must not re-deliver
  rows; an add carrying a deletion vector always refuses (delivering
  the file raw would resurrect its deleted rows).

Scale shape: per micro-batch the driver touches only the commit JSON
tail (bounded by the checkpoint interval); file reads fan out one
partition per file.
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


class DeltaFilePartition(InputPartition):
    def __init__(self, path: str, partition_values: dict[str, str]):
        self.path = path
        self.partition_values = partition_values


class DeltaChangePartition(InputPartition):
    """One CDF input partition: a data or ``_change_data`` file plus
    the change metadata to attach.  ``change_type=None`` means the
    file CARRIES its own ``_change_type`` column (a writer-produced
    cdc file); a string means every row takes that synthesized type."""

    def __init__(
        self,
        path: str,
        partition_values: dict[str, str],
        change_type: str | None,
        version: int,
    ):
        self.path = path
        self.partition_values = partition_values
        self.change_type = change_type
        self.version = version


def read_file_partition(
    path, partition_values, schema, constants=None,
    physical_names=None, row_indices=None, skip_positions=None,
    name_tree=None,
) -> "Iterator":
    """Executor-side file read shared by the table-format streaming
    sources: one parquet file → Arrow record batches cast to the
    table's logical ``schema``, with hive partition values attached as
    constant columns and evolved-away columns surfaced as nulls (the
    batch scan's semantics).  ``constants`` attach typed per-partition
    constants (the CDF mode's ``_change_type``/``_commit_version``)
    that take precedence over file columns of the same name.
    ``physical_names`` maps logical field name → the PHYSICAL column
    spelling column-mapped files carry (``None`` = unmapped).
    ``name_tree`` (r14) is
    :func:`..sources.delta.column_mapping_name_tree` — the per-level
    physical→logical pairs; when given, nested renames match BY
    PHYSICAL NAME instead of position, so a file whose struct dropped
    one field and added another at the same arity keeps the unmatched
    file names and the name-matched cast refuses loudly rather than
    surfacing the wrong column's data.
    ``row_indices`` restricts delivery to those row positions;
    ``skip_positions`` drops them instead (vectorized boolean mask —
    the position-delete masking input, no per-row Python)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    def _graft_names(at, lt):
        """The file's arrow type with the LOGICAL type's field names
        grafted on positionally, every level (nested column mapping
        renames names, never structure or order) — the zero-copy
        ``view`` target that relabels a physical-named nested column.
        A structural mismatch (nested evolution under mapping) keeps
        the file type; the name-based cast below then refuses loudly
        instead of mislabeling fields.  Positional fallback for
        callers that pass no ``name_tree`` (the Iceberg source, whose
        schema authority is field ids)."""
        if (
            pa.types.is_struct(at)
            and pa.types.is_struct(lt)
            and at.num_fields == lt.num_fields
        ):
            return pa.struct(
                [
                    pa.field(
                        lt.field(i).name,
                        _graft_names(
                            at.field(i).type, lt.field(i).type
                        ),
                        at.field(i).nullable,
                    )
                    for i in range(at.num_fields)
                ]
            )
        if (
            pa.types.is_list(at) or pa.types.is_large_list(at)
        ) and (
            pa.types.is_list(lt) or pa.types.is_large_list(lt)
        ):
            inner = _graft_names(at.value_type, lt.value_type)
            return (
                pa.large_list(inner)
                if pa.types.is_large_list(at)
                else pa.list_(inner)
            )
        if pa.types.is_map(at) and pa.types.is_map(lt):
            return pa.map_(
                _graft_names(at.key_type, lt.key_type),
                _graft_names(at.item_type, lt.item_type),
            )
        return at

    def _graft_by_tree(at, node):
        """The file's arrow type with logical names grafted on by
        PHYSICAL-NAME match against the schemaString's mapping tree
        (r14).  A file field with no tree entry keeps its file name —
        the cast below then refuses loudly on the missing logical
        field instead of mislabeling."""
        if node is None:
            return at
        if pa.types.is_struct(at) and "struct" in node:
            fields = []
            for i in range(at.num_fields):
                f = at.field(i)
                ent = node["struct"].get(f.name)
                if ent is None:
                    fields.append(f)
                else:
                    logical, sub = ent
                    fields.append(
                        pa.field(
                            logical,
                            _graft_by_tree(f.type, sub),
                            f.nullable,
                        )
                    )
            return pa.struct(fields)
        if (
            pa.types.is_list(at) or pa.types.is_large_list(at)
        ) and "array" in node:
            inner = _graft_by_tree(at.value_type, node["array"])
            return (
                pa.large_list(inner)
                if pa.types.is_large_list(at)
                else pa.list_(inner)
            )
        if pa.types.is_map(at) and "map" in node:
            k, v = node["map"]
            return pa.map_(
                _graft_by_tree(at.key_type, k),
                _graft_by_tree(at.item_type, v),
            )
        return at

    target = to_arrow_schema(schema)
    table = pq.read_table(path)
    if row_indices is not None:
        table = table.take(row_indices)
    if skip_positions:
        import numpy as np

        mask = np.ones(table.num_rows, dtype=bool)
        mask[np.fromiter(skip_positions, dtype=np.int64)] = False
        table = table.filter(pa.array(mask))
    n = table.num_rows
    cols = []
    for field in target:
        fname = (
            physical_names.get(field.name, field.name)
            if physical_names
            else field.name
        )
        if constants and field.name in constants:
            cols.append(
                pa.array([constants[field.name]] * n).cast(field.type)
            )
        elif fname in table.column_names:
            col = table.column(fname)
            if (
                physical_names
                and pa.types.is_nested(field.type)
                and col.type != field.type
            ):
                # nested column mapping: relabel the physical field
                # names to the logical ones (zero-copy view — same
                # layout, different names), then the name-matched
                # cast handles any leaf-type promotion.  With a
                # name_tree the relabel matches by physical name;
                # positional only for tree-less callers
                if name_tree is not None:
                    ent = (name_tree.get("struct") or {}).get(fname)
                    col = col.combine_chunks().view(
                        _graft_by_tree(
                            col.type, ent[1] if ent else None
                        )
                    )
                else:
                    col = col.combine_chunks().view(
                        _graft_names(col.type, field.type)
                    )
            cols.append(col.cast(field.type))
        elif partition_values and (
            fname in partition_values
            or field.name in partition_values
        ):
            # id/name-mapped tables key add-action partitionValues
            # by the PHYSICAL spelling; unmapped ones by the logical
            v = partition_values.get(
                fname, partition_values.get(field.name)
            )
            cols.append(pa.array([v] * n).cast(field.type))
        else:
            cols.append(pa.nulls(n, type=field.type))
    yield from pa.table(cols, schema=target).to_batches()


def _latest_version(location: str) -> int:
    from glue_table_cache_spark.sources.delta import (
        _COMMIT_RE,
        _log_files,
    )

    versions = [
        int(m.group(1))
        for p in _log_files(location)
        if (m := _COMMIT_RE.search(p))
    ]
    if not versions:
        raise GlueSparkError(
            f"No Delta log found under {location!r}/_delta_log"
        )
    return max(versions)


def _stream_adds(
    location: str,
    since_version: int,
    until_version: int,
    ignore_changes: bool,
) -> list[tuple[str, dict[str, str]]]:
    """``(path, partition_values)`` per row-delivering add in commits
    ``(since, until]`` — the streaming-read slice of the log walk.
    Unlike :func:`..sources.delta.delta_changes` (a file-level diff
    where adds and removes cancel), a STREAM must deliver every
    ``dataChange`` add exactly once even if a later commit removed the
    file again — the rows were appended, consumers saw them."""
    from urllib.parse import unquote

    from glue_table_cache_spark.sources.delta import (
        _COMMIT_RE,
        _log_files,
        _resolve_path,
    )
    from glue_table_cache_spark.sources.iceberg import _read_bytes

    commits = {
        int(m.group(1)): p
        for p in _log_files(location)
        if (m := _COMMIT_RE.search(p))
    }
    adds: list[tuple[str, dict[str, str]]] = []
    for v in range(since_version + 1, until_version + 1):
        if v not in commits:
            raise GlueSparkError(
                f"Delta log for {location!r} is missing commit {v}; "
                "the stream cannot reconstruct the range — restart "
                "the query from a fresh checkpoint"
            )
        for line in _read_bytes(commits[v]).splitlines():
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if action.get("add"):
                a = action["add"]
                if not a.get("dataChange", True):
                    continue  # OPTIMIZE bookkeeping: no new rows
                if a.get("deletionVector"):
                    raise GlueSparkError(
                        f"Delta commit {v} of {location!r} adds "
                        f"{a.get('path')!r} with a deletion vector — "
                        "an append stream cannot represent row-level "
                        "deletes; process the table in batch via "
                        "delta_cdf() instead"
                    )
                adds.append(
                    (
                        _resolve_path(location, unquote(a["path"])),
                        a.get("partitionValues") or {},
                    )
                )
            elif action.get("remove"):
                if action["remove"].get("dataChange", True) and (
                    not ignore_changes
                ):
                    raise GlueSparkError(
                        f"Delta commit {v} of {location!r} removes "
                        f"{action['remove'].get('path')!r} with "
                        "dataChange — the table is not append-only; "
                        "set ignoreChanges=true to skip removes "
                        "(updates are then NOT re-delivered) or "
                        "process in batch via delta_cdf()"
                    )
    return adds


def _stream_changes(
    location: str,
    since_version: int,
    until_version: int,
) -> list[tuple[str, dict, str | None, int]]:
    """``(path, partition_values, change_type, version)`` per
    change-delivering file in commits ``(since, until]`` — the
    streaming slice of :func:`..sources.delta.delta_cdf`'s per-commit
    classification: writer-produced ``cdc`` files represent their
    commit exactly (``change_type=None``: the file carries the
    column); a commit without them synthesizes insert rows from
    ``dataChange`` adds and delete rows from ``dataChange`` removes;
    a DV attach without cdc refuses (the changed-row set is not
    reconstructible from the log alone)."""
    from urllib.parse import unquote

    from glue_table_cache_spark.sources.delta import (
        _COMMIT_RE,
        _log_files,
        _resolve_path,
    )
    from glue_table_cache_spark.sources.iceberg import _read_bytes

    commits = {
        int(m.group(1)): p
        for p in _log_files(location)
        if (m := _COMMIT_RE.search(p))
    }
    out: list[tuple[str, dict, str | None, int]] = []
    for v in range(since_version + 1, until_version + 1):
        if v not in commits:
            raise GlueSparkError(
                f"Delta log for {location!r} is missing commit {v}; "
                "the change window is not reconstructible — restart "
                "the query from a fresh checkpoint"
            )
        cdc: list[tuple[str, dict]] = []
        adds: list[tuple[str, dict]] = []
        removes: list[tuple[str, dict]] = []
        dv_attached = False
        for line in _read_bytes(commits[v]).splitlines():
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if action.get("cdc"):
                c = action["cdc"]
                cdc.append(
                    (
                        _resolve_path(location, unquote(c["path"])),
                        c.get("partitionValues") or {},
                    )
                )
            elif action.get("add"):
                a = action["add"]
                if a.get("deletionVector"):
                    dv_attached = True
                if a.get("dataChange", True):
                    adds.append(
                        (
                            _resolve_path(
                                location, unquote(a["path"])
                            ),
                            a.get("partitionValues") or {},
                        )
                    )
            elif action.get("remove"):
                r = action["remove"]
                # a retired file that carried a DV: live rows = file
                # minus positions, unrecoverable from the log alone
                if r.get("deletionVector"):
                    dv_attached = True
                if r.get("dataChange", True):
                    removes.append(
                        (
                            _resolve_path(
                                location, unquote(r["path"])
                            ),
                            r.get("partitionValues") or {},
                        )
                    )
        if cdc:
            out += [(p, pv, None, v) for p, pv in cdc]
            continue
        if dv_attached:
            raise GlueSparkError(
                f"Delta commit {v} of {location!r} attaches deletion "
                "vectors without cdc actions — the changed-row set is "
                "not reconstructible from the log alone; enable "
                "delta.enableChangeDataFeed on the writer"
            )
        out += [(p, pv, "insert", v) for p, pv in adds]
        out += [(p, pv, "delete", v) for p, pv in removes]
    return out


class DeltaLiteStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self._location = options.get("location") or options.get("path")
        if not self._location:
            raise GlueSparkError(
                "delta_lite needs a table location: "
                ".option('location', ...) or .load(path)"
            )
        self._schema = schema
        # column-mapped tables: files carry PHYSICAL names; resolve
        # each logical field to its physical spelling once (driver),
        # executors read by it.  Resolved at reader construction —
        # physical names are stable across renames, so a restart
        # after an ALTER keeps reading the same columns.
        from glue_table_cache_spark.sources.delta import (
            _replay,
            column_mapping_name_tree,
            column_mapping_renames,
        )

        _active, state = _replay(self._location)
        renames = column_mapping_renames(
            state.get("metaData"), allow_nested=True
        )
        self._phys_of = (
            {v: k for k, v in renames.items()} if renames else None
        )
        # nested physical→logical pairs: the by-name graft input (a
        # plain dict tree, pickled to executors with the reader)
        self._name_tree = column_mapping_name_tree(
            state.get("metaData")
        )
        self._ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self._cdf = (
            str(options.get("readchangefeed", "false")).lower()
            == "true"
        )
        start = options.get("startingversion")
        # default: deliver the table from version 0 (the whole history
        # of appends == the current content for append-only tables)
        self._initial = int(start) - 1 if start is not None else -1

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        return {"version": _latest_version(self._location)}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        if self._cdf:
            return [
                DeltaChangePartition(path, pv, ct, v)
                for path, pv, ct, v in _stream_changes(
                    self._location,
                    int(start["version"]),
                    int(end["version"]),
                )
            ]
        return [
            DeltaFilePartition(path, pv)
            for path, pv in _stream_adds(
                self._location,
                int(start["version"]),
                int(end["version"]),
                self._ignore_changes,
            )
        ]

    def read(self, partition) -> Iterator:
        if isinstance(partition, DeltaChangePartition):
            constants = {"_commit_version": partition.version}
            if partition.change_type is not None:
                constants["_change_type"] = partition.change_type
            yield from read_file_partition(
                partition.path,
                partition.partition_values,
                self._schema,
                constants=constants,
                physical_names=self._phys_of,
                name_tree=self._name_tree,
            )
            return
        yield from read_file_partition(
            partition.path,
            partition.partition_values,
            self._schema,
            physical_names=self._phys_of,
            name_tree=self._name_tree,
        )

    def commit(self, end: dict) -> None:
        pass  # Spark's checkpoint owns consumed-offset durability


class DeltaLiteDataSource(DataSource):
    """``spark.dataSource.register(DeltaLiteDataSource)`` then
    ``spark.readStream.format("delta_lite").option("location", loc)``.
    The schema is the table log's authoritative ``schemaString``
    (evolved columns surface as nulls for pre-evolution files).
    Column-mapped tables stream fine: each logical field reads its
    PHYSICAL column spelling (stable across renames), and nested
    mapping (r13) relabels struct/array/map levels positionally at
    read time — the streaming twin of the batch scan's
    ``apply_column_mapping``."""

    @classmethod
    def name(cls) -> str:
        return "delta_lite"

    def schema(self):
        from glue_table_cache_spark.sources.delta import delta_scan_info

        location = self.options.get("location") or self.options.get(
            "path"
        )
        if not location:
            raise GlueSparkError(
                "delta_lite needs a table location: "
                ".option('location', ...) or .load(path)"
            )
        _entries, _renames, schema = delta_scan_info(
            location, with_schema=True, allow_nested_mapping=True
        )
        if schema is None:
            raise GlueSparkError(
                f"Delta log for {location!r} carries no schemaString"
            )
        if (
            str(self.options.get("readchangefeed", "false")).lower()
            == "true"
        ):
            # CDF mode: change rows = data columns + the change
            # metadata (the delta_cdf batch shape)
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
            )

            return schema.add(
                StructField("_change_type", StringType())
            ).add(StructField("_commit_version", LongType()))
        return schema

    def streamReader(self, schema) -> DeltaLiteStreamReader:
        return DeltaLiteStreamReader(schema, self.options)


def register_delta_source(spark) -> None:
    """Idempotently register the ``delta_lite`` streaming source on
    the session."""
    spark.dataSource.register(DeltaLiteDataSource)


def read_delta_stream(
    spark,
    location: str,
    starting_version: int | None = None,
    ignore_changes: bool = False,
    read_change_feed: bool = False,
):
    """Convenience wrapper: a streaming DataFrame over the Delta table
    at ``location``.  Pair with
    :func:`.delta_sink.stream_to_delta` for an exactly-once
    table→table pipeline.

    ``read_change_feed=True`` streams CHANGE rows instead of appends:
    the table's columns plus ``_change_type`` (insert / delete /
    update_preimage / update_postimage — writer cdc files pass their
    stored types through, plain commits synthesize insert/delete) and
    ``_commit_version``, so a mid-stream DELETE arrives as delete rows
    downstream instead of refusing the remove action."""
    register_delta_source(spark)
    reader = spark.readStream.format("delta_lite").option(
        "location", location
    )
    if starting_version is not None:
        reader = reader.option("startingVersion", str(starting_version))
    if ignore_changes:
        reader = reader.option("ignoreChanges", "true")
    if read_change_feed:
        reader = reader.option("readChangeFeed", "true")
    return reader.load()
