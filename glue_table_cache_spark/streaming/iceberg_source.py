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
emits nothing, and a snapshot that ADDS position-delete files
synthesizes its per-row delta (the deleted rows read back from the
prior state's files at their ``(file_path, pos)`` targets,
executor-side); a snapshot that ADDS equality-delete files
synthesizes too (r12 — per prior-state file, null-safe value match
under the spec's strictly-less sequence scoping, executor-side).
Delete-file REMOVAL outside a replace synthesizes the resurrected
rows as inserts (r13 — per kept data file, minus what the current
deletes still mask), so the batch/stream refusal matrix stays
identical.  Metadata-only
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
    location: str, snap: dict, names_by_id: dict | None = None
) -> tuple[dict, set[str], dict[str, dict]]:
    """One snapshot's live file state from its manifest list:
    ``(data_files, position_deletes, equality_deletes)`` where
    data_files maps path → ``(stringified partition values, data
    sequence number)`` (the v2 inheritance rule: explicit entry seq,
    else the manifest-list row's, else the snapshot's), position
    deletes are a path set, and equality deletes map path →
    ``{"columns", "seq"}`` with ``equality_ids`` resolved against
    ``names_by_id`` (unresolvable ids refuse — applying is
    impossible, skipping resurrects).  Metadata-scale: the driver
    reads Avro manifests only, never data."""
    from glue_table_cache_spark.sources.avro_lite import read_avro
    from glue_table_cache_spark.sources.iceberg import _resolve_path

    snap_seq = snap.get("sequence-number", 0)
    data: dict[str, tuple[dict[str, str], int]] = {}
    pos_dels: set[str] = set()
    eq_dels: dict[str, dict] = {}
    ml = _resolve_path(location, snap["manifest-list"])
    for row in read_avro(ml):
        is_delete = row.get("content", 0) == 1
        manifest_seq = row.get("sequence_number", snap_seq)
        m = _resolve_path(location, row["manifest_path"])
        for entry in read_avro(m):
            if entry.get("status") == 2:
                continue  # tombstone: the file is not in this state
            seq = entry.get("sequence_number")
            if seq is None:
                seq = manifest_seq
            df_rec = entry["data_file"]
            path = _resolve_path(location, df_rec["file_path"])
            if is_delete:
                if df_rec.get("content", 1) == 2:
                    ids = df_rec.get("equality_ids") or []
                    cols = [
                        (names_by_id or {}).get(i) for i in ids
                    ]
                    if not ids or any(c is None for c in cols):
                        raise GlueSparkError(
                            f"Iceberg EQUALITY delete file {path!r} "
                            f"names equality_ids {ids!r} not "
                            "resolvable against the current schema "
                            "— malformed manifest; refusing"
                        )
                    eq_dels[path] = {
                        "path": path,
                        "columns": cols,
                        "seq": int(seq),
                    }
                else:
                    pos_dels.add(path)
            else:
                pv = df_rec.get("partition") or {}
                data[path] = (
                    {k: str(v) for k, v in pv.items()},
                    int(seq),
                )
    return data, pos_dels, eq_dels


def _posdel_targets(new_pos: list[str]) -> set[str]:
    """The distinct data-file targets the NEW position-delete files
    name, scheme-stripped.  Driver-side, but column-pruned: only the
    ``file_path`` column of each (small) delete file is read — the
    result is bounded by the number of files the DML touched, the
    same order as the manifest walk itself."""
    import pyarrow.parquet as pq

    from glue_table_cache_spark.sources.iceberg import _strip_path

    out: set[str] = set()
    for p in new_pos:
        col = pq.read_table(p, columns=["file_path"]).column(
            "file_path"
        )
        out |= {_strip_path(str(v)) for v in col.to_pylist()}
    return out


def _stream_changes(
    location: str, since_seq: int, until_seq: int
) -> list[tuple]:
    """Change partitions for snapshots ``(since, until]`` — the
    streaming slice of the batch ``table_changes()`` semantics,
    computed as consecutive-snapshot diffs along the sequence axis
    (the stream's own offset order, so a RESTORE branch streams as
    the delete+insert a linear consumer must see):

    * data files added → ``("file", path, pv, "insert", seq,
      mask_pos)`` — rows a SAME-snapshot position delete targets are
      masked out (they were never visible);
    * data files removed → the same shape as ``"delete"`` with
      ``mask_pos`` = the PRIOR state's position-delete files (rows
      they had masked died in an earlier commit);
    * position-delete files ADDED → one ``("posdel", target_path,
      pv, new_pos, prior_pos, seq)`` per targeted data file: the
      executor reads the target's rows at the named positions and
      emits them as delete rows (the r11 row-level synthesis);
    * equality-delete files ADDED → one ``("eqdel", path, pv, fseq,
      new_eq, prior_eq, prior_pos, new_pos, seq)`` per PRIOR-state
      data file (r12): the executor emits the file's rows matching
      the new delete values null-safely under the spec's
      strictly-less sequence scoping, minus rows the prior deletes
      (or the SAME snapshot's new position deletes — the dual-kind
      commit) already killed;
    * a ``replace`` snapshot (compaction) is content-preserving by
      definition and emits nothing;
    * delete-file REMOVAL outside a replace (r13) → one ``("respos",
      …)`` / ``("reseq", …)`` partition per kept data file the
      removed files had masked: the executor resurrects those rows
      as inserts, minus what the current deletes still mask —
      mirroring the batch ``_resurrected_*_rows`` synthesis."""
    from glue_table_cache_spark.sources.iceberg import (
        _field_names_by_id,
        _strip_path,
    )

    meta = _latest_meta(location)
    names_by_id = _field_names_by_id(meta)
    snaps = sorted(
        meta.get("snapshots") or [],
        key=lambda s: s.get("sequence-number", 0),
    )
    prev: dict | None = None
    for s in snaps:
        if s.get("sequence-number", 0) <= since_seq:
            prev = s
    prev_data, prev_pos, prev_eq = (
        _files_at_snapshot(location, prev, names_by_id)
        if prev is not None
        else ({}, set(), {})
    )
    out: list[tuple] = []
    for snap in snaps:
        seq = snap.get("sequence-number", 0)
        if not (since_seq < seq <= until_seq):
            continue
        cur_data, cur_pos, cur_eq = _files_at_snapshot(
            location, snap, names_by_id
        )
        op = (snap.get("summary") or {}).get("operation")
        if op == "replace":
            # compaction rewrites bytes, not content — but only a
            # true rewrite: a "replace" that changed delete files
            # still refuses below
            if cur_pos != prev_pos or set(cur_eq) != set(prev_eq):
                raise GlueSparkError(
                    f"Iceberg snapshot seq {seq} of {location!r} "
                    "is a replace that changed row-level delete "
                    "files — not reconstructible as a changelog"
                )
            prev_data, prev_pos, prev_eq = cur_data, cur_pos, cur_eq
            continue
        # delete-file REMOVAL outside a replace (r13: previously
        # refused toward batch): previously-masked rows of the KEPT
        # data files resurrect as inserts, minus whatever the CURRENT
        # deletes still mask — one executor partition per kept file,
        # the streaming twin of the batch resurrection synthesis
        removed_pos = sorted(prev_pos - cur_pos)
        removed_eq = [
            prev_eq[p]
            for p in sorted(set(prev_eq) - set(cur_eq))
        ]
        new_pos = sorted(cur_pos - prev_pos)
        prior_pos = sorted(prev_pos)
        new_eq = [
            cur_eq[p] for p in sorted(set(cur_eq) - set(prev_eq))
        ]
        prior_eq = [prev_eq[p] for p in sorted(prev_eq)]
        for path in sorted(set(prev_data) - set(cur_data)):
            out.append(
                (
                    "file", path, prev_data[path][0], "delete", seq,
                    prior_pos or None,
                )
            )
        for path in sorted(set(cur_data) - set(prev_data)):
            out.append(
                (
                    "file", path, cur_data[path][0], "insert", seq,
                    new_pos or None,
                )
            )
        if new_pos:
            from glue_table_cache_spark.sources.delta import (
                hadoop_uri_encode,
            )

            targets = _posdel_targets(new_pos)
            # delete files record the _metadata spelling (hadoop URI
            # encoding); manifests carry the raw one — encode before
            # matching, the batch synthesis' convention
            by_stripped = {
                _strip_path(hadoop_uri_encode(p)): (p, pv)
                for p, (pv, _s) in prev_data.items()
            }
            for stripped in sorted(targets):
                hit = by_stripped.get(stripped)
                if hit is None:
                    continue  # targets a file added THIS snapshot:
                    # its insert partition masks those rows instead
                p, pv = hit
                out.append(
                    ("posdel", p, pv, new_pos, prior_pos, seq)
                )
        if new_eq:
            # KEPT files only: rows of a data file REMOVED in this
            # snapshot die once via its full-file delete unit above —
            # an eqdel unit over it would stream a duplicate delete
            for path in sorted(set(prev_data) & set(cur_data)):
                pv, fseq = prev_data[path]
                if not any(fseq < d["seq"] for d in new_eq):
                    continue  # strictly-less scoping: nothing to kill
                out.append(
                    (
                        "eqdel", path, pv, fseq, list(new_eq),
                        list(prior_eq), prior_pos, new_pos, seq,
                    )
                )
        kept = sorted(set(prev_data) & set(cur_data))
        cur_eq_list = [cur_eq[p] for p in sorted(cur_eq)]
        cur_pos_list = sorted(cur_pos)
        if removed_pos and kept:
            from glue_table_cache_spark.sources.delta import (
                hadoop_uri_encode,
            )

            targets = _posdel_targets(removed_pos)
            by_stripped = {
                _strip_path(hadoop_uri_encode(p)): p for p in kept
            }
            for stripped in sorted(targets):
                p = by_stripped.get(stripped)
                if p is None:
                    continue  # dangling: target gone, nothing emits
                pv, fseq = prev_data[p]
                out.append(
                    (
                        "respos", p, pv, fseq, removed_pos,
                        cur_pos_list, cur_eq_list, seq,
                    )
                )
        if removed_eq and kept:
            for p in kept:
                pv, fseq = prev_data[p]
                if not any(fseq < d["seq"] for d in removed_eq):
                    continue  # scoping: the removed file never
                    # applied to this data file
                out.append(
                    (
                        "reseq", p, pv, fseq, removed_eq,
                        removed_pos, cur_pos_list, cur_eq_list, seq,
                    )
                )
        prev_data, prev_pos, prev_eq = cur_data, cur_pos, cur_eq
    return out


class IcebergFilePartition(InputPartition):
    def __init__(self, path: str, partition_values: dict[str, str]):
        self.path = path
        self.partition_values = partition_values


class IcebergChangePartition(InputPartition):
    """One CDF input partition: a data file whose rows all take the
    synthesized ``change_type``, tagged with the snapshot's sequence
    number as ``_commit_version``.  Rows that the position-delete
    files in ``mask_pos`` target are masked OUT of delivery (an
    added file's same-snapshot deletes were never visible; a removed
    file's prior-delete rows died in an earlier commit)."""

    def __init__(
        self,
        path: str,
        partition_values: dict[str, str],
        change_type: str,
        sequence_number: int,
        mask_pos: list[str] | None = None,
    ):
        self.path = path
        self.partition_values = partition_values
        self.change_type = change_type
        self.sequence_number = sequence_number
        self.mask_pos = mask_pos


class IcebergEqDeletePartition(InputPartition):
    """One equality-delete synthesis partition (r12): the rows of
    ``path`` (data sequence ``fseq``) matching any NEW equality
    delete's values null-safely under the strictly-less seq scoping,
    minus rows the prior position/equality deletes or the SAME
    snapshot's new position deletes already killed, emit as
    ``delete`` change rows — the streaming side of the batch
    ``_equality_deleted_rows`` synthesis."""

    def __init__(
        self,
        path: str,
        partition_values: dict[str, str],
        fseq: int,
        new_eq: list[dict],
        prior_eq: list[dict],
        prior_pos: list[str],
        new_pos: list[str],
        sequence_number: int,
    ):
        self.path = path
        self.partition_values = partition_values
        self.fseq = fseq
        self.new_eq = new_eq
        self.prior_eq = prior_eq
        self.prior_pos = prior_pos
        self.new_pos = new_pos
        self.sequence_number = sequence_number


class IcebergResurrectPartition(InputPartition):
    """One delete-file-REMOVAL synthesis partition (r13): the rows of
    ``path`` the removed delete files had masked — position targets
    for ``kind='pos'``, seq-scoped value matches for ``kind='eq'`` —
    minus whatever the CURRENT position/equality deletes still mask,
    emit as ``insert`` change rows: the streaming side of the batch
    ``_resurrected_position_rows`` / ``_resurrected_equality_rows``
    synthesis.  Dual-kind removals stay emit-once: the eq direction
    subtracts the removed position files' targets (the pos direction
    owns those rows)."""

    def __init__(
        self,
        kind: str,
        path: str,
        partition_values: dict[str, str],
        fseq: int,
        removed: list,
        removed_pos: list[str],
        cur_pos: list[str],
        cur_eq: list[dict],
        sequence_number: int,
    ):
        self.kind = kind
        self.path = path
        self.partition_values = partition_values
        self.fseq = fseq
        self.removed = removed
        self.removed_pos = removed_pos
        self.cur_pos = cur_pos
        self.cur_eq = cur_eq
        self.sequence_number = sequence_number


class IcebergPosDeletePartition(InputPartition):
    """One row-level-delete partition: the rows of ``path`` that the
    snapshot's NEW position-delete files (``new_pos``) target, minus
    pairs an OLDER delete file (``prior_pos``) already masked, emit
    as ``delete`` change rows — the streaming side of the batch
    synthesis."""

    def __init__(
        self,
        path: str,
        partition_values: dict[str, str],
        new_pos: list[str],
        prior_pos: list[str],
        sequence_number: int,
    ):
        self.path = path
        self.partition_values = partition_values
        self.new_pos = new_pos
        self.prior_pos = prior_pos
        self.sequence_number = sequence_number


def _positions_for(
    path: str, pos_files: list[str],
    minus: list[str] | None = None,
) -> list[int]:
    """Executor-side: the row positions within ONE data file that
    ``pos_files`` target (optionally minus those ``minus`` files
    already targeted), from column-pruned reads of the (small)
    position-delete parquet."""
    import pyarrow.parquet as pq

    from glue_table_cache_spark.sources.delta import (
        hadoop_uri_encode,
    )
    from glue_table_cache_spark.sources.iceberg import _strip_path

    want = _strip_path(hadoop_uri_encode(path))

    def pairs(files: list[str]) -> set[int]:
        out: set[int] = set()
        for p in files:
            t = pq.read_table(p, columns=["file_path", "pos"])
            for fp, pos in zip(
                t.column("file_path").to_pylist(),
                t.column("pos").to_pylist(),
            ):
                if _strip_path(str(fp)) == want:
                    out.add(int(pos))
        return out

    got = pairs(pos_files)
    if minus:
        got -= pairs(minus)
    return sorted(got)


def _eq_match_positions(
    path: str,
    fseq: int,
    eq_files: list[dict],
    phys_of: dict[str, str] | None = None,
) -> set[int]:
    """Executor-side: the row positions within ONE data file whose
    values null-safe match any row of the equality-delete files in
    ``eq_files`` whose sequence number is STRICTLY greater than the
    file's (the spec's scoping) — column-pruned reads of both sides,
    value tuples compared in Python (a file group's rows are the
    bounded unit).  ``phys_of`` maps logical → physical spellings for
    the DATA file's columns on renamed tables."""
    import pyarrow.parquet as pq

    out: set[int] = set()
    by_cols: dict[tuple[str, ...], list[dict]] = {}
    for d in eq_files:
        if int(fseq) < int(d["seq"]):
            by_cols.setdefault(tuple(d["columns"]), []).append(d)
    if not by_cols:
        return out
    for cols, dels in by_cols.items():
        kill: set[tuple] = set()
        for d in dels:
            # a delete file written BEFORE a rename spells the old
            # physical name; one written after (or on an unmapped
            # table) the logical one — resolve per file against its
            # own schema
            avail = set(pq.read_schema(d["path"]).names)
            pick = []
            for c in cols:
                phys = (phys_of or {}).get(c, c)
                if c in avail:
                    pick.append(c)
                elif phys in avail:
                    pick.append(phys)
                else:
                    raise ValueError(
                        f"equality delete file {d['path']!r} "
                        f"carries neither {c!r} nor its physical "
                        f"spelling {phys!r}"
                    )
            t = pq.read_table(d["path"], columns=pick)
            kill |= set(
                zip(*(t.column(c).to_pylist() for c in pick))
            )
        davail = set(pq.read_schema(path).names)
        pcols = []
        for c in cols:
            phys = (phys_of or {}).get(c, c)
            pcols.append(phys if phys in davail else c)
        data = pq.read_table(path, columns=pcols)
        for i, tup in enumerate(
            zip(*(data.column(c).to_pylist() for c in pcols))
        ):
            if tup in kill:
                out.add(i)
    return out


class IcebergLiteStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self._location = options.get("location") or options.get("path")
        if not self._location:
            raise GlueSparkError(
                "iceberg_lite needs a table location: "
                ".option('location', ...) or .load(path)"
            )
        self._schema = schema
        # RENAMED tables (name mapping): files carry the pinned
        # PHYSICAL spellings; each logical field reads its physical
        # column (stable across renames — resolved once, driver)
        from glue_table_cache_spark.sources.iceberg import (
            iceberg_column_mapping,
        )

        renames, _dead = iceberg_column_mapping(
            _latest_meta(self._location)
        )
        self._phys_of = (
            {v: k for k, v in renames.items()} if renames else None
        )
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
            parts: list[InputPartition] = []
            for unit in _stream_changes(
                self._location,
                int(start["seq"]),
                int(end["seq"]),
            ):
                if unit[0] == "posdel":
                    _k, path, pv, new_pos, prior_pos, seq = unit
                    parts.append(
                        IcebergPosDeletePartition(
                            path, pv, new_pos, prior_pos, seq
                        )
                    )
                elif unit[0] == "eqdel":
                    (
                        _k, path, pv, fseq, new_eq, prior_eq,
                        prior_pos, new_pos, seq,
                    ) = unit
                    parts.append(
                        IcebergEqDeletePartition(
                            path, pv, fseq, new_eq, prior_eq,
                            prior_pos, new_pos, seq,
                        )
                    )
                elif unit[0] == "respos":
                    (
                        _k, path, pv, fseq, removed_pos,
                        cur_pos, cur_eq, seq,
                    ) = unit
                    parts.append(
                        IcebergResurrectPartition(
                            "pos", path, pv, fseq, removed_pos,
                            removed_pos, cur_pos, cur_eq, seq,
                        )
                    )
                elif unit[0] == "reseq":
                    (
                        _k, path, pv, fseq, removed_eq,
                        removed_pos, cur_pos, cur_eq, seq,
                    ) = unit
                    parts.append(
                        IcebergResurrectPartition(
                            "eq", path, pv, fseq, removed_eq,
                            removed_pos, cur_pos, cur_eq, seq,
                        )
                    )
                else:
                    _k, path, pv, ct, seq, mask = unit
                    parts.append(
                        IcebergChangePartition(
                            path, pv, ct, seq, mask
                        )
                    )
            return parts
        return [
            IcebergFilePartition(path, pv)
            for path, pv in _stream_adds(
                self._location, int(start["seq"]), int(end["seq"])
            )
        ]

    def read(self, partition) -> Iterator:
        if isinstance(partition, IcebergResurrectPartition):
            if partition.kind == "pos":
                keep = set(
                    _positions_for(
                        partition.path,
                        partition.removed,
                        minus=partition.cur_pos,
                    )
                )
            else:
                keep = _eq_match_positions(
                    partition.path,
                    partition.fseq,
                    partition.removed,
                    phys_of=self._phys_of,
                )
                if keep:
                    # the pos direction owns dual-kind-masked rows,
                    # and rows current position deletes still target
                    # never became visible
                    keep -= set(
                        _positions_for(
                            partition.path,
                            list(partition.removed_pos)
                            + list(partition.cur_pos),
                        )
                    )
            if keep and partition.cur_eq:
                # surviving equality deletes still mask these
                keep -= _eq_match_positions(
                    partition.path,
                    partition.fseq,
                    partition.cur_eq,
                    phys_of=self._phys_of,
                )
            if keep:
                yield from read_file_partition(
                    partition.path,
                    partition.partition_values,
                    self._schema,
                    constants={
                        "_change_type": "insert",
                        "_commit_version": partition.sequence_number,
                    },
                    row_indices=sorted(keep),
                    physical_names=self._phys_of,
                )
            return
        if isinstance(partition, IcebergEqDeletePartition):
            matched = _eq_match_positions(
                partition.path,
                partition.fseq,
                partition.new_eq,
                phys_of=self._phys_of,
            )
            if matched:
                # a row dies once: subtract what the prior deletes
                # (or the same snapshot's new position deletes — the
                # dual-kind commit) already killed
                dead = set(
                    _positions_for(
                        partition.path,
                        list(partition.prior_pos)
                        + list(partition.new_pos),
                    )
                )
                dead |= _eq_match_positions(
                    partition.path,
                    partition.fseq,
                    partition.prior_eq,
                    phys_of=self._phys_of,
                )
                matched -= dead
            if matched:
                yield from read_file_partition(
                    partition.path,
                    partition.partition_values,
                    self._schema,
                    constants={
                        "_change_type": "delete",
                        "_commit_version": partition.sequence_number,
                    },
                    row_indices=sorted(matched),
                    physical_names=self._phys_of,
                )
            return
        if isinstance(partition, IcebergPosDeletePartition):
            keep = _positions_for(
                partition.path,
                partition.new_pos,
                minus=partition.prior_pos,
            )
            if keep:
                yield from read_file_partition(
                    partition.path,
                    partition.partition_values,
                    self._schema,
                    constants={
                        "_change_type": "delete",
                        "_commit_version": partition.sequence_number,
                    },
                    row_indices=keep,
                    physical_names=self._phys_of,
                )
            return
        if isinstance(partition, IcebergChangePartition):
            skip = (
                _positions_for(partition.path, partition.mask_pos)
                if partition.mask_pos
                else None
            )
            yield from read_file_partition(
                partition.path,
                partition.partition_values,
                self._schema,
                constants={
                    "_change_type": partition.change_type,
                    "_commit_version": partition.sequence_number,
                },
                skip_positions=skip,
                physical_names=self._phys_of,
            )
            return
        yield from read_file_partition(
            partition.path,
            partition.partition_values,
            self._schema,
            physical_names=self._phys_of,
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
    a mid-stream overwrite arrives as change rows, a row-level
    DELETE (position or equality deletes) as its SYNTHESIZED deleted
    rows, and a delete-file removal as its resurrected inserts;
    compaction (``replace``) emits nothing."""
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
