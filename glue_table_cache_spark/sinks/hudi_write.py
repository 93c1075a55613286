"""Append-only Hudi COPY_ON_WRITE writer: atomic instant publishing.

Completes the three-format writer suite
(:mod:`glue_table_cache_spark.sinks.delta_write`,
:mod:`glue_table_cache_spark.sinks.iceberg_write`): data files are
staged invisibly, then ONE ``O_EXCL`` create of
``.hoodie/<instant>.commit`` publishes them — an uncommitted instant's
files are never scanned (the timeline walk reads completed instants
only), so readers flip atomically; two concurrent writers serialize on
the instant file and the loser retries with the next instant.

Appends write NEW file groups (one fresh ``fileId`` per part file) —
the insert path.  Upserts/deletes need record-key indexing and file-
group rewrite (or MOR logs) and are out of scope; the commit's write
stats carry ``fileId``/``path``/``partitionPath`` exactly as the
in-repo timeline walk, MOR merge, and ``hudi_changes`` incremental
feed consume them.  Instants use the Hudi ``yyyyMMddHHmmss`` form and
are forced strictly increasing past the existing timeline (a wall
clock that collides or runs backwards bumps forward instead of
colliding)."""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame

from glue_table_cache_spark.errors import GlueSparkError

_INSTANT_RE = re.compile(r"/(\d+)(?:_\d+)?\.\w+(?:\.\w+)?$")


def _latest_instant(hoodie: Path) -> int:
    latest = 0
    for p in hoodie.iterdir():
        m = _INSTANT_RE.search("/" + p.name)
        if m:
            latest = max(latest, int(m.group(1)))
    return latest


def _last_txn(location: str, app_id: str) -> tuple[int, str] | None:
    """``(version, instant)`` of the highest ``txn-version`` recorded
    for ``app_id`` across the timeline's COMPLETED instants'
    ``extraMetadata`` — the Hudi home for writer checkpoints (real
    Hudi streams store their source checkpoints in commit metadata the
    same way).  Commit bodies that are not JSON maps are skipped:
    they cannot carry our marker."""
    hoodie = Path(location) / ".hoodie"
    if not hoodie.is_dir():
        return None
    best: tuple[int, str] | None = None
    for p in sorted(hoodie.iterdir()):
        if p.suffix not in (".commit", ".deltacommit", ".replacecommit"):
            continue
        try:
            body = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        extra = (
            body.get("extraMetadata")
            if isinstance(body, dict)
            else None
        ) or {}
        if extra.get("txn-app-id") != app_id:
            continue
        try:
            v = int(extra["txn-version"])
        except (KeyError, ValueError):
            continue
        if best is None or v > best[0]:
            best = (v, p.stem)
    return best


def hudi_last_txn_version(location: str, app_id: str) -> int | None:
    """Exactly-once helper (the Hudi sibling of
    ``iceberg_last_txn_version``): the highest committed
    ``txn-version`` for ``app_id`` at ``location``, or ``None`` if the
    app never committed.  Retention caveat: the marker lives in
    timeline commit files, so archiving/cleaning the timeline past the
    longest possible stream outage loses a restarted query's
    high-water mark."""
    last = _last_txn(location, app_id)
    return None if last is None else last[0]


def _resolve_record_schema(
    location: str, df: DataFrame, merge_schema: bool,
    effective_type: str,
):
    """The FULL table schema this commit re-records: the recorded
    schema (from the newest instant's ``extraMetadata.schema``) with
    drift refused and new columns appended under the ``merge_schema``
    gate — or the batch's own schema for a fresh/unrecorded table."""
    from glue_table_cache_spark.sources.hudi import hudi_table_schema

    table_schema = hudi_table_schema(location)
    if table_schema is None:
        return df.schema
    existing = {f.name: f.dataType for f in table_schema.fields}
    drift = sorted(
        f.name
        for f in df.schema.fields
        if f.name in existing and existing[f.name] != f.dataType
    )
    if drift:
        raise GlueSparkError(
            f"append changes the type of column(s) {drift} — type "
            "evolution is not supported; cast the batch to the "
            "table schema"
        )
    new_fields = [
        f for f in df.schema.fields if f.name not in existing
    ]
    if not new_fields:
        return table_schema
    if not merge_schema:
        raise GlueSparkError(
            "append carries new column(s) "
            f"{[f.name for f in new_fields]} the table schema "
            "lacks — without schema evolution they would be "
            "silently invisible to readers; pass merge_schema=True "
            "to evolve, or drop them"
        )
    if effective_type == "MERGE_ON_READ":
        raise GlueSparkError(
            "schema evolution on a MERGE_ON_READ table is not "
            "supported: pending log blocks carry their own record "
            "schemas the snapshot merge would have to reconcile; "
            "compact first (compact_hudi), or keep the batch to "
            "the table schema"
        )
    from pyspark.sql.types import StructType

    return StructType(list(table_schema.fields) + new_fields)


def alter_hudi_add_columns(
    location: str,
    columns,
    max_commit_retries: int = 10,
) -> str:
    """``ALTER TABLE ... ADD COLUMNS`` as a SCHEMA-ONLY commit: one
    instant with empty write stats whose ``extraMetadata.schema``
    records the widened Avro schema (Hudi's own schema-tracking
    mechanism, the newest instant's schema is the readers'
    authority); no data files change — pre-alter rows surface nulls.

    ``columns`` is a ``StructType`` or list of ``StructField``; added
    columns must be nullable; duplicate names refuse.
    COPY_ON_WRITE only: MERGE_ON_READ log blocks carry their own
    record schemas that the snapshot merge would have to reconcile —
    same refusal as the append path's evolution gate."""
    from pyspark.sql.types import StructField, StructType

    fields = list(
        columns.fields if isinstance(columns, StructType) else columns
    )
    if not fields:
        raise GlueSparkError("ADD COLUMNS: empty column list")
    bad = [f.name for f in fields if not f.nullable]
    if bad:
        raise GlueSparkError(
            f"ADD COLUMNS: column(s) {bad} are non-nullable — "
            "existing rows have no values for them"
        )
    if "://" in location:
        raise GlueSparkError(
            "alter_hudi_add_columns commits via filesystem "
            "put-if-absent; object stores need an external commit "
            "coordinator"
        )
    base = Path(location)
    hoodie = base / ".hoodie"
    props = hoodie / "hoodie.properties"
    if props.exists():
        m = re.search(
            r"hoodie\.table\.type\s*=\s*(\S+)", props.read_text()
        )
        if m and m.group(1).upper() == "MERGE_ON_READ":
            raise GlueSparkError(
                "ALTER on a MERGE_ON_READ table: pending log blocks "
                "carry their own record schemas — compact first"
            )
    from glue_table_cache_spark.sources.hudi import (
        avro_schema_for_spark,
        hudi_table_schema,
    )

    for _ in range(max_commit_retries):
        table_schema = hudi_table_schema(location)
        if table_schema is None:
            raise GlueSparkError(
                f"no recorded Hudi schema at {location!r} — ALTER "
                "needs an existing table with at least one commit"
            )
        existing = {f.name for f in table_schema.fields}
        dupes = [f.name for f in fields if f.name in existing]
        if dupes:
            raise GlueSparkError(
                f"ADD COLUMNS: column(s) {dupes} already exist"
            )
        merged = StructType(
            list(table_schema.fields)
            + [StructField(f.name, f.dataType, True) for f in fields]
        )
        avro = avro_schema_for_spark(
            merged, name=re.sub(r"\W", "_", base.name) or "Record"
        )
        if avro is None:
            raise GlueSparkError(
                "ADD COLUMNS: the widened schema has no Avro "
                "serialization — unsupported column type"
            )
        instant = max(
            int(time.strftime("%Y%m%d%H%M%S", time.gmtime())),
            _latest_instant(hoodie) + 1,
        )
        body = {
            "partitionToWriteStats": {},
            "extraMetadata": {"schema": json.dumps(avro)},
        }
        commit = hoodie / f"{instant}.commit"
        try:
            fd = os.open(commit, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue  # lost the race: re-read the timeline, retry
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps(body))
        return str(instant)
    raise GlueSparkError(
        f"could not commit to {location!r} after "
        f"{max_commit_retries} attempts (concurrent writers)"
    )


def restore_hudi(location: str, instant: int) -> int:
    """``RESTORE ... TO VERSION AS OF`` for Hudi: rewind the timeline
    to ``instant`` (the same identifier the read-side ``VERSION AS
    OF`` travel addresses) by removing every LATER completed instant
    and the data/log files its write stats introduced — Hudi's
    restore semantics, which are DESTRUCTIVE by design: unlike the
    Delta/Iceberg restores, the rolled-back commits are gone and the
    pre-restore state is no longer travelable.

    Safety order per rolled-back instant: the instant file is
    unlinked FIRST, then its data files — a crash mid-restore leaves
    orphan data files (never scanned; ``clean_hudi`` retires them),
    never a completed instant referencing deleted data.  Refuses up
    front when the restored state itself is no longer materializable
    (``clean_hudi`` removed a base slice or log the target instant
    needs).  Returns the number of instants rolled back."""
    if "://" in location:
        raise GlueSparkError(
            "restore_hudi rewrites the timeline via filesystem "
            "operations; object stores need an external coordinator"
        )
    from glue_table_cache_spark.sources.hudi import (
        _completed_instants,
        _resolve_path,
        _timeline_files,
        _walk_timeline,
    )

    base = Path(location)
    names = _timeline_files(location)
    # raises if `instant` predates the retained timeline
    slices, logs = _walk_timeline(
        location, names, as_of_instant=int(instant)
    )
    needed = [p for _ts, p, _part in slices.values()]
    needed += [p for _ts, p, _fid, _part in logs]
    missing = [
        p
        for p in needed
        if not Path(_resolve_path(location, p)).exists()
    ]
    if missing:
        raise GlueSparkError(
            f"RESTORE to instant {instant}: {len(missing)} file(s) "
            f"the restored state needs were cleaned (first: "
            f"{missing[0]!r}); that state is no longer "
            "materializable"
        )
    later = [
        (ts, kind, p)
        for ts, kind, p in _completed_instants(names, location)
        if ts > int(instant)
    ]
    for _ts, _kind, p in sorted(later, reverse=True):
        try:
            body = json.loads(Path(p).read_text())
        except (OSError, ValueError):
            body = {}
        rels = [
            st.get("path")
            for stats in (body.get("partitionToWriteStats") or {}).values()
            for st in stats or []
            if st.get("path")
        ]
        Path(p).unlink(missing_ok=True)
        for rel in rels:
            (base / rel).unlink(missing_ok=True)
    return len(later)


def set_hudi_table_properties(
    location: str,
    props: dict[str, str],
    unset: tuple[str, ...] = (),
) -> None:
    """``ALTER TABLE ... SET TBLPROPERTIES`` for Hudi — merged into
    ``hoodie.properties`` (Hudi's table-config home; ``SHOW
    TBLPROPERTIES`` reads the same file) via write-temp + atomic
    rename.  The structural keys ``hoodie.table.type`` and
    ``hoodie.table.partition.fields`` refuse — changing them under a
    live timeline corrupts every reader's walk."""
    if not props and not unset:
        raise GlueSparkError("SET TBLPROPERTIES: empty property list")
    protected = {"hoodie.table.type", "hoodie.table.partition.fields"}
    touched = (set(props) | set(unset)) & protected
    if touched:
        raise GlueSparkError(
            f"SET TBLPROPERTIES: {sorted(touched)} are structural "
            "(they steer the timeline walk and partition layout) — "
            "refusing to change them on a live table"
        )
    pf = Path(location) / ".hoodie" / "hoodie.properties"
    if not pf.exists():
        raise GlueSparkError(
            f"no hoodie.properties at {location!r} — ALTER needs an "
            "existing table"
        )
    conf: dict[str, str] = {}
    order: list[str] = []
    for line in pf.read_text().splitlines():
        k, eq, v = line.partition("=")
        if eq:
            if k not in conf:
                order.append(k)
            conf[k] = v
    for k, v in props.items():
        if str(k) not in conf:
            order.append(str(k))
        conf[str(k)] = str(v)
    for k in unset:
        conf.pop(str(k), None)
    tmp = pf.with_suffix(".properties.tmp")
    tmp.write_text(
        "".join(f"{k}={conf[k]}\n" for k in order if k in conf)
    )
    tmp.replace(pf)


def _recorded_partition_fields(
    location: str, props: Path
) -> list[str] | None:
    """The table's partition column names — ``[]`` = known
    unpartitioned, ``None`` = unknown (fresh table).  Recorded in
    ``hoodie.properties`` (real Hudi's ``hoodie.table.partition.
    fields``); legacy tables written before the property fall back
    to the newest completed commit's write-stats partition paths
    (hive-style ``k=v`` segments carry the names)."""
    if props.exists():
        m = re.search(
            r"hoodie\.table\.partition\.fields\s*=\s*(\S+)",
            props.read_text(),
        )
        if m:
            return [c for c in m.group(1).split(",") if c]
    from glue_table_cache_spark.sources.hudi import (
        _completed_instants,
        _timeline_files,
    )

    try:
        instants = _completed_instants(
            _timeline_files(location), location
        )
    except GlueSparkError:
        return None
    for _ts, _kind, p in reversed(instants):
        try:
            body = json.loads(Path(p).read_text())
        except (OSError, ValueError):
            continue
        for part in body.get("partitionToWriteStats") or {}:
            if not part:
                return []
            keys = []
            for seg in part.strip("/").split("/"):
                k, eq, _v = seg.partition("=")
                if not eq or not k:
                    return []  # non-hive layout: nothing to inherit
                keys.append(k)
            return keys
    return None


def write_hudi_append(
    df: DataFrame,
    location: str,
    partition_by: list[str] | None = None,
    max_commit_retries: int = 10,
    table_type: str = "COPY_ON_WRITE",
    merge_schema: bool = False,
    overwrite: bool = False,
    extra_metadata: dict[str, str] | None = None,
) -> str:
    """Append ``df`` to the Hudi table at ``location`` (created on
    first write); returns the committed instant timestamp string.
    Readers see the whole batch or none of it.

    ``extra_metadata`` merges into the commit's ``extraMetadata`` map
    (Hudi's home for writer-owned metadata; the ``schema`` key is
    reserved for the table schema and refuses).  The reserved pair
    ``txn-app-id`` + ``txn-version`` makes the append IDEMPOTENT for
    exactly-once streaming: if a completed instant already records
    ``txn-version >= version`` for the app, the call no-ops and
    returns that instant — checked BEFORE staging (a replay writes no
    files) and again inside the commit retry loop (a replay racing a
    live writer cannot double-publish).

    ``table_type`` applies on CREATION only: base-file appends (new
    file groups) are legal in both layouts, and a MERGE_ON_READ table
    additionally accepts row-level updates/deletes via
    :func:`.hudi_log_write.write_hudi_log`.  An existing table's
    recorded type always wins — a mismatch refuses.

    Schema posture (mirrors the Delta/Iceberg appenders): the commit
    records the TABLE schema as an Avro record schema in
    ``extraMetadata.schema`` (Hudi's own schema-tracking mechanism),
    which the engine scan treats as authoritative; a batch whose
    columns are a subset appends fine (absent columns surface as
    nulls), NEW columns refuse unless ``merge_schema=True`` — and
    always refuse on MERGE_ON_READ tables, whose pending log blocks
    carry their own record schemas that the snapshot merge would have
    to reconcile — and type changes always refuse.

    ``overwrite=True`` is INSERT OVERWRITE (Hudi's
    insert_overwrite_table): the commit publishes as ONE
    ``replacecommit`` whose ``partitionToReplaceFileIds`` retires
    every currently-active file group (resolved fresh per attempt)
    while the write stats introduce the new groups — atomic full
    replace.  COPY_ON_WRITE only: a MOR table's pending log blocks
    belong to the retired groups and retire with them, which is
    exactly the clustering semantic, but refusing keeps the narrower
    contract explicit."""
    base = Path(location)
    if "://" in location:
        raise GlueSparkError(
            "write_hudi_append commits via filesystem put-if-absent; "
            "object stores need an external commit coordinator"
        )
    if table_type not in ("COPY_ON_WRITE", "MERGE_ON_READ"):
        raise GlueSparkError(
            f"unknown Hudi table_type {table_type!r}"
        )
    hoodie = base / ".hoodie"
    hoodie.mkdir(parents=True, exist_ok=True)
    props = hoodie / "hoodie.properties"
    if props.exists():
        text = props.read_text()
        m = re.search(r"hoodie\.table\.type\s*=\s*(\S+)", text)
        if m and m.group(1).upper() != table_type:
            raise GlueSparkError(
                f"table at {location!r} is {m.group(1)}; refusing a "
                f"{table_type} append onto it"
            )
    else:
        text = f"hoodie.table.name={base.name}\n" \
               f"hoodie.table.type={table_type}\n"
        if partition_by:
            text += (
                "hoodie.table.partition.fields="
                + ",".join(partition_by) + "\n"
            )
        props.write_text(text)

    # appends INHERIT the table's partitioning (recorded in
    # hoodie.properties, real Hudi's home for it; legacy tables fall
    # back to the newest commit's write-stats partition paths): Hudi
    # partitioning is PATH-based, and a root-level base file next to
    # k=v partition dirs is silently dropped by Spark's basePath
    # partition discovery — a mixed layout must never be committed
    existing_parts = _recorded_partition_fields(location, props)
    if existing_parts is not None:
        if partition_by is None and existing_parts:
            missing = [
                c for c in existing_parts if c not in df.columns
            ]
            if missing:
                raise GlueSparkError(
                    f"append lacks partition column(s) {missing} "
                    f"the table is partitioned by ({existing_parts})"
                )
            partition_by = list(existing_parts)
        elif list(partition_by or []) != existing_parts:
            raise GlueSparkError(
                f"append partitioned by {list(partition_by or [])} "
                f"but the table's recorded partitioning is "
                f"{existing_parts} — a mixed layout is unreadable"
            )

    # --- schema: drift-check against the recorded table schema and
    # decide what this commit re-records (always the FULL table
    # schema, never a narrower batch's).  Resolved here for EARLY
    # validation and again per commit attempt: the newest instant's
    # extraMetadata.schema is the readers' authority, so re-recording
    # a schema resolved before a concurrent writer's evolution would
    # roll that evolution back (Hudi has no compare-and-swap on
    # "latest", so per-attempt re-resolution narrows the window to
    # the instant-file create itself).
    effective_type = table_type
    if props.exists():
        m = re.search(
            r"hoodie\.table\.type\s*=\s*(\S+)", props.read_text()
        )
        if m:
            effective_type = m.group(1).upper()
    _resolve_record_schema(location, df, merge_schema, effective_type)

    txn_app = (extra_metadata or {}).get("txn-app-id")
    txn_ver = (extra_metadata or {}).get("txn-version")
    if (txn_app is None) != (txn_ver is None):
        raise GlueSparkError(
            "extra_metadata txn-app-id and txn-version must be "
            "passed together"
        )
    if extra_metadata and "schema" in extra_metadata:
        raise GlueSparkError(
            "extraMetadata key 'schema' is reserved for the table "
            "schema this commit records"
        )
    if txn_app is not None:
        last = _last_txn(location, txn_app)
        if last is not None and last[0] >= int(txn_ver):
            return last[1]  # replay of a committed batch: no-op

    instant = max(
        int(time.strftime("%Y%m%d%H%M%S", time.gmtime())),
        _latest_instant(hoodie) + 1,
    )

    batch = uuid.uuid4().hex[:8]
    stage = base / f"_staging_{batch}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(stage))

    # move parts into <partition>/<fileId>_<writeToken>_<instant>.parquet
    stats_by_part: dict[str, list[dict]] = {}
    moved: list[Path] = []
    for p in sorted(stage.rglob("part-*.parquet")):
        rel_dir = p.parent.relative_to(stage)
        part = "/".join(rel_dir.parts)
        file_id = f"{batch}-{len(moved):04d}"
        name = f"{file_id}_0-0-0_{instant}.parquet"
        rel = f"{part}/{name}" if part else name
        dest = base / rel
        dest.parent.mkdir(parents=True, exist_ok=True)
        p.rename(dest)
        moved.append(dest)
        stats_by_part.setdefault(part, []).append(
            {
                "fileId": file_id,
                "path": rel,
                "partitionPath": part,
                "numWrites": None,
                "fileSizeInBytes": dest.stat().st_size,
            }
        )
    shutil.rmtree(stage, ignore_errors=True)

    from glue_table_cache_spark.sources.hudi import (
        avro_schema_for_spark,
    )

    if overwrite and effective_type != "COPY_ON_WRITE":
        for d in moved:
            d.unlink(missing_ok=True)
        raise GlueSparkError(
            "overwrite=True replaces file groups via one "
            "replacecommit and is COPY_ON_WRITE-only; cluster or "
            "compact the MOR table first"
        )
    for _ in range(max_commit_retries):
        # re-check the txn marker against the CURRENT timeline: a
        # replay racing the live writer must not double-publish.  The
        # staged files are already moved (uncommitted — never
        # scanned); unlink them so the no-op leaves no litter.
        if txn_app is not None:
            last = _last_txn(location, txn_app)
            if last is not None and last[0] >= int(txn_ver):
                for d in moved:
                    d.unlink(missing_ok=True)
                return last[1]
        # re-resolve the schema against the CURRENT newest instant
        # just before committing (see the schema comment above)
        record_schema = _resolve_record_schema(
            location, df, merge_schema, effective_type
        )
        body: dict = {"partitionToWriteStats": stats_by_part}
        if overwrite:
            # fresh per attempt: groups added by commits landing
            # between attempts must retire too
            from glue_table_cache_spark.sources.hudi import (
                _file_id as _hudi_file_id,
                _timeline_files,
                _walk_timeline,
            )

            slices, _logs = _walk_timeline(
                location, _timeline_files(location)
            )
            replace: dict[str, list[str]] = {}
            for fid, (_ts, _path, part) in slices.items():
                replace.setdefault(part, []).append(fid)
            body["partitionToReplaceFileIds"] = {
                k: sorted(v) for k, v in replace.items()
            }
        avro = avro_schema_for_spark(
            record_schema,
            name=re.sub(r"\W", "_", base.name) or "Record",
        )
        if avro is not None:
            body["extraMetadata"] = {"schema": json.dumps(avro)}
        if extra_metadata:
            body.setdefault("extraMetadata", {}).update(extra_metadata)
        payload = json.dumps(body)
        kind = "replacecommit" if overwrite else "commit"
        commit = hoodie / f"{instant}.{kind}"
        try:
            fd = os.open(commit, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # lost the race: claim the next free instant.  The data
            # file NAMES keep the original instant — harmless, the
            # walk keys on the commit's write stats, not on filename
            # parsing (fileId comes from the stats row)
            instant = max(instant + 1, _latest_instant(hoodie) + 1)
            continue
        with os.fdopen(fd, "w") as f:
            f.write(payload)
        return str(instant)
    raise GlueSparkError(
        f"could not commit to {location!r} after "
        f"{max_commit_retries} attempts (concurrent writers)"
    )
