"""OPTIMIZE for Delta tables: compact the ACTIVE file set atomically.

Beyond-reference maintenance operator — the lakehouse ``OPTIMIZE``
(optionally ``ZORDER BY``) re-expressed over this repo's log walk and
writer primitives:

1. resolve the active file set from the transaction log (per
   partition, since files never span partitions);
2. rewrite each partition's files into ``~target_file_mb`` outputs —
   plain ``repartition`` or, with ``zorder_by``, the Morton-key
   range-partition+sort from :mod:`glue_table_cache_spark.sinks.compact`
   so zone maps bound every clustering column;
3. commit ONE version that ``remove``s every rewritten file and
   ``add``s the replacements (``dataChange: false`` on both, per the
   protocol — OPTIMIZE rearranges bytes, it does not change rows, and
   downstream CDF/streaming readers must not see phantom inserts);
   new adds carry footer-derived ``stats`` so skipping keeps working.

Deletion vectors are PURGED by the rewrite (the scan applies them
before writing, so the new files simply lack the deleted rows) — this
doubles as ``REORG TABLE ... APPLY (PURGE)``.

Concurrency: the commit uses the same ``O_EXCL`` put-if-absent as the
writer, but a lost race triggers RE-VALIDATION, not a blind retry —
if the log moved and any file this rewrite replaces is no longer
active (someone else removed or rewrote it), committing would
resurrect/duplicate rows, so the operation aborts cleanly: staged
files are deleted, the table is untouched, and the caller re-runs.
Appends that landed concurrently are fine (their files are not in the
replaced set) — the retry commits on top of them.

Column-mapped tables rewrite under PHYSICAL spellings end to end
(r12): the scan reads with the fully-physical schema (never the
logical one — projecting logically and writing that back would
silently re-key every file, the exact data-loss shape the r11
Iceberg OPTIMIZE fix closed), ``zorder_by`` names map logical →
physical, and footer stats key physically per the protocol's
convention for mapped tables.  PARTITIONED mapped tables compact too
(r13): the per-partition groups carry the log's physical-keyed
partitionValues verbatim into the staged directories and the new
adds, and only the ``WHERE`` predicate (logical names) translates.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from pathlib import Path

from pyspark.sql import SparkSession

from glue_table_cache_spark.errors import GlueSparkError
from glue_table_cache_spark.sinks.delta_write import (
    _footer_stats_json,
    _next_version,
    serialize_actions,
)
from glue_table_cache_spark.sinks.hive_paths import (
    escape_partition_value,
)


def optimize_delta(
    spark: SparkSession,
    location: str,
    target_file_mb: int = 256,
    zorder_by: list[str] | None = None,
    bits_per_col: int = 8,
    min_files_per_partition: int = 2,
    max_commit_retries: int = 10,
    checkpoint_interval: int | None = 10,
    purge_only: bool = False,
    partition_predicate: str | None = None,
) -> int | None:
    """Compact the Delta table at ``location``; returns the committed
    version, or ``None`` when nothing needed rewriting.  A partition
    is rewritten when it holds ≥ ``min_files_per_partition`` active
    files or any of its files carries a deletion vector (the rewrite
    purges it).  With ``zorder_by`` every partition is rewritten (the
    point is the new layout, not the file count).

    ``purge_only=True`` is ``REORG TABLE ... APPLY (PURGE)``: ONLY
    files carrying deletion vectors rewrite (their masked rows
    materialize away and the DV sidecars become vacuum-able);
    DV-free files are untouched however small — minimal write
    amplification when the goal is shedding DVs, not layout.

    ``partition_predicate`` scopes the rewrite (``OPTIMIZE ...
    WHERE``): only partitions that might match compact — at real
    scale the difference between touching yesterday's partition and
    rewriting the whole table.  Evaluation is the engine's
    conservative three-valued pruning tree, so an unrecognized
    predicate over-compacts but never skips a matching partition;
    predicates on non-partition columns match nothing they can
    prove, keeping every partition (the safe direction)."""
    from glue_table_cache_spark.sources.delta import (
        apply_deletion_vectors,
        delta_scan_info,
        log_action_path,
    )

    base = Path(location)
    if "://" in location:
        raise GlueSparkError(
            "optimize_delta commits via filesystem put-if-absent; "
            "object stores need an external commit coordinator"
        )
    entries, renames, log_schema, phys_schema = delta_scan_info(
        location, with_schema=True, allow_nested_mapping=True,
        with_physical_schema=True,
    )
    if renames is not None:
        # mapped rewrite stays PHYSICAL end to end: scan with the
        # fully-physical schema (files lacking a later-added column
        # surface nulls, like the logical path), zorder names map
        # below — the logical schema never touches the bytes.
        # Partitioned + mapped (r13; previously refused): the log's
        # partitionValues and the staging directories both key on
        # PHYSICAL names, which is exactly what the per-partition
        # groups below carry, so the rewrite preserves them verbatim;
        # only the WHERE predicate speaks logical, translated at the
        # prune
        log_schema = phys_schema
        zorder_by = [
            {v: k for k, v in renames.items()}.get(c, c)
            for c in (zorder_by or [])
        ] or None

    # group the active set by partition tuple
    groups: dict[tuple, list[tuple[str, dict, dict | None]]] = {}
    for path, pv, dv in entries:
        groups.setdefault(tuple(sorted(pv.items())), []).append(
            (path, pv, dv)
        )
    if partition_predicate and groups:
        from glue_table_cache_spark.listing import FileInfo
        from glue_table_cache_spark.pruning import (
            extract_partition_predicate,
            prune_files,
        )

        # the WHERE clause speaks LOGICAL names; mapped tables' group
        # keys are physical — prune over the logical translation
        logical_of = renames or {}
        keys = sorted(
            {logical_of.get(k, k) for key in groups for k, _v in key}
        )
        if not keys:
            raise GlueSparkError(
                "OPTIMIZE ... WHERE on an unpartitioned table: "
                "there are no partitions to scope by — drop the "
                "WHERE clause"
            )
        pred = extract_partition_predicate(
            f"SELECT * FROM __t WHERE {partition_predicate}",
            keys,
            {"__t"},
        )
        kept = {
            f.path
            for f in prune_files(
                [
                    FileInfo(
                        "/".join(str(v) for _k, v in key) or ".",
                        {
                            logical_of.get(k, k): v
                            for k, v in key
                        },
                    )
                    for key in groups
                ],
                pred,
            )
        }
        groups = {
            key: files
            for key, files in groups.items()
            if ("/".join(str(v) for _k, v in key) or ".") in kept
        }
    if purge_only:
        if zorder_by:
            raise GlueSparkError(
                "purge_only rewrites nothing but DV files; "
                "ZORDER BY wants a full rewrite — pick one"
            )
        todo = {
            key: dv_files
            for key, files in groups.items()
            if (dv_files := [
                f for f in files if f[2] is not None
            ])
        }
    else:
        todo = {
            key: files
            for key, files in groups.items()
            if len(files) >= min_files_per_partition
            or any(dv for _p, _pv, dv in files)
            or zorder_by
        }
    if not todo:
        return None

    batch = uuid.uuid4().hex[:12]
    now = int(time.time() * 1000)
    adds: list[dict] = []
    removes: list[str] = []
    replaced_rel: set[str] = set()
    for key, files in todo.items():
        pv = dict(key)
        paths = [p for p, _pv, _dv in files]
        reader = spark.read
        if log_schema is not None:
            # scan with the DATA schema (partition values are carried
            # by the log, not re-derived from directory names)
            from pyspark.sql.types import StructType

            data_fields = [
                f for f in log_schema.fields if f.name not in pv
            ]
            reader = reader.schema(StructType(data_fields))
        df = reader.parquet(*paths)
        df = apply_deletion_vectors(
            df,
            [(p, _pv, dv) for p, _pv, dv in files],
            location,
        )
        total = sum((base / p).stat().st_size for p in paths)
        n = max(1, -(-total // (target_file_mb * 1024 * 1024)))
        if zorder_by:
            from glue_table_cache_spark.sinks.compact import zorder_key

            zcols = [c for c in zorder_by if c in df.columns]
            if zcols:
                df = (
                    df.withColumn(
                        "__zkey",
                        zorder_key(df, zcols, bits_per_col=bits_per_col),
                    )
                    .repartitionByRange(n, "__zkey")
                    .sortWithinPartitions("__zkey")
                    .drop("__zkey")
                )
            else:
                df = df.repartition(n)
        else:
            df = df.repartition(n)
        stage = base / f"_staging_{batch}" / (
            "-".join(
                f"{k}={escape_partition_value(v)}" for k, v in key
            )
            or "root"
        )
        df.write.mode("overwrite").parquet(str(stage))
        # the destination keeps the writers' escaped directory
        # spelling (partitionValues carries the raw value) — the
        # hive_paths round-trip Spark's discovery expects
        part_dir = "/".join(
            f"{k}={escape_partition_value(v)}" for k, v in key
        )
        for p in sorted(stage.rglob("part-*.parquet")):
            name = f"part-{batch}-{len(adds):05d}.parquet"
            rel = f"{part_dir}/{name}" if part_dir else name
            dest = base / rel
            dest.parent.mkdir(parents=True, exist_ok=True)
            p.rename(dest)
            add = {
                "path": rel,
                "partitionValues": pv,
                "size": dest.stat().st_size,
                "modificationTime": now,
                "dataChange": False,
            }
            stats = _footer_stats_json(dest)
            if stats is not None:
                add["stats"] = stats
            adds.append(add)
        for p, _pv, _dv in files:
            rel = log_action_path(location, p)
            replaced_rel.add(rel)
            removes.append(rel)
    shutil.rmtree(base / f"_staging_{batch}", ignore_errors=True)

    log_dir = base / "_delta_log"
    for attempt in range(max_commit_retries):
        # Pin the commit version BEFORE validating, then validate on
        # EVERY attempt (including the first): the rewrite phase above
        # is long, so a conflicting commit can land while it runs —
        # not just after an O_EXCL collision.  Because the version is
        # pinned before the validation scan, any commit that lands
        # after the scan takes this version and our O_EXCL collides,
        # forcing the next attempt to re-validate against it.  Every
        # replaced file must still be active, else this commit would
        # resurrect rewritten history — abort, leave the table
        # untouched.
        version = _next_version(log_dir)
        fresh, _r = delta_scan_info(
            location, allow_nested_mapping=True
        )
        active_rel = {
            log_action_path(location, p) for p, _pv, _dv in fresh
        }
        if not replaced_rel <= active_rel:
            for a in adds:
                (base / a["path"]).unlink(missing_ok=True)
            raise GlueSparkError(
                "optimize_delta lost a conflicting race: files it "
                "rewrote are no longer active; table left "
                "untouched — re-run"
            )
        actions = [
            {
                "commitInfo": {
                    "timestamp": now,
                    "operation": "OPTIMIZE",
                    "operationParameters": {
                        "zOrderBy": json.dumps(zorder_by or [])
                    },
                }
            }
        ]
        actions += [
            {
                "remove": {
                    "path": rel,
                    "deletionTimestamp": now,
                    "dataChange": False,
                }
            }
            for rel in removes
        ]
        actions += [{"add": a} for a in adds]
        commit = log_dir / f"{version:020d}.json"
        try:
            fd = os.open(commit, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue
        with os.fdopen(fd, "w") as f:
            f.write(serialize_actions(actions))
        from glue_table_cache_spark.sinks.delta_write import (
            _maybe_checkpoint,
        )

        _maybe_checkpoint(location, version, checkpoint_interval)
        return version
    raise GlueSparkError(
        f"could not commit OPTIMIZE to {location!r} after "
        f"{max_commit_retries} attempts"
    )


def vacuum_delta(
    location: str,
    retention_hours: float = 168.0,
    dry_run: bool = True,
) -> list[str]:
    """Delete (or with ``dry_run=True``, just list) data files under
    the table directory that the log no longer references — rewrite
    leftovers from OPTIMIZE, aborted writes, removed versions.

    Safety posture mirrors the lakehouse VACUUM contract:

    * the ACTIVE file set is never touched;
    * a non-active file is eligible only once it is older than
      ``retention_hours`` (modification time) — a too-short retention
      breaks concurrent readers of recent versions AND in-flight
      writers whose staged files are not yet committed, hence the
      7-day default and no way to pass a negative value;
    * ``_delta_log`` and staging directories are never candidates
      (staging is covered by retention anyway, but an in-flight
      writer's batch should not race the clock).

    Time travel past the vacuum horizon stops working by definition —
    that is what deleting history means."""
    from glue_table_cache_spark.sources.delta import delta_scan_info

    if retention_hours < 0:
        raise GlueSparkError("retention_hours must be >= 0")
    base = Path(location)
    if "://" in location:
        raise GlueSparkError(
            "vacuum_delta deletes via the local filesystem; object "
            "stores need the scheme-specific delete path"
        )
    from glue_table_cache_spark.sources.dv import dv_file_path

    entries, _renames = delta_scan_info(
        location, allow_nested_mapping=True
    )
    active = {str(Path(p)) for p, _pv, _dv in entries}
    # deletion-vector sidecars of active files are load-bearing too
    for _p, _pv, dv in entries:
        if dv:
            dvp = dv_file_path(location, dv)
            if dvp:
                active.add(str(Path(dvp)))
    cutoff = time.time() - retention_hours * 3600.0
    victims: list[str] = []
    for p in base.rglob("*"):
        if not p.is_file():
            continue
        rel_parts = p.relative_to(base).parts
        if rel_parts and (
            rel_parts[0] == "_delta_log"
            or rel_parts[0].startswith("_staging_")
        ):
            continue
        if str(p) in active:
            continue
        if p.stat().st_mtime > cutoff:
            continue
        victims.append(str(p))
    if not dry_run:
        for v in victims:
            Path(v).unlink(missing_ok=True)
    return sorted(victims)


def fsck_delta(
    location: str,
    dry_run: bool = False,
    max_commit_retries: int = 10,
    checkpoint_interval: int | None = 10,
) -> tuple[int | None, list[str]]:
    """``FSCK REPAIR TABLE`` (public Delta dialect): drop log entries
    whose backing data file can no longer be found — after an
    out-of-band deletion, every scan of the table dies on the missing
    file until the log stops referencing it.  Returns ``(version,
    missing_paths)``; ``dry_run=True`` reports without committing.
    Removes carry ``dataChange=true`` (rows readers could previously
    see ARE disappearing) in ONE commit.  appendOnly tables are not
    refused: the data is already gone, and blocking the repair would
    just leave the table unreadable."""
    from glue_table_cache_spark.sources.delta import (
        delta_scan_info,
        log_action_path,
    )

    base = Path(location)
    if "://" in location:
        raise GlueSparkError(
            "fsck_delta commits via filesystem put-if-absent; "
            "object stores need an external commit coordinator"
        )
    entries, _renames = delta_scan_info(
        location, allow_nested_mapping=True
    )
    missing = sorted(
        p for p, _pv, _dv in entries if not Path(p).exists()
    )
    if not missing or dry_run:
        return None, missing
    by_path = {p: pv for p, pv, _dv in entries}
    now = int(time.time() * 1000)
    actions: list[dict] = [
        {
            "commitInfo": {
                "timestamp": now,
                "operation": "FSCK",
                "operationParameters": {
                    "numRemovedFiles": str(len(missing))
                },
            }
        }
    ]
    actions += [
        {
            "remove": {
                "path": log_action_path(location, p),
                "deletionTimestamp": now,
                "dataChange": True,
                "partitionValues": by_path[p],
            }
        }
        for p in missing
    ]
    from glue_table_cache_spark.sinks.delta_write import (
        _maybe_checkpoint,
        serialize_actions,
    )

    log_dir = base / "_delta_log"
    for _attempt in range(max_commit_retries):
        version = _next_version(log_dir)
        commit = log_dir / f"{version:020d}.json"
        try:
            fd = os.open(commit, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue
        with os.fdopen(fd, "w") as f:
            f.write(serialize_actions(actions))
        _maybe_checkpoint(location, version, checkpoint_interval)
        return version, missing
    raise GlueSparkError(
        f"could not commit FSCK to {location!r} after "
        f"{max_commit_retries} attempts"
    )
