"""Clustering rewrite for Hudi COPY_ON_WRITE tables.

The Hudi sibling of :mod:`glue_table_cache_spark.sinks.delta_optimize`
/ :mod:`...iceberg_optimize` — Hudi's own maintenance vocabulary for
"rewrite these file groups into a better layout" is CLUSTERING,
published as a ``replacecommit``: the instant's
``partitionToReplaceFileIds`` retires the old file groups and its
``partitionToWriteStats`` introduces the rewritten ones, atomically
(the timeline walk applies both sides of one completed instant
together; an uncommitted replacecommit is invisible).  That is exactly
the shape the in-repo timeline walk already replays for
fixture-written clustering instants, so the output is readable by the
same reader, the MOR merge, and ``hudi_changes``.

MERGE_ON_READ tables refuse: clustering there must also fold log
files, which is compaction, not this rewrite.

Concurrency follows the other optimizers: ``O_EXCL`` on the instant
file; a lost race triggers re-validation and the operation aborts
cleanly if any replaced file group is no longer active.
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
from glue_table_cache_spark.sinks.hudi_write import _latest_instant
from glue_table_cache_spark.sources.hudi import (
    _BASE_FILE_RE,
    _table_type,
    _timeline_files,
    hudi_scan_info,
)


def _fid(path: str) -> str:
    m = _BASE_FILE_RE.search(path)
    return m.group(1) if m else path


def optimize_hudi(
    spark: SparkSession,
    location: str,
    target_file_mb: int = 256,
    zorder_by: list[str] | None = None,
    bits_per_col: int = 8,
    min_files_per_partition: int = 2,
    max_commit_retries: int = 10,
) -> str | None:
    """Cluster the Hudi COW table at ``location``; returns the
    committed replacecommit instant, or ``None`` when no partition
    qualifies (≥ ``min_files_per_partition`` active file groups, or
    any ``zorder_by``)."""
    base = Path(location)
    if "://" in location:
        raise GlueSparkError(
            "optimize_hudi commits via filesystem put-if-absent; "
            "object stores need an external commit coordinator"
        )
    names = _timeline_files(location)
    if _table_type(names) != "COPY_ON_WRITE":
        raise GlueSparkError(
            "optimize_hudi rewrites COPY_ON_WRITE base files only; "
            "MERGE_ON_READ needs compaction (log folding), not "
            "clustering"
        )
    active = hudi_scan_info(location)
    groups: dict[str, list[tuple[str, dict]]] = {}
    for p, pv in active:
        part = str(Path(p).parent.relative_to(base))
        part = "" if part == "." else part
        groups.setdefault(part, []).append((p, pv))
    todo = {
        part: files
        for part, files in groups.items()
        if len(files) >= min_files_per_partition or zorder_by
    }
    if not todo:
        return None

    batch = uuid.uuid4().hex[:8]
    replaced_by_part: dict[str, list[str]] = {}
    replaced_paths: set[str] = set()
    stats_by_part: dict[str, list[dict]] = {}
    n_new = 0
    # rewrite through the recorded table schema (when one exists):
    # a partition mixing pre- and post-evolution base files must not
    # infer from one file and drop the evolved column.  Identity
    # partition columns that live only in the k=v directory names are
    # excluded per ONE footer peek — forcing them into the scan would
    # materialize all-null columns in the rewritten files (the new
    # files land back under the same partition directory).
    from glue_table_cache_spark.skipping import parquet_file_columns
    from glue_table_cache_spark.sources.hudi import hudi_table_schema

    table_schema = hudi_table_schema(location)
    for part, files in todo.items():
        paths = [p for p, _pv in files]
        reader = spark.read
        if table_schema is not None:
            file_cols = parquet_file_columns(paths[0])
            if file_cols is not None:
                from pyspark.sql.types import StructType

                pv_keys = {
                    seg.split("=", 1)[0]
                    for seg in part.split("/")
                    if "=" in seg
                }
                kept = [
                    f
                    for f in table_schema.fields
                    if f.name.lower() in file_cols
                    or f.name not in pv_keys
                ]
                if kept:
                    reader = reader.schema(StructType(kept))
        df = reader.parquet(*paths)
        total = sum(Path(p).stat().st_size for p in paths)
        n = max(1, -(-total // (target_file_mb * 1024 * 1024)))
        if zorder_by:
            from glue_table_cache_spark.sinks.compact import zorder_key

            zcols = [c for c in zorder_by if c in df.columns]
            if zcols:
                df = (
                    df.withColumn(
                        "__zkey",
                        zorder_key(
                            df, zcols, bits_per_col=bits_per_col
                        ),
                    )
                    .repartitionByRange(n, "__zkey")
                    .sortWithinPartitions("__zkey")
                    .drop("__zkey")
                )
            else:
                df = df.repartition(n)
        else:
            df = df.repartition(n)
        stage = base / f"_staging_{batch}" / (part or "root").replace(
            "/", "_"
        )
        df.write.mode("overwrite").parquet(str(stage))
        instant_tag = _latest_instant(base / ".hoodie") + 1
        for p in sorted(stage.rglob("part-*.parquet")):
            file_id = f"cl{batch}-{n_new:04d}"
            n_new += 1
            name = f"{file_id}_0-0-0_{instant_tag}.parquet"
            rel = f"{part}/{name}" if part else name
            dest = base / rel
            dest.parent.mkdir(parents=True, exist_ok=True)
            p.rename(dest)
            stats_by_part.setdefault(part, []).append(
                {
                    "fileId": file_id,
                    "path": rel,
                    "partitionPath": part,
                    "fileSizeInBytes": dest.stat().st_size,
                }
            )
        replaced_by_part[part] = [_fid(p) for p in paths]
        replaced_paths.update(paths)
    shutil.rmtree(base / f"_staging_{batch}", ignore_errors=True)

    body: dict = {
        "partitionToWriteStats": stats_by_part,
        "partitionToReplaceFileIds": replaced_by_part,
    }
    if table_schema is not None:
        from glue_table_cache_spark.sources.hudi import (
            avro_schema_for_spark,
        )

        avro = avro_schema_for_spark(table_schema)
        if avro is not None:
            # carry the schema authority forward: without this a
            # clustering commit would become the newest instant and
            # silently drop the table's recorded schema
            body["extraMetadata"] = {"schema": json.dumps(avro)}
    payload = json.dumps(body)
    hoodie = base / ".hoodie"
    for attempt in range(max_commit_retries):
        # Pin the instant BEFORE validating, and validate on EVERY
        # attempt (including the first): a conflicting instant can
        # complete during the long rewrite phase above, not just after
        # an O_EXCL collision.  With the instant pinned first, any
        # instant completed after the validation scan takes this name
        # and our O_EXCL collides, forcing the next attempt to
        # re-validate against it.
        instant = _latest_instant(hoodie) + 1
        fresh = {p for p, _pv in hudi_scan_info(location)}
        if not replaced_paths <= fresh:
            for stats in stats_by_part.values():
                for st in stats:
                    (base / st["path"]).unlink(missing_ok=True)
            raise GlueSparkError(
                "optimize_hudi lost a conflicting race: file "
                "groups it rewrote are no longer active; table "
                "left untouched — re-run"
            )
        commit = hoodie / f"{instant}.replacecommit"
        try:
            fd = os.open(commit, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue
        with os.fdopen(fd, "w") as f:
            f.write(payload)
        return str(instant)
    raise GlueSparkError(
        f"could not commit clustering to {location!r} after "
        f"{max_commit_retries} attempts"
    )


def clean_hudi(
    location: str,
    retention_hours: float = 168.0,
    dry_run: bool = True,
) -> list[str]:
    """Delete (or with ``dry_run=True``, just list) data files under
    the table directory that the timeline no longer serves — replaced
    file groups from clustering, superseded base slices from COW
    updates, logs folded by compaction, aborted writes.  Hudi's CLEAN
    table service with
    :func:`..delta_optimize.vacuum_delta`'s exact safety posture:

    * the ACTIVE set is never touched — every live base slice AND
      every live log file (:func:`..sources.hudi.hudi_mor_scan_info`
      computes both, for COW and MOR alike);
    * a non-active file is eligible only once older than
      ``retention_hours`` (mtime) — a too-short retention breaks
      concurrent readers of recent slices and in-flight writers'
      staged files, hence the 7-day default and the >= 0 gate;
    * ``.hoodie/`` (the timeline) and staging directories are never
      candidates — instants are metadata-scale, and incremental
      consumers (:func:`..sources.hudi.hudi_changes`) replay them.

    Reading a cleaned older slice stops working by definition — that
    is what retention means."""
    from glue_table_cache_spark.sources.hudi import hudi_mor_scan_info

    if retention_hours < 0:
        raise GlueSparkError("retention_hours must be >= 0")
    base = Path(location)
    if "://" in location:
        raise GlueSparkError(
            "clean_hudi deletes via the local filesystem"
        )
    base_entries, log_entries = hudi_mor_scan_info(location)
    active = {str(Path(p)) for p, _pv, _ts in base_entries}
    active |= {str(Path(p)) for p, _ts, _pv in log_entries}
    cutoff = time.time() - retention_hours * 3600.0
    victims: list[str] = []
    for p in base.rglob("*"):
        if not p.is_file():
            continue
        rel_parts = p.relative_to(base).parts
        if rel_parts and (
            rel_parts[0] == ".hoodie"
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
