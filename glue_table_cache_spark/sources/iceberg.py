"""Iceberg current-snapshot data-file resolution (manifest walk).

Implements the reference's 4-step pipeline
(/root/reference/src/util/iceberg.ts:11-36, executed at
glue-table-cache.ts:369-387; verified against
test/integration-test.ts:185-211 and the golden SQL strings in
test/util.iceberg.test.ts:4-15):

1. read every ``<location>/metadata/*.metadata.json`` (the reference's
   ``read_json_auto`` glob) and pick the newest by
   ``last-sequence-number``; ``version_offset`` steps back N versions
   for time travel (``iceberg.ts:23``, ``ORDER BY ... DESC OFFSET k``);
2. take the **last** snapshot's ``manifest-list`` (the reference's
   1-based ``snapshots[len(snapshots)]``, ``iceberg.ts:26``);
3. read the manifest-list Avro → ``manifest_path`` per row
   (``iceberg.ts:29``);
4. read each manifest Avro → ``data_file.file_path``
   (``iceberg.ts:31-33``).

Only files the current snapshot's manifests name are scanned — orphan
files sitting in the data directory are invisible, the hygiene property
the reference's integration test asserts.

All four steps are metadata-scale and run on the driver; the returned
path list feeds the distributed parquet scan.  Avro decoding uses
:mod:`glue_table_cache_spark.sources.avro_lite` (neither fastavro nor
the spark-avro module ship in this environment).
"""

from __future__ import annotations

import json
import posixpath
from pathlib import Path

from glue_table_cache_spark.errors import GlueSparkError
from glue_table_cache_spark.sources.avro_lite import read_avro_bytes


def _read_bytes(path: str, s3_client=None) -> bytes:
    """Read a metadata object (JSON or Avro) from local disk or S3.
    ``s3_client`` is injectable for tests, like the reference's
    aws-sdk-client-mock posture (test/util.s3.test.ts)."""
    if path.startswith("s3://"):
        from glue_table_cache_spark.listing import parse_s3_path

        if s3_client is None:  # pragma: no cover - no AWS in harness
            import boto3

            s3_client = boto3.client("s3")
        bucket, key = parse_s3_path(path)
        body = s3_client.get_object(Bucket=bucket, Key=key.rstrip("/"))
        return body["Body"].read()
    return Path(path).read_bytes()


def _read_json(path: str, s3_client=None) -> dict:
    return json.loads(_read_bytes(path, s3_client))


def _list_metadata_jsons(location: str, fs=None) -> list[str]:
    from glue_table_cache_spark.listing import filesystem_for

    meta_dir = posixpath.join(location.rstrip("/"), "metadata")
    fs = fs or filesystem_for(meta_dir)
    return [p for p in fs.list_files(meta_dir) if p.endswith(".json")]


def _resolve_path(location: str, path: str) -> str:
    """Manifest paths may be absolute URIs or table-relative."""
    if "://" in path or path.startswith("/"):
        return path
    return posixpath.join(location.rstrip("/"), path)


def iceberg_data_files(
    location: str,
    version_offset: int = 0,
    s3_client=None,
    fs=None,
    with_deletes: bool = False,
) -> list[str] | tuple[list[str], list[str]]:
    """Data-file paths of the (``version_offset``-stepped-back) current
    snapshot of the Iceberg table at ``location``.

    Format-v2 row-level deletes: POSITION delete files (delete-manifest
    entries whose ``data_file.content == 1``) are supported — pass
    ``with_deletes=True`` to get ``(data_files, position_delete_files)``
    and run the scan through :func:`apply_position_deletes`; the
    default mode refuses when any are present, so no caller silently
    resurrects deleted rows.  EQUALITY delete files
    (``content == 2``) always refuse: applying them needs the delete
    schema's column semantics, which belongs to an Iceberg runtime.

    A position delete row names its target ``(file_path, pos)``
    exactly, so applying every delete file in the current snapshot to
    the whole scan is exact without sequence-number scoping — a delete
    aimed at a compacted-away file matches nothing (Iceberg data files
    are write-once under unique names).

    ``s3_client`` / ``fs`` are injectable so the S3 metadata path is
    testable without AWS (stub client + stub lister)."""
    entries, delete_files = iceberg_scan_info(
        location, version_offset, s3_client, fs
    )
    files = [p for p, _pv in entries]
    if with_deletes:
        return files, delete_files
    if delete_files:
        raise GlueSparkError(
            f"Iceberg table {location!r} carries {len(delete_files)} "
            "position delete file(s); call with with_deletes=True and "
            "apply_position_deletes(), or compact/rewrite — a raw "
            "path scan would resurrect deleted rows"
        )
    return files


def iceberg_scan_info(
    location: str,
    version_offset: int = 0,
    s3_client=None,
    fs=None,
) -> tuple[list[tuple[str, dict]], list[str]]:
    """``(entries, position_delete_files)`` where entries are
    ``(path, partition_values)`` — the manifest records each data
    file's partition tuple, so partition predicates can prune files
    BEFORE the reader sees their paths (the engine feeds these into
    the same three-valued predicate tree as the hive listing path).
    Values are stringified: the pruning layer compares against the
    string forms partition predicates carry.

    EQUALITY delete files (``data_file.content == 2``) and unknown
    delete contents refuse: applying equality deletes needs the
    delete schema's column semantics (an Iceberg runtime's job), and
    ignoring either would resurrect deleted rows."""
    jsons = _list_metadata_jsons(location, fs=fs)
    if not jsons:
        raise GlueSparkError(
            f"No Iceberg metadata JSON found under {location!r}"
        )
    metas = sorted(
        (_read_json(p, s3_client) for p in jsons),
        key=lambda m: m.get("last-sequence-number", 0),
    )
    idx = len(metas) - 1 - version_offset
    if idx < 0:
        raise GlueSparkError(
            f"version_offset={version_offset} exceeds available versions "
            f"({len(metas)}) for {location!r}"
        )
    snapshots = metas[idx].get("snapshots") or []
    if not snapshots:
        return [], []

    def avro(path: str) -> list[dict]:
        return read_avro_bytes(_read_bytes(path, s3_client), name=path)

    manifest_list = _resolve_path(location, snapshots[-1]["manifest-list"])
    entries: list[tuple[str, dict]] = []
    delete_files: list[str] = []
    for r in avro(manifest_list):
        # content=1 marks a DELETE manifest: its entries are delete
        # FILES, not data files
        is_delete = r.get("content", 0) == 1
        m = _resolve_path(location, r["manifest_path"])
        for entry in avro(m):
            # status=2 is a DELETED entry: the file left the table in
            # this snapshot and must not be scanned (the reference's
            # walk reads data_file paths unconditionally — a bug its
            # own fixtures never trip; /root/reference/src/util/
            # iceberg.ts:31-33)
            if entry.get("status") == 2:
                continue
            df_rec = entry["data_file"]
            path = _resolve_path(location, df_rec["file_path"])
            if not is_delete:
                pv = df_rec.get("partition") or {}
                entries.append(
                    (path, {k: str(v) for k, v in pv.items()})
                )
                continue
            content = df_rec.get("content", 0)
            if content == 1:
                delete_files.append(path)
            elif content == 2:
                raise GlueSparkError(
                    f"Iceberg table {location!r} carries EQUALITY "
                    "delete files (format v2); read through an "
                    "Iceberg runtime or compact/rewrite the table"
                )
            else:
                raise GlueSparkError(
                    f"Iceberg delete manifest {m!r} entry {path!r} has "
                    f"unknown delete content {content!r}; refusing — "
                    "ignoring it could resurrect deleted rows"
                )
    return entries, delete_files


def _strip_scheme(col):
    """Scheme-insensitive path form for matching delete-file
    ``file_path`` values against ``_metadata.file_path`` (writers may
    record ``s3://`` where the scan reports ``s3a://``, or a bare
    absolute path where the scan reports ``file:/``)."""
    from pyspark.sql import functions as F

    return F.regexp_replace(col, "^[a-zA-Z0-9+.-]+:/+", "/")


def apply_position_deletes(df, delete_paths: list[str]):
    """Mask position-deleted rows out of a raw parquet scan: the
    delete files are THEMSELVES parquet read distributed (no
    driver-side materialization, unlike the Delta DV blobs which are
    opaque bitmaps), then anti-joined on scheme-normalized
    ``(_metadata.file_path, _metadata.row_index)``.  Delete sets are
    usually tiny next to the data, so the anti-join's build side
    broadcasts under AQE; at pathological delete volumes it degrades
    to a shuffle join, still scale-safe."""
    from pyspark.sql import functions as F

    if not delete_paths:
        return df
    spark = df.sparkSession
    deletes = (
        spark.read.parquet(*delete_paths)
        .select(
            _strip_scheme(F.col("file_path")).alias("__del_file"),
            F.col("pos").cast("long").alias("__del_pos"),
        )
    )
    return (
        df.withColumn(
            "__del_file", _strip_scheme(F.col("_metadata.file_path"))
        )
        .withColumn("__del_pos", F.col("_metadata.row_index"))
        .join(deletes, ["__del_file", "__del_pos"], "left_anti")
        .drop("__del_file", "__del_pos")
    )


def iceberg_changes(
    location: str,
    versions_back: int = 1,
    s3_client=None,
    fs=None,
) -> tuple[list[str], list[str]]:
    """File-level incremental feed: ``(added, removed)`` data files
    between the snapshot ``versions_back`` versions ago and the current
    one — the "process only new data" primitive for incremental
    training-data ingestion, computed as a set difference of two
    manifest walks (both metadata-scale).

    Position delete files participate like data files: a NEW delete
    file shows up in ``added`` (the rows it masks changed — consumers
    must re-apply deletes via :func:`apply_position_deletes`), a
    compacted-away one in ``removed``."""
    cur_d, cur_del = iceberg_data_files(
        location, 0, s3_client, fs, with_deletes=True
    )
    prev_d, prev_del = iceberg_data_files(
        location, versions_back, s3_client, fs, with_deletes=True
    )
    cur = set(cur_d) | set(cur_del)
    prev = set(prev_d) | set(prev_del)
    return sorted(cur - prev), sorted(prev - cur)
