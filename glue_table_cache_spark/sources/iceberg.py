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
) -> list[str]:
    """Data-file paths of the (``version_offset``-stepped-back) current
    snapshot of the Iceberg table at ``location``.

    ``s3_client`` / ``fs`` are injectable so the S3 metadata path is
    testable without AWS (stub client + stub lister)."""
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
    meta = metas[idx]
    snapshots = meta.get("snapshots") or []
    if not snapshots:
        return []

    def avro(path: str) -> list[dict]:
        return read_avro_bytes(_read_bytes(path, s3_client), name=path)

    manifest_list = _resolve_path(location, snapshots[-1]["manifest-list"])
    manifests = []
    for r in avro(manifest_list):
        # content=1 marks a DELETE manifest (format v2 row-level
        # deletes): its position/equality delete files would have to be
        # anti-joined against every data file — silently ignoring them
        # would resurrect deleted rows, so refuse loudly instead
        if r.get("content", 0) == 1:
            raise GlueSparkError(
                f"Iceberg table {location!r} carries row-level delete "
                "manifests (format v2 merge-on-read); compact/rewrite "
                "the table or read it through an Iceberg runtime"
            )
        manifests.append(_resolve_path(location, r["manifest_path"]))
    files: list[str] = []
    for m in manifests:
        for entry in avro(m):
            # status=2 is a DELETED entry: the file left the table in
            # this snapshot and must not be scanned (the reference's
            # walk reads data_file paths unconditionally — a bug its
            # own fixtures never trip; /root/reference/src/util/
            # iceberg.ts:31-33)
            if entry.get("status") == 2:
                continue
            files.append(
                _resolve_path(location, entry["data_file"]["file_path"])
            )
    return files


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
    manifest walks (both metadata-scale)."""
    cur = set(iceberg_data_files(location, 0, s3_client, fs))
    prev = set(iceberg_data_files(location, versions_back, s3_client, fs))
    return sorted(cur - prev), sorted(prev - cur)
