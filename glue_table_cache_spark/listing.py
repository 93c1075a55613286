"""File listing: enumerate a table's data files and attach
partition values extracted from paths.

Mirrors the role of /root/reference/src/util/s3.ts:34-58 (paginated
ListObjectsV2 that drops ``_$folder$`` markers and builds
``S3FileInfo {path, partitionValues}``), generalized behind a
filesystem interface so tests run on local directories and the same
code paths work against S3 via boto3 when available.

Listing is metadata-scale work and runs on the driver, exactly as the
reference runs it in its single Node process; the *data* scan that the
listing feeds is the distributed part (SURVEY.md §3).
"""

from __future__ import annotations

import posixpath
from dataclasses import dataclass, field
from pathlib import Path
from typing import Protocol

from glue_table_cache_spark.projection import PartitionExtractor

#: suffixes that are never data files (the reference drops
#: ``_$folder$`` markers, /root/reference/src/util/s3.ts:43-46; we also
#: skip checksum/success markers Spark itself writes)
_NON_DATA_MARKERS = ("_$folder$", "_SUCCESS", ".crc")


@dataclass(frozen=True)
class FileInfo:
    """One data object (= reference ``S3FileInfo``,
    /root/reference/src/types.ts:13-16)."""

    path: str
    partition_values: dict[str, str] = field(default_factory=dict)


class FileSystem(Protocol):
    def list_files(self, location: str) -> list[str]:
        """All file paths under ``location`` (recursive), sorted."""
        ...


class LocalFileSystem:
    """Lists a local directory recursively. A single ``*.parquet`` file
    path is returned as-is (the driver testdata ships one file per
    table)."""

    def list_files(self, location: str) -> list[str]:
        p = Path(location)
        if p.is_file():
            return [str(p)]
        return sorted(
            str(f) for f in p.rglob("*") if f.is_file() and _is_data_file(str(f))
        )


class S3FileSystem:
    """Paginated ListObjectsV2, mirroring
    /root/reference/src/util/s3.ts:34-58.  boto3 is imported lazily so
    local test environments never need AWS."""

    def __init__(self, client=None) -> None:
        if client is None:
            import boto3  # pragma: no cover - not exercised in tests

            client = boto3.client("s3")
        self._client = client

    def list_files(self, location: str) -> list[str]:
        bucket, prefix = parse_s3_path(location)
        paths: list[str] = []
        token: str | None = None
        while True:
            kwargs = {"Bucket": bucket, "Prefix": prefix}
            if token:
                kwargs["ContinuationToken"] = token
            resp = self._client.list_objects_v2(**kwargs)
            for obj in resp.get("Contents", []):
                key = obj["Key"]
                if _is_data_file(key):
                    paths.append(f"s3://{bucket}/{key}")
            if not resp.get("IsTruncated"):
                break
            token = resp.get("NextContinuationToken")
        return sorted(paths)


def _is_data_file(path: str) -> bool:
    name = posixpath.basename(path)
    return not (
        name.startswith(("_", "."))
        or any(path.endswith(m) for m in _NON_DATA_MARKERS)
    )


def parse_s3_path(s3path: str) -> tuple[str, str]:
    """``s3://bucket/prefix/`` → (bucket, prefix), as
    /root/reference/src/util/s3.ts:4-13."""
    if not s3path.startswith("s3://"):
        raise ValueError(f"Not an s3 path: {s3path!r}")
    rest = s3path[len("s3://") :]
    bucket, _, prefix = rest.partition("/")
    if not bucket:
        raise ValueError(f"Invalid s3 path: {s3path!r}")
    prefix = prefix.rstrip("/")
    return bucket, prefix + "/" if prefix else ""


def filesystem_for(location: str) -> FileSystem:
    if location.startswith("s3://"):
        return S3FileSystem()
    return LocalFileSystem()


def list_table_files(
    location: str,
    extractors: list[PartitionExtractor],
    fs: FileSystem | None = None,
) -> list[FileInfo]:
    """List data files under ``location`` and attach partition values via
    the given extractors (reference: ``listS3Objects`` +
    ``extractPartitionValues``)."""
    fs = fs or filesystem_for(location)
    out: list[FileInfo] = []
    for path in fs.list_files(location):
        values: dict[str, str] = {}
        for ex in extractors:
            v = ex.extract(path)
            if v is not None:
                values[ex.column] = v
        out.append(FileInfo(path=path, partition_values=values))
    return out
