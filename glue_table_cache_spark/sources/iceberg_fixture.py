"""Synthetic local Iceberg table builder (test/fixture support).

Builds a minimal-but-spec-shaped Iceberg table from a DataFrame:

* ``data/part-*.parquet`` — one file per snapshot increment, plus an
  ``orphan.parquet`` that no manifest references (the scan-hygiene
  trap from /root/reference/test/integration-test.ts:185-211: a
  directory listing would double-count, a manifest walk must not);
* ``metadata/v<N>.metadata.json`` — one per snapshot, with
  ``last-sequence-number`` and the cumulative ``snapshots`` array;
* ``metadata/snap-<N>.avro`` manifest lists → ``manifest_path`` rows;
* ``metadata/manifest-<N>.avro`` manifests → ``data_file.file_path``.

Field names and nesting match what the reference's walk consumes
(``manifest-list``, ``manifest_path``, ``data_file['file_path']`` —
/root/reference/src/util/iceberg.ts:26-33).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame

from glue_table_cache_spark.sources.avro_lite import write_avro

MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        # v2: the sequence number manifest entries inherit when theirs
        # is null
        {"name": "sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}

MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        # v2 data sequence number: null on ADDED entries (inherited
        # from the manifest list), explicit on carried-over entries in
        # rewritten manifests (they keep their ORIGINAL write seq)
        {"name": "sequence_number", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    # 0 = data, 1 = position deletes, 2 = equality
                    # deletes (Iceberg spec data_file.content)
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    # the spec encodes this as the r102 struct typed
                    # by the partition spec; the fixture simplifies to
                    # a string map — the reader stringifies either
                    # decoded form into the same pruning dict
                    {
                        "name": "partition",
                        # value branch nullable: a NULL partition
                        # value (__HIVE_DEFAULT_PARTITION__ on disk)
                        # commits as null, not the sentinel string
                        "type": [
                            "null",
                            {
                                "type": "map",
                                "values": ["null", "string"],
                            },
                        ],
                    },
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    # zone maps: field-id keyed bounds in the spec's
                    # single-value binary serialization.  Real writers
                    # emit these as array<record{key,value}> (Avro map
                    # keys must be strings); the fixture uses a
                    # string-keyed Avro map — the reader accepts both
                    {
                        "name": "lower_bounds",
                        "type": ["null", {"type": "map", "values": "bytes"}],
                    },
                    {
                        "name": "upper_bounds",
                        "type": ["null", {"type": "map", "values": "bytes"}],
                    },
                    {
                        "name": "null_value_counts",
                        "type": ["null", {"type": "map", "values": "long"}],
                    },
                    # field ids of the columns an EQUALITY delete file
                    # (content=2) matches on
                    {
                        "name": "equality_ids",
                        "type": ["null", {"type": "array", "items": "int"}],
                    },
                ],
            },
        },
    ],
}


def _iceberg_type(dt) -> str:
    """Spark type → Iceberg primitive type string (for the schema JSON
    and the bounds' binary serialization).  Unmapped types degrade to
    ``"unknown"`` — names/ids still resolve, bounds just don't decode."""
    from pyspark.sql import types as T

    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType):
        return "timestamptz"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"  # spec: zoneless
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    return "unknown"


def build_iceberg_table(
    base: str | Path,
    snapshots: list,
    orphan: DataFrame | None = None,
    partition_specs: list | None = None,
) -> Path:
    """Write ``snapshots[i]`` as the change applied by snapshot i+1.

    Each element is a DataFrame (append — the classic fixture shape)
    or a dict ``{"add": DataFrame | None, "delete": ["part-N.parquet"],
    "delete_manifest": bool, "pos_delete": {"part-N.parquet": mask_fn},
    "eq_delete": bool}``.  A snapshot with ``delete`` writes a
    REWRITTEN manifest: every still-live file as status=1 plus the
    deleted files as status=2 (the DELETED entries a correct reader
    must skip).  ``pos_delete`` writes a format-v2 POSITION delete
    parquet (``file_path``/``pos`` columns; positions from applying
    ``mask_fn`` to the file as written) referenced by a content=1
    delete manifest — the supported merge-on-read shape.
    ``eq_delete`` emits a content=2 EQUALITY delete entry — as
    ``{"columns": [...], "rows": [{...}]}`` it writes a real delete
    parquet with resolved ``equality_ids`` (the supported
    merge-on-read shape), as ``True`` a malformed id-less entry a
    reader must refuse; ``delete_manifest`` marks the snapshot's data manifest
    content=1 while its entries stay content=0 — a malformed delete
    manifest a reader must refuse rather than scan or ignore.
    ``orphan`` lands in data/ unreferenced.  ``partition_specs``
    (spec-dialect ``[{"spec-id", "fields": [{"name", "transform",
    "source-id", "field-id"}]}]``) is written verbatim as the
    metadata's ``partition-specs`` with ``default-spec-id`` = the
    first entry's id — the input for hidden-partitioning pruning
    tests."""
    import shutil

    base = Path(base)
    data_dir = base / "data"
    meta_dir = base / "metadata"
    data_dir.mkdir(parents=True, exist_ok=True)
    meta_dir.mkdir(parents=True, exist_ok=True)

    # name -> {"record_count", "lower_bounds", "upper_bounds",
    # "null_value_counts"} — survives manifest rewrites, like real
    # carried-over entries keep their stats
    file_stats: dict[str, dict] = {}

    def entry(
        path: Path,
        status: int,
        snap: int,
        content: int = 0,
        partition: dict | None = None,
        seq: int | None = None,
        equality_ids: list[int] | None = None,
    ) -> dict:
        stats = file_stats.get(path.name, {})
        return {
            "status": status,
            "snapshot_id": snap,
            "sequence_number": seq,
            "data_file": {
                "content": content,
                "file_path": str(path),
                "file_format": "PARQUET",
                "partition": partition,
                "record_count": stats.get("record_count", 0),
                "file_size_in_bytes": (
                    path.stat().st_size if path.exists() else 0
                ),
                "equality_ids": equality_ids,
                "lower_bounds": stats.get("lower_bounds"),
                "upper_bounds": stats.get("upper_bounds"),
                "null_value_counts": stats.get("null_value_counts"),
            },
        }

    def compute_stats(columns: list[str], rows: list[dict]) -> dict:
        """Per-file zone maps the way real writers record them:
        field-id keyed bounds in the spec's binary serialization.
        ``rows`` come from the write's own Arrow table — no second
        collect action."""
        from glue_table_cache_spark.skipping import encode_iceberg_bound

        lower: dict[str, bytes] = {}
        upper: dict[str, bytes] = {}
        nulls: dict[str, int] = {}
        for c in columns:
            fid = str(field_ids[c])
            vals = [r[c] for r in rows if r[c] is not None]
            nulls[fid] = len(rows) - len(vals)
            if not vals:
                continue
            lo = encode_iceberg_bound(field_types[c], min(vals))
            hi = encode_iceberg_bound(field_types[c], max(vals))
            if lo is not None and hi is not None:
                lower[fid] = lo
                upper[fid] = hi
        return {
            "record_count": len(rows),
            "lower_bounds": lower or None,
            "upper_bounds": upper or None,
            "null_value_counts": nulls or None,
        }

    manifest_rows: list[tuple[str, int, int]] = []  # (path, content, seq)
    # name -> (path, partition_values, original write seq)
    live: dict[str, tuple[Path, dict | None, int]] = {}
    snapshot_records: list[dict] = []
    field_ids: dict[str, int] = {}  # column name -> schema field id
    field_types: dict[str, str] = {}  # column name -> iceberg type
    for i, change in enumerate(snapshots, start=1):
        if not isinstance(change, dict):
            change = {"add": change}
        added: Path | None = None
        if change.get("add") is not None:
            from glue_table_cache_spark.sources.fixture_io import (
                arrow_rows,
                write_single_parquet,
            )

            for col, f in zip(
                change["add"].columns, change["add"].schema.fields
            ):
                field_ids.setdefault(col, len(field_ids) + 1)
                field_types.setdefault(col, _iceberg_type(f.dataType))
            added = data_dir / f"part-{i}.parquet"
            # single pyarrow write + stats off the same Arrow table —
            # see fixture_io (the coalesce(1) Spark-write shape cost
            # ~6 s per tiny fixture file, plus a collect per stats)
            tbl = write_single_parquet(change["add"], added)
            live[added.name] = (added, change.get("partition"), i)
            file_stats[added.name] = compute_stats(
                change["add"].columns, arrow_rows(tbl)
            )

        manifest = meta_dir / f"manifest-{i}.avro"
        deletes = change.get("delete") or []
        if deletes:
            # rewritten manifest: all live files + DELETED tombstones;
            # carried-over entries keep their ORIGINAL write seq (the
            # spec forbids inheriting a rewrite's newer seq — an
            # equality delete between the write and the rewrite must
            # still apply)
            removed = {n: live.pop(n) for n in deletes if n in live}
            rows = [
                entry(p, 1, 1000 + i, partition=pv, seq=s)
                for p, pv, s in live.values()
            ] + [
                entry(p, 2, 1000 + i, partition=pv, seq=s)
                for p, pv, s in removed.values()
            ]
            write_avro(manifest, MANIFEST_ENTRY_SCHEMA, rows)
            manifest_rows = [
                (str(manifest),
                 1 if change.get("delete_manifest") else 0, i)
            ]
        else:
            write_avro(
                manifest,
                MANIFEST_ENTRY_SCHEMA,
                [entry(added, 1, 1000 + i,
                       partition=change.get("partition"))]
                if added is not None
                else [],
            )
            manifest_rows.append(
                (str(manifest),
                 1 if change.get("delete_manifest") else 0, i)
            )

        if change.get("drop_deletes"):
            # external-maintenance shape: the snapshot REMOVES delete
            # manifests (keeping data manifests) — the "remove
            # dangling deletes" / partial-rewrite case a changelog
            # reader must synthesize resurrections for.  ``True``
            # drops every delete manifest; a list of substrings drops
            # only matching ones (partial maintenance — the
            # surviving-equality-deletes shape)
            dd = change["drop_deletes"]
            manifest_rows = [
                (p, c, sq)
                for p, c, sq in manifest_rows
                if c == 0
                or (
                    dd is not True
                    and not any(s in p for s in dd)
                )
            ]
        for j, (name, mask_fn) in enumerate(
            (change.get("pos_delete") or {}).items()
        ):
            import pyarrow as pa
            import pyarrow.parquet as pq

            target = data_dir / name
            pdf = pq.read_table(target).to_pandas()
            mask = mask_fn(pdf)
            positions = [
                int(k) for k, hit in enumerate(list(mask)) if hit
            ]
            del_file = data_dir / f"pos-delete-{i}-{j}.parquet"
            pq.write_table(
                pa.table(
                    {
                        "file_path": pa.array(
                            [str(target)] * len(positions)
                        ),
                        "pos": pa.array(positions, type=pa.int64()),
                    }
                ),
                del_file,
            )
            del_manifest = meta_dir / f"delete-manifest-{i}-{j}.avro"
            write_avro(
                del_manifest,
                MANIFEST_ENTRY_SCHEMA,
                [entry(del_file, 1, 1000 + i, content=1)],
            )
            manifest_rows.append((str(del_manifest), 1, i))
        if change.get("eq_delete"):
            spec = change["eq_delete"]
            eq_file = data_dir / f"eq-delete-{i}.parquet"
            ids: list[int] | None = None
            if isinstance(spec, dict):
                # real equality delete: a parquet of the delete-column
                # values + equality_ids resolved against the schema.
                # Column types come from a live data file (an all-null
                # delete column would otherwise infer the null type
                # and type-mismatch the scan side)
                import pyarrow as pa
                import pyarrow.parquet as pq

                cols = spec["columns"]
                ids = [field_ids[c] for c in cols]
                data_schema = pq.read_schema(
                    next(iter(live.values()))[0]
                )
                pq.write_table(
                    pa.table(
                        {
                            c: pa.array(
                                [r[c] for r in spec["rows"]],
                                type=data_schema.field(c).type,
                            )
                            for c in cols
                        }
                    ),
                    eq_file,
                )
            # spec=True → MALFORMED: content=2 with no equality_ids
            # (a reader must refuse, not guess)
            eq_manifest = meta_dir / f"eq-manifest-{i}.avro"
            write_avro(
                eq_manifest,
                MANIFEST_ENTRY_SCHEMA,
                [entry(eq_file, 1, 1000 + i, content=2,
                       equality_ids=ids)],
            )
            manifest_rows.append((str(eq_manifest), 1, i))

        manifest_list = meta_dir / f"snap-{i}.avro"
        write_avro(
            manifest_list,
            MANIFEST_LIST_SCHEMA,
            [
                {
                    "manifest_path": p,
                    "manifest_length": Path(p).stat().st_size,
                    "partition_spec_id": 0,
                    "content": c,
                    "sequence_number": sq,
                    "added_snapshot_id": 1000 + sq,
                }
                for p, c, sq in manifest_rows
            ],
        )
        snapshot_records.append(
            {
                "snapshot-id": 1000 + i,
                "sequence-number": i,
                "timestamp-ms": 1700000000000 + i,
                "manifest-list": str(manifest_list),
            }
        )
        (meta_dir / f"v{i}.metadata.json").write_text(
            json.dumps(
                {
                    "format-version": 2,
                    "table-uuid": "00000000-0000-0000-0000-000000000000",
                    "location": str(base),
                    "last-sequence-number": i,
                    "current-snapshot-id": 1000 + i,
                    "current-schema-id": 0,
                    "schemas": [
                        {
                            "schema-id": 0,
                            "type": "struct",
                            "fields": [
                                {"id": fid, "name": name,
                                 "required": False,
                                 "type": field_types.get(name, "long")}
                                for name, fid in field_ids.items()
                            ],
                        }
                    ],
                    "snapshots": list(snapshot_records),
                    **(
                        {
                            "partition-specs": partition_specs,
                            "default-spec-id": partition_specs[0].get(
                                "spec-id", 0
                            ),
                        }
                        if partition_specs
                        else {}
                    ),
                }
            )
        )

    if orphan is not None:
        from glue_table_cache_spark.sources.fixture_io import (
            write_single_parquet,
        )

        write_single_parquet(orphan, data_dir / "orphan.parquet")
    return base
