"""Synthetic local Delta Lake table builder (test/fixture support).

Builds a minimal-but-protocol-shaped Delta table from DataFrames:

* ``part-<N>.parquet`` data files at the table root (plus an
  ``orphan.parquet`` no commit references — the scan-hygiene trap: a
  directory listing double-counts, a log walk must not);
* ``_delta_log/<version>.json`` commits (JSON-lines ``metaData`` /
  ``add`` / ``remove`` actions per the public Delta protocol);
* optionally a ``<version>.checkpoint.parquet`` snapshot (written with
  pyarrow, ``add`` struct column) so readers can start past cleaned-up
  commits — ``drop_precheckpoint_commits`` simulates that log cleanup.

Action field names match what
:mod:`glue_table_cache_spark.sources.delta` consumes
(``add.path``, ``add.partitionValues``, ``remove.path``).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame

from glue_table_cache_spark.sources.fixture_io import (
    arrow_rows,
    write_single_parquet,
)


def _write_data_file(base: Path, df: DataFrame, name: str):
    """Write ``df`` as the single file ``base/name``; returns
    ``(path, arrow_table)`` so stats derive without a second action
    (see fixture_io — the coalesce(1) Spark-write shape cost ~6 s per
    tiny fixture file)."""
    out = base / name
    tbl = write_single_parquet(df, out)
    return out, tbl


def _commit_path(log_dir: Path, version: int) -> Path:
    return log_dir / f"{version:020d}.json"


def _stats_json(columns: list[str], rows: list[dict]) -> str:
    """``add.stats`` JSON the way Delta writers emit it: numRecords +
    per-scalar-column minValues/maxValues/nullCount, temporals as ISO
    strings.  ``rows`` come from the write's own Arrow table
    (fixture_io.arrow_rows) — no second collect action."""
    import datetime

    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    for c in columns:
        vals = [r[c] for r in rows if r[c] is not None]
        nulls[c] = len(rows) - len(vals)
        if not vals or isinstance(vals[0], (list, dict, bytes, bytearray)):
            continue
        lo, hi = min(vals), max(vals)
        if isinstance(lo, (datetime.date, datetime.datetime)):
            lo, hi = lo.isoformat(), hi.isoformat()
        mins[c], maxs[c] = lo, hi
    return json.dumps(
        {
            "numRecords": len(rows),
            "minValues": mins,
            "maxValues": maxs,
            "nullCount": nulls,
        }
    )


def build_delta_table(
    base: str | Path,
    commits: list[dict],
    orphan: DataFrame | None = None,
    checkpoint_at: int | None = None,
    drop_precheckpoint_commits: bool = False,
    checkpoint_kwargs: dict | None = None,
    column_mapping: bool = False,
) -> Path:
    """Write a Delta table whose version ``i`` applies ``commits[i]``:
    ``{"add": [df, ...], "remove": ["part-N.parquet", ...],
    "dv": {"part-N.parquet": mask_fn}}`` (every key optional).  Data
    files are named ``part-<version>-<j>.parquet``.

    ``dv`` attaches a deletion vector to an already-written file:
    ``mask_fn`` takes the file's pandas frame and returns a boolean
    mask of rows to DELETE; positions are taken from the file as
    written (no row-order assumptions), the bitmap goes to a
    UUID-named sidecar (storageType ``u``), and the commit re-adds
    the file with the descriptor plus a protocol upgrade to
    minReaderVersion 3 + deletionVectors on first use — exactly the
    action sequence delta-spark emits for a DELETE.

    ``checkpoint_at=v`` also writes ``v.checkpoint.parquet`` capturing
    the active set at version ``v``; with
    ``drop_precheckpoint_commits`` the ``<=v`` commit JSONs are deleted
    afterwards (Delta's retention cleanup), so a reader MUST use the
    checkpoint."""
    base = Path(base)
    log_dir = base / "_delta_log"
    log_dir.mkdir(parents=True, exist_ok=True)

    active: dict[str, dict] = {}
    active_dv: dict[str, dict] = {}
    active_stats: dict[str, str] = {}
    current_meta: dict | None = None
    protocol_upgraded = False
    physical: dict[str, str] = {}  # logical -> physical (column_mapping)
    for version, commit in enumerate(commits):
        actions: list[dict] = [
            {
                "commitInfo": {
                    "timestamp": 1700000000000 + version * 1000,
                    "operation": "WRITE",
                }
            }
        ]
        if version == 0:
            meta: dict = {
                "id": "00000000-0000-0000-0000-000000000000",
                "format": {"provider": "parquet", "options": {}},
                "partitionColumns": [],
            }
            if column_mapping:
                # physical names from the first add's columns; the
                # data files are written UNDER these names, exactly
                # like a name-mapped delta-spark table
                first = next(
                    (d for c in commits for d in c.get("add", [])), None
                )
                schema = first.schema.jsonValue()
                for k, field in enumerate(schema["fields"]):
                    phys = f"col-{k}a{field['name']}"
                    physical[field["name"]] = phys
                    field.setdefault("metadata", {})[
                        "delta.columnMapping.physicalName"
                    ] = phys
                    field["metadata"]["delta.columnMapping.id"] = k + 1
                meta["schemaString"] = json.dumps(schema)
                meta["configuration"] = {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": str(len(physical)),
                }
            actions.append({"metaData": meta})
            current_meta = meta
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": 2 if column_mapping else 1,
                        "minWriterVersion": 5 if column_mapping else 2,
                    }
                }
            )
        if commit.get("metadata_schema") is not None:
            # schema evolution: a new metaData action whose
            # schemaString is the given DataFrame's schema (include
            # partition columns in it, as real writers do)
            evolved_meta = {
                "id": "00000000-0000-0000-0000-000000000000",
                "format": {
                    "provider": "parquet", "options": {},
                },
                "partitionColumns": list(
                    (commit.get("partition") or {})
                ),
                "schemaString": json.dumps(
                    commit["metadata_schema"].schema.jsonValue()
                ),
                "configuration": {},
            }
            actions.append({"metaData": evolved_meta})
            current_meta = evolved_meta
        pv = commit.get("partition") or {}
        part_dir = "/".join(f"{k}={v}" for k, v in pv.items())
        for j, df in enumerate(commit.get("add", [])):
            name = f"part-{version}-{j}.parquet"
            if part_dir:
                name = f"{part_dir}/{name}"
            if physical:
                df = df.withColumnsRenamed(physical)
            data_file, tbl = _write_data_file(base, df, name)
            add = {
                "path": name,
                "partitionValues": dict(pv),
                "size": data_file.stat().st_size,
                "modificationTime": 1700000000000 + version,
                "dataChange": True,
            }
            # real writers key stats by the parquet (physical) column
            # names under column mapping — `df` is already renamed, so
            # _stats_json emits exactly that; the scan path translates
            # physical→logical through the rename map
            add["stats"] = _stats_json(df.columns, arrow_rows(tbl))
            actions.append({"add": add})
            active[name] = dict(pv)
            active_stats[name] = add["stats"]
        for name, mask_fn in commit.get("dv", {}).items():
            if not protocol_upgraded:
                actions.insert(
                    0,
                    {
                        "protocol": {
                            "minReaderVersion": 3,
                            "minWriterVersion": 7,
                            "readerFeatures": ["deletionVectors"],
                            "writerFeatures": ["deletionVectors"],
                        }
                    },
                )
                protocol_upgraded = True
            readd = _dv_readd(base, name, mask_fn, version)
            actions.append({"add": readd})
            active[name] = {}
            active_dv[name] = readd["deletionVector"]
        for j, cdf in enumerate(commit.get("cdc", [])):
            # a CDF writer routes change rows (data cols +
            # _change_type) through _change_data/ files referenced by
            # cdc actions; the same commit's add/remove bookkeeping is
            # then NOT part of the change feed
            name = f"_change_data/cdc-{version}-{j}.parquet"
            _write_data_file(base, cdf, name)
            actions.append(
                {
                    "cdc": {
                        "path": name,
                        "partitionValues": {},
                        "size": (base / name).stat().st_size,
                        "dataChange": False,
                    }
                }
            )
        for name in commit.get("remove", []):
            actions.append(
                {
                    "remove": {
                        "path": name,
                        "deletionTimestamp": 1700000000000 + version,
                        "dataChange": True,
                    }
                }
            )
            active.pop(name, None)
            active_stats.pop(name, None)
        _commit_path(log_dir, version).write_text(
            "\n".join(json.dumps(a) for a in actions) + "\n"
        )
        if checkpoint_at == version:
            ckw = dict(checkpoint_kwargs or {})
            lc = {"version": version, "size": len(active) + 2}
            if ckw.pop("v2", False):
                _write_checkpoint_v2(
                    log_dir, version, active, active_dv=active_dv,
                    **ckw,
                )
            else:
                _write_checkpoint(
                    log_dir, version, active, active_dv=active_dv,
                    metadata=current_meta,
                    active_stats=active_stats,
                    **ckw,
                )
                if ckw.get("num_parts"):
                    lc["parts"] = ckw["num_parts"]
            (log_dir / "_last_checkpoint").write_text(json.dumps(lc))

    if drop_precheckpoint_commits and checkpoint_at is not None:
        for v in range(checkpoint_at + 1):
            _commit_path(log_dir, v).unlink(missing_ok=True)

    if orphan is not None:
        _write_data_file(base, orphan, "orphan.parquet")
    return base


def _dv_readd(
    base: Path, name: str, mask_fn, version: int
) -> dict:
    """Attach a UUID-named deletion vector to data file ``name``:
    positions come from applying ``mask_fn`` to the file AS WRITTEN
    (pandas read-back — no row-order assumptions), so the fixture is
    deterministic whatever order Spark serialized the rows in."""
    import base64
    import uuid

    import pyarrow.parquet as pq

    from glue_table_cache_spark.sources.dv import write_dv_file

    pdf = pq.read_table(base / name).to_pandas()
    mask = mask_fn(pdf)
    positions = [int(i) for i, hit in enumerate(list(mask)) if hit]
    u = uuid.uuid4()
    desc_fields = write_dv_file(
        base / f"deletion_vector_{u}.bin", positions
    )
    return {
        "path": name,
        "partitionValues": {},
        "size": (base / name).stat().st_size,
        "modificationTime": 1700000000000 + version,
        "dataChange": False,
        "deletionVector": {
            "storageType": "u",
            "pathOrInlineDv": base64.b85encode(u.bytes).decode(),
            **desc_fields,
        },
    }


def _write_checkpoint(
    log_dir: Path,
    version: int,
    active: dict[str, dict],
    metadata_configuration: dict[str, str] | None = None,
    protocol: dict | None = None,
    num_parts: int | None = None,
    drop_parts: set[int] | None = None,
    active_dv: dict[str, dict] | None = None,
    txns: dict[str, int] | None = None,
    metadata: dict | None = None,
    active_stats: dict[str, str] | None = None,
) -> None:
    """Write a ``<version>.checkpoint.parquet`` (or, with ``num_parts``,
    the multi-part ``<version>.checkpoint.<part>.<numParts>.parquet``
    set).  One action per row, per the protocol: ``add`` rows carry the
    active set, and one row each carries ``metaData`` / ``protocol`` —
    after log cleanup the checkpoint is the ONLY place those gates
    live, which is exactly what the reader tests exercise.
    ``drop_parts`` simulates a lost/unlisted part (reader must refuse,
    not silently drop that part's files)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dv_type = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    add_type = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("stats", pa.string()),
            ("deletionVector", dv_type),
        ]
    )
    # real checkpoints persist the FULL metaData action (after log
    # cleanup the checkpoint is its only home) — schemaString and
    # partitionColumns included, which the r13 predicate pushdown
    # late-binds against
    meta_type = pa.struct(
        [
            ("id", pa.string()),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
        ]
    )
    proto_type = pa.struct(
        [
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
        ]
    )
    add_rows: list[dict | None] = [
        {
            "path": p,
            "partitionValues": list(pv.items()),
            "size": 0,
            "stats": (active_stats or {}).get(p),
            "deletionVector": (active_dv or {}).get(p),
        }
        for p, pv in sorted(active.items())
    ]
    meta_row = {
        "id": "00000000-0000-0000-0000-000000000000",
        "schemaString": (metadata or {}).get("schemaString"),
        "partitionColumns": (metadata or {}).get("partitionColumns"),
        "configuration": list(
            (
                metadata_configuration
                or (metadata or {}).get("configuration")
                or {}
            ).items()
        ),
    }
    proto_row = protocol or {
        "minReaderVersion": 1,
        "minWriterVersion": 2,
        "readerFeatures": None,
    }
    txn_rows = [
        {"appId": a, "version": v, "lastUpdated": 0}
        for a, v in sorted((txns or {}).items())
    ]
    n_rows = len(add_rows) + 2 + len(txn_rows)
    pad = [None] * len(txn_rows)
    adds = pa.array(add_rows + [None, None] + pad, type=add_type)
    metas = pa.array(
        [None] * len(add_rows) + [meta_row, None] + pad, type=meta_type
    )
    protos = pa.array(
        [None] * (len(add_rows) + 1) + [proto_row] + pad,
        type=proto_type,
    )
    cols = {"add": adds, "metaData": metas, "protocol": protos}
    if txn_rows:
        txn_type = pa.struct(
            [
                ("appId", pa.string()),
                ("version", pa.int64()),
                ("lastUpdated", pa.int64()),
            ]
        )
        cols["txn"] = pa.array(
            [None] * (len(add_rows) + 2) + txn_rows, type=txn_type
        )
    table = pa.table(cols)
    if num_parts is None:
        pq.write_table(
            table, log_dir / f"{version:020d}.checkpoint.parquet"
        )
        return
    for part in range(1, num_parts + 1):
        if drop_parts and part in drop_parts:
            continue
        # round-robin rows across parts so every part carries data
        idx = [i for i in range(n_rows) if i % num_parts == part - 1]
        pq.write_table(
            table.take(idx),
            log_dir
            / f"{version:020d}.checkpoint.{part:010d}.{num_parts:010d}.parquet",
        )


def _write_checkpoint_v2(
    log_dir: Path,
    version: int,
    active: dict[str, dict],
    active_dv: dict[str, dict] | None = None,
    v2_format: str = "parquet",
    n_sidecars: int = 2,
    drop_sidecar: bool = False,
    protocol: dict | None = None,
    metadata_configuration: dict[str, str] | None = None,
) -> None:
    """Write a v2 (uuid-named) checkpoint: the manifest
    ``<version>.checkpoint.<uuid>.{json,parquet}`` carries
    ``metaData`` / ``protocol`` / ``checkpointMetadata`` plus
    ``sidecar`` actions; the ``add`` file actions round-robin across
    ``n_sidecars`` parquet files under ``_delta_log/_sidecars/``.
    ``drop_sidecar`` deletes the first sidecar after writing (a reader
    must refuse, not silently lose its files)."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    sidecar_dir = log_dir / "_sidecars"
    sidecar_dir.mkdir(parents=True, exist_ok=True)
    dv_type = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    add_type = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("deletionVector", dv_type),
        ]
    )
    add_rows = [
        {
            "path": p,
            "partitionValues": list(pv.items()),
            "size": 0,
            "deletionVector": (active_dv or {}).get(p),
        }
        for p, pv in sorted(active.items())
    ]
    sidecar_names = []
    for s in range(n_sidecars):
        rows = [r for i, r in enumerate(add_rows) if i % n_sidecars == s]
        name = f"{uuid.uuid4()}.parquet"
        pq.write_table(
            pa.table({"add": pa.array(rows, type=add_type)}),
            sidecar_dir / name,
        )
        sidecar_names.append(name)
    if drop_sidecar:
        (sidecar_dir / sidecar_names[0]).unlink()

    proto = protocol or {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["v2Checkpoint"],
    }
    meta = {
        "id": "00000000-0000-0000-0000-000000000000",
        "format": {"provider": "parquet", "options": {}},
        "partitionColumns": [],
        "configuration": metadata_configuration or {},
    }
    manifest_uuid = uuid.uuid4()
    if v2_format == "json":
        lines = [
            {"checkpointMetadata": {"version": version}},
            {"protocol": proto},
            {"metaData": meta},
        ] + [
            {
                "sidecar": {
                    "path": n,
                    "sizeInBytes": (sidecar_dir / n).stat().st_size
                    if (sidecar_dir / n).exists()
                    else 0,
                }
            }
            for n in sidecar_names
        ]
        (
            log_dir
            / f"{version:020d}.checkpoint.{manifest_uuid}.json"
        ).write_text("\n".join(json.dumps(x) for x in lines) + "\n")
        return
    proto_type = pa.struct(
        [
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
        ]
    )
    meta_type = pa.struct(
        [
            ("id", pa.string()),
            ("configuration", pa.map_(pa.string(), pa.string())),
        ]
    )
    sidecar_type = pa.struct(
        [("path", pa.string()), ("sizeInBytes", pa.int64())]
    )
    n = 2 + len(sidecar_names)
    protos = pa.array(
        [
            {
                "minReaderVersion": proto["minReaderVersion"],
                "minWriterVersion": proto["minWriterVersion"],
                "readerFeatures": proto.get("readerFeatures"),
            }
        ]
        + [None] * (n - 1),
        type=proto_type,
    )
    metas = pa.array(
        [None]
        + [
            {
                "id": meta["id"],
                "configuration": list(meta["configuration"].items()),
            }
        ]
        + [None] * (n - 2),
        type=meta_type,
    )
    sidecars = pa.array(
        [None, None]
        + [
            {
                "path": s,
                "sizeInBytes": (sidecar_dir / s).stat().st_size
                if (sidecar_dir / s).exists()
                else 0,
            }
            for s in sidecar_names
        ],
        type=sidecar_type,
    )
    pq.write_table(
        pa.table(
            {"protocol": protos, "metaData": metas, "sidecar": sidecars}
        ),
        log_dir / f"{version:020d}.checkpoint.{manifest_uuid}.parquet",
    )
