"""Delta checkpoint writer: snapshot the log so it stops growing.

Beyond-reference maintenance primitive.  Every reader of a Delta table
replays the JSON commit tail since the newest checkpoint; a table that
is only ever appended to (the ingestion loop, the streaming sink)
therefore gets slower to open with every commit until somebody writes
a checkpoint.  Real writers checkpoint every ~10 commits per the
public protocol (PROTOCOL.md, "Checkpoints"); this module is that half
— the repo's reader half (:func:`..sources.delta._read_checkpoint`,
``_last_checkpoint`` validation, multi-part completeness) has existed
since round 4/5 and consumes this output unchanged.

What a classic single-file checkpoint holds, one action per row:

* every ACTIVE ``add`` (full fidelity: partitionValues, size,
  modificationTime, ``stats`` JSON for zone-map skipping, and the
  ``deletionVector`` descriptor — a checkpoint must not drop DVs or
  deleted rows resurrect);
* the latest ``metaData`` and ``protocol`` (after log cleanup the
  checkpoint is the only place the schema and reader gates live);
* one ``txn`` row per streaming ``appId`` (SetTransaction recovery —
  a restarted exactly-once writer must still see its high-water mark
  when the JSON commits are gone).

Deviation, documented: expired ``remove`` tombstones are NOT carried.
The protocol keeps them so VACUUM implementations that diff
checkpoints can find stale files; this repo's
:func:`..sinks.delta_optimize.vacuum_delta` works by listing minus
the active set, so tombstone bookkeeping is dead weight here.

Atomicity: the checkpoint parquet is staged and ``rename``d into
place (same-directory rename; readers never see a partial file), then
``_last_checkpoint`` is swapped the same way.  Checkpointing is
IDEMPOTENT — two writers racing to checkpoint the same version produce
byte-equivalent state, so an already-present checkpoint file is
success, not an error.

``clean_delta_log`` is the retention half: JSON commits at or below a
checkpoint, older than ``retention_hours``, can be deleted — after
which time travel to them refuses loudly (by definition of retention)
while the current version, skipping stats, and txn recovery all keep
working from the checkpoint.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path
from urllib.parse import unquote

from glue_table_cache_spark.errors import GlueSparkError
from glue_table_cache_spark.sources.delta import (
    _CHECKPOINT_RE,
    _CHECKPOINT_V2_RE,
    _COMMIT_RE,
    _complete_checkpoints,
    _log_files,
    _verify_checkpoint_parts,
)
from glue_table_cache_spark.sources.iceberg import _read_bytes

#: map and struct layouts of the classic checkpoint columns; the
#: reader projects ("add", "metaData", "protocol", "txn") and
#: tolerates pyarrow's map-as-pair-list decoding
_DV_FIELDS = (
    "storageType",
    "pathOrInlineDv",
    "offset",
    "sizeInBytes",
    "cardinality",
)


def _checkpoint_schema():
    import pyarrow as pa

    str_map = pa.map_(pa.string(), pa.string())
    dv = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    return pa.schema(
        [
            (
                "txn",
                pa.struct(
                    [
                        ("appId", pa.string()),
                        ("version", pa.int64()),
                        ("lastUpdated", pa.int64()),
                    ]
                ),
            ),
            (
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", str_map),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("stats", pa.string()),
                        ("deletionVector", dv),
                    ]
                ),
            ),
            (
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("name", pa.string()),
                        ("description", pa.string()),
                        (
                            "format",
                            pa.struct(
                                [
                                    ("provider", pa.string()),
                                    ("options", str_map),
                                ]
                            ),
                        ),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", str_map),
                        ("createdTime", pa.int64()),
                    ]
                ),
            ),
            (
                "protocol",
                pa.struct(
                    [
                        ("minReaderVersion", pa.int32()),
                        ("minWriterVersion", pa.int32()),
                        ("readerFeatures", pa.list_(pa.string())),
                        ("writerFeatures", pa.list_(pa.string())),
                    ]
                ),
            ),
        ]
    )


def _as_dict(v) -> dict:
    """pyarrow decodes maps as pair lists; normalize back to dicts."""
    if isinstance(v, list):
        return dict(v)
    return dict(v or {})


def _full_replay(location: str, target: int) -> tuple[dict, dict]:
    """Replay to exactly ``target``, keeping FULL ``add`` dicts (the
    reader's :func:`.._replay` projects them down to (pv, dv, stats) —
    a checkpoint must re-emit size/modificationTime/stats untouched).
    Returns ``(adds_by_path, state)`` with ``state`` carrying
    ``metaData`` / ``protocol`` / ``txns``."""
    import io

    import pyarrow.parquet as pq

    names = _log_files(location)
    commits: dict[int, str] = {}
    checkpoints: dict[int, list[str]] = {}
    v2cps: dict[int, list[str]] = {}
    for p in names:
        m = _COMMIT_RE.search(p)
        if m:
            commits[int(m.group(1))] = p
            continue
        m = _CHECKPOINT_RE.search(p)
        if m:
            checkpoints.setdefault(int(m.group(1)), []).append(p)
            continue
        m = _CHECKPOINT_V2_RE.search(p)
        if m:
            v2cps.setdefault(int(m.group(1)), []).append(p)
    if (
        target not in commits
        and target not in checkpoints
        and target not in v2cps
    ):
        raise GlueSparkError(
            f"Delta version {target} of {location!r} does not exist"
        )

    def _ingest(c: str, rec: dict) -> None:
        if c == "add" and rec.get("path"):
            rec["partitionValues"] = _as_dict(
                rec.get("partitionValues")
            )
            # log paths are percent-encoded (PROTOCOL.md); state must
            # key on DECODED on-disk paths or _checkpoint_rows'
            # quote_log_path re-encodes and compounds per checkpoint
            adds[unquote(rec["path"])] = rec
        elif c == "metaData" and (
            rec.get("id") or rec.get("schemaString")
        ):
            state["metaData"] = rec
        elif (
            c == "protocol"
            and rec.get("minReaderVersion") is not None
        ):
            state["protocol"] = rec
        elif c == "txn" and rec.get("appId") is not None:
            state.setdefault("txns", {})[rec["appId"]] = rec.get(
                "version"
            )

    def _ingest_parquet(path: str, cols: tuple[str, ...]) -> list[dict]:
        pf = pq.ParquetFile(io.BytesIO(_read_bytes(path)))
        present = set(pf.schema_arrow.names)
        want = [c for c in cols if c in present]
        table = pf.read(columns=want)
        sidecars: list[dict] = []
        for c in want:
            for rec in table.column(c).to_pylist():
                if not rec:
                    continue
                if c == "sidecar":
                    if rec.get("path"):
                        sidecars.append(rec)
                else:
                    _ingest(c, rec)
        return sidecars

    adds: dict[str, dict] = {}
    state: dict = {}
    start = 0
    # incomplete part sets (a crashed multi-part write) are not
    # covering evidence — replay from an older complete checkpoint
    cp_versions = [
        v
        for v in {*_complete_checkpoints(checkpoints), *v2cps}
        if v <= target
    ]
    if cp_versions:
        cp = max(cp_versions)
        if cp in v2cps:
            manifest = sorted(v2cps[cp])[-1]
            if manifest.endswith(".json"):
                sidecars = []
                for line in _read_bytes(manifest).splitlines():
                    line = line.strip()
                    if not line:
                        continue
                    action = json.loads(line)
                    for c in ("add", "metaData", "protocol", "txn"):
                        if action.get(c):
                            _ingest(c, action[c])
                    if (action.get("sidecar") or {}).get("path"):
                        sidecars.append(action["sidecar"])
            else:
                sidecars = _ingest_parquet(
                    manifest,
                    ("metaData", "protocol", "txn", "sidecar"),
                )
            sc_dir = Path(location) / "_delta_log" / "_sidecars"
            for sc in sidecars:
                name = sc["path"]
                path = (
                    name
                    if "://" in name or name.startswith("/")
                    else str(sc_dir / name)
                )
                _ingest_parquet(path, ("add",))
        else:
            for p in _verify_checkpoint_parts(cp, checkpoints[cp]):
                _ingest_parquet(
                    p, ("add", "metaData", "protocol", "txn")
                )
        start = cp + 1
    for v in range(start, target + 1):
        if v not in commits:
            raise GlueSparkError(
                f"Delta log for {location!r} is missing commit {v} "
                f"(checkpoint target {target})"
            )
        for line in _read_bytes(commits[v]).splitlines():
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if action.get("add"):
                a = action["add"]
                adds[unquote(a["path"])] = a
            elif action.get("remove"):
                adds.pop(unquote(action["remove"]["path"]), None)
            elif action.get("metaData"):
                state["metaData"] = action["metaData"]
            elif action.get("protocol"):
                state["protocol"] = action["protocol"]
            elif action.get("txn"):
                t = action["txn"]
                if t.get("appId") is not None:
                    state.setdefault("txns", {})[t["appId"]] = t.get(
                        "version"
                    )
    return adds, state


def _norm_dv(dv) -> dict | None:
    if not dv:
        return None
    out = {k: dv.get(k) for k in _DV_FIELDS}
    for k in ("offset", "sizeInBytes", "cardinality"):
        if out.get(k) is not None:
            out[k] = int(out[k])
    return out


def _resolve_version(location: str, version: int | None) -> int:
    log_dir = Path(location) / "_delta_log"
    if version is not None:
        return version
    vs = [
        int(p.name[:20])
        for p in log_dir.glob("*.json")
        if p.name[:20].isdigit()
    ]
    if not vs:
        raise GlueSparkError(
            f"No Delta log found under {location!r}/_delta_log"
        )
    return max(vs)


def _checkpoint_rows(location: str, version: int, adds: dict, state: dict):
    """The checkpoint's row set from a replayed state: ``(txn_rows,
    add_rows, meta_row, proto_row)`` — shared by the classic and v2
    writers so both forms carry identical fidelity (stats, DVs, txn
    high-water marks)."""
    base = Path(location)
    now = int(time.time() * 1000)
    txn_rows = [
        {"appId": app, "version": v, "lastUpdated": None}
        for app, v in sorted((state.get("txns") or {}).items())
    ]
    from glue_table_cache_spark.sources.delta import quote_log_path

    add_rows = []
    for path in sorted(adds):
        a = adds[path]
        size = a.get("size")
        if size is None:
            f = base / path
            size = f.stat().st_size if f.exists() else 0
        add_rows.append(
            {
                # replay state keys on DECODED paths; the checkpoint
                # row re-encodes (same contract as commit JSON — the
                # reader unquotes both)
                "path": quote_log_path(path),
                "partitionValues": _as_dict(a.get("partitionValues")),
                "size": int(size),
                "modificationTime": int(
                    a.get("modificationTime") or now
                ),
                # rearranged bookkeeping, not new rows — readers of
                # the checkpoint must not see phantom inserts
                "dataChange": False,
                "stats": a.get("stats"),
                "deletionVector": _norm_dv(a.get("deletionVector")),
            }
        )
    meta = state.get("metaData")
    meta_row = None
    if meta:
        fmt = meta.get("format") or {}
        meta_row = {
            "id": meta.get("id"),
            "name": meta.get("name"),
            "description": meta.get("description"),
            "format": {
                "provider": fmt.get("provider", "parquet"),
                "options": _as_dict(fmt.get("options")),
            },
            "schemaString": meta.get("schemaString"),
            "partitionColumns": list(
                meta.get("partitionColumns") or []
            ),
            "configuration": _as_dict(meta.get("configuration")),
            "createdTime": meta.get("createdTime"),
        }
    proto = state.get("protocol")
    proto_row = None
    if proto:
        proto_row = {
            "minReaderVersion": proto.get("minReaderVersion"),
            "minWriterVersion": proto.get("minWriterVersion"),
            "readerFeatures": proto.get("readerFeatures"),
            "writerFeatures": proto.get("writerFeatures"),
        }
    if meta_row is None or proto_row is None:
        raise GlueSparkError(
            f"Delta log for {location!r} carries no "
            f"{'metaData' if meta_row is None else 'protocol'} action "
            "— a checkpoint without it would strand readers after log "
            "cleanup; write through write_delta_append first"
        )
    return txn_rows, add_rows, meta_row, proto_row


def _struct_table(schema, chunk: list[tuple[str, dict]]):
    """One action per row: each row populates exactly its action's
    struct column, nulls elsewhere (the checkpoint layout)."""
    import pyarrow as pa

    return pa.table(
        {
            name: pa.array(
                [r if c == name else None for c, r in chunk],
                type=schema.field(name).type,
            )
            for name in schema.names
        },
        schema=schema,
    )


def _checkpoint_policy(state: dict) -> str:
    meta = state.get("metaData") or {}
    return _as_dict(meta.get("configuration")).get(
        "delta.checkpointPolicy", "classic"
    )


def write_delta_checkpoint(
    location: str,
    version: int | None = None,
    max_actions_per_part: int | None = None,
) -> int:
    """Write a classic checkpoint for the Delta table at ``location``
    at ``version`` (default: the latest committed) plus the
    ``_last_checkpoint`` pointer; returns the checkpointed version.
    Idempotent: an existing checkpoint at that version is success.

    Single-file by default; ``max_actions_per_part`` splits the rows
    across the protocol's multi-part form
    (``<v>.checkpoint.<part>.<numParts>.parquet``) for tables whose
    active set outgrows one driver-side parquet — the reader half
    already verifies part completeness before trusting any of them."""
    base = Path(location)
    if "://" in location:
        raise GlueSparkError(
            "write_delta_checkpoint writes via the local filesystem; "
            "object stores need the scheme-specific rename path"
        )
    log_dir = base / "_delta_log"
    version = _resolve_version(location, version)
    adds, state = _full_replay(location, version)
    if _checkpoint_policy(state) == "v2":
        raise GlueSparkError(
            f"{location!r} sets delta.checkpointPolicy=v2 — writers "
            "must emit v2 checkpoints there; use "
            "write_delta_checkpoint_v2"
        )

    import pyarrow.parquet as pq

    txn_rows, add_rows, meta_row, proto_row = _checkpoint_rows(
        location, version, adds, state
    )
    rows: list[tuple[str, dict]] = (
        [("txn", r) for r in txn_rows]
        + [("add", r) for r in add_rows]
        + [("metaData", meta_row), ("protocol", proto_row)]
    )
    n = len(rows)
    schema = _checkpoint_schema()

    def part_table(chunk: list[tuple[str, dict]]):
        return _struct_table(schema, chunk)

    if max_actions_per_part is None or n <= max_actions_per_part:
        targets = [
            (log_dir / f"{version:020d}.checkpoint.parquet", rows)
        ]
        parts = None
    else:
        chunks = [
            rows[i : i + max_actions_per_part]
            for i in range(0, n, max_actions_per_part)
        ]
        parts = len(chunks)
        targets = [
            (
                log_dir
                / (
                    f"{version:020d}.checkpoint."
                    f"{i + 1:010d}.{parts:010d}.parquet"
                ),
                chunk,
            )
            for i, chunk in enumerate(chunks)
        ]
    for dest, chunk in targets:
        if dest.exists():
            continue
        tmp = log_dir / f".{dest.name}.{uuid.uuid4().hex[:8]}.tmp"
        pq.write_table(part_table(chunk), tmp)
        try:
            os.rename(tmp, dest)  # same-dir rename: atomic flip
        except OSError:
            tmp.unlink(missing_ok=True)
            if not dest.exists():
                raise
    # the pointer is a hint readers cross-validate; swap, never append
    lc = log_dir / "_last_checkpoint"
    current = None
    if lc.exists():
        try:
            current = json.loads(lc.read_text()).get("version")
        except ValueError:
            current = None
    if current is None or current < version:
        tmp = log_dir / f"._last_checkpoint.{uuid.uuid4().hex[:8]}.tmp"
        tmp.write_text(
            json.dumps({"version": version, "size": n, "parts": parts})
        )
        os.rename(tmp, lc)
    return version


def _v2_checkpoint_schema():
    import pyarrow as pa

    base = _checkpoint_schema()
    return pa.schema(
        [
            (
                "checkpointMetadata",
                pa.struct([("version", pa.int64())]),
            ),
            (
                "sidecar",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("sizeInBytes", pa.int64()),
                        ("modificationTime", pa.int64()),
                    ]
                ),
            ),
            base.field("txn"),
            base.field("metaData"),
            base.field("protocol"),
        ]
    )


def _sidecar_schema():
    import pyarrow as pa

    return pa.schema([_checkpoint_schema().field("add")])


def enable_v2_checkpoints(
    location: str, max_commit_retries: int = 10
) -> int:
    """Commit the protocol/metadata upgrade a table needs before v2
    checkpoints may be written: ``delta.checkpointPolicy=v2`` in the
    table configuration plus the ``v2Checkpoint`` reader/writer
    feature union-merged into the protocol (PROTOCOL.md "V2 Spec" +
    "Table Features").  Returns the committed version.  Idempotent:
    an already-v2 table returns its current version without a new
    commit."""
    from glue_table_cache_spark.sinks.delta_write import (
        _next_version,
        serialize_actions,
        upgraded_protocol,
    )

    base = Path(location)
    if "://" in location:
        raise GlueSparkError(
            "enable_v2_checkpoints commits via filesystem "
            "put-if-absent; object stores need an external commit "
            "coordinator"
        )
    log_dir = base / "_delta_log"
    for _attempt in range(max_commit_retries):
        latest = _resolve_version(location, None)
        _adds, state = _full_replay(location, latest)
        meta = state.get("metaData")
        if meta is None:
            raise GlueSparkError(
                f"Delta log for {location!r} carries no metaData — "
                "write through write_delta_append first"
            )
        proto = state.get("protocol") or {}
        conf = _as_dict(meta.get("configuration"))
        if (
            conf.get("delta.checkpointPolicy") == "v2"
            and "v2Checkpoint" in (proto.get("readerFeatures") or [])
        ):
            return latest
        conf["delta.checkpointPolicy"] = "v2"
        new_meta = dict(meta)
        new_meta["configuration"] = conf
        new_meta["format"] = {
            "provider": (meta.get("format") or {}).get(
                "provider", "parquet"
            ),
            "options": _as_dict(
                (meta.get("format") or {}).get("options")
            ),
        }
        new_meta["partitionColumns"] = list(
            meta.get("partitionColumns") or []
        )
        actions = [
            {
                "commitInfo": {
                    "timestamp": int(time.time() * 1000),
                    "operation": "UPGRADE CHECKPOINT POLICY",
                    "operationParameters": {"policy": "v2"},
                }
            },
            {
                "protocol": upgraded_protocol(
                    proto,
                    reader_features=("v2Checkpoint",),
                    writer_features=("v2Checkpoint",),
                )
            },
            {"metaData": new_meta},
        ]
        version = _next_version(log_dir)
        if version != latest + 1:
            continue  # someone committed while we replayed
        dest = log_dir / f"{version:020d}.json"
        try:
            fd = os.open(
                dest, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644
            )
        except FileExistsError:
            continue
        with os.fdopen(fd, "w") as f:
            f.write(
                serialize_actions(actions)
            )
        return version
    raise GlueSparkError(
        f"enable_v2_checkpoints lost the commit race "
        f"{max_commit_retries} times at {location!r}"
    )


def write_delta_checkpoint_v2(
    location: str,
    version: int | None = None,
    max_actions_per_sidecar: int | None = None,
) -> int:
    """Write a V2 (uuid-named) checkpoint: file actions go to sidecar
    parquet files under ``_delta_log/_sidecars/`` and a manifest
    ``<version>.checkpoint.<uuid>.parquet`` carries
    ``checkpointMetadata`` / ``metaData`` / ``protocol`` / ``txn``
    plus one ``sidecar`` pointer per file (PROTOCOL.md "V2 Spec").
    The repo's reader half (:func:`..sources.delta._read_checkpoint_v2`)
    consumes this output unchanged.

    Gated on the ``v2Checkpoint`` table feature — readers that do not
    understand uuid-named checkpoints must have been fenced out by
    the protocol BEFORE one appears in their listing; run
    :func:`enable_v2_checkpoints` first.  Sidecars are written and
    fsync-visible before the manifest renames into place, so a crash
    mid-write leaves only unreferenced sidecar files (garbage, never
    corruption) — the single-file manifest IS the atomic commit
    point, which is the v2 form's whole advantage over classic
    multi-part (no partial part sets to verify)."""
    base = Path(location)
    if "://" in location:
        raise GlueSparkError(
            "write_delta_checkpoint_v2 writes via the local "
            "filesystem; object stores need the scheme-specific "
            "rename path"
        )
    log_dir = base / "_delta_log"
    version = _resolve_version(location, version)
    adds, state = _full_replay(location, version)
    proto = state.get("protocol") or {}
    if "v2Checkpoint" not in (proto.get("readerFeatures") or []):
        raise GlueSparkError(
            f"{location!r} does not carry the v2Checkpoint reader "
            "feature — a uuid-named checkpoint would strand "
            "feature-unaware readers; run enable_v2_checkpoints "
            "first (or write a classic checkpoint)"
        )

    import pyarrow.parquet as pq

    txn_rows, add_rows, meta_row, proto_row = _checkpoint_rows(
        location, version, adds, state
    )
    # idempotence: any existing manifest at this version is success
    # (two racers write equivalent state under different uuids)
    if any(
        _CHECKPOINT_V2_RE.search(p.name)
        and int(p.name[:20]) == version
        for p in log_dir.glob(f"{version:020d}.checkpoint.*")
    ):
        return version
    sc_dir = log_dir / "_sidecars"
    sc_dir.mkdir(exist_ok=True)
    chunk_size = max_actions_per_sidecar or max(len(add_rows), 1)
    chunks = [
        add_rows[i : i + chunk_size]
        for i in range(0, len(add_rows), chunk_size)
    ] or [[]]
    sidecar_rows = []
    sc_schema = _sidecar_schema()
    for chunk in chunks:
        name = f"{uuid.uuid4()}.parquet"
        tmp = sc_dir / f".{name}.tmp"
        pq.write_table(
            _struct_table(sc_schema, [("add", r) for r in chunk]), tmp
        )
        os.rename(tmp, sc_dir / name)
        st = (sc_dir / name).stat()
        sidecar_rows.append(
            {
                "path": name,
                "sizeInBytes": int(st.st_size),
                "modificationTime": int(st.st_mtime * 1000),
            }
        )
    schema = _v2_checkpoint_schema()
    rows: list[tuple[str, dict]] = (
        [("checkpointMetadata", {"version": version})]
        + [("sidecar", r) for r in sidecar_rows]
        + [("txn", r) for r in txn_rows]
        + [("metaData", meta_row), ("protocol", proto_row)]
    )
    manifest = (
        log_dir / f"{version:020d}.checkpoint.{uuid.uuid4()}.parquet"
    )
    tmp = log_dir / f".{manifest.name}.{uuid.uuid4().hex[:8]}.tmp"
    pq.write_table(_struct_table(schema, rows), tmp)
    os.rename(tmp, manifest)  # the atomic commit point
    lc = log_dir / "_last_checkpoint"
    current = None
    if lc.exists():
        try:
            current = json.loads(lc.read_text()).get("version")
        except ValueError:
            current = None
    if current is None or current < version:
        tmp = log_dir / f"._last_checkpoint.{uuid.uuid4().hex[:8]}.tmp"
        tmp.write_text(
            json.dumps({"version": version, "size": len(rows)})
        )
        os.rename(tmp, lc)
    return version


def _v2_manifests(
    log_dir: Path,
) -> dict[int, list[tuple[Path, list[str] | None]]]:
    """Per version, the v2 manifests with their named sidecars —
    ``None`` sidecars marks an unreadable manifest (never a cleanup
    horizon, and its sidecars are unknowable so nothing it might
    reference may be deleted)."""
    import io

    import pyarrow.parquet as pq

    out: dict[int, list[tuple[Path, list[str] | None]]] = {}
    for p in log_dir.iterdir():
        m = _CHECKPOINT_V2_RE.search(p.name)
        if not m:
            continue
        v = int(m.group(1))
        names: list[str] | None
        try:
            if p.name.endswith(".json"):
                names = [
                    json.loads(line)["sidecar"]["path"]
                    for line in p.read_text().splitlines()
                    if line.strip() and "sidecar" in json.loads(line)
                ]
            else:
                pf = pq.ParquetFile(io.BytesIO(p.read_bytes()))
                names = []
                if "sidecar" in pf.schema_arrow.names:
                    names = [
                        rec["path"]
                        for rec in pf.read(columns=["sidecar"])
                        .column("sidecar")
                        .to_pylist()
                        if rec and rec.get("path")
                    ]
        except Exception:  # noqa: BLE001 - unreadable manifest
            names = None
        out.setdefault(v, []).append((p, names))
    return out


def _verified_v2_horizons(log_dir: Path) -> set[int]:
    """v2 checkpoint versions with a manifest naming only sidecars
    that exist — a manifest pointing at a vanished sidecar is not
    covering evidence for cleanup (the reader would refuse on it)."""
    sc_dir = log_dir / "_sidecars"
    out: set[int] = set()
    for v, manifests in _v2_manifests(log_dir).items():
        for _p, names in manifests:
            if names is not None and all(
                (
                    Path(n)
                    if "://" in n or n.startswith("/")
                    else sc_dir / n
                ).exists()
                for n in names
            ):
                out.add(v)
                break
    return out


def clean_delta_log(
    location: str,
    retention_hours: float = 168.0,
    dry_run: bool = True,
) -> list[str]:
    """Delete (or with ``dry_run=True``, list) JSON commits strictly
    below the newest checkpoint and older than ``retention_hours`` —
    the log-retention half of table maintenance (the data-file half is
    :func:`..sinks.delta_optimize.vacuum_delta`).  Commits at or above
    the newest checkpoint are never candidates: the checkpoint covers
    everything below it, nothing covers them.  Time travel to cleaned
    versions refuses loudly afterwards — that is what retention
    means."""
    if retention_hours < 0:
        raise GlueSparkError("retention_hours must be >= 0")
    base = Path(location)
    if "://" in location:
        raise GlueSparkError(
            "clean_delta_log deletes via the local filesystem"
        )
    log_dir = base / "_delta_log"
    cps: dict[int, list[str]] = {}
    for p in log_dir.iterdir():
        m = _CHECKPOINT_RE.search(p.name)
        if m:
            cps.setdefault(int(m.group(1)), []).append(str(p))
    # a crashed multi-part write leaves a partial set; counting it as
    # the horizon would delete the only commits that can still
    # reconstruct the table — only part-complete checkpoints (and v2
    # manifests whose sidecars all exist) cover
    complete = set(_complete_checkpoints(cps)) | _verified_v2_horizons(
        log_dir
    )
    if not complete:
        return []
    horizon = max(complete)
    cutoff = time.time() - retention_hours * 3600.0
    victims: list[str] = []
    for p in log_dir.glob("*.json"):
        m = _COMMIT_RE.search(p.name)
        if not m:
            continue
        v = int(m.group(1))
        if v >= horizon:
            continue
        if p.stat().st_mtime > cutoff:
            continue
        victims.append(str(p))
    # superseded checkpoints below the horizon age out the same way
    for p in log_dir.iterdir():
        m = _CHECKPOINT_RE.search(p.name)
        if not m or int(m.group(1)) >= horizon:
            continue
        if p.stat().st_mtime > cutoff:
            continue
        victims.append(str(p))
    # superseded v2 manifests too — and then any sidecar no SURVIVING
    # manifest references (superseded-only or crash-orphaned), since a
    # deleted manifest's sidecars are garbage the moment it goes.
    # Unreadable manifests are never victims and PIN the whole sidecar
    # dir (their references are unknowable).
    v2 = _v2_manifests(log_dir)
    victim_set = set()
    unreadable = False
    for v, manifests in v2.items():
        for p, names in manifests:
            if names is None:
                unreadable = True
                continue
            if v < horizon and p.stat().st_mtime <= cutoff:
                victims.append(str(p))
                victim_set.add(str(p))
    sc_dir = log_dir / "_sidecars"
    if sc_dir.is_dir() and not unreadable:
        live: set[str] = set()
        for manifests in v2.values():
            for p, names in manifests:
                if str(p) not in victim_set and names:
                    live.update(names)
        for sc in sc_dir.glob("*.parquet"):
            if sc.name in live or sc.stat().st_mtime > cutoff:
                continue
            victims.append(str(sc))
    if not dry_run:
        for v in victims:
            Path(v).unlink(missing_ok=True)
    return sorted(victims)
