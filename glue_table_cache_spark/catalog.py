"""Catalog data model + table-type classification + projection parsing.

Ports the *semantics* (not the code) of the reference's catalog layer:

* table-type classifier — /root/reference/src/util/glue.ts:13-19
* projection-pattern parsing — /root/reference/src/util/glue.ts:52-103
* catalog entry shape — /root/reference/src/types.ts:18-40

The metadata store is an interface so tests never need AWS (the
reference's own mock-first test design,
/root/reference/test/glue-table-cache.test.ts:6).  ``LocalMetadataStore``
is a plain dict/JSON-backed store over local or S3 paths; a real AWS Glue
store can implement the same two-method protocol with boto3.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum
from pathlib import Path
from typing import Protocol

from glue_table_cache_spark.errors import TableNotFoundError


class ETableType(str, Enum):
    """Table taxonomy (/root/reference/src/types.ts:4-11).  HUDI and
    DELTA are enumerated but unhandled in the reference; we keep them for
    parity and raise if encountered."""

    HIVE = "HIVE"
    ICEBERG = "ICEBERG"
    HUDI = "HUDI"
    DELTA = "DELTA"
    GLUE_PROJECTED = "GLUE_PROJECTED"
    UNPARTITIONED = "UNPARTITIONED"


@dataclass(frozen=True)
class PartitionKey:
    name: str
    type: str = "string"


@dataclass(frozen=True)
class PartitionEntry:
    """One catalog partition: its key values and (optional) storage
    location (= the per-partition shape at
    /root/reference/src/util/glue.ts:123-128)."""

    values: tuple[str, ...] = ()
    location: str | None = None


@dataclass(frozen=True)
class PartitionListing:
    """Partition metadata (= reference ``partitionMetadata``,
    /root/reference/src/types.ts:22-28).  Informational: the engine
    prunes from partition *keys* + path extraction, same as the
    reference (SURVEY.md §2.D.3)."""

    keys: tuple[str, ...] = ()
    values: tuple[PartitionEntry, ...] = ()


@dataclass(frozen=True)
class ProjectionPattern:
    """One column's partition-projection config
    (/root/reference/src/types.ts:35-40)."""

    column: str
    type: str  # "enum" | "integer" | "date" | "injected"
    format: str | None = None
    range: tuple | None = None
    values: tuple | None = None


@dataclass
class CatalogTable:
    """A catalog entry: everything the engine needs to plan a scan.

    The reference only ever consumes ``StorageDescriptor.Location`` and
    ``PartitionKeys`` plus the ``Parameters`` map
    (/root/reference/src/glue-table-cache.ts:272-277); column schema is
    schema-on-read from Parquet footers (SURVEY.md §1.3) and we keep that
    posture.
    """

    database: str
    name: str
    location: str | None
    partition_keys: list[PartitionKey] = field(default_factory=list)
    parameters: dict[str, str] = field(default_factory=dict)

    @property
    def table_type(self) -> ETableType:
        return classify_table_type(self.parameters, self.partition_keys)

    @property
    def projection(self) -> dict[str, ProjectionPattern]:
        """Parsed projection patterns (empty unless GLUE_PROJECTED)."""
        return parse_projection_patterns(self.parameters)

    @property
    def data_format(self) -> str:
        """Data-file format from Glue's ``classification`` parameter:
        ``parquet`` (default), ``orc``, ``csv``, or ``json``.  The
        reference is parquet-only and lists CSV/JSON as future work
        (/root/reference/README.md:7,22-23); we dispatch on the same
        catalog parameter AWS crawlers populate.  Anything else is
        refused at scan time (never silently read as parquet)."""
        return (self.parameters.get("classification") or "parquet").lower()

    @property
    def qualified_name(self) -> str:
        return f"{self.database}.{self.name}"


def classify_table_type(
    parameters: dict[str, str], partition_keys: list[PartitionKey]
) -> ETableType:
    """Classifier, same decision order as
    /root/reference/src/util/glue.ts:13-19: ICEBERG if
    ``table_type == "ICEBERG"`` (case-insensitive), GLUE_PROJECTED if
    ``projection.enabled == "true"``, HIVE if any partition keys, else
    UNPARTITIONED."""
    if parameters.get("table_type", "").upper() == "ICEBERG":
        return ETableType.ICEBERG
    # Delta/Hudi detection beyond the reference (which enumerates but
    # never classifies them): without this a Delta location would be
    # scanned as a raw parquet directory — reading every version's
    # files, deleted rows included.  The engine raises instead.
    provider = parameters.get("spark.sql.sources.provider", "").lower()
    classification = parameters.get("classification", "").lower()
    if provider == "delta" or classification == "delta":
        return ETableType.DELTA
    if (
        provider == "hudi"
        or classification == "hudi"
        or "hoodie.table.name" in parameters
    ):
        return ETableType.HUDI
    if parameters.get("projection.enabled", "").lower() == "true":
        return ETableType.GLUE_PROJECTED
    if partition_keys:
        return ETableType.HIVE
    return ETableType.UNPARTITIONED


def _coerce_range(raw: str) -> tuple:
    """Range accepts a JSON array or comma-split string
    (/root/reference/src/util/glue.ts:52-70)."""
    raw = raw.strip()
    if raw.startswith("["):
        try:
            return tuple(json.loads(raw))
        except json.JSONDecodeError:
            pass
    return tuple(part.strip() for part in raw.split(","))


def _coerce_values(raw: str) -> tuple:
    """Enum value lists accept a JSON array (the reference's only
    format — ``JSON.parse``, /root/reference/src/util/glue.ts:65-66,
    throwing on malformed JSON per test/util.glue.test.ts:331-339) or
    the AWS-documented comma-separated string."""
    raw_s = raw.strip()
    if raw_s.startswith(("[", "{")):
        parsed = json.loads(raw_s)  # malformed JSON raises, as JSON.parse
        if not isinstance(parsed, list):
            raise ValueError(
                f"projection values must be a JSON array, got {raw_s!r}"
            )
        return tuple(str(x) for x in parsed)
    return tuple(v.strip() for v in raw_s.split(","))


def parse_projection_patterns(
    parameters: dict[str, str],
) -> dict[str, ProjectionPattern]:
    """Parse ``projection.<col>.{type,range,format,values}`` keys from a
    table's parameter map (/root/reference/src/util/glue.ts:72-103)."""
    if parameters.get("projection.enabled", "").lower() != "true":
        return {}
    cols: dict[str, dict[str, str]] = {}
    for key, value in parameters.items():
        if not key.startswith("projection.") or key == "projection.enabled":
            continue
        parts = key.split(".")
        if len(parts) < 3:
            continue
        col, prop = parts[1], ".".join(parts[2:])
        cols.setdefault(col, {})[prop] = value
    patterns: dict[str, ProjectionPattern] = {}
    for col, props in cols.items():
        ptype = props.get("type", "").lower()
        if not ptype:
            continue
        patterns[col] = ProjectionPattern(
            column=col,
            type=ptype,
            format=props.get("format"),
            range=_coerce_range(props["range"]) if "range" in props else None,
            values=(
                _coerce_values(props["values"]) if "values" in props else None
            ),
        )
    return patterns


class MetadataStore(Protocol):
    """What the engine needs from a catalog backend.  AWS Glue, a Hive
    metastore, or a local dict can all satisfy it.  ``get_partitions``
    may raise; the engine degrades to an empty listing with a warning
    (reference posture, /root/reference/src/util/glue.ts:130-133)."""

    def get_table(self, database: str, table: str) -> CatalogTable: ...

    def get_partitions(
        self, database: str, table: str
    ) -> PartitionListing: ...


class LocalMetadataStore:
    """Dict/JSON-backed metadata store used in tests and local runs.

    Register tables programmatically or load a JSON file shaped like::

        {"db.tbl": {"location": "...", "partition_keys":
            [{"name": "year", "type": "string"}], "parameters": {...}}}
    """

    def __init__(self) -> None:
        self._tables: dict[str, CatalogTable] = {}
        self._partitions: dict[str, PartitionListing] = {}

    def register_table(self, table: CatalogTable) -> None:
        self._tables[table.qualified_name.lower()] = table

    def register_partitions(
        self, database: str, table: str, listing: PartitionListing
    ) -> None:
        self._partitions[f"{database}.{table}".lower()] = listing

    def list_tables(
        self, database: str | None = None
    ) -> list[CatalogTable]:
        """Registered tables, optionally filtered to one database —
        the enumeration behind ``SHOW TABLES IN glue[.db]``."""
        out = [
            t
            for t in self._tables.values()
            if database is None or t.database.lower() == database.lower()
        ]
        return sorted(out, key=lambda t: (t.database, t.name))

    def unregister_table(self, database: str, table: str) -> None:
        """Drop the catalog entry (and any registered partitions).
        Missing tables are a no-op — callers decide whether absence
        is an error."""
        key = f"{database}.{table}".lower()
        self._tables.pop(key, None)
        self._partitions.pop(key, None)

    def get_partitions(self, database: str, table: str) -> PartitionListing:
        """Registered partitions, or an empty listing (the reference's
        GetPartitions returns ``{keys: [], values: []}`` when the API
        yields nothing, /root/reference/src/util/glue.ts:118-121)."""
        self.get_table(database, table)  # TableNotFoundError if unknown
        return self._partitions.get(
            f"{database}.{table}".lower(), PartitionListing()
        )

    def register_parquet_dir(
        self,
        database: str,
        name: str,
        location: str,
        partition_keys: list[PartitionKey] | None = None,
        parameters: dict[str, str] | None = None,
    ) -> CatalogTable:
        tbl = CatalogTable(
            database=database,
            name=name,
            location=str(location),
            partition_keys=partition_keys or [],
            parameters=parameters or {},
        )
        self.register_table(tbl)
        return tbl

    @classmethod
    def from_json(cls, path: str | Path) -> LocalMetadataStore:
        store = cls()
        for qname, spec in json.loads(Path(path).read_text()).items():
            db, _, tbl = qname.partition(".")
            store.register_table(
                CatalogTable(
                    database=db,
                    name=tbl,
                    location=spec.get("location"),
                    partition_keys=[
                        PartitionKey(k["name"], k.get("type", "string"))
                        for k in spec.get("partition_keys", [])
                    ],
                    parameters=spec.get("parameters", {}),
                )
            )
        return store

    def get_table(self, database: str, table: str) -> CatalogTable:
        try:
            return self._tables[f"{database}.{table}".lower()]
        except KeyError:
            raise TableNotFoundError(database, table) from None
