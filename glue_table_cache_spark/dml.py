"""SQL DML statements over ``glue.<db>.<table>`` references.

The reference's whole thesis is "SQL in, engine does the work"
(/root/reference/src/sql-transformer.ts:38-54) — applied here to the
WRITE side the reference never had: ``DELETE FROM`` / ``UPDATE`` /
``MERGE INTO`` on a glue reference parse here and dispatch (in
:meth:`GlueSparkEngine.sql`) on the table's registered format to the
repo's own row-level writers (``delete_from_delta`` /
``delete_from_iceberg`` / ``delete_from_hudi`` / ``update_delta`` /
``merge_into_delta``).  Unsupported format/clause combinations refuse
loudly with the narrower API to use instead.

Parsing is intentionally the same posture as the time-travel clause
(``transformer.extract_time_travel``): recognize the statement shape
with masked-span-aware regexes (string literals and comments are never
misread as syntax), not a full SQL grammar — anything outside the
recognized shape falls through to Spark SQL, whose parser surfaces the
real error.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from glue_table_cache_spark.errors import InvalidQueryError
from glue_table_cache_spark.transformer import (
    DEFAULT_DATABASE,
    TableReference,
    _masked_spans,
    _unquote,
)

_IDENT = r'(?:"[^"]+"|`[^`]+`|[A-Za-z_][A-Za-z0-9_$-]*)'
#: a glue reference at a known offset (no lookbehind needed — the
#: grammar anchors it after FROM/UPDATE/INTO)
_REF = re.compile(
    rf'(?P<cat>"(?:GLUE|glue)"|GLUE|glue)\s*\.\s*'
    rf"(?:(?P<db>{_IDENT})\s*\.\s*)?(?P<tbl>{_IDENT})",
)
_ALIAS = re.compile(rf"\s+(?:AS\s+)?(?P<alias>{_IDENT})", re.IGNORECASE)
_KEYWORDS = {
    "where", "set", "using", "on", "when", "then", "values", "select",
}


@dataclass(frozen=True)
class DeleteStatement:
    ref: TableReference
    predicate: str  # SQL text; "true" when WHERE was omitted


@dataclass(frozen=True)
class InsertStatement:
    ref: TableReference
    source_text: str  # SELECT/VALUES text, passed to a SELECT wrapper
    columns: tuple[str, ...] = field(default=())  # explicit col list
    overwrite: bool = False  # INSERT OVERWRITE: atomic full replace
    by_name: bool = False  # INSERT ... BY NAME: bind on column names


@dataclass(frozen=True)
class MaintenanceStatement:
    """``OPTIMIZE glue.db.t [ZORDER BY (a, b)]`` and
    ``VACUUM glue.db.t [RETAIN n HOURS]`` — the lakehouse maintenance
    verbs in their public Delta-dialect shapes, dispatched to the
    repo's format-specific maintenance functions."""

    ref: TableReference
    verb: str  # "optimize" | "vacuum" | "reorg" | "fsck"
    zorder_by: tuple[str, ...] = field(default=())
    retain_hours: float | None = None
    dry_run: bool = False  # VACUUM ... DRY RUN: report, don't delete
    predicate: str | None = None  # OPTIMIZE ... WHERE: partition scope


@dataclass(frozen=True)
class CreateTableStatement:
    """``CREATE TABLE [IF NOT EXISTS] glue.db.t [USING fmt]
    [PARTITIONED BY (a, b)] [LOCATION '<path>'] AS <select>`` — CTAS
    into a NEW catalog entry, written through the format's writer
    (``fmt`` ∈ DELTA | ICEBERG | HUDI | PARQUET, default PARQUET)."""

    ref: TableReference
    source_text: str  # the AS operand, passed to a SELECT wrapper
    using: str = "PARQUET"
    partition_by: tuple[str, ...] = field(default=())
    location: str | None = None
    if_not_exists: bool = False


@dataclass(frozen=True)
class CloneStatement:
    """``CREATE TABLE [IF NOT EXISTS] glue.db.new SHALLOW CLONE
    glue.db.src [VERSION AS OF n] [LOCATION '<path>']`` — a
    zero-copy Delta clone: a NEW table whose log references the
    source's data files by absolute path (Delta's documented shallow
    clone).  Writes to the clone never touch the source; VACUUM on
    the clone walks only its own directory, so referenced source
    files are naturally safe."""

    ref: TableReference
    source: TableReference
    version: int | None = None
    location: str | None = None
    if_not_exists: bool = False
    deep: bool = False  # [DEEP] CLONE: the files copy too


@dataclass(frozen=True)
class TablePropertiesStatement:
    """``ALTER TABLE glue.db.t SET TBLPROPERTIES ('k'='v', ...)`` /
    ``UNSET TBLPROPERTIES ('k', ...)`` — merged into (removed from)
    each format's own config home via a metadata-only commit: Delta
    ``configuration`` (the CDF/appendOnly/constraints enablement
    path), Iceberg ``properties``, ``hoodie.properties`` (structural
    Hudi keys refuse)."""

    ref: TableReference
    props: tuple[tuple[str, str], ...] = ()
    unset: tuple[str, ...] = ()


@dataclass(frozen=True)
class ConstraintStatement:
    """``ALTER TABLE glue.db.t ADD CONSTRAINT <name> CHECK (<expr>)``
    / ``DROP CONSTRAINT <name>`` — the CHECK expression lives in the
    table configuration as ``delta.constraints.<name>`` (the
    protocol's home for it); ADD validates EXISTING rows first and
    upgrades the protocol with ``checkConstraints``.  Delta-only."""

    ref: TableReference
    action: str  # "add" | "drop"
    name: str
    expr: str | None = None


@dataclass(frozen=True)
class CopyIntoStatement:
    """``COPY INTO glue.db.t FROM '<path>' [FILEFORMAT = PARQUET]``
    — idempotent incremental file loading: every file under the
    source loads exactly once however often the command re-runs
    (per-file SetTransaction ledger, atomic with the adds)."""

    ref: TableReference
    source: str
    file_format: str = "PARQUET"


@dataclass(frozen=True)
class ConvertStatement:
    """``CONVERT TO DELTA glue.db.t [PARTITIONED BY (col type, ...)]``
    — metadata-only in-place migration of a plain parquet table: a
    version-0 Delta log is generated over the existing files (no data
    copied) and the catalog entry flips to the DELTA provider.
    ``partition_keys`` are ``(name, sql_type)`` pairs; omitted types
    default to ``string`` (the Glue catalog's partition-key
    posture)."""

    ref: TableReference
    partition_keys: tuple = ()


@dataclass(frozen=True)
class RestoreStatement:
    """``RESTORE TABLE glue.db.t TO VERSION AS OF <n>`` — write-side
    time travel: Delta re-adds the old state as a new commit, Iceberg
    points ``current-snapshot-id`` back (metadata-only), Hudi rewinds
    the timeline (destructive, its restore semantics).  ``n`` is the
    SAME version identifier the read-side ``VERSION AS OF`` uses per
    format (Delta version / Iceberg sequence number / Hudi
    instant)."""

    ref: TableReference
    version: int | None
    timestamp: str | None = None  # TO TIMESTAMP AS OF '<literal>'


@dataclass(frozen=True)
class RefStatement:
    """``ALTER TABLE glue.db.t CREATE TAG|BRANCH <name> [AS OF
    VERSION <n>]`` / ``ALTER TABLE glue.db.t DROP TAG|BRANCH
    <name>`` — named snapshot refs (Iceberg ``refs`` map; other
    formats refuse).  A ref'd snapshot is travelable via ``VERSION
    AS OF '<name>'`` and pinned against expiry until dropped."""

    ref: TableReference
    action: str  # "create" | "drop"
    ref_type: str  # "tag" | "branch"
    name: str
    version: int | None = None


@dataclass(frozen=True)
class ShowStatement:
    """``SHOW TABLES IN glue[.db]`` (catalog enumeration),
    ``SHOW PARTITIONS glue.db.t`` (registered or listed partition
    tuples), ``DESCRIBE [TABLE] glue.db.t`` (scan schema),
    ``DESCRIBE HISTORY glue.db.t`` (the retained commit timeline —
    Delta commits / Iceberg snapshots / Hudi instants), ``SHOW
    TBLPROPERTIES glue.db.t`` (the format's own table configuration)
    ``SHOW CREATE TABLE glue.db.t`` (the registration DDL
    reconstructed from the scan schema + format metadata),
    ``SHOW COLUMNS IN glue.db.t`` (one column name per row),
    ``SHOW DATABASES IN glue`` (distinct databases of the store
    enumeration) — the introspection verbs, answered from the
    engine's own metadata paths.  ``verb`` is ``tables`` |
    ``partitions`` | ``describe`` | ``history`` |
    ``tblproperties`` | ``create`` | ``columns`` |
    ``databases``."""

    verb: str
    ref: TableReference | None = None
    database: str | None = None


@dataclass(frozen=True)
class AlterTableStatement:
    """``ALTER TABLE glue.db.t ADD COLUMNS (a INT, b STRING)`` —
    schema evolution as a schema-only commit through the format
    writer.  ``columns_ddl`` is the raw inner text, parsed by Spark's
    own DDL parser at execution time."""

    ref: TableReference
    columns_ddl: str


@dataclass(frozen=True)
class AlterColumnStatement:
    """``ALTER TABLE glue.db.t RENAME COLUMN a TO b`` / ``DROP
    COLUMN c`` — logical-schema-only commits (Delta: through column
    mapping, auto-upgraded; other formats refuse with pointers)."""

    ref: TableReference
    action: str  # "rename" | "drop"
    column: str
    new_name: str | None = None


@dataclass(frozen=True)
class DropTableStatement:
    """``DROP TABLE [IF EXISTS] glue.db.t`` — unregisters the catalog
    entry; data files are NOT deleted (Glue tables are external —
    dropping the catalog entry never owns the storage)."""

    ref: TableReference
    if_exists: bool = False


@dataclass(frozen=True)
class UpdateStatement:
    ref: TableReference
    set_exprs: dict[str, str]
    predicate: str


@dataclass(frozen=True)
class MergeClause:
    """One parsed WHEN clause of a MERGE statement.

    ``when`` is ``matched`` / ``not_matched`` / ``not_matched_by_source``;
    ``condition`` the extra AND predicate (alias-rewritten: target
    refs bare, source refs ``__src_``-prefixed) or None; ``action`` is
    ``update`` / ``delete`` / ``insert``.  ``set_exprs`` is None for
    ``UPDATE SET *`` (whole row from source); ``insert_cols``/``vals``
    are None for ``INSERT *``."""

    when: str
    condition: str | None
    action: str
    set_exprs: tuple[tuple[str, str], ...] | None = None
    insert_cols: tuple[str, ...] | None = None
    insert_vals: tuple[str, ...] | None = None


@dataclass(frozen=True)
class MergeStatement:
    ref: TableReference
    source_text: str  # the USING operand, passed to a SELECT wrapper
    on_keys: tuple[str, ...]
    clauses: tuple[str, ...] = field(default=())  # normalized WHEN texts
    parsed: tuple = field(default=())  # MergeClause per WHEN, in order
    #: MERGE WITH SCHEMA EVOLUTION INTO ... — new source columns
    #: widen the table schema before the clauses evaluate
    schema_evolution: bool = False

    @property
    def whole_row(self) -> bool:
        """True for the classic upsert pair (unconditional
        ``UPDATE SET *`` + ``INSERT *``) — the fast path the
        whole-row writers implement without a join on full rows."""
        acts = [
            (c.when, c.action, c.condition, c.set_exprs, c.insert_cols)
            for c in self.parsed
        ]
        return sorted(a[:2] for a in acts) == [
            ("matched", "update"),
            ("not_matched", "insert"),
        ] and all(
            c.condition is None
            and c.set_exprs is None
            and c.insert_cols is None
            for c in self.parsed
        )


def predicate_has_subquery(text) -> bool:
    """True when a DML predicate string carries a subquery
    (``IN (SELECT ...)`` / ``EXISTS (SELECT ...)``).  Spark allows
    subquery expressions in FILTERS but not per-row PROJECTIONS —
    writers use this to pick the filter-union evaluation shape.

    Scans with string literals and comments blanked out, so a
    literal containing ``(SELECT`` doesn't flip the plan shape and
    ``( /*x*/ SELECT ...`` is still detected."""
    if not isinstance(text, str):
        return False
    chars = list(text)
    for a, b in _masked_spans(text):
        for i in range(a, b):
            chars[i] = " "
    return bool(
        re.search(r"\(\s*SELECT\b", "".join(chars), re.IGNORECASE)
    )


def _strip_leading_trivia(sql: str) -> str:
    out = sql
    while True:
        s = out.lstrip()
        if s.startswith("--"):
            nl = s.find("\n")
            if nl < 0:
                return ""
            out = s[nl + 1 :]
        elif s.startswith("/*"):
            end = s.find("*/")
            if end < 0:
                return ""
            out = s[end + 2 :]
        else:
            return s


def _parse_ref(sql: str, pos: int) -> tuple[TableReference, int] | None:
    m = _REF.match(sql, pos)
    if not m:
        return None
    db = _unquote(m.group("db")) if m.group("db") else DEFAULT_DATABASE
    return (
        TableReference(db.lower(), _unquote(m.group("tbl")).lower()),
        m.end(),
    )


def _parse_alias(sql: str, pos: int) -> tuple[str | None, int]:
    m = _ALIAS.match(sql, pos)
    if not m:
        return None, pos
    alias = _unquote(m.group("alias"))
    if alias.lower() in _KEYWORDS:
        return None, pos
    return alias, m.end()


def _strip_alias_prefix(text: str, alias: str | None) -> str:
    """Drop ``alias.`` qualifiers outside string literals — the
    writers evaluate predicates against the raw table DataFrame where
    columns are unqualified."""
    if not alias:
        return text
    spans = _masked_spans(text)
    pat = re.compile(
        rf"(?<![A-Za-z0-9_$\"`]){re.escape(alias)}\s*\.\s*",
        re.IGNORECASE,
    )
    return pat.sub(
        lambda m: m.group(0) if any(
            a <= m.start() < b for a, b in spans
        ) else "",
        text,
    )


def _split_top_level(text: str, sep: str) -> list[str]:
    """Split on ``sep`` (a bare word like AND, or ``,``) at paren
    depth 0, outside string literals and comments."""
    # blank the masked spans so neither separators nor parens inside
    # literals/comments count
    chars = list(text)
    for a, b in _masked_spans(text):
        for i in range(a, b):
            chars[i] = " "
    mtext = "".join(chars)
    if sep == ",":
        pat = re.compile(",")
    else:
        pat = re.compile(rf"\b{sep}\b", re.IGNORECASE)
    parts: list[str] = []
    last = 0
    depth = 0
    scanned = 0
    for m in pat.finditer(mtext):
        seg = mtext[scanned : m.start()]
        depth += seg.count("(") - seg.count(")")
        scanned = m.start()
        if depth == 0:
            parts.append(text[last : m.start()])
            last = m.end()
    parts.append(text[last:])
    return parts


_DELETE_RE = re.compile(r"DELETE\s+FROM\s+", re.IGNORECASE)
_UPDATE_RE = re.compile(r"UPDATE\s+", re.IGNORECASE)
_MERGE_RE = re.compile(
    r"MERGE\s+(?P<evolve>WITH\s+SCHEMA\s+EVOLUTION\s+)?INTO\s+",
    re.IGNORECASE,
)
_INSERT_RE = re.compile(r"INSERT\s+INTO\s+", re.IGNORECASE)
_INSERT_OVER_RE = re.compile(
    r"INSERT\s+OVERWRITE\s+(?:TABLE\s+)?", re.IGNORECASE
)
_OPTIMIZE_RE = re.compile(r"OPTIMIZE\s+", re.IGNORECASE)
_VACUUM_RE = re.compile(r"VACUUM\s+", re.IGNORECASE)
_ZORDER_RE = re.compile(
    r"\s*ZORDER\s+BY\s*\(\s*(?P<cols>[^)]+)\)\s*$", re.IGNORECASE
)
_RETAIN_RE = re.compile(
    r"\s*RETAIN\s+(?P<n>\d+(?:\.\d+)?)\s+HOURS?\s*", re.IGNORECASE
)
_DRY_RUN_RE = re.compile(r"DRY\s+RUN\s*$", re.IGNORECASE)
_CREATE_RE = re.compile(
    r"CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?", re.IGNORECASE
)
_DROP_RE = re.compile(
    r"DROP\s+TABLE\s+(?P<ie>IF\s+EXISTS\s+)?", re.IGNORECASE
)
_CTAS_USING_RE = re.compile(
    r"USING\s+(?P<fmt>\w+)\s*", re.IGNORECASE
)
_CONVERT_RE = re.compile(
    r"CONVERT\s+TO\s+DELTA\s+", re.IGNORECASE
)
_REORG_RE = re.compile(r"REORG\s+TABLE\s+", re.IGNORECASE)
_COPY_INTO_RE = re.compile(r"COPY\s+INTO\s+", re.IGNORECASE)
_COPY_FROM_RE = re.compile(r"FROM\s+'(?P<path>[^']*)'\s*", re.IGNORECASE)
_FILEFORMAT_RE = re.compile(
    r"FILEFORMAT\s*=\s*(?P<fmt>\w+)\s*", re.IGNORECASE
)
_ADD_CONSTRAINT_RE = re.compile(
    rf"ADD\s+CONSTRAINT\s+(?P<name>{_IDENT})\s+CHECK\s*\(",
    re.IGNORECASE,
)
_DROP_CONSTRAINT_RE = re.compile(
    rf"DROP\s+CONSTRAINT\s+(?P<name>{_IDENT})\s*", re.IGNORECASE
)
_APPLY_PURGE_RE = re.compile(
    r"APPLY\s*\(\s*PURGE\s*\)\s*$", re.IGNORECASE
)
_PARTED_RE = re.compile(
    r"PARTITIONED\s+BY\s*\(\s*(?P<cols>[^)]+)\)\s*", re.IGNORECASE
)
_LOCATION_RE = re.compile(
    r"LOCATION\s+'(?P<path>[^']*)'\s*", re.IGNORECASE
)
_AS_RE = re.compile(r"AS\b\s*", re.IGNORECASE)
_CLONE_RE = re.compile(
    r"(?:(?P<shallow>SHALLOW)|DEEP)?\s*CLONE\s+", re.IGNORECASE
)
_CLONE_VERSION_RE = re.compile(
    r"VERSION\s+AS\s+OF\s+(?P<n>\d+)\s*", re.IGNORECASE
)
_CTAS_FORMATS = ("PARQUET", "DELTA", "ICEBERG", "HUDI")
_ALTER_RE = re.compile(r"ALTER\s+TABLE\s+", re.IGNORECASE)
_ADD_COLS_RE = re.compile(r"ADD\s+COLUMNS?\s*\(", re.IGNORECASE)
_RENAME_COL_RE = re.compile(
    rf"RENAME\s+COLUMN\s+(?P<old>{_IDENT})\s+TO\s+"
    rf"(?P<new>{_IDENT})\s*",
    re.IGNORECASE,
)
_DROP_COL_RE = re.compile(
    rf"DROP\s+COLUMN\s+(?P<col>{_IDENT})\s*", re.IGNORECASE
)
_SET_PROPS_RE = re.compile(
    r"SET\s+TBLPROPERTIES\s*\(", re.IGNORECASE
)
_UNSET_PROPS_RE = re.compile(
    r"UNSET\s+TBLPROPERTIES\s*\(", re.IGNORECASE
)
_PROP_KEY_RE = re.compile(r"'((?:[^']|'')*)'")
_REF_RE = re.compile(
    r"(?P<action>CREATE|DROP)\s+(?P<type>TAG|BRANCH)\s+"
    r"(?P<name>'(?:[^']|'')*'|[A-Za-z_][A-Za-z0-9_$-]*)\s*",
    re.IGNORECASE,
)
_REF_AS_OF_RE = re.compile(
    r"AS\s+OF\s+VERSION\s+(?P<n>\d+)\s*;?\s*$", re.IGNORECASE
)
_PROP_PAIR_RE = re.compile(r"'([^']*)'\s*=\s*'([^']*)'")
_RESTORE_RE = re.compile(
    r"RESTORE\s+(?:TABLE\s+)?", re.IGNORECASE
)
_TO_VERSION_RE = re.compile(
    r"TO\s+VERSION\s+AS\s+OF\s+(?P<n>\d+)\s*;?\s*$", re.IGNORECASE
)
_TO_TIMESTAMP_RE = re.compile(
    r"TO\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)'\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_TABLES_RE = re.compile(
    rf"SHOW\s+TABLES\s+(?:IN|FROM)\s+glue(?:\.(?P<db>{_IDENT}))?"
    r"\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_PARTS_RE = re.compile(r"SHOW\s+PARTITIONS\s+", re.IGNORECASE)
_SHOW_PROPS_RE = re.compile(
    r"SHOW\s+TBLPROPERTIES\s+", re.IGNORECASE
)
_SHOW_CREATE_RE = re.compile(
    r"SHOW\s+CREATE\s+TABLE\s+", re.IGNORECASE
)
_SHOW_COLUMNS_RE = re.compile(
    r"SHOW\s+COLUMNS\s+(?:IN|FROM)\s+", re.IGNORECASE
)
_SHOW_DBS_RE = re.compile(
    r"SHOW\s+(?:DATABASES|SCHEMAS)\s+(?:IN|FROM)\s+glue\s*;?\s*$",
    re.IGNORECASE,
)
_TRUNCATE_RE = re.compile(r"TRUNCATE\s+TABLE\s+", re.IGNORECASE)
_FSCK_RE = re.compile(
    r"FSCK\s+REPAIR\s+TABLE\s+", re.IGNORECASE
)
_DRY_RUN_RE = re.compile(r"^DRY\s+RUN\s*;?\s*$", re.IGNORECASE)
_DESC_HISTORY_RE = re.compile(
    r"(?:DESCRIBE|DESC)\s+HISTORY\s+", re.IGNORECASE
)
_DESC_DETAIL_RE = re.compile(
    r"(?:DESCRIBE|DESC)\s+DETAIL\s+", re.IGNORECASE
)
_DESCRIBE_RE = re.compile(
    r"(?:DESCRIBE|DESC)\s+(?:TABLE\s+)?(?:EXTENDED\s+)?",
    re.IGNORECASE,
)
_WHERE_RE = re.compile(r"\s*WHERE\s+", re.IGNORECASE)
_SET_RE = re.compile(r"\s*SET\s+", re.IGNORECASE)
_USING_RE = re.compile(r"\s*USING\s+", re.IGNORECASE)


def _trim_stmt(text: str) -> str:
    return text.strip().rstrip(";").strip()


def parse_dml(sql: str):
    """Parse ``sql`` as a glue-reference DML statement, or ``None``
    when it isn't one (SELECTs, DML on non-glue tables, ...).  A
    statement that IS glue DML but malformed raises
    :class:`InvalidQueryError` with what was expected."""
    s = _strip_leading_trivia(sql)
    if _CREATE_RE.match(s):
        m = _CREATE_RE.match(s)
        got = _parse_ref(s, m.end())
        if got is None:
            return None  # CREATE TABLE on a non-glue name
        ref, pos = got
        ine = m.group("ine") is not None
        using = "PARQUET"
        part: tuple[str, ...] = ()
        location = None
        rest = s[pos:].lstrip()
        while True:
            cm = _CLONE_RE.match(rest)
            if cm:
                deep = cm.group("shallow") is None
                got2 = _parse_ref(rest, cm.end())
                if got2 is None:
                    raise InvalidQueryError(
                        f"CREATE TABLE glue.{ref.database}."
                        f"{ref.table} SHALLOW CLONE: the source "
                        "must be a glue reference, got "
                        f"{rest[cm.end():][:40]!r}"
                    )
                src_ref, p2 = got2
                tail = rest[p2:].lstrip()
                version = None
                vm = _CLONE_VERSION_RE.match(tail)
                if vm:
                    version = int(vm.group("n"))
                    tail = tail[vm.end():].lstrip()
                lm = _LOCATION_RE.match(tail)
                if lm:
                    location = lm.group("path")
                    tail = tail[lm.end():].lstrip()
                if _trim_stmt(tail):
                    raise InvalidQueryError(
                        f"SHALLOW CLONE glue.{src_ref.database}."
                        f"{src_ref.table}: unexpected trailing "
                        f"text {_trim_stmt(tail)[:40]!r}"
                    )
                return CloneStatement(
                    ref, src_ref, version, location, ine, deep
                )
            am = _AS_RE.match(rest)
            if am:
                src = _trim_stmt(rest[am.end():])
                if not re.match(
                    r"(?:SELECT|VALUES|WITH|TABLE)\b|\(",
                    src,
                    re.IGNORECASE,
                ):
                    raise InvalidQueryError(
                        f"CREATE TABLE glue.{ref.database}."
                        f"{ref.table}: expected SELECT/VALUES/WITH "
                        f"after AS, got {src[:40]!r}"
                    )
                return CreateTableStatement(
                    ref, src, using, part, location, ine
                )
            um = _CTAS_USING_RE.match(rest)
            if um:
                using = um.group("fmt").upper()
                if using not in _CTAS_FORMATS:
                    raise InvalidQueryError(
                        f"CREATE TABLE ... USING {using}: supported "
                        f"formats are {', '.join(_CTAS_FORMATS)}"
                    )
                rest = rest[um.end():].lstrip()
                continue
            pm = _PARTED_RE.match(rest)
            if pm:
                part = tuple(
                    _unquote(c.strip())
                    for c in pm.group("cols").split(",")
                    if c.strip()
                )
                rest = rest[pm.end():].lstrip()
                continue
            lm = _LOCATION_RE.match(rest)
            if lm:
                location = lm.group("path")
                rest = rest[lm.end():].lstrip()
                continue
            raise InvalidQueryError(
                f"CREATE TABLE glue.{ref.database}.{ref.table}: "
                "expected USING <fmt>, PARTITIONED BY (cols), "
                f"LOCATION '<path>', or AS <select>; got "
                f"{rest[:40]!r} (column-definition DDL is not "
                "supported — use CTAS)"
            )
    if _COPY_INTO_RE.match(s):
        start = _COPY_INTO_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None  # COPY INTO a non-glue name
        ref, pos = got
        rest = s[pos:].lstrip()
        fm = _COPY_FROM_RE.match(rest)
        if not fm:
            raise InvalidQueryError(
                f"COPY INTO glue.{ref.database}.{ref.table}: "
                f"expected FROM '<path>', got {rest[:40]!r}"
            )
        source = fm.group("path")
        rest = rest[fm.end():].lstrip()
        fmt = "PARQUET"
        ffm = _FILEFORMAT_RE.match(rest)
        if ffm:
            fmt = ffm.group("fmt").upper()
            rest = rest[ffm.end():].lstrip()
        if _trim_stmt(rest):
            raise InvalidQueryError(
                f"COPY INTO glue.{ref.database}.{ref.table}: "
                f"unexpected trailing text {_trim_stmt(rest)[:40]!r}"
            )
        if fmt != "PARQUET":
            raise InvalidQueryError(
                f"COPY INTO: FILEFORMAT {fmt} is not supported "
                "(PARQUET only)"
            )
        return CopyIntoStatement(ref, source, fmt)
    if _CONVERT_RE.match(s):
        start = _CONVERT_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None  # CONVERT of a non-glue name
        ref, pos = got
        rest = s[pos:].lstrip()
        pkeys: tuple = ()
        pm = _PARTED_RE.match(rest)
        if pm:
            items = []
            for c in pm.group("cols").split(","):
                c = c.strip()
                if not c:
                    continue
                bits = c.split(None, 1)
                items.append(
                    (
                        _unquote(bits[0]),
                        bits[1].strip() if len(bits) > 1
                        else "string",
                    )
                )
            if not items:
                raise InvalidQueryError(
                    "CONVERT TO DELTA: empty PARTITIONED BY list"
                )
            pkeys = tuple(items)
            rest = rest[pm.end():].lstrip()
        if _trim_stmt(rest):
            raise InvalidQueryError(
                f"CONVERT TO DELTA glue.{ref.database}.{ref.table}: "
                f"unexpected trailing text {_trim_stmt(rest)[:40]!r}"
            )
        return ConvertStatement(ref, pkeys)
    if _RESTORE_RE.match(s):
        start = _RESTORE_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None  # RESTORE of a non-glue name
        ref, pos = got
        rest = s[pos:].lstrip()
        vm = _TO_VERSION_RE.match(rest)
        if vm:
            return RestoreStatement(ref, int(vm.group("n")))
        tm = _TO_TIMESTAMP_RE.match(rest)
        if tm:
            return RestoreStatement(ref, None, tm.group("ts"))
        raise InvalidQueryError(
            f"RESTORE TABLE glue.{ref.database}.{ref.table}: "
            f"expected TO VERSION AS OF <n> or TO TIMESTAMP AS OF "
            f"'<ts>', got {rest[:40]!r}"
        )
    m = _SHOW_TABLES_RE.match(s)
    if m:
        db = m.group("db")
        return ShowStatement(
            "tables", database=_unquote(db) if db else None
        )
    if _SHOW_PARTS_RE.match(s):
        start = _SHOW_PARTS_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None  # SHOW PARTITIONS on a non-glue table
        ref, pos = got
        rest = _trim_stmt(s[pos:])
        if rest:
            raise InvalidQueryError(
                f"SHOW PARTITIONS glue.{ref.database}.{ref.table}: "
                f"unexpected trailing text {rest[:40]!r}"
            )
        return ShowStatement("partitions", ref=ref)
    if _SHOW_DBS_RE.match(s):
        return ShowStatement("databases")
    if _SHOW_COLUMNS_RE.match(s):
        start = _SHOW_COLUMNS_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None  # SHOW COLUMNS on a non-glue name
        ref, pos = got
        rest = _trim_stmt(s[pos:])
        if rest:
            raise InvalidQueryError(
                f"SHOW COLUMNS IN glue.{ref.database}.{ref.table}: "
                f"unexpected trailing text {rest[:40]!r}"
            )
        return ShowStatement("columns", ref=ref)
    if _SHOW_CREATE_RE.match(s):
        start = _SHOW_CREATE_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None  # SHOW CREATE TABLE on a non-glue name
        ref, pos = got
        rest = _trim_stmt(s[pos:])
        if rest:
            raise InvalidQueryError(
                f"SHOW CREATE TABLE glue.{ref.database}."
                f"{ref.table}: unexpected trailing text "
                f"{rest[:40]!r}"
            )
        return ShowStatement("create", ref=ref)
    if _SHOW_PROPS_RE.match(s):
        start = _SHOW_PROPS_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None  # SHOW TBLPROPERTIES on a non-glue table
        ref, pos = got
        rest = _trim_stmt(s[pos:])
        if rest:
            raise InvalidQueryError(
                f"SHOW TBLPROPERTIES glue.{ref.database}."
                f"{ref.table}: unexpected trailing text {rest[:40]!r}"
            )
        return ShowStatement("tblproperties", ref=ref)
    if _DESC_HISTORY_RE.match(s):
        start = _DESC_HISTORY_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None  # DESCRIBE HISTORY of a non-glue name
        ref, pos = got
        rest = _trim_stmt(s[pos:])
        if rest:
            raise InvalidQueryError(
                f"DESCRIBE HISTORY glue.{ref.database}.{ref.table}: "
                f"unexpected trailing text {rest[:40]!r}"
            )
        return ShowStatement("history", ref=ref)
    if _DESC_DETAIL_RE.match(s):
        start = _DESC_DETAIL_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None  # DESCRIBE DETAIL of a non-glue name
        ref, pos = got
        rest = _trim_stmt(s[pos:])
        if rest:
            raise InvalidQueryError(
                f"DESCRIBE DETAIL glue.{ref.database}.{ref.table}: "
                f"unexpected trailing text {rest[:40]!r}"
            )
        return ShowStatement("detail", ref=ref)
    if _DESCRIBE_RE.match(s):
        start = _DESCRIBE_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None  # DESCRIBE of a non-glue name
        ref, pos = got
        rest = _trim_stmt(s[pos:])
        if rest:
            raise InvalidQueryError(
                f"DESCRIBE glue.{ref.database}.{ref.table}: "
                f"unexpected trailing text {rest[:40]!r}"
            )
        return ShowStatement("describe", ref=ref)
    if _ALTER_RE.match(s):
        m = _ALTER_RE.match(s)
        got = _parse_ref(s, m.end())
        if got is None:
            return None  # ALTER on a non-glue name: Spark's problem
        ref, pos = got
        rest = s[pos:].lstrip()
        sm = _SET_PROPS_RE.match(rest)
        if sm:
            depth = 1
            i = sm.end()
            while i < len(rest) and depth:
                if rest[i] == "(":
                    depth += 1
                elif rest[i] == ")":
                    depth -= 1
                i += 1
            if depth:
                raise InvalidQueryError(
                    "SET TBLPROPERTIES: unterminated property list"
                )
            inner = rest[sm.end(): i - 1]
            pairs = tuple(_PROP_PAIR_RE.findall(inner))
            if not pairs:
                raise InvalidQueryError(
                    "SET TBLPROPERTIES: expected "
                    "'key'='value' pairs, got "
                    f"{inner.strip()[:40]!r}"
                )
            trailing = _trim_stmt(rest[i:])
            if trailing:
                raise InvalidQueryError(
                    f"ALTER TABLE glue.{ref.database}.{ref.table}: "
                    f"unexpected trailing text {trailing[:40]!r}"
                )
            return TablePropertiesStatement(ref, pairs)
        um = _UNSET_PROPS_RE.match(rest)
        if um:
            depth = 1
            i = um.end()
            while i < len(rest) and depth:
                if rest[i] == "(":
                    depth += 1
                elif rest[i] == ")":
                    depth -= 1
                i += 1
            if depth:
                raise InvalidQueryError(
                    "UNSET TBLPROPERTIES: unterminated key list"
                )
            inner = rest[um.end(): i - 1]
            keys = tuple(
                k.replace("''", "'")
                for k in _PROP_KEY_RE.findall(inner)
            )
            if not keys:
                raise InvalidQueryError(
                    "UNSET TBLPROPERTIES: expected 'key' names, got "
                    f"{inner.strip()[:40]!r}"
                )
            trailing = _trim_stmt(rest[i:])
            if trailing:
                raise InvalidQueryError(
                    f"ALTER TABLE glue.{ref.database}.{ref.table}: "
                    f"unexpected trailing text {trailing[:40]!r}"
                )
            return TablePropertiesStatement(ref, (), keys)
        am2 = _ADD_CONSTRAINT_RE.match(rest)
        if am2:
            depth = 1
            i = am2.end()
            while i < len(rest) and depth:
                if rest[i] == "(":
                    depth += 1
                elif rest[i] == ")":
                    depth -= 1
                i += 1
            if depth:
                raise InvalidQueryError(
                    "ADD CONSTRAINT: unterminated CHECK expression"
                )
            expr = rest[am2.end(): i - 1].strip()
            if not expr:
                raise InvalidQueryError(
                    "ADD CONSTRAINT: empty CHECK expression"
                )
            trailing = _trim_stmt(rest[i:])
            if trailing:
                raise InvalidQueryError(
                    f"ALTER TABLE glue.{ref.database}.{ref.table}: "
                    f"unexpected trailing text {trailing[:40]!r}"
                )
            return ConstraintStatement(
                ref, "add", _unquote(am2.group("name")), expr
            )
        dm2 = _DROP_CONSTRAINT_RE.match(rest)
        if dm2:
            trailing = _trim_stmt(rest[dm2.end():])
            if trailing:
                raise InvalidQueryError(
                    f"ALTER TABLE glue.{ref.database}.{ref.table}: "
                    f"unexpected trailing text {trailing[:40]!r}"
                )
            return ConstraintStatement(
                ref, "drop", _unquote(dm2.group("name"))
            )
        rm = _REF_RE.match(rest)
        if rm:
            action = rm.group("action").lower()
            ref_type = rm.group("type").lower()
            name = rm.group("name")
            if name.startswith("'"):
                name = name[1:-1].replace("''", "'")
            tail = rest[rm.end():]
            version = None
            vm = _REF_AS_OF_RE.match(tail)
            if vm:
                if action == "drop":
                    raise InvalidQueryError(
                        f"DROP {ref_type.upper()} takes no AS OF "
                        "VERSION clause"
                    )
                version = int(vm.group("n"))
            elif _trim_stmt(tail):
                raise InvalidQueryError(
                    f"ALTER TABLE glue.{ref.database}.{ref.table} "
                    f"{action.upper()} {ref_type.upper()}: "
                    f"unexpected trailing text "
                    f"{_trim_stmt(tail)[:40]!r}"
                )
            return RefStatement(ref, action, ref_type, name, version)
        rnm = _RENAME_COL_RE.match(rest)
        if rnm:
            trailing = _trim_stmt(rest[rnm.end():])
            if trailing:
                raise InvalidQueryError(
                    f"ALTER TABLE glue.{ref.database}.{ref.table} "
                    "RENAME COLUMN: unexpected trailing text "
                    f"{trailing[:40]!r}"
                )
            return AlterColumnStatement(
                ref,
                "rename",
                _unquote(rnm.group("old")),
                _unquote(rnm.group("new")),
            )
        dcm = _DROP_COL_RE.match(rest)
        if dcm:
            trailing = _trim_stmt(rest[dcm.end():])
            if trailing:
                raise InvalidQueryError(
                    f"ALTER TABLE glue.{ref.database}.{ref.table} "
                    "DROP COLUMN: unexpected trailing text "
                    f"{trailing[:40]!r}"
                )
            return AlterColumnStatement(
                ref, "drop", _unquote(dcm.group("col"))
            )
        am = _ADD_COLS_RE.match(rest)
        if not am:
            raise InvalidQueryError(
                f"ALTER TABLE glue.{ref.database}.{ref.table}: only "
                "ADD COLUMNS (<name> <type>, ...), RENAME COLUMN a "
                "TO b, DROP COLUMN c, SET/UNSET TBLPROPERTIES, ADD/"
                "DROP CONSTRAINT, and CREATE/DROP TAG|BRANCH are "
                f"supported; got {rest[:40]!r}"
            )
        # balanced-paren scan: column types can carry parens
        # (DECIMAL(10,2)); nested STRUCT/ARRAY/MAP use angle
        # brackets and don't affect depth
        depth = 1
        i = am.end()
        while i < len(rest) and depth:
            if rest[i] == "(":
                depth += 1
            elif rest[i] == ")":
                depth -= 1
            i += 1
        if depth:
            raise InvalidQueryError(
                "ALTER TABLE ... ADD COLUMNS: unterminated column "
                "list"
            )
        inner = rest[am.end(): i - 1].strip()
        if not inner:
            raise InvalidQueryError(
                "ALTER TABLE ... ADD COLUMNS: empty column list"
            )
        trailing = _trim_stmt(rest[i:])
        if trailing:
            raise InvalidQueryError(
                f"ALTER TABLE glue.{ref.database}.{ref.table}: "
                f"unexpected trailing text {trailing[:40]!r}"
            )
        return AlterTableStatement(ref, inner)
    if _DROP_RE.match(s):
        m = _DROP_RE.match(s)
        got = _parse_ref(s, m.end())
        if got is None:
            return None
        ref, pos = got
        rest = _trim_stmt(s[pos:])
        if rest:
            raise InvalidQueryError(
                f"DROP TABLE glue.{ref.database}.{ref.table}: "
                f"unexpected trailing text {rest[:40]!r}"
            )
        return DropTableStatement(ref, m.group("ie") is not None)
    if _FSCK_RE.match(s):
        # FSCK REPAIR TABLE t [DRY RUN]: drop log entries whose
        # backing data file vanished out-of-band (Delta dialect)
        start = _FSCK_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None  # FSCK of a non-glue name
        ref, pos = got
        rest = _trim_stmt(s[pos:])
        dry = bool(rest) and bool(_DRY_RUN_RE.match(rest))
        if rest and not dry:
            raise InvalidQueryError(
                f"FSCK REPAIR TABLE glue.{ref.database}."
                f"{ref.table}: unexpected trailing text "
                f"{rest[:40]!r} (only DRY RUN)"
            )
        return MaintenanceStatement(ref, "fsck", dry_run=dry)
    if _TRUNCATE_RE.match(s):
        # TRUNCATE TABLE t == DELETE FROM t (no WHERE): same
        # row-level writers, same metadata-only full-file retire —
        # every active file proves full against the TRUE predicate
        start = _TRUNCATE_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None  # TRUNCATE of a non-glue name
        ref, pos = got
        rest = _trim_stmt(s[pos:])
        if rest:
            raise InvalidQueryError(
                f"TRUNCATE TABLE glue.{ref.database}.{ref.table}: "
                f"unexpected trailing text {rest[:40]!r} (partition "
                "scoping spells DELETE FROM ... WHERE)"
            )
        return DeleteStatement(ref, "true")
    if _DELETE_RE.match(s):
        start = _DELETE_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None  # DELETE on a non-glue table: Spark's problem
        ref, pos = got
        alias, pos = _parse_alias(s, pos)
        rest = _trim_stmt(s[pos:])
        if not rest:
            return DeleteStatement(ref, "true")
        m = _WHERE_RE.match(" " + rest)
        if not m:
            raise InvalidQueryError(
                f"DELETE FROM glue.{ref.database}.{ref.table}: "
                f"expected WHERE <predicate>, got {rest[:40]!r}"
            )
        pred = _trim_stmt((" " + rest)[m.end() :])
        if not pred:
            raise InvalidQueryError("DELETE: empty WHERE predicate")
        return DeleteStatement(ref, _strip_alias_prefix(pred, alias))
    ins = _INSERT_RE.match(s) or _INSERT_OVER_RE.match(s)
    if ins:
        overwrite = ins.re is _INSERT_OVER_RE
        start = ins.end()
        got = _parse_ref(s, start)
        if got is None:
            return None
        ref, pos = got
        rest = s[pos:].lstrip()
        bn = re.match(r"BY\s+NAME\b", rest, re.IGNORECASE)
        if bn:
            rest = rest[bn.end():].lstrip()
        cols: tuple[str, ...] = ()
        if rest.startswith("("):
            end = rest.find(")")
            if end < 0:
                raise InvalidQueryError(
                    "INSERT INTO: unterminated column list"
                )
            cols = tuple(
                _unquote(c.strip())
                for c in rest[1:end].split(",")
                if c.strip()
            )
            rest = rest[end + 1 :].lstrip()
        if bn and cols:
            raise InvalidQueryError(
                f"INSERT INTO glue.{ref.database}.{ref.table} BY "
                "NAME takes no column list — the source's own "
                "column names bind"
            )
        src = _trim_stmt(rest)
        if not re.match(
            r"(?:SELECT|VALUES|WITH|TABLE)\b|\(", src, re.IGNORECASE
        ):
            raise InvalidQueryError(
                f"INSERT INTO glue.{ref.database}.{ref.table}: "
                f"expected SELECT/VALUES/WITH source, got {src[:40]!r}"
            )
        return InsertStatement(
            ref, src, cols, overwrite, bn is not None
        )
    if _MERGE_RE.match(s):
        return _parse_merge(s)
    if _REORG_RE.match(s):
        start = _REORG_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None
        ref, pos = got
        rest = _trim_stmt(s[pos:])
        if not _APPLY_PURGE_RE.match(rest):
            raise InvalidQueryError(
                f"REORG TABLE glue.{ref.database}.{ref.table}: "
                f"expected APPLY (PURGE), got {rest[:40]!r}"
            )
        return MaintenanceStatement(ref, "reorg")
    if _OPTIMIZE_RE.match(s):
        start = _OPTIMIZE_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None
        ref, pos = got
        rest = _trim_stmt(s[pos:])
        predicate = None
        wm = re.match(r"WHERE\s+", rest, re.IGNORECASE)
        if wm:
            # the predicate runs to the ZORDER clause or the end
            zpos = re.search(
                r"\bZORDER\s+BY\b", rest, re.IGNORECASE
            )
            end = zpos.start() if zpos else len(rest)
            predicate = rest[wm.end(): end].strip()
            if not predicate:
                raise InvalidQueryError(
                    f"OPTIMIZE glue.{ref.database}.{ref.table}: "
                    "empty WHERE predicate"
                )
            rest = rest[end:].strip()
        if not rest:
            return MaintenanceStatement(
                ref, "optimize", predicate=predicate
            )
        zm = _ZORDER_RE.match(" " + rest)
        if not zm:
            raise InvalidQueryError(
                f"OPTIMIZE glue.{ref.database}.{ref.table}: expected "
                f"nothing, WHERE <pred>, or ZORDER BY (cols), got "
                f"{rest[:40]!r}"
            )
        cols = tuple(
            _unquote(c.strip())
            for c in zm.group("cols").split(",")
            if c.strip()
        )
        return MaintenanceStatement(
            ref, "optimize", zorder_by=cols, predicate=predicate
        )
    if _VACUUM_RE.match(s):
        start = _VACUUM_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None
        ref, pos = got
        rest = _trim_stmt(s[pos:])
        retain = None
        dry = False
        rm = _RETAIN_RE.match(" " + rest) if rest else None
        if rm:
            retain = float(rm.group("n"))
            rest = rest[rm.end() - 1:].strip()
        if rest and _DRY_RUN_RE.match(rest):
            dry = True
            rest = ""
        if rest:
            raise InvalidQueryError(
                f"VACUUM glue.{ref.database}.{ref.table}: expected "
                f"nothing, RETAIN n HOURS, and/or DRY RUN, got "
                f"{rest[:40]!r}"
            )
        return MaintenanceStatement(
            ref, "vacuum", retain_hours=retain, dry_run=dry
        )
    if _UPDATE_RE.match(s):
        start = _UPDATE_RE.match(s).end()
        got = _parse_ref(s, start)
        if got is None:
            return None
        ref, pos = got
        alias, pos = _parse_alias(s, pos)
        m = _SET_RE.match(s, pos)
        if not m:
            raise InvalidQueryError(
                f"UPDATE glue.{ref.database}.{ref.table}: expected "
                f"SET <col> = <expr>[, ...], got {s[pos:pos + 40]!r}"
            )
        rest = s[m.end() :]
        # WHERE splits off at top level (a SET expr may hold a
        # CASE WHEN ... but not a bare WHERE outside parens)
        where_parts = _split_top_level(rest, "WHERE")
        set_text = where_parts[0]
        pred = (
            _trim_stmt(" WHERE ".join(where_parts[1:]))
            if len(where_parts) > 1
            else "true"
        )
        set_exprs: dict[str, str] = {}
        for item in _split_top_level(set_text, ","):
            item = _trim_stmt(item)
            if not item:
                continue
            eq = re.match(
                rf"(?:{_IDENT}\s*\.\s*)?(?P<col>{_IDENT})\s*=\s*"
                r"(?P<expr>.+)$",
                item,
                re.DOTALL,
            )
            if not eq:
                raise InvalidQueryError(
                    f"UPDATE SET: expected <col> = <expr>, got "
                    f"{item[:60]!r}"
                )
            col = _unquote(eq.group("col"))
            if col in set_exprs:
                raise InvalidQueryError(
                    f"UPDATE SET assigns {col!r} twice"
                )
            set_exprs[col] = _strip_alias_prefix(
                eq.group("expr").strip(), alias
            )
        if not set_exprs:
            raise InvalidQueryError("UPDATE: empty SET clause")
        return UpdateStatement(
            ref, set_exprs, _strip_alias_prefix(pred, alias)
        )
    return None


_WHEN_HEAD_RE = re.compile(
    r"^(?P<neg>NOT\s+)?MATCHED(?P<bysrc>\s+BY\s+SOURCE)?"
    r"(?:\s+BY\s+TARGET)?(?:\s+AND\s+(?P<cond>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_COLS_VALS_RE = re.compile(
    r"^\((?P<cols>[^()]*)\)\s*VALUES\s*\((?P<vals>.*)\)$",
    re.IGNORECASE | re.DOTALL,
)


def _rewrite_merge_expr(
    text: str, t_aliases: tuple[str, ...], s_aliases: tuple[str, ...]
) -> str:
    """Qualifier rewrite for MERGE clause expressions: source refs
    ``s.col`` become ``__src_col`` (the joined frame's source column
    names), target refs ``t.col`` become bare ``col``.  Bare names
    resolve against the frame the expression runs on (target side for
    MATCHED/BY SOURCE clauses; the insert frame exposes source
    columns both bare and prefixed)."""
    out = text
    for a in s_aliases:
        spans = _masked_spans(out)
        pat = re.compile(
            rf"(?<![A-Za-z0-9_$\"`]){re.escape(a)}\s*\.\s*",
            re.IGNORECASE,
        )
        out = pat.sub(
            lambda m: m.group(0)
            if any(x <= m.start() < y for x, y in spans)
            else "__src_",
            out,
        )
    for a in t_aliases:
        out = _strip_alias_prefix(out, a)
    return out


def _parse_when_clause(text: str, rewrite) -> "MergeClause":
    """One ``WHEN ...`` clause body (text after the WHEN keyword) →
    :class:`MergeClause`.  ``rewrite`` is the alias-qualifier rewrite
    applied to every condition/expression."""
    parts = _split_top_level(text, "THEN")
    if len(parts) < 2:
        raise InvalidQueryError(
            f"MERGE: WHEN clause without THEN: {text[:60]!r}"
        )
    head = _trim_stmt(parts[0])
    action_text = _trim_stmt(" THEN ".join(parts[1:]))
    hm = _WHEN_HEAD_RE.match(head)
    if not hm:
        raise InvalidQueryError(
            f"MERGE: unrecognized WHEN clause {head[:60]!r}"
        )
    if hm.group("bysrc") and not hm.group("neg"):
        raise InvalidQueryError(
            "MERGE: MATCHED BY SOURCE is not a clause; use "
            "WHEN NOT MATCHED BY SOURCE"
        )
    when = (
        "matched"
        if not hm.group("neg")
        else ("not_matched_by_source" if hm.group("bysrc")
              else "not_matched")
    )
    cond = (
        rewrite(_trim_stmt(hm.group("cond")))
        if hm.group("cond")
        else None
    )
    am = re.match(
        r"^UPDATE\s+SET\s+(?P<set>.+)$",
        action_text,
        re.IGNORECASE | re.DOTALL,
    )
    if am:
        if when == "not_matched":
            raise InvalidQueryError(
                "MERGE: WHEN NOT MATCHED supports INSERT only "
                "(UPDATE needs a target row; did you mean "
                "NOT MATCHED BY SOURCE?)"
            )
        set_text = _trim_stmt(am.group("set"))
        if set_text == "*":
            if when == "not_matched_by_source":
                raise InvalidQueryError(
                    "MERGE: NOT MATCHED BY SOURCE cannot "
                    "UPDATE SET * — there is no source row to copy"
                )
            return MergeClause(when, cond, "update", None)
        pairs: list[tuple[str, str]] = []
        seen: set[str] = set()
        for item in _split_top_level(set_text, ","):
            item = _trim_stmt(item)
            if not item:
                continue
            eq = re.match(
                rf"(?:{_IDENT}\s*\.\s*)?(?P<col>{_IDENT})\s*=\s*"
                r"(?P<expr>.+)$",
                item,
                re.DOTALL,
            )
            if not eq:
                raise InvalidQueryError(
                    f"MERGE UPDATE SET: expected <col> = <expr>, "
                    f"got {item[:60]!r}"
                )
            col = _unquote(eq.group("col"))
            if col in seen:
                raise InvalidQueryError(
                    f"MERGE UPDATE SET assigns {col!r} twice"
                )
            seen.add(col)
            pairs.append((col, rewrite(eq.group("expr").strip())))
        if not pairs:
            raise InvalidQueryError("MERGE: empty UPDATE SET clause")
        return MergeClause(when, cond, "update", tuple(pairs))
    if re.match(r"^DELETE$", action_text, re.IGNORECASE):
        if when == "not_matched":
            raise InvalidQueryError(
                "MERGE: WHEN NOT MATCHED cannot DELETE — there is "
                "no target row (did you mean NOT MATCHED BY SOURCE?)"
            )
        return MergeClause(when, cond, "delete")
    im = re.match(
        r"^INSERT\s*(?P<rest>.*)$", action_text,
        re.IGNORECASE | re.DOTALL,
    )
    if im:
        if when != "not_matched":
            raise InvalidQueryError(
                f"MERGE: WHEN {'MATCHED' if when == 'matched' else 'NOT MATCHED BY SOURCE'} "
                "cannot INSERT — the source row either matched or "
                "does not exist"
            )
        rest = _trim_stmt(im.group("rest"))
        if rest == "*":
            return MergeClause(when, cond, "insert")
        cm = _INSERT_COLS_VALS_RE.match(rest)
        if not cm:
            raise InvalidQueryError(
                "MERGE INSERT: expected `*` or "
                "`(c1, ...) VALUES (e1, ...)`, got "
                f"{rest[:60]!r}"
            )
        cols = tuple(
            _unquote(_trim_stmt(c))
            for c in cm.group("cols").split(",")
            if _trim_stmt(c)
        )
        vals = tuple(
            rewrite(_trim_stmt(v))
            for v in _split_top_level(cm.group("vals"), ",")
            if _trim_stmt(v)
        )
        if not cols or len(cols) != len(vals):
            raise InvalidQueryError(
                f"MERGE INSERT: {len(cols)} columns but "
                f"{len(vals)} values"
            )
        return MergeClause(when, cond, "insert", None, cols, vals)
    raise InvalidQueryError(
        f"MERGE: unrecognized action {action_text[:60]!r} — "
        "expected UPDATE SET ..., DELETE, or INSERT ..."
    )


def _parse_merge(s: str) -> MergeStatement | None:
    start = _MERGE_RE.match(s).end()
    got = _parse_ref(s, start)
    if got is None:
        return None
    ref, pos = got
    t_alias, pos = _parse_alias(s, pos)
    m = _USING_RE.match(s, pos)
    if not m:
        raise InvalidQueryError(
            f"MERGE INTO glue.{ref.database}.{ref.table}: expected "
            f"USING <source>, got {s[pos:pos + 40]!r}"
        )
    rest = s[m.end() :]
    on_parts = _split_top_level(rest, "ON")
    if len(on_parts) < 2:
        raise InvalidQueryError(
            "MERGE: expected ON <condition> after USING <source>"
        )
    source_text = _trim_stmt(on_parts[0])
    after_on = " ON ".join(on_parts[1:])
    when_parts = _split_top_level(after_on, "WHEN")
    cond_text = _trim_stmt(when_parts[0])
    clauses = [_trim_stmt(w) for w in when_parts[1:] if _trim_stmt(w)]
    if not clauses:
        raise InvalidQueryError(
            "MERGE: expected at least one WHEN clause "
            "(WHEN [NOT] MATCHED [BY SOURCE] [AND cond] THEN ...)"
        )
    # source alias: trailing identifier after a view name or a
    # parenthesized subquery (kept inside source_text for the SELECT
    # wrapper; extracted only to resolve ON qualifiers), falling back
    # to the bare view name itself when the source is unaliased
    s_alias = None
    am = re.search(
        rf"(?:\)|{_IDENT})\s+(?:AS\s+)?(?P<alias>{_IDENT})\s*$",
        source_text,
        re.IGNORECASE,
    )
    if am and _unquote(am.group("alias")).lower() not in _KEYWORDS:
        s_alias = _unquote(am.group("alias"))
    elif re.fullmatch(
        rf"{_IDENT}(?:\s*\.\s*{_IDENT})*", source_text.strip()
    ):
        s_alias = _unquote(
            re.split(r"\s*\.\s*", source_text.strip())[-1]
        )
    keys: list[str] = []
    aliases = {
        a.lower() for a in (t_alias, s_alias, ref.table) if a
    }
    for conj in _split_top_level(cond_text, "AND"):
        eq = re.match(
            rf"^\s*(?:(?P<q1>{_IDENT})\s*\.\s*)?(?P<c1>{_IDENT})\s*=\s*"
            rf"(?:(?P<q2>{_IDENT})\s*\.\s*)?(?P<c2>{_IDENT})\s*$",
            conj,
        )
        c1 = _unquote(eq.group("c1")).lower() if eq else None
        c2 = _unquote(eq.group("c2")).lower() if eq else None
        if not eq or c1 != c2:
            raise InvalidQueryError(
                "MERGE ON must be a conjunction of same-named "
                "equi-join keys (t.k = s.k); got "
                f"{_trim_stmt(conj)!r}.  Expression keys need a "
                "Delta runtime — or compute the key as a column in "
                "the USING source"
            )
        for q in (eq.group("q1"), eq.group("q2")):
            if q and _unquote(q).lower() not in aliases:
                raise InvalidQueryError(
                    f"MERGE ON qualifier {q!r} matches neither the "
                    f"target ({t_alias or ref.table}) nor the source "
                    f"({s_alias or '<unaliased>'})"
                )
        keys.append(c1)
    t_aliases = tuple(
        a for a in (t_alias, ref.table) if a
    )
    s_aliases = tuple(a for a in (s_alias,) if a)

    def _rw(text: str) -> str:
        return _rewrite_merge_expr(text, t_aliases, s_aliases)

    parsed = tuple(_parse_when_clause(c, _rw) for c in clauses)
    # within each WHEN group, a clause without a condition swallows
    # every row the group sees — only the LAST clause of its group
    # may omit AND (the standard MERGE shape)
    by_group: dict[str, list] = {}
    for cl in parsed:
        by_group.setdefault(cl.when, []).append(cl)
    for group, cls_ in by_group.items():
        for cl in cls_[:-1]:
            if cl.condition is None:
                raise InvalidQueryError(
                    f"MERGE: an unconditional WHEN "
                    f"{'NOT MATCHED BY SOURCE' if group == 'not_matched_by_source' else group.replace('_', ' ').upper()} "
                    "clause must be the last of its group — later "
                    "clauses in the group can never match"
                )
    return MergeStatement(
        ref,
        source_text,
        tuple(keys),
        tuple(clauses),
        parsed,
        schema_evolution=bool(
            _MERGE_RE.match(s).group("evolve")
        ),
    )


def resolve_source_keys(source, keys: list[str]) -> list[str]:
    """Resolve parsed MERGE ON keys (the grammar lowercases them) to
    the source frame's actual column spellings — the dialect is
    case-insensitive, like Spark itself."""
    by_fold = {c.lower(): c for c in source.columns}
    return [by_fold.get(k.lower(), k) for k in keys]
