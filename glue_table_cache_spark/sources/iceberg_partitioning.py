"""Iceberg HIDDEN PARTITIONING: transform-aware partition pruning.

The reference's manifest walk ignores partition tuples entirely
(/root/reference/src/util/iceberg.ts:29-33 reads only
``data_file.file_path``); this repo already prunes IDENTITY partition
values through the three-valued predicate tree.  Real Iceberg tables,
though, mostly partition by TRANSFORMS — ``day(ts)``, ``bucket(16,
id)``, ``truncate(4, s)`` (spec §Partition Transforms): the manifest
stores the *transformed* value under the spec field's name
(``ts_day=19723``), and a predicate on the *source* column can only
prune if it is rewritten into transformed space.

This module does that rewrite SOUNDLY:

* monotone transforms (``year``/``month``/``day``/``hour`` on
  temporals, ``truncate`` on strings/ints) map ``=`` to equality on
  the transformed literal and ``<``/``<=``/``>``/``>=`` to the
  non-strict bound (``ts > L`` ⇒ ``day(ts) >= day(L)``) — an
  over-approximation that can only KEEP extra files, never drop a
  matching one;
* ``bucket[N]`` maps ``=``/``IN`` through the spec's murmur3-based
  bucket function and leaves every other operator alone;
* anything not soundly mappable (``!=``, ``NOT IN``, unparseable
  literals, unknown transforms, ``void``) becomes ``TruePredicate``
  (keep);
* negation is pushed down to the leaves BEFORE mapping (De Morgan),
  because wrapping an over-approximation in ``NOT`` would flip a
  conservative keep into an unsound drop.

Used by the engine's ICEBERG branch next to the identity pruning and
zone-map skipping — all three are metadata-scale driver work that
shrinks the path list before Spark plans a single task.
"""

from __future__ import annotations

import re
import struct
from datetime import date, datetime, timezone

from glue_table_cache_spark.pruning import (
    And,
    Comparison,
    InList,
    Not,
    Or,
    Predicate,
    TruePredicate,
)

_EPOCH = date(1970, 1, 1)

#: ops whose transformed form is the non-strict LOWER bound
_GT_OPS = ("COMPARE_GREATERTHAN", "COMPARE_GREATERTHANOREQUALTO")
_LT_OPS = ("COMPARE_LESSTHAN", "COMPARE_LESSTHANOREQUALTO")

_NEGATE = {
    "COMPARE_EQUAL": "COMPARE_NOTEQUAL",
    "COMPARE_NOTEQUAL": "COMPARE_EQUAL",
    "COMPARE_GREATERTHAN": "COMPARE_LESSTHANOREQUALTO",
    "COMPARE_LESSTHANOREQUALTO": "COMPARE_GREATERTHAN",
    "COMPARE_LESSTHAN": "COMPARE_GREATERTHANOREQUALTO",
    "COMPARE_GREATERTHANOREQUALTO": "COMPARE_LESSTHAN",
}


def parse_transform(s: str) -> tuple[str | None, int | None]:
    """``(kind, param)`` for a spec transform string; ``(None, None)``
    for anything unknown (future transforms must not break pruning —
    they just stop contributing)."""
    s = (s or "").strip().lower()
    if s in ("identity",):
        return "identity", None
    if s in ("year", "years"):
        return "year", None
    if s in ("month", "months"):
        return "month", None
    if s in ("day", "days", "date"):
        return "day", None
    if s in ("hour", "hours", "date_hour"):
        return "hour", None
    if s == "void":
        return "void", None
    m = re.fullmatch(r"bucket\[(\d+)\]", s)
    if m:
        return "bucket", int(m.group(1))
    m = re.fullmatch(r"truncate\[(\d+)\]", s)
    if m:
        return "truncate", int(m.group(1))
    # Delta GENERATED-column kinds (delta.generationExpression →
    # sources/delta.py:generated_partition_fields): the partition
    # value is the generated column's own serialized form
    if s in ("gen_cast_date", "gen_year", "gen_month", "gen_day",
             "gen_hour"):
        return s, None
    m = re.fullmatch(r"gen_format\[(.+)\]", s)
    if m:
        return "gen_format", m.group(1)
    m = re.fullmatch(r"gen_trunc\[(year|month|day|hour)\]", s)
    if m:
        return "gen_trunc", m.group(1)
    return None, None


def iceberg_partition_fields(meta: dict) -> list[dict]:
    """Partition fields usable for PRUNING as
    ``[{"name", "transform", "source"}]`` with ``source`` resolved to
    the column name through the current schema's field ids; ``[]``
    for unpartitioned tables or metadata without specs (the v1
    singular ``partition-spec`` list is accepted too).

    Fields are unioned across EVERY spec the table has ever used —
    partition-spec EVOLUTION support.  A data file's manifest tuple is
    keyed by the field names of the spec it was written under, and a
    name absent from a file's tuple evaluates Unknown (keep) in the
    three-valued tree, so deriving predicates for old-spec fields
    prunes old-spec files without ever touching files written under a
    different spec.  Two guards keep that sound:

    * a name carrying CONFLICTING meanings across specs (different
      transform or different source column) is dropped entirely — its
      tuple values are ambiguous across file generations, and pruning
      on them could drop a matching file;
    * ``void`` replacements (v1 spec evolution overwrites a removed
      field in place, keeping the name with transform ``void``) do NOT
      conflict with the original transform: void-era files store null
      for the field, which coerces to Unknown under any derivation, so
      the original transform's derivation stays sound for the old
      files it was written for.

    Ordering: the default spec's fields first (unchanged
    single-spec behavior), then older/other specs' extras in spec
    order."""
    from glue_table_cache_spark.sources.iceberg import _current_schema

    specs = meta.get("partition-specs") or []
    field_lists: list[list[dict]] = []
    if specs:
        sid = meta.get("default-spec-id", 0)
        default = next(
            (s for s in specs if s.get("spec-id") == sid), specs[-1]
        )
        ordered = [default] + [s for s in specs if s is not default]
        field_lists = [s.get("fields") or [] for s in ordered]
    elif meta.get("partition-spec"):
        field_lists = [meta["partition-spec"]]
    if not any(field_lists):
        return []
    schema = _current_schema(meta) or {}
    names_by_id = {
        f["id"]: f["name"]
        for f in schema.get("fields", [])
        if "id" in f and "name" in f
    }
    out: list[dict] = []
    #: name → (kind, param, source) of the first NON-void meaning seen
    meaning: dict[str, tuple] = {}
    conflicted: set[str] = set()
    for fields in field_lists:
        for f in fields:
            name = f.get("name")
            source = names_by_id.get(f.get("source-id"))
            if not name or not source:
                continue
            kind, param = parse_transform(f.get("transform"))
            if kind == "void":
                continue  # null tuple values: nothing to derive
            key = (kind, param, source)
            if name in meaning:
                if meaning[name] != key:
                    conflicted.add(name)
                continue  # exact duplicate across specs
            meaning[name] = key
            out.append(
                {
                    "name": name,
                    "transform": f.get("transform"),
                    "source": source,
                }
            )
    return [f for f in out if f["name"] not in conflicted]


# -- the spec's bucket hash (murmur3_x86_32, Appendix B) ------------------


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Public-domain MurmurHash3 x86 32-bit (Austin Appleby), the hash
    Iceberg's ``bucket[N]`` is defined over (spec Appendix B)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    length = len(data)
    rounded = length - (length % 4)
    for i in range(0, rounded, 4):
        k = struct.unpack_from("<I", data, i)[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = length % 4
    if tail >= 3:
        k ^= data[rounded + 2] << 16
    if tail >= 2:
        k ^= data[rounded + 1] << 8
    if tail >= 1:
        k ^= data[rounded]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def bucket_value(const, n: int) -> int | None:
    """``bucket[n]`` of a SQL literal per the spec: ints hash as
    8-byte little-endian longs, strings as UTF-8 bytes; the bucket id
    is ``(hash & Integer.MAX_VALUE) % n``.  ``None`` for literal
    types the spec hashes differently than we can prove (floats are
    not valid bucket sources; temporals would need the source type)."""
    if isinstance(const, bool) or n <= 0:
        return None
    if isinstance(const, int):
        h = murmur3_x86_32(struct.pack("<q", const))
    elif isinstance(const, str):
        h = murmur3_x86_32(const.encode("utf-8"))
    else:
        return None
    return (h & 0x7FFFFFFF) % n


# -- temporal transforms ---------------------------------------------------


def _parse_temporal(const) -> datetime | None:
    """SQL literal → naive UTC datetime.  Accepts ISO date / datetime
    strings (the forms DuckDB serializes for DATE/TIMESTAMP
    literals); numbers are ambiguous (seconds? micros?) → None."""
    if isinstance(const, str):
        s = const.strip().replace("T", " ")
        try:
            dt = datetime.fromisoformat(s)
        except ValueError:
            return None
        if dt.tzinfo is not None:
            dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
        return dt
    return None


def temporal_value(kind: str, const) -> int | None:
    """The transformed partition value for a temporal literal:
    ``year`` → years since 1970, ``month`` → months since 1970-01,
    ``day`` → days since epoch, ``hour`` → hours since epoch — all
    FLOORED (calendar arithmetic, correct for pre-1970 instants)."""
    dt = _parse_temporal(const)
    if dt is None:
        return None
    if kind == "year":
        return dt.year - 1970
    if kind == "month":
        return (dt.year - 1970) * 12 + (dt.month - 1)
    if kind == "day":
        return dt.date().toordinal() - _EPOCH.toordinal()
    if kind == "hour":
        days = dt.date().toordinal() - _EPOCH.toordinal()
        return days * 24 + dt.hour
    return None


#: Java SimpleDateFormat patterns Delta generation expressions use →
#: strftime; whitelist of MONOTONE formats only (most-significant
#: field first, zero-padded, so string order = time order)
_JAVA_FORMATS = {
    "yyyy": "%Y",
    "yyyy-MM": "%Y-%m",
    "yyyy-MM-dd": "%Y-%m-%d",
    "yyyy-MM-dd HH": "%Y-%m-%d %H",
}


def transform_value(kind: str, param, const):
    """Partition-space value of ``const`` under the transform, or
    ``None`` when not soundly computable."""
    if kind == "identity":
        return const
    if kind in ("year", "month", "day", "hour"):
        return temporal_value(kind, const)
    if kind == "bucket":
        return bucket_value(const, param or 0)
    if kind == "truncate":
        w = param or 0
        if w <= 0 or isinstance(const, bool):
            return None
        if isinstance(const, str):
            return const[:w]
        if isinstance(const, int):
            return const - (const % w)  # Python % floors: -7 % 5 = 3
        return None
    if kind.startswith("gen_"):
        dt = _parse_temporal(const)
        if dt is None:
            return None
        if kind == "gen_cast_date":
            return dt.date().isoformat()
        if kind == "gen_year":
            return dt.year
        if kind == "gen_month":
            return dt.month
        if kind == "gen_day":
            return dt.day
        if kind == "gen_hour":
            return dt.hour
        if kind == "gen_format":
            fmt = _JAVA_FORMATS.get(param)
            return dt.strftime(fmt) if fmt else None
        if kind == "gen_trunc":
            floor = {
                "year": dt.replace(month=1, day=1, hour=0, minute=0,
                                   second=0, microsecond=0),
                "month": dt.replace(day=1, hour=0, minute=0,
                                    second=0, microsecond=0),
                "day": dt.replace(hour=0, minute=0, second=0,
                                  microsecond=0),
                "hour": dt.replace(minute=0, second=0, microsecond=0),
            }.get(param)
            # the Delta partition-value serialization of a timestamp
            return (
                floor.strftime("%Y-%m-%d %H:%M:%S")
                if floor is not None
                else None
            )
    return None


# -- predicate rewrite -----------------------------------------------------

_MONOTONE = (
    "identity", "year", "month", "day", "hour", "truncate",
    "gen_cast_date", "gen_year", "gen_format", "gen_trunc",
)

#: lossy NON-monotone kinds: only equality (and IN) can prune —
#: ``month(x) >= month(L)`` does not follow from ``x >= L``
_EQUALITY_ONLY = ("bucket", "gen_month", "gen_day", "gen_hour")


def _derive(column_fields: list[dict], op: str, const) -> Predicate:
    """Sound partition-space predicate for one effective comparison on
    a source column, ANDing the derivations of every spec field fed by
    that column (``ts`` may feed both ``ts_day`` and ``ts_hour``)."""
    out = []
    for f in column_fields:
        kind, param = parse_transform(f["transform"])
        if kind is None or kind == "void":
            continue
        if kind == "identity":
            out.append(Comparison(f["name"], op, const))
            continue
        tv = transform_value(kind, param, const)
        if tv is None:
            continue
        if kind in _MONOTONE:
            if op == "COMPARE_EQUAL":
                out.append(Comparison(f["name"], op, tv))
            elif op in _GT_OPS:
                out.append(
                    Comparison(
                        f["name"], "COMPARE_GREATERTHANOREQUALTO", tv
                    )
                )
            elif op in _LT_OPS:
                out.append(
                    Comparison(
                        f["name"], "COMPARE_LESSTHANOREQUALTO", tv
                    )
                )
            # != over a lossy transform can never prune
        elif kind in _EQUALITY_ONLY and op == "COMPARE_EQUAL":
            out.append(Comparison(f["name"], op, tv))
    if not out:
        return TruePredicate()
    return out[0] if len(out) == 1 else And(tuple(out))


def transform_partition_predicate(
    pred: Predicate, fields: list[dict]
) -> Predicate:
    """Rewrite a predicate over SOURCE columns into one over the
    spec's partition-tuple names, sound for keep-side pruning.

    Negation is pushed to the leaves first (De Morgan): the derived
    leaves over-approximate, and ``Not(over-approximation)`` would be
    an under-approximation — an unsound drop."""
    by_source: dict[str, list[dict]] = {}
    for f in fields:
        by_source.setdefault(f["source"].lower(), []).append(f)

    def walk(p: Predicate, negated: bool) -> Predicate:
        if isinstance(p, Comparison):
            fs = by_source.get(p.column.lower())
            if not fs:
                return TruePredicate()
            op = _NEGATE[p.op] if negated else p.op
            if op == "COMPARE_NOTEQUAL":
                # exact only for identity fields
                idents = [
                    f
                    for f in fs
                    if parse_transform(f["transform"])[0] == "identity"
                ]
                return _derive(idents, op, p.const)
            return _derive(fs, op, p.const)
        if isinstance(p, InList):
            fs = by_source.get(p.column.lower())
            if not fs:
                return TruePredicate()
            neg = p.negated != negated
            if neg:
                idents = [
                    f
                    for f in fs
                    if parse_transform(f["transform"])[0] == "identity"
                ]
                if not idents:
                    return TruePredicate()
                return And(
                    tuple(
                        InList(f["name"], p.consts, negated=True)
                        for f in idents
                    )
                )
            # IN = OR of equalities, derived per constant
            branches = [
                _derive(fs, "COMPARE_EQUAL", c) for c in p.consts
            ]
            if any(isinstance(b, TruePredicate) for b in branches):
                return TruePredicate()
            if not branches:
                return TruePredicate()
            return (
                branches[0]
                if len(branches) == 1
                else Or(tuple(branches))
            )
        if isinstance(p, And):
            kids = tuple(walk(c, negated) for c in p.children)
            return Or(kids) if negated else And(kids)
        if isinstance(p, Or):
            kids = tuple(walk(c, negated) for c in p.children)
            return And(kids) if negated else Or(kids)
        if isinstance(p, Not):
            return walk(p.child, not negated)
        # TruePredicate under negation is "NOT(something we kept as
        # True because we could not translate it)" — still keep
        return TruePredicate()

    return walk(pred, False)
