"""Hive partition-directory name ↔ partition value.

Spark writes ``partitionBy`` output through Hive's ``escapePathName``:
characters that are unsafe in a path segment (``/ : = % ...``) become
``%XX`` hex escapes, and a NULL partition value becomes the
``__HIVE_DEFAULT_PARTITION__`` sentinel directory.  Every writer in
this package that parses staged ``k=v`` directories back into LOGICAL
partition values (Delta ``add.partitionValues``, Iceberg manifest
partition tuples) must invert that encoding — committing the escaped
string or the sentinel would corrupt partition pruning and
identity-column re-attachment for any value ``escapePathName``
rewrites (``UPDATE t SET p = 'a:b'``, ``SET p = NULL``).

The directory name itself keeps the ESCAPED form on disk — that is
the Hive/Spark layout contract the read path's partition discovery
expects; only the metadata value unescapes.

Inverse of ``org.apache.hadoop.hive.common.FileUtils.escapePathName``
(public Hive source); ``%`` itself is escaped as ``%25`` on write, so
a single ``%XX`` substitution pass is the exact inverse.
"""

from __future__ import annotations

import re

#: Hive's directory name for a NULL partition value
HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

_ESCAPED = re.compile(r"%([0-9A-Fa-f]{2})")


def unescape_partition_value(v: str) -> str | None:
    """The logical partition value behind one ``k=<v>`` directory
    segment: ``%XX`` escapes decode, the Hive null sentinel maps to
    ``None``."""
    if v == HIVE_NULL:
        return None
    return _ESCAPED.sub(lambda m: chr(int(m.group(1), 16)), v)


def partition_values_from_dir_parts(parts) -> dict[str, str | None]:
    """``('year=2024', 'tag=a%3Ab')`` → ``{'year': '2024',
    'tag': 'a:b'}`` — the logical partition values of a staged
    hive-layout directory chain (non-``k=v`` segments skipped)."""
    pv: dict[str, str | None] = {}
    for seg in parts:
        k, eq, v = seg.partition("=")
        if eq and k:
            pv[k] = unescape_partition_value(v)
    return pv


#: the characters Hive's ``escapePathName`` rewrites (public Hive
#: ``FileUtils.charToEscape`` / Spark ``ExternalCatalogUtils``):
#: ASCII control chars + DEL plus the path-hostile punctuation set
_TO_ESCAPE = (
    set(chr(c) for c in range(0x20))
    | {chr(0x7F)}
    | {'"', "#", "%", "'", "*", "/", ":", "=", "?", "\\", "{", "[", "]", "^"}
)


def escape_partition_value(v) -> str:
    """Forward Hive ``escapePathName``: the directory segment
    spelling of one partition VALUE (``a:b`` → ``a%3Ab``, ``None`` →
    the ``__HIVE_DEFAULT_PARTITION__`` sentinel) — what a writer
    building ``k=v`` paths by hand must emit so Spark's partition
    discovery and :func:`unescape_partition_value` round-trip."""
    if v is None:
        return HIVE_NULL
    s = str(v)
    if s == "":
        return HIVE_NULL  # Hive treats empty as the null sentinel
    return "".join(
        f"%{ord(ch):02X}" if ch in _TO_ESCAPE else ch for ch in s
    )
