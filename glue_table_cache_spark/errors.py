"""Error taxonomy mirroring the query-visible error semantics of the
reference (SURVEY.md §2.C; /root/reference/src/util/glue.ts:30,
/root/reference/src/glue-table-cache.ts:273-275)."""

from __future__ import annotations


class GlueSparkError(Exception):
    """Base class for engine errors."""


class TableNotFoundError(GlueSparkError):
    """Raised when the catalog has no such table.

    Mirrors ``"Table db.tbl not found"`` at
    /root/reference/src/util/glue.ts:30."""

    def __init__(self, database: str, table: str) -> None:
        super().__init__(f"Table {database}.{table} not found")
        self.database = database
        self.table = table


class NoStorageLocationError(GlueSparkError):
    """Mirrors ``"No storage location found"`` at
    /root/reference/src/glue-table-cache.ts:273-275."""

    def __init__(self, database: str, table: str) -> None:
        super().__init__(
            f"No storage location found for table {database}.{table}"
        )


class InvalidQueryError(GlueSparkError):
    """Empty/invalid SQL or malformed glue reference.

    Mirrors /root/reference/test/sql-transformer.test.ts:151-181."""


class UnsupportedProjectionError(GlueSparkError):
    """``injected`` projection type is explicitly unsupported, as in the
    reference (/root/reference/src/util/glue.ts:163-166)."""


class RetryableAPIError(GlueSparkError):
    """A transient metadata-API failure; retried up to 3 times.

    ``status_code`` 400/403 means *bail immediately* (no retry), matching
    /root/reference/src/glue-table-cache.ts:178-196."""

    def __init__(self, message: str, status_code: int | None = None) -> None:
        super().__init__(message)
        self.status_code = status_code

    @property
    def should_bail(self) -> bool:
        return self.status_code in (400, 403)
