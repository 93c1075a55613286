"""GlueSparkEngine — resolve → fetch metadata (cached) → list files
(cached) → prune → register views → run the query on Spark.

This is the Spark-first re-expression of the reference's main path
``convertGlueTableQuery`` (/root/reference/src/glue-table-cache.ts:242-251;
lifecycle table in SURVEY.md §3).  Where the reference emits DuckDB SQL
(listing tables, ART indexes, SET VARIABLE file lists, views) for the
caller to execute, we register temp views over DataFrames and hand the
rewritten query to Catalyst:

* HIVE / UNPARTITIONED tables (default mode) scan their directory
  natively — Spark's ``InMemoryFileIndex`` + ``PruneFileSourcePartitions``
  give listing + partition pruning with zero driver-side work, the plan
  that survives a 100 TB / 1000-executor scale-up.
* GLUE_PROJECTED tables (and all tables in ``explicit_file_lists`` mode)
  go through the reference-style path: driver-side listing (LRU+TTL
  cached), partition-value extraction by regex, conservative pruning
  (fixing the reference's OR→AND hazard, SURVEY.md §2.D.1), then
  ``spark.read.parquet(*pruned_paths)``.
* ICEBERG tables resolve the current snapshot's data files via the
  manifest walk in :mod:`glue_table_cache_spark.sources.iceberg`.
"""

from __future__ import annotations

import itertools
import re as _re
from concurrent.futures import ThreadPoolExecutor
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import logging

from glue_table_cache_spark.cache import (
    LruTtlCache,
    listing_cache_key,
    table_cache_key,
)
from glue_table_cache_spark.catalog import (
    CatalogTable,
    ETableType,
    MetadataStore,
    PartitionListing,
)
from glue_table_cache_spark.config import Credentials, EngineConfig
from glue_table_cache_spark.errors import (
    GlueSparkError,
    NoStorageLocationError,
)
from glue_table_cache_spark.listing import (
    FileInfo,
    FileSystem,
    ListingStats,
    filesystem_for,
    list_table_files,
    list_table_files_pruned,
)
from glue_table_cache_spark.projection import extractors_for
from glue_table_cache_spark.pruning import (
    TruePredicate,
    extract_partition_predicate,
    predicate_to_column,
    prune_files,
)
from glue_table_cache_spark.transformer import (
    TableReference,
    get_query_glue_table_refs,
    rewrite_query,
)


class GlueSparkEngine:
    def __init__(
        self,
        spark: SparkSession,
        metadata_store: MetadataStore,
        config: EngineConfig | None = None,
        filesystem: FileSystem | None = None,
    ) -> None:
        self.spark = spark
        self.store = metadata_store
        self.config = config or EngineConfig()
        self._fs = filesystem
        self._view_seq = itertools.count()  # per-query view-name tokens
        cfg = self.config
        retry = dict(
            retry_attempts=cfg.retry_attempts,
            retry_min_backoff_s=cfg.retry_min_backoff_s,
            retry_max_backoff_s=cfg.retry_max_backoff_s,
        )
        # two caches, same split as the reference
        # (/root/reference/src/glue-table-cache.ts:75-84)
        self._metadata_cache: LruTtlCache[CatalogTable] = LruTtlCache(
            max_entries=cfg.max_entries,
            ttl_ms=cfg.table_metadata_ttl_ms,
            **retry,
        )
        self._listing_cache: LruTtlCache[list[FileInfo]] = LruTtlCache(
            max_entries=cfg.max_entries,
            ttl_ms=cfg.s3_listing_ttl_ms,
            **retry,
        )
        # table key → listing keys, recorded whenever a listing is
        # cached: invalidate_table must find the listings even after
        # the metadata entry was LRU-evicted or TTL-expired (peek()
        # would miss and the stale listing would keep serving).  A SET
        # per table (r13): predicate-scoped format-scan entries mean
        # one table can own several cache keys at once
        self._listing_keys: dict[str, set[str]] = {}
        if cfg.credentials is not None or cfg.region is not None:
            self._apply_credentials(cfg.credentials, cfg.region)

    # -- public API (parity with the reference's, SURVEY.md §3) -------------

    def sql(self, query: str) -> DataFrame:
        """``convertGlueTableQuery`` + execute: resolve glue refs, set up
        views, rewrite, run through Spark SQL.

        Views are registered under per-query-unique names (a monotonic
        token + per-ref index): two concurrent ``sql()`` calls touching
        the same table with different WHERE clauses would otherwise race
        on ``createOrReplaceTempView`` and read each other's pruned
        DataFrames, and distinct databases that mangle to the same view
        name (``a-b`` vs ``ab``) can no longer collide."""
        from glue_table_cache_spark.transformer import (
            extract_time_travel,
        )

        # DML on a glue reference dispatches to the table format's
        # row-level writer instead of the read path ("SQL in, engine
        # does the work" — the reference's thesis applied to writes)
        from glue_table_cache_spark.dml import parse_dml

        stmt = parse_dml(query)
        if stmt is not None:
            return self._execute_dml(stmt)
        # `glue.db.t VERSION|TIMESTAMP AS OF x` clauses steer the
        # table's metadata walk and are STRIPPED before execution
        # (Spark temp views carry no travel syntax)
        travel, query = extract_time_travel(query)
        token = next(self._view_seq)
        # Iceberg metadata tables (`glue.db.t.snapshots` / .files /
        # .manifests / .history) resolve to per-query-unique views
        # over the format's metadata walk before the scan rewrite —
        # the 4-part shape is invisible to the normal ref regex
        from glue_table_cache_spark.transformer import (
            extract_metadata_refs,
        )

        meta_refs, query = extract_metadata_refs(
            query,
            lambda ref, kind, ver: (
                f"{ref.view_name}__{kind}"
                f"{'' if ver is None else f'_v{ver}'}__q{token}"
            ),
        )
        # table_changes(glue.db.t, start [, end]) — the batch CDF TVF
        from glue_table_cache_spark.transformer import (
            extract_table_changes,
        )

        def _tc_tag(v) -> str:
            # timestamp bounds carry chars invalid in view names
            return (
                "latest"
                if v is None
                else _re.sub(r"[^A-Za-z0-9]", "_", str(v))
            )

        cdf_refs, query = extract_table_changes(
            query,
            lambda ref, v1, v2: (
                f"{ref.view_name}__changes_{_tc_tag(v1)}_"
                f"{_tc_tag(v2)}__q{token}"
            ),
        )
        refs = get_query_glue_table_refs(query, strict=False)
        names = {
            ref: f"{ref.view_name}__q{token}_{i}"
            for i, ref in enumerate(refs)
        }
        self._register_views(refs, names, query, travel)
        # drop views in finally: analysis failures (e.g. a typo'd
        # column) must not leak one per-query-unique view per call.
        # Meta/CDF registration sits INSIDE the try — their builders
        # raise on user-visible paths (non-Iceberg metadata table,
        # non-Delta TVF, unknown sequence) and must not strand the
        # already-registered scan views
        try:
            for ref, kind, vname, ver in meta_refs:
                self._metadata_table_df(
                    ref, kind, ver
                ).createOrReplaceTempView(vname)
            for ref, v1, v2, vname in cdf_refs:
                self._table_changes_df(
                    ref, v1, v2
                ).createOrReplaceTempView(vname)
            df = self.spark.sql(rewrite_query(query, refs, names))
        finally:
            for name in names.values():
                self.spark.catalog.dropTempView(name)
            for _r, _k, vname, _v in meta_refs:
                self.spark.catalog.dropTempView(vname)
            for _r, _v1, _v2, vname in cdf_refs:
                self.spark.catalog.dropTempView(vname)
        return df

    def _metadata_table_df(
        self, ref, kind: str, version: int | None = None
    ) -> DataFrame:
        """The DataFrame behind ``glue.db.t.<kind> [VERSION AS OF
        n]`` — Iceberg's SQL inspection tables, answered from the
        engine's own metadata walk (public Iceberg spec "Metadata
        tables"); ``version`` pins the walk to the metadata state at
        that sequence number (the same identifier data-scan travel
        uses).  Non-Iceberg formats refuse toward the engine's
        unified ``DESCRIBE HISTORY`` surface."""
        from glue_table_cache_spark.catalog import ETableType
        from glue_table_cache_spark.errors import (
            NoStorageLocationError,
        )
        from glue_table_cache_spark.sources.iceberg import (
            iceberg_metadata_table,
        )

        tbl = self.get_table_metadata_cached(ref.database, ref.table)
        if not tbl.location:
            raise NoStorageLocationError(tbl.database, tbl.name)
        if tbl.table_type != ETableType.ICEBERG:
            raise GlueSparkError(
                f"glue.{ref.database}.{ref.table}.{kind}: Iceberg "
                f"metadata tables need an ICEBERG table (this one is "
                f"{tbl.table_type.name}); use DESCRIBE HISTORY "
                f"glue.{ref.database}.{ref.table} for the engine's "
                "unified timeline"
            )
        loc = tbl.location
        if loc.startswith("file:"):
            loc = loc[len("file:"):]
        return iceberg_metadata_table(
            self.spark, loc, kind, sequence_number=version
        )

    @staticmethod
    def _tc_ts_ms(literal: str) -> int:
        """Epoch millis of a ``table_changes`` timestamp bound
        (``'2024-01-01'`` / ``'2024-01-01 12:30:45'``); a naive
        literal reads as UTC — the timezone this repo's writers stamp
        commit timestamps in."""
        from datetime import datetime, timezone

        try:
            dt = datetime.fromisoformat(literal)
        except ValueError:
            raise GlueSparkError(
                f"table_changes: unparseable timestamp bound "
                f"{literal!r} (use ISO 'YYYY-MM-DD[ HH:MM:SS]', or "
                "an integer version/instant)"
            ) from None
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1000)

    def _table_changes_df(
        self, ref, start: int | str, end: int | str | None
    ) -> DataFrame:
        """The DataFrame behind ``table_changes(glue.db.t, start
        [, end])`` — the batch Change Data Feed TVF (public Delta
        dialect, extended to every lakehouse format this engine
        reads): the table's columns plus ``_change_type`` /
        ``_commit_version`` for the INCLUSIVE window.

        Bound spelling is per-format: Delta commit versions, Iceberg
        sequence numbers, Hudi request instants — the same
        identifiers each format's ``VERSION AS OF`` travel uses.
        Quoted timestamp literals resolve against the formats' commit
        timestamps (start → oldest commit at or after; end → newest
        at or before).  Row-level windows synthesize real change rows
        (Iceberg position-delete diffs; Hudi deltacommit log decode);
        what refuses is the genuinely non-reconstructible remainder
        (Iceberg equality-delete changes, Hudi replacecommits that
        retire groups with live logs) — with a pointer."""
        from glue_table_cache_spark.catalog import ETableType
        from glue_table_cache_spark.errors import (
            NoStorageLocationError,
        )

        tbl = self.get_table_metadata_cached(ref.database, ref.table)
        if not tbl.location:
            raise NoStorageLocationError(tbl.database, tbl.name)
        loc = tbl.location
        if loc.startswith("file:"):
            loc = loc[len("file:"):]
        if tbl.table_type == ETableType.DELTA:
            from glue_table_cache_spark.sources.delta import (
                delta_cdf,
                delta_version_at_or_after_timestamp,
                delta_version_at_timestamp,
            )

            if isinstance(start, str):
                start = delta_version_at_or_after_timestamp(
                    loc, self._tc_ts_ms(start)
                )
            if isinstance(end, str):
                end = delta_version_at_timestamp(
                    loc, self._tc_ts_ms(end)
                )
            df = delta_cdf(self.spark, loc, since_version=start - 1)
            if end is not None:
                df = df.where(F.col("_commit_version") <= end)
            return df
        if tbl.table_type == ETableType.ICEBERG:
            from glue_table_cache_spark.sources.iceberg import (
                iceberg_seq_for_timestamp,
                iceberg_table_changes,
            )

            if isinstance(start, str):
                start = iceberg_seq_for_timestamp(
                    loc, self._tc_ts_ms(start), "start"
                )
            if isinstance(end, str):
                end = iceberg_seq_for_timestamp(
                    loc, self._tc_ts_ms(end), "end"
                )
            return iceberg_table_changes(self.spark, loc, start, end)
        if tbl.table_type == ETableType.HUDI:
            from glue_table_cache_spark.sources.hudi import (
                hudi_instant_for_timestamp,
                hudi_table_changes,
            )

            if isinstance(start, str):
                start = hudi_instant_for_timestamp(
                    loc, self._tc_ts_ms(start), "start"
                )
            if isinstance(end, str):
                end = hudi_instant_for_timestamp(
                    loc, self._tc_ts_ms(end), "end"
                )
            return hudi_table_changes(
                self.spark,
                loc,
                start,
                end,
                record_key_field=self._hudi_record_key(tbl),
            )
        raise GlueSparkError(
            f"table_changes(glue.{ref.database}.{ref.table}, ...): "
            f"the batch CDF TVF needs a DELTA, ICEBERG, or HUDI "
            f"table (this one is {tbl.table_type.name})"
        )

    def setup_views(self, query: str) -> list[TableReference]:
        """Register one *stable-named* temp view per glue table referenced
        by ``query`` (= ``getGlueTableViewSetupSql``,
        /root/reference/src/glue-table-cache.ts:253-347) for callers that
        want to query ``glue__db_tbl`` views directly."""
        refs = get_query_glue_table_refs(query, strict=False)
        self._register_views(refs, {r: r.view_name for r in refs}, query)
        return refs

    def _execute_dml(self, stmt) -> DataFrame:
        """Dispatch a parsed DML statement to the table format's
        row-level writer; returns a one-row metrics DataFrame
        (``operation, version, rows_updated, rows_inserted,
        rows_deleted``).  A successful commit invalidates the table's
        cached metadata walk so the next scan replays the new version
        — writers are externally-visible state changes, the one case
        the reference's ``invalidateTable`` exists for."""
        from glue_table_cache_spark.dml import (
            AlterColumnStatement,
            AlterTableStatement,
            CloneStatement,
            ConstraintStatement,
            ConvertStatement,
            CopyIntoStatement,
            CreateTableStatement,
            DeleteStatement,
            DropTableStatement,
            InsertStatement,
            MaintenanceStatement,
            MergeStatement,
            RefStatement,
            RestoreStatement,
            ShowStatement,
            TablePropertiesStatement,
            UpdateStatement,
        )

        ref = stmt.ref
        # DDL resolves (or intentionally fails to resolve) the table
        # itself — dispatch before the existence lookup below
        if isinstance(stmt, CreateTableStatement):
            return self._execute_create(stmt)
        if isinstance(stmt, CloneStatement):
            return self._execute_clone(stmt)
        if isinstance(stmt, DropTableStatement):
            return self._execute_drop(stmt)
        if isinstance(stmt, ShowStatement):
            return self._execute_show(stmt)
        tbl = self.get_table_metadata_cached(ref.database, ref.table)
        if not tbl.location:
            raise NoStorageLocationError(tbl.database, tbl.name)
        loc = tbl.location
        if loc.startswith("file:"):
            loc = loc[len("file:"):]
        ttype = tbl.table_type
        qual = f"glue.{ref.database}.{ref.table}"
        fmt_hint = (
            f"{qual} is registered as {ttype.name} — raw parquet has "
            "no transaction log to commit against; register the "
            "location as a DELTA/ICEBERG/HUDI table"
        )
        version: object = None
        n_upd = n_ins = n_del = 0
        if isinstance(stmt, ConvertStatement):
            return self._execute_convert(stmt, tbl, loc, qual)
        if isinstance(stmt, CopyIntoStatement):
            if ttype != ETableType.DELTA:
                raise GlueSparkError(
                    f"COPY INTO {qual}: the per-file idempotence "
                    "ledger rides the Delta log's SetTransaction "
                    "state; the table is registered as "
                    f"{ttype.name}"
                )
            from glue_table_cache_spark.sinks.delta_write import (
                copy_into_delta,
            )

            version, n_files, n_rows = copy_into_delta(
                self.spark, loc, stmt.source
            )
            if version is not None:
                self.invalidate_table(ref.database, ref.table)
            return self.spark.createDataFrame(
                [(
                    "COPY INTO",
                    None if version is None else str(version),
                    0, n_rows, 0,
                )],
                "operation string, version string, rows_updated long, "
                "rows_inserted long, rows_deleted long",
            )
        if isinstance(stmt, MaintenanceStatement):
            return self._execute_maintenance(stmt, tbl, loc, qual)
        if isinstance(stmt, ConstraintStatement):
            if ttype != ETableType.DELTA:
                raise GlueSparkError(
                    f"{stmt.action.upper()} CONSTRAINT {qual}: CHECK "
                    "constraints live in the Delta configuration "
                    "(delta.constraints.<name>); the table is "
                    f"registered as {ttype.name}"
                )
            from glue_table_cache_spark.sinks.delta_write import (
                set_delta_table_properties,
            )
            from glue_table_cache_spark.sources.delta import (
                delta_table_configuration,
            )

            key = f"delta.constraints.{stmt.name}"
            cfg = delta_table_configuration(loc)
            if stmt.action == "add":
                if key in cfg:
                    raise GlueSparkError(
                        f"ADD CONSTRAINT {qual}: constraint "
                        f"{stmt.name!r} already exists "
                        f"({cfg[key]}); DROP it first"
                    )
                # EXISTING rows must already satisfy the new CHECK —
                # otherwise the table is born violating its own gate
                bad = (
                    self.table_dataframe(ref.database, ref.table)
                    .where(
                        ~F.coalesce(F.expr(stmt.expr), F.lit(True))
                    )
                    .limit(1)
                    .count()
                )
                if bad:
                    raise GlueSparkError(
                        f"ADD CONSTRAINT {qual}: existing rows "
                        f"violate CHECK ({stmt.expr}) — clean the "
                        "data first"
                    )
                version = set_delta_table_properties(
                    loc, {key: stmt.expr}
                )
            else:
                if key not in cfg:
                    raise GlueSparkError(
                        f"DROP CONSTRAINT {qual}: no constraint "
                        f"named {stmt.name!r} (have "
                        f"{sorted(k.rsplit('.', 1)[1] for k in cfg if k.startswith('delta.constraints.'))})"
                    )
                version = set_delta_table_properties(
                    loc, {}, unset=(key,)
                )
            self.invalidate_table(ref.database, ref.table)
            return self.spark.createDataFrame(
                [(
                    f"{stmt.action.upper()} CONSTRAINT",
                    str(version), 0, 0, 0,
                )],
                "operation string, version string, rows_updated long, "
                "rows_inserted long, rows_deleted long",
            )
        if isinstance(stmt, TablePropertiesStatement):
            if ttype == ETableType.DELTA:
                from glue_table_cache_spark.sinks.delta_write import (
                    set_delta_table_properties,
                )

                version = set_delta_table_properties(
                    loc, dict(stmt.props), unset=stmt.unset
                )
            elif ttype == ETableType.ICEBERG:
                from glue_table_cache_spark.sinks.iceberg_write import (  # noqa: E501
                    set_iceberg_table_properties,
                )

                version = set_iceberg_table_properties(
                    loc, dict(stmt.props), unset=stmt.unset
                )
            elif ttype == ETableType.HUDI:
                from glue_table_cache_spark.sinks.hudi_write import (
                    set_hudi_table_properties,
                )

                set_hudi_table_properties(
                    loc, dict(stmt.props), unset=stmt.unset
                )
                version = None
            else:
                raise GlueSparkError(
                    f"SET TBLPROPERTIES {qual}: table properties "
                    "live in each format's own metadata (Delta "
                    "configuration / Iceberg properties / "
                    "hoodie.properties); the table is registered "
                    f"as {ttype.name}"
                )
            self.invalidate_table(ref.database, ref.table)
            return self.spark.createDataFrame(
                [(
                    "UNSET TBLPROPERTIES"
                    if stmt.unset else "SET TBLPROPERTIES",
                    None if version is None else str(version),
                    0, 0, 0,
                )],
                "operation string, version string, rows_updated long, "
                "rows_inserted long, rows_deleted long",
            )
        if isinstance(stmt, RefStatement):
            if ttype != ETableType.ICEBERG:
                raise GlueSparkError(
                    f"{stmt.action.upper()} "
                    f"{stmt.ref_type.upper()} {qual}: named "
                    "snapshot refs are an Iceberg feature (the "
                    f"table is registered as {ttype.name})"
                )
            from glue_table_cache_spark.sinks.iceberg_write import (
                create_iceberg_ref,
                drop_iceberg_ref,
            )

            if stmt.action == "create":
                version = create_iceberg_ref(
                    loc,
                    stmt.name,
                    ref_type=stmt.ref_type,
                    sequence_number=stmt.version,
                )
            else:
                version = drop_iceberg_ref(loc, stmt.name)
            self.invalidate_table(ref.database, ref.table)
            return self.spark.createDataFrame(
                [
                    (
                        f"{stmt.action.upper()} "
                        f"{stmt.ref_type.upper()}",
                        str(version),
                        0,
                        0,
                        0,
                    )
                ],
                "operation string, version string, rows_updated long, "
                "rows_inserted long, rows_deleted long",
            )
        if isinstance(stmt, RestoreStatement):
            target_version = stmt.version
            if stmt.timestamp is not None:
                # TO TIMESTAMP AS OF: resolve through the same rule
                # read-side timestamp travel uses (newest commit at
                # or before the literal)
                if ttype != ETableType.DELTA:
                    raise GlueSparkError(
                        f"RESTORE {qual} TO TIMESTAMP AS OF: "
                        "implemented for Delta (commitInfo "
                        "timestamps are the travel authority); for "
                        f"{ttype.name} restore by VERSION AS OF"
                    )
                from glue_table_cache_spark.sources.delta import (
                    delta_version_at_timestamp,
                )

                target_version = delta_version_at_timestamp(
                    loc,
                    self._travel_timestamp_ms(stmt.timestamp),
                    fs=self._fs,
                )
            if ttype == ETableType.DELTA:
                from glue_table_cache_spark.sinks.delta_write import (
                    restore_delta,
                )

                version = restore_delta(loc, target_version)
            elif ttype == ETableType.ICEBERG:
                from glue_table_cache_spark.sinks.iceberg_write import (
                    rollback_iceberg,
                )

                version = rollback_iceberg(loc, stmt.version)
            elif ttype == ETableType.HUDI:
                from glue_table_cache_spark.sinks.hudi_write import (
                    restore_hudi,
                )

                version = restore_hudi(loc, stmt.version)
            else:
                raise GlueSparkError(f"RESTORE {qual}: {fmt_hint}")
            self.invalidate_table(ref.database, ref.table)
            return self.spark.createDataFrame(
                [("RESTORE", str(version), 0, 0, 0)],
                "operation string, version string, rows_updated long, "
                "rows_inserted long, rows_deleted long",
            )
        if isinstance(stmt, AlterColumnStatement):
            verb = (
                "RENAME COLUMN"
                if stmt.action == "rename"
                else "DROP COLUMN"
            )
            if ttype == ETableType.DELTA:
                from glue_table_cache_spark.sinks.delta_write import (
                    alter_delta_drop_column,
                    alter_delta_rename_column,
                )

                if stmt.action == "rename":
                    version = alter_delta_rename_column(
                        loc, stmt.column, stmt.new_name
                    )
                else:
                    version = alter_delta_drop_column(loc, stmt.column)
            elif ttype == ETableType.ICEBERG:
                # the spec's native mechanism: readers resolve by
                # FIELD ID, so rename/drop are one metadata commit;
                # the name-mapping property pins on-disk spellings
                # for this engine's id-less parquet files
                from glue_table_cache_spark.sinks.iceberg_write import (
                    alter_iceberg_drop_column,
                    alter_iceberg_rename_column,
                )

                if stmt.action == "rename":
                    version = alter_iceberg_rename_column(
                        loc, stmt.column, stmt.new_name
                    )
                else:
                    version = alter_iceberg_drop_column(
                        loc, stmt.column
                    )
            else:
                raise GlueSparkError(
                    f"ALTER TABLE {qual} {verb}: logical column "
                    "changes need column mapping (Delta) or field-id "
                    f"resolution (Iceberg); this table is "
                    f"{ttype.name} — Hudi tracks columns by name "
                    "in every base/log file; rewrite via CREATE "
                    "TABLE AS"
                )
            self.invalidate_table(ref.database, ref.table)
            return self.spark.createDataFrame(
                [(verb, str(version), 0, 0, 0)],
                "operation string, version string, rows_updated "
                "long, rows_inserted long, rows_deleted long",
            )
        if isinstance(stmt, AlterTableStatement):
            from pyspark.sql.types import StructType

            try:
                cols = StructType.fromDDL(stmt.columns_ddl)
            except Exception as e:
                raise GlueSparkError(
                    f"ALTER TABLE {qual}: invalid column list "
                    f"{stmt.columns_ddl!r} ({e})"
                ) from None
            if ttype == ETableType.DELTA:
                from glue_table_cache_spark.sinks.delta_write import (
                    alter_delta_add_columns,
                )

                version = alter_delta_add_columns(loc, cols)
            elif ttype == ETableType.ICEBERG:
                from glue_table_cache_spark.sinks.iceberg_write import (
                    alter_iceberg_add_columns,
                )

                version = alter_iceberg_add_columns(loc, cols)
            elif ttype == ETableType.HUDI:
                from glue_table_cache_spark.sinks.hudi_write import (
                    alter_hudi_add_columns,
                )

                version = alter_hudi_add_columns(loc, cols)
            else:
                raise GlueSparkError(f"ALTER TABLE {qual}: {fmt_hint}")
            self.invalidate_table(ref.database, ref.table)
            return self.spark.createDataFrame(
                [("ADD COLUMNS", str(version), 0, 0, 0)],
                "operation string, version string, rows_updated long, "
                "rows_inserted long, rows_deleted long",
            )
        if isinstance(stmt, InsertStatement):
            op = "INSERT OVERWRITE" if stmt.overwrite else "INSERT"
            # the source resolves through the normal read path (glue
            # refs, temp views, VALUES, subqueries all work); an
            # explicit column list renames positionally — the writers'
            # own schema authority gates the rest
            source = self.sql(f"SELECT * FROM ({stmt.source_text})")
            # standard INSERT semantics: the source binds to the
            # table's columns POSITIONALLY (or to the explicit column
            # list) and implicitly casts to the target column types —
            # a bare VALUES tuple's col1/col2 names are meaningless
            target_fields = self.table_dataframe(
                ref.database, ref.table
            ).schema.fields
            if stmt.by_name:
                # BY NAME: the source's own column names bind —
                # order-free; unknown names refuse, missing target
                # columns NULL-fill (the Delta-dialect posture)
                known = {f.name for f in target_fields}
                unknown = [
                    c for c in source.columns if c not in known
                ]
                if unknown:
                    raise GlueSparkError(
                        f"{op} {qual} BY NAME: source column(s) "
                        f"{unknown} are not in the table schema "
                        f"{sorted(known)}"
                    )
                have = set(source.columns)
                source = source.select(
                    *[
                        F.col(f.name)
                        if f.name in have
                        else F.lit(None)
                        .cast(f.dataType)
                        .alias(f.name)
                        for f in target_fields
                    ]
                )
            elif stmt.columns:
                if len(stmt.columns) != len(source.columns):
                    raise GlueSparkError(
                        f"{op} {qual}: column list has "
                        f"{len(stmt.columns)} name(s) but the source "
                        f"produces {len(source.columns)} column(s)"
                    )
                source = source.toDF(*stmt.columns)
            elif len(source.columns) == len(target_fields):
                source = source.toDF(
                    *[f.name for f in target_fields]
                )
            else:
                raise GlueSparkError(
                    f"{op} {qual}: the source produces "
                    f"{len(source.columns)} column(s) but the table "
                    f"has {len(target_fields)} — INSERT binds "
                    "positionally; pass an explicit column list"
                )
            target = {f.name: f.dataType for f in target_fields}
            source = source.select(
                *[
                    F.col(c).cast(target[c]).alias(c)
                    if c in target
                    else F.col(c)
                    for c in source.columns
                ]
            )
            n_ins = source.count()
            if ttype == ETableType.DELTA:
                from glue_table_cache_spark.sinks.delta_write import (
                    write_delta_append,
                )

                version = write_delta_append(
                    source, loc, overwrite=stmt.overwrite
                )
            elif ttype == ETableType.ICEBERG:
                from glue_table_cache_spark.sinks.iceberg_write import (
                    write_iceberg_append,
                )

                version = write_iceberg_append(
                    source, loc, overwrite=stmt.overwrite
                )
            elif ttype == ETableType.HUDI:
                from glue_table_cache_spark.sinks.hudi_write import (
                    write_hudi_append,
                )

                version = write_hudi_append(
                    source, loc, overwrite=stmt.overwrite
                )
            else:
                raise GlueSparkError(f"{op} {qual}: {fmt_hint}")
            self.invalidate_table(ref.database, ref.table)
            return self.spark.createDataFrame(
                [(op, str(version), 0, n_ins, 0)],
                "operation string, version string, rows_updated long, "
                "rows_inserted long, rows_deleted long",
            )
        if isinstance(stmt, DeleteStatement):
            op = "DELETE"
            # subquery predicates (`WHERE id IN (SELECT ... FROM
            # glue.db.x)` — the decontamination DELETE): glue refs
            # inside the predicate resolve to per-call temp views;
            # the writers evaluate the predicate in FILTERS, where
            # Spark allows InSubquery/Exists
            import dataclasses as _dc

            drop_pred_views = None
            if "(" in stmt.predicate:
                pred, drop_pred_views = (
                    self._resolve_predicate_refs(stmt.predicate)
                )
                stmt = _dc.replace(stmt, predicate=pred)
            try:
                if ttype == ETableType.DELTA:
                    from glue_table_cache_spark.sinks.delta_delete import (  # noqa: E501
                        delete_from_delta,
                    )

                    version, n_del = delete_from_delta(
                        self.spark, loc, stmt.predicate
                    )
                elif ttype == ETableType.ICEBERG:
                    from glue_table_cache_spark.sinks.iceberg_delete import (  # noqa: E501
                        delete_from_iceberg,
                    )

                    version, n_del = delete_from_iceberg(
                        self.spark, loc, stmt.predicate
                    )
                elif ttype == ETableType.HUDI:
                    if self._hudi_is_mor(loc):
                        version, n_del = self._hudi_mor_delete(
                            tbl, stmt
                        )
                    else:
                        from glue_table_cache_spark.sinks.hudi_log_write import (  # noqa: E501
                            delete_from_hudi,
                        )

                        version, n_del = delete_from_hudi(
                            self.spark, loc, stmt.predicate
                        )
                else:
                    raise GlueSparkError(
                        f"DELETE FROM {qual}: {fmt_hint}"
                    )
            finally:
                if drop_pred_views is not None:
                    drop_pred_views()
        elif isinstance(stmt, UpdateStatement):
            op = "UPDATE"
            from glue_table_cache_spark.dml import (
                predicate_has_subquery,
            )

            if any(
                predicate_has_subquery(e)
                for e in stmt.set_exprs.values()
            ):
                raise GlueSparkError(
                    f"UPDATE {qual}: subqueries in SET expressions "
                    "re-evaluate inside per-row PROJECTIONS, where "
                    "Spark only allows them in filters — express "
                    "the change as MERGE INTO ... USING (SELECT ...)"
                )
            # subquery PREDICATES work: glue refs resolve to
            # per-call views and the writers evaluate the condition
            # in filters (the filter-union rewrite shape)
            import dataclasses as _dc

            drop_pred_views = None
            if "(" in stmt.predicate:
                pred, drop_pred_views = (
                    self._resolve_predicate_refs(stmt.predicate)
                )
                stmt = _dc.replace(stmt, predicate=pred)
            try:
                if ttype == ETableType.DELTA:
                    from glue_table_cache_spark.sinks.delta_merge import (  # noqa: E501
                        update_delta,
                    )

                    version, n_upd = update_delta(
                        self.spark, loc, stmt.predicate,
                        stmt.set_exprs,
                    )
                elif ttype == ETableType.ICEBERG:
                    from glue_table_cache_spark.sinks.iceberg_delete import (  # noqa: E501
                        update_iceberg,
                    )

                    version, n_upd = update_iceberg(
                        self.spark, loc, stmt.predicate,
                        stmt.set_exprs,
                    )
                elif ttype == ETableType.HUDI:
                    if self._hudi_is_mor(loc):
                        version, n_upd = self._hudi_mor_update(
                            tbl, stmt
                        )
                    else:
                        from glue_table_cache_spark.sinks.hudi_log_write import (  # noqa: E501
                            update_hudi,
                        )

                        version, n_upd = update_hudi(
                            self.spark, loc, stmt.predicate,
                            stmt.set_exprs,
                        )
                else:
                    raise GlueSparkError(
                        f"UPDATE {qual}: {fmt_hint}"
                    )
            finally:
                if drop_pred_views is not None:
                    drop_pred_views()
        elif isinstance(stmt, MergeStatement):
            op = "MERGE"
            if ttype not in (
                ETableType.DELTA,
                ETableType.ICEBERG,
                ETableType.HUDI,
            ):
                raise GlueSparkError(f"MERGE INTO {qual}: {fmt_hint}")
            # the USING operand resolves through the normal read
            # path — glue refs, temp views, and subqueries all work
            source = self.sql(f"SELECT * FROM {stmt.source_text}")
            if stmt.schema_evolution:
                # WITH SCHEMA EVOLUTION: new source columns widen
                # the table schema FIRST via the formats' schema-only
                # ALTER commit (Delta schemaString, fresh Iceberg
                # field ids, Hudi extraMetadata re-record) — then the
                # normal merge sees the widened target (pre-merge
                # files surface nulls).  Two commits, documented
                # deviation from the one-commit runtimes.
                tbl = self._evolve_for_merge(tbl, stmt, source)
                loc = tbl.location
                if loc.startswith("file:"):
                    loc = loc[len("file:"):]
            if stmt.whole_row:
                # the classic upsert pair (unconditional UPDATE SET *
                # + INSERT *) — the whole-row writers' fast path, no
                # full-row join
                if ttype == ETableType.DELTA:
                    from glue_table_cache_spark.sinks.delta_merge import (  # noqa: E501
                        merge_into_delta,
                    )

                    version, n_upd, n_ins = merge_into_delta(
                        self.spark, loc, source, list(stmt.on_keys)
                    )
                elif ttype == ETableType.ICEBERG:
                    from glue_table_cache_spark.sinks.iceberg_delete import (  # noqa: E501
                        merge_into_iceberg,
                    )

                    version, n_upd, n_ins = merge_into_iceberg(
                        self.spark, loc, source, list(stmt.on_keys)
                    )
                elif self._hudi_is_mor(loc):
                    version, n_upd, n_ins, n_del = (
                        self._hudi_mor_merge(tbl, stmt, source)
                    )
                else:
                    from glue_table_cache_spark.sinks.hudi_log_write import (  # noqa: E501
                        merge_general_hudi,
                        merge_into_hudi,
                    )
                    from glue_table_cache_spark.sources.hudi import (
                        hudi_scan_info,
                    )

                    if any(
                        pv for _p, pv in hudi_scan_info(loc)
                    ):
                        # partitioned COW: the clause planner routes
                        # inserts into per-partition file groups —
                        # the whole-row pair is just its simplest
                        # clause shape
                        version, n_upd, n_ins, n_del = (
                            merge_general_hudi(
                                self.spark, loc, source,
                                list(stmt.on_keys), stmt.parsed,
                            )
                        )
                    else:
                        version, n_upd, n_ins = merge_into_hudi(
                            self.spark, loc, source,
                            list(stmt.on_keys),
                        )
            elif ttype == ETableType.DELTA:
                from glue_table_cache_spark.sinks.delta_merge import (
                    merge_general_delta,
                )

                version, n_upd, n_ins, n_del = merge_general_delta(
                    self.spark, loc, source, list(stmt.on_keys),
                    stmt.parsed,
                )
            elif ttype == ETableType.ICEBERG:
                from glue_table_cache_spark.sinks.iceberg_delete import (  # noqa: E501
                    merge_general_iceberg,
                )

                version, n_upd, n_ins, n_del = merge_general_iceberg(
                    self.spark, loc, source, list(stmt.on_keys),
                    stmt.parsed,
                )
            elif self._hudi_is_mor(loc):
                version, n_upd, n_ins, n_del = self._hudi_mor_merge(
                    tbl, stmt, source
                )
            else:
                from glue_table_cache_spark.sinks.hudi_log_write import (  # noqa: E501
                    merge_general_hudi,
                )

                version, n_upd, n_ins, n_del = merge_general_hudi(
                    self.spark, loc, source, list(stmt.on_keys),
                    stmt.parsed,
                )
        else:  # pragma: no cover - parse_dml returns only the three
            raise GlueSparkError(f"unknown DML statement {stmt!r}")
        if version is not None:
            # the commit is externally visible NOW — drop the cached
            # format walk so the next scan replays the new version
            self.invalidate_table(ref.database, ref.table)
        return self.spark.createDataFrame(
            [(op, None if version is None else str(version),
              n_upd, n_ins, n_del)],
            "operation string, version string, rows_updated long, "
            "rows_inserted long, rows_deleted long",
        )

    @staticmethod
    def _hudi_is_mor(loc: str) -> bool:
        from glue_table_cache_spark.sources.hudi import (
            _table_type,
            _timeline_files,
        )

        return _table_type(_timeline_files(loc)) == "MERGE_ON_READ"

    def _hudi_record_key(self, tbl: CatalogTable) -> str:
        from glue_table_cache_spark.sources.hudi_mor import (
            DEFAULT_RECORD_KEY,
        )

        return tbl.parameters.get(
            "hoodie.table.recordkey.fields", DEFAULT_RECORD_KEY
        )

    def _hudi_mor_delete(
        self, tbl: CatalogTable, stmt, max_delete_keys: int = 1_000_000
    ) -> tuple[str | None, int]:
        """SQL DELETE on a MERGE_ON_READ table: matched record keys
        (from the MERGED snapshot view, so log-upserted rows match
        too) publish as ONE DELETE log block — no base rewrite, the
        MOR contract.  Keys are driver-collected by the log-block
        codec, so a cap refuses unbounded deletes toward the COW
        path, mirroring write_hudi_log's own posture."""
        from glue_table_cache_spark.sinks.hudi_log_write import (
            write_hudi_log,
        )

        key = self._hudi_record_key(tbl)
        loc = tbl.location
        if loc.startswith("file:"):
            loc = loc[len("file:"):]
        df = self._dataframe_for(tbl, None)
        if key not in df.columns:
            raise GlueSparkError(
                f"DELETE on MOR glue.{tbl.database}.{tbl.name}: "
                f"record key column {key!r} is not in the scan "
                "schema; register hoodie.table.recordkey.fields"
            )
        matched = (
            df.where(F.expr(stmt.predicate)).select(key).distinct()
        )
        keys = [
            r[0] for r in matched.limit(max_delete_keys + 1).collect()
        ]
        if len(keys) > max_delete_keys:
            raise GlueSparkError(
                f"MOR DELETE matches over {max_delete_keys} record "
                "keys — log-block deletes are a micro-batch path; "
                "compact to COPY_ON_WRITE semantics first or raise "
                "the cap"
            )
        if not keys:
            return None, 0
        instant = write_hudi_log(
            self.spark, loc, key, delete_keys=keys
        )
        return instant, len(keys)

    def _evolve_for_merge(
        self, tbl: CatalogTable, stmt, source: DataFrame
    ) -> CatalogTable:
        """``MERGE WITH SCHEMA EVOLUTION``'s widening pre-step: any
        source column absent from the target schema commits via the
        format's schema-only ALTER (nullable — pre-merge rows read
        null), then the table caches invalidate so the merge writers
        and the MOR merged view see the widened schema.  No new
        columns → no commit."""
        from pyspark.sql.types import StructField, StructType

        from glue_table_cache_spark.catalog import ETableType

        t_cols = set(self._dataframe_for(tbl, None).columns)
        new_fields = [
            StructField(f.name, f.dataType, True)
            for f in source.schema.fields
            if f.name not in t_cols
        ]
        if not new_fields:
            return tbl
        loc = tbl.location
        if loc.startswith("file:"):
            loc = loc[len("file:"):]
        cols = StructType(new_fields)
        if tbl.table_type == ETableType.DELTA:
            from glue_table_cache_spark.sinks.delta_write import (
                alter_delta_add_columns,
            )

            alter_delta_add_columns(loc, cols)
        elif tbl.table_type == ETableType.ICEBERG:
            from glue_table_cache_spark.sinks.iceberg_write import (
                alter_iceberg_add_columns,
            )

            alter_iceberg_add_columns(loc, cols)
        else:
            from glue_table_cache_spark.sinks.hudi_write import (
                alter_hudi_add_columns,
            )

            alter_hudi_add_columns(loc, cols)
        self.invalidate_table(tbl.database, tbl.name)
        return tbl

    def _hudi_mor_update(
        self, tbl: CatalogTable, stmt
    ) -> tuple[str | None, int]:
        """SQL UPDATE on a MERGE_ON_READ table: matched rows from the
        merged view, transformed through the SET expressions
        (pre-update values), publish as ONE upsert log block — the
        MOR update path, no base rewrite."""
        from glue_table_cache_spark.sinks.hudi_log_write import (
            write_hudi_log,
        )

        key = self._hudi_record_key(tbl)
        loc = tbl.location
        if loc.startswith("file:"):
            loc = loc[len("file:"):]
        df = self._dataframe_for(tbl, None)
        if key not in df.columns:
            raise GlueSparkError(
                f"UPDATE on MOR glue.{tbl.database}.{tbl.name}: "
                f"record key column {key!r} is not in the scan "
                "schema; register hoodie.table.recordkey.fields"
            )
        unknown = [c for c in stmt.set_exprs if c not in df.columns]
        if unknown:
            raise GlueSparkError(
                f"UPDATE sets unknown column(s) {unknown}; table "
                f"columns are {df.columns}"
            )
        matched = df.where(F.expr(stmt.predicate))
        transformed = matched.select(
            *[
                F.expr(stmt.set_exprs[c])
                .cast(df.schema[c].dataType)
                .alias(c)
                if c in stmt.set_exprs
                else F.col(c)
                for c in df.columns
            ]
        )
        n = transformed.count()
        if not n:
            return None, 0
        instant = write_hudi_log(
            self.spark, loc, key, upserts=transformed
        )
        return instant, int(n)

    def _hudi_mor_merge(
        self,
        tbl: CatalogTable,
        stmt,
        source,
        max_delete_keys: int = 1_000_000,
    ) -> tuple[str | None, int, int, int]:
        """MERGE (the whole-row upsert pair AND the general clause
        grammar) on a MERGE_ON_READ table: clause semantics evaluate
        against the MERGED snapshot view — log-upserted rows match
        too — and the outcome publishes as log blocks under ONE
        atomic deltacommit: update-chosen rows transformed and
        upserted by record key, delete-chosen rows' record keys in a
        DELETE block, NOT MATCHED source rows upserted as inserts.
        No base rewrite, the MOR contract.

        A SET that could rewrite the record key refuses up front: an
        upsert block replaces BY record key, so changing it would
        insert a twin and strand the old row.  Delete keys are
        driver-collected by the log-block codec — the same cap
        posture as MOR DELETE."""
        from glue_table_cache_spark.sinks.hudi_log_write import (
            write_hudi_log,
        )
        from glue_table_cache_spark.sinks.merge_planner import (
            KEEP,
            action_indexes,
            chosen_column,
            insert_outputs,
            join_source,
            target_outputs,
            validate_clauses,
        )

        clauses = stmt.parsed
        keys = list(stmt.on_keys)
        key = self._hudi_record_key(tbl)
        loc = tbl.location
        if loc.startswith("file:"):
            loc = loc[len("file:"):]
        df = self._dataframe_for(tbl, None)
        if key not in df.columns:
            raise GlueSparkError(
                f"MERGE on MOR glue.{tbl.database}.{tbl.name}: "
                f"record key column {key!r} is not in the scan "
                "schema; register hoodie.table.recordkey.fields"
            )
        missing = [k for k in keys if k not in source.columns]
        if missing:
            raise GlueSparkError(
                f"merge keys {missing} are not in the source "
                f"columns {source.columns}"
            )
        t_cols = list(df.columns)
        validate_clauses(clauses, t_cols, source.columns, keys)
        for cl in clauses:
            if cl.action != "update" or cl.when == "not_matched":
                continue
            sets_key = (
                any(c == key for c, _e in cl.set_exprs)
                if cl.set_exprs is not None
                else key not in keys  # SET * copies the source key
            )
            if sets_key:
                raise GlueSparkError(
                    f"MERGE on MOR glue.{tbl.database}.{tbl.name}: "
                    f"an UPDATE clause may rewrite the record key "
                    f"{key!r} — upsert log blocks replace by record "
                    "key, so this would insert a twin and strand "
                    "the old row; merge ON the record key or drop "
                    f"{key!r} from SET"
                )
        if (
            source.groupBy(*keys)
            .count()
            .where("count > 1")
            .limit(1)
            .count()
        ):
            raise GlueSparkError(
                "MERGE source has duplicate keys — a matched target "
                "row would meet several source rows; de-duplicate "
                "the source first (e.g. max_by on a version column)"
            )
        upd_idx = action_indexes(clauses, "update")
        del_idx = action_indexes(clauses, "delete")
        joined = join_source(df, source, keys).withColumn(
            "__chosen", chosen_column(clauses)
        )
        # only CHOSEN rows checkpoint (bounded by the matched set,
        # not the table) — counts, delete keys, and the update
        # transform all reuse them without re-reading the MOR
        # merged view
        chosen = joined.where(
            F.col("__chosen") != KEEP
        ).localCheckpoint()
        agg = {
            int(r["__chosen"]): int(r["n"])
            for r in chosen.groupBy("__chosen")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_upd = sum(agg.get(i, 0) for i in upd_idx)
        n_del = sum(agg.get(i, 0) for i in del_idx)
        del_keys: list = []
        if n_del:
            if n_del > max_delete_keys:
                raise GlueSparkError(
                    f"MOR MERGE would delete {n_del} rows (cap "
                    f"{max_delete_keys}) — log-block deletes are a "
                    "micro-batch path; compact first or raise the "
                    "cap"
                )
            del_keys = [
                r[0]
                for r in chosen.where(
                    F.col("__chosen").isin(del_idx)
                )
                .select(key)
                .distinct()
                .collect()
            ]
        ups = None
        if n_upd:
            ups = target_outputs(
                chosen.where(F.col("__chosen").isin(upd_idx)),
                clauses,
                t_cols,
            )
        ins = insert_outputs(
            source,
            df.select(*keys).distinct(),
            keys,
            clauses,
            t_cols,
            df.schema,
        )
        n_ins = ins.count() if ins is not None else 0
        if n_ins:
            # partitioned MOR included: write_hudi_log routes each
            # NOT MATCHED row on its own partition-column values
            # (and strips them from the log payload)
            ups = (
                ins
                if ups is None
                else ups.unionByName(ins.select(*ups.columns))
            )
        if ups is None and not del_keys:
            return None, 0, 0, 0
        instant = write_hudi_log(
            self.spark,
            loc,
            key,
            upserts=ups,
            delete_keys=del_keys or None,
        )
        return instant, int(n_upd), int(n_ins), int(n_del)

    def _execute_show(self, stmt) -> DataFrame:
        """Introspection verbs, answered from the engine's own
        metadata paths (no Spark catalog involved):

        * ``SHOW TABLES IN glue[.db]`` — store enumeration
          (``list_tables``; stores without it refuse);
        * ``SHOW PARTITIONS glue.db.t`` — the registered catalog
          partitions when present, else the distinct partition
          tuples of the (cached, pruned-none) file listing — the
          same values pruning runs on;
        * ``DESCRIBE glue.db.t`` — the SCAN schema (the
          metadata-schema authority for lakehouse formats), with
          Spark's ``# Partition Information`` section for registered
          keys."""
        if stmt.verb == "databases":
            lt = getattr(self.store, "list_tables", None)
            if not callable(lt):
                raise GlueSparkError(
                    "SHOW DATABASES: the metadata store does not "
                    "support enumeration (no list_tables)"
                )
            dbs = sorted({t.database for t in lt(None)})
            return self.spark.createDataFrame(
                [(d,) for d in dbs], "namespace string"
            )
        if stmt.verb == "tables":
            lt = getattr(self.store, "list_tables", None)
            if not callable(lt):
                raise GlueSparkError(
                    "SHOW TABLES: the metadata store does not "
                    "support enumeration (no list_tables)"
                )
            rows = [
                (
                    t.database,
                    t.name,
                    t.table_type.name,
                    t.location,
                )
                for t in lt(stmt.database)
            ]
            return self.spark.createDataFrame(
                rows,
                "database string, tableName string, tableType string, "
                "location string",
            )
        ref = stmt.ref
        tbl = self.get_table_metadata_cached(ref.database, ref.table)
        if stmt.verb == "partitions":
            keys = [k.name for k in tbl.partition_keys]
            listing = self.store.get_partitions(
                ref.database, ref.table
            )
            tuples: set[tuple[str, ...]] = set()
            if listing.values:
                pkeys = list(listing.keys) or keys
                tuples = {tuple(e.values) for e in listing.values}
            elif keys:
                pkeys = keys
                tuples = {
                    tuple(f.partition_values.get(k, "") for k in keys)
                    for f in self.list_table_files_cached(tbl)
                }
            else:
                raise GlueSparkError(
                    f"SHOW PARTITIONS glue.{ref.database}."
                    f"{ref.table}: table is not partitioned"
                )
            rows = sorted(
                "/".join(f"{k}={v}" for k, v in zip(pkeys, t))
                for t in tuples
            )
            return self.spark.createDataFrame(
                [(r,) for r in rows], "partition string"
            )
        if stmt.verb in ("history", "tblproperties"):
            return self._show_lakehouse_metadata(stmt.verb, ref, tbl)
        if stmt.verb == "detail":
            return self._execute_describe_detail(ref, tbl)
        if stmt.verb == "create":
            return self._execute_show_create(ref, tbl)
        if stmt.verb == "columns":
            schema = self.table_dataframe(
                ref.database, ref.table
            ).schema
            return self.spark.createDataFrame(
                [(f.name,) for f in schema.fields],
                "col_name string",
            )
        # describe: the scan schema is the source of truth (what a
        # SELECT actually surfaces, evolved columns included)
        schema = self.table_dataframe(ref.database, ref.table).schema
        rows = [
            (f.name, f.dataType.simpleString(), None)
            for f in schema.fields
        ]
        if tbl.partition_keys:
            rows.append(("# Partition Information", "", None))
            rows.append(("# col_name", "data_type", None))
            for k in tbl.partition_keys:
                rows.append((k.name, k.type, None))
        return self.spark.createDataFrame(
            rows, "col_name string, data_type string, comment string"
        )

    def _execute_show_create(self, ref, tbl) -> DataFrame:
        """``SHOW CREATE TABLE glue.db.t`` — the registration DDL
        reconstructed from the engine's own authorities: the SCAN
        schema (logical, evolution applied), DESCRIBE DETAIL's
        partition columns and format, and the format's own
        properties.  One ``createtab_stmt`` row, the Spark dialect
        shape.  Iceberg HIDDEN partition columns render by their
        spec FIELD name (``o_orderdate_month``) — the transform
        expression form is the runtime's own dialect, and replaying
        this DDL through CTAS would re-register identity columns;
        DESCRIBE DETAIL carries the same names."""
        detail = self._execute_describe_detail(ref, tbl).first()
        schema = self.table_dataframe(
            ref.database, ref.table
        ).schema
        cols = ",\n".join(
            f"  {f.name} {f.dataType.simpleString().upper()}"
            for f in schema.fields
        )
        lines = [
            f"CREATE TABLE glue.{ref.database}.{ref.table} (",
            cols,
            ")",
            f"USING {str(detail['format'] or 'parquet').upper()}",
        ]
        if detail["partitionColumns"]:
            lines.append(
                "PARTITIONED BY ("
                + ", ".join(detail["partitionColumns"])
                + ")"
            )
        if tbl.location:
            lines.append(f"LOCATION '{tbl.location}'")
        props = dict(detail["properties"] or {})
        if props:
            kv = ",\n".join(
                f"  '{k}' = '{v}'"
                for k, v in sorted(props.items())
            )
            lines.append("TBLPROPERTIES (\n" + kv + "\n)")
        return self.spark.createDataFrame(
            [("\n".join(lines),)], "createtab_stmt string"
        )

    def _execute_describe_detail(self, ref, tbl) -> DataFrame:
        """``DESCRIBE DETAIL glue.db.t`` — one row of physical-layout
        facts from the table's OWN metadata (the Delta-dialect shape):
        format, table id, location, created time, partition columns,
        active file count + byte size, table properties.  The active
        set comes from the same format walk every scan uses (DV'd /
        position-deleted files still count — they are live storage);
        sizes are summed from the local filesystem and surface NULL
        for remote locations rather than guessing."""
        import os as _os

        if not tbl.location:
            raise NoStorageLocationError(tbl.database, tbl.name)
        loc = tbl.location
        if loc.startswith("file:"):
            loc = loc[len("file:"):]
        ttype = tbl.table_type
        table_id = None
        created = None
        pcols: list[str] = [k.name for k in tbl.partition_keys]
        props: dict[str, str] = {}
        if ttype == ETableType.DELTA:
            from glue_table_cache_spark.sources.delta import _replay

            active, state = _replay(loc, fs=self._fs)
            meta = state.get("metaData") or {}
            table_id = meta.get("id")
            created = meta.get("createdTime")
            pcols = list(meta.get("partitionColumns") or []) or pcols
            props = {
                str(k): str(v)
                for k, v in (meta.get("configuration") or {}).items()
            }
            paths = [
                p if p.startswith("/")
                else _os.path.join(loc, p)
                for p in active
            ]
            fmt = "delta"
        elif ttype == ETableType.ICEBERG:
            from glue_table_cache_spark.sources.iceberg import (
                _list_metadata_jsons,
                _read_json,
                iceberg_data_files,
            )

            jsons = _list_metadata_jsons(loc, fs=self._fs)
            if not jsons:
                raise GlueSparkError(
                    f"No Iceberg metadata JSON found under {loc!r}"
                )
            meta = max(
                (_read_json(p, None) for p in jsons),
                key=lambda m: m.get("last-sequence-number", 0),
            )
            table_id = meta.get("table-uuid")
            created = meta.get("last-updated-ms")
            specs = meta.get("partition-specs") or []
            if specs:
                pcols = [
                    f["name"] for f in (specs[0].get("fields") or [])
                ] or pcols
            props = {
                str(k): str(v)
                for k, v in (meta.get("properties") or {}).items()
            }
            # delete files (position AND equality) are live storage
            # too — walk the full scan state instead of the data-only
            # helper, which refuses when deletes exist
            from glue_table_cache_spark.sources.iceberg import (
                iceberg_scan_details,
            )

            entries, pos_dels, eq_dels = iceberg_scan_details(
                loc, fs=self._fs
            )
            paths = (
                [p for p, _pv, _s in entries]
                + list(pos_dels)
                + [
                    d["path"]
                    for d in eq_dels
                    if isinstance(d, dict) and d.get("path")
                ]
            )
            fmt = "iceberg"
        elif ttype == ETableType.HUDI:
            from pathlib import Path as _P

            from glue_table_cache_spark.sinks.hudi_write import (
                _recorded_partition_fields,
            )
            from glue_table_cache_spark.sources.hudi import (
                hudi_scan_info,
            )

            rec = _recorded_partition_fields(
                loc, _P(loc) / ".hoodie" / "hoodie.properties"
            )
            if rec:
                pcols = rec
            pf = _P(loc) / ".hoodie" / "hoodie.properties"
            if pf.exists():
                for line in pf.read_text().splitlines():
                    k, eq, v = line.partition("=")
                    if eq:
                        props[k.strip()] = v.strip()
            paths = [
                p
                for p, _pv in hudi_scan_info(
                    loc, fs=self._fs, base_files_only=True
                )
            ]
            fmt = "hudi"
        else:
            paths = [
                f.path for f in self.list_table_files_cached(tbl)
            ]
            fmt = tbl.data_format
        size: int | None = 0
        for p in paths:
            try:
                size += _os.stat(p).st_size
            except OSError:
                size = None
                break
        rows = [(
            fmt,
            table_id,
            tbl.location,
            int(created) if created is not None else None,
            pcols,
            len(paths),
            size,
            props,
        )]
        return self.spark.createDataFrame(
            rows,
            "format string, id string, location string, "
            "createdAt long, partitionColumns array<string>, "
            "numFiles long, sizeInBytes long, "
            "properties map<string,string>",
        )

    def _show_lakehouse_metadata(self, verb, ref, tbl) -> DataFrame:
        """``DESCRIBE HISTORY`` / ``SHOW TBLPROPERTIES`` — answered
        from the table format's OWN transaction metadata, never the
        catalog: commit log / snapshot list / timeline for history
        (``version`` is the same identifier ``VERSION AS OF`` travel
        and ``RESTORE`` address per format), ``metaData``
        configuration / table ``properties`` / ``hoodie.properties``
        for tblproperties.  Raw-parquet tables have neither and
        refuse with the registration hint."""
        if not tbl.location:
            raise NoStorageLocationError(tbl.database, tbl.name)
        loc = tbl.location
        if loc.startswith("file:"):
            loc = loc[len("file:"):]
        ttype = tbl.table_type
        qual = f"glue.{ref.database}.{ref.table}"
        verb_name = (
            "DESCRIBE HISTORY"
            if verb == "history"
            else "SHOW TBLPROPERTIES"
        )
        hint = (
            f"{verb_name} {qual}: {qual} is registered as "
            f"{ttype.name} — raw parquet has no transaction "
            "metadata; register the location as a "
            "DELTA/ICEBERG/HUDI table"
        )
        if verb == "history":
            if ttype == ETableType.DELTA:
                from glue_table_cache_spark.sources.delta import (
                    delta_history,
                )

                return delta_history(self.spark, loc)
            if ttype == ETableType.ICEBERG:
                from glue_table_cache_spark.sources.iceberg import (
                    iceberg_history,
                )

                return iceberg_history(self.spark, loc)
            if ttype == ETableType.HUDI:
                from glue_table_cache_spark.sources.hudi import (
                    hudi_history,
                )

                return hudi_history(self.spark, loc)
            raise GlueSparkError(hint)
        if ttype == ETableType.DELTA:
            from glue_table_cache_spark.sources.delta import _replay

            _active, state = _replay(loc)
            conf = (state.get("metaData") or {}).get(
                "configuration"
            ) or {}
            if isinstance(conf, list):  # pyarrow map → pairs
                conf = dict(conf)
            props = {str(k): str(v) for k, v in conf.items()}
        elif ttype == ETableType.ICEBERG:
            from glue_table_cache_spark.sources.iceberg import (
                _list_metadata_jsons,
                _read_json,
            )

            jsons = _list_metadata_jsons(loc)
            if not jsons:
                raise GlueSparkError(
                    f"No Iceberg metadata JSON found under {loc!r}"
                )
            meta = max(
                (_read_json(p, None) for p in jsons),
                key=lambda m: m.get("last-sequence-number", 0),
            )
            props = {
                str(k): str(v)
                for k, v in (meta.get("properties") or {}).items()
            }
        elif ttype == ETableType.HUDI:
            from glue_table_cache_spark.sources.hudi import (
                _read_bytes,
                _timeline_files,
            )

            names = [
                p
                for p in _timeline_files(loc)
                if p.endswith("hoodie.properties")
            ]
            props = {}
            if names:
                for line in _read_bytes(names[0], None).decode(
                ).splitlines():
                    line = line.strip()
                    if not line or line.startswith(("#", "!")):
                        continue
                    k, eq, v = line.partition("=")
                    if eq:
                        props[k.strip()] = v.strip()
        else:
            raise GlueSparkError(hint)
        return self.spark.createDataFrame(
            sorted(props.items()), "key string, value string"
        )

    def _execute_clone(self, stmt) -> DataFrame:
        """``CREATE TABLE ... SHALLOW CLONE glue.db.src`` — a
        zero-copy Delta clone (the source's active files referenced
        by absolute path in a fresh log), registered as a new
        catalog entry carrying the source's partition keys.  The
        source must be a registered DELTA table; the clone follows
        the CTAS location rules (explicit LOCATION or
        ``warehouse_dir``)."""
        import os

        from glue_table_cache_spark.errors import TableNotFoundError

        ref = stmt.ref
        qual = f"glue.{ref.database}.{ref.table}"
        if not callable(getattr(self.store, "register_table", None)):
            raise GlueSparkError(
                f"CREATE TABLE {qual}: the metadata store is "
                "read-only (no register_table)"
            )
        try:
            self.store.get_table(ref.database, ref.table)
            exists = True
        except TableNotFoundError:
            exists = False
        if exists:
            if stmt.if_not_exists:
                return self.spark.createDataFrame(
                    [("CLONE", None, 0, 0, 0)],
                    "operation string, version string, "
                    "rows_updated long, rows_inserted long, "
                    "rows_deleted long",
                )
            raise GlueSparkError(
                f"CREATE TABLE {qual}: table already exists "
                "(use IF NOT EXISTS)"
            )
        src_tbl = self.get_table_metadata_cached(
            stmt.source.database, stmt.source.table
        )
        if not src_tbl.location:
            raise NoStorageLocationError(
                src_tbl.database, src_tbl.name
            )
        src_loc = src_tbl.location
        if src_loc.startswith("file:"):
            src_loc = src_loc[len("file:"):]
        if src_tbl.table_type != ETableType.DELTA:
            raise GlueSparkError(
                f"SHALLOW CLONE glue.{stmt.source.database}."
                f"{stmt.source.table}: shallow clone is a Delta "
                "verb (the source is registered as "
                f"{src_tbl.table_type.name})"
            )
        loc = stmt.location
        if loc is None:
            if not self.config.warehouse_dir:
                raise GlueSparkError(
                    f"CREATE TABLE {qual}: no LOCATION clause and "
                    "no warehouse_dir configured"
                )
            loc = os.path.join(
                self.config.warehouse_dir, ref.database, ref.table
            )
        if loc.startswith("file:"):
            loc = loc[len("file:"):]
        from glue_table_cache_spark.sinks.delta_write import (
            shallow_clone_delta,
        )

        n_files = shallow_clone_delta(
            src_loc, loc, version=stmt.version, deep=stmt.deep
        )
        self.store.register_table(
            CatalogTable(
                ref.database,
                ref.table,
                loc,
                partition_keys=list(src_tbl.partition_keys),
                parameters={"spark.sql.sources.provider": "delta"},
            )
        )
        return self.spark.createDataFrame(
            [("CLONE", "0", 0, 0, 0)],
            "operation string, version string, rows_updated long, "
            "rows_inserted long, rows_deleted long",
        )

    def _execute_convert(self, stmt, tbl, loc, qual) -> DataFrame:
        """``CONVERT TO DELTA glue.db.t`` — metadata-only in-place
        migration: a version-0 Delta log over the existing parquet
        files (no data moved), then the catalog entry flips to the
        DELTA provider so every scan/DML/maintenance path from here
        on goes through the transaction log.  Partition keys come
        from the statement's ``PARTITIONED BY (col type, ...)`` or,
        omitted, the catalog's registered keys (Glue partition keys
        carry a type; untyped default is string)."""
        if tbl.table_type not in (
            ETableType.HIVE, ETableType.UNPARTITIONED,
        ):
            raise GlueSparkError(
                f"CONVERT TO DELTA {qual}: the table is registered "
                f"as {tbl.table_type.name} — only plain parquet "
                "(HIVE/UNPARTITIONED) tables convert"
            )
        if tbl.data_format != "parquet":
            raise GlueSparkError(
                f"CONVERT TO DELTA {qual}: classification is "
                f"{tbl.data_format!r} — only parquet converts"
            )
        if not callable(getattr(self.store, "register_table", None)):
            raise GlueSparkError(
                f"CONVERT TO DELTA {qual}: the metadata store is "
                "read-only (no register_table)"
            )
        keys = list(stmt.partition_keys) or [
            (k.name, k.type or "string") for k in tbl.partition_keys
        ]
        from glue_table_cache_spark.sinks.delta_write import (
            convert_to_delta,
        )

        convert_to_delta(self.spark, loc, keys)
        params = dict(tbl.parameters)
        params["spark.sql.sources.provider"] = "delta"
        self.store.register_table(
            CatalogTable(
                tbl.database,
                tbl.name,
                tbl.location,
                partition_keys=list(tbl.partition_keys),
                parameters=params,
            )
        )
        self.invalidate_table(stmt.ref.database, stmt.ref.table)
        return self.spark.createDataFrame(
            [("CONVERT", "0", 0, 0, 0)],
            "operation string, version string, rows_updated long, "
            "rows_inserted long, rows_deleted long",
        )

    def _execute_create(self, stmt) -> DataFrame:
        """CTAS: evaluate the source through the normal read path,
        write it via the chosen format's writer, register the new
        table in the metadata store.  The store must be writable
        (``register_table``) — read-only stores refuse.  Location is
        the explicit ``LOCATION`` clause or
        ``<warehouse_dir>/<db>/<table>``."""
        import os

        from glue_table_cache_spark.catalog import PartitionKey
        from glue_table_cache_spark.errors import TableNotFoundError

        ref = stmt.ref
        qual = f"glue.{ref.database}.{ref.table}"
        if not callable(getattr(self.store, "register_table", None)):
            raise GlueSparkError(
                f"CREATE TABLE {qual}: the metadata store is "
                "read-only (no register_table)"
            )
        try:
            self.store.get_table(ref.database, ref.table)
            exists = True
        except TableNotFoundError:
            exists = False
        if exists:
            if stmt.if_not_exists:
                return self.spark.createDataFrame(
                    [("CREATE TABLE", None, 0, 0, 0)],
                    "operation string, version string, "
                    "rows_updated long, rows_inserted long, "
                    "rows_deleted long",
                )
            raise GlueSparkError(
                f"CREATE TABLE {qual}: table already exists "
                "(use IF NOT EXISTS)"
            )
        loc = stmt.location
        if loc is None:
            if not self.config.warehouse_dir:
                raise GlueSparkError(
                    f"CREATE TABLE {qual}: no LOCATION clause and no "
                    "warehouse_dir configured"
                )
            loc = os.path.join(
                self.config.warehouse_dir, ref.database, ref.table
            )
        if loc.startswith("file:"):
            loc = loc[len("file:"):]
        source = self.sql(f"SELECT * FROM ({stmt.source_text})")
        missing = [
            c for c in stmt.partition_by if c not in source.columns
        ]
        if missing:
            raise GlueSparkError(
                f"CREATE TABLE {qual}: PARTITIONED BY column(s) "
                f"{missing} not produced by the source "
                f"(columns: {source.columns})"
            )
        part = list(stmt.partition_by) or None
        n_ins = source.count()
        version: object = None
        params: dict[str, str] = {}
        keys: list[PartitionKey] = []
        if stmt.using == "DELTA":
            from glue_table_cache_spark.sinks.delta_write import (
                write_delta_append,
            )

            version = write_delta_append(source, loc, partition_by=part)
            params = {"spark.sql.sources.provider": "delta"}
        elif stmt.using == "ICEBERG":
            from glue_table_cache_spark.sinks.iceberg_write import (
                write_iceberg_append,
            )

            version = write_iceberg_append(
                source, loc, partition_by=part
            )
            params = {"table_type": "ICEBERG"}
        elif stmt.using == "HUDI":
            from glue_table_cache_spark.sinks.hudi_write import (
                write_hudi_append,
            )

            version = write_hudi_append(source, loc, partition_by=part)
            params = {"hoodie.table.name": ref.table}
        else:  # PARQUET: plain hive-style directory
            writer = source.write.mode("errorifexists")
            if part:
                writer = writer.partitionBy(*part)
            writer.parquet(loc)
            # register the partition columns so the HIVE listing path
            # prunes them (values are directory strings — the typed
            # extractors coerce at predicate time)
            keys = [PartitionKey(c) for c in stmt.partition_by]
        self.store.register_table(
            CatalogTable(
                database=ref.database,
                name=ref.table,
                location=loc,
                partition_keys=keys,
                parameters=params,
            )
        )
        self.invalidate_table(ref.database, ref.table)
        return self.spark.createDataFrame(
            [
                (
                    "CREATE TABLE",
                    None if version is None else str(version),
                    0,
                    int(n_ins),
                    0,
                )
            ],
            "operation string, version string, rows_updated long, "
            "rows_inserted long, rows_deleted long",
        )

    def _execute_drop(self, stmt) -> DataFrame:
        """DROP TABLE: unregister the catalog entry and drop cached
        metadata.  Data files are NOT deleted — Glue tables are
        external; the catalog entry never owns the storage (use
        VACUUM / the format cleaners for file retirement)."""
        from glue_table_cache_spark.errors import TableNotFoundError

        ref = stmt.ref
        qual = f"glue.{ref.database}.{ref.table}"
        if not callable(getattr(self.store, "unregister_table", None)):
            raise GlueSparkError(
                f"DROP TABLE {qual}: the metadata store is "
                "read-only (no unregister_table)"
            )
        try:
            self.store.get_table(ref.database, ref.table)
        except TableNotFoundError:
            if stmt.if_exists:
                return self.spark.createDataFrame(
                    [("DROP TABLE", None, 0, 0, 0)],
                    "operation string, version string, "
                    "rows_updated long, rows_inserted long, "
                    "rows_deleted long",
                )
            raise
        self.store.unregister_table(ref.database, ref.table)
        self.invalidate_table(ref.database, ref.table)
        return self.spark.createDataFrame(
            [("DROP TABLE", None, 0, 0, 0)],
            "operation string, version string, rows_updated long, "
            "rows_inserted long, rows_deleted long",
        )

    def _execute_maintenance(
        self, stmt, tbl, loc: str, qual: str
    ) -> DataFrame:
        """``OPTIMIZE`` / ``VACUUM`` on a glue reference: compaction
        (optionally Z-ordered) and retention-gated unreferenced-file
        cleanup, dispatched per format.  VACUUM maps to each format's
        data-file cleanup half (Delta ``vacuum_delta``, Iceberg
        ``remove_iceberg_orphans``, Hudi ``clean_hudi``) — snapshot/log
        retention stays with the narrower Python APIs."""
        ttype = tbl.table_type
        zorder = list(stmt.zorder_by) or None
        if stmt.verb == "reorg":
            # REORG TABLE ... APPLY (PURGE): rewrite ONLY the files
            # carrying deletion vectors — minimal write amplification
            # when the goal is shedding DVs, not layout
            if ttype != ETableType.DELTA:
                raise GlueSparkError(
                    f"REORG TABLE {qual} APPLY (PURGE): deletion "
                    "vectors are a Delta feature (the table is "
                    f"registered as {ttype.name})"
                )
            from glue_table_cache_spark.sinks.delta_optimize import (
                optimize_delta,
            )

            version = optimize_delta(self.spark, loc, purge_only=True)
            if version is not None:
                self.invalidate_table(tbl.database, tbl.name)
            return self.spark.createDataFrame(
                [("REORG",
                  None if version is None else str(version), 0)],
                "operation string, version string, files_removed long",
            )
        if stmt.verb == "fsck":
            # FSCK REPAIR TABLE: drop log entries whose backing file
            # vanished out-of-band — until then every scan dies on
            # the missing file
            if ttype != ETableType.DELTA:
                raise GlueSparkError(
                    f"FSCK REPAIR TABLE {qual}: implemented for "
                    f"Delta (the table is registered as "
                    f"{ttype.name}); Iceberg/Hudi repair by "
                    "rewriting metadata with their own runtimes"
                )
            from glue_table_cache_spark.sinks.delta_optimize import (
                fsck_delta,
            )

            version, gone = fsck_delta(loc, dry_run=stmt.dry_run)
            if stmt.dry_run:
                return self.spark.createDataFrame(
                    [(str(p),) for p in gone], "path string"
                )
            if version is not None:
                self.invalidate_table(tbl.database, tbl.name)
            return self.spark.createDataFrame(
                [("FSCK",
                  None if version is None else str(version),
                  len(gone))],
                "operation string, version string, "
                "files_removed long",
            )
        if stmt.verb == "optimize":
            if stmt.predicate and ttype != ETableType.DELTA:
                raise GlueSparkError(
                    f"OPTIMIZE {qual} WHERE: partition-scoped "
                    "compaction is implemented for Delta only (the "
                    f"table is registered as {ttype.name}); run the "
                    "unscoped OPTIMIZE"
                )
            if ttype == ETableType.DELTA:
                from glue_table_cache_spark.sinks.delta_optimize import (
                    optimize_delta,
                )

                version = optimize_delta(
                    self.spark, loc, zorder_by=zorder,
                    partition_predicate=stmt.predicate,
                )
            elif ttype == ETableType.ICEBERG:
                from glue_table_cache_spark.sinks.iceberg_optimize import (  # noqa: E501
                    optimize_iceberg,
                )

                version = optimize_iceberg(
                    self.spark, loc, zorder_by=zorder
                )
            elif ttype == ETableType.HUDI:
                from glue_table_cache_spark.sinks.hudi_optimize import (
                    optimize_hudi,
                )

                version = optimize_hudi(
                    self.spark, loc, zorder_by=zorder
                )
            else:
                raise GlueSparkError(
                    f"OPTIMIZE {qual}: the table is registered as "
                    f"{ttype.name} — compaction of raw listings goes "
                    "through sinks.compact.compact_parquet_dir"
                )
            if version is not None:
                self.invalidate_table(tbl.database, tbl.name)
            return self.spark.createDataFrame(
                [("OPTIMIZE",
                  None if version is None else str(version), 0)],
                "operation string, version string, files_removed long",
            )
        if stmt.zorder_by:
            raise GlueSparkError("VACUUM takes no ZORDER clause")
        hours = (
            168.0 if stmt.retain_hours is None else stmt.retain_hours
        )
        if ttype == ETableType.DELTA:
            from glue_table_cache_spark.sinks.delta_optimize import (
                vacuum_delta,
            )

            victims = vacuum_delta(
                loc, retention_hours=hours, dry_run=stmt.dry_run
            )
        elif ttype == ETableType.ICEBERG:
            from glue_table_cache_spark.sinks.iceberg_optimize import (
                remove_iceberg_orphans,
            )

            victims = remove_iceberg_orphans(
                loc, retention_hours=hours, dry_run=stmt.dry_run
            )
        elif ttype == ETableType.HUDI:
            from glue_table_cache_spark.sinks.hudi_optimize import (
                clean_hudi,
            )

            victims = clean_hudi(
                loc, retention_hours=hours, dry_run=stmt.dry_run
            )
        else:
            raise GlueSparkError(
                f"VACUUM {qual}: the table is registered as "
                f"{ttype.name} — raw listings have no transaction log "
                "to derive the unreferenced set from"
            )
        if stmt.dry_run:
            # the deletable set itself, nothing deleted — the
            # look-before-you-leap half of vacuum_delta/clean_hudi/
            # remove_iceberg_orphans surfaced through SQL
            return self.spark.createDataFrame(
                [(str(v),) for v in sorted(victims)], "path string"
            )
        return self.spark.createDataFrame(
            [("VACUUM", None, len(victims))],
            "operation string, version string, files_removed long",
        )

    def _resolve_predicate_refs(self, text: str):
        """Glue refs inside a DML predicate — the subquery shapes,
        ``WHERE id IN (SELECT id FROM glue.db.contaminated)`` — get
        the same treatment as any query: per-call temp views plus a
        textual rewrite.  Returns ``(rewritten, drop)``; call
        ``drop()`` once the writer has committed (writers evaluate
        and commit synchronously, so the views' lifetime is the
        call).  No glue refs → the text passes through untouched
        with a no-op drop (plain temp-view subqueries already
        resolve by name)."""
        refs = get_query_glue_table_refs(text, strict=False)
        if not refs:
            return text, (lambda: None)
        token = next(self._view_seq)
        names = {
            ref: f"{ref.view_name}__pred_q{token}_{i}"
            for i, ref in enumerate(refs)
        }
        # the wrapped shape gives the pruning extractor a valid
        # query context; unprovable predicates prune nothing (the
        # conservative default)
        self._register_views(
            refs, names, f"SELECT * FROM __dml WHERE {text}", None
        )

        def drop() -> None:
            for n in names.values():
                self.spark.catalog.dropTempView(n)

        return rewrite_query(text, refs, names), drop

    def _register_views(
        self,
        refs: list[TableReference],
        names: dict[TableReference, str],
        query: str,
        travel: dict | None = None,
    ) -> None:
        """Per-table work runs in a thread pool like the reference's
        ``Promise.all`` (/root/reference/src/glue-table-cache.ts:265)."""
        if not refs:
            return
        travel = travel or {}
        if len(refs) == 1:
            self._setup_view(
                refs[0], names[refs[0]], query, travel.get(refs[0])
            )
        else:
            with ThreadPoolExecutor(max_workers=min(8, len(refs))) as pool:
                list(
                    pool.map(
                        lambda r: self._setup_view(
                            r, names[r], query, travel.get(r)
                        ),
                        refs,
                    )
                )

    def set_credentials(self, credentials: Credentials) -> None:
        """Reference ``setCredentials``
        (/root/reference/src/glue-table-cache.ts:87-95): swap static
        AWS credentials at runtime.  Validation (empty secret →
        ``No secretAccessKey``) lives in :class:`Credentials` itself —
        construct one to trigger it, exactly like the reference throws
        before storing."""
        self._apply_credentials(credentials, self.config.region)

    def _apply_credentials(
        self, creds: Credentials | None, region: str | None
    ) -> None:
        """Map credentials onto ``fs.s3a.*`` Hadoop conf — the
        Spark-side equivalent of the reference's
        ``CREATE SECRET (TYPE S3, KEY_ID …, SECRET …, REGION …)``
        (/root/reference/src/glue-table-cache.ts:100-113).  With no
        credentials the s3a default provider chain applies, which is
        the reference's ``PROVIDER CREDENTIAL_CHAIN`` branch
        (glue-table-cache.ts:114-117)."""
        hconf = self.spark.sparkContext._jsc.hadoopConfiguration()
        if creds is not None:
            hconf.set("fs.s3a.access.key", creds.access_key_id)
            hconf.set("fs.s3a.secret.key", creds.secret_access_key)
            if creds.session_token:
                hconf.set("fs.s3a.session.token", creds.session_token)
                hconf.set(
                    "fs.s3a.aws.credentials.provider",
                    "org.apache.hadoop.fs.s3a."
                    "TemporaryAWSCredentialsProvider",
                )
            else:
                # rotating from temporary to static credentials must
                # clear the stale token and the pinned Temporary
                # provider, or s3a keeps signing with the expired token
                hconf.unset("fs.s3a.session.token")
                hconf.unset("fs.s3a.aws.credentials.provider")
            # Hadoop caches S3AFileSystem per (scheme, authority, UGI)
            # with the provider chain captured at FS creation — conf
            # edits alone never reach already-visited buckets.  Close
            # cached instances so the next read builds a fresh FS with
            # the new chain.  Scope the close to the current UGI
            # (closeAllForUGI) rather than FileSystem.closeAll(), which
            # would tear down every cached filesystem JVM-wide.
            # CONCURRENCY HAZARD: even UGI-scoped, closing yanks
            # filesystems out from under in-flight tasks and streaming
            # checkpoints of THIS user ("Filesystem closed" failures).
            # Rotate credentials at a quiet point, or pre-set
            # fs.s3a.impl.disable.cache=true for sessions that must
            # rotate under concurrent load (per-access FS construction
            # cost, but no shared instance to invalidate).
            try:
                jvm = self.spark.sparkContext._jvm
                if hconf.get("fs.s3a.impl.disable.cache") == "true":
                    pass  # nothing cached; new conf applies per access
                else:
                    ugi = (
                        jvm.org.apache.hadoop.security.UserGroupInformation
                        .getCurrentUser()
                    )
                    jvm.org.apache.hadoop.fs.FileSystem.closeAllForUGI(ugi)
            except Exception:  # pragma: no cover - py4j-less test stub
                pass
        if region:
            hconf.set("fs.s3a.endpoint.region", region)

    def get_table_partitions(
        self, database: str, table: str
    ) -> PartitionListing:
        """Partition metadata with the reference's degrade-gracefully
        posture (/root/reference/src/util/glue.ts:130-133): a failing
        partitions API warns and yields an empty listing instead of
        failing the query — the field is informational, pruning works
        from partition *keys* + path extraction."""
        try:
            return self.store.get_partitions(database, table)
        except Exception as exc:  # noqa: BLE001 - parity: warn-and-continue
            logging.getLogger(__name__).warning(
                "Failed to load partitions for %s_%s: %s",
                database, table, exc,
            )
            return PartitionListing()

    def get_table_metadata_cached(self, database: str, table: str) -> CatalogTable:
        return self._metadata_cache.get_or_load(
            table_cache_key(database, table),
            lambda: self.store.get_table(database, table),
        )

    def list_table_files_cached(self, table: CatalogTable) -> list[FileInfo]:
        if not table.location:
            raise NoStorageLocationError(table.database, table.name)
        keys = [k.name for k in table.partition_keys]
        lkey = listing_cache_key(table.location, keys)
        self._track_listing_key(table, lkey)
        loaded: list = []

        def loader():
            loaded.append(True)
            return self._list_files(table)

        value = self._listing_cache.get_or_load(lkey, loader)
        if loaded:
            # a fresh FULL listing: predicate-scoped (#w:) entries
            # from before it must not outlive it (r14, same contract
            # as the format-scan cache — see _drop_pruned_keys)
            self._drop_pruned_keys(table, lkey)
        return value

    def _list_files_maybe_pruned(
        self, tbl: CatalogTable, query: str | None, predicate
    ) -> tuple[list[FileInfo], "ListingStats | None"]:
        """The r14 prefix-pruned listing behind the same
        predicate-fingerprint caching as the table-format walks
        (:meth:`_format_scan_cached_pruned`): a fresh bare (full)
        listing is always preferred and retires predicate-scoped
        entries; a pruned listing caches under its fingerprint so no
        other query ever serves from the narrowed set; a walk that
        pruned nothing IS the full listing and is mirrored under the
        bare key.  Returns ``(files, stats)`` — ``stats`` is ``None``
        on the flat path (then an empty list means a truly empty
        table)."""
        if predicate is None or not tbl.location:
            return self.list_table_files_cached(tbl), None
        keys = [k.name for k in tbl.partition_keys]
        bare = listing_cache_key(tbl.location, keys)
        hit = self._listing_cache.peek(bare)
        if hit is not None:
            self._track_listing_key(tbl, bare)
            self._drop_pruned_keys(tbl, bare)
            return hit, None
        from glue_table_cache_spark.meta_prune import _fingerprint

        fp = _fingerprint(
            query, keys, {tbl.name, tbl.qualified_name}, False
        )
        if fp is None:
            return self.list_table_files_cached(tbl), None
        skey = f"{bare}#w:{fp}"
        loaded: list = []

        def loader():
            loaded.append(True)
            stats = ListingStats()
            return self._list_files(tbl, predicate, stats), stats

        files, stats = self._listing_cache.get_or_load(skey, loader)
        self._track_listing_key(tbl, skey)
        if loaded and not stats.prefixes_pruned:
            # nothing was pruned: this IS the full listing — share it
            # under the bare key and retire other predicate entries
            self._listing_cache.get_or_load(bare, lambda: files)
            self._track_listing_key(tbl, bare)
            self._drop_pruned_keys(tbl, bare, keep=skey)
        return files, stats

    def invalidate_table(self, database: str, table: str) -> None:
        """Reference ``invalidateTable``
        (/root/reference/src/glue-table-cache.ts:206-215): drop the
        metadata entry and the table's file listing.

        The reference sweeps listing keys by the ``db_tbl`` substring,
        but listing keys are ``location:keys`` and rarely contain it —
        stale listings survive invalidation there.  We resolve the
        exact listing key via the ``_listing_keys`` side-map (recorded
        when the listing was cached, so it works even after the
        metadata entry was LRU-evicted or TTL-expired — peek() alone
        would miss and leave the stale listing serving), falling back
        to the cached metadata's location, plus the substring sweep for
        parity with any location that does embed the table name."""
        meta_key = table_cache_key(database, table)
        for lkey in self._listing_keys.pop(meta_key, set()):
            self._listing_cache.invalidate(lkey)
        cached = self._metadata_cache.peek(meta_key)
        if cached is not None and cached.location:
            keys = [k.name for k in cached.partition_keys]
            self._listing_cache.invalidate(
                listing_cache_key(cached.location, keys)
            )
        self._metadata_cache.invalidate(meta_key)
        self._listing_cache.invalidate_matching(meta_key)

    def clear_cache(self) -> None:
        self._metadata_cache.clear()
        self._listing_cache.clear()
        self._listing_keys.clear()

    # -- view construction ---------------------------------------------------

    def table_dataframe(
        self, database: str, table: str, query: str | None = None
    ) -> DataFrame:
        """DataFrame over one glue table, with pruning hints from
        ``query`` when given."""
        tbl = self.get_table_metadata_cached(database, table)
        return self._dataframe_for(tbl, query)

    def _setup_view(
        self,
        ref: TableReference,
        view_name: str,
        query: str,
        travel: tuple | None = None,
    ) -> None:
        tbl = self.get_table_metadata_cached(ref.database, ref.table)
        df = self._dataframe_for(tbl, query, travel)
        df.createOrReplaceTempView(view_name)

    def _format_scan_cached(
        self, tbl: CatalogTable, load: Callable, key_suffix: str = ""
    ):
        """Table-format metadata walks (Delta log replay, Iceberg
        manifest walk, Hudi timeline walk) through the LISTING cache —
        the same LRU+TTL+single-flight treatment the reference gives
        its S3 listings (/root/reference/src/glue-table-cache.ts:349-466),
        because that is exactly what these walks are: the format's own
        file listing.  ``s3_listing_ttl_ms`` bounds staleness; a new
        commit/snapshot is visible after TTL expiry or an explicit
        ``invalidate_table``.  Cached values are treated as immutable
        — every consumer rebuilds its own filtered lists.

        ``key_suffix`` (r13) scopes the entry to a pushed-down
        predicate: a walk whose distributed decode pre-pruned by the
        query's WHERE clause caches under a predicate fingerprint, so
        a different query never serves from a narrower active set.
        All of a table's keys are recorded for invalidation."""
        key = f"format-scan:{tbl.location}{key_suffix}"
        self._track_listing_key(tbl, key)
        if key_suffix:
            return self._listing_cache.get_or_load(key, load)
        loaded: list = []

        def loader():
            loaded.append(True)
            return load()

        value = self._listing_cache.get_or_load(key, loader)
        if loaded:
            # a fresh FULL walk: predicate-scoped entries from before
            # it must not outlive it (see _drop_pruned_keys)
            self._drop_pruned_keys(tbl, key)
        return value

    #: bound on tracked cache keys per table: each distinct pushed
    #: predicate adds one fingerprint key, and a long-lived engine
    #: serving ad-hoc WHEREs must not grow the side-map forever
    _MAX_TRACKED_KEYS = 64

    def _track_listing_key(self, tbl: CatalogTable, key: str) -> None:
        """Record ``key`` for invalidate_table.  At the cap, an
        arbitrary tracked predicate-scoped key is evicted from the
        CACHE before being dropped from the map — the invariant that
        every live cache entry has an invalidation record survives."""
        keys = self._listing_keys.setdefault(
            table_cache_key(tbl.database, tbl.name), set()
        )
        if key not in keys and len(keys) >= self._MAX_TRACKED_KEYS:
            victim = next((k for k in keys if "#w:" in k), None)
            if victim is not None:
                self._listing_cache.invalidate(victim)
                keys.discard(victim)
        keys.add(key)

    def _format_scan_cached_pruned(
        self, tbl: CatalogTable, load: Callable, factory
    ):
        """Predicate-aware caching for walks whose distributed decode
        can pre-prune by the query's WHERE clause (r13).  Below the
        distribution gate pushdown never engages and the walk caches
        under the bare key exactly as before (full cache sharing
        across queries); when the decode DID pre-prune (huge
        checkpoint / manifest set), the narrower result is cached
        under a predicate-fingerprint key so no other query ever
        serves from it.  A fresh bare-key entry is always preferred —
        it answers every predicate.

        The walk itself runs INSIDE ``get_or_load`` on the
        fingerprint key, keeping the per-key single-flight and
        retry/backoff every other format-scan load gets (two threads
        with the same predicate walk once; different predicates on a
        cold table each walk — their pruned sets differ anyway).
        When the load comes back un-pruned (below the gate), the full
        set is mirrored under the bare key so every other query
        shares it."""
        if factory is None:
            return self._format_scan_cached(tbl, load)
        bare = f"format-scan:{tbl.location}"
        hit = self._listing_cache.peek(bare)
        if hit is not None:
            self._track_listing_key(tbl, bare)
            # a live bare entry answers every predicate — predicate
            # -scoped entries must never OUTLIVE it (if the bare entry
            # later evicts/expires while an older #w: entry survives,
            # the same query's view of the table would move BACKWARD
            # within one TTL window), so retire them now
            self._drop_pruned_keys(tbl, bare)
            return hit
        skey = f"{bare}#w:{factory.fingerprint}"
        loaded: list = []

        def loader():
            loaded.append(True)
            factory.applied = False
            return load()

        value = self._listing_cache.get_or_load(skey, loader)
        self._track_listing_key(tbl, skey)
        if loaded and not factory.applied:
            # gate never crossed: this IS the full active set — share
            # it under the bare key (a cache hit there means no other
            # predicate ever re-walks this table), and retire every
            # OLDER predicate-scoped entry so none can serve a stale
            # narrower snapshot after this fresher full walk
            self._listing_cache.get_or_load(bare, lambda: value)
            self._track_listing_key(tbl, bare)
            self._drop_pruned_keys(tbl, bare, keep=skey)
        return value

    def _drop_pruned_keys(
        self, tbl: CatalogTable, bare: str, keep: str | None = None
    ) -> None:
        """Invalidate every tracked predicate-fingerprint entry under
        ``bare`` (except ``keep``): called whenever a full-set bare
        entry is freshly loaded or served, so a ``#w:`` entry can
        never outlive a newer full walk and time-travel a repeat
        query backward."""
        keys = self._listing_keys.get(
            table_cache_key(tbl.database, tbl.name), set()
        )
        prefix = f"{bare}#w:"
        for k in [k for k in keys if k.startswith(prefix) and k != keep]:
            self._listing_cache.invalidate(k)
            keys.discard(k)

    @staticmethod
    def _travel_timestamp_ms(literal: str) -> int:
        """Parse a ``TIMESTAMP AS OF`` literal to epoch ms (naive
        timestamps are UTC — the engine pins the session timezone)."""
        import datetime

        txt = str(literal).strip().replace(" ", "T", 1)
        if txt.endswith("Z"):
            txt = txt[:-1] + "+00:00"
        try:
            dt = datetime.datetime.fromisoformat(txt)
        except ValueError as exc:
            raise GlueSparkError(
                f"unparseable TIMESTAMP AS OF literal {literal!r}"
            ) from exc
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=datetime.timezone.utc)
        return int(dt.timestamp() * 1000)

    def _delta_travel_kwargs(self, location: str, travel: tuple) -> dict:
        kind, val = travel
        if kind == "timestamp":
            return {
                "as_of_timestamp_ms": self._travel_timestamp_ms(val)
            }
        from glue_table_cache_spark.streaming.delta_source import (
            _latest_version,
        )

        latest = _latest_version(location)
        if not isinstance(val, int) or val > latest:
            raise GlueSparkError(
                f"Delta version {val!r} does not exist at "
                f"{location!r} (latest {latest})"
            )
        return {"version_offset": latest - val}

    def _iceberg_travel_kwargs(
        self, location: str, travel: tuple
    ) -> dict:
        kind, val = travel
        if kind == "timestamp":
            return {
                "as_of_timestamp_ms": self._travel_timestamp_ms(val)
            }
        if isinstance(val, str):
            # VERSION AS OF '<name>': a named ref (tag/branch) from
            # the metadata's refs map — resolution and expired-target
            # refusal live in the scan walk
            return {"as_of_ref": val}
        from glue_table_cache_spark.sources.iceberg import (
            _list_metadata_jsons,
            _read_json,
        )

        seqs = sorted(
            _read_json(p).get("last-sequence-number", 0)
            for p in _list_metadata_jsons(location, fs=self._fs)
        )
        if val not in seqs:
            raise GlueSparkError(
                f"Iceberg sequence number {val!r} does not exist at "
                f"{location!r} (have {seqs})"
            )
        return {"version_offset": len(seqs) - 1 - seqs.index(val)}

    def _empty_scan(
        self,
        schema=None,
        sample_path: str | None = None,
        base_path: str | None = None,
    ) -> DataFrame:
        """Empty relation for a scan whose pruning dropped every file:
        it must carry the REAL schema (the format's metadata schema
        when known, else one sampled footer) so downstream column
        references still resolve — ``WHERE tag = 'x'`` over a
        fully-skipped table is an empty RESULT, not an analysis error.
        Only a table with no schema source at all (never held a file)
        degrades to the reference's ``SELECT NULL LIMIT 0`` shape
        (/root/reference/src/sql-transformer.ts:320-322)."""
        if schema is not None:
            return self.spark.createDataFrame([], schema)
        if sample_path:
            reader = self.spark.read
            if base_path:
                reader = reader.option("basePath", base_path)
            return reader.parquet(*self._proxy([sample_path])).limit(0)
        return self.spark.range(0).select(F.lit(None).alias("null"))

    def _stats_keep_set(
        self,
        query: str,
        tbl: CatalogTable,
        stats_by_path: dict,
    ) -> set[str] | None:
        """Zone-map file skipping: paths whose stats say a row MAY
        match the query's WHERE clause, or ``None`` when no skipping is
        possible (no usable stats, or no extractable data-column
        predicate).  Predicates are extracted over the union of
        stats-bearing columns with the same conservative three-valued
        machinery as partition pruning — a file is dropped only when
        its min/max/null-count PROVE it cannot contribute."""
        from glue_table_cache_spark.pruning import TruePredicate
        from glue_table_cache_spark.skipping import skip_files

        cols: set[str] = set()
        for st in stats_by_path.values():
            if st is not None:
                cols.update(st.min_values)
                cols.update(st.max_values)
                cols.update(st.null_counts)
        if not cols:
            return None
        pred = extract_partition_predicate(
            query, sorted(cols), {tbl.name, tbl.qualified_name}
        )
        if isinstance(pred, TruePredicate):
            return None
        return skip_files(list(stats_by_path.items()), pred)

    def _dataframe_for(
        self,
        tbl: CatalogTable,
        query: str | None,
        travel: tuple | None = None,
    ) -> DataFrame:
        if not tbl.location:
            raise NoStorageLocationError(tbl.database, tbl.name)
        ttype = tbl.table_type
        if ttype in (
            ETableType.HIVE,
            ETableType.UNPARTITIONED,
            ETableType.GLUE_PROJECTED,
        ) and self.config.misclassified_format_guard:
            self._refuse_misclassified_format(tbl)
        if travel is not None and ttype not in (
            ETableType.DELTA,
            ETableType.ICEBERG,
            ETableType.HUDI,
        ):
            raise GlueSparkError(
                f"VERSION/TIMESTAMP AS OF is supported for DELTA, "
                f"ICEBERG, and HUDI tables; "
                f"glue.{tbl.database}.{tbl.name} is {ttype.name}"
            )
        if travel is not None and ttype == ETableType.HUDI:
            if travel[0] == "timestamp":
                # TIMESTAMP AS OF resolves through the timeline's own
                # wall clocks (r12): 1.x names carry the completion
                # timestamp, legacy names the request stamp; instant
                # spellings that are not wall clocks refuse in the
                # resolver rather than guessing
                from glue_table_cache_spark.sources.hudi import (
                    hudi_instant_for_wallclock,
                )

                travel = (
                    "version",
                    hudi_instant_for_wallclock(
                        tbl.location,
                        self._travel_timestamp_ms(travel[1]),
                        fs=self._fs,
                    ),
                )
            if not isinstance(travel[1], int):
                raise GlueSparkError(
                    f"Hudi VERSION AS OF {travel[1]!r}: named refs "
                    "are an Iceberg feature; Hudi instants are "
                    "numeric"
                )
        if ttype == ETableType.HUDI:
            # beyond the reference (which enumerates HUDI but never
            # reads it): COPY_ON_WRITE timeline walk — latest file
            # slice per live file group; MERGE_ON_READ merges the
            # un-compacted log blocks over the base rows
            from glue_table_cache_spark.sources.hudi import (
                _table_type,
                _timeline_files,
                hudi_mor_scan_info,
                hudi_scan_info,
                hudi_table_schema,
            )

            as_of = int(travel[1]) if travel is not None else None

            def _walk_hudi():
                timeline = _timeline_files(tbl.location, fs=self._fs)
                if _table_type(timeline) == "MERGE_ON_READ":
                    return ("MOR",) + hudi_mor_scan_info(
                        tbl.location, fs=self._fs,
                        as_of_instant=as_of,
                    )
                return (
                    "COW",
                    hudi_scan_info(
                        tbl.location, fs=self._fs,
                        as_of_instant=as_of,
                    ),
                    hudi_table_schema(
                        tbl.location, fs=self._fs,
                        as_of_instant=as_of,
                    ),
                )

            if travel is not None:
                # travel states bypass the current-state cache, the
                # DELTA/ICEBERG posture
                walk = _walk_hudi()
            else:
                walk = self._format_scan_cached(tbl, _walk_hudi)
            if walk[0] == "MOR":
                from glue_table_cache_spark.sources.hudi_mor import (
                    DEFAULT_RECORD_KEY,
                    hudi_mor_read,
                )

                base_entries, log_entries = walk[1], walk[2]
                # TIMELINE-METADATA partition pruning, BOTH sides: a
                # Hudi file group and its log files live in exactly
                # one partition (the write stats record it), so
                # pruning bases and logs with the same predicate
                # cannot orphan log records
                keys = self._hudi_prune_keys(
                    tbl,
                    [pv for _p, pv, _t in base_entries]
                    + [pv for _p, _t, pv in log_entries],
                )
                if query and keys and (base_entries or log_entries):
                    predicate = extract_partition_predicate(
                        query, keys, {tbl.name, tbl.qualified_name}
                    )
                    kept = {
                        f.path
                        for f in prune_files(
                            [
                                FileInfo(p, pv)
                                for p, pv, _t in base_entries
                            ]
                            + [
                                FileInfo(p, pv)
                                for p, _t, pv in log_entries
                            ],
                            predicate,
                        )
                    }
                    base_entries = [
                        e for e in base_entries if e[0] in kept
                    ]
                    log_entries = [
                        e for e in log_entries if e[0] in kept
                    ]
                return hudi_mor_read(
                    self.spark,
                    [
                        (pp, pv, ts)
                        for pp, (_p, pv, ts) in zip(
                            self._proxy(
                                [p for p, _pv, _t in base_entries]
                            ),
                            base_entries,
                        )
                    ],
                    [
                        (pp, t, pv)
                        for pp, (_p, t, pv) in zip(
                            self._proxy(
                                [p for p, _t, _pv in log_entries]
                            ),
                            log_entries,
                        )
                    ],
                    record_key_field=tbl.parameters.get(
                        "hoodie.table.recordkey.fields",
                        DEFAULT_RECORD_KEY,
                    ),
                    base_path=tbl.location,
                )
            entries = walk[1]
            # TIMELINE-METADATA partition pruning — same shape as the
            # DELTA/ICEBERG branches, from the write stats' partition
            # paths (hive-style layouts only; others carry no values)
            keys = self._hudi_prune_keys(
                tbl, [pv for _p, pv in entries]
            )
            if query and keys and entries:
                predicate = extract_partition_predicate(
                    query, keys, {tbl.name, tbl.qualified_name}
                )
                kept = {
                    f.path
                    for f in prune_files(
                        [FileInfo(p, pv) for p, pv in entries],
                        predicate,
                    )
                }
                entries = [e for e in entries if e[0] in kept]
            paths = self._proxy([p for p, _pv in entries])
            if not paths:
                return self._empty_scan(
                    schema=walk[2] if len(walk) > 2 else None,
                    sample_path=walk[1][0][0] if walk[1] else None,
                    base_path=tbl.location,
                )
            # same basePath treatment as DELTA: hudi partition paths
            # are usually hive-style <k>=<v> directories
            reader = self.spark.read.option("basePath", tbl.location)
            # the newest commit's extraMetadata.schema (when a writer
            # recorded one) is the authoritative scan schema for
            # EVOLVED tables — pre-evolution base files surface nulls
            # for added columns, independent of scan order; partition
            # columns in it resolve typed from the k=v directories
            if len(walk) > 2 and walk[2] is not None:
                reader = reader.schema(walk[2])
            return self._format_read(reader, tbl, *paths)
        if ttype == ETableType.DELTA:
            # beyond the reference (which never handles DELTA): resolve
            # the ACTIVE file set from the transaction log — a raw
            # directory scan would read removed/orphan files — and mask
            # DV-deleted rows via the row_index anti-join
            from glue_table_cache_spark.sources.delta import (
                apply_column_mapping,
                apply_deletion_vectors,
                delta_scan_info,
            )

            # r13: push the query's partition/stats predicates INTO
            # the distributed checkpoint decode — above the
            # distribution gate the driver collects only surviving
            # adds instead of the full active set.  The driver prunes
            # below still run (idempotent over survivors) so the
            # final kept set is identical with or without pushdown.
            from glue_table_cache_spark.meta_prune import (
                delta_prune_factory,
            )

            prune_factory = delta_prune_factory(
                query,
                [k.name for k in tbl.partition_keys],
                {tbl.name, tbl.qualified_name},
                self.config.stats_skipping,
            )
            if travel is not None:
                # travel states bypass the current-state cache
                entries, renames, log_schema, gen_fields = (
                    delta_scan_info(
                        tbl.location, fs=self._fs, with_schema=True,
                        with_stats=True, with_partition_fields=True,
                        allow_nested_mapping=True,
                        prune_factory=prune_factory,
                        **self._delta_travel_kwargs(
                            tbl.location, travel
                        ),
                    )
                )
            else:
                entries, renames, log_schema, gen_fields = (
                    self._format_scan_cached_pruned(
                        tbl,
                        lambda: delta_scan_info(
                            tbl.location, fs=self._fs,
                            with_schema=True, with_stats=True,
                            with_partition_fields=True,
                            allow_nested_mapping=True,
                            prune_factory=prune_factory,
                        ),
                        prune_factory,
                    )
                )
            stats_by_path = {p: s for p, _pv, _dv, s in entries}
            entries = [(p, pv, dv) for p, pv, dv, _s in entries]
            # LOG-METADATA partition pruning: the transaction log
            # already records partitionValues per file, so partition
            # predicates drop files BEFORE the reader ever sees their
            # paths — at large file counts this is the difference
            # between handing Spark 10k paths and 1M (driver memory,
            # file-index build, task planning), on top of whatever
            # partition pruning Catalyst repeats later.  Column-mapped
            # tables (r14) key partitionValues by PHYSICAL name —
            # translated physical→logical through `renames` so the
            # same logical-name predicates prune them too.
            def _log_infos() -> list[FileInfo]:
                if renames is None:
                    return [FileInfo(p, pv) for p, pv, _dv in entries]
                return [
                    FileInfo(
                        p,
                        {
                            renames.get(k, k): v
                            for k, v in (pv or {}).items()
                        },
                    )
                    for p, pv, _dv in entries
                ]

            keys = [k.name for k in tbl.partition_keys]
            if query and keys and entries:
                predicate = extract_partition_predicate(
                    query, keys, {tbl.name, tbl.qualified_name}
                )
                kept = {
                    f.path for f in prune_files(_log_infos(), predicate)
                }
                entries = [e for e in entries if e[0] in kept]
            # GENERATED-COLUMN + log-driven partition pruning: the
            # metaData's partitionColumns prune even when the catalog
            # registered no partition keys, and a partition column
            # generated from another column (delta.generationExpression
            # — CAST(ts AS DATE), YEAR(ts), DATE_FORMAT, DATE_TRUNC)
            # prunes from predicates on the SOURCE column through the
            # same sound transform rewrite the Iceberg hidden
            # partitioning uses.  gen_fields carry LOGICAL names, so
            # the physical→logical pv translation (r14) covers mapped
            # tables here too.
            if query and entries and gen_fields:
                from glue_table_cache_spark.sources.iceberg_partitioning import (  # noqa: E501
                    transform_partition_predicate,
                )

                srcs = sorted(
                    {f["source"] for f in gen_fields if f["source"]}
                )
                src_pred = extract_partition_predicate(
                    query, srcs, {tbl.name, tbl.qualified_name}
                )
                pv_pred = transform_partition_predicate(
                    src_pred, gen_fields
                )
                kept = {
                    f.path for f in prune_files(_log_infos(), pv_pred)
                }
                entries = [e for e in entries if e[0] in kept]
            # LOG-STATS zone-map skipping: the add actions' stats JSON
            # (numRecords/minValues/maxValues/nullCount) is already in
            # hand, so data-column predicates drop whole files for
            # free.  Column-mapped tables' stats keys are PHYSICAL
            # names — translated physical→logical through `renames`
            # (unknown physical keys dropped) so skipping works there
            # too without ever matching a stale physical name against
            # a different column's logical one.
            if query and entries and self.config.stats_skipping:
                from glue_table_cache_spark.skipping import (
                    delta_file_stats,
                )

                keep = self._stats_keep_set(
                    query,
                    tbl,
                    {
                        p: delta_file_stats(
                            stats_by_path.get(p), renames=renames
                        )
                        for p, _pv, _dv in entries
                    },
                )
                if keep is not None:
                    entries = [e for e in entries if e[0] in keep]
            raw_paths = [p for p, _pv, _dv in entries]
            paths = self._proxy(raw_paths)
            if not paths:
                # pruned-to-zero keeps the REAL user-visible schema:
                # the log's logical schema covers mapped and unmapped
                # tables alike (r14 — previously a mapped table
                # footer-sampled a surviving path, which an
                # executor-pruned walk may not have collected)
                if log_schema is not None:
                    return self._empty_scan(schema=log_schema)
                first = next(iter(stats_by_path), None)
                df0 = self._empty_scan(
                    sample_path=first, base_path=tbl.location
                )
                return (
                    apply_column_mapping(
                        df0, renames, logical_schema=log_schema
                    )
                    if first is not None
                    else df0
                )
            # read_parquet_files surfaces hive-style k=v partition
            # dirs as partition columns (basePath = each file's
            # partition root) and handles the SHALLOW CLONE case
            # where the active set spans the source directory AND the
            # clone's own.  The log's schemaString is the
            # authoritative scan schema for EVOLVED tables
            # (pre-evolution files surface nulls for added columns,
            # independent of scan order); not applied for
            # column-mapped tables, whose files carry physical names
            # the rename projection handles
            from glue_table_cache_spark.sources.delta import (
                read_parquet_files,
            )

            df = read_parquet_files(
                self.spark, tbl.location, paths,
                schema=(
                    log_schema if renames is None else None
                ),
            )
            # keyed on the PROXIED path — the one _metadata.file_path
            # will report for the scan Spark actually performed.
            # DVs first (they need _metadata), then the logical rename
            proxied = [
                (pp, pv, dv)
                for pp, (_p, pv, dv) in zip(paths, entries)
            ]
            df = apply_deletion_vectors(df, proxied, tbl.location)
            # read_parquet_files materializes _metadata across a
            # multi-root (shallow-clone) union; never user-visible
            df = apply_column_mapping(
                df, renames, logical_schema=log_schema
            ).drop("_metadata")
            if renames is None and log_schema is not None:
                # Spark appends hive-partition columns at the END of
                # a file scan even under an explicit schema; the
                # log's schemaString order is authoritative (real
                # Delta keeps partition columns in their declared
                # position — positional INSERT depends on it)
                want = [f.name for f in log_schema.fields]
                if set(want) == set(df.columns) and want != df.columns:
                    df = df.select(*want)
            return df
        if ttype == ETableType.ICEBERG:
            from glue_table_cache_spark.sources.iceberg import (
                apply_equality_deletes,
                apply_position_deletes,
                iceberg_scan_details,
            )

            # r13: same predicate pushdown as the Delta branch — the
            # distributed manifest decode drops data-manifest entries
            # the query's partition/stats predicates disprove before
            # they ever reach the driver
            from glue_table_cache_spark.meta_prune import (
                iceberg_prune_factory,
            )

            ice_prune = iceberg_prune_factory(
                query,
                [k.name for k in tbl.partition_keys],
                {tbl.name, tbl.qualified_name},
                self.config.stats_skipping,
            )
            if travel is not None:
                entries, dels, eq_dels, ice_schema, ice_spec, (
                    ice_renames, ice_dead
                ) = iceberg_scan_details(
                    tbl.location, fs=self._fs, with_stats=True,
                    with_schema=True, with_spec=True,
                    with_mapping=True,
                    prune_factory=ice_prune,
                    **self._iceberg_travel_kwargs(
                        tbl.location, travel
                    ),
                )
            else:
                entries, dels, eq_dels, ice_schema, ice_spec, (
                    ice_renames, ice_dead
                ) = self._format_scan_cached_pruned(
                    tbl,
                    lambda: iceberg_scan_details(
                        tbl.location, fs=self._fs, with_stats=True,
                        with_schema=True, with_spec=True,
                        with_mapping=True,
                        prune_factory=ice_prune,
                    ),
                    ice_prune,
                )
            iceberg_stats = {p: s for p, _pv, _seq, s in entries}
            entries = [(p, pv, seq) for p, pv, seq, _s in entries]
            # MANIFEST-METADATA partition pruning — same shape as the
            # DELTA branch: the manifests record each file's partition
            # tuple, so partition predicates drop files before the
            # reader sees their paths.  Safe with row-level deletes:
            # deletes only ever REMOVE rows from the surviving files,
            # so pruning first cannot change the result.
            keys = [k.name for k in tbl.partition_keys]
            if query and keys and entries:
                predicate = extract_partition_predicate(
                    query, keys, {tbl.name, tbl.qualified_name}
                )
                kept = {
                    f.path
                    for f in prune_files(
                        [FileInfo(p, pv) for p, pv, _seq in entries],
                        predicate,
                    )
                }
                entries = [e for e in entries if e[0] in kept]
            # HIDDEN-PARTITIONING pruning: the spec's transform fields
            # (day(ts), bucket(N, id), truncate(W, s)) carry
            # TRANSFORMED values in the manifest partition tuple, keyed
            # by the spec field's name — predicates on the SOURCE
            # column prune only after a sound rewrite into transformed
            # space (monotone bounds / bucket equality; anything else
            # stays Unknown).  Also covers identity fields on catalogs
            # that never registered partition keys — the common shape
            # for Iceberg entries in Glue.
            if query and entries and ice_spec:
                from glue_table_cache_spark.sources.iceberg_partitioning import (
                    transform_partition_predicate,
                )

                srcs = sorted(
                    {f["source"] for f in ice_spec if f["source"]}
                )
                src_pred = extract_partition_predicate(
                    query, srcs, {tbl.name, tbl.qualified_name}
                )
                pv_pred = transform_partition_predicate(
                    src_pred, ice_spec
                )
                kept = {
                    f.path
                    for f in prune_files(
                        [FileInfo(p, pv) for p, pv, _seq in entries],
                        pv_pred,
                    )
                }
                entries = [e for e in entries if e[0] in kept]
            # MANIFEST-BOUNDS zone-map skipping: lower/upper bounds per
            # data file are already decoded from the manifests.  Safe
            # under row-level deletes — deletes only ever REMOVE rows,
            # so a file provably without matching rows stays without
            # them after masking.
            if query and entries and self.config.stats_skipping:
                keep = self._stats_keep_set(
                    query,
                    tbl,
                    {p: iceberg_stats.get(p) for p, _pv, _seq in entries},
                )
                if keep is not None:
                    entries = [e for e in entries if e[0] in keep]
            raw_paths = [p for p, _pv, _seq in entries]
            paths = self._proxy(raw_paths)
            if not paths:
                return self._empty_scan(
                    schema=ice_schema,
                    sample_path=next(iter(iceberg_stats), None),
                )
            # SCAN SCHEMA AUTHORITY + partition-column recovery.  The
            # metadata's current schema (not a sampled footer) types
            # the scan, so evolved tables surface nulls for
            # later-added columns regardless of scan order.  Identity
            # partition columns need one extra step: writers that
            # partition hive-style (this repo's
            # ``write_iceberg_append`` among them) store the value in
            # the directory name, NOT the data file — a leaf-file read
            # would silently drop the column (or, worse, surface it
            # all-null if the schema were force-applied).  One footer
            # read (metadata-scale, what Spark's own inference does)
            # decides per partition key: present in the data files →
            # scan it like any column; absent → drop it from the scan
            # schema and re-attach from the path via the same typed
            # extractors the hive listing path uses.
            missing_keys: list[str] = []
            scan_schema = None
            # identity-spec columns need the same recovery even when
            # the catalog registered no partition keys (the common
            # Glue shape for Iceberg): the spec field's tuple value
            # is the column value, so a hive-style layout that keeps
            # it out of the data files is recoverable
            part_cols = list(keys)
            for f in ice_spec or []:
                from glue_table_cache_spark.sources.iceberg_partitioning import (  # noqa: E501
                    parse_transform,
                )

                if (
                    parse_transform(f["transform"])[0] == "identity"
                    and f["name"] == f["source"]
                    and f["name"] not in part_cols
                ):
                    part_cols.append(f["name"])
            if ice_schema is not None:
                drop: set[str] = set()
                usable = True
                if part_cols:
                    from glue_table_cache_spark.skipping import (
                        parquet_file_columns,
                    )

                    # one footer peek per (file, TTL) — repeat queries
                    # on the same snapshot pay a cache hit, not IO
                    peek_path = raw_paths[0]
                    file_cols = self._listing_cache.get_or_load(
                        f"footer-cols:{peek_path}",
                        lambda: parquet_file_columns(peek_path),
                    )
                    if file_cols is None:
                        # can't prove whether the files carry the
                        # partition columns — forcing the schema could
                        # surface them all-null, so keep inference
                        # (today's behavior) for this scan
                        usable = False
                    else:
                        drop = {
                            k
                            for k in part_cols
                            if k.lower() not in file_cols
                        }
                if usable:
                    kept = [
                        f
                        for f in ice_schema.fields
                        if f.name not in drop
                    ]
                    missing_keys = [
                        f.name
                        for f in ice_schema.fields
                        if f.name in drop
                    ]
                    if kept:
                        from pyspark.sql.types import StructType

                        scan_schema = StructType(kept)
            # RENAMED tables read under the on-disk (physical)
            # spellings pinned by the name mapping; the logical
            # projection happens after the row-level deletes, which
            # operate on the raw scan's hidden _metadata column
            from glue_table_cache_spark.sources.iceberg import (
                iceberg_physical_schema,
                project_iceberg_logical,
            )

            read_schema = iceberg_physical_schema(
                scan_schema, ice_renames
            )
            df = self._read_paths(paths, base_path=None, schema=read_schema)
            if missing_keys:
                df = self._attach_iceberg_partition_values(
                    df,
                    list(zip(paths, (pv for _p, pv, _s in entries))),
                    missing_keys,
                    {f.name: f.dataType for f in ice_schema.fields},
                    tbl,
                )
            df = apply_position_deletes(df, self._proxy(dels))
            # keyed on the PROXIED path — what _metadata.file_path
            # reports for the scan Spark actually performed
            proxied_entries = [
                (pp, pv, seq)
                for pp, (_p, pv, seq) in zip(paths, entries)
            ]
            if eq_dels:
                # the scan still carries PHYSICAL spellings here —
                # translate the delete columns (resolved to logical
                # names by field id) back to what the files spell
                inv = {v: k for k, v in ice_renames.items()}
                eq_dels = [
                    {
                        **d,
                        "path": self._proxy([d["path"]])[0],
                        "columns": [
                            inv.get(c, c)
                            for c in (d.get("columns") or [])
                        ],
                    }
                    for d in eq_dels
                ]
            df = apply_equality_deletes(df, proxied_entries, eq_dels)
            df = project_iceberg_logical(df, ice_renames, ice_dead)
            if ice_schema is not None:
                # inference-path scans can surface logical columns
                # out of declared order; the metadata order is
                # authoritative (positional INSERT depends on it)
                want = [f.name for f in ice_schema.fields]
                if set(want) == set(df.columns) and want != df.columns:
                    df = df.select(*want)
            return df
        if (
            ttype in (ETableType.HIVE, ETableType.UNPARTITIONED)
            and not self.config.explicit_file_lists
        ):
            # native path: let Spark list + partition-prune
            from pyspark.errors import AnalysisException

            reader = self.spark.read
            if ttype == ETableType.HIVE:
                reader = reader.option("basePath", tbl.location)
            try:
                return self._format_read(reader, tbl, tbl.location)
            except AnalysisException:
                # empty or missing location (UNABLE_TO_INFER_SCHEMA /
                # PATH_NOT_FOUND): fall through to the explicit path,
                # which emits the reference's empty-relation view.  Real
                # read failures (permissions, corrupt footers) are NOT
                # caught — silently returning 0 rows would hide them.
                return self._explicit_list_dataframe(tbl, query)
        return self._explicit_list_dataframe(tbl, query)

    def _explicit_list_dataframe(
        self, tbl: CatalogTable, query: str | None
    ) -> DataFrame:
        """Reference-style scan: pre-listed, pruned explicit file list.

        r14: when the query carries a partition predicate, the LISTING
        itself is prefix-pruned and parallel
        (:func:`~glue_table_cache_spark.listing.list_table_files_pruned`)
        — a disproved ``year=2023/`` prefix is never paged at all,
        removing the reference's sequential whole-prefix wall
        (/root/reference/src/util/s3.ts:34-58) for huge hive tables."""
        keys = [k.name for k in tbl.partition_keys]
        predicate = None
        if query and keys:
            predicate = extract_partition_predicate(
                query, keys, {tbl.name, tbl.qualified_name}
            )
            if isinstance(predicate, TruePredicate):
                predicate = None
        files, lstats = self._list_files_maybe_pruned(
            tbl, query, predicate
        )
        if not files:
            if lstats is not None and lstats.prefixes_pruned:
                # pruned-to-zero, not an empty table: empty relation
                # with the REAL schema, sampled from a pruned prefix
                from glue_table_cache_spark.listing import (
                    first_file_under,
                )

                sample = first_file_under(
                    lstats.first_pruned, fs=self._fs
                )
                if sample is not None:
                    df = self._format_read(
                        self.spark.read, tbl, sample
                    ).limit(0)
                    return self._attach_partition_columns(df, tbl)
            # view over an empty relation, as the reference emits
            # ``SELECT NULL LIMIT 0``
            # (/root/reference/src/sql-transformer.ts:320-322)
            return self.spark.range(0).select(F.lit(None).alias("null"))
        pruned = files
        if predicate is not None:
            if len(files) >= self.config.listing_df_threshold:
                pruned = self._prune_distributed(files, keys, predicate)
            else:
                pruned = prune_files(files, predicate)
        if len(pruned) > self.config.max_explicit_files:
            if tbl.table_type in (ETableType.HIVE, ETableType.UNPARTITIONED):
                # too many paths for one reader call: the native
                # directory scan is equivalent for these layouts and
                # scales via InMemoryFileIndex
                reader = self.spark.read
                if tbl.table_type == ETableType.HIVE:
                    reader = reader.option("basePath", tbl.location)
                return self._format_read(reader, tbl, tbl.location)
            raise GlueSparkError(
                f"Pruned file list for {tbl.qualified_name} has "
                f"{len(pruned)} files, over max_explicit_files="
                f"{self.config.max_explicit_files}; repartition the "
                "table or raise the limit"
            )
        if (
            query
            and pruned
            and self.config.footer_stats_skipping
            and (tbl.parameters.get("classification", "parquet"))
            == "parquet"
        ):
            # FOOTER zone-map skipping (opt-in): read each surviving
            # file's parquet footer and drop files whose row-group
            # min/max ranges provably cannot match the WHERE clause.
            # Footer reads are metadata-sized and parallelized; the
            # file count is already bounded by max_explicit_files
            from glue_table_cache_spark.skipping import (
                parquet_footer_stats,
            )

            with ThreadPoolExecutor(max_workers=32) as pool:
                stats = list(
                    pool.map(
                        lambda f: parquet_footer_stats(f.path),
                        pruned,
                    )
                )
            keep = self._stats_keep_set(
                query,
                tbl,
                {f.path: s for f, s in zip(pruned, stats)},
            )
            if keep is not None:
                pruned = [f for f in pruned if f.path in keep]
        if not pruned:
            # pruned-to-zero: empty relation with the real schema
            df = self._format_read(
                self.spark.read, tbl, files[0].path
            ).limit(0)
            return self._attach_partition_columns(df, tbl)
        paths = self._proxy([f.path for f in pruned])
        # basePath-driven partition discovery only works when EVERY file
        # sits under key=value dirs; a mixed layout (stray files missing
        # the key) makes Spark raise CONFLICTING_DIRECTORY_STRUCTURES.
        # Those tables fall back to regex attachment (missing → NULL),
        # matching the reference's extract-from-path posture.
        hive_layout = (
            tbl.table_type == ETableType.HIVE
            and not tbl.projection
            and all(
                all(k.name in f.partition_values for k in tbl.partition_keys)
                for f in pruned
            )
        )
        df = self._read_paths(
            paths, base_path=tbl.location if hive_layout else None, tbl=tbl
        )
        if not hive_layout:
            df = self._attach_partition_columns(df, tbl)
        return df

    def listing_dataframe(self, database: str, table: str) -> DataFrame:
        """The table's file listing as a DataFrame ``(path, <keys...>)``
        — the reference's ``<db>_<tbl>_s3_listing`` table
        (/root/reference/src/glue-table-cache.ts:292-306) as a
        first-class queryable frame."""
        tbl = self.get_table_metadata_cached(database, table)
        files = self.list_table_files_cached(tbl)
        keys = [k.name for k in tbl.partition_keys]
        return self._listing_df(files, keys)

    def _listing_df(self, files: list[FileInfo], keys: list[str]) -> DataFrame:
        schema = ", ".join(
            ["path string"] + [f"`{k}` string" for k in keys]
        )
        rows = [
            tuple([f.path] + [f.partition_values.get(k) for k in keys])
            for f in files
        ]
        return self.spark.createDataFrame(rows, schema)

    def _prune_distributed(
        self, files: list[FileInfo], keys: list[str], predicate
    ) -> list[FileInfo]:
        """Prune a large listing with a DataFrame filter instead of a
        per-file Python loop.  Same keep-on-Unknown semantics:
        ``coalesce(pred, TRUE)``."""
        df = self._listing_df(files, keys)
        keep = df.filter(
            F.coalesce(predicate_to_column(predicate), F.lit(True))
        )
        kept_paths = {r.path for r in keep.select("path").collect()}
        return [f for f in files if f.path in kept_paths]

    def read_batches(self, df: DataFrame, batch_size: int = 10):
        """Iterate a result in client-side batches of ``batch_size``
        rows — the reference's incremental ``streamAndRead``/``readUntil``
        consumption (/root/reference/example.ts:22-27, SURVEY §2.A17).
        Backed by ``toLocalIterator`` so only one partition is resident
        on the driver at a time."""
        batch: list = []
        for row in df.toLocalIterator():
            batch.append(row)
            if len(batch) >= batch_size:
                yield batch
                batch = []
        if batch:
            yield batch

    def _read_paths(
        self,
        paths: list[str],
        base_path: str | None,
        tbl: CatalogTable | None = None,
        schema=None,
    ) -> DataFrame:
        reader = self.spark.read
        if base_path:
            # explicit leaf files + basePath: Spark still derives hive
            # partition columns and prunes them at planning time
            reader = reader.option("basePath", base_path)
        if schema is not None:
            # metadata-authoritative scan schema (table formats):
            # skips inference and types evolved columns
            reader = reader.schema(schema)
        return self._format_read(reader, tbl, *paths)

    def _format_read(self, reader, tbl: CatalogTable | None, *paths) -> DataFrame:
        """Dispatch the scan on the table's ``classification`` catalog
        parameter — parquet (default, the reference's only format),
        csv, or json (our extension past the reference's future-work
        list, /root/reference/README.md:22-23).  CSV honors the Glue
        crawler's ``delimiter`` / ``skip.header.line.count``
        parameters; its schema is inferred (an extra pass — at real
        scale convert to parquet or cache the inferred schema)."""
        fmt = tbl.data_format if tbl is not None else "parquet"
        if fmt == "csv":
            params = tbl.parameters
            try:
                skip = int(params.get("skip.header.line.count", "0"))
            except ValueError:
                skip = 0
            if skip > 1:
                # Spark's csv header option can only drop ONE line per
                # file; silently ingesting the extra header lines as
                # data would corrupt every downstream result
                raise GlueSparkError(
                    f"skip.header.line.count={skip} not supported "
                    "(only 0 or 1); preprocess the files or use a "
                    "different classification"
                )
            return (
                reader.option("header", "true" if skip >= 1 else "false")
                .option("sep", params.get("delimiter", ","))
                .option("inferSchema", "true")
                .csv(list(paths))
            )
        if fmt == "json":
            return reader.json(list(paths))
        if fmt == "orc":
            return reader.orc(*paths)
        if fmt != "parquet":
            # an unrecognized classification must not silently scan
            # the files as parquet — a typo'd or unsupported format
            # (avro, grok, ...) would die mid-query or, worse, return
            # garbage rows
            name = (
                tbl.qualified_name if tbl is not None else "<table>"
            )
            raise GlueSparkError(
                f"{name}: classification={fmt!r} is not supported "
                "(parquet, orc, csv, json); fix the catalog "
                "parameter or convert the data"
            )
        return reader.parquet(*paths)

    def _attach_partition_columns(
        self, df: DataFrame, tbl: CatalogTable
    ) -> DataFrame:
        """For non-hive layouts (partition projection) attach partition
        columns by regex over the file path — distributed, no driver loop
        (extractors ported from /root/reference/src/util/glue.ts:136-175)."""
        path_col = F.col("_metadata.file_path")
        for ex in extractors_for(tbl.partition_keys, tbl.projection):
            if ex.column not in df.columns:
                df = df.withColumn(ex.column, ex.spark_column(path_col))
        return df

    @staticmethod
    def _hudi_prune_keys(
        tbl: CatalogTable, pvs: list[dict]
    ) -> list[str]:
        """Partition keys for Hudi timeline-metadata pruning: the
        catalog's when registered, else the key names the write
        stats' partition paths themselves carry (``k=v`` segments) —
        so a Hudi entry registered without PartitionKeys (the common
        Glue shape) still prunes from the log, mirroring the
        Delta/Iceberg branches.  Identity semantics only: the path
        value IS the column value in hive-style layouts."""
        keys = [k.name for k in tbl.partition_keys]
        if keys:
            return keys
        seen: set[str] = set()
        for pv in pvs:
            seen.update(pv.keys())
        return sorted(seen)

    def _refuse_misclassified_format(self, tbl: CatalogTable) -> None:
        """Defense-in-depth for MISREGISTERED table-format locations: a
        Glue entry whose parameters lost the Delta/Hudi/Iceberg markers
        (a crawler that never set ``spark.sql.sources.provider``, a
        hand-registered table) would silently scan the directory as raw
        parquet — reading every historical file, so deleted rows
        resurrect and compacted rows DUPLICATE.  Three metadata-scale
        existence checks catch it and refuse with the registration fix;
        ``misclassified_format_guard=False`` opts out for an
        intentional raw scan.  Local filesystems only (object-store
        marker probes would need per-scheme clients; the format
        branches themselves never need this guard).  Cached with the
        listing TTL so repeat queries pay nothing."""
        loc = tbl.location
        if "://" in loc and not loc.startswith("file:"):
            return
        key = f"format-guard:{loc}"
        hit = self._listing_cache.get_or_load(
            key, lambda: self._format_markers(loc)
        )
        if hit:
            marker, fix = hit
            raise GlueSparkError(
                f"glue.{tbl.database}.{tbl.name} is registered as "
                f"{tbl.table_type.name} but {loc!r} contains "
                f"{marker} — scanning it as raw parquet would read "
                "every historical file (deleted rows resurrect, "
                f"rewritten rows duplicate).  Register it with {fix}, "
                "or set misclassified_format_guard=False to force a "
                "raw scan"
            )

    @staticmethod
    def _format_markers(loc: str):
        from pathlib import Path

        base = Path(loc[len("file:"):] if loc.startswith("file:") else loc)
        if any((base / "_delta_log").glob("*.json")) or any(
            (base / "_delta_log").glob("*.checkpoint*.parquet")
        ):
            return (
                "a Delta transaction log (_delta_log/)",
                "classification=delta or "
                "spark.sql.sources.provider=delta",
            )
        if (base / ".hoodie").is_dir():
            return (
                "a Hudi timeline (.hoodie/)",
                "hoodie.table.name=<name> or classification=hudi",
            )
        if any((base / "metadata").glob("*.metadata.json")):
            return (
                "Iceberg metadata (metadata/*.metadata.json)",
                "table_type=ICEBERG",
            )
        return None

    def _attach_iceberg_partition_values(
        self,
        df: DataFrame,
        path_pvs: list[tuple[str, dict]],
        keys: list[str],
        ice_types: dict,
        tbl: CatalogTable,
    ) -> DataFrame:
        """Attach identity partition columns a leaf-file Iceberg scan
        lost.  The MANIFEST partition tuple is the authority (the spec
        stores one per data file; it survives OPTIMIZE moving files
        out of ``k=v`` directories), broadcast-joined on the
        scheme-normalized file path — metadata-scale build side, so
        the join never shuffles the scan.  A hive-style ``k=v`` path
        extraction backstops files whose manifests carried no
        partition tuple; values cast to the metadata schema's type."""
        from pyspark.sql.types import StringType, StructField, StructType

        from glue_table_cache_spark.sources.iceberg import _strip_scheme

        from glue_table_cache_spark.sources.delta import (
            hadoop_uri_encode,
        )

        pv_cols = [f"__pv_{i}" for i in range(len(keys))]
        rows = [
            # manifest paths are on-disk spellings; the scan-side key
            # is _metadata-derived (Hadoop-URI-encoded: % → %25)
            (hadoop_uri_encode(p),) + tuple(pv.get(k) for k in keys)
            for p, pv in path_pvs
        ]
        pv_schema = StructType(
            [StructField("__pv_path", StringType(), False)]
            + [StructField(c, StringType(), True) for c in pv_cols]
        )
        pvdf = (
            self.spark.createDataFrame(rows, pv_schema)
            .withColumn("__pv_path", _strip_scheme(F.col("__pv_path")))
        )
        extractors = {
            ex.column: ex
            for ex in extractors_for(tbl.partition_keys, tbl.projection)
        }
        df = df.withColumn(
            "__pv_key", _strip_scheme(F.col("_metadata.file_path"))
        ).join(
            F.broadcast(pvdf),
            F.col("__pv_key") == F.col("__pv_path"),
            "left",
        )
        for k, c in zip(keys, pv_cols):
            value = F.col(c)
            if k in extractors:
                # ``k=v`` path segments survive scheme normalization,
                # and ``__pv_key`` stays resolvable after the join
                # where the hidden ``_metadata`` column may not
                value = F.coalesce(
                    value, extractors[k].spark_column(F.col("__pv_key"))
                )
            if k in ice_types:
                value = value.cast(ice_types[k])
            df = df.withColumn(k, value)
        return df.drop("__pv_key", "__pv_path", *pv_cols)

    def _proxy(self, paths: list[str]) -> list[str]:
        """``s3://`` → proxy-address rewrite
        (/root/reference/src/glue-table-cache.ts:235-238)."""
        proxy = self.config.proxy_address
        if not proxy:
            return paths
        return [p.replace("s3://", proxy, 1) for p in paths]

    def _list_files(
        self, tbl: CatalogTable, predicate=None, stats=None
    ) -> list[FileInfo]:
        extractors = extractors_for(tbl.partition_keys, tbl.projection)
        if predicate is None:
            fs = self._fs or filesystem_for(tbl.location)
            return list_table_files(tbl.location, extractors, fs)
        # pass the INJECTED fs only (None = default): the pruned walk
        # must know whether it may rebuild the filesystem on the
        # executors (default) or keep every stage on the caller's fs
        return list_table_files_pruned(
            tbl.location,
            extractors,
            predicate,
            self._fs,
            stats=stats,
            spark=self.spark,
        )
