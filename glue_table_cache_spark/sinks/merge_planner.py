"""Clause evaluation for the general (column-level) MERGE grammar.

Shared between the Delta and Iceberg merge writers: given the tagged
target rows and the source, this module plans

* the per-row CHOSEN clause (one chained ``F.when`` over the clause
  list in statement order — first match wins, whole-stage codegen,
  no UDFs anywhere);
* the transformed target-side output rows (update clauses apply their
  SET expressions, ``SET *`` copies the source row, delete clauses
  drop the row, unchosen rows pass through unchanged);
* the insert rows for ``WHEN NOT MATCHED`` clauses (source rows that
  matched no target key, first-true clause wins, ``INSERT *`` or an
  explicit column list with NULL-filled gaps);
* the action counts, from ONE small aggregation over the chosen
  index.

Naming contract (set up by :func:`join_source`): the joined frame
carries the target columns BARE and every source column as
``__src_<name>`` plus a ``__src_matched`` marker — exactly the names
the parser's qualifier rewrite produces
(:func:`glue_table_cache_spark.dml._rewrite_merge_expr`), so clause
conditions and SET expressions evaluate directly with ``F.expr``.

Reference semantics parity: the clause surface mirrors the public
MERGE dialect (Delta/SQL:2003 MERGE with Databricks' NOT MATCHED BY
SOURCE extension); the reference engine itself has no DML surface
(/root/reference/src/types.ts:4-11 enumerates formats it never
writes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from glue_table_cache_spark.errors import GlueSparkError

#: chosen-index sentinel for "no clause matched — keep the row"
KEEP = -1


def validate_clauses(clauses, t_cols, src_cols, keys) -> None:
    """Static checks before any job runs: SET targets and INSERT
    column lists must name table columns; ``SET *`` / ``INSERT *``
    need the source to cover the table schema."""
    tset = set(t_cols)
    for cl in clauses:
        if cl.action == "update" and cl.set_exprs is not None:
            unknown = [c for c, _e in cl.set_exprs if c not in tset]
            if unknown:
                raise GlueSparkError(
                    f"MERGE UPDATE SET names unknown column(s) "
                    f"{unknown}; table columns are {sorted(tset)}"
                )
        if cl.action == "update" and cl.set_exprs is None:
            missing = [c for c in t_cols if c not in src_cols]
            if missing:
                raise GlueSparkError(
                    f"MERGE UPDATE SET * needs every table column in "
                    f"the source; missing {missing}"
                )
        if cl.action == "insert":
            cols = cl.insert_cols or tuple(t_cols)
            unknown = [c for c in cols if c not in tset]
            if unknown:
                raise GlueSparkError(
                    f"MERGE INSERT names unknown column(s) "
                    f"{unknown}; table columns are {sorted(tset)}"
                )
            if cl.insert_cols is None:
                missing = [c for c in t_cols if c not in src_cols]
                if missing:
                    raise GlueSparkError(
                        f"MERGE INSERT * needs every table column in "
                        f"the source; missing {missing}"
                    )
            missing_keys = [k for k in keys if k not in cols]
            if missing_keys:
                raise GlueSparkError(
                    f"MERGE INSERT omits the ON key column(s) "
                    f"{missing_keys} — inserted rows would be "
                    "unreachable by the next merge"
                )


def join_source(
    tagged: DataFrame, source: DataFrame, keys: list[str]
) -> DataFrame:
    """Left-join the source onto the tagged target rows: target
    columns stay bare, source columns arrive as ``__src_<name>``,
    and ``__src_matched`` marks rows with a source partner.  No
    forced broadcast — the source can be corpus-scale; AQE picks the
    strategy."""
    src_pref = source.select(
        *[F.col(c).alias(f"__src_{c}") for c in source.columns]
    ).withColumn("__src_matched", F.lit(True))
    cond = None
    for k in keys:
        # standard SQL equality, NOT eqNullSafe: a NULL key never
        # matches (the MERGE ON contract — a NULL-keyed source row
        # falls through to the NOT MATCHED group)
        c = tagged[k] == F.col(f"__src_{k}")
        cond = c if cond is None else (cond & c)
    out = tagged.join(src_pref, cond, "left")
    return out.withColumn(
        "__src_matched",
        F.coalesce(F.col("__src_matched"), F.lit(False)),
    )


def chosen_column(clauses):
    """The per-row chosen clause index over the TARGET side (matched
    and NOT MATCHED BY SOURCE groups), in statement order — first
    true wins, ``KEEP`` when none applies."""
    expr = None
    for i, cl in enumerate(clauses):
        if cl.when == "matched":
            guard = F.col("__src_matched")
        elif cl.when == "not_matched_by_source":
            guard = ~F.col("__src_matched")
        else:
            continue
        if cl.condition is not None:
            guard = guard & F.coalesce(
                F.expr(cl.condition), F.lit(False)
            )
        expr = (F.when if expr is None else expr.when)(
            guard, F.lit(i)
        )
    return (
        expr.otherwise(F.lit(KEEP))
        if expr is not None
        else F.lit(KEEP)
    )


def action_indexes(clauses, *actions, side: str = "target"):
    """Clause indexes with one of ``actions`` on the given side."""
    groups = (
        ("matched", "not_matched_by_source")
        if side == "target"
        else ("not_matched",)
    )
    return [
        i
        for i, cl in enumerate(clauses)
        if cl.when in groups and cl.action in actions
    ]


def target_outputs(
    joined: DataFrame, clauses, t_cols: list[str], extra=()
) -> DataFrame:
    """Rows the target side contributes to the rewrite: delete-chosen
    rows dropped, update-chosen rows transformed (every SET
    expression sees PRE-update values — one simultaneous projection),
    everything else unchanged.  ``joined`` must already carry
    ``__chosen``.  ``extra`` columns pass through untouched."""
    del_idx = action_indexes(clauses, "delete")
    upd_idx = action_indexes(clauses, "update")
    kept = (
        joined.where(~F.col("__chosen").isin(del_idx))
        if del_idx
        else joined
    )
    out_cols = []
    for c in t_cols:
        dt = joined.schema[c].dataType
        e = None
        for i in upd_idx:
            cl = clauses[i]
            if cl.set_exprs is None:
                v = F.col(f"__src_{c}")
            else:
                d = dict(cl.set_exprs)
                v = F.expr(d[c]) if c in d else F.col(c)
            e = (F.when if e is None else e.when)(
                F.col("__chosen") == i, v.cast(dt)
            )
        out_cols.append(
            (e.otherwise(F.col(c)) if e is not None else F.col(c))
            .alias(c)
        )
    return kept.select(*extra, *out_cols)


def insert_outputs(
    source: DataFrame,
    target_keys: DataFrame,
    keys: list[str],
    clauses,
    t_cols: list[str],
    t_schema,
) -> DataFrame | None:
    """Rows the NOT MATCHED clauses insert: source rows with no
    target key partner, first-true clause wins, values from the
    clause's column list (NULL-filled gaps) or the whole source row.
    Returns None when the statement has no insert clause.  The frame
    exposes source columns both bare and ``__src_``-prefixed, so
    conditions written either way resolve."""
    nm = [
        (i, cl)
        for i, cl in enumerate(clauses)
        if cl.when == "not_matched"
    ]
    if not nm:
        return None
    base = source.join(target_keys, keys, "left_anti")
    both = base.select(
        "*", *[F.col(c).alias(f"__src_{c}") for c in base.columns]
    )
    expr = None
    for i, cl in nm:
        guard = (
            F.coalesce(F.expr(cl.condition), F.lit(False))
            if cl.condition is not None
            else F.lit(True)
        )
        expr = (F.when if expr is None else expr.when)(
            guard, F.lit(i)
        )
    picked = both.withColumn(
        "__chosen", expr.otherwise(F.lit(KEEP))
    ).where(F.col("__chosen") != KEEP)
    out_cols = []
    for c in t_cols:
        dt = t_schema[c].dataType
        e = None
        for i, cl in nm:
            if cl.insert_cols is None:
                v = F.col(f"__src_{c}")
            else:
                m = dict(zip(cl.insert_cols, cl.insert_vals))
                v = (
                    F.expr(m[c])
                    if c in m
                    else F.lit(None)
                )
            e = (F.when if e is None else e.when)(
                F.col("__chosen") == i, v.cast(dt)
            )
        out_cols.append(e.alias(c))
    return picked.select(*out_cols)


def target_counts(joined_chosen: DataFrame, clauses) -> dict:
    """``{"updated": n, "deleted": n, "files": [paths...]}`` from ONE
    aggregation over the chosen index (plus the affected-file list
    when the frame carries ``__f``) — the only thing the driver ever
    collects is per-file/per-clause tallies, never rows."""
    has_f = "__f" in joined_chosen.columns
    agg = (
        joined_chosen.where(F.col("__chosen") != KEEP)
        .groupBy(*([F.col("__f")] if has_f else []), "__chosen")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    upd = set(action_indexes(clauses, "update"))
    n_updated = n_deleted = 0
    files = set()
    for r in agg:
        if has_f:
            files.add(r["__f"])
        if int(r["__chosen"]) in upd:
            n_updated += int(r["__n"])
        else:
            n_deleted += int(r["__n"])
    return {
        "updated": n_updated,
        "deleted": n_deleted,
        "files": sorted(files),
    }
