"""Incremental corpus ingestion: process only NEW data, dedup against
everything ever seen.

Beyond-reference extension.  A training-data pipeline over a growing
lake cannot re-curate 100 TB per ingest; the scalable loop is

    change feed → new files only → dedup vs a persistent fingerprint
    store → curate the survivors → append their fingerprints

Three pieces, all declarative DataFrame transforms:

* a FINGERPRINT STORE — a parquet directory of ``(bucket, fp)`` rows,
  one per document ever accepted, hash-bucketed so the dedup
  anti-join shuffles both sides on the same key and a bucket-pruned
  read touches only matching buckets.  Per-ingest growth is appended,
  never rewritten (object-store friendly);
* :func:`incremental_dedup` — drop new docs whose exact fingerprint
  is already in the store (cross-batch exact dedup; near-dup WITHIN
  the batch stays ``curate()``'s job);
* :func:`incremental_ingest` — the loop body composed with the Delta
  change feed: remember ``last_version`` in a state file, feed only
  files added since, dedup against the store, ``curate()``, append
  fingerprints, advance the state.  Crash-safe ordering: fingerprints
  are appended only AFTER the curated output is materialized, and the
  state file is written LAST, so a crash anywhere re-processes (at
  least once) instead of losing data; re-processing is harmless
  because the store anti-join drops the already-accepted docs.

At 100 TB the store is orders of magnitude smaller than the corpus
(16 bytes/doc) and the anti-join is one co-partitioned shuffle; no
driver-side state grows with corpus size.
"""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_N_BUCKETS = 256


def doc_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(bucket, fp, <id_col>)`` per document: xxhash64 of the
    whitespace-normalized text (the exact-dedup normalization), hash-
    bucketed for store layout."""
    fp = F.xxhash64(
        F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    )
    return docs.select(
        F.pmod(fp, F.lit(_N_BUCKETS)).cast("int").alias("bucket"),
        fp.alias("fp"),
        F.col(id_col),
    )


def incremental_dedup(
    docs: DataFrame,
    store_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Docs whose fingerprint is NOT in the store (first occurrence
    across all past ingests) and not repeated within the batch.

    Plan shape: both sides hash on ``(bucket, fp)`` — the store is
    written bucket-partitioned, so the anti-join build side reads only
    the buckets present in the batch (partition pruning on the store
    scan) and broadcasts when small."""
    fps = doc_fingerprints(docs, text_col, id_col)
    # in-batch first occurrence (deterministic: lowest id wins)
    from pyspark.sql.window import Window

    w = Window.partitionBy("bucket", "fp").orderBy(F.col(id_col))
    firsts = (
        fps.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    store = _read_store(docs.sparkSession, store_dir)
    if store is not None:
        firsts = firsts.join(store, ["bucket", "fp"], "left_anti")
    return docs.join(
        firsts.select(id_col), [id_col], "left_semi"
    )


def _read_store(spark, store_dir: str) -> DataFrame | None:
    if not any(Path(store_dir).glob("bucket=*")):
        return None
    return spark.read.option("basePath", store_dir).parquet(
        f"{store_dir}/bucket=*"
    ).select("bucket", "fp")


def append_fingerprints(
    docs: DataFrame,
    store_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append the docs' fingerprints to the store (bucket-partitioned
    parquet, append mode — no rewrite of existing buckets' files)."""
    (
        doc_fingerprints(docs, text_col, id_col)
        .select("bucket", "fp")
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(store_dir)
    )


@dataclass
class IngestResult:
    new_files: list[str]
    docs_in: int
    docs_fresh: int
    docs_kept: int
    last_version: int


def incremental_ingest(
    spark,
    location: str,
    state_dir: str,
    curation_config=None,
    output_dir: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> IngestResult:
    """One turn of the incremental loop over a Delta-format corpus:

    1. read ``state_dir/state.json`` (``last_version``, -1 on first
       run) and ask :func:`delta_changes` for files added since;
    2. read ONLY those files; :func:`incremental_dedup` against the
       fingerprint store at ``state_dir/fingerprints``;
    3. ``curate()`` the survivors (skipped when ``curation_config``
       is None); write to ``output_dir`` when given (the
       materialization point);
    4. append the KEPT docs' fingerprints, then advance the state
       file — the last step, so any crash re-processes at-least-once
       and the store anti-join keeps that idempotent."""
    from glue_table_cache_spark.operators.pipeline import curate
    from glue_table_cache_spark.sources.delta import delta_changes

    state_path = Path(state_dir) / "state.json"
    store_dir = str(Path(state_dir) / "fingerprints")
    last = -1
    if state_path.exists():
        last = json.loads(state_path.read_text())["last_version"]
    latest, added, _removed = delta_changes(location, last)
    if not added:
        return IngestResult([], 0, 0, 0, latest)
    batch = spark.read.parquet(*added)
    n_in = batch.count()
    fresh = incremental_dedup(batch, store_dir, text_col, id_col)
    kept = (
        curate(fresh, curation_config)
        if curation_config is not None
        else fresh
    )
    if output_dir:
        kept.write.mode("append").parquet(output_dir)
    n_fresh = fresh.count()
    n_kept = kept.count()
    append_fingerprints(kept, store_dir, text_col, id_col)
    Path(state_dir).mkdir(parents=True, exist_ok=True)
    state_path.write_text(json.dumps({"last_version": latest}))
    return IngestResult(added, n_in, n_fresh, n_kept, latest)


def apply_changes(
    engine,
    target: str,
    changes: DataFrame,
    keys: list[str],
    sequence_col: str = "_commit_version",
    change_type_col: str = "_change_type",
    stored_as_scd_type: int = 1,
):
    """APPLY CHANGES INTO — the row-level CDC-apply primitive (the
    public DLT verb): net a changelog (``table_changes()`` output or
    any frame carrying ``_change_type`` + a sequence column) down to
    its LATEST action per key, then land it on ``target`` (a
    ``glue.db.t`` reference of ANY writable format) with ONE general
    MERGE — deletes remove, the rest upsert.  Cross-format CDC: a
    Delta table's change feed replays onto a Hudi or Iceberg twin.

    Netting is one ``max_by(struct(sequence, priority), ...)``
    aggregation (no window, map-side partial): within a version,
    ``update_postimage`` outranks ``insert`` outranks ``delete``
    outranks ``update_preimage`` — the CDF pairs net to the
    post-state.  Out-of-order replays are safe: the sequence column
    decides, not arrival order.

    ``stored_as_scd_type=2`` keeps HISTORY instead (the public APPLY
    CHANGES INTO surface): the target carries ``__START_AT`` /
    ``__END_AT`` columns; each upsert opens a new version row and
    closes the previous one at its sequence, a delete closes without
    inserting.  Convergent under replay AND cross-batch late data:
    the affected keys' existing version rows are decompiled back into
    actions (a version = an upsert at ``__START_AT``; an ``__END_AT``
    no other version starts at = a delete there), merged with the
    batch's actions, and the full history is recomputed and landed
    with ONE general MERGE keyed on ``(keys..., __START_AT)`` — so
    replaying any window, in any order, converges to the same
    history.

    Returns the MERGE metrics row.  Scale: the netting aggregation
    shuffles once on the keys and the general merge planner takes it
    from there (no driver-side rows)."""
    from pyspark.sql import functions as F

    data_cols = [
        c
        for c in changes.columns
        if c not in (sequence_col, change_type_col)
    ]
    missing = [k for k in keys if k not in data_cols]
    if missing:
        raise ValueError(
            f"apply_changes keys {missing} are not in the changelog "
            f"columns {changes.columns}"
        )
    if stored_as_scd_type == 2:
        return _apply_changes_scd2(
            engine, target, changes, keys, data_cols,
            sequence_col, change_type_col,
        )
    if stored_as_scd_type != 1:
        raise ValueError(
            f"stored_as_scd_type must be 1 or 2, got "
            f"{stored_as_scd_type!r}"
        )
    prio = (
        F.when(F.col(change_type_col) == "update_postimage", 3)
        .when(F.col(change_type_col) == "insert", 2)
        .when(F.col(change_type_col) == "delete", 1)
        .otherwise(0)  # update_preimage: pre-state, never applied
    )
    # the ORDERING struct carries only (sequence, priority) — data
    # columns stay in the value side, so non-orderable column types
    # (maps) survive the aggregation; rows tied on both are duplicate
    # actions of the same kind and either payload is acceptable
    order = F.struct(
        F.col(sequence_col).alias("__seq"),
        prio.alias("__prio"),
    )
    payload = F.struct(
        (F.col(change_type_col) == "delete").alias("__is_delete"),
        *[F.col(c) for c in data_cols],
    )
    latest = (
        changes.where(F.col(change_type_col) != "update_preimage")
        .groupBy(*keys)
        .agg(F.max_by(payload, order).alias("__w"))
        .select(
            F.col("__w.__is_delete").alias("__is_delete"),
            *[F.col(f"__w.{c}").alias(c) for c in data_cols],
        )
    )
    view = f"__cdc_apply_{uuid.uuid4().hex[:8]}"
    # GLOBAL temp view: inside a foreachBatch the changelog belongs
    # to the micro-batch session while the engine runs on the main
    # one — global_temp is the documented cross-session bridge
    latest.createOrReplaceGlobalTempView(view)
    try:
        on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        sets = ", ".join(
            f"{c} = s.{c}" for c in data_cols if c not in keys
        ) or ", ".join(f"{k} = s.{k}" for k in keys)
        cols = ", ".join(data_cols)
        vals = ", ".join(f"s.{c}" for c in data_cols)
        return engine.sql(
            f"MERGE INTO {target} t "
            f"USING global_temp.{view} s ON {on} "
            f"WHEN MATCHED AND s.__is_delete THEN DELETE "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED AND NOT s.__is_delete "
            f"THEN INSERT ({cols}) VALUES ({vals})"
        ).first()
    finally:
        latest.sparkSession.catalog.dropGlobalTempView(view)


def _apply_changes_scd2(
    engine,
    target: str,
    changes: DataFrame,
    keys: list[str],
    data_cols: list[str],
    sequence_col: str,
    change_type_col: str,
) -> "object":
    """SCD Type 2 apply (see :func:`apply_changes`).  Shape:

    1. net the batch to one action per ``(key, sequence)`` — the same
       ``max_by`` priority netting as Type 1, but per sequence point
       (history keeps every version, not just the latest);
    2. decompile the target's existing version rows FOR THE AFFECTED
       KEYS back into actions: each version is an upsert at its
       ``__START_AT``; an ``__END_AT`` that no sibling version starts
       at records a delete at that sequence.  History is a complete
       record, so this inversion is exact;
    3. recompute each key's history with one ``lead()`` window over
       the unioned actions (batch wins a same-sequence collision);
    4. land with ONE general MERGE on ``(keys..., __START_AT)`` —
       pure upsert, no NOT-MATCHED-BY-SOURCE clause needed because
       the recomputed history is a superset of the existing rows.

    The single shuffle beyond the MERGE is the per-key window — the
    minimum any versioned-history computation needs."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    tgt = engine.sql(f"SELECT * FROM {target}")
    for c in ("__START_AT", "__END_AT"):
        if c not in tgt.columns:
            raise ValueError(
                f"SCD Type 2 target {target} lacks the history "
                f"column {c!r} — create it with the data columns "
                "plus __START_AT/__END_AT"
            )
    prio = (
        F.when(F.col(change_type_col) == "update_postimage", 3)
        .when(F.col(change_type_col) == "insert", 2)
        .when(F.col(change_type_col) == "delete", 1)
        .otherwise(0)
    )
    payload = F.struct(
        (F.col(change_type_col) == "delete").alias("__is_delete"),
        *[F.col(c) for c in data_cols],
    )
    batch = (
        changes.where(F.col(change_type_col) != "update_preimage")
        .groupBy(
            *keys, F.col(sequence_col).alias("__seq")
        )
        .agg(F.max_by(payload, prio).alias("__w"))
        .select(
            *keys,
            "__seq",
            F.lit(1).alias("__rank"),  # batch wins collisions
            F.col("__w.__is_delete").alias("__is_delete"),
            *[
                F.col(f"__w.{c}").alias(c)
                for c in data_cols
                if c not in keys
            ],
        )
    )
    non_keys = [c for c in data_cols if c not in keys]
    aff = tgt.join(
        batch.select(*keys).distinct(), keys, "left_semi"
    )
    exist_up = aff.select(
        *keys,
        F.col("__START_AT").alias("__seq"),
        F.lit(0).alias("__rank"),
        F.lit(False).alias("__is_delete"),
        *non_keys,
    )
    types = {f.name: f.dataType for f in tgt.schema.fields}
    exist_del = (
        aff.where(F.col("__END_AT").isNotNull())
        .select(*keys, F.col("__END_AT").alias("__seq"))
        .join(
            aff.select(*keys, F.col("__START_AT").alias("__seq")),
            [*keys, "__seq"],
            "left_anti",
        )
        .select(
            *keys,
            "__seq",
            F.lit(0).alias("__rank"),
            F.lit(True).alias("__is_delete"),
            *[
                F.lit(None).cast(types[c]).alias(c)
                for c in non_keys
            ],
        )
    )
    acts = batch.unionByName(exist_up).unionByName(exist_del)
    # same-sequence collision: the batch's action wins, then priority
    # (a delete yields to the upsert that replaced it on replay)
    netted = (
        acts.groupBy(*keys, "__seq")
        .agg(
            F.max_by(
                F.struct("__is_delete", *non_keys),
                F.struct(
                    "__rank",
                    F.when(F.col("__is_delete"), 1)
                    .otherwise(3)
                    .alias("__prio"),
                ),
            ).alias("__w")
        )
        .select(
            *keys,
            "__seq",
            F.col("__w.__is_delete").alias("__is_delete"),
            *[F.col(f"__w.{c}").alias(c) for c in non_keys],
        )
    )
    w = Window.partitionBy(*keys).orderBy("__seq")
    hist = (
        netted.withColumn("__end", F.lead("__seq").over(w))
        .where(~F.col("__is_delete"))
        .select(
            *keys,
            *non_keys,
            F.col("__seq").alias("__START_AT"),
            F.col("__end").alias("__END_AT"),
        )
    )
    # versions the recomputation RETIRES (a batch delete replacing
    # the action that had opened them): they exist in the target but
    # not in the recomputed history — ship them as kill rows so the
    # one MERGE removes them (the recomputed history is NOT always a
    # superset of the existing rows)
    kills = (
        aff.select(*keys, "__START_AT")
        .join(
            hist.select(*keys, "__START_AT"),
            [*keys, "__START_AT"],
            "left_anti",
        )
        .select(
            *keys,
            *[F.lit(None).cast(types[c]).alias(c) for c in non_keys],
            F.col("__START_AT"),
            F.lit(None).cast(types["__END_AT"]).alias("__END_AT"),
            F.lit(True).alias("__kill"),
        )
    )
    src = hist.withColumn("__kill", F.lit(False)).unionByName(kills)
    view = f"__cdc_scd2_{uuid.uuid4().hex[:8]}"
    src.createOrReplaceGlobalTempView(view)
    try:
        on = " AND ".join(
            [f"t.{k} = s.{k}" for k in keys]
            + ["t.__START_AT = s.__START_AT"]
        )
        set_cols = non_keys + ["__END_AT"]
        sets = ", ".join(f"{c} = s.{c}" for c in set_cols)
        ins_cols = [*keys, *non_keys, "__START_AT", "__END_AT"]
        cols = ", ".join(ins_cols)
        vals = ", ".join(f"s.{c}" for c in ins_cols)
        return engine.sql(
            f"MERGE INTO {target} t "
            f"USING global_temp.{view} s ON {on} "
            f"WHEN MATCHED AND s.__kill THEN DELETE "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED AND NOT s.__kill "
            f"THEN INSERT ({cols}) VALUES ({vals})"
        ).first()
    finally:
        src.sparkSession.catalog.dropGlobalTempView(view)
