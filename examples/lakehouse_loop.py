"""Runnable end-to-end demo: the lakehouse maintenance loop.

    python examples/lakehouse_loop.py [sf_dir] [work_dir]

Flow — every step is a round-5 primitive of this repo:

1. simulate a many-small-file ingest: 8 appends of `orders` slices
   through the atomic Delta writer (each with footer-derived stats);
2. query through the engine — zone-map skipping prunes files straight
   from the log's add.stats;
3. OPTIMIZE ZORDER BY (o_custkey, o_totalprice): one dataChange:false
   commit; selective predicates on EITHER column now scan ~1 file;
4. checkpoint the log + clean the covered commits (round 6): the
   engine scan then reconstructs from ONE parquet snapshot instead of
   replaying every JSON commit;
5. VACUUM (retention 0 for the demo) removes the rewritten originals;
6. the file-level change feed shows what a downstream incremental
   consumer would re-process — and the `delta_lite` streaming source
   (round 6) tails the same table into a downstream Delta table
   exactly-once via the SetTransaction sink;
7. the same curated output is also published to Iceberg and Hudi via
   their writers and read back through the engine.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from glue_table_cache_spark import GlueSparkEngine
from glue_table_cache_spark.catalog import LocalMetadataStore
from glue_table_cache_spark.io import read_table
from glue_table_cache_spark.session import build_session
from glue_table_cache_spark.sinks.delta_optimize import (
    optimize_delta,
    vacuum_delta,
)
from glue_table_cache_spark.sinks.delta_write import write_delta_append
from glue_table_cache_spark.sinks.hudi_write import write_hudi_append
from glue_table_cache_spark.sinks.iceberg_write import (
    write_iceberg_append,
)
from glue_table_cache_spark.sources.delta import delta_changes


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/lakehouse_loop")
    shutil.rmtree(work, ignore_errors=True)
    spark = build_session(app_name="lakehouse-loop")
    spark.sparkContext.setLogLevel("ERROR")

    orders = read_table(spark, sf_dir, "orders")
    loc = str(work / "orders_delta")
    for i in range(8):
        write_delta_append(
            orders.where(f"o_orderkey % 8 = {i}").coalesce(1), loc
        )
    print(f"ingested 8 small-file versions into {loc}")

    store = LocalMetadataStore()
    store.register_parquet_dir(
        "lake", "orders", loc,
        parameters={"spark.sql.sources.provider": "delta"},
    )
    eng = GlueSparkEngine(spark, store)
    q = "SELECT count(*) AS n FROM glue.lake.orders WHERE o_totalprice < 50000"
    probe = eng.sql(
        "SELECT o_orderkey FROM glue.lake.orders WHERE o_totalprice < 50000"
    )
    print(
        f"pre-optimize: {eng.sql(q).collect()[0].n} rows, "
        f"{len(probe.inputFiles())}/8 files scanned (log-stats skipping)"
    )

    v = optimize_delta(
        spark, loc, zorder_by=["o_custkey", "o_totalprice"]
    )
    eng.invalidate_table("lake", "orders")  # see the new version now
    probe = eng.sql(
        "SELECT o_orderkey FROM glue.lake.orders WHERE o_totalprice < 50000"
    )
    print(
        f"post-optimize v{v}: {eng.sql(q).collect()[0].n} rows, "
        f"{len(probe.inputFiles())} file(s) scanned"
    )

    from glue_table_cache_spark.sinks.delta_checkpoint import (
        clean_delta_log,
        write_delta_checkpoint,
    )

    cp = write_delta_checkpoint(loc)
    cleaned = clean_delta_log(loc, retention_hours=0, dry_run=False)
    eng.invalidate_table("lake", "orders")
    print(
        f"checkpointed v{cp}, cleaned {len(cleaned)} covered commits; "
        f"scan from checkpoint: {eng.sql(q).collect()[0].n} rows"
    )

    removed = vacuum_delta(loc, retention_hours=0, dry_run=False)
    print(f"vacuum removed {len(removed)} unreferenced files")

    # round 6: row-level CRUD + SQL time travel.  DELETE publishes a
    # deletion vector (no file rewritten); UPDATE rewrites only the
    # files holding a match; VERSION AS OF reads the pre-change state.
    from glue_table_cache_spark.sinks.delta_delete import (
        delete_from_delta,
    )
    from glue_table_cache_spark.sinks.delta_merge import update_delta

    dv_version, n_del = delete_from_delta(
        spark, loc, "o_orderkey % 97 = 0"
    )
    up_version, n_upd = update_delta(
        spark, loc, "o_orderkey % 13 = 1",
        {"o_orderpriority": "'5-LOW'"},
    )
    eng.invalidate_table("lake", "orders")
    now_n = eng.sql(
        "SELECT count(*) AS n FROM glue.lake.orders"
    ).collect()[0].n
    then_n = eng.sql(
        "SELECT count(*) AS n FROM glue.lake.orders "
        f"VERSION AS OF {dv_version - 1}"
    ).collect()[0].n
    print(
        f"DELETE v{dv_version} masked {n_del} rows via a deletion "
        f"vector, UPDATE v{up_version} touched {n_upd}; "
        f"now {now_n} rows vs {then_n} at VERSION AS OF "
        f"{dv_version - 1}"
    )

    latest, added, gone = delta_changes(loc, since_version=cp)
    print(
        f"change feed since v{cp}: +{len(added)} / -{len(gone)} files "
        f"(latest v{latest})"
    )

    # round 7: the SQL write surface.  A zero-copy SHALLOW CLONE makes
    # a dev sandbox (junk writes + DML on the clone never touch the
    # live table); a CHECK constraint gates every later write; CONVERT
    # TO DELTA migrates a plain parquet directory in place.
    eng.sql(
        "CREATE TABLE glue.lake.sandbox SHALLOW CLONE "
        f"glue.lake.orders LOCATION '{work / 'sandbox'}'"
    )
    eng.sql(
        "INSERT INTO glue.lake.sandbox "
        "SELECT -o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
        "o_orderdate, o_orderpriority FROM glue.lake.orders LIMIT 50"
    )
    eng.sql("DELETE FROM glue.lake.sandbox WHERE o_orderkey < 0")
    sand_n = eng.sql(
        "SELECT count(*) AS n FROM glue.lake.sandbox"
    ).collect()[0].n
    print(
        f"shallow clone sandbox: {sand_n} rows (== live table: "
        f"{sand_n == now_n}), zero data copied"
    )
    eng.sql(
        "ALTER TABLE glue.lake.sandbox ADD CONSTRAINT positive_price "
        "CHECK (o_totalprice > 0)"
    )
    try:
        eng.sql(
            "INSERT INTO glue.lake.sandbox VALUES "
            "(1, 1, 'O', -5.0, DATE '1995-01-01', 'x')"
        )
    except Exception as e:
        print(f"CHECK constraint held: {str(e)[:72]}")
    plain = work / "plain_parquet"
    orders.limit(200).coalesce(1).write.parquet(str(plain))
    store.register_parquet_dir("lake", "plain", str(plain))
    eng.sql("CONVERT TO DELTA glue.lake.plain")
    eng.sql("DELETE FROM glue.lake.plain WHERE o_orderkey % 2 = 0")
    conv_n = eng.sql(
        "SELECT count(*) AS n FROM glue.lake.plain"
    ).collect()[0].n
    print(
        "CONVERT TO DELTA: in-place migration, then a DV DELETE — "
        f"{conv_n} rows remain; "
        f"detail: {eng.sql('DESCRIBE DETAIL glue.lake.plain').collect()[0].numFiles} file(s)"
    )

    # round 6: tail the table as a micro-batch stream, exactly-once
    from glue_table_cache_spark.streaming.delta_sink import (
        stream_to_delta,
    )
    from glue_table_cache_spark.streaming.delta_source import (
        read_delta_stream,
    )

    mirror = str(work / "orders_mirror")
    # start past the CRUD commits: a DELETE/UPDATE version removes
    # files with dataChange, which an append-only stream refuses
    # (by design — resuming after them is the documented posture)
    sq = stream_to_delta(
        read_delta_stream(spark, loc, starting_version=up_version + 1),
        mirror,
        str(work / "mirror_ckpt"),
        app_id="mirror",
    )
    write_delta_append(
        orders.limit(7).coalesce(1), loc
    )  # a late append lands while the stream runs
    sq.processAllAvailable()
    sq.stop()
    from glue_table_cache_spark.sources.delta import delta_data_files

    mirrored = spark.read.parquet(*delta_data_files(mirror)).count()
    print(f"streamed {mirrored} rows into the downstream mirror")

    out = eng.sql(
        "SELECT o_orderstatus, count(*) AS n, "
        "round(sum(o_totalprice), 2) AS total "
        "FROM glue.lake.orders GROUP BY o_orderstatus"
    )
    write_iceberg_append(out, str(work / "summary_iceberg"))
    write_hudi_append(out, str(work / "summary_hudi"))
    store.register_parquet_dir(
        "lake", "sum_i", str(work / "summary_iceberg"),
        parameters={"table_type": "ICEBERG"},
    )
    store.register_parquet_dir(
        "lake", "sum_h", str(work / "summary_hudi"),
        parameters={"hoodie.table.name": "sum_h"},
    )
    for t in ("sum_i", "sum_h"):
        rows = eng.sql(
            f"SELECT * FROM glue.lake.{t} ORDER BY o_orderstatus"
        ).collect()
        print(f"{t}: {[tuple(r) for r in rows]}")

    # round 9: the general MERGE grammar, Iceberg inspection tables,
    # SHOW CREATE TABLE, and TRUNCATE
    eng.sql(  # corrupt one row so the conditional repair has work
        "UPDATE glue.lake.sum_i SET n = 0 WHERE o_orderstatus = 'F'"
    )
    merged = eng.sql(
        "MERGE INTO glue.lake.sum_i AS t USING glue.lake.sum_h s "
        "ON t.o_orderstatus = s.o_orderstatus "
        "WHEN MATCHED AND t.n <> s.n THEN UPDATE SET n = s.n "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT (o_orderstatus, n, total) "
        "VALUES (s.o_orderstatus, s.n, s.total)"
    ).collect()[0]
    print(
        "general MERGE into the Iceberg summary: "
        f"{merged.rows_updated} updated, {merged.rows_inserted} "
        f"inserted, {merged.rows_deleted} deleted"
    )
    meta = eng.sql(
        "SELECT (SELECT count(*) FROM glue.lake.sum_i.snapshots) "
        "AS snaps, "
        "(SELECT sum(record_count) FROM glue.lake.sum_i.files "
        "WHERE content = 0) AS live_rows"
    ).collect()[0]
    print(
        f"inspection tables: {meta.snaps} snapshot(s), "
        f"{meta.live_rows} live row(s)"
    )
    ddl = eng.sql(
        "SHOW CREATE TABLE glue.lake.sum_i"
    ).collect()[0].createtab_stmt
    print("SHOW CREATE TABLE:", ddl.splitlines()[0], "...")
    # round 10: the batch CDF TVF on Hudi (instant windows) and
    # MERGE WITH SCHEMA EVOLUTION
    changes = eng.sql(
        "SELECT _change_type, count(*) AS n "
        "FROM table_changes(glue.lake.sum_h, '2000-01-01') "
        "GROUP BY _change_type ORDER BY _change_type"
    ).collect()
    print(
        "hudi table_changes over the full timeline: "
        f"{[(r._change_type, r.n) for r in changes]}"
    )
    # round 11: the Iceberg window that the r10 loop refused (the
    # UPDATE/MERGE above staged position deletes) now SYNTHESIZES the
    # per-row delta — the deleted rows read back from the prior
    # state's files by their (file_path, pos) targets
    ice_changes = eng.sql(
        "SELECT _change_type, count(*) AS n "
        "FROM table_changes(glue.lake.sum_i, 2) "
        "GROUP BY _change_type ORDER BY _change_type"
    ).collect()
    print(
        "iceberg table_changes across the row-level DML window: "
        f"{[(r._change_type, r.n) for r in ice_changes]}"
    )
    spark.createDataFrame(
        [("O", "open orders")], "o_orderstatus string, note string"
    ).createOrReplaceTempView("notes_src")
    ev = eng.sql(
        "MERGE WITH SCHEMA EVOLUTION INTO glue.lake.sum_i t "
        "USING notes_src s ON t.o_orderstatus = s.o_orderstatus "
        "WHEN MATCHED THEN UPDATE SET note = s.note"
    ).collect()[0]
    noted = eng.sql(
        "SELECT o_orderstatus, note FROM glue.lake.sum_i "
        "WHERE note IS NOT NULL"
    ).collect()
    print(
        f"schema evolution: {ev.rows_updated} row annotated -> "
        f"{[tuple(r) for r in noted]}"
    )
    eng.sql("TRUNCATE TABLE glue.lake.sum_h")
    left = eng.sql(
        "SELECT count(*) AS n FROM glue.lake.sum_h"
    ).collect()[0].n
    print(f"TRUNCATE: hudi summary now holds {left} rows")
    print("lakehouse loop complete")


if __name__ == "__main__":
    main()
