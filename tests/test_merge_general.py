"""The general (column-level) MERGE grammar, end-to-end through
``engine.sql("MERGE INTO ...")``: conditional WHEN clauses, THEN
DELETE, column-level UPDATE SET, explicit INSERT lists, NOT MATCHED
BY SOURCE — per clause shape across Delta, Iceberg, and Hudi COW.
Execution is the shared :mod:`..sinks.merge_planner`
chosen-clause plan; the whole-row upsert pair keeps its fast path.
Semantics parity: the public Delta/SQL:2003 MERGE dialect — the
reference engine has no DML surface
(/root/reference/src/types.ts:4-11)."""

import pytest

from glue_table_cache_spark.catalog import LocalMetadataStore
from glue_table_cache_spark.engine import GlueSparkEngine
from glue_table_cache_spark.errors import GlueSparkError


def _engine_for(spark, location, fmt_params):
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "t", str(location), parameters=fmt_params
    )
    return GlueSparkEngine(spark, store)


def _delta_engine(spark, loc, rows, schema, partition_by=None):
    from glue_table_cache_spark.sinks.delta_write import (
        write_delta_append,
    )

    write_delta_append(
        spark.createDataFrame(rows, schema), str(loc),
        partition_by=partition_by,
    )
    return _engine_for(
        spark, loc, {"spark.sql.sources.provider": "delta"}
    )


def _iceberg_engine(spark, loc, rows, schema, partition_by=None):
    from glue_table_cache_spark.sinks.iceberg_write import (
        write_iceberg_append,
    )

    kw = {"partition_by": partition_by} if partition_by else {}
    write_iceberg_append(
        spark.createDataFrame(rows, schema), str(loc), **kw
    )
    return _engine_for(spark, loc, {"table_type": "ICEBERG"})


def _hudi_engine(spark, loc, rows, schema):
    from glue_table_cache_spark.sinks.hudi_write import (
        write_hudi_append,
    )

    write_hudi_append(spark.createDataFrame(rows, schema), str(loc))
    return _engine_for(spark, loc, {"hoodie.table.name": "t"})


def _engine(spark, loc, fmt, rows=None, schema=None):
    rows = TARGET if rows is None else rows
    schema = TSCHEMA if schema is None else schema
    if fmt == "delta":
        return _delta_engine(spark, loc, rows, schema)
    if fmt == "iceberg":
        return _iceberg_engine(spark, loc, rows, schema)
    return _hudi_engine(spark, loc, rows, schema)


@pytest.fixture()
def src3(spark):
    """id 2 (matches), 3 (matches), 4 (no match) with a verb column."""
    df = spark.createDataFrame(
        [(2, "upd", 200.0), (3, "del", 300.0), (4, "ins", 400.0)],
        "id long, verb string, amt double",
    )
    df.createOrReplaceTempView("mg_src")
    yield "mg_src"
    spark.catalog.dropTempView("mg_src")


TARGET = [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]
TSCHEMA = "id long, tag string, amt double"


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "hudi"])
def test_merge_conditional_update_delete_insert(
    spark, tmp_path, src3, fmt
):
    """The full clause matrix in one statement: a conditional DELETE,
    a column-level UPDATE (pre-update values, partial SET), and an
    explicit INSERT list with a NULL-filled gap."""
    loc = tmp_path / fmt
    eng = _engine(spark, loc, fmt)
    out = eng.sql(
        "MERGE INTO glue.db.t AS t USING mg_src s ON t.id = s.id "
        "WHEN MATCHED AND s.verb = 'del' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET amt = t.amt + s.amt "
        "WHEN NOT MATCHED THEN INSERT (id, amt) VALUES (s.id, s.amt)"
    ).first()
    assert out.operation == "MERGE"
    assert out.rows_updated == 1
    assert out.rows_deleted == 1
    assert out.rows_inserted == 1
    got = {
        r.id: (r.tag, r.amt)
        for r in eng.sql("SELECT * FROM glue.db.t").collect()
    }
    assert got == {
        1: ("a", 10.0),       # untouched
        2: ("b", 220.0),      # updated: amt += 200, tag kept
        4: (None, 400.0),     # inserted: tag gap NULL-filled
    }  # id 3 deleted


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "hudi"])
def test_merge_not_matched_by_source(spark, tmp_path, src3, fmt):
    """NOT MATCHED BY SOURCE clauses see target rows without a
    source partner — here: flag them, conditionally delete one."""
    loc = tmp_path / fmt
    eng = _engine(spark, loc, fmt)
    out = eng.sql(
        "MERGE INTO glue.db.t AS t USING mg_src s ON t.id = s.id "
        "WHEN NOT MATCHED BY SOURCE AND t.amt < 15 THEN DELETE "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET tag = 'orphan'"
    ).first()
    # id 1 has no source partner and amt 10 < 15 → deleted; ids 2,3
    # matched → untouched; no other unmatched target rows exist
    assert out.rows_deleted == 1
    assert out.rows_updated == 0
    assert out.rows_inserted == 0
    got = {
        r.id: r.tag
        for r in eng.sql("SELECT * FROM glue.db.t").collect()
    }
    assert got == {2: "b", 3: "c"}


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "hudi"])
def test_merge_matched_delete_only(spark, tmp_path, src3, fmt):
    loc = tmp_path / fmt
    eng = _engine(spark, loc, fmt)
    out = eng.sql(
        "MERGE INTO glue.db.t AS t USING mg_src s ON t.id = s.id "
        "WHEN MATCHED THEN DELETE"
    ).first()
    assert out.rows_deleted == 2 and out.rows_inserted == 0
    assert (
        eng.sql("SELECT count(*) AS n FROM glue.db.t").first().n == 1
    )


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "hudi"])
def test_merge_narrow_source(spark, tmp_path, fmt):
    """A column-level merge does NOT need the source to cover the
    table schema — only the referenced columns."""
    loc = tmp_path / fmt
    eng = _engine(spark, loc, fmt)
    spark.createDataFrame(
        [(2,), (9,)], "id long"
    ).createOrReplaceTempView("mg_narrow")
    try:
        out = eng.sql(
            "MERGE INTO glue.db.t AS t USING mg_narrow s "
            "ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET tag = 'seen'"
        ).first()
        assert out.rows_updated == 1
        got = {
            r.id: r.tag
            for r in eng.sql("SELECT * FROM glue.db.t").collect()
        }
        assert got == {1: "a", 2: "seen", 3: "c"}
    finally:
        spark.catalog.dropTempView("mg_narrow")


def test_merge_general_partitioned_delta(spark, tmp_path, src3):
    """Partitioned COW: only partitions holding a chosen row
    rewrite; untouched partitions stay byte-identical."""
    loc = tmp_path / "pdelta"
    rows = [
        (1, "p1", 10.0), (2, "p1", 20.0), (3, "p2", 30.0),
        (5, "p3", 50.0),
    ]
    eng = _delta_engine(
        spark, loc, rows, "id long, part string, amt double",
        partition_by=["part"],
    )
    before = {
        p: p.stat().st_mtime_ns
        for p in (loc / "part=p3").rglob("*.parquet")
    }
    out = eng.sql(
        "MERGE INTO glue.db.t AS t USING mg_src s ON t.id = s.id "
        "WHEN MATCHED AND s.verb = 'del' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET amt = s.amt "
        "WHEN NOT MATCHED THEN INSERT (id, part, amt) "
        "VALUES (s.id, 'p9', s.amt)"
    ).first()
    assert out.rows_updated == 1 and out.rows_deleted == 1
    assert out.rows_inserted == 1
    got = {
        r.id: (r.part, r.amt)
        for r in eng.sql("SELECT * FROM glue.db.t").collect()
    }
    assert got == {
        1: ("p1", 10.0),
        2: ("p1", 200.0),
        4: ("p9", 400.0),
        5: ("p3", 50.0),
    }
    after = {
        p: p.stat().st_mtime_ns
        for p in (loc / "part=p3").rglob("*.parquet")
    }
    assert before == after  # untouched partition byte-identical


def test_merge_general_partitioned_iceberg(spark, tmp_path, src3):
    """Identity-partitioned Iceberg: new rows land under the spec
    with correct manifest tuples; retired rows go through ONE
    position-delete file (no data file rewrites)."""
    loc = tmp_path / "pice"
    rows = [
        (1, "p1", 10.0), (2, "p1", 20.0), (3, "p2", 30.0),
    ]
    eng = _iceberg_engine(
        spark, loc, rows, "id long, part string, amt double",
        partition_by=["part"],
    )
    data_before = sorted(
        p.name for p in (loc / "data").rglob("*.parquet")
    )
    out = eng.sql(
        "MERGE INTO glue.db.t AS t USING mg_src s ON t.id = s.id "
        "WHEN MATCHED AND s.verb = 'del' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET amt = s.amt "
        "WHEN NOT MATCHED THEN INSERT (id, part, amt) "
        "VALUES (s.id, 'p9', s.amt)"
    ).first()
    assert out.rows_updated == 1 and out.rows_deleted == 1
    assert out.rows_inserted == 1
    got = {
        r.id: (r.part, r.amt)
        for r in eng.sql("SELECT * FROM glue.db.t").collect()
    }
    assert got == {
        1: ("p1", 10.0),
        2: ("p1", 200.0),
        4: ("p9", 400.0),
    }
    data_after = sorted(
        p.name for p in (loc / "data").rglob("*.parquet")
    )
    # every pre-merge data file is still present (position deletes,
    # not rewrites) plus the new files
    assert set(data_before) <= set(data_after)
    assert any(n.startswith("pos-delete-") for n in data_after)


def test_merge_general_cdf_delta(spark, tmp_path, src3):
    """A general merge on a CDF-enabled table records typed cdc
    rows: update pre/post images, deletes, inserts."""
    from glue_table_cache_spark.sources.delta import delta_cdf

    loc = tmp_path / "cdf"
    eng = _delta_engine(spark, loc, TARGET, TSCHEMA)  # v0
    eng.sql(
        "ALTER TABLE glue.db.t SET TBLPROPERTIES "
        "('delta.enableChangeDataFeed'='true')"
    )  # v1
    eng.sql(
        "MERGE INTO glue.db.t AS t USING mg_src s ON t.id = s.id "
        "WHEN MATCHED AND s.verb = 'del' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET amt = s.amt "
        "WHEN NOT MATCHED THEN INSERT (id, amt) VALUES (s.id, s.amt)"
    )  # v2
    changes = delta_cdf(spark, str(loc), since_version=1)
    typed = {
        (r.id, r._change_type)
        for r in changes.select("id", "_change_type").collect()
    }
    assert typed == {
        (2, "update_preimage"),
        (2, "update_postimage"),
        (3, "delete"),
        (4, "insert"),
    }


def test_merge_general_hudi_retires_emptied_group(
    spark, tmp_path, src3
):
    """A general MERGE whose DELETE clause drains a whole file group
    must RETIRE the group via partitionToReplaceFileIds — writing no
    slice at all would silently leave the old one live (zero-row
    groups vanish from a partitionBy staging output)."""
    from glue_table_cache_spark.sinks.hudi_write import (
        write_hudi_append,
    )

    loc = tmp_path / "hretire"
    # two appends → two file groups: (1) holds ids 2,3 — both
    # source-matched and delete-chosen → drained; (2) holds 1 — the
    # NOT MATCHED BY SOURCE update rewrites it
    write_hudi_append(
        spark.createDataFrame(
            [(2, "b", 20.0), (3, "c", 30.0)], TSCHEMA
        ),
        str(loc),
    )
    write_hudi_append(
        spark.createDataFrame([(1, "a", 10.0)], TSCHEMA), str(loc)
    )
    eng = _engine_for(spark, loc, {"hoodie.table.name": "t"})
    out = eng.sql(
        "MERGE INTO glue.db.t AS t USING mg_src s ON t.id = s.id "
        "WHEN MATCHED THEN DELETE "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET tag = 'orphan'"
    ).first()
    assert out.rows_deleted == 2 and out.rows_updated == 1
    got = {
        r.id: r.tag
        for r in eng.sql("SELECT * FROM glue.db.t").collect()
    }
    assert got == {1: "orphan"}


def test_merge_general_hudi_refusals(spark, tmp_path, src3):
    """The Hudi shapes the writers cannot serve refuse with a
    pointer: hive-partitioned COW (insert routing) and partitioned
    MOR inserts (log routing)."""
    from glue_table_cache_spark.sinks.hudi_write import (
        write_hudi_append,
    )

    pmor = tmp_path / "hpmor"
    write_hudi_append(
        spark.createDataFrame(
            [(1, "p1", 10.0), (2, "p2", 20.0)],
            "id long, part string, amt double",
        ),
        str(pmor),
        partition_by=["part"],
        table_type="MERGE_ON_READ",
    )
    eng = _engine_for(
        spark,
        pmor,
        {
            "hoodie.table.name": "t",
            "hoodie.table.recordkey.fields": "id",
        },
    )
    # partitioned MOR: update/delete clauses route by record key and
    # WORK; a NOT MATCHED insert cannot pick the right partition log
    with pytest.raises(GlueSparkError, match="partition"):
        eng.sql(
            "MERGE INTO glue.db.t AS t USING mg_src s ON t.id = s.id "
            "WHEN NOT MATCHED THEN INSERT (id, part, amt) "
            "VALUES (s.id, 'p9', s.amt)"
        )
    out = eng.sql(
        "MERGE INTO glue.db.t AS t USING mg_src s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET amt = t.amt + s.amt"
    ).first()
    assert out.rows_updated == 1  # id 2 in p2

    part = tmp_path / "hpart"
    write_hudi_append(
        spark.createDataFrame(
            [(1, "p1", 10.0), (2, "p2", 20.0)],
            "id long, part string, amt double",
        ),
        str(part),
        partition_by=["part"],
    )
    eng = _engine_for(spark, part, {"hoodie.table.name": "t"})
    # partitioned COW: moving rows between partition directories
    # refuses (both SET forms); keyed updates and deletes work
    with pytest.raises(GlueSparkError, match="partition"):
        eng.sql(
            "MERGE INTO glue.db.t AS t USING mg_src s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET part = 'moved'"
        )


def test_merge_general_hudi_partitioned(spark, tmp_path, src3):
    """Partitioned COW Hudi through the clause planner: updates and
    deletes stay in their file group's partition directory, a
    drained partition group retires, and NOT MATCHED inserts open
    one new file group per target partition (hive-escaped path)."""
    from glue_table_cache_spark.sinks.hudi_write import (
        write_hudi_append,
    )

    loc = tmp_path / "hgp"
    # p1 holds ids 1,2; p2 holds id 3 (drained by the DELETE clause)
    write_hudi_append(
        spark.createDataFrame(
            [(1, "p1", 10.0), (2, "p1", 20.0), (3, "p2", 30.0)],
            "id long, part string, amt double",
        ),
        str(loc),
        partition_by=["part"],
    )
    eng = _engine_for(spark, loc, {"hoodie.table.name": "t"})
    out = eng.sql(
        "MERGE INTO glue.db.t AS t USING mg_src s ON t.id = s.id "
        "WHEN MATCHED AND s.verb = 'del' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET amt = s.amt "
        "WHEN NOT MATCHED THEN INSERT (id, part, amt) "
        "VALUES (s.id, 'p:9', s.amt)"
    ).first()
    assert out.rows_updated == 1 and out.rows_deleted == 1
    assert out.rows_inserted == 1
    got = {
        r.id: (r.part, r.amt)
        for r in eng.sql("SELECT * FROM glue.db.t").collect()
    }
    assert got == {
        1: ("p1", 10.0),
        2: ("p1", 200.0),
        4: ("p:9", 400.0),   # new partition, hive-escaped directory
    }
    assert (loc / "part=p%3A9").is_dir()
    # whole-row pair routes through the same planner on partitioned
    spark.createDataFrame(
        [(1, "p1", 11.0), (9, "p1", 9.0)],
        "id long, part string, amt double",
    ).createOrReplaceTempView("mg_wrp")
    try:
        out = eng.sql(
            "MERGE INTO glue.db.t AS t USING mg_wrp s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        ).first()
        assert out.rows_updated == 1 and out.rows_inserted == 1
        # ...but a SET * that would MOVE a row refuses
        spark.createDataFrame(
            [(2, "p2", 0.0)], "id long, part string, amt double"
        ).createOrReplaceTempView("mg_mv")
        with pytest.raises(GlueSparkError, match="move"):
            eng.sql(
                "MERGE INTO glue.db.t AS t USING mg_mv s "
                "ON t.id = s.id WHEN MATCHED THEN UPDATE SET *"
            )
    finally:
        spark.catalog.dropTempView("mg_wrp")
        spark.catalog.dropTempView("mg_mv")


def test_merge_general_validation_errors(spark, tmp_path, src3):
    loc = tmp_path / "verr"
    eng = _delta_engine(spark, loc, TARGET, TSCHEMA)
    # SET names an unknown column
    with pytest.raises(GlueSparkError, match="unknown column"):
        eng.sql(
            "MERGE INTO glue.db.t AS t USING mg_src s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET nope = 1"
        )
    # INSERT list omitting the ON key would strand the row
    with pytest.raises(GlueSparkError, match="ON key"):
        eng.sql(
            "MERGE INTO glue.db.t AS t USING mg_src s ON t.id = s.id "
            "WHEN NOT MATCHED THEN INSERT (tag) VALUES (s.verb)"
        )
    # duplicate source keys stay ambiguous in the general path too
    spark.createDataFrame(
        [(2, 1.0), (2, 2.0)], "id long, amt double"
    ).createOrReplaceTempView("mg_dup")
    try:
        with pytest.raises(GlueSparkError, match="duplicate keys"):
            eng.sql(
                "MERGE INTO glue.db.t AS t USING mg_dup s "
                "ON t.id = s.id "
                "WHEN MATCHED THEN UPDATE SET amt = s.amt"
            )
    finally:
        spark.catalog.dropTempView("mg_dup")


def test_merge_general_noop(spark, tmp_path):
    """No clause matches anything → no commit, version NULL."""
    loc = tmp_path / "noop"
    eng = _delta_engine(spark, loc, TARGET, TSCHEMA)
    spark.createDataFrame(
        [(99, "x", 1.0)], "id long, verb string, amt double"
    ).createOrReplaceTempView("mg_miss")
    try:
        out = eng.sql(
            "MERGE INTO glue.db.t AS t USING mg_miss s "
            "ON t.id = s.id "
            "WHEN MATCHED THEN DELETE"
        ).first()
        assert out.version is None
        assert (out.rows_updated, out.rows_inserted,
                out.rows_deleted) == (0, 0, 0)
    finally:
        spark.catalog.dropTempView("mg_miss")


def test_merge_general_insert_only_empty_iceberg(spark, tmp_path):
    """A NOT-MATCHED-only merge into an empty Iceberg table is an
    append of the chosen insert rows."""
    from glue_table_cache_spark.sinks.iceberg_write import (
        write_iceberg_append,
    )

    loc = tmp_path / "eice"
    # create-then-empty: append one row, delete it, so metadata
    # exists but no live entries... simpler: append zero-row frame
    write_iceberg_append(
        spark.createDataFrame([], TSCHEMA), str(loc)
    )
    eng = _engine_for(spark, loc, {"table_type": "ICEBERG"})
    spark.createDataFrame(
        [(7, "new", 70.0)], "id long, verb string, amt double"
    ).createOrReplaceTempView("mg_ins")
    try:
        out = eng.sql(
            "MERGE INTO glue.db.t AS t USING mg_ins s "
            "ON t.id = s.id "
            "WHEN NOT MATCHED AND s.amt > 0 THEN "
            "INSERT (id, amt) VALUES (s.id, s.amt)"
        ).first()
        assert out.rows_inserted == 1
        got = eng.sql("SELECT * FROM glue.db.t").collect()
        assert [(r.id, r.tag, r.amt) for r in got] == [
            (7, None, 70.0)
        ]
    finally:
        spark.catalog.dropTempView("mg_ins")


def _mor_engine(spark, loc, rows=None):
    from glue_table_cache_spark.sinks.hudi_write import (
        write_hudi_append,
    )

    write_hudi_append(
        spark.createDataFrame(rows or TARGET, TSCHEMA),
        str(loc),
        table_type="MERGE_ON_READ",
    )
    return _engine_for(
        spark,
        loc,
        {
            "hoodie.table.name": "t",
            "hoodie.table.recordkey.fields": "id",
        },
    )


def test_merge_general_hudi_mor(spark, tmp_path, src3):
    """General MERGE on MERGE_ON_READ publishes log blocks under one
    deltacommit — clause semantics evaluate against the MERGED view
    (a prior log upsert's row matches), base files stay untouched."""
    from glue_table_cache_spark.sinks.hudi_log_write import (
        write_hudi_log,
    )

    loc = tmp_path / "mor"
    eng = _mor_engine(spark, loc)
    # log-upsert id 2's amt to 21.0 — the merge must see 21, not 20
    write_hudi_log(
        spark,
        str(loc),
        "id",
        upserts=spark.createDataFrame(
            [(2, "b", 21.0)], TSCHEMA
        ),
    )
    eng.invalidate_table("db", "t")
    bases = sorted(
        p.name
        for p in loc.rglob("*.parquet")
        if "_staging" not in str(p)
    )
    out = eng.sql(
        "MERGE INTO glue.db.t AS t USING mg_src s ON t.id = s.id "
        "WHEN MATCHED AND s.verb = 'del' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET amt = t.amt + s.amt "
        "WHEN NOT MATCHED THEN INSERT (id, amt) VALUES (s.id, s.amt)"
    ).first()
    assert out.rows_updated == 1
    assert out.rows_deleted == 1
    assert out.rows_inserted == 1
    got = {
        r.id: (r.tag, r.amt)
        for r in eng.sql("SELECT * FROM glue.db.t").collect()
    }
    assert got == {
        1: ("a", 10.0),
        2: ("b", 221.0),      # 21 (log) + 200, merged-view semantics
        4: (None, 400.0),
    }
    after = sorted(
        p.name
        for p in loc.rglob("*.parquet")
        if "_staging" not in str(p)
    )
    assert bases == after  # no base rewrite: log blocks only


def test_merge_whole_row_hudi_mor(spark, tmp_path):
    """The classic upsert pair works on MOR too — as one upsert log
    block, not a base rewrite."""
    loc = tmp_path / "morw"
    eng = _mor_engine(spark, loc)
    spark.createDataFrame(
        [(2, "B", 99.0), (9, "new", 9.0)], TSCHEMA
    ).createOrReplaceTempView("mg_wr")
    try:
        out = eng.sql(
            "MERGE INTO glue.db.t AS t USING mg_wr s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        ).first()
        assert out.rows_updated == 1 and out.rows_inserted == 1
        got = {
            r.id: (r.tag, r.amt)
            for r in eng.sql("SELECT * FROM glue.db.t").collect()
        }
        assert got == {
            1: ("a", 10.0),
            2: ("B", 99.0),
            3: ("c", 30.0),
            9: ("new", 9.0),
        }
    finally:
        spark.catalog.dropTempView("mg_wr")


def test_merge_hudi_mor_record_key_set_refuses(
    spark, tmp_path, src3
):
    loc = tmp_path / "mork"
    eng = _mor_engine(spark, loc)
    with pytest.raises(GlueSparkError, match="record key"):
        eng.sql(
            "MERGE INTO glue.db.t AS t USING mg_src s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET id = s.id + 1"
        )
    # SET * merging on a non-record-key column could rewrite the key
    spark.createDataFrame(
        [(7, "x", 20.0)], TSCHEMA
    ).createOrReplaceTempView("mg_full")
    try:
        with pytest.raises(GlueSparkError, match="record key"):
            eng.sql(
                "MERGE INTO glue.db.t AS t USING mg_full s "
                "ON t.amt = s.amt "
                "WHEN MATCHED THEN UPDATE SET *"
            )
    finally:
        spark.catalog.dropTempView("mg_full")


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "hudi"])
def test_merge_with_schema_evolution(spark, tmp_path, fmt):
    """MERGE WITH SCHEMA EVOLUTION INTO: new source columns widen the
    table first (schema-only ALTER commit), then the merge lands them
    — evolved column set for merged rows, NULL for pre-merge rows."""
    loc = tmp_path / f"ev_{fmt}"
    rows = [(1, "a"), (2, "b")]
    schema = "id long, v string"
    if fmt == "delta":
        eng = _delta_engine(spark, loc, rows, schema)
    elif fmt == "iceberg":
        eng = _iceberg_engine(spark, loc, rows, schema)
    else:
        eng = _hudi_engine(spark, loc, rows, schema)
    spark.createDataFrame(
        [(2, "B", 2.5), (3, "C", 3.5)],
        "id long, v string, score double",
    ).createOrReplaceTempView("ev_src")
    try:
        # WITHOUT the clause, a wider source must not silently
        # evolve: the merge refuses or drops nothing new — here the
        # whole-row path refuses on the uncovered column set
        out = eng.sql(
            "MERGE WITH SCHEMA EVOLUTION INTO glue.db.t t "
            "USING ev_src s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        ).first()
        assert out.rows_updated == 1 and out.rows_inserted == 1
        got = {
            r.id: (r.v, r.score)
            for r in eng.sql("SELECT * FROM glue.db.t").collect()
        }
        assert got == {
            1: ("a", None),  # pre-merge row reads NULL
            2: ("B", 2.5),
            3: ("C", 3.5),
        }
    finally:
        spark.catalog.dropTempView("ev_src")


def test_merge_schema_evolution_general_clauses_and_constraints(
    spark, tmp_path
):
    """Evolution under the general clause grammar; CHECK constraints
    keep enforcing across the widened schema."""
    loc = tmp_path / "evg"
    eng = _delta_engine(
        spark, loc, [(1, 10.0), (2, 20.0)], "id long, amt double"
    )
    eng.sql(
        "ALTER TABLE glue.db.t ADD CONSTRAINT pos CHECK (amt > 0)"
    )
    spark.createDataFrame(
        [(1, 11.0, "x"), (9, 90.0, "y")],
        "id long, amt double, tag string",
    ).createOrReplaceTempView("evg_src")
    try:
        out = eng.sql(
            "MERGE WITH SCHEMA EVOLUTION INTO glue.db.t t "
            "USING evg_src s ON t.id = s.id "
            "WHEN MATCHED AND s.amt > t.amt THEN "
            "UPDATE SET amt = s.amt, tag = s.tag "
            "WHEN NOT MATCHED THEN INSERT (id, amt, tag) "
            "VALUES (s.id, s.amt, s.tag)"
        ).first()
        assert out.rows_updated == 1 and out.rows_inserted == 1
        got = {
            r.id: (r.amt, r.tag)
            for r in eng.sql("SELECT * FROM glue.db.t").collect()
        }
        assert got == {
            1: (11.0, "x"),
            2: (20.0, None),
            9: (90.0, "y"),
        }
        # the CHECK constraint still gates the widened-table merge
        spark.createDataFrame(
            [(2, -5.0, "z")], "id long, amt double, tag string"
        ).createOrReplaceTempView("evg_bad")
        with pytest.raises(GlueSparkError, match="pos"):
            eng.sql(
                "MERGE WITH SCHEMA EVOLUTION INTO glue.db.t t "
                "USING evg_bad s ON t.id = s.id "
                "WHEN MATCHED THEN UPDATE SET amt = s.amt"
            )
    finally:
        spark.catalog.dropTempView("evg_src")
        spark.catalog.dropTempView("evg_bad")


def test_merge_without_evolution_keeps_refusing_wider_source(
    spark, tmp_path
):
    """No WITH SCHEMA EVOLUTION → a wider source must not silently
    add columns (whole-row and general paths both)."""
    loc = tmp_path / "noev"
    eng = _delta_engine(
        spark, loc, [(1, "a")], "id long, v string"
    )
    spark.createDataFrame(
        [(1, "A", 9.9)], "id long, v string, extra double"
    ).createOrReplaceTempView("noev_src")
    try:
        with pytest.raises(GlueSparkError):
            eng.sql(
                "MERGE INTO glue.db.t t USING noev_src s "
                "ON t.id = s.id "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        # the table is untouched
        assert eng.sql(
            "SELECT count(*) AS n FROM glue.db.t"
        ).first().n == 1
        assert "extra" not in eng.sql(
            "SELECT * FROM glue.db.t"
        ).columns
    finally:
        spark.catalog.dropTempView("noev_src")


def test_merge_schema_evolution_mor_refuses_toward_compaction(
    spark, tmp_path
):
    """Evolution on MERGE_ON_READ propagates the deliberate ALTER
    gate: pending log blocks carry their own record schemas, so the
    schema-only widening refuses with the compact-first pointer
    (never a silent half-evolved table); the table stays readable
    and a non-evolving merge still works."""
    from glue_table_cache_spark.sinks.hudi_write import (
        write_hudi_append,
    )

    loc = tmp_path / "evmor"
    write_hudi_append(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, v string"
        ).coalesce(1),
        str(loc),
        table_type="MERGE_ON_READ",
    )
    eng = _engine_for(
        spark,
        loc,
        {
            "hoodie.table.name": "t",
            "hoodie.table.recordkey.fields": "id",
        },
    )
    spark.createDataFrame(
        [(2, "B", 2.5), (3, "C", 3.5)],
        "id long, v string, score double",
    ).createOrReplaceTempView("evmor_src")
    try:
        with pytest.raises(GlueSparkError, match="compact first"):
            eng.sql(
                "MERGE WITH SCHEMA EVOLUTION INTO glue.db.t t "
                "USING evmor_src s ON t.id = s.id "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        # untouched and still mergeable without evolution
        out = eng.sql(
            "MERGE INTO glue.db.t t USING "
            "(SELECT id, v FROM evmor_src) s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        ).first()
        assert out.rows_updated == 1 and out.rows_inserted == 1
        got = {
            r.id: r.v
            for r in eng.sql("SELECT * FROM glue.db.t").collect()
        }
        assert got == {1: "a", 2: "B", 3: "C"}
    finally:
        spark.catalog.dropTempView("evmor_src")
