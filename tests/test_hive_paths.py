"""Partition-value escaping round-trips: Spark writes hive dirs
through escapePathName (``:`` → ``%3A``, NULL →
``__HIVE_DEFAULT_PARTITION__``); the writers must commit the LOGICAL
value into Delta ``partitionValues`` / Iceberg manifest tuples while
the directory keeps the escaped spelling — otherwise pruning and
identity re-attachment compare against the path spelling and
silently drop matching files."""

import json
from pathlib import Path

import pytest

from glue_table_cache_spark.catalog import LocalMetadataStore
from glue_table_cache_spark.engine import GlueSparkEngine
from glue_table_cache_spark.sinks.hive_paths import (
    HIVE_NULL,
    partition_values_from_dir_parts,
    unescape_partition_value,
)


def test_unescape_unit():
    assert unescape_partition_value("2024") == "2024"
    assert unescape_partition_value("a%3Ab") == "a:b"
    assert unescape_partition_value("a%2Fb%25c") == "a/b%c"
    assert unescape_partition_value(HIVE_NULL) is None
    assert partition_values_from_dir_parts(
        ("year=2024", "tag=x%3Dy", "not_a_kv")
    ) == {"year": "2024", "tag": "x=y"}


def _engine_for(spark, location, fmt_params):
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "t", str(location), parameters=fmt_params
    )
    return GlueSparkEngine(spark, store)


def test_delta_partition_value_special_chars(spark, tmp_path):
    """Append + UPDATE moving a row into a partition whose value
    escapePathName rewrites: the log carries the logical value, the
    directory the escaped one, and a partition-pruned scan still
    finds the row."""
    from glue_table_cache_spark.sinks.delta_write import (
        write_delta_append,
    )

    loc = tmp_path / "dt"
    write_delta_append(
        spark.createDataFrame(
            [(1, "a:b"), (2, "plain")], "id long, p string"
        ),
        str(loc),
        partition_by=["p"],
    )
    # directory is escaped, log value is logical
    assert (loc / "p=a%3Ab").is_dir()
    adds = [
        json.loads(line)["add"]
        for line in (loc / "_delta_log" / f"{0:020d}.json")
        .read_text()
        .splitlines()
        if '"add"' in line
    ]
    pvs = {a["partitionValues"]["p"] for a in adds}
    assert "a:b" in pvs and "a%3Ab" not in pvs
    eng = _engine_for(
        spark, loc, {"spark.sql.sources.provider": "delta"}
    )
    # the pruned scan compares the predicate against partitionValues
    assert (
        eng.sql(
            "SELECT count(*) AS n FROM glue.db.t WHERE p = 'a:b'"
        ).first().n
        == 1
    )
    # UPDATE computing a special-char partition value MOVES the row
    # and commits the logical value
    eng.sql("UPDATE glue.db.t SET p = 'x/y' WHERE id = 2")
    assert (
        eng.sql(
            "SELECT count(*) AS n FROM glue.db.t WHERE p = 'x/y'"
        ).first().n
        == 1
    )
    assert (loc / "p=x%2Fy").is_dir()


def test_delta_null_partition_value(spark, tmp_path):
    from glue_table_cache_spark.sinks.delta_write import (
        write_delta_append,
    )

    loc = tmp_path / "dtn"
    write_delta_append(
        spark.createDataFrame(
            [(1, None), (2, "a")], "id long, p string"
        ),
        str(loc),
        partition_by=["p"],
    )
    assert (loc / f"p={HIVE_NULL}").is_dir()
    adds = [
        json.loads(line)["add"]
        for line in (loc / "_delta_log" / f"{0:020d}.json")
        .read_text()
        .splitlines()
        if '"add"' in line
    ]
    vals = {a["partitionValues"]["p"] for a in adds}
    assert vals == {None, "a"}  # JSON null, never the sentinel
    eng = _engine_for(
        spark, loc, {"spark.sql.sources.provider": "delta"}
    )
    assert (
        eng.sql(
            "SELECT count(*) AS n FROM glue.db.t WHERE p IS NULL"
        ).first().n
        == 1
    )


def test_iceberg_partition_value_special_chars(spark, tmp_path):
    """Identity-partitioned Iceberg: the manifest tuple carries the
    logical value so identity re-attachment reconstructs the true
    column value (not the escaped spelling)."""
    from glue_table_cache_spark.sinks.iceberg_write import (
        write_iceberg_append,
    )
    from glue_table_cache_spark.sources.iceberg import (
        iceberg_scan_details,
    )

    loc = tmp_path / "ice"
    write_iceberg_append(
        spark.createDataFrame(
            [(1, "a:b"), (2, None)], "id long, p string"
        ),
        str(loc),
        partition_by=["p"],
    )
    entries, _pd, _ed = iceberg_scan_details(str(loc))
    vals = {pv.get("p") for _p, pv, _s in entries}
    assert vals == {"a:b", None}
    eng = _engine_for(spark, loc, {"table_type": "ICEBERG"})
    got = {
        r.id: r.p for r in eng.sql("SELECT * FROM glue.db.t").collect()
    }
    assert got == {1: "a:b", 2: None}
    assert (
        eng.sql(
            "SELECT count(*) AS n FROM glue.db.t WHERE p = 'a:b'"
        ).first().n
        == 1
    )


def test_delta_checkpoint_roundtrip_special_char_partition(
    spark, tmp_path
):
    """Regression: checkpoint replay must key state on DECODED paths.
    The commit JSON stores ``p=a%3Ab/...`` percent-encoded
    (``p=a%253Ab``); a replay that ingests the raw string and then
    re-quotes at checkpoint time compounds one encoding level per
    checkpoint, after which the reader's single unquote resolves a
    nonexistent path.  Two checkpoint generations + log cleanup +
    vacuum must keep the table scannable."""
    from glue_table_cache_spark.sinks.delta_checkpoint import (
        clean_delta_log,
        write_delta_checkpoint,
    )
    from glue_table_cache_spark.sinks.delta_optimize import (
        vacuum_delta,
    )
    from glue_table_cache_spark.sinks.delta_write import (
        write_delta_append,
    )

    loc = tmp_path / "dtc"
    for i in range(3):
        write_delta_append(
            spark.createDataFrame(
                [(i, "a:b"), (100 + i, "plain sp")],
                "id long, p string",
            ),
            str(loc),
            partition_by=["p"],
            checkpoint_interval=None,
        )
    log = loc / "_delta_log"
    v1 = write_delta_checkpoint(str(loc))
    # the checkpoint row carries EXACTLY ONE encoding level: a single
    # unquote must resolve to a file that exists on disk
    import io
    from urllib.parse import unquote

    import pyarrow.parquet as pq

    def _cp_paths(version):
        cp = log / f"{version:020d}.checkpoint.parquet"
        tbl = pq.ParquetFile(io.BytesIO(cp.read_bytes())).read(
            columns=["add"]
        )
        return [
            r["path"] for r in tbl.column("add").to_pylist() if r
        ]

    # the disk dir is hive-escaped p=a%3Ab, so the log/checkpoint
    # spelling is p=a%253Ab (ONE quote level); a compounding replay
    # would emit %25253A
    for raw in _cp_paths(v1):
        assert (loc / unquote(raw)).is_file(), raw
        assert "%2525" not in raw, f"double-encoded path: {raw}"

    clean_delta_log(str(loc), retention_hours=0, dry_run=False)
    eng = _engine_for(
        spark, loc, {"spark.sql.sources.provider": "delta"}
    )
    assert eng.sql(
        "SELECT count(*) AS n FROM glue.db.t WHERE p = 'a:b'"
    ).first().n == 3

    # generation 2: a DELETE (remove actions), another append, a NEW
    # checkpoint built FROM the first one, cleanup, vacuum, scan
    eng.sql("DELETE FROM glue.db.t WHERE id = 0")
    write_delta_append(
        spark.createDataFrame([(7, "a:b")], "id long, p string"),
        str(loc),
        partition_by=["p"],
        checkpoint_interval=None,
    )
    v2 = write_delta_checkpoint(str(loc))
    assert v2 > v1
    for raw in _cp_paths(v2):
        assert (loc / unquote(raw)).is_file(), raw
        assert "%2525" not in raw, f"double-encoded path: {raw}"
    clean_delta_log(str(loc), retention_hours=0, dry_run=False)
    vacuum_delta(str(loc), retention_hours=0, dry_run=False)
    got = sorted(
        r.id
        for r in eng.sql(
            "SELECT id FROM glue.db.t WHERE p = 'a:b'"
        ).collect()
    )
    assert got == [1, 2, 7]
    assert eng.sql(
        "SELECT count(*) AS n FROM glue.db.t WHERE p = 'plain sp'"
    ).first().n == 3


def test_hudi_non_ascii_partition_value_dml(spark, tmp_path):
    """Non-ASCII partition values reach disk RAW (hive escapePathName
    does not escape them) and Spark's ``_metadata.file_path`` keeps
    them literal too — so the ``hadoop_uri_encode`` join in
    ``_tag_with_partition_columns`` must still match every file.  A
    silent mismatch here under-deletes (files never evaluated)."""
    from glue_table_cache_spark.sinks.hudi_write import (
        write_hudi_append,
    )

    loc = tmp_path / "hnap"
    write_hudi_append(
        spark.createDataFrame(
            [(1, "café", 1.0), (2, "日本", 2.0), (3, "café", 3.0)],
            "id long, part string, x double",
        ),
        str(loc),
        partition_by=["part"],
    )
    assert (loc / "part=café").is_dir()
    eng = _engine_for(spark, loc, {"hoodie.table.name": "t"})
    assert eng.sql(
        "DELETE FROM glue.db.t WHERE part = 'café' AND id = 1"
    ).first().rows_deleted == 1
    assert eng.sql(
        "UPDATE glue.db.t SET x = x * 10 WHERE part = '日本'"
    ).first().rows_updated == 1
    rows = sorted(
        (r.id, r.part, r.x)
        for r in eng.sql("SELECT * FROM glue.db.t").collect()
    )
    assert rows == [(2, "日本", 20.0), (3, "café", 3.0)]


def test_delta_non_ascii_partition_merge_respects_dvs(spark, tmp_path):
    """MERGE on a Delta table whose non-ASCII-partition file carries a
    deletion vector: the ``_path_uri``-keyed DV anti-join must match
    the file (literal non-ASCII both sides) or the DV-deleted row
    resurrects into the merge evaluation."""
    from glue_table_cache_spark.sinks.delta_write import (
        write_delta_append,
    )

    loc = tmp_path / "dnap"
    write_delta_append(
        spark.createDataFrame(
            [(1, "café", 1.0), (2, "café", 2.0), (3, "ascii", 3.0)],
            "id long, part string, x double",
        ),
        str(loc),
        partition_by=["part"],
    )
    eng = _engine_for(
        spark, loc, {"spark.sql.sources.provider": "delta"}
    )
    # DV-delete id=1 inside the café partition
    assert eng.sql(
        "DELETE FROM glue.db.t WHERE id = 1"
    ).first().rows_deleted == 1
    # general MERGE: if the DV anti-join missed the café file, id=1
    # would re-match and resurrect via the UPDATE branch
    eng.sql(
        "MERGE INTO glue.db.t t USING "
        "(SELECT * FROM VALUES (1, 100.0), (2, 200.0) AS s(id, nx)) s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET x = s.nx "
        "WHEN NOT MATCHED THEN INSERT (id, part, x) "
        "VALUES (s.id, 'new:part', s.nx)"
    )
    rows = sorted(
        (r.id, r.part, r.x)
        for r in eng.sql("SELECT * FROM glue.db.t").collect()
    )
    # id=1 was DV-dead → NOT MATCHED → inserted fresh into new:part
    assert rows == [
        (1, "new:part", 100.0),
        (2, "café", 200.0),
        (3, "ascii", 3.0),
    ]
    assert (loc / "part=new%3Apart").is_dir()
