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
