"""Iceberg SQL inspection tables: ``glue.db.t.snapshots`` /
``.files`` / ``.manifests`` / ``.history`` / ``.refs`` /
``.partitions`` resolve in the transformer to DataFrames from the
existing metadata walks (public Iceberg spec "Metadata tables"
shapes); non-Iceberg formats refuse with the DESCRIBE HISTORY
pointer."""

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


@pytest.fixture()
def ice_engine(spark, tmp_path):
    from glue_table_cache_spark.sinks.iceberg_write import (
        write_iceberg_append,
    )

    loc = tmp_path / "ice"
    write_iceberg_append(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, v string"
        ),
        str(loc),
    )  # seq 1
    write_iceberg_append(
        spark.createDataFrame([(3, "c")], "id long, v string"),
        str(loc),
    )  # seq 2
    return _engine_for(spark, loc, {"table_type": "ICEBERG"}), loc


def test_snapshots_table(spark, ice_engine):
    eng, _loc = ice_engine
    rows = eng.sql(
        "SELECT snapshot_id, operation, manifest_list "
        "FROM glue.db.t.snapshots ORDER BY snapshot_id"
    ).collect()
    assert len(rows) == 2
    assert all(r.manifest_list for r in rows)
    assert {r.operation for r in rows} <= {"append", "overwrite"}
    cols = eng.sql("SELECT * FROM glue.db.t.snapshots").columns
    assert cols == [
        "committed_at", "snapshot_id", "parent_id", "operation",
        "manifest_list", "summary",
    ]


def test_history_table(spark, ice_engine):
    eng, _loc = ice_engine
    rows = eng.sql(
        "SELECT * FROM glue.db.t.history ORDER BY snapshot_id"
    ).collect()
    assert len(rows) == 2
    assert all(r.is_current_ancestor for r in rows)
    assert rows[0].made_current_at is not None


def test_manifests_table(spark, ice_engine):
    eng, _loc = ice_engine
    rows = eng.sql("SELECT * FROM glue.db.t.manifests").collect()
    # the current snapshot's manifest list: prior manifest carried
    # over + the second append's
    assert len(rows) >= 2
    assert all(r.content == 0 for r in rows)
    assert all(r.path.startswith("metadata/") for r in rows)


def test_files_table(spark, ice_engine):
    eng, loc = ice_engine
    rows = eng.sql(
        "SELECT content, file_path, record_count, "
        "file_size_in_bytes FROM glue.db.t.files"
    ).collect()
    data = [r for r in rows if r.content == 0]
    assert sum(r.record_count for r in data) == 3
    assert all(r.file_size_in_bytes > 0 for r in data)
    # a DELETE adds a position-delete file with content=1
    eng.sql("DELETE FROM glue.db.t WHERE id = 1")
    rows = eng.sql("SELECT content FROM glue.db.t.files").collect()
    assert any(r.content == 1 for r in rows)
    # ...and the engine joins metadata tables with the data freely
    n = eng.sql(
        "SELECT count(*) AS n FROM glue.db.t a JOIN "
        "glue.db.t.files f ON f.content = 0"
    ).first().n
    assert n > 0


def test_metadata_tables_join_and_masking(spark, ice_engine):
    eng, _loc = ice_engine
    # a string literal mentioning the shape is NOT rewritten
    row = eng.sql(
        "SELECT 'glue.db.t.snapshots' AS lit, count(*) AS n "
        "FROM glue.db.t.snapshots GROUP BY lit"
    ).first()
    assert row.lit == "glue.db.t.snapshots" and row.n == 2


def test_refs_table(spark, ice_engine):
    from glue_table_cache_spark.sinks.iceberg_write import (
        create_iceberg_ref,
    )

    eng, loc = ice_engine
    assert eng.sql("SELECT * FROM glue.db.t.refs").count() == 0
    create_iceberg_ref(str(loc), "rel-1", ref_type="tag")
    create_iceberg_ref(str(loc), "dev", ref_type="branch")
    eng.invalidate_table("db", "t")
    rows = {
        r.name: r.type
        for r in eng.sql("SELECT * FROM glue.db.t.refs").collect()
    }
    assert rows == {"rel-1": "TAG", "dev": "BRANCH"}


def test_partitions_table(spark, tmp_path):
    from glue_table_cache_spark.sinks.iceberg_write import (
        write_iceberg_append,
    )

    loc = tmp_path / "pice"
    write_iceberg_append(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)],
            "id long, p string, x double",
        ),
        str(loc),
        partition_by=["p"],
    )
    eng = _engine_for(spark, loc, {"table_type": "ICEBERG"})
    rows = eng.sql(
        "SELECT partition['p'] AS p, record_count, file_count "
        "FROM glue.db.t.partitions ORDER BY p"
    ).collect()
    assert [(r.p, r.record_count) for r in rows] == [
        ("a", 2), ("b", 1),
    ]
    assert all(r.file_count >= 1 for r in rows)


def test_non_iceberg_refuses(spark, tmp_path):
    from glue_table_cache_spark.sinks.delta_write import (
        write_delta_append,
    )

    loc = tmp_path / "dt"
    write_delta_append(
        spark.createDataFrame([(1,)], "id long"), str(loc)
    )
    eng = _engine_for(
        spark, loc, {"spark.sql.sources.provider": "delta"}
    )
    with pytest.raises(GlueSparkError, match="DESCRIBE HISTORY"):
        eng.sql("SELECT * FROM glue.db.t.snapshots")


def test_metadata_table_time_travel(spark, ice_engine):
    """VERSION AS OF pins the metadata walk to that sequence number:
    seq 1's .files sees only the first append; an unknown sequence
    refuses with the available ones."""
    eng, _loc = ice_engine
    n1 = eng.sql(
        "SELECT sum(record_count) AS n "
        "FROM glue.db.t.files VERSION AS OF 1"
    ).first().n
    assert n1 == 2
    n2 = eng.sql(
        "SELECT sum(record_count) AS n "
        "FROM glue.db.t.files VERSION AS OF 2"
    ).first().n
    assert n2 == 3
    # both versions usable in ONE query (distinct temp views)
    row = eng.sql(
        "SELECT (SELECT count(*) FROM glue.db.t.snapshots "
        "VERSION AS OF 1) AS a, "
        "(SELECT count(*) FROM glue.db.t.snapshots) AS b"
    ).first()
    assert (row.a, row.b) == (1, 2)
    with pytest.raises(GlueSparkError, match="no Iceberg metadata"):
        eng.sql("SELECT * FROM glue.db.t.files VERSION AS OF 99")
