"""NESTED Delta column mapping: scans rename physical→logical
recursively through struct fields (a positional struct cast — column
mapping preserves field order), arrays of structs included; the DML
writers keep refusing nested-mapped tables cleanly."""

import json

import pytest

from glue_table_cache_spark.catalog import LocalMetadataStore
from glue_table_cache_spark.engine import GlueSparkEngine
from glue_table_cache_spark.errors import GlueSparkError


def _nested_mapped_table(spark, base):
    """A column-mapped table whose files carry PHYSICAL names at
    every level: col-a(id), col-s(struct<col-x, col-y>),
    col-l(array<struct<col-q>>)."""
    base.mkdir(parents=True)
    df = spark.createDataFrame(
        [
            (1, (10, "ten"), [(100,), (101,)]),
            (2, (20, "twenty"), [(200,)]),
        ],
        "`col-a` long, `col-s` struct<`col-x`: long, `col-y`: string>, "
        "`col-l` array<struct<`col-q`: long>>",
    )
    stage = base / "_stage"
    df.coalesce(1).write.mode("overwrite").parquet(str(stage))
    rel = "part-0.parquet"
    next(stage.glob("part-*.parquet")).rename(base / rel)
    import shutil

    shutil.rmtree(stage)
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "id",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-a",
                },
            },
            {
                "name": "s",
                "type": {
                    "type": "struct",
                    "fields": [
                        {
                            "name": "x",
                            "type": "long",
                            "nullable": True,
                            "metadata": {
                                "delta.columnMapping.id": 3,
                                "delta.columnMapping.physicalName": "col-x",  # noqa: E501
                            },
                        },
                        {
                            "name": "y",
                            "type": "string",
                            "nullable": True,
                            "metadata": {
                                "delta.columnMapping.id": 4,
                                "delta.columnMapping.physicalName": "col-y",  # noqa: E501
                            },
                        },
                    ],
                },
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-s",
                },
            },
            {
                "name": "items",
                "type": {
                    "type": "array",
                    "elementType": {
                        "type": "struct",
                        "fields": [
                            {
                                "name": "q",
                                "type": "long",
                                "nullable": True,
                                "metadata": {
                                    "delta.columnMapping.id": 6,
                                    "delta.columnMapping.physicalName": "col-q",  # noqa: E501
                                },
                            }
                        ],
                    },
                    "containsNull": True,
                },
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 5,
                    "delta.columnMapping.physicalName": "col-l",
                },
            },
        ],
    }
    log = base / "_delta_log"
    log.mkdir()
    actions = [
        {
            "metaData": {
                "id": "m",
                "schemaString": json.dumps(schema),
                "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "6",
                },
                "format": {"provider": "parquet", "options": {}},
            }
        },
        {
            "protocol": {
                "minReaderVersion": 2,
                "minWriterVersion": 5,
            }
        },
        {
            "add": {
                "path": rel,
                "partitionValues": {},
                "size": (base / rel).stat().st_size,
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    (log / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions) + "\n"
    )


def _engine(spark, base):
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "t", str(base),
        parameters={"spark.sql.sources.provider": "delta"},
    )
    return GlueSparkEngine(spark, store)


def test_nested_mapped_scan(spark, tmp_path):
    base = tmp_path / "nm"
    _nested_mapped_table(spark, base)
    eng = _engine(spark, base)
    df = eng.sql("SELECT * FROM glue.db.t")
    assert df.columns == ["id", "s", "items"]
    assert [f.name for f in df.schema["s"].dataType.fields] == [
        "x", "y",
    ]
    rows = eng.sql(
        "SELECT id, s.x AS sx, s.y AS sy, items[0].q AS q0 "
        "FROM glue.db.t ORDER BY id"
    ).collect()
    assert [(r.id, r.sx, r.sy, r.q0) for r in rows] == [
        (1, 10, "ten", 100),
        (2, 20, "twenty", 200),
    ]
    # nested predicates work over the logical names
    assert (
        eng.sql(
            "SELECT count(*) AS n FROM glue.db.t WHERE s.x = 20"
        ).first().n
        == 1
    )


def test_nested_mapped_dml_refuses(spark, tmp_path):
    base = tmp_path / "nmw"
    _nested_mapped_table(spark, base)
    eng = _engine(spark, base)
    with pytest.raises(GlueSparkError, match="nested"):
        eng.sql("DELETE FROM glue.db.t WHERE id = 1")
    with pytest.raises(GlueSparkError, match="nested"):
        eng.sql("UPDATE glue.db.t SET id = 3 WHERE id = 1")
    # the table is untouched
    assert (
        eng.sql("SELECT count(*) AS n FROM glue.db.t").first().n == 2
    )
