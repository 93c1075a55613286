"""NESTED Delta column mapping: scans rename physical→logical
recursively through struct fields (a positional struct cast — column
mapping preserves field order), arrays of structs included; the DML
writers (r12) stage rewrites back under nested PHYSICAL names via
the write-direction twin of the same cast."""

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


def test_nested_mapped_dml(spark, tmp_path):
    """DELETE / UPDATE / MERGE / append on a NESTED column-mapped
    table (r12): predicates resolve over logical names (nested
    levels included), rewrites land under physical names at EVERY
    level, and the scan round-trips the values."""
    import pyarrow.parquet as pq

    from glue_table_cache_spark.sinks.delta_merge import (
        merge_into_delta,
    )
    from glue_table_cache_spark.sinks.delta_write import (
        write_delta_append,
    )
    from glue_table_cache_spark.sources.delta import delta_scan_info

    base = tmp_path / "nmw"
    _nested_mapped_table(spark, base)
    eng = _engine(spark, base)
    # DELETE via a NESTED logical predicate (DV path)
    eng.sql("DELETE FROM glue.db.t WHERE s.x = 10")
    eng.invalidate_table("db", "t")
    assert [
        (r.id, r.sx) for r in eng.sql(
            "SELECT id, s.x AS sx FROM glue.db.t ORDER BY id"
        ).collect()
    ] == [(2, 20)]
    # UPDATE (file rewrite): nested values survive untouched
    eng.sql("UPDATE glue.db.t SET id = 3 WHERE s.y = 'twenty'")
    eng.invalidate_table("db", "t")
    got = eng.sql(
        "SELECT id, s.x AS sx, s.y AS sy, items[0].q AS q0 "
        "FROM glue.db.t"
    ).collect()
    assert [(r.id, r.sx, r.sy, r.q0) for r in got] == [
        (3, 20, "twenty", 200)
    ]
    # MERGE (whole-row): matched update + unmatched insert, nested
    # struct/array values flowing both ways
    src = spark.createDataFrame(
        [
            (3, (33, "thirty-three"), [(300,)]),
            (9, (90, "ninety"), [(900,), (901,)]),
        ],
        "id long, s struct<x: long, y: string>, "
        "items array<struct<q: long>>",
    )
    merge_into_delta(spark, str(base), src, on="id")
    # append with a logical-named batch
    write_delta_append(
        spark.createDataFrame(
            [(4, (40, "forty"), [(400,)])],
            "id long, s struct<x: long, y: string>, "
            "items array<struct<q: long>>",
        ),
        str(base),
    )
    eng.invalidate_table("db", "t")
    got = eng.sql(
        "SELECT id, s.x AS sx, s.y AS sy, items[0].q AS q0 "
        "FROM glue.db.t ORDER BY id"
    ).collect()
    assert [(r.id, r.sx, r.sy, r.q0) for r in got] == [
        (3, 33, "thirty-three", 300),
        (4, 40, "forty", 400),
        (9, 90, "ninety", 900),
    ]
    # on-disk contract: every live file spells PHYSICAL names at
    # every level
    entries, _r, _ls, _ps = delta_scan_info(
        str(base), with_schema=True, allow_nested_mapping=True,
        with_physical_schema=True,
    )
    for p, _pv, _dv in entries:
        sch = pq.read_schema(p)
        assert "col-a" in sch.names and "col-s" in sch.names
        s_type = sch.field("col-s").type
        assert [s_type.field(i).name for i in range(2)] == [
            "col-x", "col-y",
        ]
        q_struct = sch.field("col-l").type.value_type
        assert q_struct.field(0).name == "col-q"


def test_nested_mapped_optimize_preserves_values(spark, tmp_path):
    """OPTIMIZE on a (nested) column-mapped table rewrites under
    PHYSICAL spellings end to end — values survive byte-for-byte and
    the rewritten files never get silently re-keyed to logical names
    (the r11 Iceberg OPTIMIZE data-loss shape)."""
    import pyarrow.parquet as pq

    from glue_table_cache_spark.sinks.delta_optimize import (
        optimize_delta,
    )
    from glue_table_cache_spark.sinks.delta_write import (
        write_delta_append,
    )
    from glue_table_cache_spark.sources.delta import delta_scan_info

    base = tmp_path / "nmopt"
    _nested_mapped_table(spark, base)
    # a second file so compaction has something to merge
    write_delta_append(
        spark.createDataFrame(
            [(5, (50, "fifty"), [(500,)])],
            "id long, s struct<x: long, y: string>, "
            "items array<struct<q: long>>",
        ),
        str(base),
    )
    before = sorted(
        (r.id, r.s.x, r.s.y, tuple(i.q for i in r.items))
        for r in _engine(spark, base)
        .sql("SELECT * FROM glue.db.t")
        .collect()
    )
    v = optimize_delta(spark, str(base), min_files_per_partition=2)
    assert v is not None
    eng = _engine(spark, base)
    after = sorted(
        (r.id, r.s.x, r.s.y, tuple(i.q for i in r.items))
        for r in eng.sql("SELECT * FROM glue.db.t").collect()
    )
    assert after == before
    entries, _r, _ls, _ps = delta_scan_info(
        str(base), with_schema=True, allow_nested_mapping=True,
        with_physical_schema=True,
    )
    assert len(entries) == 1  # compacted
    sch = pq.read_schema(entries[0][0])
    assert "col-a" in sch.names
    s_type = sch.field("col-s").type
    assert [s_type.field(i).name for i in range(2)] == [
        "col-x", "col-y",
    ]


def test_nested_mapped_dml_with_cdf(spark, tmp_path):
    """CDF-enabled nested-mapped table: the cdc files a DELETE writes
    spell physical names (the data files' contract) and the CDF read
    maps them back to the logical schema, nested levels included."""
    import json as _json

    from glue_table_cache_spark.sources.delta import delta_cdf

    base = tmp_path / "nmcdf"
    _nested_mapped_table(spark, base)
    v0 = base / "_delta_log" / f"{0:020d}.json"
    lines = v0.read_text().splitlines()
    patched = []
    for ln in lines:
        a = _json.loads(ln)
        if a.get("metaData"):
            a["metaData"]["configuration"][
                "delta.enableChangeDataFeed"
            ] = "true"
        patched.append(_json.dumps(a))
    v0.write_text("\n".join(patched) + "\n")
    eng = _engine(spark, base)
    eng.sql("DELETE FROM glue.db.t WHERE s.x = 10")
    changes = delta_cdf(spark, str(base), since_version=0)
    dels = changes.where("_change_type = 'delete'").collect()
    assert [(r.id, r.s.x, r.s.y) for r in dels] == [(1, 10, "ten")]


def test_nested_mapped_streaming(spark, tmp_path):
    """delta_lite streams a NESTED column-mapped table (r13): the
    last batch/stream asymmetry.  Rows arrive under the logical
    schema (struct/array levels relabeled positionally from the
    physical spellings), a mid-stream append flows, and
    readChangeFeed delivers logical-named change rows."""
    from glue_table_cache_spark.sinks.delta_write import (
        write_delta_append,
    )
    from glue_table_cache_spark.streaming.delta_source import (
        read_delta_stream,
    )

    base = tmp_path / "nstream"
    _nested_mapped_table(spark, base)

    seen: list = []
    q = (
        read_delta_stream(spark, str(base))
        .writeStream.foreachBatch(
            lambda df, bid: seen.extend(df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    assert sorted(
        (r.id, r.s.x, r.s.y, [e.q for e in r.items]) for r in seen
    ) == [(1, 10, "ten", [100, 101]), (2, 20, "twenty", [200])]

    # mid-stream append through the nested-mapped writer (logical
    # names in, physical names on disk)
    write_delta_append(
        spark.createDataFrame(
            [(3, (30, "thirty"), [(300,)])],
            "id long, s struct<x: long, y: string>, "
            "items array<struct<q: long>>",
        ),
        str(base),
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(r.id for r in seen) == [1, 2, 3]
    assert [
        (r.s.x, [e.q for e in r.items]) for r in seen if r.id == 3
    ] == [(30, [300])]

    # CDF mode: logical-named change rows with the change metadata
    changes: list = []
    q2 = (
        read_delta_stream(spark, str(base), read_change_feed=True)
        .writeStream.foreachBatch(
            lambda df, bid: changes.extend(df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    assert {r._change_type for r in changes} == {"insert"}
    assert sorted((r.id, r.s.y) for r in changes) == [
        (1, "ten"), (2, "twenty"), (3, "thirty"),
    ]


def _partitioned_mapped_table(spark, base):
    """A flat column-mapped PARTITIONED table: logical (id, v, p) with
    physical (col-1, col-2, col-p); data files under physical
    ``col-p=<v>`` dirs, add partitionValues keyed physically — the
    shape real mapped writers produce."""
    base.mkdir(parents=True)
    files = []
    for i, (pval, rows) in enumerate(
        [
            ("a", [(1, "x")]),
            ("a", [(2, "y")]),
            ("b", [(3, "z")]),
            ("b", [(4, "w")]),
        ]
    ):
        df = spark.createDataFrame(
            rows, "`col-1` long, `col-2` string"
        )
        stage = base / f"_s{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        rel = f"col-p={pval}/part-{i}.parquet"
        (base / f"col-p={pval}").mkdir(exist_ok=True)
        next(stage.glob("part-*.parquet")).rename(base / rel)
        import shutil

        shutil.rmtree(stage)
        files.append((rel, pval))
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "id", "type": "long", "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-1",
                },
            },
            {
                "name": "v", "type": "string", "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-2",
                },
            },
            {
                "name": "p", "type": "string", "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 3,
                    "delta.columnMapping.physicalName": "col-p",
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
                "partitionColumns": ["p"],
                "configuration": {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "3",
                },
                "format": {"provider": "parquet", "options": {}},
            }
        },
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
    ] + [
        {
            "add": {
                "path": rel,
                "partitionValues": {"col-p": pval},
                "size": (base / rel).stat().st_size,
                "modificationTime": 0,
                "dataChange": True,
            }
        }
        for rel, pval in files
    ]
    (log / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions) + "\n"
    )


def test_partitioned_mapped_optimize(spark, tmp_path):
    """OPTIMIZE on a table that is both PARTITIONED and column-mapped
    (r13; previously refused): each partition compacts under its
    physical ``k=v`` directory, the new adds preserve the
    physical-keyed partition tuples, values survive, and a WHERE
    predicate (logical names) scopes the rewrite."""
    from glue_table_cache_spark.sinks.delta_optimize import (
        optimize_delta,
    )
    from glue_table_cache_spark.sources.delta import delta_scan_info

    base = tmp_path / "pmopt"
    _partitioned_mapped_table(spark, base)

    def state():
        entries, renames = delta_scan_info(
            str(base), allow_nested_mapping=True
        )
        assert renames == {"col-1": "id", "col-2": "v", "col-p": "p"}
        rows = []
        for path, pv, _dv in entries:
            for r in spark.read.parquet(path).collect():
                rows.append((r["col-1"], r["col-2"], pv["col-p"]))
        return entries, sorted(rows)

    entries0, rows0 = state()
    assert len(entries0) == 4
    # scoped rewrite: only partition a compacts
    v = optimize_delta(
        spark, str(base), partition_predicate="p = 'a'"
    )
    assert v is not None
    entries1, rows1 = state()
    assert rows1 == rows0
    by_part: dict = {}
    for path, pv, _dv in entries1:
        by_part.setdefault(pv["col-p"], []).append(path)
    assert len(by_part["a"]) == 1 and len(by_part["b"]) == 2
    assert "col-p=a/" in by_part["a"][0]
    # full rewrite compacts the rest
    v2 = optimize_delta(spark, str(base))
    assert v2 is not None
    entries2, rows2 = state()
    assert rows2 == rows0
    assert len(entries2) == 2
    for path, pv, _dv in entries2:
        assert f"col-p={pv['col-p']}/" in path


def test_streaming_graft_refuses_nested_field_drift(spark, tmp_path):
    """r14 (ADVICE r13): the streaming reader's nested relabel matches
    by PHYSICAL NAME from the schemaString mapping tree — a file whose
    struct dropped one mapped field and added another at the SAME
    arity must fail loudly, not silently serve the new field's data
    under the dropped field's logical name."""
    import pytest as _pytest

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from glue_table_cache_spark.sources.delta import (
        column_mapping_name_tree,
    )
    from glue_table_cache_spark.streaming.delta_source import (
        read_file_partition,
    )

    base = tmp_path / "drift"
    base.mkdir()
    # the FILE: same arity as the mapped schema, but physical col-x
    # was dropped and col-z added in its place
    df = spark.createDataFrame(
        [(1, (99, "ten"))],
        "`col-a` long, "
        "`col-s` struct<`col-z`: long, `col-y`: string>",
    )
    stage = base / "_stage"
    df.coalesce(1).write.mode("overwrite").parquet(str(stage))
    path = str(next(stage.glob("part-*.parquet")))
    meta = {
        "configuration": {"delta.columnMapping.mode": "name"},
        "schemaString": json.dumps(
            {
                "type": "struct",
                "fields": [
                    {
                        "name": "id", "type": "long",
                        "nullable": True,
                        "metadata": {
                            "delta.columnMapping.physicalName": "col-a"
                        },
                    },
                    {
                        "name": "s",
                        "type": {
                            "type": "struct",
                            "fields": [
                                {
                                    "name": "x", "type": "long",
                                    "nullable": True,
                                    "metadata": {
                                        "delta.columnMapping.physicalName": "col-x"  # noqa: E501
                                    },
                                },
                                {
                                    "name": "y", "type": "string",
                                    "nullable": True,
                                    "metadata": {
                                        "delta.columnMapping.physicalName": "col-y"  # noqa: E501
                                    },
                                },
                            ],
                        },
                        "nullable": True,
                        "metadata": {
                            "delta.columnMapping.physicalName": "col-s"
                        },
                    },
                ],
            }
        ),
    }
    tree = column_mapping_name_tree(meta)
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField(
                "s",
                StructType(
                    [
                        StructField("x", LongType()),
                        StructField("y", StringType()),
                    ]
                ),
            ),
        ]
    )
    with _pytest.raises(Exception):
        list(
            read_file_partition(
                path,
                {},
                schema,
                physical_names={"id": "col-a", "s": "col-s"},
                name_tree=tree,
            )
        )
    # sanity: a MATCHING file under the same tree relabels cleanly
    ok = spark.createDataFrame(
        [(1, (10, "ten"))],
        "`col-a` long, "
        "`col-s` struct<`col-x`: long, `col-y`: string>",
    )
    stage2 = base / "_stage2"
    ok.coalesce(1).write.mode("overwrite").parquet(str(stage2))
    path2 = str(next(stage2.glob("part-*.parquet")))
    batches = list(
        read_file_partition(
            path2,
            {},
            schema,
            physical_names={"id": "col-a", "s": "col-s"},
            name_tree=tree,
        )
    )
    rows = [r for b in batches for r in b.to_pylist()]
    assert rows == [{"id": 1, "s": {"x": 10, "y": "ten"}}]


def test_partitioned_mapped_update_and_merge(spark, tmp_path):
    """UPDATE and column-level MERGE on a table that is both
    PARTITIONED and column-mapped (r14; previously refused): the
    rewrite plans logically, stages under PHYSICAL k=v directories,
    and the new adds carry physical-keyed partition tuples — the r13
    OPTIMIZE contract extended to the DML rewrites."""
    from glue_table_cache_spark.catalog import LocalMetadataStore
    from glue_table_cache_spark.engine import GlueSparkEngine
    from glue_table_cache_spark.sources.delta import delta_scan_info

    base = tmp_path / "pmdml"
    _partitioned_mapped_table(spark, base)
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "pm", str(base),
        parameters={"spark.sql.sources.provider": "delta"},
    )
    eng = GlueSparkEngine(spark, store)

    def rows():
        return sorted(
            (r.id, r.v, r.p)
            for r in eng.sql(
                "SELECT id, v, p FROM glue.db.pm"
            ).collect()
        )

    assert rows() == [
        (1, "x", "a"), (2, "y", "a"), (3, "z", "b"), (4, "w", "b"),
    ]
    out = eng.sql(
        "UPDATE glue.db.pm SET v = 'X' WHERE id = 1"
    ).collect()
    assert out[0].rows_updated == 1
    assert rows() == [
        (1, "X", "a"), (2, "y", "a"), (3, "z", "b"), (4, "w", "b"),
    ]
    # the rewrite landed under the PHYSICAL partition dir with a
    # physical-keyed partition tuple
    entries, renames = delta_scan_info(
        str(base), allow_nested_mapping=True
    )
    assert renames is not None
    new = [e for e in entries if "_staging" not in e[0]]
    assert all("col-p=" in p for p, _pv, _dv in new)
    assert all(set(pv) == {"col-p"} for _p, pv, _dv in new)
    # column-level MERGE: update one partition, insert into another
    eng.sql(
        """
        MERGE INTO glue.db.pm t
        USING (SELECT 4 AS id, 'W2' AS v, 'b' AS p
               UNION ALL SELECT 9, 'n', 'c') s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (id, v, p) VALUES (s.id, s.v, s.p)
        """
    ).collect()
    assert rows() == [
        (1, "X", "a"), (2, "y", "a"), (3, "z", "b"),
        (4, "W2", "b"), (9, "n", "c"),
    ]
    entries2, _r = delta_scan_info(
        str(base), allow_nested_mapping=True
    )
    assert any(
        pv.get("col-p") == "c" for _p, pv, _dv in entries2
    )
