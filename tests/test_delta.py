"""Delta Lake log-walk tests: active-set reconstruction, removes,
orphan hygiene, checkpoints, time travel, and the engine scan path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glue_table_cache_spark.catalog import LocalMetadataStore
from glue_table_cache_spark.engine import GlueSparkEngine
from glue_table_cache_spark.errors import GlueSparkError
from glue_table_cache_spark.sources.delta import delta_data_files
from glue_table_cache_spark.sources.delta_fixture import build_delta_table


@pytest.fixture()
def frames(spark):
    a = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    b = spark.createDataFrame([(3, "c")], "id long, v string")
    c = spark.createDataFrame([(4, "d"), (5, "e")], "id long, v string")
    return a, b, c


def test_active_set_add_then_remove(spark, tmp_path, frames):
    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [
            {"add": [a, b]},                              # v0
            {"add": [c], "remove": ["part-0-1.parquet"]}  # v1 drops b
        ],
        orphan=a,
    )
    paths = delta_data_files(str(base))
    names = {p.rsplit("/", 1)[1] for p in paths}
    assert names == {"part-0-0.parquet", "part-1-0.parquet"}
    # orphan.parquet sits in the directory but is invisible to the walk
    rows = {r.id for r in spark.read.parquet(*paths).collect()}
    assert rows == {1, 2, 4, 5}


def test_time_travel_version_offset(tmp_path, frames, spark):
    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [{"add": [a]}, {"add": [b]}, {"remove": ["part-0-0.parquet"]}],
    )
    latest = {p.rsplit("/", 1)[1] for p in delta_data_files(str(base))}
    assert latest == {"part-1-0.parquet"}
    v1 = {
        p.rsplit("/", 1)[1]
        for p in delta_data_files(str(base), version_offset=1)
    }
    assert v1 == {"part-0-0.parquet", "part-1-0.parquet"}
    v0 = {
        p.rsplit("/", 1)[1]
        for p in delta_data_files(str(base), version_offset=2)
    }
    assert v0 == {"part-0-0.parquet"}
    with pytest.raises(GlueSparkError, match="version_offset"):
        delta_data_files(str(base), version_offset=3)


def test_checkpoint_replaces_cleaned_commits(tmp_path, frames):
    """With commits <= checkpoint version deleted (Delta log cleanup),
    reconstruction MUST come from the checkpoint parquet."""
    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [
            {"add": [a, b]},
            {"remove": ["part-0-1.parquet"]},
            {"add": [c]},
        ],
        checkpoint_at=1,
        drop_precheckpoint_commits=True,
    )
    names = {p.rsplit("/", 1)[1] for p in delta_data_files(str(base))}
    assert names == {"part-0-0.parquet", "part-2-0.parquet"}


def test_checkpoint_only_column_mapping_refused(tmp_path, frames):
    """After log cleanup the checkpoint can be the ONLY carrier of the
    metaData gate: a column-mapped table bootstrapped from a checkpoint
    must refuse, not silently surface physical col-<uuid> names."""
    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [{"add": [a]}, {"add": [b]}],
        checkpoint_at=1,
        drop_precheckpoint_commits=True,
        checkpoint_kwargs={
            "metadata_configuration": {"delta.columnMapping.mode": "name"}
        },
    )
    with pytest.raises(GlueSparkError, match="column mapping"):
        delta_data_files(str(base))


def test_checkpoint_only_reader_features_refused(tmp_path, frames):
    """protocol rows in the checkpoint are enforced like JSON-replayed
    ones: unknown minReaderVersion-3 readerFeatures refuse loudly."""
    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [{"add": [a]}, {"add": [b]}],
        checkpoint_at=1,
        drop_precheckpoint_commits=True,
        checkpoint_kwargs={
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["typeWidening"],
            }
        },
    )
    with pytest.raises(GlueSparkError, match="reader features"):
        delta_data_files(str(base))


def test_json_protocol_reader_version_refused(tmp_path, frames):
    """A protocol action in the JSON replay with an unknown reader
    version refuses (previously protocol was never checked at all)."""
    import json as _json

    a, b, c = frames
    base = build_delta_table(tmp_path / "dt", [{"add": [a]}])
    with (base / "_delta_log" / f"{1:020d}.json").open("w") as f:
        f.write(
            _json.dumps(
                {"protocol": {"minReaderVersion": 4, "minWriterVersion": 8}}
            )
            + "\n"
        )
    with pytest.raises(GlueSparkError, match="minReaderVersion 4"):
        delta_data_files(str(base))
    # supported feature set on v3 passes
    with (base / "_delta_log" / f"{1:020d}.json").open("w") as f:
        f.write(
            _json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["timestampNtz"],
                    }
                }
            )
            + "\n"
        )
    assert len(delta_data_files(str(base))) == 1


def test_multipart_checkpoint_reads_all_parts(tmp_path, frames):
    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [{"add": [a, b]}, {"add": [c]}],
        checkpoint_at=1,
        drop_precheckpoint_commits=True,
        checkpoint_kwargs={"num_parts": 3},
    )
    names = {p.rsplit("/", 1)[1] for p in delta_data_files(str(base))}
    assert names == {
        "part-0-0.parquet",
        "part-0-1.parquet",
        "part-1-0.parquet",
    }


def test_distributed_checkpoint_decode_matches_driver(
    spark, tmp_path, frames, monkeypatch
):
    """The executor-side checkpoint decode (``spark.read.parquet``
    over the parts, r12) reconstructs the SAME active set and table
    state as the driver pyarrow path — adds, removes applied by the
    tail, partition values, stats, and the metaData/protocol gates."""
    import glue_table_cache_spark.sources.delta as d

    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dcp",
        [
            {"add": [a, b]},
            {"add": [c], "remove": ["part-0-1.parquet"]},  # pre-cp
            {"add": [a]},  # JSON tail past the checkpoint
        ],
        checkpoint_at=1,
        checkpoint_kwargs={"num_parts": 2},
    )
    active_drv, state_drv = d._replay(str(base))
    monkeypatch.setattr(d, "DISTRIBUTED_CHECKPOINT_MIN_BYTES", 0)
    active_dist, state_dist = d._replay(str(base))

    def norm_maps(v):
        # pyarrow renders map columns as list-of-pairs, Spark as dict
        # — semantically identical, normalize before comparing
        if isinstance(v, list) and all(
            isinstance(x, tuple) and len(x) == 2 for x in v
        ):
            return {k: norm_maps(x) for k, x in v}
        if isinstance(v, dict):
            return {k: norm_maps(x) for k, x in v.items()}
        return v

    assert active_dist == active_drv
    assert norm_maps(state_dist) == norm_maps(state_drv)
    # and the scan path agrees end-to-end
    names = {p.rsplit("/", 1)[1] for p in delta_data_files(str(base))}
    assert names == {
        "part-0-0.parquet",
        "part-1-0.parquet",
        "part-2-0.parquet",
    }


def test_multipart_checkpoint_missing_part_raises(tmp_path, frames):
    """A missing/unlisted checkpoint part must raise loudly — reading
    the surviving parts would silently drop live files.  Both layers
    catch it: _last_checkpoint's parts count against the listing, and
    (with _last_checkpoint gone) the <part>.<numParts> filename
    encoding itself."""
    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [{"add": [a, b]}, {"add": [c]}],
        checkpoint_at=1,
        drop_precheckpoint_commits=True,
        checkpoint_kwargs={"num_parts": 3, "drop_parts": {2}},
    )
    with pytest.raises(GlueSparkError, match="part"):
        delta_data_files(str(base))
    # without the pointer file the filename check still refuses
    (base / "_delta_log" / "_last_checkpoint").unlink()
    with pytest.raises(GlueSparkError, match="Incomplete multi-part"):
        delta_data_files(str(base))


def test_last_checkpoint_advertises_unlisted_version(tmp_path, frames):
    """_last_checkpoint naming a checkpoint the listing has no files
    for means the listing cannot be trusted — raise, do not silently
    reconstruct from an older state."""
    import json as _json

    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt", [{"add": [a]}, {"add": [b]}], checkpoint_at=1
    )
    for f in (base / "_delta_log").glob("*.checkpoint.parquet"):
        f.unlink()  # the advertised checkpoint vanishes from listing
    with pytest.raises(GlueSparkError, match="inconsistent listing"):
        delta_data_files(str(base))
    # a CONSISTENT log (pointer removed) replays fine from commits
    (base / "_delta_log" / "_last_checkpoint").unlink()
    assert len(delta_data_files(str(base))) == 2


def test_missing_commit_without_checkpoint_raises(tmp_path, frames):
    a, b, c = frames
    base = build_delta_table(tmp_path / "dt", [{"add": [a]}, {"add": [b]}])
    (base / "_delta_log" / f"{0:020d}.json").unlink()
    with pytest.raises(GlueSparkError, match="missing commit 0"):
        delta_data_files(str(base))


def test_deletion_vector_masks_rows(spark, tmp_path, frames):
    """A DV'd file contributes only its surviving rows: the engine
    scan anti-joins decoded positions on _metadata.row_index.  The
    default path-only mode refuses so no caller reads raw."""
    from glue_table_cache_spark.sources.delta import (
        apply_deletion_vectors,
    )

    a, b, c = frames  # a: ids 1,2 / c: ids 4,5
    base = build_delta_table(
        tmp_path / "dt",
        [
            {"add": [a, c]},
            # delete id 2 from file 0 and id 5 from file 1
            {"dv": {
                "part-0-0.parquet": lambda pdf: pdf["id"] == 2,
                "part-0-1.parquet": lambda pdf: pdf["id"] == 5,
            }},
        ],
    )
    with pytest.raises(GlueSparkError, match="deletion vector"):
        delta_data_files(str(base))
    entries = delta_data_files(str(base), with_deletion_vectors=True)
    assert sum(1 for _p, _pv, dv in entries if dv) == 2
    df = spark.read.parquet(*[p for p, _pv, _dv in entries])
    out = apply_deletion_vectors(df, entries, str(base))
    assert sorted(r.id for r in out.collect()) == [1, 4]
    # time travel to v0 sees the pre-delete rows
    v0 = delta_data_files(str(base), version_offset=1)
    assert sorted(
        r.id for r in spark.read.parquet(*v0).collect()
    ) == [1, 2, 4, 5]


def test_deletion_vector_engine_scan_and_checkpoint(spark, tmp_path, frames):
    """classification=delta masks DV rows through the engine, and a
    checkpoint carrying the DV descriptor round-trips it."""
    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [
            {"add": [a, c]},
            {"dv": {"part-0-0.parquet": lambda pdf: pdf["id"] == 1}},
            {"add": [b]},
        ],
        checkpoint_at=1,
        drop_precheckpoint_commits=True,
    )
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "dvt", str(base),
        parameters={"spark.sql.sources.provider": "delta"},
    )
    out = GlueSparkEngine(spark, store).sql(
        "SELECT id FROM glue.db.dvt ORDER BY id"
    )
    assert [r.id for r in out.collect()] == [2, 3, 4, 5]


def test_deletion_vector_unknown_storage_type_refused(tmp_path, frames):
    import json as _json

    a, b, c = frames
    base = build_delta_table(tmp_path / "dt", [{"add": [a]}])
    with (base / "_delta_log" / f"{1:020d}.json").open("w") as f:
        f.write(_json.dumps({"add": {
            "path": "part-0-0.parquet", "partitionValues": {},
            "deletionVector": {"storageType": "x",
                               "pathOrInlineDv": "?", "sizeInBytes": 1,
                               "cardinality": 1},
        }}) + "\n")
    with pytest.raises(GlueSparkError, match="storageType"):
        delta_data_files(str(base), with_deletion_vectors=True)


def test_dv_roaring_roundtrip_all_container_kinds(tmp_path):
    """Reader handles array, bitmap, and run containers + multi-key
    and >32-bit positions; writer round-trips its array form."""
    import struct as _struct

    from glue_table_cache_spark.sources import dv as DV

    # writer round-trip: sparse positions across two 16-bit keys and
    # a >2^32 high bitmap
    pos = [0, 1, 5, 70000, (1 << 32) + 3]
    assert DV.decode_rbm_array(DV.encode_rbm_array(pos)) == sorted(pos)
    # writer crosses the mandatory array→bitmap cutover at card 4097
    big = list(range(0, 13000, 2))  # 6500 > 4096 in one container
    assert DV.decode_rbm_array(DV.encode_rbm_array(big)) == big
    # hand-built run container: cookie 12347, one container, runs
    run_blob = (
        _struct.pack("<IQ", DV.MAGIC, 1)
        + _struct.pack("<I", (0 << 16) | 12347)  # size-1=0, cookie
        + b"\x01"  # run flag bitset: container 0 is a run
        + _struct.pack("<HH", 0, 9)  # key 0, cardinality-1
        + _struct.pack("<H", 1)  # 1 run
        + _struct.pack("<HH", 10, 9)  # start 10, length 9 -> 10..19
    )
    assert DV.decode_rbm_array(run_blob) == list(range(10, 20))
    # bitmap container: cardinality > 4096 forces the 8 KiB form
    dense = list(range(5000))
    words = [0] * 1024
    for v in dense:
        words[v // 64] |= 1 << (v % 64)
    bm_blob = (
        _struct.pack("<IQ", DV.MAGIC, 1)
        + _struct.pack("<II", 12346, 1)
        + _struct.pack("<HH", 0, len(dense) - 1)
        + _struct.pack("<I", 0)  # offset header (ignored)
        + _struct.pack("<1024Q", *words)
    )
    assert DV.decode_rbm_array(bm_blob) == dense


def test_log_metadata_partition_pruning(spark, tmp_path, frames):
    """Partition predicates prune files from the LOG's partitionValues
    before the reader sees their paths: the pruned file's rows never
    appear, and the scan's input file list shrinks to the match."""
    from glue_table_cache_spark.catalog import PartitionKey

    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [
            {"add": [a], "partition": {"year": "1996"}},
            {"add": [b], "partition": {"year": "1997"}},
            {"add": [c], "partition": {"year": "1998"}},
        ],
    )
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "pt", str(base),
        partition_keys=[PartitionKey("year", "string")],
        parameters={"spark.sql.sources.provider": "delta"},
    )
    eng = GlueSparkEngine(spark, store)
    out = eng.sql(
        "SELECT id, year FROM glue.db.pt WHERE year = '1997'"
    )
    # Spark's partition discovery infers year as int from the k=v dirs
    assert [(r.id, int(r.year)) for r in out.collect()] == [(3, 1997)]
    # the physical scan read ONE file, not three: log-level pruning,
    # not just Catalyst's post-hoc partition filter
    scan_files = [
        f for f in out.inputFiles() if f.endswith(".parquet")
    ]
    assert len(scan_files) == 1 and "year=1997" in scan_files[0]
    # OR across partitions keeps both matching files
    both = eng.sql(
        "SELECT id FROM glue.db.pt "
        "WHERE year = '1996' OR year = '1998' ORDER BY id"
    )
    assert [r.id for r in both.collect()] == [1, 2, 4, 5]


def test_column_mapping_read(spark, tmp_path, frames):
    """A name-mapped table's files carry physical col-<n> names; the
    scan must surface the LOGICAL schema — via delta_scan_info +
    apply_column_mapping, and end-to-end through the engine.  The
    path-only mode refuses with a pointer."""
    from glue_table_cache_spark.sources.delta import (
        apply_column_mapping,
        delta_scan_info,
    )

    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [{"add": [a]}, {"add": [b], "remove": ["part-0-0.parquet"]}],
        column_mapping=True,
    )
    with pytest.raises(GlueSparkError, match="column mapping"):
        delta_data_files(str(base))
    entries, renames = delta_scan_info(str(base))
    assert renames and set(renames.values()) == {"id", "v"}
    raw = spark.read.parquet(*[p for p, _pv, _dv in entries])
    assert set(raw.columns) == set(renames)  # physical on disk
    out = apply_column_mapping(raw, renames)
    assert [(r.id, r.v) for r in out.orderBy("id").collect()] == [(3, "c")]
    # engine end-to-end: logical names usable in SQL
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "cmt", str(base),
        parameters={"spark.sql.sources.provider": "delta"},
    )
    got = GlueSparkEngine(spark, store).sql(
        "SELECT id, v FROM glue.db.cmt WHERE id = 3"
    )
    assert [(r.id, r.v) for r in got.collect()] == [(3, "c")]


def test_column_mapping_nested_refused(spark, tmp_path):
    nested = spark.createDataFrame(
        [(1, ("x", 2))], "id long, s struct<p: string, q: long>"
    )
    base = build_delta_table(
        tmp_path / "dt", [{"add": [nested]}], column_mapping=True
    )
    from glue_table_cache_spark.sources.delta import delta_scan_info

    with pytest.raises(GlueSparkError, match="nested"):
        delta_scan_info(str(base))


def test_dv_roundtrip_property(tmp_path):
    """Hypothesis: any position set round-trips through the writer —
    across container-kind cutovers (array↔bitmap at 4096), 16-bit key
    boundaries, and the 32-bit bitmap-array split — and the DV file
    layer (version byte, BE size, CRC32) preserves it."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from glue_table_cache_spark.sources import dv as DV

    positions = st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=200_000),
            # straddle the 16-bit container boundary
            st.integers(min_value=65_400, max_value=65_700),
            # >32-bit rows (second bitmap in the array)
            st.integers(min_value=(1 << 32), max_value=(1 << 32) + 1000),
        ),
        max_size=300,
    )

    @settings(max_examples=60, deadline=None)
    @given(pos=positions)
    def check(pos):
        expect = sorted(set(pos))
        assert DV.decode_rbm_array(DV.encode_rbm_array(pos)) == expect
        f = tmp_path / "dv.bin"
        desc = DV.write_dv_file(f, pos)
        desc["storageType"] = "p"
        desc["pathOrInlineDv"] = str(f)
        assert DV.dv_deleted_positions(desc, str(tmp_path)) == expect

    check()


def test_partition_values_surface(tmp_path, frames):
    a, b, c = frames
    base = build_delta_table(tmp_path / "dt", [{"add": [a]}])
    out = delta_data_files(str(base), with_partition_values=True)
    assert len(out) == 1 and out[0][1] == {}


def test_engine_delta_scan(spark, tmp_path, frames):
    """classification=delta routes through the log walk: removed and
    orphan files never reach the parquet scan."""
    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [{"add": [a, b]}, {"remove": ["part-0-0.parquet"]}],
        orphan=c,
    )
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "dtable", str(base),
        parameters={"spark.sql.sources.provider": "delta"},
    )
    out = GlueSparkEngine(spark, store).sql(
        "SELECT id FROM glue.db.dtable ORDER BY id"
    )
    assert [r.id for r in out.collect()] == [3]


def test_engine_hudi_without_timeline_raises(spark, tmp_path):
    """HUDI is handled via the timeline walk (tests/test_hudi.py); a
    hudi-classified location WITHOUT a timeline must fail loudly,
    never fall back to a raw directory scan."""
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "htable", str(tmp_path),
        parameters={"hoodie.table.name": "htable"},
    )
    with pytest.raises(GlueSparkError, match="No completed Hudi"):
        GlueSparkEngine(spark, store).sql(
            "SELECT * FROM glue.db.htable"
        ).collect()


def test_url_encoded_paths_decoded(tmp_path, frames, spark):
    """Protocol: add.path is URL-encoded — a remove for the same file
    must cancel the add whichever encoding each side used."""
    import json

    a, b, c = frames
    base = build_delta_table(tmp_path / "dt", [{"add": [a, b]}])
    log = base / "_delta_log"
    (log / f"{1:020d}.json").write_text(
        json.dumps(
            {"remove": {"path": "part-0%2D1.parquet", "dataChange": True}}
        )
        + "\n"
    )
    names = {p.rsplit("/", 1)[1] for p in delta_data_files(str(base))}
    assert names == {"part-0-0.parquet"}


def test_deletion_vector_refused(tmp_path, frames):
    """An add action carrying a deletionVector marks rows inside the
    file as deleted; a raw scan would resurrect them — refuse."""
    import json

    a, b, c = frames
    base = build_delta_table(tmp_path / "dt", [{"add": [a]}])
    (base / "_delta_log" / f"{1:020d}.json").write_text(
        json.dumps(
            {
                "add": {
                    "path": "part-9.parquet",
                    "partitionValues": {},
                    "dataChange": True,
                    "deletionVector": {
                        "storageType": "u", "pathOrInlineDv": "x",
                        "offset": 1, "sizeInBytes": 36, "cardinality": 2,
                    },
                }
            }
        )
        + "\n"
    )
    with pytest.raises(GlueSparkError, match="deletion vector"):
        delta_data_files(str(base))


def test_column_mapping_refused(tmp_path, frames):
    """metaData with delta.columnMapping.mode=name means parquet files
    carry physical col-<uuid> names — a raw read would surface the
    wrong schema."""
    import json

    a, b, c = frames
    base = build_delta_table(tmp_path / "dt", [{"add": [a]}])
    (base / "_delta_log" / f"{1:020d}.json").write_text(
        json.dumps(
            {
                "metaData": {
                    "id": "m2",
                    "configuration": {"delta.columnMapping.mode": "name"},
                }
            }
        )
        + "\n"
    )
    with pytest.raises(GlueSparkError, match="column mapping"):
        delta_data_files(str(base))


def test_partitioned_delta_surfaces_partition_columns(spark, tmp_path):
    """Hive-style k=v dirs in add paths + basePath: the partition
    column must surface and filter correctly through the engine."""
    import json
    import shutil

    base = tmp_path / "dtp"
    log = base / "_delta_log"
    log.mkdir(parents=True)
    actions = [
        {"metaData": {"id": "m", "partitionColumns": ["p"]}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
    ]
    for pval, rows in (("1", [(1, "a")]), ("2", [(2, "b")])):
        df = spark.createDataFrame(rows, "id long, v string")
        stage = base / f"_stage{pval}"
        df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        rel = f"p={pval}/part-{pval}.parquet"
        (base / f"p={pval}").mkdir(exist_ok=True)
        next(stage.glob("part-*.parquet")).rename(base / rel)
        shutil.rmtree(stage)
        actions.append(
            {"add": {"path": rel, "partitionValues": {"p": pval},
                     "dataChange": True}}
        )
    (log / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions) + "\n"
    )
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "dtp", str(base),
        parameters={"spark.sql.sources.provider": "delta"},
    )
    out = GlueSparkEngine(spark, store).sql(
        "SELECT id, CAST(p AS STRING) AS p FROM glue.db.dtp "
        "WHERE p = '2'"
    ).collect()
    assert [(r.id, r.p) for r in out] == [(2, "2")]


def test_delta_log_reconstruction_property(tmp_path):
    """Property: for ANY action sequence, the walk's active set equals
    a straightforward model replay — with and without a checkpoint at
    an arbitrary version (written by the FIXTURE or by the repo's own
    checkpoint writer), at every version_offset.  The log walk only
    reads _delta_log, so no data files (or Spark) are needed."""
    import json

    from hypothesis import given, settings, strategies as st

    names = [f"f{i}.parquet" for i in range(6)]
    action = st.one_of(
        st.tuples(st.just("add"), st.sampled_from(names)),
        st.tuples(st.just("remove"), st.sampled_from(names)),
    )
    counter = iter(range(10**6))

    @settings(max_examples=40, deadline=None)
    @given(
        commits=st.lists(
            st.lists(action, min_size=1, max_size=4),
            min_size=1, max_size=6,
        ),
        data=st.data(),
    )
    def run(commits, data):
        base = tmp_path / f"p{next(counter)}"
        log = base / "_delta_log"
        log.mkdir(parents=True)
        model_states = []
        model: dict = {}
        for v, acts in enumerate(commits):
            lines = []
            if v == 0:
                # a real log's first commit carries metaData+protocol;
                # the repo checkpoint writer (rightly) requires them
                lines.append(json.dumps({"metaData": {
                    "id": "t", "format": {"provider": "parquet",
                                          "options": {}},
                    "schemaString": json.dumps({
                        "type": "struct", "fields": []}),
                    "partitionColumns": [], "configuration": {}}}))
                lines.append(json.dumps({"protocol": {
                    "minReaderVersion": 1, "minWriterVersion": 2}}))
            for kind, name in acts:
                if kind == "add":
                    lines.append(json.dumps(
                        {"add": {"path": name, "partitionValues": {},
                                 "dataChange": True}}))
                    model[name] = {}
                else:
                    lines.append(json.dumps(
                        {"remove": {"path": name, "dataChange": True}}))
                    model.pop(name, None)
            (log / f"{v:020d}.json").write_text("\n".join(lines) + "\n")
            model_states.append(dict(model))
        cp = data.draw(
            st.one_of(st.none(), st.integers(0, len(commits) - 1)),
            label="checkpoint_at",
        )
        if cp is not None:
            if data.draw(st.booleans(), label="repo_writer"):
                from glue_table_cache_spark.sinks.delta_checkpoint import (
                    write_delta_checkpoint,
                )

                write_delta_checkpoint(str(base), version=cp)
            else:
                from glue_table_cache_spark.sources.delta_fixture import (
                    _write_checkpoint,
                )

                _write_checkpoint(log, cp, model_states[cp])
        for off in range(len(commits)):
            got = {
                p.rsplit("/", 1)[1]
                for p in delta_data_files(str(base), version_offset=off)
            }
            want = set(model_states[len(commits) - 1 - off])
            assert got == want, (off, cp, commits)

    run()


def test_delta_changes_incremental_feed(tmp_path, frames):
    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [
            {"add": [a]},                                  # v0
            {"add": [b]},                                  # v1
            {"add": [c], "remove": ["part-0-0.parquet"]},  # v2
        ],
    )
    from glue_table_cache_spark.sources.delta import delta_changes

    latest, added, removed = delta_changes(str(base), since_version=0)
    assert latest == 2
    assert {p.rsplit("/", 1)[1] for p in added} == {
        "part-1-0.parquet", "part-2-0.parquet"
    }
    assert {p.rsplit("/", 1)[1] for p in removed} == {"part-0-0.parquet"}
    # empty window
    latest2, added2, removed2 = delta_changes(str(base), since_version=2)
    assert (latest2, added2, removed2) == (2, [], [])
    # add+remove inside the window cancels
    import json

    (base / "_delta_log" / f"{3:020d}.json").write_text(
        json.dumps({"add": {"path": "x.parquet", "partitionValues": {},
                            "dataChange": True}}) + "\n"
        + json.dumps({"remove": {"path": "x.parquet",
                                 "dataChange": True}}) + "\n"
    )
    _, added3, removed3 = delta_changes(str(base), since_version=2)
    assert added3 == [] and removed3 == []
    with pytest.raises(GlueSparkError, match="ahead of the log"):
        delta_changes(str(base), since_version=99)


# ---------------------------------------------------------------------------
# v2 (uuid-named) checkpoints with sidecars
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fmt", ["parquet", "json"])
def test_v2_checkpoint_reads_sidecars(tmp_path, frames, fmt):
    """A v2 checkpoint manifest (parquet AND json forms) bootstraps
    the active set from its _sidecars parquet files after log
    cleanup, including removes applied before the checkpoint."""
    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [
            {"add": [a, b]},
            {"remove": ["part-0-1.parquet"]},
            {"add": [c]},
        ],
        checkpoint_at=1,
        drop_precheckpoint_commits=True,
        checkpoint_kwargs={"v2": True, "v2_format": fmt},
    )
    names = {p.rsplit("/", 1)[1] for p in delta_data_files(str(base))}
    assert names == {"part-0-0.parquet", "part-2-0.parquet"}


def test_v2_checkpoint_missing_sidecar_refuses(tmp_path, frames):
    a, b, _c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [{"add": [a]}, {"add": [b]}],
        checkpoint_at=1,
        drop_precheckpoint_commits=True,
        checkpoint_kwargs={"v2": True, "drop_sidecar": True},
    )
    with pytest.raises(GlueSparkError, match="sidecar"):
        delta_data_files(str(base))


def test_v2_checkpoint_enforces_protocol_and_metadata_gates(
    tmp_path, frames
):
    """The v2 manifest's protocol/metaData rows gate exactly like the
    classic checkpoint's: unknown reader features and column mapping
    both refuse when the checkpoint is the only carrier."""
    a, b, _c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [{"add": [a]}, {"add": [b]}],
        checkpoint_at=1,
        drop_precheckpoint_commits=True,
        checkpoint_kwargs={
            "v2": True,
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["v2Checkpoint", "typeWidening"],
            },
        },
    )
    with pytest.raises(GlueSparkError, match="reader features"):
        delta_data_files(str(base))
    base2 = build_delta_table(
        tmp_path / "dt2",
        [{"add": [a]}, {"add": [b]}],
        checkpoint_at=1,
        drop_precheckpoint_commits=True,
        checkpoint_kwargs={
            "v2": True,
            "metadata_configuration": {
                "delta.columnMapping.mode": "name"
            },
        },
    )
    with pytest.raises(GlueSparkError, match="column mapping"):
        delta_data_files(str(base2))


def test_v2_checkpoint_engine_scan(spark, tmp_path, frames):
    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [{"add": [a]}, {"add": [b]}, {"add": [c]}],
        checkpoint_at=1,
        drop_precheckpoint_commits=True,
        checkpoint_kwargs={"v2": True, "n_sidecars": 3},
    )
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "v2dt", str(base),
        parameters={"spark.sql.sources.provider": "delta"},
    )
    out = GlueSparkEngine(spark, store).sql(
        "SELECT id FROM glue.db.v2dt ORDER BY id"
    )
    assert [r.id for r in out.collect()] == [1, 2, 3, 4, 5]


# ---------------------------------------------------------------------------
# row-level Change Data Feed
# ---------------------------------------------------------------------------


def test_cdf_synthesizes_inserts_and_deletes(spark, tmp_path, frames):
    """Commits without cdc actions synthesize: dataChange adds are
    inserts, dataChange removes are deletes (rows read back from the
    not-yet-vacuumed file)."""
    from glue_table_cache_spark.sources.delta import delta_cdf

    a, b, _c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [
            {"add": [a]},                        # v0: 2 inserts
            {"add": [b]},                        # v1: 1 insert
            {"remove": ["part-0-0.parquet"]},    # v2: 2 deletes
        ],
    )
    out = delta_cdf(spark, str(base), since_version=0)
    got = sorted(
        (r.id, r._change_type, r._commit_version)
        for r in out.collect()
    )
    assert got == [
        (1, "delete", 2), (2, "delete", 2), (3, "insert", 1),
    ]
    # full window from the table's creation
    all_changes = delta_cdf(spark, str(base), since_version=-1)
    assert all_changes.count() == 5


def test_cdf_prefers_cdc_actions(spark, tmp_path, frames):
    """A commit carrying cdc actions is represented by exactly those
    rows; its add/remove bookkeeping does not double-count."""
    from glue_table_cache_spark.sources.delta import delta_cdf

    a, b, _c = frames
    cdf_rows = spark.createDataFrame(
        [
            (2, "b", "update_preimage"),
            (2, "B!", "update_postimage"),
        ],
        "id long, v string, _change_type string",
    )
    base = build_delta_table(
        tmp_path / "dt",
        [
            {"add": [a]},
            # v1: an UPDATE — rewrites the file AND writes cdc rows
            {"add": [b], "remove": ["part-0-0.parquet"],
             "cdc": [cdf_rows]},
        ],
    )
    out = delta_cdf(spark, str(base), since_version=0)
    got = sorted(
        (r.id, r.v, r._change_type, r._commit_version)
        for r in out.collect()
    )
    assert got == [
        (2, "B!", "update_postimage", 1),
        (2, "b", "update_preimage", 1),
    ]


def test_cdf_window_validation(spark, tmp_path, frames):
    from glue_table_cache_spark.sources.delta import delta_cdf

    a, _b, _c = frames
    base = build_delta_table(tmp_path / "dt", [{"add": [a]}])
    with pytest.raises(GlueSparkError, match="ahead of the log"):
        delta_cdf(spark, str(base), since_version=5)
    assert delta_cdf(spark, str(base), since_version=0).count() == 0


def test_cdf_dv_without_cdc_refuses(spark, tmp_path, frames):
    from glue_table_cache_spark.sources.delta import delta_cdf

    a, _b, _c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [
            {"add": [a]},
            {"dv": {"part-0-0.parquet": lambda pdf: pdf["id"] == 1}},
        ],
    )
    with pytest.raises(GlueSparkError, match="deletion vectors"):
        delta_cdf(spark, str(base), since_version=0)


def test_timestamp_time_travel(spark, tmp_path, frames):
    """as_of_timestamp_ms picks the newest version whose commitInfo
    timestamp is at or before the instant (fixture stamps version v
    at 1700000000000 + v*1000)."""
    from glue_table_cache_spark.sources.delta import delta_data_files

    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [{"add": [a]}, {"add": [b]}, {"add": [c]}],
    )
    t0 = 1700000000000

    def names(ms):
        return {
            p.rsplit("/", 1)[1]
            for p in delta_data_files(
                str(base), as_of_timestamp_ms=ms
            )
        }

    assert names(t0) == {"part-0-0.parquet"}
    assert names(t0 + 1500) == {"part-0-0.parquet", "part-1-0.parquet"}
    assert names(t0 + 99_000) == {
        "part-0-0.parquet", "part-1-0.parquet", "part-2-0.parquet",
    }
    with pytest.raises(GlueSparkError, match="at or before"):
        delta_data_files(str(base), as_of_timestamp_ms=t0 - 1)
    with pytest.raises(GlueSparkError, match="mutually exclusive"):
        delta_data_files(
            str(base), version_offset=1, as_of_timestamp_ms=t0
        )


def test_delta_history(spark, tmp_path, frames):
    from glue_table_cache_spark.sources.delta import delta_history

    a, b, _c = frames
    base = build_delta_table(tmp_path / "dt", [{"add": [a]}, {"add": [b]}])
    rows = delta_history(spark, str(base)).collect()
    assert [(r.version, r.operation) for r in rows] == [
        (0, "WRITE"), (1, "WRITE"),
    ]
    assert rows[1].timestamp - rows[0].timestamp == 1000


def test_schema_evolution_uses_log_schema(spark, tmp_path, frames):
    """An evolved table reads with the LOG's schemaString: files
    written before the column was added surface nulls for it, instead
    of the scan schema depending on which file Spark sampled first."""
    a, _b, _c = frames
    evolved = spark.createDataFrame(
        [(10, "x", 7.5)], "id long, v string, score double"
    )
    base = build_delta_table(
        tmp_path / "dt",
        [
            {"add": [a]},
            {"add": [evolved], "metadata_schema": evolved},
        ],
    )
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "ev", str(base),
        parameters={"spark.sql.sources.provider": "delta"},
    )
    out = GlueSparkEngine(spark, store).sql(
        "SELECT id, v, score FROM glue.db.ev ORDER BY id"
    )
    assert [f.name for f in out.schema.fields] == ["id", "v", "score"]
    assert [(r.id, r.v, r.score) for r in out.collect()] == [
        (1, "a", None), (2, "b", None), (10, "x", 7.5),
    ]


def test_column_mapping_stats_skipping_translates(spark, tmp_path):
    """Zone-map skipping works on column-mapped tables: stats keys are
    PHYSICAL names and are translated through the rename map, so a
    predicate on the logical column prunes files — and a stale
    physical key the map does not know can never match."""
    from glue_table_cache_spark.skipping import delta_file_stats

    a = spark.createDataFrame(
        [(i, "x") for i in range(5)], "id long, v string"
    )
    b = spark.createDataFrame(
        [(i, "y") for i in range(100, 105)], "id long, v string"
    )
    base = build_delta_table(
        tmp_path / "cms",
        [{"add": [a]}, {"add": [b]}],
        column_mapping=True,
    )
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "cms", str(base),
        parameters={"spark.sql.sources.provider": "delta"},
    )
    eng = GlueSparkEngine(spark, store)
    out = eng.sql("SELECT id, v FROM glue.db.cms WHERE id >= 100")
    assert sorted((r.id, r.v) for r in out.collect()) == [
        (i, "y") for i in range(100, 105)
    ]
    assert len(out.inputFiles()) == 1  # the low-id file was skipped

    # unit shape: unknown physical keys are DROPPED, never matched
    st = delta_file_stats(
        '{"numRecords": 1, "minValues": {"col-0aid": 1, "stale": 9},'
        ' "maxValues": {"col-0aid": 5, "stale": 9}, "nullCount": {}}',
        renames={"col-0aid": "id"},
    )
    assert set(st.min_values) == {"id"}
    assert st.min_values["id"] == 1 and st.max_values["id"] == 5


def test_sql_version_and_timestamp_as_of(spark, tmp_path, frames):
    """`glue.db.t VERSION AS OF n` / `TIMESTAMP AS OF ts` in the SQL
    surface: the clause is stripped before execution and steers the
    table's metadata walk; conflicting specs for one table refuse;
    non-travel formats refuse loudly."""
    a, b, c = frames
    base = build_delta_table(
        tmp_path / "ttsql",
        [{"add": [a]}, {"add": [b]}, {"remove": ["part-0-0.parquet"]}],
    )
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "tt", str(base),
        parameters={"spark.sql.sources.provider": "delta"},
    )
    store.register_parquet_dir(
        "db", "plain", str(tmp_path / "nowhere")
    )
    eng = GlueSparkEngine(spark, store)

    cur = sorted(
        r.id for r in eng.sql("SELECT id FROM glue.db.tt").collect()
    )
    assert cur == [3]
    v1 = sorted(
        r.id
        for r in eng.sql(
            "SELECT id FROM glue.db.tt VERSION AS OF 1"
        ).collect()
    )
    assert v1 == [1, 2, 3]
    v0 = sorted(
        r.id
        for r in eng.sql(
            "SELECT id FROM glue.db.tt FOR VERSION AS OF 0"
        ).collect()
    )
    assert v0 == [1, 2]
    # fixture commit timestamps are 1700000000000 + v*1000 (UTC)
    ts = sorted(
        r.id
        for r in eng.sql(
            "SELECT id FROM glue.db.tt "
            "TIMESTAMP AS OF '2023-11-14 22:13:21'"
        ).collect()
    )
    assert ts == [1, 2, 3]  # as of v1's commit instant
    # joins of two travel states of the SAME table refuse (one view
    # per table per query), as do nonexistent versions and non-travel
    # table types
    from glue_table_cache_spark.transformer import InvalidQueryError

    with pytest.raises(InvalidQueryError, match="conflicting"):
        eng.sql(
            "SELECT * FROM glue.db.tt VERSION AS OF 0 x "
            "JOIN glue.db.tt VERSION AS OF 1 y ON x.id = y.id"
        )
    with pytest.raises(GlueSparkError, match="does not exist"):
        eng.sql("SELECT id FROM glue.db.tt VERSION AS OF 99")
    with pytest.raises(GlueSparkError, match="supported for DELTA"):
        eng.sql("SELECT 1 FROM glue.db.plain VERSION AS OF 1")
    # the clause is never recognized inside string literals
    lit = eng.sql(
        "SELECT 'glue.db.tt VERSION AS OF 0' AS s FROM glue.db.tt"
    )
    assert lit.count() == 1


def test_generated_column_partition_pruning(spark, tmp_path):
    """The protocol's generated-columns partition-filter optimization:
    a partition column generated as CAST(ts AS DATE) prunes files from
    predicates on ts — and partitionColumns prune from the LOG even
    when the catalog registered no partition keys."""
    import datetime as dt
    import json

    from glue_table_cache_spark.sinks.delta_write import write_delta_append

    loc = tmp_path / "gen"
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 3, 5, 10, 0), dt.date(2024, 3, 5)),
            (2, dt.datetime(2024, 3, 6, 9, 0), dt.date(2024, 3, 6)),
            (3, dt.datetime(2024, 3, 7, 8, 0), dt.date(2024, 3, 7)),
        ],
        "id long, ts timestamp, pdate date",
    )
    write_delta_append(df, str(loc), partition_by=["pdate"])
    # record the generation expression the way a Delta writer would
    commit = loc / "_delta_log" / "00000000000000000000.json"
    lines = commit.read_text().splitlines()
    out = []
    for line in lines:
        action = json.loads(line)
        if "metaData" in action:
            schema = json.loads(action["metaData"]["schemaString"])
            for f in schema["fields"]:
                if f["name"] == "pdate":
                    f.setdefault("metadata", {})[
                        "delta.generationExpression"
                    ] = "CAST(ts AS DATE)"
            action["metaData"]["schemaString"] = json.dumps(schema)
        out.append(json.dumps(action))
    commit.write_text("\n".join(out) + "\n")

    store = LocalMetadataStore()
    # NO partition keys registered — pruning must come from the log
    store.register_parquet_dir(
        "db", "gen", str(loc),
        parameters={"spark.sql.sources.provider": "delta"},
    )
    eng = GlueSparkEngine(spark, store)
    out = eng.sql(
        "SELECT id FROM glue.db.gen "
        "WHERE ts >= TIMESTAMP '2024-03-06 00:00:00'"
    )
    assert len(out.inputFiles()) == 2  # 2024-03-05 file pruned
    assert sorted(r.id for r in out.collect()) == [2, 3]
    # identity pruning straight on the partition column, also log-only
    out2 = eng.sql(
        "SELECT id FROM glue.db.gen WHERE pdate = DATE '2024-03-07'"
    )
    assert len(out2.inputFiles()) == 1
    assert [r.id for r in out2.collect()] == [3]
    # a predicate the generation mapping cannot prune stays correct
    out3 = eng.sql("SELECT id FROM glue.db.gen WHERE ts IS NOT NULL")
    assert sorted(r.id for r in out3.collect()) == [1, 2, 3]


def test_column_mapped_delete(spark, tmp_path, frames):
    """DELETE works on column-mapped tables BECAUSE deletion vectors
    are position-based: the predicate evaluates on the logical
    (rename-projected) view, the commit touches only paths and
    positions, and the engine scan masks the DV'd rows afterwards.
    CDF-enabled mapped tables refuse."""
    from glue_table_cache_spark.sinks.delta_delete import (
        delete_from_delta,
    )

    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt",
        [{"add": [a]}, {"add": [c]}],
        column_mapping=True,
    )
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "t", str(base),
        parameters={"spark.sql.sources.provider": "delta"},
    )
    eng = GlueSparkEngine(spark, store)
    assert eng.sql("SELECT count(*) AS n FROM glue.db.t").first().n == 4
    # through the SQL surface, predicate on LOGICAL names
    out = eng.sql("DELETE FROM glue.db.t WHERE id IN (2, 4)").first()
    assert out.rows_deleted == 2
    got = eng.sql("SELECT id, v FROM glue.db.t ORDER BY id").collect()
    assert [(r.id, r.v) for r in got] == [(1, "a"), (5, "e")]
    # stacked delete merges positions; already-deleted rows no-op
    # (direct API — a fresh engine proves the committed state, the
    # original engine's cached walk is intentionally stale)
    _v, n = delete_from_delta(spark, str(base), "id = 2 OR id = 5")
    assert n == 1
    eng2 = GlueSparkEngine(spark, store)
    assert [
        r.id for r in eng2.sql("SELECT id FROM glue.db.t").collect()
    ] == [1]


def test_column_mapped_update_and_merge(spark, tmp_path, frames):
    """UPDATE and MERGE work on column-mapped tables: the scan
    projects physical->logical for predicate/key evaluation and the
    rewritten files land under PHYSICAL names (the on-disk contract),
    so both the repo's reader and any mapping-aware engine scan them
    correctly afterwards."""
    from glue_table_cache_spark.sinks.delta_merge import (
        merge_into_delta,
        update_delta,
    )

    a, b, c = frames
    base = build_delta_table(
        tmp_path / "dt", [{"add": [a]}, {"add": [c]}],
        column_mapping=True,
    )
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "t", str(base),
        parameters={"spark.sql.sources.provider": "delta"},
    )
    eng = GlueSparkEngine(spark, store)
    out = eng.sql(
        "UPDATE glue.db.t SET v = upper(v) WHERE id >= 4"
    ).first()
    assert out.rows_updated == 2
    got = eng.sql("SELECT id, v FROM glue.db.t ORDER BY id").collect()
    assert [(r.id, r.v) for r in got] == [
        (1, "a"), (2, "b"), (4, "D"), (5, "E"),
    ]
    # the rewritten files carry PHYSICAL names on disk
    from glue_table_cache_spark.sources.delta import delta_scan_info

    entries, renames = delta_scan_info(str(base))
    newest = [p for p, _pv, _dv in entries]
    raw_cols = set(spark.read.parquet(*newest).columns)
    assert raw_cols == set(renames)  # physical, not logical

    src = spark.createDataFrame(
        [(2, "b2"), (9, "i")], "id long, v string"
    )
    out = eng.sql(
        "MERGE INTO glue.db.t AS t USING "
        "(SELECT * FROM VALUES (2, 'b2'), (9, 'i') AS s(id, v)) AS s "
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    ).first()
    assert out.rows_updated == 1 and out.rows_inserted == 1
    got = eng.sql("SELECT id, v FROM glue.db.t ORDER BY id").collect()
    assert [(r.id, r.v) for r in got] == [
        (1, "a"), (2, "b2"), (4, "D"), (5, "E"), (9, "i"),
    ]
    # direct-API merge equivalence on a fresh engine
    v, nu, ni = merge_into_delta(spark, str(base), src, on="id")
    assert nu == 2 and ni == 0  # both keys now exist
    eng2 = GlueSparkEngine(spark, store)
    assert eng2.sql(
        "SELECT count(*) AS n FROM glue.db.t"
    ).first().n == 5
    _v, n = update_delta(
        spark, str(base), "id = 1", {"v": "'z'"}
    )
    assert n == 1


def test_cdf_partitioned_table_attaches_partition_columns(
    spark, tmp_path
):
    """delta_cdf on a PARTITIONED table: synthesized add/remove
    pieces read through basePath so hive partition columns attach
    (typed to the log's logical schema), and they union cleanly with
    writer-produced cdc pieces that materialize the columns."""
    from glue_table_cache_spark.sinks.delta_delete import (
        delete_from_delta,
    )
    from glue_table_cache_spark.sinks.delta_write import (
        set_delta_table_properties,
        write_delta_append,
    )
    from glue_table_cache_spark.sources.delta import delta_cdf

    loc = str(tmp_path / "cdfp")
    write_delta_append(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, p string"
        ),
        loc,
        partition_by=["p"],
    )  # v0: synthesized inserts
    set_delta_table_properties(
        loc, {"delta.enableChangeDataFeed": "true"}
    )  # v1
    delete_from_delta(spark, loc, "id = 2")  # v2: cdc piece
    out = delta_cdf(spark, loc, since_version=-1)
    assert set(out.columns) == {
        "id", "p", "_change_type", "_commit_version"
    }
    assert sorted(
        (r.id, r.p, r._change_type, r._commit_version)
        for r in out.collect()
    ) == [
        (1, "a", "insert", 0),
        (2, "b", "delete", 2),
        (2, "b", "insert", 0),
    ]


def test_cdf_on_shallow_clone_mixed_roots(spark, tmp_path):
    """delta_cdf on a SHALLOW CLONE: the clone's v0 adds reference
    source-absolute paths, so the synthesized pieces span two
    partition roots — the mixed-root reader groups them and the
    partition columns still attach."""
    from glue_table_cache_spark.sinks.delta_write import (
        shallow_clone_delta,
        write_delta_append,
    )
    from glue_table_cache_spark.sources.delta import delta_cdf

    src = str(tmp_path / "src")
    clone = str(tmp_path / "clone")
    write_delta_append(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, p string"
        ),
        src,
        partition_by=["p"],
    )
    shallow_clone_delta(src, clone)
    write_delta_append(
        spark.createDataFrame([(3, "c")], "id long, p string"),
        clone,
    )
    out = delta_cdf(spark, clone, since_version=-1)
    assert sorted(
        (r.id, r.p, r._change_type, r._commit_version)
        for r in out.collect()
    ) == [
        (1, "a", "insert", 0),
        (2, "b", "insert", 0),
        (3, "c", "insert", 1),
    ]
