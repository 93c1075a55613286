"""Hudi COPY_ON_WRITE timeline-walk tests: latest-slice-wins,
inflight/orphan hygiene, replacecommit, MOR rejection, engine scan."""

from __future__ import annotations

import pytest

from glue_table_cache_spark.catalog import LocalMetadataStore
from glue_table_cache_spark.engine import GlueSparkEngine
from glue_table_cache_spark.errors import GlueSparkError
from glue_table_cache_spark.sources.hudi import hudi_data_files
from glue_table_cache_spark.sources.hudi_fixture import build_hudi_table


@pytest.fixture()
def frames(spark):
    a = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    b = spark.createDataFrame([(3, "c")], "id long, v string")
    a2 = spark.createDataFrame([(1, "A"), (2, "B")], "id long, v string")
    return a, b, a2


def test_latest_file_slice_wins(spark, tmp_path, frames):
    """A COW update rewrites the file group at a later instant; the
    stale slice stays on disk but must not be scanned."""
    a, b, a2 = frames
    base = build_hudi_table(
        tmp_path / "ht",
        [
            {"write": {"fg1": a, "fg2": b}},
            {"write": {"fg1": a2}},  # rewrite of fg1
        ],
        orphan=a,
    )
    paths = hudi_data_files(str(base))
    names = {p.rsplit("/", 1)[1] for p in paths}
    assert names == {
        "fg1_0-0-0_20240101000001.parquet",
        "fg2_0-0-0_20240101000000.parquet",
    }
    rows = {(r.id, r.v) for r in spark.read.parquet(*paths).collect()}
    assert rows == {(1, "A"), (2, "B"), (3, "c")}  # updated values


def test_hudi_1x_completed_instant_names(spark, tmp_path, frames):
    """Hudi 1.x names completed instants <requestTs>_<completionTs>;
    the walk must accept them, keyed on the request timestamp."""
    a, b, a2 = frames
    base = build_hudi_table(
        tmp_path / "ht",
        [{"write": {"fg1": a, "fg2": b}}, {"write": {"fg1": a2}}],
        orphan=a,
        hudi_1x_names=True,
    )
    names = {p.rsplit("/", 1)[1] for p in hudi_data_files(str(base))}
    assert names == {
        "fg1_0-0-0_20240101000001.parquet",
        "fg2_0-0-0_20240101000000.parquet",
    }
    from glue_table_cache_spark.sources.hudi import hudi_changes

    latest, written = hudi_changes(
        str(base), since_instant=20240101000000
    )
    assert latest == 20240101000001
    assert {p.rsplit("/", 1)[1] for p in written} == {
        "fg1_0-0-0_20240101000001.parquet"
    }


def test_inflight_instant_invisible(tmp_path, frames):
    a, b, _ = frames
    base = build_hudi_table(
        tmp_path / "ht",
        [{"write": {"fg1": a}}, {"write": {"fg9": b}, "inflight": True}],
    )
    names = {p.rsplit("/", 1)[1] for p in hudi_data_files(str(base))}
    assert names == {"fg1_0-0-0_20240101000000.parquet"}


def test_replacecommit_retires_file_groups(tmp_path, frames):
    a, b, a2 = frames
    base = build_hudi_table(
        tmp_path / "ht",
        [
            {"write": {"fg1": a, "fg2": b}},
            # clustering: fg1+fg2 replaced by one new group
            {"write": {"fg3": a2}, "replace": ["fg1", "fg2"]},
        ],
    )
    names = {p.rsplit("/", 1)[1] for p in hudi_data_files(str(base))}
    assert names == {"fg3_0-0-0_20240101000001.parquet"}


def test_merge_on_read_rejected(tmp_path, frames):
    a, _, _ = frames
    base = build_hudi_table(
        tmp_path / "ht", [{"write": {"fg1": a}}],
        table_type="MERGE_ON_READ",
    )
    with pytest.raises(GlueSparkError, match="MERGE_ON_READ"):
        hudi_data_files(str(base))


def test_merge_on_read_base_files_only_contract(spark, tmp_path, frames):
    """A log-bearing MOR table: the exact read refuses (naming the
    escape hatch and the deltacommit count), and base_files_only=True
    returns the file groups AS OF their last base write — the log's
    updates stay invisible, per the documented staleness contract."""
    a, b, a2 = frames
    base = build_hudi_table(
        tmp_path / "ht",
        [
            {"write": {"fg1": a, "fg2": b}},
            # un-compacted update stream against fg1
            {"log": {"fg1": b"\x00opaque-log-block\x00"}},
        ],
        table_type="MERGE_ON_READ",
    )
    with pytest.raises(
        GlueSparkError, match="1 completed deltacommit"
    ) as exc:
        hudi_data_files(str(base))
    assert "base_files_only" in str(exc.value)
    paths = hudi_data_files(str(base), base_files_only=True)
    names = {p.rsplit("/", 1)[1] for p in paths}
    # base slices only — the .log file never reaches the scan
    assert names == {
        "fg1_0-0-0_20240101000000.parquet",
        "fg2_0-0-0_20240101000000.parquet",
    }
    rows = {(r.id, r.v) for r in spark.read.parquet(*paths).collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c")}  # pre-log values
    # a later COMPACTION (base rewrite via commit) advances the slice
    build_hudi_table(
        tmp_path / "ht2",
        [
            {"write": {"fg1": a}},
            {"log": {"fg1": b"\x00log\x00"}},
            {"write": {"fg1": a2}},  # compaction rewrites the base
        ],
        table_type="MERGE_ON_READ",
    )
    paths2 = hudi_data_files(str(tmp_path / "ht2"), base_files_only=True)
    assert {p.rsplit("/", 1)[1] for p in paths2} == {
        "fg1_0-0-0_20240101000002.parquet"
    }


def test_timeline_partition_pruning(spark, tmp_path, frames):
    """Hive-style partition paths in the write stats prune base files
    before the reader sees them; non-hive layouts surface no values."""
    from glue_table_cache_spark.catalog import PartitionKey
    from glue_table_cache_spark.sources.hudi import hudi_scan_info

    a, b, a2 = frames
    base = build_hudi_table(
        tmp_path / "ht",
        [
            {"write": {"fg1": a}, "partition": "year=1996"},
            {"write": {"fg2": b}, "partition": "year=1997"},
        ],
    )
    entries = hudi_scan_info(str(base))
    assert {pv.get("year") for _p, pv in entries} == {"1996", "1997"}
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "pht", str(base),
        partition_keys=[PartitionKey("year", "string")],
        parameters={"spark.sql.sources.provider": "hudi"},
    )
    out = GlueSparkEngine(spark, store).sql(
        "SELECT id FROM glue.db.pht WHERE year = '1997'"
    )
    files = [f for f in out.inputFiles() if f.endswith(".parquet")]
    assert len(files) == 1 and "year=1997" in files[0]
    assert sorted(r.id for r in out.collect()) == [3]
    # non-hive partition path ("p0" default) → no values, no pruning
    plain = build_hudi_table(tmp_path / "ht2", [{"write": {"fg1": a}}])
    assert hudi_scan_info(str(plain))[0][1] == {}


def test_no_completed_commits_raises(tmp_path, frames):
    a, _, _ = frames
    base = build_hudi_table(
        tmp_path / "ht", [{"write": {"fg1": a}, "inflight": True}]
    )
    with pytest.raises(GlueSparkError, match="No completed Hudi"):
        hudi_data_files(str(base))


def test_engine_hudi_scan(spark, tmp_path, frames):
    a, b, a2 = frames
    base = build_hudi_table(
        tmp_path / "ht",
        [{"write": {"fg1": a, "fg2": b}}, {"write": {"fg1": a2}}],
        orphan=b,
    )
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "htable", str(base),
        parameters={"hoodie.table.name": "htable"},
    )
    out = GlueSparkEngine(spark, store).sql(
        "SELECT id, v FROM glue.db.htable ORDER BY id"
    )
    assert [(r.id, r.v) for r in out.collect()] == [
        (1, "A"), (2, "B"), (3, "c")
    ]


def test_hudi_timeline_reconstruction_property(tmp_path):
    """Property: for ANY sequence of write/replace/inflight instants,
    the walk's file set equals a latest-slice-per-group model replay.
    Driver-only — the walk never touches data files."""
    import json

    from hypothesis import given, settings, strategies as st

    groups = [f"fg{i}" for i in range(4)]
    instant_strategy = st.fixed_dictionaries(
        {
            "write": st.sets(st.sampled_from(groups), max_size=3),
            "replace": st.sets(st.sampled_from(groups), max_size=2),
            "inflight": st.booleans(),
        }
    )
    counter = iter(range(10**6))

    @settings(max_examples=40, deadline=None)
    @given(instants=st.lists(instant_strategy, min_size=1, max_size=6))
    def run(instants):
        base = tmp_path / f"p{next(counter)}"
        hoodie = base / ".hoodie"
        hoodie.mkdir(parents=True)
        (hoodie / "hoodie.properties").write_text(
            "hoodie.table.type=COPY_ON_WRITE\n"
        )
        model: dict[str, str] = {}
        any_completed = False
        for i, spec in enumerate(instants):
            ts = 20240101000000 + i
            stats = [
                {"fileId": g, "path": f"p0/{g}_0-0-0_{ts}.parquet"}
                for g in sorted(spec["write"])
            ]
            payload: dict = {"partitionToWriteStats": {"p0": stats}}
            kind = "commit"
            if spec["replace"]:
                kind = "replacecommit"
                payload["partitionToReplaceFileIds"] = {
                    "p0": sorted(spec["replace"])
                }
            suffix = f"{kind}.inflight" if spec["inflight"] else kind
            (hoodie / f"{ts}.{suffix}").write_text(json.dumps(payload))
            if spec["inflight"]:
                continue
            any_completed = True
            if spec["replace"]:
                for g in spec["replace"]:
                    model.pop(g, None)
            for g in sorted(spec["write"]):
                model[g] = f"p0/{g}_0-0-0_{ts}.parquet"
        if not any_completed:
            with pytest.raises(GlueSparkError, match="No completed"):
                hudi_data_files(str(base))
            return
        got = {
            p.split("/p0/", 1)[1] for p in hudi_data_files(str(base))
        }
        assert got == {v.split("/", 1)[1] for v in model.values()}, instants

    run()


def test_hudi_changes_incremental_feed(tmp_path, frames):
    a, b, a2 = frames
    base = build_hudi_table(
        tmp_path / "ht",
        [{"write": {"fg1": a}}, {"write": {"fg2": b}},
         {"write": {"fg1": a2}}],
    )
    from glue_table_cache_spark.sources.hudi import hudi_changes

    latest, written = hudi_changes(str(base), since_instant=0)
    assert latest == 20240101000002
    assert len(written) == 3  # all instants after 0
    latest2, written2 = hudi_changes(
        str(base), since_instant=20240101000000
    )
    assert {p.rsplit("/", 1)[1] for p in written2} == {
        "fg2_0-0-0_20240101000001.parquet",
        "fg1_0-0-0_20240101000002.parquet",
    }
    assert hudi_changes(str(base), since_instant=latest)[1] == []


# ---------------------------------------------------------------------------
# MERGE_ON_READ: log codec + merge
# ---------------------------------------------------------------------------


def test_log_codec_roundtrip():
    from glue_table_cache_spark.sources.hudi_log import (
        data_block,
        delete_block,
        read_log_blocks,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "v", "type": ["null", "string"]},
        ],
    }
    blocks = [
        data_block("20240101000001", schema,
                   [{"id": 1, "v": "x"}, {"id": 2, "v": None}]),
        delete_block("20240101000002", [("2", "p0")]),
    ]
    out = read_log_blocks(b"".join(blocks))
    assert [b["type"] for b in out] == ["data", "delete"]
    assert out[0]["instant"] == "20240101000001"
    assert out[0]["records"] == [
        {"id": 1, "v": "x"}, {"id": 2, "v": None},
    ]
    assert out[1]["deletes"] == [("2", "p0")]


def test_log_codec_torn_tail_and_bad_magic():
    """A torn append (truncated last block) stops at the last complete
    block; a file that never starts with the magic refuses."""
    from glue_table_cache_spark.sources.hudi_log import (
        data_block,
        read_log_blocks,
    )

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "id", "type": "long"}]}
    good = data_block("1", schema, [{"id": 1}])
    torn = data_block("2", schema, [{"id": 2}])[:-9]
    out = read_log_blocks(good + torn)
    assert len(out) == 1 and out[0]["records"] == [{"id": 1}]
    with pytest.raises(ValueError, match="not a Hudi log"):
        read_log_blocks(b"garbage-not-magic")


def test_log_codec_rollback_command_block():
    """A command block targeting an instant invalidates that
    instant's earlier blocks (the merge layer drops them)."""
    from glue_table_cache_spark.sources.hudi_log import (
        _frame_block,
        COMMAND_BLOCK,
        H_INSTANT_TIME,
        H_TARGET_INSTANT_TIME,
        data_block,
        read_log_blocks,
    )

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "id", "type": "long"}]}
    rollback = _frame_block(
        COMMAND_BLOCK,
        {H_INSTANT_TIME: "3", H_TARGET_INSTANT_TIME: "2"},
        b"",
    )
    blocks = (
        data_block("1", schema, [{"id": 1}])
        + data_block("2", schema, [{"id": 99}])
        + rollback
    )
    out = read_log_blocks(blocks)
    assert [b["type"] for b in out] == ["data", "data", "command"]
    assert out[2]["target_instant"] == "2"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_log_codec_property_roundtrip(seed):
    """Random block sequences survive the writer→reader round trip
    byte-exactly (the no-Hudi-runtime substitute for cross-engine
    validation, same posture as the DV codec property test)."""
    import random

    from glue_table_cache_spark.sources.hudi_log import (
        data_block,
        delete_block,
        read_log_blocks,
    )

    rng = random.Random(seed)
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "d", "type": "double"},
        ],
    }
    want = []
    raw = b""
    for _ in range(rng.randint(1, 6)):
        if rng.random() < 0.6:
            recs = [
                {
                    "id": rng.randint(-(2**40), 2**40),
                    "s": "".join(
                        rng.choice("abc åß") for _ in range(rng.randint(0, 9))
                    ),
                    "d": rng.uniform(-1e6, 1e6),
                }
                for _ in range(rng.randint(0, 5))
            ]
            want.append(("data", recs))
            raw += data_block(str(rng.randint(1, 9)), schema, recs)
        else:
            keys = [
                (str(rng.randint(0, 99)), "p")
                for _ in range(rng.randint(1, 4))
            ]
            want.append(("delete", keys))
            raw += delete_block(str(rng.randint(1, 9)), keys)
    got = read_log_blocks(raw)
    assert len(got) == len(want)
    for g, (kind, payload) in zip(got, want):
        assert g["type"] == kind
        if kind == "data":
            assert g["records"] == payload
        else:
            assert g["deletes"] == payload


@pytest.fixture()
def mor_table(spark, tmp_path):
    """MOR table: 2 base groups, then a deltacommit upserting id=2,
    deleting id=3 and inserting id=9; then another update of id=2."""
    from glue_table_cache_spark.sources.hudi_log import (
        data_block,
        delete_block,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "v", "type": ["null", "string"]},
        ],
    }
    a = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    b = spark.createDataFrame([(3, "c"), (4, "d")], "id long, v string")
    log1 = data_block(
        "20240101000001", schema, [{"id": 2, "v": "B1"}]
    ) + delete_block("20240101000001", [("3", "p0")])
    log2 = data_block(
        "20240101000002", schema,
        [{"id": 2, "v": "B2"}, {"id": 9, "v": "new"}],
    )
    return build_hudi_table(
        tmp_path / "mor",
        [
            {"write": {"fg1": a, "fg2": b}},
            {"log": {"fg1": log1}},
            {"log": {"fg1": log2}},
        ],
        table_type="MERGE_ON_READ",
    )


def test_mor_merge_snapshot_view(spark, mor_table):
    """Latest-instant-wins merge: update applied twice (newest wins),
    delete applied, new key inserted, untouched group intact."""
    from glue_table_cache_spark.sources.hudi import hudi_mor_scan_info
    from glue_table_cache_spark.sources.hudi_mor import hudi_mor_read

    base_entries, log_entries = hudi_mor_scan_info(str(mor_table))
    assert len(base_entries) == 2 and len(log_entries) == 2
    out = hudi_mor_read(
        spark, base_entries, log_entries, record_key_field="id"
    )
    got = sorted((r.id, r.v) for r in out.collect())
    assert got == [(1, "a"), (2, "B2"), (4, "d"), (9, "new")]


def test_mor_compaction_folds_logs(spark, tmp_path, frames):
    """After a compaction commit rewrites the base, older logs are
    folded in and must not replay again."""
    from glue_table_cache_spark.sources.hudi import hudi_mor_scan_info
    from glue_table_cache_spark.sources.hudi_log import data_block

    a, _b, a2 = frames
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "v", "type": ["null", "string"]},
        ],
    }
    base = build_hudi_table(
        tmp_path / "mor2",
        [
            {"write": {"fg1": a}},
            {"log": {"fg1": data_block(
                "20240101000001", schema, [{"id": 1, "v": "stale"}]
            )}},
            {"write": {"fg1": a2}},  # compaction
        ],
        table_type="MERGE_ON_READ",
    )
    base_entries, log_entries = hudi_mor_scan_info(str(base))
    assert log_entries == []  # folded by the compaction
    assert [p.rsplit("/", 1)[1] for p, _pv, _t in base_entries] == [
        "fg1_0-0-0_20240101000002.parquet"
    ]


def test_engine_scans_mor_snapshot(spark, mor_table):
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "mor", str(mor_table),
        parameters={
            "spark.sql.sources.provider": "hudi",
            "hoodie.table.recordkey.fields": "id",
        },
    )
    out = GlueSparkEngine(spark, store).sql(
        "SELECT id, v FROM glue.db.mor ORDER BY id"
    )
    assert [(r.id, r.v) for r in out.collect()] == [
        (1, "a"), (2, "B2"), (4, "d"), (9, "new"),
    ]


def test_hudi_timeline(spark, tmp_path, frames):
    from glue_table_cache_spark.sources.hudi import hudi_timeline

    a, b, a2 = frames
    base = build_hudi_table(
        tmp_path / "ht",
        [{"write": {"fg1": a, "fg2": b}}, {"write": {"fg1": a2}}],
    )
    rows = hudi_timeline(spark, str(base)).collect()
    assert [(r.instant, r.action, r.files_written) for r in rows] == [
        (20240101000000, "commit", 2), (20240101000001, "commit", 1),
    ]


def test_mor_partition_pruning(spark, tmp_path):
    """Partitioned MOR: the predicate prunes base AND log files from
    the timeline metadata; kept partitions still merge their logs."""
    from glue_table_cache_spark.catalog import PartitionKey
    from glue_table_cache_spark.sources.hudi import hudi_mor_scan_info
    from glue_table_cache_spark.sources.hudi_log import data_block

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "v", "type": ["null", "string"]},
        ],
    }
    a = spark.createDataFrame([(1, "a")], "id long, v string")
    b = spark.createDataFrame([(2, "b")], "id long, v string")
    base = build_hudi_table(
        tmp_path / "morp",
        [
            {"write": {"fg1": a}, "partition": "year=1996"},
            {"write": {"fg2": b}, "partition": "year=1997"},
            {"log": {"fg1": data_block(
                "20240101000002", schema, [{"id": 1, "v": "A2"}]
            )}, "partition": "year=1996"},
        ],
        table_type="MERGE_ON_READ",
    )
    bases, logs = hudi_mor_scan_info(str(base))
    assert [pv for _p, _t, pv in logs] == [{"year": "1996"}]
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "morp", str(base),
        partition_keys=[PartitionKey("year", "string")],
        parameters={
            "spark.sql.sources.provider": "hudi",
            "hoodie.table.recordkey.fields": "id",
        },
    )
    eng = GlueSparkEngine(spark, store)
    # kept partition: the log upsert applies
    out = eng.sql(
        "SELECT id, v FROM glue.db.morp WHERE year = '1996'"
    )
    assert [(r.id, r.v) for r in out.collect()] == [(1, "A2")]
    # pruned partition: only fg2's base file is scanned
    other = eng.sql(
        "SELECT id, v FROM glue.db.morp WHERE year = '1997'"
    )
    files = [f for f in other.inputFiles() if f.endswith(".parquet")]
    assert len(files) == 1 and "year=1997" in files[0]
    assert [(r.id, r.v) for r in other.collect()] == [(2, "b")]


def test_hudi_log_driven_pruning_without_catalog_keys(spark, tmp_path):
    """A Hudi entry registered WITHOUT PartitionKeys (the common Glue
    shape) still prunes from the write stats' partition paths."""
    from glue_table_cache_spark.catalog import LocalMetadataStore
    from glue_table_cache_spark.engine import GlueSparkEngine
    from glue_table_cache_spark.sinks.hudi_write import write_hudi_append

    loc = str(tmp_path / "lp")
    write_hudi_append(
        spark.createDataFrame(
            [(1, "1996"), (2, "1996"), (3, "1997")],
            "id long, year string",
        ).coalesce(1),
        loc,
        partition_by=["year"],
    )
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "lp", loc, parameters={"hoodie.table.name": "lp"}
    )
    eng = GlueSparkEngine(spark, store)
    out = eng.sql("SELECT id FROM glue.db.lp WHERE year = '1996'")
    assert len(out.inputFiles()) == 1  # 1997 file never handed over
    assert sorted(r.id for r in out.collect()) == [1, 2]


def test_hudi_time_travel_version_as_of(spark, tmp_path):
    """VERSION AS OF <instant> on a glue-registered Hudi table replays
    the timeline only to that instant — COW sees the pre-delete state,
    MOR sees the pre-log state; an instant predating the timeline
    refuses, as does TIMESTAMP AS OF (no wall-clock mapping)."""
    import pytest as _p

    from glue_table_cache_spark.catalog import LocalMetadataStore
    from glue_table_cache_spark.engine import GlueSparkEngine
    from glue_table_cache_spark.errors import GlueSparkError
    from glue_table_cache_spark.sinks.hudi_log_write import (
        delete_from_hudi,
        write_hudi_log,
    )
    from glue_table_cache_spark.sinks.hudi_write import write_hudi_append

    loc = str(tmp_path / "cow")
    i1 = int(write_hudi_append(
        spark.createDataFrame([(1,), (2,)], "id long").coalesce(1), loc
    ))
    i2, n = delete_from_hudi(spark, loc, "id = 2")
    assert n == 1
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "t", loc, parameters={"hoodie.table.name": "t"}
    )
    eng = GlueSparkEngine(spark, store)
    assert sorted(
        r.id for r in eng.sql("SELECT id FROM glue.db.t").collect()
    ) == [1]
    assert sorted(
        r.id
        for r in eng.sql(
            f"SELECT id FROM glue.db.t VERSION AS OF {i1}"
        ).collect()
    ) == [1, 2]
    with _p.raises(GlueSparkError, match="predates"):
        eng.sql(
            f"SELECT id FROM glue.db.t VERSION AS OF {i1 - 1}"
        ).collect()

    # TIMESTAMP AS OF resolves through the timeline's wall clocks
    # (r12): a yyyyMMddHHmmss instant name IS a UTC wall clock
    import datetime as _dt
    from pathlib import Path as _Path

    def _iso(instant):
        return _dt.datetime.strptime(
            str(instant)[:14], "%Y%m%d%H%M%S"
        ).isoformat()

    assert sorted(
        r.id
        for r in eng.sql(
            f"SELECT id FROM glue.db.t TIMESTAMP AS OF '{_iso(i1)}'"
        ).collect()
    ) == [1, 2]
    assert sorted(
        r.id
        for r in eng.sql(
            f"SELECT id FROM glue.db.t TIMESTAMP AS OF '{_iso(i2)}'"
        ).collect()
    ) == [1]
    # an instant predating the retained timeline refuses
    with _p.raises(GlueSparkError, match="postdates"):
        eng.sql(
            "SELECT id FROM glue.db.t TIMESTAMP AS OF '2024-01-01'"
        ).collect()
    # Hudi 1.x two-part names: the COMPLETION timestamp is the
    # visibility clock — push i2's completion a minute out and the
    # same literal no longer includes it
    late = (
        _dt.datetime.strptime(str(i2)[:14], "%Y%m%d%H%M%S")
        + _dt.timedelta(minutes=1)
    ).strftime("%Y%m%d%H%M%S")
    hoodie = _Path(loc) / ".hoodie"
    (hoodie / f"{i2}.replacecommit").rename(
        hoodie / f"{i2}_{late}.replacecommit"
    )
    eng.invalidate_table("db", "t")
    assert sorted(
        r.id
        for r in eng.sql(
            f"SELECT id FROM glue.db.t TIMESTAMP AS OF '{_iso(i2)}'"
        ).collect()
    ) == [1, 2]
    assert sorted(
        r.id
        for r in eng.sql(
            f"SELECT id FROM glue.db.t TIMESTAMP AS OF "
            f"'{_iso(late)}'"
        ).collect()
    ) == [1]

    # MOR: travel to the base instant hides the delete log block
    mloc = str(tmp_path / "mor")
    m1 = int(write_hudi_append(
        spark.createDataFrame([(1,), (2,)], "id long").coalesce(1),
        mloc,
        table_type="MERGE_ON_READ",
    ))
    write_hudi_log(spark, mloc, "id", delete_keys=[2])
    store.register_parquet_dir(
        "db", "m", mloc,
        parameters={
            "hoodie.table.name": "m",
            "hoodie.table.recordkey.fields": "id",
        },
    )
    assert sorted(
        r.id for r in eng.sql("SELECT id FROM glue.db.m").collect()
    ) == [1]
    assert sorted(
        r.id
        for r in eng.sql(
            f"SELECT id FROM glue.db.m VERSION AS OF {m1}"
        ).collect()
    ) == [1, 2]
    # MOR timestamp travel rides the same wall-clock resolution
    assert sorted(
        r.id
        for r in eng.sql(
            f"SELECT id FROM glue.db.m TIMESTAMP AS OF '{_iso(m1)}'"
        ).collect()
    ) == [1, 2]


def test_mor_log_insert_missing_partition_cols_refuses(
    spark, tmp_path
):
    """A direct write_hudi_log insert on a PARTITIONED MOR table must
    carry every recorded partition field — routing to default_fid
    would surface the row under the wrong partition (r10 advice)."""
    import pytest as _p

    from glue_table_cache_spark.errors import GlueSparkError
    from glue_table_cache_spark.sinks.hudi_log_write import (
        write_hudi_log,
    )
    from glue_table_cache_spark.sinks.hudi_write import (
        write_hudi_append,
    )

    loc = str(tmp_path / "morpins")
    write_hudi_append(
        spark.createDataFrame(
            [(1, "1996"), (2, "1997")], "id long, year string"
        ).coalesce(1),
        loc,
        partition_by=["year"],
        table_type="MERGE_ON_READ",
    )
    # an INSERT (new key 3) without the partition column → refuse
    with _p.raises(GlueSparkError, match="partition column"):
        write_hudi_log(
            spark,
            loc,
            "id",
            upserts=spark.createDataFrame([(3,)], "id long"),
        )
    # an UPSERT of a LIVE key without pcols still routes by key
    write_hudi_log(
        spark,
        loc,
        "id",
        upserts=spark.createDataFrame([(1,)], "id long"),
    )
    # with the partition column supplied, the insert routes home
    write_hudi_log(
        spark,
        loc,
        "id",
        upserts=spark.createDataFrame(
            [(3, "1997")], "id long, year string"
        ),
    )
    from glue_table_cache_spark.catalog import LocalMetadataStore
    from glue_table_cache_spark.engine import GlueSparkEngine

    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "t", loc,
        parameters={
            "hoodie.table.name": "t",
            "hoodie.table.recordkey.fields": "id",
        },
    )
    eng = GlueSparkEngine(spark, store)
    got = sorted(
        (r.id, str(r.year))
        for r in eng.sql("SELECT id, year FROM glue.db.t").collect()
    )
    assert got == [(1, "1996"), (2, "1997"), (3, "1997")]


def test_hudi_table_changes_mor_deltacommit(spark, tmp_path):
    """table_changes() over a MOR deltacommit decodes the log blocks:
    upserts emit as update_postimage, delete blocks as key-carrying
    delete rows; compaction windows emit nothing (content-preserving);
    the full changelog replays onto a Delta twin via apply_changes."""
    from glue_table_cache_spark.operators.incremental import (
        apply_changes,
    )
    from glue_table_cache_spark.sinks.delta_write import (
        write_delta_append,
    )
    from glue_table_cache_spark.sinks.hudi_log_write import (
        compact_hudi,
        write_hudi_log,
    )
    from glue_table_cache_spark.sinks.hudi_write import (
        write_hudi_append,
    )
    from glue_table_cache_spark.sources.hudi import hudi_table_changes

    loc = str(tmp_path / "morcdc")
    i1 = int(
        write_hudi_append(
            spark.createDataFrame(
                [(1, "a", 1.0), (2, "b", 2.0)],
                "id long, name string, x double",
            ),
            loc,
            table_type="MERGE_ON_READ",
        )
    )
    i2 = int(
        write_hudi_log(
            spark,
            loc,
            "id",
            upserts=spark.createDataFrame(
                [(2, "b", 20.0), (3, "c", 3.0)],
                "id long, name string, x double",
            ),
            delete_keys=[1],
        )
    )
    got = sorted(
        (r.id, r.name, r.x, r._change_type, r._commit_version)
        for r in hudi_table_changes(
            spark, loc, i2, record_key_field="id"
        ).collect()
    )
    assert got == [
        (1, None, None, "delete", i2),
        (2, "b", 20.0, "update_postimage", i2),
        (3, "c", 3.0, "update_postimage", i2),
    ]
    # a data block then a delete block for the SAME key in one
    # deltacommit nets to the delete (block order, as the snapshot
    # merge would resolve it)
    i3 = int(
        write_hudi_log(
            spark,
            loc,
            "id",
            upserts=spark.createDataFrame(
                [(3, "zzz", 33.0)], "id long, name string, x double"
            ),
            delete_keys=[3],
        )
    )
    got = [
        (r.id, r._change_type)
        for r in hudi_table_changes(
            spark, loc, i3, record_key_field="id"
        ).collect()
    ]
    assert got == [(3, "delete")]
    # compaction is content-preserving: its window emits nothing
    i4 = int(compact_hudi(spark, loc, "id"))
    assert (
        hudi_table_changes(
            spark, loc, i4, record_key_field="id"
        ).count()
        == 0
    )
    # full-history replay through the engine TVF onto a Delta twin
    twin = str(tmp_path / "twin")
    write_delta_append(
        spark.createDataFrame([], "id long, name string, x double"),
        twin,
    )
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "src", loc,
        parameters={
            "hoodie.table.name": "src",
            "hoodie.table.recordkey.fields": "id",
        },
    )
    store.register_parquet_dir(
        "db", "twin", twin,
        parameters={"spark.sql.sources.provider": "delta"},
    )
    eng = GlueSparkEngine(spark, store)
    feed = eng.sql(f"SELECT * FROM table_changes(glue.db.src, {i1})")
    apply_changes(eng, "glue.db.twin", feed, keys=["id"])
    assert sorted(
        (r.id, r.name, r.x)
        for r in eng.sql("SELECT * FROM glue.db.twin").collect()
    ) == [(2, "b", 20.0)]
    # ...which is exactly the source's merged snapshot
    assert sorted(
        (r.id, r.name, r.x)
        for r in eng.sql("SELECT * FROM glue.db.src").collect()
    ) == [(2, "b", 20.0)]


def test_mor_delete_of_log_born_key_survives_compaction(
    spark, tmp_path
):
    """A key inserted via a LOG block (never in any base file) must be
    deletable by a later write_hudi_log call: the delete block has to
    land in the SAME file group as the log-born insert, or per-group
    compaction folds the insert without the delete and resurrects the
    row."""
    from glue_table_cache_spark.sinks.hudi_log_write import (
        compact_hudi,
        write_hudi_log,
    )
    from glue_table_cache_spark.sinks.hudi_write import (
        write_hudi_append,
    )
    from glue_table_cache_spark.sources.hudi import hudi_mor_scan_info
    from glue_table_cache_spark.sources.hudi_mor import hudi_mor_read

    loc = str(tmp_path / "logborn")
    write_hudi_append(
        spark.createDataFrame([(1, "a")], "id long, v string"),
        loc,
        table_type="MERGE_ON_READ",
    )
    # log-born insert of id=2, then a SEPARATE delete call for it
    write_hudi_log(
        spark, loc, "id",
        upserts=spark.createDataFrame([(2, "b")], "id long, v string"),
    )
    write_hudi_log(spark, loc, "id", delete_keys=[2])

    def snapshot():
        bases, logs = hudi_mor_scan_info(loc)
        return sorted(
            (r.id, r.v)
            for r in hudi_mor_read(
                spark,
                bases,
                [(p, t) for p, t, _pv in logs],
                record_key_field="id",
            ).collect()
        )

    assert snapshot() == [(1, "a")]
    compact_hudi(spark, loc, "id")
    assert snapshot() == [(1, "a")]  # id=2 must NOT resurrect
    # an upsert of a log-born key routes to its group too: compaction
    # must not duplicate it across groups
    write_hudi_log(
        spark, loc, "id",
        upserts=spark.createDataFrame([(3, "c")], "id long, v string"),
    )
    write_hudi_log(
        spark, loc, "id",
        upserts=spark.createDataFrame([(3, "C2")], "id long, v string"),
    )
    compact_hudi(spark, loc, "id")
    assert snapshot() == [(1, "a"), (3, "C2")]


def test_mor_log_blocks_carry_timestamp_and_date(spark, tmp_path):
    """MOR log payloads support timestamp/date columns (Avro logical
    types timestamp-micros / date): upserts round-trip through the
    block codec into the merged snapshot, the changelog decode, and
    compaction."""
    import datetime as dt

    from glue_table_cache_spark.sinks.hudi_log_write import (
        compact_hudi,
        write_hudi_log,
    )
    from glue_table_cache_spark.sinks.hudi_write import (
        write_hudi_append,
    )
    from glue_table_cache_spark.sources.hudi import (
        hudi_mor_scan_info,
        hudi_table_changes,
    )
    from glue_table_cache_spark.sources.hudi_mor import hudi_mor_read

    loc = str(tmp_path / "morts")
    t1 = dt.datetime(2024, 3, 5, 10, 30, 0, 123456)
    t2 = dt.datetime(2025, 7, 1, 23, 59, 59, 999999)
    d1, d2 = dt.date(2024, 3, 5), dt.date(2025, 7, 1)
    write_hudi_append(
        spark.createDataFrame(
            [(1, t1, d1), (2, t1, d1)],
            "id long, ts timestamp, d date",
        ),
        loc,
        table_type="MERGE_ON_READ",
    )
    i2 = int(
        write_hudi_log(
            spark,
            loc,
            "id",
            upserts=spark.createDataFrame(
                [(2, t2, d2), (3, t2, d2)],
                "id long, ts timestamp, d date",
            ),
        )
    )

    def snapshot():
        bases, logs = hudi_mor_scan_info(loc)
        return sorted(
            (r.id, r.ts, r.d)
            for r in hudi_mor_read(
                spark,
                bases,
                [(p, t, pv) for p, t, pv in logs],
                record_key_field="id",
            ).collect()
        )

    expect = [(1, t1, d1), (2, t2, d2), (3, t2, d2)]
    assert snapshot() == expect
    # the changelog decode delivers the typed payloads too
    got = sorted(
        (r.id, r.ts, r.d)
        for r in hudi_table_changes(
            spark, loc, i2, record_key_field="id"
        ).collect()
    )
    assert got == [(2, t2, d2), (3, t2, d2)]
    # compaction folds the typed log rows into the new base slice
    compact_hudi(spark, loc, "id")
    assert snapshot() == expect


def _stage_parquet(df, dest):
    """Write ``df`` as ONE parquet file at exactly ``dest`` (the
    fixture-style stage-and-rename real Hudi base-file names need)."""
    import shutil
    from pathlib import Path

    dest = Path(dest)
    stage = dest.parent / f"_stage_{dest.name}"
    df.coalesce(1).write.mode("overwrite").parquet(str(stage))
    next(stage.glob("part-*.parquet")).rename(dest)
    shutil.rmtree(stage, ignore_errors=True)


def test_table_changes_deltacommit_base_file_inserts(
    spark, tmp_path
):
    """Real Hudi MOR routes INSERTS to new base files inside
    deltacommits: those rows must emit as inserts at the
    deltacommit's OWN instant (previously they were attributed to the
    next base-state diff, or dropped when the deltacommit closed the
    window), alongside the same instant's log-borne changes — and a
    LATER commit's window must not re-emit them."""
    import json as _json

    from glue_table_cache_spark.sources.hudi import hudi_table_changes
    from glue_table_cache_spark.sources.hudi_fixture import (
        build_hudi_table,
    )
    from glue_table_cache_spark.sources.hudi_log import (
        delete_block,
        write_log_file,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "v", "type": ["null", "string"]},
        ],
    }
    base = build_hudi_table(
        tmp_path / "deltabase",
        [{"write": {"fg1": spark.createDataFrame(
            [(1, "a")], "id long, v string"
        )}}],  # instant 20240101000000
        table_type="MERGE_ON_READ",
    )
    first = base / ".hoodie" / "20240101000000.commit"
    body = _json.loads(first.read_text())
    body["extraMetadata"] = {"schema": _json.dumps(schema)}
    first.write_text(_json.dumps(body))
    # deltacommit 20240101000001: a NEW base file (insert routing)
    # plus a log delete of key 1 — both units at this instant
    base_name = "fg2_0-0-0_20240101000001.parquet"
    _stage_parquet(
        spark.createDataFrame(
            [(10, "x"), (11, "y")], "id long, v string"
        ),
        base / base_name,
    )
    log_name = ".fg1_20240101000001.log.1_0-0-0"
    write_log_file(
        base / log_name,
        [delete_block("20240101000001", [("1", "")])],
    )
    (base / ".hoodie" / "20240101000001.deltacommit").write_text(
        _json.dumps(
            {
                "partitionToWriteStats": {
                    "": [
                        {"fileId": "fg2", "path": base_name,
                         "partitionPath": ""},
                        {"fileId": "fg1", "path": log_name,
                         "partitionPath": ""},
                    ]
                }
            }
        )
    )
    w = hudi_table_changes(
        spark, str(base), 20240101000001, 20240101000001,
        record_key_field="id",
    )
    assert sorted(
        (r.id, r.v, r._change_type, r._commit_version)
        for r in w.collect()
    ) == [
        (1, None, "delete", 20240101000001),
        (10, "x", "insert", 20240101000001),
        (11, "y", "insert", 20240101000001),
    ]
    # a LATER plain commit's window carries only ITS file — the
    # deltacommit's base file folded into the tracked state
    base3 = "fg3_0-0-0_20240101000002.parquet"
    _stage_parquet(
        spark.createDataFrame([(20, "z")], "id long, v string"),
        base / base3,
    )
    (base / ".hoodie" / "20240101000002.commit").write_text(
        _json.dumps(
            {
                "partitionToWriteStats": {
                    "": [{"fileId": "fg3", "path": base3,
                          "partitionPath": ""}]
                }
            }
        )
    )
    w2 = hudi_table_changes(
        spark, str(base), 20240101000002, 20240101000002,
        record_key_field="id",
    )
    assert sorted(
        (r.id, r.v, r._change_type) for r in w2.collect()
    ) == [(20, "z", "insert")]


def test_table_changes_log_rollover_nets_in_version_order(
    spark, tmp_path
):
    """A deltacommit whose file group rolled over (``.log.1`` then
    ``.log.2`` at ONE instant) nets per key in numeric version order
    — the upsert in ``.log.1`` followed by the delete in ``.log.2``
    yields exactly one delete row, never two conflicting rows."""
    import json as _json

    from glue_table_cache_spark.sources.hudi import hudi_table_changes
    from glue_table_cache_spark.sources.hudi_fixture import (
        build_hudi_table,
    )
    from glue_table_cache_spark.sources.hudi_log import (
        data_block,
        delete_block,
        write_log_file,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "v", "type": ["null", "string"]},
        ],
    }
    base = build_hudi_table(
        tmp_path / "rollover",
        [{"write": {"fg1": spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, v string"
        )}}],
        table_type="MERGE_ON_READ",
    )
    first = base / ".hoodie" / "20240101000000.commit"
    body = _json.loads(first.read_text())
    body["extraMetadata"] = {"schema": _json.dumps(schema)}
    first.write_text(_json.dumps(body))
    ts = "20240101000001"
    log1 = f".fg1_{ts}.log.1_0-0-0"
    log2 = f".fg1_{ts}.log.2_0-0-0"
    write_log_file(
        base / log1,
        [data_block(ts, schema, [{"id": 2, "v": "bb"}])],
    )
    write_log_file(base / log2, [delete_block(ts, [("2", "")])])
    (base / ".hoodie" / f"{ts}.deltacommit").write_text(
        _json.dumps(
            {
                "partitionToWriteStats": {
                    "": [
                        {"fileId": "fg1", "path": log1,
                         "partitionPath": ""},
                        {"fileId": "fg1", "path": log2,
                         "partitionPath": ""},
                    ]
                }
            }
        )
    )
    w = hudi_table_changes(
        spark, str(base), int(ts), int(ts), record_key_field="id"
    )
    assert sorted(
        (r.id, r.v, r._change_type) for r in w.collect()
    ) == [(2, None, "delete")]


def test_table_changes_replacecommit_over_live_logs(
    spark, tmp_path
):
    """Clustering AFTER un-compacted MOR upserts (the normal MOR
    lifecycle): a replacecommit retiring a file group with live log
    blocks emits deletes of the group's MERGED pre-state (base +
    logs — including log-born keys) and inserts of the replacement
    slices, instead of refusing."""
    import json as _json

    from glue_table_cache_spark.sinks.hudi_log_write import (
        write_hudi_log,
    )
    from glue_table_cache_spark.sinks.hudi_write import (
        write_hudi_append,
    )
    from glue_table_cache_spark.sources.hudi import hudi_table_changes

    loc = tmp_path / "clusterlive"
    i1 = int(
        write_hudi_append(
            spark.createDataFrame(
                [(1, "a"), (2, "b")], "id long, v string"
            ).coalesce(1),
            str(loc),
            table_type="MERGE_ON_READ",
        )
    )
    i2 = int(
        write_hudi_log(
            spark,
            str(loc),
            "id",
            upserts=spark.createDataFrame(
                [(2, "b2"), (3, "c")], "id long, v string"
            ),
            delete_keys=[1],
        )
    )
    # merged snapshot before clustering: (2, b2), (3, c)
    commit1 = _json.loads(
        (loc / ".hoodie" / f"{i1}.commit").read_text()
    )
    fid = next(
        st["fileId"]
        for stats in commit1["partitionToWriteStats"].values()
        for st in stats
    )
    # hand-crafted clustering replacecommit: retire the live-log
    # group, write its merged content to a new base file
    i3 = i2 + 1
    new_base = f"clustered-0_0-0-0_{i3}.parquet"
    _stage_parquet(
        spark.createDataFrame(
            [(2, "b2"), (3, "c")], "id long, v string"
        ),
        loc / new_base,
    )
    (loc / ".hoodie" / f"{i3}.replacecommit").write_text(
        _json.dumps(
            {
                "partitionToWriteStats": {
                    "": [
                        {"fileId": "clustered-0", "path": new_base,
                         "partitionPath": ""}
                    ]
                },
                "partitionToReplaceFileIds": {"": [fid]},
            }
        )
    )
    w = hudi_table_changes(
        spark, str(loc), i3, i3, record_key_field="id"
    )
    assert sorted(
        (r.id, r.v, r._change_type) for r in w.collect()
    ) == [
        (2, "b2", "delete"),
        (2, "b2", "insert"),
        (3, "c", "delete"),
        (3, "c", "insert"),
    ]
    assert {r._commit_version for r in w.collect()} == {i3}
    # the full window replays to the live state: per key, group the
    # rows by version in order; a version's insert/update wins over
    # its delete only when it carries a DIFFERENT row (an update),
    # and a delete-only version removes the key
    allw = hudi_table_changes(
        spark, str(loc), i1, record_key_field="id"
    )
    by_ver: dict = {}
    for r in allw.collect():
        by_ver.setdefault(r._commit_version, []).append(r)
    state: dict = {}
    for ver in sorted(by_ver):
        for r in by_ver[ver]:
            if r._change_type == "delete":
                state.pop(r.id, None)
        for r in by_ver[ver]:
            if r._change_type in ("insert", "update_postimage"):
                state[r.id] = r.v
    assert state == {2: "b2", 3: "c"}


def test_mor_deletes_fold_rollover_past_nine_numerically(
    spark, tmp_path
):
    """A retired live-log group whose instant rolled over past
    version 9 folds '.log.10' AFTER '.log.9' (numeric, not
    lexicographic): the pre-state a clustering replacecommit emits
    must honor the later version's delete, not resurrect the earlier
    upsert."""
    import json as _json

    from glue_table_cache_spark.sinks.hudi_write import (
        write_hudi_append,
    )
    from glue_table_cache_spark.sources.hudi import hudi_table_changes
    from glue_table_cache_spark.sources.hudi_log import (
        data_block,
        delete_block,
        write_log_file,
    )

    loc = tmp_path / "roll10"
    i1 = int(
        write_hudi_append(
            spark.createDataFrame(
                [(1, "a"), (2, "b")], "id long, v string"
            ).coalesce(1),
            str(loc),
            table_type="MERGE_ON_READ",
        )
    )
    commit1 = _json.loads(
        (loc / ".hoodie" / f"{i1}.commit").read_text()
    )
    fid = next(
        st["fileId"]
        for stats in commit1["partitionToWriteStats"].values()
        for st in stats
    )
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "v", "type": ["null", "string"]},
        ],
    }
    i2 = i1 + 1
    log9 = f".{fid}_{i2}.log.9_0-0-0"
    log10 = f".{fid}_{i2}.log.10_0-0-0"
    write_log_file(
        loc / log9,
        [data_block(str(i2), schema, [{"id": 2, "v": "b9"}])],
    )
    write_log_file(
        loc / log10, [delete_block(str(i2), [("2", "")])]
    )
    (loc / ".hoodie" / f"{i2}.deltacommit").write_text(
        _json.dumps(
            {
                "partitionToWriteStats": {
                    "": [
                        {"fileId": fid, "path": log9,
                         "partitionPath": ""},
                        {"fileId": fid, "path": log10,
                         "partitionPath": ""},
                    ]
                }
            }
        )
    )
    # merged pre-state: (1, a) only — key 2 died in .log.10
    i3 = i2 + 1
    new_base = f"clustered-0_0-0-0_{i3}.parquet"
    _stage_parquet(
        spark.createDataFrame([(1, "a")], "id long, v string"),
        loc / new_base,
    )
    (loc / ".hoodie" / f"{i3}.replacecommit").write_text(
        _json.dumps(
            {
                "partitionToWriteStats": {
                    "": [
                        {"fileId": "clustered-0", "path": new_base,
                         "partitionPath": ""}
                    ]
                },
                "partitionToReplaceFileIds": {"": [fid]},
            }
        )
    )
    w = hudi_table_changes(
        spark, str(loc), i3, i3, record_key_field="id"
    )
    assert sorted(
        (r.id, r.v, r._change_type) for r in w.collect()
    ) == [(1, "a", "delete"), (1, "a", "insert")]


def test_hudi_wallclock_travel_refuses_overlapping_completion(
    spark, tmp_path
):
    """TIMESTAMP AS OF refuses when a concurrent commit's request
    predates the target but its completion postdates the asked wall
    clock — the request-keyed replay cannot exclude its
    not-yet-visible rows."""
    import datetime as _dt

    import pytest as _p

    from glue_table_cache_spark.errors import GlueSparkError
    from glue_table_cache_spark.sinks.hudi_write import (
        write_hudi_append,
    )
    from glue_table_cache_spark.sources.hudi import (
        hudi_instant_for_wallclock,
    )

    loc = tmp_path / "overlap"
    i1 = int(
        write_hudi_append(
            spark.createDataFrame([(1,)], "id long").coalesce(1),
            str(loc),
        )
    )
    i2 = int(
        write_hudi_append(
            spark.createDataFrame([(2,)], "id long").coalesce(1),
            str(loc),
        )
    )
    # c1 requested FIRST but completed well after c2
    late = (
        _dt.datetime.strptime(str(i2)[:14], "%Y%m%d%H%M%S")
        + _dt.timedelta(minutes=5)
    ).strftime("%Y%m%d%H%M%S")
    hoodie = loc / ".hoodie"
    (hoodie / f"{i1}.commit").rename(
        hoodie / f"{i1}_{late}.commit"
    )
    ts_ms = int(
        _dt.datetime.strptime(str(i2)[:14], "%Y%m%d%H%M%S")
        .replace(tzinfo=_dt.timezone.utc)
        .timestamp()
        * 1000
    )
    with _p.raises(GlueSparkError, match="not reconstructible"):
        hudi_instant_for_wallclock(str(loc), ts_ms)


def test_table_changes_scopes_blocks_to_their_instant(
    spark, tmp_path
):
    """Real Hudi APPENDS blocks to existing log files, so the same
    file can be named by several deltacommits — each window must
    decode only ITS instant's blocks, never re-emit the file's other
    instants."""
    from glue_table_cache_spark.sources.hudi import hudi_table_changes
    from glue_table_cache_spark.sources.hudi_fixture import (
        build_hudi_table,
    )
    from glue_table_cache_spark.sources.hudi_log import (
        data_block,
        write_log_file,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "v", "type": ["null", "string"]},
        ],
    }
    base = build_hudi_table(
        tmp_path / "multi",
        [{"write": {"fg1": spark.createDataFrame(
            [(1, "a")], "id long, v string"
        )}}],  # instant 20240101000000
        table_type="MERGE_ON_READ",
    )
    import json as _json

    # record the table schema (the decode types payloads from it)
    first = base / ".hoodie" / "20240101000000.commit"
    body = _json.loads(first.read_text())
    body["extraMetadata"] = {"schema": _json.dumps(schema)}
    first.write_text(_json.dumps(body))
    # ONE log file holding blocks from TWO instants, named by both
    # deltacommits (the real-Hudi append shape)
    log_name = ".fg1_20240101000001.log.1_0-0-0"
    write_log_file(
        base / log_name,
        [
            data_block("20240101000001", schema, [{"id": 2, "v": "x"}]),
            data_block("20240101000002", schema, [{"id": 3, "v": "y"}]),
        ],
    )
    for ts in ("20240101000001", "20240101000002"):
        (base / ".hoodie" / f"{ts}.deltacommit").write_text(
            _json.dumps(
                {
                    "partitionToWriteStats": {
                        "": [{"fileId": "fg1", "path": log_name,
                              "partitionPath": ""}]
                    }
                }
            )
        )
    w1 = hudi_table_changes(
        spark, str(base), 20240101000001, 20240101000001,
        record_key_field="id",
    )
    assert [(r.id, r.v, r._commit_version) for r in w1.collect()] == [
        (2, "x", 20240101000001)
    ]
    w2 = hudi_table_changes(
        spark, str(base), 20240101000002, 20240101000002,
        record_key_field="id",
    )
    assert [(r.id, r.v, r._commit_version) for r in w2.collect()] == [
        (3, "y", 20240101000002)
    ]


def test_table_changes_replacecommit_retires_log_born_group(
    spark, tmp_path
):
    """A replacecommit retiring a LOG-BORN file group (live logs, no
    base slice — insert-routed-to-logs writers) emits the group's
    merged pre-state as deletes via a base-less log fold (r13;
    previously refused): upserted-then-reupserted keys emit their
    NEWEST payload, keys whose last action was a delete block do not
    re-emit."""
    import json as _json

    from glue_table_cache_spark.sinks.hudi_log_write import (
        write_hudi_log,
    )
    from glue_table_cache_spark.sinks.hudi_write import (
        write_hudi_append,
    )
    from glue_table_cache_spark.sources.hudi import hudi_table_changes

    loc = tmp_path / "logbornclust"
    write_hudi_append(
        spark.createDataFrame([(1, "a")], "id long, v string"),
        str(loc),
        table_type="MERGE_ON_READ",
    )
    # log-born inserts: keys 2 and 3 exist only in log blocks
    i2 = int(
        write_hudi_log(
            spark, str(loc), "id",
            upserts=spark.createDataFrame(
                [(2, "b"), (3, "c")], "id long, v string"
            ),
        )
    )
    # re-upsert 3 (fold must keep the newest) and delete 2 (must not
    # re-emit as a clustering delete)
    i3 = int(
        write_hudi_log(
            spark, str(loc), "id",
            upserts=spark.createDataFrame(
                [(3, "C2")], "id long, v string"
            ),
            delete_keys=[2],
        )
    )
    dc = _json.loads(
        (loc / ".hoodie" / f"{i2}.deltacommit").read_text()
    )
    fid = next(
        st["fileId"]
        for stats in dc["partitionToWriteStats"].values()
        for st in stats
        if st.get("fileId")
    )
    i4 = i3 + 1
    new_base = f"clustered-0_0-0-0_{i4}.parquet"
    _stage_parquet(
        spark.createDataFrame([(3, "C2")], "id long, v string"),
        loc / new_base,
    )
    (loc / ".hoodie" / f"{i4}.replacecommit").write_text(
        _json.dumps(
            {
                "partitionToWriteStats": {
                    "": [
                        {"fileId": "clustered-0", "path": new_base,
                         "partitionPath": ""}
                    ]
                },
                "partitionToReplaceFileIds": {"": [fid]},
            }
        )
    )
    w = hudi_table_changes(
        spark, str(loc), i4, i4, record_key_field="id"
    )
    assert sorted(
        (r.id, r.v, r._change_type) for r in w.collect()
    ) == [
        (3, "C2", "delete"),
        (3, "C2", "insert"),
    ]
    assert {r._commit_version for r in w.collect()} == {i4}


# -- archived timeline (r14) ------------------------------------------------


def test_archived_timeline_scan_stays_complete(spark, tmp_path, frames):
    """Archival moves old instants' JSON into .hoodie/archived while
    their data files stay live — a replay of the active timeline
    alone would silently drop them.  The walk decodes the archive,
    so the scanned set is identical before and after archival."""
    from glue_table_cache_spark.sources.hudi_fixture import (
        archive_hudi_commits,
    )

    a, b, a2 = frames
    base = build_hudi_table(
        tmp_path / "arch",
        [
            {"write": {"fg1": a}},
            {"write": {"fg2": b}},
            {"write": {"fg1": a2}},  # rewrite of fg1
        ],
    )
    before = set(hudi_data_files(str(base)))
    archive_hudi_commits(base, keep_last=1)
    # active dir now holds one completed instant; data set unchanged
    after = set(hudi_data_files(str(base)))
    assert after == before
    rows = {(r.id, r.v) for r in spark.read.parquet(*after).collect()}
    assert rows == {(1, "A"), (2, "B"), (3, "c")}
    # engine read parity over the archived table
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "arch", str(base),
        parameters={"spark.sql.sources.provider": "hudi"},
    )
    eng = GlueSparkEngine(spark, store)
    got = {
        (r.id, r.v)
        for r in eng.sql("SELECT id, v FROM glue.db.arch").collect()
    }
    assert got == rows


def test_archived_timeline_time_travel(spark, tmp_path, frames):
    """Time travel reaches ARCHIVED instants; an instant predating
    even the archive refuses loudly."""
    from glue_table_cache_spark.sources.hudi import hudi_scan_info
    from glue_table_cache_spark.sources.hudi_fixture import (
        archive_hudi_commits,
    )

    a, b, a2 = frames
    base = build_hudi_table(
        tmp_path / "archtt",
        [
            {"write": {"fg1": a}},
            {"write": {"fg2": b}},
            {"write": {"fg1": a2}},
        ],
    )
    archive_hudi_commits(base, keep_last=1)
    entries = hudi_scan_info(
        str(base), as_of_instant=20240101000001
    )
    names = {p.rsplit("/", 1)[1] for p, _pv in entries}
    assert names == {
        "fg1_0-0-0_20240101000000.parquet",
        "fg2_0-0-0_20240101000001.parquet",
    }
    with pytest.raises(GlueSparkError, match="predates"):
        hudi_scan_info(str(base), as_of_instant=20240101000000 - 1)


def test_archived_timeline_replacecommit(spark, tmp_path, frames):
    """A replacecommit living in the ARCHIVE still retires its file
    groups in the replay."""
    from glue_table_cache_spark.sources.hudi_fixture import (
        archive_hudi_commits,
    )

    a, b, _a2 = frames
    base = build_hudi_table(
        tmp_path / "archrc",
        [
            {"write": {"fg1": a}},
            {"write": {"fg3": b}, "replace": ["fg1"]},
            {"write": {"fg4": a}},
        ],
    )
    before = set(hudi_data_files(str(base)))
    archive_hudi_commits(base, keep_last=1)
    assert set(hudi_data_files(str(base))) == before
    assert not any("fg1_" in p for p in before)


def test_corrupt_archive_segment_refuses(spark, tmp_path, frames):
    a, b, _a2 = frames
    base = build_hudi_table(
        tmp_path / "archbad",
        [{"write": {"fg1": a}}, {"write": {"fg2": b}}],
    )
    arch = base / ".hoodie" / "archived"
    arch.mkdir()
    (arch / ".commits_.archive.1_1-0-1").write_bytes(b"not a log")
    with pytest.raises(GlueSparkError, match="could not be decoded"):
        hudi_data_files(str(base))


def test_archived_timestamp_travel_and_history(spark, tmp_path, frames):
    """TIMESTAMP AS OF resolution and DESCRIBE HISTORY both reach
    archived instants — archival relocates history, it does not
    erase it."""
    from glue_table_cache_spark.sources.hudi import (
        hudi_history,
        hudi_instant_for_wallclock,
    )
    from glue_table_cache_spark.sources.hudi_fixture import (
        archive_hudi_commits,
    )

    a, b, a2 = frames
    base = build_hudi_table(
        tmp_path / "archts",
        [
            {"write": {"fg1": a}},
            {"write": {"fg2": b}},
            {"write": {"fg1": a2}},
        ],
    )
    archive_hudi_commits(base, keep_last=1)
    # wall clock just after the SECOND (archived) instant
    import datetime as dt

    ts_ms = int(
        dt.datetime(
            2024, 1, 1, 0, 0, 1, tzinfo=dt.timezone.utc
        ).timestamp()
        * 1000
    )
    assert (
        hudi_instant_for_wallclock(str(base), ts_ms)
        == 20240101000001
    )
    hist = hudi_history(spark, str(base))
    assert [r.version for r in hist.collect()] == [
        20240101000000, 20240101000001, 20240101000002,
    ]
    assert [r.operation for r in hist.collect()] == [
        "commit", "commit", "commit",
    ]


def test_archived_change_windows_delivered(spark, tmp_path, frames):
    """File-level and row-level change feeds reach ARCHIVED instants:
    archival preserves each instant's write stats — exactly what a
    COW window diff needs — so `hudi_changes` and `table_changes`
    deliver the archived commits instead of silently skipping them;
    a mid-archive start does not widen to genesis."""
    from glue_table_cache_spark.sources.hudi import (
        hudi_changes,
        hudi_table_changes,
    )
    from glue_table_cache_spark.sources.hudi_fixture import (
        archive_hudi_commits,
    )

    a, b, a2 = frames
    base = build_hudi_table(
        tmp_path / "archcdc",
        [
            {"write": {"fg1": a}},
            {"write": {"fg2": b}},
            {"write": {"fg1": a2}},
        ],
    )
    latest0, written0 = hudi_changes(str(base), 0)
    archive_hudi_commits(base, keep_last=1)
    latest1, written1 = hudi_changes(str(base), 0)
    assert (latest1, written1) == (latest0, written0)
    # mid-archive incremental: only instants AFTER the bound
    _l, after_first = hudi_changes(str(base), 20240101000000)
    assert all("_20240101000000" not in p for p in after_first)
    assert len(after_first) == len(written0) - 1
    # row-level TVF from genesis over the archived table
    rows = hudi_table_changes(
        spark, str(base), 0
    ).collect()
    by_ver = {}
    for r in rows:
        by_ver.setdefault(r._commit_version, set()).add(
            (r.id, r.v, r._change_type)
        )
    assert by_ver[20240101000000] == {
        (1, "a", "insert"), (2, "b", "insert"),
    }
    assert by_ver[20240101000001] == {(3, "c", "insert")}
    # the active rewrite of fg1 emits delete+insert pairs
    assert (1, "A", "insert") in by_ver[20240101000002]


def test_archived_deltacommits_mor_snapshot(spark, tmp_path):
    """MOR: archiving the deltacommit that recorded a file group's
    LOG write must not lose the log from the snapshot merge — the
    archived write stats drive the same slices/logs fold."""
    from glue_table_cache_spark.sources.hudi import hudi_mor_scan_info
    from glue_table_cache_spark.sources.hudi_fixture import (
        archive_hudi_commits,
        build_hudi_table,
    )
    from glue_table_cache_spark.sources.hudi_log import (
        data_block,
        write_log_file,
    )
    import io

    base_df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    )
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": ["null", "long"]},
            {"name": "v", "type": ["null", "string"]},
        ],
    }
    blk = data_block(
        "20240101000001", schema, [{"id": 2, "v": "B"}]
    )
    base = build_hudi_table(
        tmp_path / "archmor",
        [
            {"write": {"fg1": base_df}},
            {"log": {"fg1": blk}},
            {"write": {"fg2": base_df.where("id = 1")}},
        ],
        table_type="MERGE_ON_READ",
    )
    def snapshot():
        bases, logs = hudi_mor_scan_info(str(base))
        return (
            sorted(p.rsplit("/", 1)[1] for p, _pv, _i in bases),
            sorted(p.rsplit("/", 1)[1] for p, _i, _pv in logs),
        )
    before = snapshot()
    archive_hudi_commits(base, keep_last=1)
    assert snapshot() == before
    assert any(".log." in n for n in before[1])
