"""Physical-plan quality gates: the plans the engine produces must be
the ones a 1000-executor / 100 TB deployment needs — broadcast joins
for small dimensions, filters pushed to the parquet scan, column
pruning in ReadSchema, map-side partial aggregation, whole-stage
codegen over hot expressions, AQE active."""

from __future__ import annotations

import pytest

from glue_table_cache_spark.engine import GlueSparkEngine
from glue_table_cache_spark.plans.explain import (
    codegen_stage_count,
    explain_string,
    pushed_filters,
    scan_read_schema,
    uses_broadcast_join,
    uses_partial_aggregation,
)


@pytest.fixture()
def engine(spark, store):
    return GlueSparkEngine(spark, store)


def test_small_dimension_join_broadcasts(engine):
    df = engine.sql(
        """SELECT r.r_name, count(*) AS n
           FROM glue.tpch.nation n JOIN glue.tpch.region r
             ON n.n_regionkey = r.r_regionkey
           GROUP BY r.r_name"""
    )
    assert uses_broadcast_join(df)
    assert "SortMergeJoin" not in explain_string(df, "simple")


def test_filters_reach_the_parquet_scan(engine):
    df = engine.sql(
        "SELECT l_orderkey FROM glue.tpch.lineitem "
        "WHERE l_quantity > 30 AND l_returnflag = 'R'"
    )
    pushed = pushed_filters(df)
    assert "GreaterThan(l_quantity,30" in pushed
    assert "EqualTo(l_returnflag,R)" in pushed


def test_column_pruning_in_read_schema(engine):
    """A 2-column projection must not read all 11 lineitem columns."""
    df = engine.sql(
        "SELECT l_orderkey FROM glue.tpch.lineitem WHERE l_quantity > 30"
    )
    schema = scan_read_schema(df)
    assert "l_orderkey" in schema and "l_quantity" in schema
    assert "l_extendedprice" not in schema
    assert "l_shipdate" not in schema


def test_groupby_uses_partial_aggregation(engine):
    df = engine.sql(
        """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS q
           FROM glue.tpch.lineitem GROUP BY l_returnflag"""
    )
    assert uses_partial_aggregation(df)


def test_codegen_covers_agg_pipeline(engine):
    df = engine.sql(
        """SELECT l_returnflag, count(*) AS n
           FROM glue.tpch.lineitem GROUP BY l_returnflag"""
    )
    df.collect()  # finalize the AQE plan so codegen markers materialize
    assert codegen_stage_count(df) >= 2  # map side + reduce side


def test_aqe_is_active(engine):
    df = engine.sql("SELECT count(*) AS c FROM glue.tpch.orders")
    assert "AdaptiveSparkPlan" in explain_string(df, "simple")


def test_dedup_minhash_plan_shape(spark):
    """The minhash pipeline must shuffle once for signatures (explode →
    hash-partitioned agg) and never produce a cartesian product."""
    from glue_table_cache_spark.io import read_table
    from glue_table_cache_spark.operators import dedup as D
    from tests.conftest import TESTDATA

    docs = read_table(spark, str(TESTDATA), "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold=0.8)
    plan = explain_string(pairs, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_topk_broadcasts_queries(spark):
    from pyspark.sql import functions as F

    from glue_table_cache_spark.io import read_table
    from glue_table_cache_spark.operators import similarity as S
    from tests.conftest import TESTDATA

    emb = read_table(spark, str(TESTDATA), "embeddings")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = S.cosine_topk(emb, q, k=5)
    plan = explain_string(topk, "simple")
    # the query side is explicitly broadcast: corpus never shuffles for
    # the scoring stage
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_embedding_near_pairs_no_cartesian(spark):
    """Candidate generation is a bucket equi-join — an all-pairs
    cross join would be the 100 TB scale-killer."""
    from glue_table_cache_spark.io import read_table
    from glue_table_cache_spark.operators import similarity as S
    from tests.conftest import TESTDATA

    emb = read_table(spark, str(TESTDATA), "embeddings")
    pairs = S.embedding_near_pairs(emb, threshold=0.5, planes=4)
    plan = explain_string(pairs, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_pairs_no_cartesian(spark):
    from glue_table_cache_spark.io import read_table
    from glue_table_cache_spark.operators import dedup as D
    from tests.conftest import TESTDATA

    docs = read_table(spark, str(TESTDATA), "documents")
    pairs = D.simhash_near_pairs(docs, max_hamming=3)
    plan = explain_string(pairs, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_portable_minhash_plan_shape(spark):
    """The portable (oracle-checkable) hash family must keep the same
    bucket-join shape — portability must not cost the plan."""
    from glue_table_cache_spark.io import read_table
    from glue_table_cache_spark.operators import dedup as D
    from tests.conftest import TESTDATA

    docs = read_table(spark, str(TESTDATA), "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold=0.8, portable=True)
    plan = explain_string(pairs, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_connected_components_joins_stay_keyed(spark):
    """Every CC round is a keyed equi-join + keyed aggregate; no
    cross joins, no driver-side edge materialization."""
    from glue_table_cache_spark.operators import dedup as D

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    comp = D.connected_components(pairs)
    plan = explain_string(comp, "simple")
    assert "CartesianProduct" not in plan


def test_salted_join_matches_plain_join(spark):
    """Salting rewrites the physical key but must be result-equivalent
    — including a hot key holding most of the rows."""
    from glue_table_cache_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(1 if i % 10 else i, f"l{i}") for i in range(1000)],
        "k long, lv string",
    )
    right = spark.createDataFrame(
        [(k, f"r{k}") for k in range(0, 200)], "k long, rv string"
    )
    for how in ("inner", "left"):
        plain = {
            tuple(r)
            for r in left.join(right, "k", how).select("k", "lv", "rv").collect()
        }
        salted = {
            tuple(r)
            for r in salted_join(left, right, "k", how, salt=8)
            .select("k", "lv", "rv")
            .collect()
        }
        assert salted == plain, how


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed+sorted on the join key must plan a
    sort-merge join with ZERO shuffle exchanges — the co-located
    layout for repeated fact joins at scale."""
    from pyspark.sql import functions as F

    from glue_table_cache_spark.operators.joins import (
        read_bucketed,
        write_bucketed,
    )
    from glue_table_cache_spark.plans.explain import exchange_count
    from tests.conftest import TESTDATA

    orders = spark.read.parquet(str(TESTDATA / "orders.parquet"))
    customer = spark.read.parquet(str(TESTDATA / "customer.parquet"))
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast plan so the bucket co-location is what
        # eliminates the shuffle, not a broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(
            orders.select("o_orderkey", "o_custkey", "o_totalprice"),
            "bkt_orders", "o_custkey", num_buckets=8,
        )
        write_bucketed(
            customer.select(
                F.col("c_custkey").alias("o_custkey"), "c_name"
            ),
            "bkt_customer", "o_custkey", num_buckets=8,
        )
        joined = read_bucketed(spark, "bkt_orders").join(
            read_bucketed(spark, "bkt_customer"), "o_custkey"
        )
        assert exchange_count(joined) == 0
        # sanity: same row count as the unbucketed join
        assert joined.count() == orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_customer")


def test_every_driver_entry_plan_is_cartesian_free(spark):
    """Sweep all driver-contract entries: no accidental cartesian
    product may creep into any plan.  Allowlisted: join_cross (an
    explicit CROSS JOIN over two 5-row tables), similarity_topk (its
    exact arm is the brute-force baseline — broadcast cross join BY
    DESIGN — and its IVF arm's corpus/query × k-row-centroid
    assignment is a broadcast cross join against a table bounded by
    nlist, never data × data), and dedup_semantic (same k-row centroid
    assignment shape).  Streaming entries are skipped (building them
    runs the stream)."""
    import __spark_entry__ as entrymod

    allowed_cartesian = {
        "join_cross_values",
        "similarity_topk",
        "dedup_semantic",
    }
    # entries that RUN a structured stream while being built (r5
    # merges folded the stream twins into the batch entries)
    skip = {"events_windows", "events_sessionize", "events_dedup_stream"}
    sf = "/root/testdata/sf0.001"
    for name, fn in entrymod.queries().items():
        if name in skip or name in allowed_cartesian:
            continue
        plan = explain_string(fn(spark, sf), "simple")
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_driver_window_and_oracle_coverage():
    """The driver's correctness gate checks only the FIRST 50 entries
    of queries() in iteration order: exceeding 50 silently drops
    entries out of the checked window, and every entry must carry an
    oracle so none degrade to the weaker rows-only check."""
    import __spark_entry__ as entrymod

    qs = list(entrymod.queries())
    assert len(qs) <= 50, f"{len(qs)} entries overflow the checked window"
    oracles = entrymod.oracle_sql()
    missing = [k for k in qs if k not in oracles]
    assert not missing, f"entries without oracle SQL: {missing}"


def test_curate_plan_is_cartesian_free(spark):
    """The composed curation pipeline stays nested-loop-free end to
    end (single logical plan across all stages)."""
    from pyspark.sql import functions as F

    from glue_table_cache_spark.operators import pipeline as PL

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") % 31 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    cfg = PL.CurationConfig(
        benchmark=bench, decontamination_k=3, sample_fraction=0.9,
        pack_budget=512,
    )
    plan = explain_string(PL.curate(docs, cfg), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dynamic_partition_pruning_on_hive_join(spark, tmp_path):
    """Joining a hive-partitioned table to a filtered dim on the
    partition column must plan a dynamicpruning expression in the
    scan's partition filters — at 100 TB this is the difference
    between scanning one year and scanning the table."""
    import __spark_entry__ as entrymod
    from glue_table_cache_spark.catalog import (
        LocalMetadataStore,
        PartitionKey,
    )

    base = entrymod._ensure_fixtures(spark, "/root/testdata/sf0.001")
    dim_path = tmp_path / "dim"
    spark.createDataFrame(
        [("1997", "keep"), ("1998", "drop")], "year string, tag string"
    ).write.mode("overwrite").parquet(str(dim_path))
    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "orders_part", str(base / "orders_part"),
        partition_keys=[PartitionKey("year"), PartitionKey("month")],
    )
    store.register_parquet_dir("db", "dim", str(dim_path))
    df = GlueSparkEngine(spark, store).sql(
        """SELECT o.year, count(*) AS n
           FROM glue.db.orders_part o JOIN glue.db.dim d
             ON o.year = d.year
           WHERE d.tag = 'keep' GROUP BY o.year"""
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # partition type inference may surface year as int or string
    assert [str(r.year) for r in df.collect()] == ["1997"]
