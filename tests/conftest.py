from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from glue_table_cache_spark.catalog import LocalMetadataStore, PartitionKey  # noqa: E402
from glue_table_cache_spark.session import build_session  # noqa: E402

TESTDATA = Path(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001"))
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="gtc-spark-tests",
        shuffle_partitions=8,
        # tests build hundreds of tiny createDataFrame frames; each
        # becomes a Python `parallelize` RDD with defaultParallelism
        # slices, and every action on it pays one Python-worker
        # round-trip per slice (32 on this host).  4 slices keeps the
        # suite's fixed per-action overhead ~8x lower without touching
        # any DataFrame-level parallelism (joins/aggregates use
        # spark.sql.shuffle.partitions).  Test-session-only knob.
        extra_conf={"spark.default.parallelism": "4"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def store():
    """Metadata store exposing every driver testdata table as
    ``tpch.<name>`` (unpartitioned single parquet files)."""
    s = LocalMetadataStore()
    for name in TABLES:
        p = TESTDATA / f"{name}.parquet"
        if p.exists():
            s.register_parquet_dir("tpch", name, str(p))
    return s


@pytest.fixture(scope="session")
def hive_orders_dir(spark, tmp_path_factory):
    """orders rewritten as a hive-partitioned directory
    (year=YYYY/month=MM) — the reference's flights-table shape
    (FIXTURES.md F1/F2)."""
    out = tmp_path_factory.mktemp("hive") / "orders_part"
    df = spark.read.parquet(str(TESTDATA / "orders.parquet"))
    (
        df.withColumn("year", F.date_format("o_orderdate", "yyyy"))
        .withColumn("month", F.date_format("o_orderdate", "MM"))
        .write.partitionBy("year", "month")
        .mode("overwrite")
        .parquet(str(out))
    )
    return out


@pytest.fixture()
def hive_store(store, hive_orders_dir):
    store.register_parquet_dir(
        "tpch",
        "orders_part",
        str(hive_orders_dir),
        partition_keys=[PartitionKey("year"), PartitionKey("month")],
    )
    return store
