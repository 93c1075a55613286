"""Readers for the driver testdata tables.

One wrinkle: ``events.parquet`` stores ``ts`` as parquet
``TIMESTAMP(NANOS)``, which Spark's parquet reader rejects outright
(``PARQUET_TYPE_ILLEGAL``).  The supported escape hatch is
``spark.sql.legacy.parquet.nanosAsLong`` (runtime-settable), which
surfaces the column as a nanosecond ``long``; we convert it back to a
proper timestamp at microsecond precision — the same truncation DuckDB
applies when it reads the file, so oracle comparisons line up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """nanosecond-long ``ts`` → timestamp (floor to micros)."""
    if isinstance(df.schema[ts_col].dataType, LongType):
        df = df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table by name from ``sf_dir``."""
    # pin the session TZ so timestamp-derived results (year(), window
    # buckets) are stable regardless of how the caller built the session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(spark.read.parquet(path))
    return spark.read.parquet(path)
