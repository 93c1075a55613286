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
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """``ts`` → session-TZ timestamp, whatever parquet stored.

    Handles both generations of the driver testdata: TIMESTAMP(NANOS)
    read as nanosecond longs (via ``nanosAsLong``) and plain
    ``timestamp[us]`` read as TIMESTAMP_NTZ.  The NTZ→TIMESTAMP cast
    keeps wall-clock values (session TZ is pinned to UTC by the
    readers), and streaming watermarks require TIMESTAMP."""
    dt = df.schema[ts_col].dataType
    if isinstance(dt, LongType):
        df = df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    elif isinstance(dt, TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
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
