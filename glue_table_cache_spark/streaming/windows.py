"""Structured Streaming operators over the `events` stream shape.

Beyond-reference extension (the reference has no streaming semantics —
SURVEY.md §2.B last row; its only "streaming" is client-side result
batching).  Each operator has a *batch-equivalent* twin with identical
semantics so results are oracle-checkable: the streaming form is tested
against the batch form on the same data (exactly-once + watermark
completeness at `availableNow`).

* tumbling window counts (`F.window` + watermark)
* gap-based sessionization (streaming would use
  ``applyInPandasWithState``; the batch twin is a lag/cumsum window
  chain — pure SQL, runs identically in the DuckDB oracle)
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from glue_table_cache_spark.io import normalize_event_ts


def tumbling_counts_batch(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Per (window_start, event_type) counts + value sum — batch twin of
    the streaming aggregation, same `F.window` bucketing."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,3)")), 3)
            .cast("decimal(18,3)")
            .alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def tumbling_counts_stream(
    spark: SparkSession,
    events_path: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming form: file source → watermark → windowed agg.  Caller
    attaches the sink (tests use format("memory") + trigger
    availableNow for a bounded run)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema)
    path = Path(events_path)
    if path.is_file():
        # the streaming file source only accepts directories
        reader = reader.option("pathGlobFilter", path.name)
        events_path = str(path.parent)
    stream = normalize_event_ts(reader.parquet(events_path), ts_col)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,3)")), 3)
            .cast("decimal(18,3)")
            .alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, timeout_s: int = 120
) -> None:
    """Drive a bounded streaming query to completion (availableNow)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    from the previous event exceeds ``gap_minutes``.  Classic
    lag → boundary flag → running sum chain; two shuffles (both keyed
    on user) and identical semantics in any SQL engine — the streaming
    twin is an ``applyInPandasWithState`` keyed-state op."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id"))
    # integer microseconds: unix_timestamp() truncates to whole seconds,
    # which would misclassify gaps within one second of the boundary
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lag(ts_col).over(w)
    )
    flagged = events.withColumn(
        "new_session",
        F.when(
            gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1
        ).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "session_seq", F.sum("new_session").over(w)
    )
    return (
        sessioned.groupBy(
            F.col(user_col).alias("user_id"), F.col("session_seq")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )
