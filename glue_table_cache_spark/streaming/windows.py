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
            # sum in DECIMAL (exact, order-independent), then surface as
            # rounded DOUBLE — decimal-typed outputs render differently
            # across engines' pandas paths (Decimal('0.260') vs 0.26)
            F.round(
                F.sum(F.col("value").cast("decimal(18,3)")).cast("double"), 3
            ).alias("value_sum"),
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
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming form: file source → watermark → windowed agg.  Caller
    attaches the sink (tests use format("memory") + trigger
    availableNow for a bounded run).  ``max_files_per_trigger`` splits
    a bounded run into multiple micro-batches so the watermark actually
    advances between them (late-data semantics are observable)."""
    options = {}
    if max_files_per_trigger:
        options["maxFilesPerTrigger"] = str(max_files_per_trigger)
    stream = _stream_reader(spark, events_path, **options)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            # exact decimal sum → rounded DOUBLE (see batch twin)
            F.round(
                F.sum(F.col("value").cast("decimal(18,3)")).cast("double"), 3
            ).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    timeout_s: int = 120,
    output_mode: str = "complete",
) -> None:
    """Drive a bounded streaming query to completion (availableNow)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        # returning with the query still running would hand the caller
        # a partially-filled sink as if it were complete
        q.stop()
        raise TimeoutError(
            f"stream {query_name!r} did not finish in {timeout_s}s"
        )


def sliding_counts_batch(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window counts: each event lands in
    ``duration / slide`` overlapping windows (epoch-aligned, exactly
    Spark's ``F.window`` bucketing)."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window_duration, slide).alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def dedup_events_stream(
    spark: SparkSession,
    events_path: str,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once streaming dedup: ``dropDuplicatesWithinWatermark``
    keyed on ``key_cols``.  The watermark bounds the dedup state to the
    late-data horizon — the plain ``dropDuplicates`` would keep every
    key ever seen and grow state without bound on an unbounded stream.
    Batch twin: ``SELECT DISTINCT ON (key)`` / row_number = 1."""
    sdf = _stream_reader(spark, events_path)
    return sdf.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def stream_stream_join(
    spark: SparkSession,
    events_path: str,
    left_type: str = "view",
    right_type: str = "purchase",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: each ``left_type`` event
    pairs with the same user's ``right_type`` events in the trailing
    ``within`` interval (``l_ts - within <= r_ts <= l_ts``).

    Both sides carry watermarks and the join condition bounds event
    time on both sides — the two requirements that let Spark expire
    join state instead of buffering each stream forever.  Batch twin:
    the identical equi+range join on the static frame."""
    base = _stream_reader(spark, events_path)
    left = (
        base.where(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("l_id"),
            "user_id",
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", watermark)
    )
    right = (
        _stream_reader(spark, events_path)
        .where(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("r_id"),
            F.col("user_id").alias("r_user_id"),
            F.col("ts").alias("r_ts"),
            F.col("value").alias("r_value"),
        )
        .withWatermark("r_ts", watermark)
    )
    return left.join(
        right,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {within}")),
    ).select("l_id", "user_id", "l_ts", "r_id", "r_ts", "r_value")


def _stream_reader(spark: SparkSession, events_path: str, **options):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ→TIMESTAMP in normalize_event_ts interprets wall-clock in the
    # session TZ — pin it so stream and batch twins agree
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    path = Path(events_path)
    if path.is_file():
        reader = reader.option("pathGlobFilter", path.name)
        events_path = str(path.parent)
    return normalize_event_ts(reader.parquet(events_path))


def sessionize_stream(
    spark: SparkSession,
    events_path: str,
    gap_minutes: int = 30,
    max_files_per_trigger: int | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming gap-sessionization via ``applyInPandasWithState`` —
    the custom-stateful-operator twin of :func:`sessionize_batch`.

    Keeps one open session per user in state; when an incoming event's
    gap from the open session exceeds the threshold, the closed session
    is emitted (append mode) and a new one opens.

    With ``watermark`` set, the operator also registers an
    **event-time timeout** at ``session_end + gap`` per key: once the
    watermark passes it (no event could legally extend the session any
    more), the open session is emitted and its state dropped — so
    sessions flush with bounded latency AND state size stays bounded by
    the number of *live* users, the property an unbounded 100 TB/day
    stream needs.  Without a watermark the final open session per user
    stays in state (pure ``NoTimeout`` mode; a bounded comparison then
    checks emitted sessions against the batch twin's *closed*
    sessions)."""
    import pandas as pd

    gap_s = gap_minutes * 60.0
    out_schema = (
        "user_id long, n_events long, "
        "session_start timestamp, session_end timestamp"
    )
    state_schema = (
        "session_start timestamp, session_end timestamp, n_events long"
    )

    def fn(key, pdfs, state):
        if watermark is not None and state.hasTimedOut:
            # watermark passed session_end + gap: nothing can extend
            # this session — flush it and drop the key's state
            if state.exists:
                start, end, n = state.get
                state.remove()
                yield pd.DataFrame(
                    [(key[0], n, start, end)],
                    columns=[
                        "user_id", "n_events",
                        "session_start", "session_end",
                    ],
                )
            else:  # pragma: no cover - defensive
                state.remove()
            return
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        if state.exists:
            start, end, n = state.get
            start, end = pd.Timestamp(start), pd.Timestamp(end)
        else:
            start = end = None
            n = 0
        closed = []
        for ts in rows["ts"]:
            if start is None:
                start = end = ts
                n = 1
            elif (ts - end).total_seconds() > gap_s:
                closed.append((key[0], n, start, end))
                start = end = ts
                n = 1
            else:
                # a late-but-watermark-legal event (ts <= end) must
                # never move the session end BACKWARDS — that would
                # make the next on-time event look like a gap and
                # split a session the batch twin keeps whole
                end = max(end, ts)
                start = min(start, ts)
                n += 1
        state.update((start.to_pydatetime(), end.to_pydatetime(), n))
        if watermark is not None:
            state.setTimeoutTimestamp(
                int(pd.Timestamp(end).timestamp() * 1000)
                + int(gap_s * 1000)
            )
        yield pd.DataFrame(
            closed,
            columns=["user_id", "n_events", "session_start", "session_end"],
        )

    options = {}
    if max_files_per_trigger:
        options["maxFilesPerTrigger"] = str(max_files_per_trigger)
    stream = _stream_reader(spark, events_path, **options)
    if watermark is not None:
        stream = stream.withWatermark("ts", watermark)
    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        "EventTimeTimeout" if watermark is not None else "NoTimeout",
    )


def sessionize_native(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap sessionization via Spark's built-in ``session_window`` —
    the most idiomatic form: one groupBy aggregate, no window-function
    chain, and the SAME call works on a streaming frame (with a
    watermark, in which case Spark manages the merging session state).

    Session-boundary semantics match :func:`sessionize_batch` exactly,
    including at the boundary: Spark merges a session window that
    starts precisely at the previous window's end, which equals the
    lag/cumsum twin's ``> gap`` rule (pinned by the boundary test).

    Output matches :func:`sessionize_batch`'s shape minus the per-user
    session_seq (session identity is the window struct itself):
    (user_id, session_start, session_end, n_events) where session_end
    is the max event time (NOT the window's gap-padded end)."""
    return (
        events.groupBy(
            F.session_window(
                F.col(ts_col), f"{gap_minutes} minutes"
            ).alias("w"),
            F.col(user_col).alias("user_id"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select("user_id", "n_events", "session_start", "session_end")
    )


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str | None = "event_id",
) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    from the previous event exceeds ``gap_minutes``.  Classic
    lag → boundary flag → running sum chain; two shuffles (both keyed
    on user) and identical semantics in any SQL engine — the streaming
    twin is an ``applyInPandasWithState`` keyed-state op.

    ``id_col`` (skipped when ``None`` or absent) breaks timestamp ties
    deterministically."""
    order = [F.col(ts_col)]
    if id_col and id_col in events.columns:
        order.append(F.col(id_col))
    w = Window.partitionBy(user_col).orderBy(*order)
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
