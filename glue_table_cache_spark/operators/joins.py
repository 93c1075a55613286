"""Join strategies for scale: skew salting and bucketed co-location.

Beyond-reference extension — the reference delegates all join execution
to its embedded engine and has no distributed-join concerns.  On a
1000-executor cluster the two failure modes Catalyst does not fully
solve by itself are:

* **skewed keys** — one reducer receives a hot key's entire partition.
  AQE's skew-join handles sort-merge skew after the fact; explicit
  *salting* handles it structurally, including for aggregations over
  the join output.  :func:`salted_join` rewrites an equi-join so the
  hot side's rows scatter across ``salt`` sub-keys and the other side
  replicates per sub-key.
* **repeated shuffles of a big fact table** — co-locating both sides by
  pre-bucketing eliminates the shuffle entirely.  :func:`write_bucketed`
  + :func:`read_bucketed` wrap Spark's native bucketed tables
  (``bucketBy`` + ``sortBy``) so a fact↔fact join plans with **zero
  Exchange** on either side (asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the left side's keys salted across ``salt``
    sub-keys and the right side replicated once per sub-key.

    Result-equivalent to ``left.join(right, on, how)`` for ``inner``
    and ``left`` joins (each left row joins the full right partition
    for its key exactly once, whatever its salt).  Use when the LEFT
    side is the skewed one (hot keys); the right side's replication
    cost is ``salt ×`` its size *per hot key's partition*, so keep the
    right side the smaller input.

    The salt value is derived from ``rand`` — correctness does not
    depend on which sub-key a row lands on (the right side carries all
    of them), so task retries re-drawing salts are safe."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=11) * salt).cast("int")
    )
    salted_right = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1))),
    )
    return (
        salted_left.join(salted_right, [*keys, "__salt"], how)
        .drop("__salt")
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: str | list[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a Spark bucketed (and optionally sorted) table:
    both the hash-partitioning and per-bucket sort order are recorded in
    the catalog, so future equi-joins and aggregations on the bucket
    columns skip their Exchange (and with ``sort`` their Sort).  This is
    the co-located-join layout for fact tables joined repeatedly on the
    same key at 100 TB."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, cols[0], *cols[1:])
    )
    if sort:
        writer = writer.sortBy(cols[0], *cols[1:])
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (a plain
    ``spark.read.parquet`` of the files would lose it)."""
    return spark.table(table_name)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach the most recent right row
    with ``right.on <= left.on`` (inclusive) within the same ``by``
    keys — the time-series primitive Spark lacks natively (DuckDB:
    ``ASOF JOIN``; pandas: ``merge_asof``).

    Spark-first shape: tag + union both sides, then one
    ``last(value, ignorenulls=True)`` running window per key — a single
    shuffle keyed on ``by``, no range/theta join (whose
    BroadcastNestedLoop plan explodes at scale).  Left rows with no
    prior right row keep NULL values (left-join semantics).  At equal
    timestamps the right row sorts first, so it is visible to left rows
    at the same instant (DuckDB ``ASOF JOIN``'s inclusive ``>=``).

    ``direction="forward"`` flips the match to the nearest right row at
    or after the left row.

    Skew note: one reducer sees each ``by`` key's full merged history.
    For a hot key, add a coarse time-bucket column to ``by`` on both
    sides (as-of matches then stay within a bucket; carry the previous
    bucket's closing value forward with a second pass) — same
    bucketing idea as :func:`range_join`."""
    from pyspark.sql.window import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    by_cols = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in by_cols and c != on
        ]
    # a value column shadowing a left column would silently overwrite
    # the left data AND duplicate the output name — suffix it instead
    # (pandas merge_asof posture)
    out_names = {
        c: f"{c}_right" if c in left.columns else c for c in value_cols
    }
    clash = [n for n in out_names.values() if n in left.columns]
    if clash:
        raise ValueError(
            f"asof_join output name collision even after _right suffix: "
            f"{clash}; alias the columns explicitly"
        )
    l_tag = left.withColumn("__src", F.lit(1))
    r_tag = right.select(
        *by_cols,
        on,
        F.lit(0).alias("__src"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(order, F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned.withColumns(
        {
            out_names[c]: F.last(f"__v_{c}", ignorenulls=True).over(w)
            for c in value_cols
        }
    )
    return out.where(F.col("__src") == 1).select(
        *left.columns, *[out_names[c] for c in value_cols]
    )


_DURATION_UNITS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


def _duration_seconds(spec: str) -> int:
    """``"30 minutes"`` → 1800 (second resolution is enough for
    bucketing: the exact containment predicate filters afterwards)."""
    n, _, unit = spec.strip().partition(" ")
    try:
        return int(n) * _DURATION_UNITS[unit.strip().lower()]
    except (ValueError, KeyError):
        raise ValueError(f"cannot parse duration {spec!r}") from None


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str = "ts",
    right_start: str = "start",
    right_end: str = "end",
    by: str | list[str] | None = None,
    bucket: str = "1 hour",
    max_buckets_per_interval: int = 1024,
    on_null_bounds: str = "drop",
) -> DataFrame:
    """Interval join — left rows matched to right intervals containing
    them (``start <= ts < end``) — via *bucketing*, not a theta join.

    Both sides map to coarse time buckets (the right side explodes to
    every bucket its interval overlaps), the join is a plain equi-join
    on (keys, bucket), and the exact containment predicate filters the
    bucket-level candidates.  Cost is ∝ candidates per bucket instead
    of |left|×|right| — the shape a 100 TB interval join needs; pick
    ``bucket`` near the typical interval length.

    ``max_buckets_per_interval`` guards the explode: one malformed
    year-long interval at a 1-hour bucket would fan out ~10⁴ rows and
    every such interval lands in every bucket's candidate set.  An
    interval overlapping more buckets than the cap raises at execution
    time — widen ``bucket`` (or raise the cap) deliberately instead.

    An interval with a NULL start or end can contain no timestamp;
    ``on_null_bounds`` picks the posture: ``"drop"`` (default) drops
    such right rows before the explode, ``"error"`` raises with a
    message naming the problem (instead of the cap-exceeded message a
    NULL would otherwise confusingly hit)."""
    if on_null_bounds not in ("drop", "error"):
        raise ValueError(
            f"on_null_bounds must be 'drop' or 'error', "
            f"got {on_null_bounds!r}"
        )
    by_cols = ([by] if isinstance(by, str) else list(by)) if by else []
    step = _duration_seconds(bucket)
    lb = left.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(left_ts)) / step)
    )
    b_start = F.floor(F.unix_timestamp(F.col(right_start)) / step)
    b_end = F.floor(F.unix_timestamp(F.col(right_end)) / step)
    n_buckets = b_end - b_start + 1
    null_bounds = F.col(right_start).isNull() | F.col(right_end).isNull()
    null_arm = (
        # explode(NULL) yields zero rows — the documented drop
        F.lit(None).cast("array<bigint>")
        if on_null_bounds == "drop"
        else F.raise_error(
            F.lit(
                "range_join: NULL interval bound in "
                f"{right_start!r}/{right_end!r} "
                "(on_null_bounds='error'; pass 'drop' to skip such rows)"
            )
        )
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.when(null_bounds, null_arm)
            .when(
                n_buckets <= F.lit(max_buckets_per_interval),
                F.sequence(b_start, b_end),
            ).otherwise(
                F.raise_error(
                    F.format_string(
                        "range_join: interval spans %s buckets of "
                        + f"'{bucket}' (cap {max_buckets_per_interval}); "
                        + "widen `bucket` or raise "
                        + "`max_buckets_per_interval`",
                        n_buckets,
                    )
                )
            ),
        ),
    )
    joined = lb.join(rb, by_cols + ["__bucket"])
    containment = (F.col(right_start) <= F.col(left_ts)) & (
        F.col(left_ts) < F.col(right_end)
    )
    if on_null_bounds == "error":
        # A bare containment filter lets Catalyst infer
        # isnotnull(start/end) and push it below the explode, which
        # would silently drop the NULL rows the raise arm exists to
        # report.  coalesce(pred, false) keeps the same filter
        # semantics without implying the bounds are non-null.
        containment = F.coalesce(containment, F.lit(False))
    return joined.where(containment).drop("__bucket")
