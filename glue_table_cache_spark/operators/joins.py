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
