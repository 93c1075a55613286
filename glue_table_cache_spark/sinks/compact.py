"""Small-file compaction and Z-order clustering rewrites.

Beyond-reference maintenance operators.  Streaming ingestion and
fine-grained partitioning leave datasets as thousands of tiny parquet
files; every downstream scan then pays per-file open/footer cost and
the driver pays listing cost.  Compaction is one repartition-and-write
sized from the dataset's actual bytes.

``zorder_by`` upgrades the rewrite to multi-dimensional clustering
(the OPTIMIZE ZORDER of lakehouse engines, built from public
Z-/Morton-curve math): each clustering column maps to an equi-depth
bucket id (approxQuantile boundaries, so skew cannot pile the curve
into one bucket), the per-column bucket bits are interleaved into one
Morton key, and the rewrite range-partitions + sorts by that key.
Every output file then covers a narrow range of EVERY clustering
column — which is exactly what makes the zone-map skipping layer
(:mod:`glue_table_cache_spark.skipping`) and parquet row-group
pruning effective for predicates on ANY of the columns, not just the
leading sort key of a linear sort.

Sizing uses the Hadoop FileSystem API over ``df.inputFiles()`` so it
works for any scheme Spark can read (file://, s3a://, …) — a
driver-side loop, but over file *metadata* only, same scale posture as
the engine's listing cache.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def dataset_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk bytes of the dataset's data files."""
    df = spark.read.parquet(path)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(conf)
        total += fs.getFileStatus(p).getLen()
    return total


def _as_double(df: DataFrame, col: str) -> Column:
    """Clustering column → orderable DOUBLE (numerics cast; dates /
    timestamps via their epoch representation).  Unsupported types
    raise — silently hashing a string would cluster nothing."""
    from pyspark.sql import types as T

    dt = df.schema[col].dataType
    if isinstance(dt, T.NumericType):
        return F.col(col).cast("double")
    if isinstance(dt, T.DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    if isinstance(dt, T.TimestampType):
        return F.unix_timestamp(F.col(col)).cast("double")
    raise ValueError(
        f"zorder_by column {col!r} has unsupported type {dt}; cast it "
        "to a numeric/date/timestamp column first"
    )


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits_per_col: int = 8,
    rel_error: float = 0.01,
) -> Column:
    """Morton (Z-curve) key over ``cols``: each column is mapped to an
    equi-depth bucket in ``[0, 2^bits_per_col)`` via approxQuantile
    boundaries (one driver-side pass; skewed distributions still
    spread across buckets), then the bucket bits are interleaved.
    ``len(cols) * bits_per_col`` must fit a signed 64-bit key.

    The bucket lookup is a counted comparison against a broadcast
    literal boundary array (O(2^bits) per row, JVM-side, inside
    whole-stage codegen) — no UDF, no shuffle; the only distributed
    cost of a Z-order rewrite is the range partition + sort the caller
    was already paying for a linear sort.  NULLs order first
    (bucket 0)."""
    m = len(cols)
    if m == 0:
        raise ValueError("zorder_by needs at least one column")
    if m * bits_per_col > 63:
        raise ValueError(
            f"{m} cols x {bits_per_col} bits = {m * bits_per_col} "
            "bits does not fit a signed 64-bit key"
        )
    n_buckets = 1 << bits_per_col
    quantiles = [i / n_buckets for i in range(1, n_buckets)]
    bucket_cols = []
    for c in cols:
        dbl = _as_double(df, c)
        probe = df.select(dbl.alias("__z"))
        bounds = sorted(
            set(probe.approxQuantile("__z", quantiles, rel_error))
        )
        arr = F.lit(bounds) if bounds else F.array().cast("array<double>")
        bucket = F.size(F.filter(arr, lambda b: b < dbl))
        bucket_cols.append(
            F.when(dbl.isNull(), F.lit(0)).otherwise(bucket)
        )
    key = F.lit(0).cast("long")
    for j in range(bits_per_col):
        for i, bucket in enumerate(bucket_cols):
            key = key + (
                F.shiftright(bucket.cast("long"), j)
                .bitwiseAND(F.lit(1).cast("long"))
                * F.lit(1 << (j * m + i)).cast("long")
            )
    return key


def compact_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 256,
    zorder_by: list[str] | None = None,
    bits_per_col: int = 8,
    n_files: int | None = None,
) -> int:
    """Rewrite ``src`` into ``dst`` as ``ceil(bytes / target)`` files
    (minimum one; ``n_files`` overrides the byte-based sizing).
    Returns the number of output partitions.  ``dst`` must differ from
    ``src`` — write-then-swap is the caller's move, never an in-place
    overwrite of a dataset being read.

    With ``zorder_by``, output files are range-partitioned and sorted
    by the Morton key (:func:`zorder_key`), so every file covers a
    narrow slice of each clustering column and zone-map / row-group
    skipping prunes on any of them."""
    if src == dst:
        raise ValueError("compact to a new location, then swap")
    df = spark.read.parquet(src)
    n = n_files or max(
        1,
        math.ceil(dataset_bytes(spark, src) / (target_file_mb * 1024 * 1024)),
    )
    if zorder_by:
        key = zorder_key(df, zorder_by, bits_per_col=bits_per_col)
        out = (
            df.withColumn("__zkey", key)
            .repartitionByRange(n, "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
        )
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst)
    return n
