"""Small-file compaction: rewrite a parquet dataset into ~target-size files.

Beyond-reference maintenance operator.  Streaming ingestion and
fine-grained partitioning leave datasets as thousands of tiny parquet
files; every downstream scan then pays per-file open/footer cost and
the driver pays listing cost.  Compaction is one repartition-and-write
sized from the dataset's actual bytes.

Sizing uses the Hadoop FileSystem API over ``df.inputFiles()`` so it
works for any scheme Spark can read (file://, s3a://, …) — a
driver-side loop, but over file *metadata* only, same scale posture as
the engine's listing cache.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


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


def compact_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 256,
) -> int:
    """Rewrite ``src`` into ``dst`` as ``ceil(bytes / target)`` files
    (minimum one).  Returns the number of output partitions.  ``dst``
    must differ from ``src`` — write-then-swap is the caller's move,
    never an in-place overwrite of a dataset being read."""
    if src == dst:
        raise ValueError("compact to a new location, then swap")
    n = max(
        1,
        math.ceil(dataset_bytes(spark, src) / (target_file_mb * 1024 * 1024)),
    )
    spark.read.parquet(src).repartition(n).write.mode("overwrite").parquet(dst)
    return n
