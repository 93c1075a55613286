"""Training-shard sink: deterministic sharded parquet output + manifest.

Beyond-reference extension.  A curation pipeline's terminal stage
writes the corpus as a fixed set of shards a training loader can map
over.  Requirements at 100 TB:

* **Deterministic placement** — shard = ``xxhash64(key) mod n``, a
  pure function of the row key, so re-runs and retries place every
  row identically (same posture as ``operators/sampling.py``).
* **One shuffle** — ``repartition(n, shard)`` aligns output files
  with shard numbers; each task writes its own shard directory
  (``shard=<k>/``), so there is no driver-side fan-in.
* **Bounded files** — ``maxRecordsPerFile`` splits oversized shards
  into multiple parquet parts without another shuffle.
* **Manifest** — a small DataFrame (rows/bytes-ish stats per shard)
  computed from the written data, the loader's unit of bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def assign_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Add a ``shard`` column: ``xxhash64(key) mod n_shards`` — stable
    across runs, executors, and retries."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    return df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    )


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``path/shard=<k>/part-*.parquet``.

    The ``repartition(n, shard)`` clusters each shard's rows into few
    tasks (hash collisions can co-locate two shards in one task — that
    yields one file per shard either way, never a tiny-file explosion
    from every task holding every shard); ``partitionBy`` makes the
    layout self-describing for any parquet reader."""
    sharded = assign_shards(df, n_shards, key_col).repartition(
        n_shards, F.col("shard")
    )
    writer = sharded.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy("shard").parquet(path)


def shard_manifest(
    spark: SparkSession,
    path: str,
    token_col: str | None = None,
) -> DataFrame:
    """Read back ``path`` and summarize per shard: row count and, when
    ``token_col`` is given, total tokens — the loader's sizing info."""
    df = spark.read.parquet(path)
    aggs = [F.count("*").alias("n_rows")]
    if token_col is not None:
        aggs.append(F.sum(token_col).alias("total_tokens"))
    return df.groupBy("shard").agg(*aggs)
