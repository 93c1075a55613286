"""Runnable end-to-end demo: curate a document corpus into training shards.

    python examples/curate_corpus.py [sf_dir] [out_dir]

Flow (all one Spark logical plan until the terminal write):
quality/language screen → benchmark decontamination → MinHash near-dup
removal (transitive) → deterministic 90% sample → sequence packing →
deterministic sharded parquet + manifest.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from glue_table_cache_spark.io import read_table
from glue_table_cache_spark.operators import pipeline as PL
from glue_table_cache_spark.session import build_session
from glue_table_cache_spark.sinks import shards as SH


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_shards"

    spark = build_session(app_name="curate-corpus")
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_table(spark, sf_dir, "documents")
    benchmark = docs.where(F.col("doc_id") % 31 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )

    cfg = PL.CurationConfig(
        min_quality=0.3,
        benchmark=benchmark,
        decontamination_k=3,
        decontamination_threshold=0.9,
        dedup_threshold=0.8,
        dedup_transitive=True,
        sample_fraction=0.9,
        sample_salt="train",
        pack_budget=512,
    )
    curated = PL.curate(docs, cfg)
    SH.write_shards(curated, out, n_shards=8, max_records_per_file=100_000)

    manifest = SH.shard_manifest(spark, out, token_col="n_tokens")
    n_in, n_kept = docs.count(), spark.read.parquet(out).count()
    print(f"curated {n_in} -> {n_kept} docs into {out}")
    manifest.orderBy("shard").show()


if __name__ == "__main__":
    main()
