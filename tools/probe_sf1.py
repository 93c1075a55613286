"""Targeted sf1 measurement for the r15 round: reproduce the probe's
curate/semantic_dedup timings in a fresh session and instrument the
partition counts at the suspected serial points.

Usage: python tools/probe_sf1.py [curate|semantic|both] [reps]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from glue_table_cache_spark.io import read_table  # noqa: E402
from glue_table_cache_spark.session import build_session  # noqa: E402


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = build_session("probe-sf1")
    sf1 = bench._ensure_sf1(spark, "/root/testdata/sf0.1")
    docs = read_table(spark, sf1, "documents")
    emb = read_table(spark, sf1, "embeddings")
    print(f"docs scan partitions: {docs.rdd.getNumPartitions()}, "
          f"files: {len(docs.inputFiles())}", flush=True)
    print(f"emb  scan partitions: {emb.rdd.getNumPartitions()}, "
          f"files: {len(emb.inputFiles())}", flush=True)

    if what in ("curate", "both"):
        for i in range(reps):
            t0 = time.time()
            n = len(bench._curate(spark, sf1).collect())
            print(f"curate sf1 run{i}: {time.time()-t0:.2f}s rows={n}",
                  flush=True)
    if what in ("semantic", "both"):
        for i in range(reps):
            t0 = time.time()
            n = len(bench._semantic_dedup_sf1(spark, sf1).collect())
            print(f"semantic sf1 run{i}: {time.time()-t0:.2f}s rows={n}",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
