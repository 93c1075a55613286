"""Run individual bench labels repeatedly for A/B measurement.

Usage:
    python tools/bench_one.py label1 label2 ... [--runs N] [--explain]

Reuses bench.py's BENCH_QUERIES registry (same fixtures, same query
shapes, same warm-up posture) but times ONLY the named labels, printing
every run so interleaved A/B comparisons on a noisy host are readable.
``--explain`` additionally writes ``.explain('formatted')`` output to
``plans/r14/<label>_current.txt``.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402
import bench  # noqa: E402
from glue_table_cache_spark.io import read_table  # noqa: E402
from glue_table_cache_spark.session import build_session  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=")[1])
    explain = "--explain" in sys.argv

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="gtc-bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    qs["filter_predicates"](spark, sf_dir).collect()
    for t in ("documents", "embeddings", "events"):
        read_table(spark, sf_dir, t).count()
    registry = dict(bench.BENCH_QUERIES)
    need_fixtures = any(
        lbl in ("lakehouse_scan",) or lbl.startswith(("dml_", "log_replay"))
        for lbl in args
    )
    if need_fixtures or any(lbl in registry and lbl not in (
        "flagship_cte", "lineitem_agg", "join_customer_orders",
        "window_running", "tpch_q09", "tpch_q21",
    ) and not lbl.startswith(("dedup", "cosine", "ann", "semantic",
                              "lm_", "events", "decon", "sample",
                              "pack", "join_asof", "line_", "curate",
                              "meta_", "hive_")) for lbl in args):
        entrymod._ensure_fixtures(spark, sf_dir)
    if any(lbl.startswith("dml_") for lbl in args):
        entrymod._ensure_fixtures(spark, sf_dir)
        bench._ensure_dml(spark, sf_dir)
    if any(lbl == "log_replay" for lbl in args):
        bench._ensure_manylog(spark)
    if any(lbl.startswith("meta_") for lbl in args):
        bench._ensure_meta_walk(spark)
    if any(lbl.startswith("hive_") for lbl in args):
        bench._ensure_hive_list()
    if any(lbl == "lakehouse_scan" for lbl in args):
        entrymod._ensure_fixtures(spark, sf_dir)

    for label in args:
        fn = registry[label]
        if explain:
            df = fn(spark, sf_dir)
            out = Path(__file__).resolve().parents[1] / "plans" / "r14"
            out.mkdir(parents=True, exist_ok=True)
            (out / f"{label}_current.txt").write_text(
                df._sc is not None and df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
            )
        times = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{label} run{i}")
            t0 = time.time()
            c0 = time.process_time()
            n = len(fn(spark, sf_dir).collect())
            dt = time.time() - t0
            dc = time.process_time() - c0
            times.append(dt)
            print(f"{label} run{i}: {dt:.3f}s cpu={dc:.3f}s rows={n}",
                  flush=True)
        print(f"{label} BEST {min(times):.3f}s of {sorted(round(t,3) for t in times)}",
              flush=True)


if __name__ == "__main__":
    main()
