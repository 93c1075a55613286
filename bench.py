"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": X}

The headline set spans the engine's main cost centers: the flagship CTE
(reference integration shape), a full lineitem aggregation, a
customer×orders join, a window function, exact + MinHash-LSH dedup,
cosine top-k, and the tumbling event window.  All queries reuse the
driver-contract callables so bench and correctness measure the same
plans.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from glue_table_cache_spark.session import build_session  # noqa: E402

BENCH_QUERIES = [
    ("flagship_cte", "cte_flagship"),
    ("lineitem_agg", "agg_pricing_summary"),
    ("join_customer_orders", "join_left"),
    ("window_running", "window_running"),
    ("dedup_exact", "dedup_exact"),
    ("dedup_minhash", "dedup_minhash_pairs"),
    ("cosine_topk", "similarity_cosine_topk"),
    ("events_window", "events_tumbling_window"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = Path(sf_dir).name
    try:
        sf = float(sf_name.removeprefix("sf"))
    except ValueError:
        sf = 0.0

    spark = build_session(app_name="gtc-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm-up: JVM/codegen + engine fixture/cache setup stay out of the
    # per-query timings (the driver compares steady-state throughput)
    qs["scan_base"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    total = 0.0
    for label, name in BENCH_QUERIES:
        t0 = time.time()
        n = len(qs[name](spark, sf_dir).collect())
        dt = round(time.time() - t0, 3)
        timings[label] = dt
        total += dt
        print(f"# {label}: {dt}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
