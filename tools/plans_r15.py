"""Write .explain('formatted') for the r15-touched bench labels.

Usage: python tools/plans_r15.py <suffix> [outdir]
Run from the tree whose plans you want (repo HEAD → suffix 'after';
the r14 worktree → suffix 'before', outdir /root/repo/plans/r15).
"""
from __future__ import annotations

import sys
from pathlib import Path

HERE = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(HERE))

import bench  # noqa: E402
from glue_table_cache_spark.io import read_table  # noqa: E402
from glue_table_cache_spark.session import build_session  # noqa: E402

LABELS = (
    "curate",
    "semantic_dedup",
    "lm_perplexity",
    "cosine_topk",
    "ann_lsh",
)


def main() -> None:
    suffix = sys.argv[1]
    outdir = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/plans/r15")
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = "/root/testdata/sf0.1"
    spark = build_session(app_name=f"plans-r15-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("documents", "embeddings", "events"):
        read_table(spark, sf_dir, t).count()
    reg = dict(bench.BENCH_QUERIES)
    for label in LABELS:
        df = reg[label](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        p = outdir / f"{label}_{suffix}.txt"
        p.write_text(txt)
        n_ex = txt.count("Exchange")
        print(f"{label}_{suffix}: {len(txt)} bytes, Exchange mentions={n_ex}")
    spark.stop()


if __name__ == "__main__":
    main()
