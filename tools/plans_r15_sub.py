"""Supplementary r15 plans: the PRE-checkpoint subtrees of curate and
semantic_dedup (their final explain starts at the checkpointed RDD, so
the widen/barrier changes are invisible there — these captures show
the annotate/assign stages where the r15 fix lives).

Usage: python tools/plans_r15_sub.py <suffix> [outdir]
"""
from __future__ import annotations

import sys
from pathlib import Path

HERE = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(HERE))

from glue_table_cache_spark.io import read_table  # noqa: E402
from glue_table_cache_spark.session import build_session  # noqa: E402


def explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix = sys.argv[1]
    outdir = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/plans/r15")
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = "/root/testdata/sf0.1"
    spark = build_session(app_name=f"plans-r15-sub-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from glue_table_cache_spark.functions import text as T
    from glue_table_cache_spark.operators import dedup as D
    from glue_table_cache_spark.operators import similarity as S

    docs = read_table(spark, sf_dir, "documents")
    # curate's pre-checkpoint annotate stage, exactly as curate builds
    # it (r15 widens + barriers first; r14 annotates the raw scan)
    d = docs
    wide = D._widen(d)
    if wide is not d and suffix == "after":
        d = wide.localCheckpoint(eager=False)
    annotated = (
        d.withColumn("quality", T.quality_score(F.col("text")))
        .withColumn("lang_pred", T.language_id(F.col("text")))
        .where(F.col("quality") >= 0.3)
    )
    (outdir / f"curate_annotate_{suffix}.txt").write_text(
        explain(annotated)
    )

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    cents = S.ivf_train(emb, nlist=16, iters=2)
    assigned = S.assign_embedding_clusters(emb, cents)
    (outdir / f"semantic_assign_{suffix}.txt").write_text(
        explain(assigned)
    )
    for name in (f"curate_annotate_{suffix}", f"semantic_assign_{suffix}"):
        txt = (outdir / f"{name}.txt").read_text()
        print(f"{name}: Exchange mentions={txt.count('Exchange')}, "
              f"scan={'ExistingRDD' if 'ExistingRDD' in txt else 'parquet'}")
    spark.stop()


if __name__ == "__main__":
    main()
