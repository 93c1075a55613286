"""Benchmark decontamination: n-gram overlap against a held-out set.

Beyond-reference extension.  Before training, every corpus is screened
for documents that contain evaluation data (the "13-gram overlap"
check of the GPT-3/PaLM reports).  The scalable shape is an
inverted-index join, not a pairwise scan:

* shingle both sides into word ``k``-grams (distinct per doc — the
  same :func:`~glue_table_cache_spark.functions.text.shingles` the
  dedup family uses);
* explode the *benchmark* side into a posting list and broadcast it
  (benchmark suites are tiny next to a 100 TB corpus), so the corpus
  is scored map-side with no shuffle for the join;
* one ``groupBy (doc_id, bench_id)`` shuffle counts the overlap;
* ``containment = |common| / |bench shingles|`` — the fraction of the
  benchmark item reproduced in the document (asymmetric on purpose:
  a long web page quoting a whole benchmark question is contaminated
  even though its Jaccard vs the question is low).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from glue_table_cache_spark.functions.text import shingles
from glue_table_cache_spark.operators.dedup import _widen


def contamination_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    shingle_k: int = 8,
    threshold: float = 0.5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(doc_id, bench_id, overlap, containment) for every corpus
    document covering ≥ ``threshold`` of a benchmark item's shingles.

    ``broadcast_benchmark=False`` falls back to a shuffle join for the
    rare huge-benchmark case."""
    # widen few-file inputs first: the shingle regex is the hot loop
    # and must run on every core, not one partition per input file.
    # explode_outer (not explode) everywhere below: a plain explode
    # makes Catalyst infer `size(shingles(...)) > 0` and push it below
    # the widening exchange, re-running the whole shingle expression
    # on the narrow side; shingles() is never empty, so outer is
    # identical given the cheap isNotNull scan filter.
    corpus = _widen(docs.where(F.col(text_col).isNotNull())).select(
        F.col(id_col).alias("doc_id"),
        shingles(text_col, shingle_k).alias("sh"),
    )
    # one pass over the benchmark: each posting row carries its item's
    # shingle count, so no second sizes branch / join is needed
    bpost = _widen(
        benchmark.where(F.col(bench_text_col).isNotNull())
    ).select(
        F.col(bench_id_col).alias("bench_id"),
        shingles(bench_text_col, shingle_k).alias("sh"),
    ).select(
        "bench_id",
        F.size("sh").alias("n_bench"),
        F.explode_outer("sh").alias("shingle"),
    ).where(F.col("shingle") != "")
    if broadcast_benchmark:
        bpost = F.broadcast(bpost)
    post = corpus.select(
        "doc_id", F.explode_outer("sh").alias("shingle")
    ).where(F.col("shingle") != "")  # zero-token docs have no content
    return (
        post.join(bpost, "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(
            F.count("*").alias("overlap"),
            F.min("n_bench").alias("n_bench"),
        )
        .select(
            "doc_id",
            "bench_id",
            "overlap",
            F.round(
                F.col("overlap").cast("double") / F.col("n_bench"), 6
            ).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Drop every document that covers ≥ threshold of any benchmark
    item (anti-join on the contaminated id set)."""
    pairs = contamination_pairs(docs, benchmark, id_col=id_col, **kwargs)
    bad = pairs.select(F.col("doc_id").alias(id_col)).distinct()
    return docs.join(bad, id_col, "left_anti")
