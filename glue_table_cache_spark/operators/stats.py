"""Corpus-level statistics for training-data curation.

Beyond-reference extension.  Before mixing/filtering a 100 TB corpus
you need its shape: token mass per domain, vocabulary head, document
length distribution.  Everything here is a small number of aggregates
over one scan — no joins, no per-row Python:

* :func:`corpus_stats` — one row per stratum (or one row total):
  doc/token/char mass, approximate distinct tokens, quality quantiles.
* :func:`vocab_top_tokens` — the frequency head of the vocabulary
  (explode → partial-agg count → TakeOrdered top-k; the full count
  never sorts).
* :func:`length_histogram` — doc-count histogram over log-spaced token
  buckets (map-only bucket assignment + one groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from glue_table_cache_spark.functions.text import (
    quality_score,
    token_count,
    tokens,
)


def corpus_stats(
    df: DataFrame,
    text_col: str = "text",
    strata_col: str | None = "source",
) -> DataFrame:
    """Per-stratum corpus summary in ONE aggregation pass over the
    docs plus one over the exploded tokens (for the distinct-token
    sketch).  ``strata_col=None`` gives a single global row.

    ``approx_distinct_tokens`` is a HyperLogLog++ sketch
    (``approx_count_distinct``, default 5% relative error) — the exact
    count would shuffle every distinct token; the sketch is a constant
    few KB per stratum.  Quality quantiles use the same
    ``approx_percentile`` machinery as
    :func:`~glue_table_cache_spark.operators.sampling.quantile_filter`.
    """
    keys = [strata_col] if strata_col else []
    t = F.col(text_col)
    doc_level = (
        df.withColumn("__nt", token_count(t).cast("long"))
        .withColumn("__q", quality_score(t))
        .groupBy(*keys)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__nt").alias("total_tokens"),
            F.sum(F.length(t).cast("long")).alias("total_chars"),
            F.round(F.avg("__q"), 6).alias("avg_quality"),
            F.round(
                F.percentile_approx("__q", F.lit(0.5), F.lit(10000)), 6
            ).alias("p50_quality"),
            F.round(
                F.percentile_approx("__q", F.lit(0.9), F.lit(10000)), 6
            ).alias("p90_quality"),
        )
    )
    tok_level = (
        df.select(*keys, F.explode(tokens(t, "[a-z0-9]+")).alias("tok"))
        .groupBy(*keys)
        .agg(
            F.approx_count_distinct("tok").alias("approx_distinct_tokens")
        )
    )
    if keys:
        return doc_level.join(tok_level, keys, "left")
    return doc_level.crossJoin(F.broadcast(tok_level))


def vocab_top_tokens(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """The ``k`` most frequent tokens with counts — the vocabulary
    head for tokenizer/vocab construction and boilerplate inspection.

    Shape: explode → groupBy(token) count (map-side partial agg
    collapses each partition's duplicates before the shuffle) →
    ``orderBy.limit(k)``, which Spark plans as TakeOrderedAndProject:
    each partition keeps only its own top-k and the driver merges
    k-sized heaps — the full vocabulary is never globally sorted.
    Ties break on the token string for determinism."""
    counts = (
        df.select(F.explode(tokens(text_col, "[a-z0-9]+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    if min_count > 1:
        counts = counts.where(F.col("n") >= min_count)
    return counts.orderBy(F.desc("n"), F.asc("tok")).limit(k)


def length_histogram(
    df: DataFrame,
    text_col: str = "text",
    log_base: float = 2.0,
) -> DataFrame:
    """Document-count histogram over log-spaced token-length buckets:
    bucket ``b`` holds docs with ``floor(log_base^b) <= n_tokens <
    floor(log_base^(b+1))`` (bucket -1 = zero-token docs).  Map-only
    bucket assignment + one tiny groupBy — the curation dashboard
    query for spotting truncation/boilerplate anomalies."""
    nt = token_count(F.col(text_col)).cast("long")
    bucket = (
        F.when(nt <= 0, F.lit(-1))
        .otherwise(
            F.floor(F.log(float(log_base), nt.cast("double"))).cast("int")
        )
        .alias("bucket")
    )
    return (
        df.select(bucket, nt.alias("__nt"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("__nt").alias("min_tokens"),
            F.max("__nt").alias("max_tokens"),
        )
        .orderBy("bucket")
    )
