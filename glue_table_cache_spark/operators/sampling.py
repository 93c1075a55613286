"""Deterministic sampling for training-corpus curation.

Beyond-reference extension.  Corpus mixing needs *reproducible*
sampling: the same inputs must select the same rows on every run, every
executor, and every retry — so none of these use ``rand()`` (whose
draw depends on task partitioning).  Selection hinges on
``xxhash64(key)`` instead: a pure function of the row's stable key.

* :func:`deterministic_sample` — keep ≈``fraction`` of rows, chosen by
  key hash.  Map-only, no shuffle, composes with any downstream op.
* :func:`stratified_sample` — per-stratum fractions (e.g. downsample
  web 10×, keep books 1×) in one pass.
* :func:`stratified_head` — EXACTLY ``n`` rows per stratum (the
  smallest-hash n — a deterministic uniform choice), one shuffle keyed
  on the stratum.
* :func:`mixture_sample` — token-budget corpus mixing: turn target
  domain *weights* (shares of a total token budget) into per-stratum
  keep-fractions, then sample.
* :func:`quantile_filter` — keep the top ``fraction`` of rows by a
  score column, optionally per stratum (quality-threshold selection).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: hash-bucket resolution: fraction granularity of 1e-6
_BUCKETS = 1_000_000


def _bucket(
    key_col: str | Column, salt: str = "", portable: bool = False
) -> Column:
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    if portable:
        # md5-derived 60-bit hash, bit-identical in DuckDB (see
        # dedup.portable_hash60) — lets a SQL oracle reproduce the
        # exact sample; xxhash64 stays the at-scale default
        from glue_table_cache_spark.operators.dedup import portable_hash60

        h = portable_hash60(c.cast("string"), seed=salt or None)
        return F.pmod(h, F.lit(_BUCKETS))
    return F.pmod(F.xxhash64(F.lit(salt), c), F.lit(_BUCKETS))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "",
    portable: bool = False,
) -> DataFrame:
    """Keep rows whose key hashes into the first ``fraction`` of hash
    buckets — a reproducible Bernoulli(fraction) sample.  ``salt``
    decorrelates repeated samples over the same keys (e.g. train/val
    splits: ``salt="train"`` and ``salt="val"`` with disjoint
    fractions)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(
        _bucket(key_col, salt, portable) < int(fraction * _BUCKETS)
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "",
    portable: bool = False,
) -> DataFrame:
    """Per-stratum deterministic sampling in one map-only pass: stratum
    ``s`` keeps ≈``fractions[s]`` of its rows (strata not listed keep
    ``default_fraction``).  The corpus-mixing primitive: one scan, no
    shuffle, reproducible."""
    for s, f_ in fractions.items():
        if not 0.0 <= f_ <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1]")
    thresh = F.lit(int(default_fraction * _BUCKETS))
    for s, f_ in fractions.items():
        thresh = F.when(
            F.col(strata_col) == s, F.lit(int(f_ * _BUCKETS))
        ).otherwise(thresh)
    return df.where(_bucket(key_col, salt, portable) < thresh)


def stratified_head(
    df: DataFrame,
    n_per_stratum: int,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
    portable: bool = False,
) -> DataFrame:
    """EXACTLY ``min(n, |stratum|)`` rows per stratum: the n
    smallest-hash keys — a deterministic uniform-without-replacement
    choice.  One hash-partitioned shuffle keyed on the stratum; use for
    bounded per-source quotas (caps the head stratum instead of
    proportionally shrinking everything).

    Skew note: a hot stratum lands on one reducer.  At scale,
    pre-thin it first with :func:`deterministic_sample` at a fraction
    comfortably above ``n / |stratum|`` — the hash-threshold pass is
    map-only, and the exact window then ranks a bounded remnant."""
    w = Window.partitionBy(strata_col).orderBy(
        _bucket(key_col, salt, portable), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    strata_col: str = "source",
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    salt: str = "",
    portable: bool = False,
) -> DataFrame:
    """Token-budget corpus mixing: sample each stratum so its surviving
    token mass ≈ its share of ``total_tokens``.

    ``weights`` are relative domain weights (normalised internally, so
    ``{"web": 6, "books": 3, "code": 1}`` works as-is); stratum ``s``
    targets ``weights[s]/Σweights × total_tokens`` tokens and keeps a
    ``min(1, target/actual)`` hash-fraction of its rows.  Strata not in
    ``weights`` are dropped.  An underweight stratum (fewer tokens than
    its target) keeps everything — the budget is a cap, not a quota fill.

    Stays one lazy plan: the per-stratum token totals are a tiny
    aggregate (one row per domain) broadcast-joined back, and the
    selection itself is the same hash-threshold predicate as
    :func:`stratified_sample` — reproducible and skew-immune (the only
    shuffle is the one-row-per-domain aggregate; the kept rows never
    move).  At 100 TB, substitute a pre-computed corpus-stats table for
    the aggregate input if re-scanning for totals is too dear.
    """
    if total_tokens < 0:
        raise ValueError(f"total_tokens must be >= 0, got {total_tokens}")
    if not weights:
        raise ValueError("weights must name at least one stratum")
    for s, w_ in weights.items():
        if w_ < 0:
            raise ValueError(f"weight for {s!r} must be >= 0")
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum to > 0")

    weight_map = F.create_map(
        *[F.lit(x) for s, w_ in weights.items() for x in (s, w_)]
    )
    # target token mass for this stratum vs what it actually has;
    # stratum totals of 0 null out the division → row filtered (the
    # three-valued WHERE treats Unknown as drop), matching fraction 0
    thresholds = (
        df.where(F.col(strata_col).isin(*weights))
        .groupBy(strata_col)
        .agg(F.sum(F.col(token_col)).alias("__toks"))
        .select(
            strata_col,
            (
                F.least(
                    F.lit(1.0),
                    weight_map[F.col(strata_col)]
                    / wsum
                    * total_tokens
                    / F.nullif(F.col("__toks"), F.lit(0)),
                )
                * _BUCKETS
            )
            .cast("long")
            .alias("__thresh"),
        )
    )
    return (
        df.join(F.broadcast(thresholds), on=strata_col, how="inner")
        .where(_bucket(key_col, salt, portable) < F.col("__thresh"))
        .select(*df.columns)
    )


def quantile_filter(
    df: DataFrame,
    top_fraction: float,
    score_col: str = "quality",
    strata_col: str | None = None,
    exact: bool = False,
) -> DataFrame:
    """Keep the top ``top_fraction`` of rows by ``score_col`` —
    quality-threshold selection, globally or per stratum.

    Default (``exact=False``) is the 100 TB shape: one tiny
    ``approx_percentile`` aggregate (one row per stratum, or one row
    total) broadcast-joined back, then a map-only ``score >= cutoff``
    filter — no full-data shuffle or sort.  The approximate cutoff can
    drift the kept share by the sketch's rank error (~1e-4 here), and
    rows tied AT the cutoff are all kept.

    ``exact=True`` ranks every row (``percent_rank`` window) for an
    exact share; per-stratum that shuffles on the stratum key, global
    it single-partitions the sort — use only when the data (or each
    stratum) is small enough to rank.
    """
    if not 0.0 <= top_fraction <= 1.0:
        raise ValueError(
            f"top_fraction must be in [0, 1], got {top_fraction}"
        )
    score = F.col(score_col)
    if top_fraction == 0.0:
        # percent_rank()=0 / cutoff=max would both leak the top row(s)
        return df.where(F.lit(False))
    if exact:
        part = [strata_col] if strata_col else []
        w = Window.partitionBy(*part).orderBy(score.desc())
        return (
            df.withColumn("__pr", F.percent_rank().over(w))
            .where(F.col("__pr") <= F.lit(top_fraction))
            .drop("__pr")
        )
    cutoff_expr = F.percentile_approx(
        score, F.lit(1.0 - top_fraction), F.lit(10000)
    ).alias("__cutoff")
    if strata_col:
        cutoffs = df.groupBy(strata_col).agg(cutoff_expr)
        return (
            df.join(F.broadcast(cutoffs), on=strata_col, how="inner")
            .where(score >= F.col("__cutoff"))
            .drop("__cutoff")
        )
    # constant-key equi-join so the one-row cutoff broadcasts as a
    # BroadcastHashJoin (a conditionless join would plan the
    # BroadcastNestedLoopJoin the repo's plan gates ban)
    cutoff = df.agg(cutoff_expr).withColumn("__one", F.lit(1))
    return (
        df.withColumn("__one", F.lit(1))
        .join(F.broadcast(cutoff), on="__one", how="inner")
        .where(score >= F.col("__cutoff"))
        .drop("__cutoff", "__one")
    )
