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
