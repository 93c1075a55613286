"""Sequence packing: lay documents into fixed token-budget packs.

Beyond-reference extension.  Training consumes fixed-length sequences;
the standard high-throughput layout is *concat-and-chunk*: concatenate
documents in a deterministic order and chop the token stream every
``budget`` tokens.  That layout is exactly window arithmetic — a
running token sum per stream — so it stays declarative (no UDF, one
shuffle per stream column).

At 100 TB a single global stream would funnel the whole corpus through
one ordering; instead the stream is partitioned (``part_col`` — a
source, shard, or hash-bucket column), each stream packed
independently, and ``pack_id`` scoped per stream.  Determinism: the
order within a stream is ``order_col`` (a stable key), never arrival
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    part_col: str | None = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Adds ``pack_id`` (the pack this document *starts* in, scoped to
    its ``part_col`` stream) and ``pack_offset`` (token offset within
    that pack).  A document longer than the residual budget straddles
    into the next pack — concat-and-chunk semantics, the document is
    split at training time, never dropped.

    ``part_col=None`` packs one global stream — fine for small frames,
    but it funnels everything through a single window partition; at
    scale always pass a stream column (source, shard, or a hash
    bucket)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    part = F.lit(0) if part_col is None else F.col(part_col)
    w = (
        Window.partitionBy(part)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(
        "pack_id", F.floor(before / budget)
    ).withColumn("pack_offset", before % budget)


def pack_stats(
    packed: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    part_col: str = "source",
) -> DataFrame:
    """Per-stream packing efficiency: number of packs and fill ratio
    (total tokens / pack capacity) — the waste metric to watch when
    tuning ``budget``."""
    return packed.groupBy(part_col).agg(
        (F.floor(
            (F.sum(token_col) + F.lit(budget - 1)) / budget
        )).alias("n_packs"),
        F.sum(token_col).alias("total_tokens"),
        F.round(
            F.sum(token_col)
            / (F.floor((F.sum(token_col) + F.lit(budget - 1)) / budget)
               * budget).cast("double"),
            6,
        ).alias("fill_ratio"),
    )
