"""Materialization strategy for eagerly-shared intermediate frames.

Several operators (``pipeline.curate``, ``lm.train_ngram_lm``,
``dedup.connected_components``, ``similarity.semantic_dedup``)
materialize an expensive intermediate exactly once because ≥2
downstream plan subtrees reference it and Catalyst re-computes (never
shares) a repeated subtree across a join.  The default mechanism is
``localCheckpoint``: cheapest (executor-local storage, lineage
truncated), but at 100 TB it has two consequences worth an explicit
knob —

* **executor loss is not recoverable**: lineage is truncated, so a
  lost executor kills the job instead of recomputing its partitions
  (fine for short pipelines, wrong for long multi-hour runs on
  preemptible nodes);
* **local disk pressure**: the materialized frame (e.g. curate's
  filtered corpus) lands on executor local disks, which must be sized
  for it.

``persist`` trades that back: ``StorageLevel.DISK_ONLY`` keeps the
lineage (recoverable, spillable) at the cost of keeping the full plan
alive — use on clusters where executor loss is routine.  ``off``
skips materialization entirely and accepts the recompute (right when
the input is itself a cheap scan, or when the caller already
persisted it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: accepted strategies
MATERIALIZE_MODES = ("localCheckpoint", "persist", "off")


def materialize_frame(
    df: DataFrame, mode: str = "localCheckpoint"
) -> DataFrame:
    """Eagerly materialize ``df`` per ``mode`` (see module docstring).

    Always returns a frame whose downstream references do not
    re-evaluate the input subtree (except ``mode="off"``, which is a
    documented no-op)."""
    if mode == "localCheckpoint":
        return df.localCheckpoint()
    if mode == "persist":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.DISK_ONLY)
        # force evaluation now, like the eager localCheckpoint — the
        # caller's next action would otherwise evaluate the subtree
        # once per reference racing the cache fill
        out.count()
        return out
    if mode == "off":
        return df
    raise ValueError(
        f"materialize must be one of {MATERIALIZE_MODES}, got {mode!r}"
    )
