"""Structured-Streaming → Iceberg sink with exactly-once publishing.

The Iceberg sibling of :mod:`.delta_sink`: micro-batches publish
through :func:`..sinks.iceberg_write.write_iceberg_append`, one
snapshot per epoch, and the snapshot SUMMARY map carries the
idempotence marker (``txn-app-id`` + ``txn-version``) that turns
Spark's at-least-once ``foreachBatch`` contract into exactly-once
table contents:

* Spark checkpoints its source offsets per ``batch_id`` and replays a
  batch whose commit wasn't recorded (crash between sink write and
  checkpoint advance → the same ``batch_id`` is delivered again);
* the writer stamps each snapshot's summary with the pair; a replayed
  batch finds ``txn-version >= batch_id`` already among the retained
  snapshots and no-ops — the check runs inside the writer's
  pinned-commit retry loop, so even a replay racing a live writer
  cannot double-publish.

Retention caveat (differs from Delta, where checkpoints carry ``txn``
actions forward): the marker lives in snapshot summaries, so
``expire_iceberg_snapshots`` retention must exceed the longest
possible stream outage or a restarted query loses its high-water mark.

``app_id`` defaults to a stable hash of the checkpoint location, the
identity Spark itself uses for a restarted query; pass it explicitly
when several distinct queries share a checkpoint directory layout.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame


def stream_to_iceberg(
    stream_df: DataFrame,
    location: str,
    checkpoint_dir: str,
    app_id: str | None = None,
    partition_by: list[str] | None = None,
    partition_transforms: dict[str, str] | None = None,
    query_name: str | None = None,
):
    """Start a streaming query publishing ``stream_df`` to the
    Iceberg table at ``location``.  Returns the ``StreamingQuery`` —
    callers own its lifecycle (``processAllAvailable()`` in tests,
    ``awaitTermination()`` in jobs)."""
    from glue_table_cache_spark.sinks.iceberg_write import (
        write_iceberg_append,
    )

    app = app_id or (
        "stream-"
        + hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:16]
    )

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        write_iceberg_append(
            batch_df,
            location,
            partition_by=partition_by,
            partition_transforms=partition_transforms,
            summary={
                "txn-app-id": app,
                "txn-version": str(int(batch_id)),
            },
        )

    writer = (
        stream_df.writeStream.foreachBatch(publish)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if query_name:
        writer = writer.queryName(query_name)
    return writer.start()
