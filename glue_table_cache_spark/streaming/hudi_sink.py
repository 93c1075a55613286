"""Structured-Streaming → Hudi sink with exactly-once publishing.

Completes the three-format sink suite (:mod:`.delta_sink`,
:mod:`.iceberg_sink`): micro-batches publish through
:func:`..sinks.hudi_write.write_hudi_append`, one instant per epoch,
and the commit's ``extraMetadata`` map carries the idempotence marker
(``txn-app-id`` + ``txn-version``) that turns Spark's at-least-once
``foreachBatch`` contract into exactly-once table contents — the same
mechanism real Hudi streams use (their source checkpoints live in
commit metadata too):

* Spark checkpoints its source offsets per ``batch_id`` and replays a
  batch whose commit wasn't recorded (crash between sink write and
  checkpoint advance → the same ``batch_id`` is delivered again);
* the writer stamps each commit's ``extraMetadata`` with the pair; a
  replayed batch finds ``txn-version >= batch_id`` already on the
  timeline and no-ops — checked before staging AND inside the
  writer's instant retry loop, so even a replay racing a live writer
  cannot double-publish.

Retention caveat (mirrors the Iceberg sink's): the marker lives in
timeline commit files, so timeline cleaning/archival must retain more
history than the longest possible stream outage or a restarted query
loses its high-water mark.

``app_id`` defaults to a stable hash of the checkpoint location, the
identity Spark itself uses for a restarted query; pass it explicitly
when several distinct queries share a checkpoint directory layout.

Append-only: each epoch inserts NEW file groups (legal on both
COPY_ON_WRITE and MERGE_ON_READ tables).  Streaming upserts would
need record-key indexing against the target per epoch — route those
through :func:`..sinks.hudi_log_write.write_hudi_log` in a custom
``foreachBatch`` instead.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame


def stream_to_hudi(
    stream_df: DataFrame,
    location: str,
    checkpoint_dir: str,
    app_id: str | None = None,
    partition_by: list[str] | None = None,
    table_type: str = "COPY_ON_WRITE",
    query_name: str | None = None,
):
    """Start a streaming query publishing ``stream_df`` to the Hudi
    table at ``location``.  Returns the ``StreamingQuery`` — callers
    own its lifecycle (``processAllAvailable()`` in tests,
    ``awaitTermination()`` in jobs)."""
    from glue_table_cache_spark.sinks.hudi_write import (
        write_hudi_append,
    )

    app = app_id or (
        "stream-"
        + hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:16]
    )

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        write_hudi_append(
            batch_df,
            location,
            partition_by=partition_by,
            table_type=table_type,
            extra_metadata={
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
