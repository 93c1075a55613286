"""Structured-Streaming → Delta sink with exactly-once publishing.

Completes the streaming ingestion story: a stream's micro-batches are
published to a Delta table through
:func:`glue_table_cache_spark.sinks.delta_write.write_delta_append`,
and the Delta protocol's ``txn`` (SetTransaction) action turns Spark's
at-least-once ``foreachBatch`` contract into exactly-once table
contents — the classic public pattern every Delta streaming writer
uses:

* Spark checkpoints its source offsets per ``batch_id`` and replays a
  batch whose commit wasn't recorded (crash between sink write and
  checkpoint advance → the same ``batch_id`` is delivered again);
* the sink stamps each commit with ``txn = (app_id, batch_id)``;
  a replayed batch finds ``txn.version >= batch_id`` already in the
  log and no-ops instead of double-publishing.

``app_id`` defaults to a stable hash of the checkpoint location, the
identity Spark itself uses for a restarted query; pass it explicitly
when several distinct queries share a checkpoint directory layout.

Scale shape: each micro-batch write is a normal distributed parquet
write + one metadata-scale commit; the idempotence check replays the
log tail driver-side (bounded by the checkpoint interval).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame


def stream_to_delta(
    stream_df: DataFrame,
    location: str,
    checkpoint_dir: str,
    app_id: str | None = None,
    partition_by: list[str] | None = None,
    query_name: str | None = None,
):
    """Start a streaming query publishing ``stream_df`` to the Delta
    table at ``location``.  Returns the ``StreamingQuery`` — callers
    own its lifecycle (``processAllAvailable()`` in tests,
    ``awaitTermination()`` in jobs)."""
    from glue_table_cache_spark.sinks.delta_write import (
        write_delta_append,
    )

    app = app_id or (
        "stream-"
        + hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:16]
    )

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        write_delta_append(
            batch_df,
            location,
            partition_by=partition_by,
            txn_app_id=app,
            txn_version=int(batch_id),
        )

    writer = (
        stream_df.writeStream.foreachBatch(publish)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if query_name:
        writer = writer.queryName(query_name)
    return writer.start()
