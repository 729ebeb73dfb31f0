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


class ChunkSet(list):
    """List of chunk DataFrames backed by one persisted parent.

    Call :meth:`release` (or use as a context manager) after the chunks
    have been consumed to drop the cache; chunks remain valid afterwards
    but recompute from source if re-used.
    """

    def __init__(self, chunks, parent=None):
        super().__init__(chunks)
        self._parent = parent

    def release(self) -> None:
        if self._parent is not None:
            self._parent.unpersist()
            self._parent = None

    def __enter__(self) -> "ChunkSet":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


def size_capped_chunks(batch_df: DataFrame, max_size: int) -> ChunkSet:
    """Split one (micro-)batch into exactly ``ceil(n/max_size)`` chunks of
    <= max_size rows each (hard cap — splitTraces' send_batch_max_size
    guarantee, splittraces.go:11-66), preserving partition arrival order.

    Single-pass: the batch is persisted with a per-row global position
    (``monotonically_increasing_id`` decomposed into (partition, local pos)
    + driver-side per-partition offsets — the zipWithIndex scheme, no
    global sort, no extra scan of the source).  The count job materializes
    the cache; every chunk filter and the sink reads reuse it.  Caller
    releases the cache via the returned :class:`ChunkSet`.
    """
    # mid = partition_id << 33 | local_row_position (stable per plan)
    keyed = (batch_df
             .withColumn("__mid", F.monotonically_increasing_id())
             .persist())
    # one small job over the (now cached) batch: rows per input partition
    per_part = sorted(
        (r["pid"], r["n"]) for r in
        keyed.select(F.shiftright("__mid", 33).alias("pid"))
             .groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect())
    if not per_part:
        keyed.unpersist()
        return ChunkSet([])
    offsets, total = {}, 0
    for pid, n in per_part:
        offsets[pid] = total
        total += n
    if total <= max_size:
        return ChunkSet([keyed.drop("__mid")], parent=keyed)
    # global position = offset[partition] + local position -> exact chunks
    off_expr = F.element_at(
        F.create_map(*[F.lit(x).cast("long")
                       for kv in offsets.items() for x in kv]),
        F.shiftright("__mid", 33))
    pos = off_expr + F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    chunked = keyed.withColumn("__chunk", (pos / max_size).cast("long"))
    n_chunks = math.ceil(total / max_size)
    return ChunkSet(
        [chunked.filter(F.col("__chunk") == i).drop("__chunk", "__mid")
         for i in range(n_chunks)],
        parent=keyed)


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
        with size_capped_chunks(batch_df, send_batch_max_size) as chunks:
            for i, chunk in enumerate(chunks):
                sink(chunk, batch_id, i)

    writer = stream_df.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif timeout:
        writer = writer.trigger(processingTime=timeout)
    return writer.start()
