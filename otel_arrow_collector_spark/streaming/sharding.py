"""Metadata-keyed sharded batching — the batch processor's multi-shard mode
(processor/batchprocessor/batch_processor.go:277-330): one independent
batcher per distinct combination of client-metadata key values, each with
its own size trigger; total shard cardinality is capped
(metadata_cardinality_limit -> errTooManyBatchers, batch_processor.go:29-30).

Spark mapping: ``groupBy(metadata_keys).applyInPandasWithState`` — the
group state IS the per-shard batcher (pending count persists across
micro-batches; processing-time timeout flushes partial batches, mirroring
the shard timer).  The cardinality cap is enforced on the batcher's output
stream where shard creation becomes visible (per-key state functions cannot
observe global cardinality — a deliberate scale property, since global
coordination inside a keyed state op would serialize the shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (BooleanType, LongType, StringType, StructField,
                               StructType)


class TooManyShardsError(RuntimeError):
    """errTooManyBatchers: distinct metadata combinations exceed the cap."""


class MetadataShardedBatcher:
    """Stateful per-shard size batcher over a keyed stream."""

    def __init__(self, keys: list[str], send_batch_size: int = 8192,
                 cardinality_limit: int = 1000,
                 flush_timeout_ms: int = 200):
        self.keys = keys
        self.send_batch_size = send_batch_size
        self.cardinality_limit = cardinality_limit
        self.flush_timeout_ms = flush_timeout_ms
        self._out_schema = StructType(
            [StructField(k, StringType()) for k in keys]
            + [StructField("batch_rows", LongType()),
               StructField("complete", BooleanType())])
        self._state_schema = StructType([StructField("pending", LongType())])

    # -- the per-shard state function (one logical batcher per key) --------

    def _shard_fn(self, key: tuple, pdfs: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
        size = self.send_batch_size
        pending = state.get[0] if state.exists else 0
        out_batches: list[int] = []
        if state.hasTimedOut:
            if pending:
                out_batches.append(pending)   # timeout flush (partial batch)
            state.remove()
        else:
            for pdf in pdfs:
                pending += len(pdf)
                while pending >= size:        # size trigger
                    out_batches.append(size)
                    pending -= size
            state.update((pending,))
            state.setTimeoutDuration(self.flush_timeout_ms)
        if out_batches:
            yield pd.DataFrame(
                [dict({k: str(v) for k, v in zip(self.keys, key)},
                      batch_rows=n, complete=(n == size))
                 for n in out_batches])

    def apply(self, df: DataFrame) -> DataFrame:
        """Keyed stateful batching; returns one row per emitted batch."""
        return (df.groupBy(*self.keys)
                  .applyInPandasWithState(
                      self._shard_fn, self._out_schema, self._state_schema,
                      "append", GroupStateTimeout.ProcessingTimeTimeout))

    # -- driver-side run with cardinality enforcement ----------------------

    def run(self, stream_df: DataFrame,
            sink: Callable[[pd.DataFrame], Any] | None = None,
            checkpoint: str | None = None,
            available_now: bool = True):
        """Start the batcher; raise TooManyShardsError (via query failure)
        when a new shard would exceed the cardinality limit."""
        seen: set[tuple] = set()
        batched = self.apply(stream_df)

        def guard(batch_df: DataFrame, _bid: int) -> None:
            # Cardinality is counted distributively: only the DISTINCT key
            # tuples cross to the driver, capped at limit+1 rows — never the
            # batch itself (a big shard batch must not be able to OOM the
            # driver at 100x scale).
            new_keys = (batch_df.select(*self.keys).distinct()
                        .limit(self.cardinality_limit + 1).collect())
            seen.update(tuple(r) for r in new_keys)
            if len(seen) > self.cardinality_limit:
                raise TooManyShardsError(
                    f"too many metadata-key combinations: {len(seen)} > "
                    f"limit {self.cardinality_limit}")
            if sink is not None:
                # Opt-in driver materialization: only when the caller
                # explicitly attached a pandas sink (test capture).
                pdf = batch_df.toPandas()
                if len(pdf):
                    sink(pdf)

        writer = batched.writeStream.foreachBatch(guard).outputMode("append")
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
