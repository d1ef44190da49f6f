"""Incremental / streaming index maintenance.

The reference has no stream-time operators — its incremental unit is
the Batch, made visible by introducing an in-memory segment
(/root/reference/index.go:35-65,
/root/reference/index/scorch/introducer.go:108). The Spark-native
equivalent is Structured Streaming ``foreachBatch``: every micro-batch
builds new immutable segments appended to the store; the manifest
write is the introducer's atomic swap; checkpointing gives
exactly-once (a replayed batch rewrites the same segment ids —
idempotent by construction since segment ids derive from batch_id).

Background merging (the merger goroutine,
/root/reference/index/scorch/merge.go:48) maps to periodically running
:func:`bleve_spark.index.merge.merge_level` on the accumulated
segments.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from bleve_spark.index.segments import SegmentStore, build_segments

# batch_id is multiplied by this stride so every micro-batch owns a
# disjoint segment-id range (stride = max segments per batch)
BATCH_SEG_STRIDE = 1 << 16


class IncrementalIndexer:
    """foreachBatch sink building segments per micro-batch."""

    def __init__(
        self,
        root: str,
        key_cols: list[str],
        fields: dict[str, str],
        segments_per_batch: int = 1,
    ):
        self.root = root
        self.key_cols = list(key_cols)
        self.fields = dict(fields)
        self.segments_per_batch = segments_per_batch

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Idempotent: replaying a batch overwrites the same segment ids
        (resume=True skips already-manifested segments)."""
        from pyspark.sql import functions as F

        n = self.segments_per_batch
        base = int(batch_id) * BATCH_SEG_STRIDE
        # remap the hash-assigned ids into this batch's range
        df = batch_df
        stats = build_segments(
            df,
            self.key_cols,
            self.fields,
            self.root,
            n_segments=n,
            resume=True,
            segment_id_offset=base,
        )
        del stats, F

    def attach(self, stream_df: DataFrame, checkpoint_dir: str):
        """Wire into Structured Streaming; returns the StreamingQuery."""
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def store(self, spark) -> SegmentStore:
        return SegmentStore(spark, self.root)

    def segment_count(self) -> int:
        mdir = os.path.join(self.root, "manifest")
        if not os.path.isdir(mdir):
            return 0
        return len([f for f in os.listdir(mdir) if f.endswith(".json")])
