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
        fields: dict[str, str] | None = None,
        segments_per_batch: int = 1,
        snapshot_every: int | None = None,
        mapping=None,
    ):
        """``fields`` names flat text columns directly; ``mapping``
        (an :class:`bleve_spark.index.mapping.IndexMapping`) instead
        compiles each micro-batch through the mapping layer first —
        nested paths flatten, per-type routing and custom analyzers
        apply — and every text field (scalar and array) PLUS the
        composite ``_all`` (typed trie-term members included) stream
        into segments. Vector/geo columns remain query-time concerns
        of the source DataFrame."""
        if (fields is None) == (mapping is None):
            raise ValueError("pass exactly one of fields / mapping")
        self.root = root
        self.key_cols = list(key_cols)
        self.fields = dict(fields) if fields else None
        self.mapping = mapping
        self.segments_per_batch = segments_per_batch
        # auto-commit a snapshot epoch every N micro-batches: readers
        # pin stable `at_epoch` views while the stream appends (the
        # reference's persister epoch cadence,
        # index/scorch/persister.go — here an explicit manifest-set
        # snapshot, rollback-able)
        self.snapshot_every = snapshot_every
        self._spark = None

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Idempotent: replaying a batch overwrites the same segment ids
        (resume=True skips already-manifested segments)."""
        n = self.segments_per_batch
        base = int(batch_id) * BATCH_SEG_STRIDE
        df, fields = batch_df, self.fields
        if self.mapping is not None:
            from bleve_spark.index.mapping import map_table

            flat, mfields, _composite, planned = map_table(
                batch_df, self.mapping, self.key_cols
            )
            # at-rest postings carry every text field — scalar AND
            # array (instance-merge, strided positions) — plus the
            # composite `_all` with its typed members
            comp = dict(_composite)
            df, fields = flat, mfields
            build_segments(
                df, self.key_cols, fields, self.root, n_segments=n,
                resume=True, segment_id_offset=base,
                composite_fields=comp or None,
            )
            self._spark = batch_df.sparkSession
            if (
                self.snapshot_every
                and (int(batch_id) + 1) % self.snapshot_every == 0
            ):
                SegmentStore(self._spark, self.root).commit_snapshot()
            return
        build_segments(
            df,
            self.key_cols,
            fields,
            self.root,
            n_segments=n,
            resume=True,
            segment_id_offset=base,
        )
        self._spark = batch_df.sparkSession
        if (
            self.snapshot_every
            and (int(batch_id) + 1) % self.snapshot_every == 0
        ):
            SegmentStore(self._spark, self.root).commit_snapshot()

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


def sessionize_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
):
    """Gap-based sessionization as a CUSTOM STATEFUL streaming operator
    (applyInPandasWithState) — the Spark-native extension point the
    reference lacks (its incremental unit is the Batch; SURVEY §2.6).

    Events per key are folded into sessions; a session CLOSES (and is
    emitted) when a later event arrives more than ``gap_seconds``
    after the previous one. The trailing open session per key lives in
    bounded state until a future batch closes it (flush-on-timeout can
    be layered with a heartbeat source; kept timeout-free here for
    deterministic replay). Output: (key, session_start, session_end,
    n_events), epoch-second longs — append mode.

    State per key is 3 longs — bounded regardless of stream length;
    the shuffle is the groupBy(key) hash partitioning, so 1000
    executors each hold their key range's state (RocksDB/HDFS state
    store in production)."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    out_schema = (
        "key string, session_start long, session_end long, "
        "n_events long"
    )
    state_schema = "start long, last long, n long"
    gap = int(gap_seconds)

    def fn(key, pdfs, state: GroupState):
        ts = []
        for pdf in pdfs:
            ts.extend(int(v) for v in pdf[ts_col])
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        out = []
        for t in ts:
            if last is not None and t - last > gap:
                out.append((start, last, n))
                start, n = t, 0
            if start is None:
                start = t
            last = t
            n += 1
        state.update((start, last, n))
        if out:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(out),
                    "session_start": [o[0] for o in out],
                    "session_end": [o[1] for o in out],
                    "n_events": [o[2] for o in out],
                }
            )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )
