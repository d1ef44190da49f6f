"""Custom stateful streaming operator: gap sessionization via
applyInPandasWithState (bounded per-key state, append mode)."""

import time


def test_sessionize_stream(spark, tmp_path):
    from pyspark.sql import functions as F

    from bleve_spark.streaming.pipeline import sessionize_stream

    # two keys; key 'a' has two sessions separated by a >gap hole,
    # key 'b' one session — all inside one micro-batch
    rows = [
        ("a", 100), ("a", 110), ("a", 130),   # session 1: 100-130 (3)
        ("a", 500), ("a", 505),               # session 2: 500-505 (2)
        ("b", 200), ("b", 260),               # session: 200-260 (2)
    ]
    src = str(tmp_path / "events")
    spark.createDataFrame(rows, "key string, ts long").coalesce(
        1
    ).write.parquet(src)

    stream = spark.readStream.schema("key string, ts long").parquet(src)
    sessions = sessionize_stream(stream, "key", "ts", gap_seconds=60)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    time.sleep(0.5)
    got = {
        (r["key"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    # sessions CLOSED by a later event in the same batch are emitted;
    # the trailing open session per key stays in state (would emit on
    # processing-time timeout in a live stream)
    assert ("a", 100, 130, 3) in got
    assert all(k == "a" for k, *_ in got), got


def test_snapshot_auto_commit(spark, tmp_path):
    from bleve_spark.streaming.pipeline import IncrementalIndexer

    src = str(tmp_path / "in")
    for i in range(2):
        spark.createDataFrame(
            [(f"c{i}", j, f"quick data {j}") for j in range(5)],
            "conv_id string, turn_idx int, text string",
        ).coalesce(1).write.mode("append").parquet(src)

    indexer = IncrementalIndexer(
        str(tmp_path / "idx"),
        ["conv_id", "turn_idx"], {"text": "standard"},
        snapshot_every=1,
    )
    stream = spark.readStream.schema(
        "conv_id string, turn_idx int, text string"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = indexer.attach(stream, str(tmp_path / "ck"))
    q.awaitTermination(120)
    store = indexer.store(spark)
    snaps = store.snapshots()
    # one snapshot per micro-batch; latest covers both batches
    assert len(snaps) >= 2
    assert store.doc_table().count() == 10
