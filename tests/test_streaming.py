"""Structured Streaming encode: micro-batches → epoch-scoped blocks →
decode union equals the full input."""

from __future__ import annotations

import pandas as pd

from varint_spark import transcripts
from varint_spark.engine import EncodeOptions
from varint_spark.streaming import decode_stream_blocks, encode_stream

OPTS = EncodeOptions(num_buckets=4, chunk_rows=1024, salt_span=4096)


def test_streaming_encode_decode(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream_src"))
    root = str(tmp_path_factory.mktemp("stream_root"))

    full = transcripts.generate_spark(spark, n_conversations=80, n_hot=0)
    full.cache().count()
    # two "arrival waves" as separate parquet files
    full.filter("turn_idx % 2 = 0").write.mode("append").parquet(src)

    q = encode_stream(spark, src, transcripts.TRANSCRIPT_DDL, root, OPTS)
    q.awaitTermination(120)

    full.filter("turn_idx % 2 = 1").write.mode("append").parquet(src)
    q2 = encode_stream(spark, src, transcripts.TRANSCRIPT_DDL, root, OPTS)
    q2.awaitTermination(120)

    decoded = decode_stream_blocks(spark, root, transcripts.TRANSCRIPT_DDL)
    left = full.orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    right = decoded.orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(left, right)


def test_windowed_stats_with_watermark(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from varint_spark.streaming import windowed_turn_stats

    src = str(tmp_path_factory.mktemp("win_src"))
    full = transcripts.generate_spark(spark, n_conversations=60, n_hot=0)
    full.cache().count()
    full.write.mode("append").parquet(src)

    stream = spark.readStream.schema(transcripts.TRANSCRIPT_DDL).parquet(src)
    agg = windowed_turn_stats(stream, window="1 hour",
                              watermark="10 minutes", group_col="role")
    q = (agg.writeStream.format("memory").queryName("win_stats")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.win.start, r.role): (r.n_turns, r.text_bytes)
           for r in spark.table("win_stats").collect()}
    want = {(r.w.start, r.role): (r.n_turns, r.text_bytes)
            for r in full.groupBy(F.window("ts", "1 hour").alias("w"), "role")
            .agg(F.count("*").alias("n_turns"),
                 F.sum(F.octet_length("text")).alias("text_bytes")).collect()}
    # availableNow drains everything; append emits only watermark-closed
    # windows, so emitted windows must match the batch aggregation exactly
    assert got
    for k, v in got.items():
        assert want[k] == v


def test_stateful_running_totals_across_batches(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from varint_spark.streaming import running_conversation_totals

    src = str(tmp_path_factory.mktemp("state_src"))
    ckpt = str(tmp_path_factory.mktemp("state_ckpt"))
    out = str(tmp_path_factory.mktemp("state_out"))
    full = transcripts.generate_spark(spark, n_conversations=40, n_hot=0)
    full.cache().count()
    full.filter("turn_idx % 2 = 0").write.mode("append").parquet(src)

    def drain():
        stream = spark.readStream.schema(transcripts.TRANSCRIPT_DDL).parquet(src)
        q = (running_conversation_totals(stream).writeStream
             .foreachBatch(lambda df, eid: df.write.mode("append").parquet(out))
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    # second wave arrives; state (turn counts) must carry across restarts
    full.filter("turn_idx % 2 = 1").write.mode("append").parquet(src)
    drain()
    # parquet accumulates one row per (group, batch): the final state per
    # conversation is the row with the highest running total
    latest = {r.conv_id: (r.turns_seen, r.last_turn_idx)
              for r in spark.read.parquet(out)
              .orderBy("conv_id", "turns_seen").collect()}
    want = {r.conv_id: (r.n, r.mx) for r in
            full.groupBy("conv_id").agg(F.count("*").alias("n"),
                                        F.max("turn_idx").alias("mx")).collect()}
    for cid, (n, mx) in want.items():
        assert latest[cid] == (n, mx), cid


def test_dedup_stream_against_persisted_index(spark, tmp_path_factory):
    """Streaming near-dup filter: intra-batch copies drop in wave 1;
    wave 2 (restarted from the same checkpoint) drops copies of INDEXED
    docs via the persisted signatures — old text never re-read — and
    keeps fresh docs. Keep-first: a copy of a doc that was itself
    dropped still matches the kept original's signature."""
    from varint_spark.streaming import dedup_stream

    src = str(tmp_path_factory.mktemp("dd_src"))
    root = str(tmp_path_factory.mktemp("dd_root"))
    ddl = "doc_id long, text string"

    def text(i):
        return " ".join(f"tok{i}w{j}" for j in range(30))

    wave1 = [(i, text(i)) for i in range(20)] + [(20, text(3))]
    spark.createDataFrame(wave1, ddl).write.mode("append").parquet(src)
    q = dedup_stream(spark, src, ddl, root)
    q.awaitTermination(120)

    wave2 = [(i, text(i)) for i in range(100, 110)] \
        + [(110, text(7)), (111, text(3))]
    spark.createDataFrame(wave2, ddl).write.mode("append").parquet(src)
    q2 = dedup_stream(spark, src, ddl, root)
    q2.awaitTermination(120)

    clean = spark.read.parquet(f"{root}/clean")
    assert {r.doc_id for r in clean.collect()} == \
        set(range(20)) | set(range(100, 110))
    idx = spark.read.parquet(f"{root}/sig_index")
    assert {r.batch for r in idx.select("batch").distinct().collect()} == {0, 1}
    assert {r.doc_id for r in idx.collect()} == \
        set(range(20)) | set(range(100, 110))
