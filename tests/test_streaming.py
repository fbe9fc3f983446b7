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


def test_upsert_stream_cdc_apply(spark, tmp_path_factory):
    """CDC ingestion: wave 1 seeds the table, wave 2 carries updates
    (same key, new value — including two updates to ONE key resolved by
    dedup_col last-wins) and inserts; the committed store reads as the
    merged table, and the pre-update version stays addressable."""
    import numpy as np
    from pyspark.sql import functions as F

    from varint_spark.lineage import read_snapshot
    from varint_spark.streaming import upsert_stream

    src = str(tmp_path_factory.mktemp("cdc_src"))
    root = str(tmp_path_factory.mktemp("cdc_root"))
    opts = EncodeOptions(num_buckets=2, chunk_rows=128, salt_span=1 << 30,
                         group_col="g", order_col="event_id")
    ddl = "event_id long, g long, v long, seq long"

    def make(ids, v, seq):
        ids = np.asarray(ids, dtype=np.int64)
        return spark.createDataFrame(pd.DataFrame(
            {"event_id": ids, "g": ids % 3,
             "v": np.full(len(ids), v, dtype=np.int64),
             "seq": np.full(len(ids), seq, dtype=np.int64)}))

    make(range(0, 400), 1, seq=0).write.mode("append").parquet(src)
    q = upsert_stream(spark, src, ddl, root, opts, dedup_col="seq")
    q.awaitTermination(120)

    # wave 2: update 100..199 (seq 1), re-update 150..199 (seq 2), insert 400..499
    up = make(range(100, 200), 2, seq=1) \
        .unionByName(make(range(150, 200), 3, seq=2)) \
        .unionByName(make(range(400, 500), 9, seq=1))
    up.write.mode("append").parquet(src)
    q2 = upsert_stream(spark, src, ddl, root, opts, dedup_col="seq")
    q2.awaitTermination(120)

    got = read_snapshot(spark, root, ddl).toPandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert got.event_id.is_unique and len(got) == 500
    vals = got.set_index("event_id").v
    assert (vals.loc[:99] == 1).all() and (vals.loc[200:399] == 1).all()
    assert (vals.loc[100:149] == 2).all()          # seq-1 update applied
    assert (vals.loc[150:199] == 3).all()          # seq-2 beats seq-1
    assert (vals.loc[400:] == 9).all()             # inserts

    # the pre-update version is still addressable
    v1 = read_snapshot(spark, root, ddl, as_of=1).toPandas()
    assert len(v1) == 400 and (v1.v == 1).all()

    # restart with nothing new: checkpoint replays no epochs, no commit
    q3 = upsert_stream(spark, src, ddl, root, opts, dedup_col="seq")
    q3.awaitTermination(120)
    again = read_snapshot(spark, root, ddl).toPandas()
    assert len(again) == 500
