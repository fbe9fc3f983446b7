"""Structured Streaming integration: encode arriving transcript rows
incrementally.

The reference is a single-threaded batch library (SURVEY §2.B: no
streaming); this is the Spark-native extension: ``readStream`` →
``foreachBatch`` → the same encode pipeline, with **exactly-once** epoch
commits (each micro-batch writes its blocks under ``batch=<epoch>`` with
overwrite, so Spark's checkpoint-driven replay of a failed epoch is
idempotent — same pattern as the batch layer's partition overwrite).

Late/out-of-order data: encoding is per-(bucket, salt, epoch) — a late
turn lands in a later epoch's blocks; decode unions all epochs, so the
row set is complete regardless of arrival order (the engine's ordering
guarantee is in-chunk sort, not cross-chunk arrival).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from .engine import EncodeOptions, decode_blocks, encode_transcripts


def encode_stream(spark: SparkSession, input_dir: str, schema_ddl: str, root: str,
                  opts: EncodeOptions = EncodeOptions(), shared=None,
                  available_now: bool = True):
    """Start a streaming encode over a parquet directory source. Returns
    the StreamingQuery; blocks land in <root>/stream_blocks/batch=<epoch>/."""
    out_dir = str(Path(root) / "stream_blocks")

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        blocks = encode_transcripts(batch_df, opts, shared=shared)
        # epoch-scoped overwrite = idempotent on checkpoint replay
        blocks.write.mode("overwrite").parquet(f"{out_dir}/batch={epoch_id}")

    stream = spark.readStream.schema(schema_ddl).parquet(input_dir)
    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", str(Path(root) / "_stream_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_stream_blocks(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(str(Path(root) / "stream_blocks"))


def decode_stream_blocks(spark: SparkSession, root: str, schema_ddl: str,
                         shared=None) -> DataFrame:
    """Union of all epochs, decoded. Group key includes the epoch dir via
    distinct part_key/chunk_id *within* each batch dir — chunk ids repeat
    across epochs, so decode groups on (batch file path) too."""
    blocks = read_stream_blocks(spark, root).withColumn(
        "part_key", F.concat(F.regexp_extract(F.input_file_name(), r"batch=(\d+)", 1),
                             F.lit("/"), F.col("part_key"))
    )
    return decode_blocks(blocks, schema_ddl, shared=shared)


def dedup_stream(spark: SparkSession, input_dir: str, schema_ddl: str,
                 root: str, id_col: str = "doc_id", text_col: str = "text",
                 max_hamming: int = 3, bands: int = 8,
                 available_now: bool = True):
    """Streaming near-duplicate filter against a PERSISTED signature
    index — the shape a training-data ingest actually runs: documents
    arrive continuously, each micro-batch is deduplicated against
    EVERYTHING kept so far without ever re-reading old text (the index
    is 16 B/doc SimHash signatures), survivors append to ``clean/`` and
    their signatures to ``sig_index/``.

    Keep-first policy (greedy, deterministic): a document is dropped iff
    it is within ``max_hamming`` of an already-indexed document
    (:func:`...dedup.simhash_incremental_pairs`, pigeonhole-exact) or of
    a lower-id document in its own micro-batch
    (:func:`...dedup.simhash_near_dup_pairs`). Not a transitive
    closure — the standard corpus-dedup semantics.

    Exactly-once across failures: both outputs are epoch-scoped
    overwrites (replaying a failed epoch rewrites the same dirs), and
    the index read filters to ``batch < epoch`` so a half-written
    failed attempt of THIS epoch can never feed its own replay."""
    from .pipeline import dedup

    clean_dir = str(Path(root) / "clean")
    index_dir = str(Path(root) / "sig_index")

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        sigs = dedup.simhash(batch_df, id_col, text_col).persist()
        intra = dedup.simhash_near_dup_pairs(
            batch_df, id_col, text_col, max_hamming=max_hamming,
            bands=bands, sigs=sigs)
        drop = intra.select(F.col("id_b").alias(id_col))
        sess = batch_df.sparkSession
        from pyspark.errors import AnalysisException
        try:
            index = sess.read.parquet(index_dir) \
                .filter(F.col("batch") < epoch_id).select(id_col, "simhash")
        except AnalysisException:  # first epoch: no index dir yet —
            # anything else (corrupt files, permissions) must stay LOUD,
            # silently treating it as "no index" would re-admit dups
            index = None
        if index is not None:
            cross = dedup.simhash_incremental_pairs(
                index, None, id_col, text_col, max_hamming=max_hamming,
                bands=bands, new_sigs=sigs)
            drop = drop.union(cross.select(F.col("new_id").alias(id_col)))
        drop = drop.distinct()
        kept = batch_df.join(drop, id_col, "left_anti")
        kept.write.mode("overwrite").parquet(f"{clean_dir}/batch={epoch_id}")
        sigs.join(drop, id_col, "left_anti") \
            .write.mode("overwrite").parquet(f"{index_dir}/batch={epoch_id}")
        batch_df.unpersist()
        sigs.unpersist()

    stream = spark.readStream.schema(schema_ddl).parquet(input_dir)
    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", str(Path(root) / "_dedup_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_turn_stats(stream_df: DataFrame, ts_col: str = "ts",
                        window: str = "1 hour",
                        watermark: str = "15 minutes",
                        group_col: str | None = "role") -> DataFrame:
    """Watermarked tumbling-window aggregation over an arriving transcript
    stream — the standard Structured Streaming late-data shape: rows later
    than ``watermark`` behind the max event time are dropped, and a window
    finalizes (append mode emits it) once the watermark passes its end.
    All JVM-side (window + count/sum); state is bounded by
    (windows in flight × groups)."""
    src = stream_df.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window).alias("win")]
    if group_col:
        keys.append(F.col(group_col))
    return src.groupBy(*keys).agg(
        F.count("*").alias("n_turns"),
        F.sum(F.octet_length("text")).alias("text_bytes"))


def running_conversation_totals(stream_df: DataFrame,
                                group_col: str = "conv_id") -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState: a
    per-conversation running turn counter that survives across
    micro-batches (the reference has no streaming at all — SURVEY §2.B;
    this is the Spark-native stateful extension). Emits one updated
    (conv_id, turns_seen, last_turn_idx) row per group per batch."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        total, last = state.get if state.exists else (0, -1)
        for pdf in pdf_iter:
            total += len(pdf)
            if len(pdf):
                last = max(last, int(pdf["turn_idx"].max()))
        state.update((total, last))
        yield pd.DataFrame({group_col: [key[0]], "turns_seen": [total],
                            "last_turn_idx": [last]})

    return stream_df.groupBy(group_col).applyInPandasWithState(
        fn,
        outputStructType=f"{group_col} string, turns_seen long, last_turn_idx long",
        stateStructType="turns_seen long, last_turn_idx long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def upsert_stream(spark: SparkSession, input_dir: str, schema_ddl: str,
                  root: str, opts: EncodeOptions = EncodeOptions(),
                  dedup_col: str | None = None,
                  available_now: bool = True):
    """Streaming CDC apply: each micro-batch MERGEs into the committed
    block store (lineage.upsert_checkpointed) keyed by (group_col,
    order_col) — arriving updates replace stored rows via position
    deletes, inserts land as overlay stores, and readers see every
    version through read_snapshot.

    ``dedup_col``: CDC batches often carry several updates to one key;
    pass a sequence column and the LAST write per key (max dedup_col,
    ties broken by nothing — make the sequence unique) is applied, the
    rest dropped before the upsert. Without it the batch must be
    key-unique (duplicate keys would both survive as visible rows).

    Exactly-once across restarts: Spark replays an unacknowledged epoch;
    the replay runs as a FRESH commit whose position deletes mark the
    earlier attempt's overlay rows, so the visible state converges
    (upsert is state-idempotent), and a crashed attempt's partial writes
    stay invisible behind the commit manifest (written last)."""
    from .lineage import upsert_checkpointed

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_checkpointed(batch_df, root, opts, dedup_col=dedup_col)

    stream = spark.readStream.schema(schema_ddl).parquet(input_dir)
    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", str(Path(root) / "_upsert_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
