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
