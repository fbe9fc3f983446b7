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
