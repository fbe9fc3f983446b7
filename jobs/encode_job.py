"""spark-submit entry point for the encode job.

North-rule deployment shape: ``spark-submit --py-files varint_spark.zip
jobs/encode_job.py --input <table-or-parquet> --output <root> ...`` on a
multi-executor cluster. Locally::

    python scripts/make_pyfiles_zip.py           # builds dist/varint_spark.zip
    spark-submit --master local[32] \\
        --py-files dist/varint_spark.zip \\
        jobs/encode_job.py \\
        --input /root/testdata/sf0.01/events.parquet \\
        --group-col user_id --order-col event_id \\
        --output /tmp/varint_out

The job is resumable: re-running with the same --output skips partitions
already committed to lineage (see varint_spark.lineage).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="varint_spark encode job")
    p.add_argument("--input", required=True, help="parquet path or iceberg table name")
    p.add_argument("--output", required=True, help="checkpoint root (blocks/ + lineage/)")
    p.add_argument("--group-col", default="conv_id")
    p.add_argument("--order-col", default="turn_idx")
    p.add_argument("--num-buckets", type=int, default=256)
    p.add_argument("--chunk-rows", type=int, default=65_536)
    p.add_argument("--salt-span", type=int, default=262_144)
    p.add_argument("--shared-tables", action="store_true",
                   help="build + broadcast global dict/FSST tables first")
    p.add_argument("--verify", action="store_true",
                   help="decode everything back and compare row counts")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    # under spark-submit the session is provided by the launcher config;
    # getOrCreate picks it up (master/memory come from the submit command)
    spark = SparkSession.builder.appName("varint_spark_encode").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from varint_spark.engine import EncodeOptions, decode_blocks, kinds_for_schema
    from varint_spark.lineage import encode_checkpointed, read_blocks
    from varint_spark.shared import build_shared_tables

    if args.input.endswith(".parquet") or "/" in args.input:
        df = spark.read.parquet(args.input)
    else:
        df = spark.table(args.input)  # iceberg/catalog table if configured

    opts = EncodeOptions(num_buckets=args.num_buckets, chunk_rows=args.chunk_rows,
                         salt_span=args.salt_span, group_col=args.group_col,
                         order_col=args.order_col)
    shared = None
    if args.shared_tables:
        shared = spark.sparkContext.broadcast(build_shared_tables(df))

    t0 = time.time()
    summary = encode_checkpointed(df, args.output, opts, shared=shared)
    summary["wall_sec"] = round(time.time() - t0, 2)

    if args.verify:
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        kinds = kinds_for_schema(df.schema)
        n_in = df.count()
        n_out = decode_blocks(read_blocks(spark, args.output).drop("pk"), ddl,
                              kinds=kinds, shared=shared).count()
        summary["rows_in"] = n_in
        summary["rows_decoded"] = n_out
        summary["verified"] = n_in == n_out

    print(json.dumps(summary))
    return 0 if summary.get("verified", True) else 1


if __name__ == "__main__":
    sys.exit(main())
