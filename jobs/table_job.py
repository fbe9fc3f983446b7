"""spark-submit entry point for lakehouse table operations on an
encoded block store (the varint_spark.lineage layer): row-level DELETE,
merge-on-read UPSERT, snapshot/time-travel export, and VACUUM — the
same deployment shape as the encode job::

    spark-submit --py-files dist/varint_spark.zip jobs/table_job.py \\
        delete --root /data/store --filter-col event_type --kind str \\
        --eq click
    spark-submit ... table_job.py upsert --root /data/store \\
        --input new_batch.parquet --group-col user_id --order-col event_id
    spark-submit ... table_job.py snapshot --root /data/store \\
        --schema "event_id long, user_id long, event_type string" \\
        --as-of 3 --output /data/export.parquet
    spark-submit ... table_job.py vacuum --root /data/store [--dry-run]

Every mutating subcommand is a crash-atomic commit (manifest written
last) and prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="varint_spark table operations")
    sub = p.add_subparsers(dest="op", required=True)

    d = sub.add_parser("delete", help="row-level DELETE WHERE (deletion vectors)")
    d.add_argument("--root", required=True)
    d.add_argument("--filter-col", required=True)
    d.add_argument("--kind", default="int64",
                   choices=["int32", "int64", "ts", "tsntz", "str"])
    d.add_argument("--lo", type=int)
    d.add_argument("--hi", type=int)
    d.add_argument("--eq")
    d.add_argument("--prefix")
    d.add_argument("--like")
    d.add_argument("--isin", nargs="+")

    u = sub.add_parser("upsert", help="merge-on-read upsert of a parquet batch")
    u.add_argument("--root", required=True)
    u.add_argument("--input", required=True, help="parquet path of the batch")
    u.add_argument("--group-col", default="conv_id")
    u.add_argument("--order-col", default="turn_idx")
    u.add_argument("--num-buckets", type=int, default=256)
    u.add_argument("--chunk-rows", type=int, default=65_536)
    u.add_argument("--salt-span", type=int, default=262_144)
    u.add_argument("--dedup-col", help="keep only the max-valued row "
                                       "per key within the batch (CDC)")

    s = sub.add_parser("snapshot", help="export a table version to parquet")
    s.add_argument("--root", required=True)
    s.add_argument("--schema", required=True, help="reader DDL")
    s.add_argument("--as-of", type=int, help="commit id (default: latest)")
    s.add_argument("--output", help="parquet path (omit to just count)")

    fl = sub.add_parser("flatten", help="rewrite the MoR table into a "
                                        "fresh single store (no overlays/DVs)")
    fl.add_argument("--root", required=True)
    fl.add_argument("--new-root", required=True)
    fl.add_argument("--schema", required=True, help="reader DDL")
    fl.add_argument("--as-of", type=int)
    fl.add_argument("--group-col", default="conv_id")
    fl.add_argument("--order-col", default="turn_idx")
    fl.add_argument("--num-buckets", type=int, default=256)
    fl.add_argument("--chunk-rows", type=int, default=65_536)
    fl.add_argument("--salt-span", type=int, default=262_144)

    v = sub.add_parser("vacuum", help="GC unreferenced block partitions")
    v.add_argument("--root", required=True)
    v.add_argument("--dry-run", action="store_true")
    v.add_argument("--orphan-overlays", action="store_true",
                   help="also remove crashed-upsert overlays "
                        "(requires no active writer)")

    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"varint_spark_{args.op}").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from varint_spark import lineage
    from varint_spark.engine import EncodeOptions

    t0 = time.time()
    if args.op == "delete":
        summary = lineage.delete_where_checkpointed(
            spark, args.root, args.filter_col, kind=args.kind,
            lo=args.lo, hi=args.hi, eq=args.eq, prefix=args.prefix,
            isin=args.isin, like=args.like)
    elif args.op == "upsert":
        df = spark.read.parquet(args.input)
        opts = EncodeOptions(num_buckets=args.num_buckets,
                             chunk_rows=args.chunk_rows,
                             salt_span=args.salt_span,
                             group_col=args.group_col,
                             order_col=args.order_col)
        summary = lineage.upsert_checkpointed(df, args.root, opts,
                                              dedup_col=args.dedup_col)
    elif args.op == "snapshot":
        snap = lineage.read_snapshot(spark, args.root, args.schema,
                                     as_of=args.as_of)
        if args.output:
            snap.write.mode("overwrite").parquet(args.output)
            snap = spark.read.parquet(args.output)
        summary = {"as_of": args.as_of, "rows": snap.count(),
                   "output": args.output}
    elif args.op == "flatten":
        opts = EncodeOptions(num_buckets=args.num_buckets,
                             chunk_rows=args.chunk_rows,
                             salt_span=args.salt_span,
                             group_col=args.group_col,
                             order_col=args.order_col)
        summary = lineage.flatten_checkpointed(
            spark, args.root, args.new_root, args.schema, opts,
            as_of=args.as_of)
    else:  # vacuum
        summary = lineage.vacuum(spark, args.root, dry_run=args.dry_run,
                                 orphan_overlays=args.orphan_overlays)

    summary["op"] = args.op
    summary["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
