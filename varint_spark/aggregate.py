"""Aggregate pushdown over the block store — COUNT/MIN/MAX/SUM/AVG
answered from lineage metadata, without decoding (or even reading) any
encoded payload.

Every block row already carries the aggregate state a scan would
recompute: ``count``/``null_count`` (exact row and null tallies),
``min_val``/``max_val`` (the zone-map stats that drive chunk pruning)
and, since r6, ``sum_val`` — the chunk's exact int64-domain sum
(``engine._exact_sum``; the 32-bit-halves trick keeps it overflow-exact,
storing NULL when the true sum leaves int64). So ``SELECT count(*),
min(x), max(x), sum(x), avg(x)`` over a 100-TB table collapses to an
aggregation over the CHUNK-count metadata rows — the parquet scan of the
blocks table projects only the stat columns, and the multi-GB ``block``
payloads never leave disk (tests/test_aggregate.py pins ``block`` out of
the scan's ReadSchema). This is the same design as Iceberg manifests /
parquet footer stats, expressed over the engine's own lineage.

Two entry points:

* :func:`aggregate_blocks_meta` — metadata-only, one tiny scan, never
  touches payloads. Honest about completeness: ``sum_val`` is NULL (and
  ``n_sum_missing`` > 0) when some chunk's sum overflowed int64.
* :func:`aggregate_blocks` — exact hybrid: metadata for every chunk that
  has a stored sum, decode-and-sum for the (rare) overflow chunks only,
  per column. The decode branch reads payloads solely for those chunks.

All values are the engine's int64 zone domain (epoch-µs for ts kinds);
``avg_val`` is derived as sum / non-null count in double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .engine import decode_blocks

_KIND_DDL = {"int64": "bigint", "int32": "int",
             "ts": "timestamp", "tsntz": "timestamp_ntz"}

_OUT_DDL = ("column string, n_rows long, n_nonnull long, min_val long, "
            "max_val long, sum_val long, avg_val double, n_sum_missing long")


def _meta_stats(blocks: DataFrame, columns: list[str]) -> DataFrame:
    meta = blocks.filter(F.col("column").isin(list(columns)))
    # a chunk contributes to the sum iff it has non-null values; its
    # stored sum is missing only on int64 overflow (engine._exact_sum)
    missing = (F.col("sum_val").isNull()
               & (F.col("count") > F.col("null_count"))).cast("long")
    return meta.groupBy("column").agg(
        F.sum("count").alias("n_rows"),
        (F.sum("count") - F.sum("null_count")).alias("n_nonnull"),
        F.min("min_val").alias("min_val"),
        F.max("max_val").alias("max_val"),
        F.sum("sum_val").alias("_sum_meta"),
        F.sum(missing).alias("n_sum_missing"))


def _finish(stats: DataFrame, sum_expr) -> DataFrame:
    total = F.when(F.col("n_nonnull") > 0, sum_expr)
    return stats.select(
        "column", "n_rows", "n_nonnull", "min_val", "max_val",
        total.alias("sum_val"),
        (total.cast("double") / F.col("n_nonnull")).alias("avg_val"),
        "n_sum_missing")


def aggregate_blocks_meta(blocks: DataFrame,
                          columns: list[str]) -> DataFrame:
    """Metadata-only aggregates: one row per column with n_rows,
    n_nonnull, min/max/sum/avg — computed purely from the lineage stat
    columns (no ``block`` bytes read; plan-tested). ``sum_val`` is NULL
    when any contributing chunk lacks a stored sum (``n_sum_missing``
    says how many) — use :func:`aggregate_blocks` for the exact hybrid."""
    ok = F.when(F.col("n_sum_missing") == 0, F.col("_sum_meta"))
    return _finish(_meta_stats(blocks, columns), ok)


def aggregate_blocks(blocks: DataFrame, columns: list[str],
                     kinds: dict[str, str]) -> DataFrame:
    """Exact hybrid aggregates: metadata sums where stored, decode-and-sum
    for overflow chunks only. The decode branch filters the blocks scan to
    ``sum_val IS NULL`` chunks of each column — on healthy data that
    branch is empty and everything stays metadata-sized. ``kinds`` maps
    each column to its engine kind ('int64'/'int32'/'ts'/'tsntz')."""
    stats = _meta_stats(blocks, columns)
    fallbacks = []
    for c in columns:  # driver loop over column NAMES (schema-sized)
        kind = kinds[c]
        mc = blocks.filter((F.col("column") == c) & F.col("sum_val").isNull()
                           & (F.col("count") > F.col("null_count")))
        dec = decode_blocks(mc, f"{c} {_KIND_DDL[kind]}", kinds={c: kind})
        v = F.col(c)
        if kind in ("ts", "tsntz"):
            v = F.unix_micros(F.to_timestamp(c))  # the zone int64 domain
        fallbacks.append(dec.agg(F.sum(v).alias("_sum_fb"))
                         .withColumn("column", F.lit(c)))
    fb = fallbacks[0]
    for f_ in fallbacks[1:]:
        fb = fb.unionByName(f_)
    joined = stats.join(fb, "column", "left")
    exact = (F.coalesce(F.col("_sum_meta"), F.lit(0))
             + F.coalesce(F.col("_sum_fb"), F.lit(0)))
    return _finish(joined, exact)
