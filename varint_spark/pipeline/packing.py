"""Sequence packing — fill fixed token-budget training bins with
documents, the step between a deduped corpus and a dataloader.

Packing is inherently sequential (each decision depends on the running
fill), so the scalable shape is the same one training pipelines use:
pack WITHIN a shard, shards in parallel. Here a shard is a
``bucket_col`` group (one ``applyInPandas`` task per bucket; the only
shuffle is the bucket groupBy), documents are taken in deterministic
``order_col`` order, and the policy is next-fit: a document that would
overflow the running bin closes it and opens the next. Next-fit wastes
at most one document's worth of tail per bin versus first-fit-decreasing
but preserves corpus order (locality the dataloader wants) and is
deterministic at any parallelism — and, unlike first-fit, it is exactly
replayable in SQL (a recursive CTE), so the driver gate checks per-doc
bin assignments against DuckDB, not just invariants.

A document longer than the budget gets a bin of its own (it must go
somewhere; the caller's tokenizer will truncate it) — the same rule the
recursive oracle applies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def pack_next_fit(df: DataFrame, bucket_col: str, order_col: str,
                  len_col: str, budget: int) -> DataFrame:
    """Per-bucket next-fit packing in ``order_col`` order. Returns one
    row per input row: (order_col, bucket_col, bin) with ``bin``
    0-based per bucket."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    def fn(key, pdf):
        pdf = pdf.sort_values(order_col, ignore_index=True)
        lens = pdf[len_col].to_numpy()
        bins = np.zeros(len(lens), dtype=np.int64)
        if len(lens):
            fill, b = int(lens[0]), 0
            for i in range(1, len(lens)):
                if fill + int(lens[i]) > budget:
                    b += 1
                    fill = int(lens[i])
                else:
                    fill += int(lens[i])
                bins[i] = b
        return pd.DataFrame({order_col: pdf[order_col],
                             bucket_col: pdf[bucket_col],
                             "bin": bins})

    out_schema = ", ".join([
        f"{order_col} long", f"{bucket_col} string", "bin long"])
    return (df.select(bucket_col, order_col, len_col)
            .groupBy(bucket_col).applyInPandas(fn, out_schema))


def pack_stats(df: DataFrame, bucket_col: str, order_col: str,
               len_col: str, budget: int) -> DataFrame:
    """Bin-level audit: (bucket, bin, n_docs, total_len) — total_len ≤
    budget except single-oversized-document bins."""
    from pyspark.sql import functions as F

    packed = pack_next_fit(df, bucket_col, order_col, len_col, budget)
    joined = packed.join(df.select(order_col, len_col), order_col)
    return joined.groupBy(bucket_col, "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum(len_col).alias("total_len"))
