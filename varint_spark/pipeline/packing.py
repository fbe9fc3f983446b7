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
        lens = pdf[len_col].to_numpy().astype(np.int64)
        bins = pack_next_fit_kernel(lens, budget)
        return pd.DataFrame({order_col: pdf[order_col],
                             bucket_col: pdf[bucket_col],
                             "bin": bins})

    # output types follow the INPUT schema — hardcoding long/string here
    # would silently coerce (or break) non-long orders / non-string buckets
    in_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join([
        f"{order_col} {in_types[order_col]}",
        f"{bucket_col} {in_types[bucket_col]}", "bin long"])
    return (df.select(bucket_col, order_col, len_col)
            .groupBy(bucket_col).applyInPandas(fn, out_schema))


def pack_next_fit_kernel(lens: np.ndarray, budget: int) -> np.ndarray:
    """Next-fit bin assignment over one shard's in-order lengths.

    The scan runs per BIN, not per row: from each bin's start ``s`` the
    bin extends to the last index whose running sum stays ≤ budget — one
    ``searchsorted`` on the shard's cumulative-length array — so Python
    iterations = #bins ≈ n/avg-docs-per-bin, not n. Assignments are
    bit-identical to the row-at-a-time scan (the gate fixture digest and
    the equivalence property test pin this): ties at exactly ``budget``
    are kept in-bin (side="right"), zero-length docs after an exactly-full
    bin stay in it, and a document longer than the budget opens a bin of
    its own (e < s clamp)."""
    n = len(lens)
    bins = np.zeros(n, dtype=np.int64)
    if n == 0:
        return bins
    csum = np.cumsum(lens)
    s, b = 0, 0
    while s < n:
        base = int(csum[s - 1]) if s else 0
        e = int(np.searchsorted(csum, base + budget, side="right")) - 1
        if e < s:
            e = s  # oversized document: a bin of its own
        bins[s:e + 1] = b
        s, b = e + 1, b + 1
    return bins


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
