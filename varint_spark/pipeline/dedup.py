"""Deduplication operators over a document table.

* :func:`exact_dedup` — hash-groupBy, pure DataFrame ops (one shuffle on
  the hash; Catalyst handles partial aggregation map-side).
* :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — shingle →
  minhash → band → bucket-join. Signatures are computed in a vectorized
  Arrow UDF (numpy universal hashing); the band bucket-join is a plain
  self-join on (band, bucket) — broadcast-free, scales with shuffle.
* :func:`simhash` — 64-bit SimHash over token hashes.
* :func:`ngram_jaccard_pairs` — exact Jaccard over character n-grams for
  candidate pairs (verification stage after LSH).

All hashing is deterministic (fixed seeds) so results are stable across
parallelism levels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F, Window as W

MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Mark duplicates: first occurrence (lowest id) per key wins.
    Returns df + ``dup_rank`` (0 = keeper) — one shuffle on the key."""
    w = W.partitionBy(*key_cols).orderBy(id_col)
    return df.withColumn("dup_rank", F.row_number().over(w) - 1)


def _shingle_hashes(texts: pd.Series, width: int) -> list[np.ndarray]:
    """Per text: uint64 hashes of its character ``width``-shingles
    (vectorized rolling polynomial hash over the byte plane)."""
    out = []
    base = np.uint64(1099511628211)
    for t in texts:
        b = np.frombuffer(t.encode("utf-8", "surrogatepass"), dtype=np.uint8)
        if len(b) < width:
            out.append(np.zeros(1, dtype=np.uint64) if len(b) == 0
                       else np.array([b.astype(np.uint64).sum()], dtype=np.uint64))
            continue
        h = np.zeros(len(b) - width + 1, dtype=np.uint64)
        for k in range(width):  # width is small (5): 5 vector ops, not per-row
            h = h * base + b[k : len(b) - width + 1 + k].astype(np.uint64)
        out.append(np.unique(h))
    return out


def make_minhash_udf(num_hashes: int, shingle_width: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)

    def udf(iterator):
        for batch in iterator:
            tbl = batch if isinstance(batch, pa.RecordBatch) else batch
            texts = tbl.column("text").to_pandas()
            ids = tbl.column("_mh_id")
            sigs = []
            for hashes in _shingle_hashes(texts, shingle_width):
                # universal hashing family: (a*x + b) mod p, min per row
                vals = (a[:, None] * hashes[None, :] + b[:, None]) % np.uint64(MERSENNE)
                sigs.append(vals.min(axis=1).astype(np.int64))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(sigs, type=pa.list_(pa.int64()))],
                names=["_mh_id", "signature"],
            )

    return udf


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_hashes: int = 64, shingle_width: int = 5) -> DataFrame:
    """(id, signature array<long>) per document."""
    src = df.select(F.col(id_col).alias("_mh_id"), F.col(text_col).alias("text"))
    udf = make_minhash_udf(num_hashes, shingle_width)
    out = src.mapInArrow(udf, "_mh_id long, signature array<long>")
    return out.withColumnRenamed("_mh_id", id_col)


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      num_hashes: int = 64, bands: int = 16,
                      shingle_width: int = 5,
                      max_bucket_size: int = 10_000) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH: documents sharing any
    band bucket. Returns (id_a, id_b) with id_a < id_b, distinct.

    ``max_bucket_size`` drops degenerate buckets (e.g. empty-text hash
    collisions) whose self-join would be quadratic — the standard LSH
    skew guard at corpus scale; near-dup pairs inside a dropped bucket
    are still found through their other ``bands - 1`` bands."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_width)
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.hash(F.slice(F.col("signature"),
                                         i * rows_per_band + 1, rows_per_band)),
            )
        ).alias("band", "bucket"),
    )
    w = W.partitionBy("band", "bucket")
    banded = banded.withColumn("_bsz", F.count("*").over(w)) \
        .filter(F.col("_bsz") <= max_bucket_size).drop("_bsz")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(right, (F.col("l.band") == F.col("r.band"))
                  & (F.col("l.bucket") == F.col("r.bucket"))
                  & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash from whitespace-token hashes — pure DataFrame ops:
    explode tokens, sum signed bit contributions, reassemble the sign bits."""
    tokens = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    th = tokens.withColumn("h", F.xxhash64("tok"))
    bits = th.select(
        id_col,
        *[
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1).alias(f"b{i}")
            for i in range(64)
        ],
    )
    agg = bits.groupBy(id_col).agg(*[F.sum(f"b{i}").alias(f"b{i}") for i in range(64)])
    sim = agg.select(
        id_col,
        sum(
            (F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long") * F.lit(1 << i) if i < 63
             else F.when(F.col(f"b{i}") > 0, F.lit(-(1 << 63))).otherwise(F.lit(0)).cast("long"))
            for i in range(64)
        ).alias("simhash"),
    )
    return sim


def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame, id_col: str, text_col: str,
                        shingle_width: int = 5, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (LSH verification stage).
    Joins texts to pairs (two shuffles), computes Jaccard in an Arrow UDF."""
    docs = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    joined = (
        pairs.join(docs.withColumnRenamed("_id", "id_a").withColumnRenamed("_text", "text_a"), "id_a")
        .join(docs.withColumnRenamed("_id", "id_b").withColumnRenamed("_text", "text_b"), "id_b")
    )

    def udf(iterator):
        for tbl in iterator:
            ta = tbl.column("text_a").to_pandas()
            tb = tbl.column("text_b").to_pandas()
            ha = _shingle_hashes(ta, shingle_width)
            hb = _shingle_hashes(tb, shingle_width)
            jac = np.array([
                len(np.intersect1d(x, y, assume_unique=True))
                / max(len(np.union1d(x, y)), 1)
                for x, y in zip(ha, hb)
            ])
            yield pa.RecordBatch.from_arrays(
                [tbl.column("id_a"), tbl.column("id_b"), pa.array(jac, type=pa.float64())],
                names=["id_a", "id_b", "jaccard"],
            )

    out = joined.mapInArrow(udf, "id_a long, id_b long, jaccard double")
    return out.filter(F.col("jaccard") >= threshold)
