"""Inverted text index — token → doc-id posting lists as the engine's
OWN Roaring-style bitmaps, queried on the serialized form.

This is the classic search-index marriage of the two halves of this
repo: the text pipeline supplies tokenization, the bitmap codec supplies
postings (reference set algebra varintBitmapAnd/Or,
src/varintBitmap.c:442-528). Build cost is the canonical one explode +
one shuffle (restrict with ``vocab`` to index a term subset and the
filter runs BEFORE the shuffle); the distributed partial-bitmap merge is
``varint_spark.bitmap_index`` (no id set ever reaches the driver during
the BUILD). A conjunctive QUERY touches exactly ``len(tokens)`` posting
rows — query-literal-sized — and ANDs their serialized containers; one
posting bitmap is bounded by n_docs/8 bytes (125 MB at 10⁹ docs), the
same head-node budget every posting-list searcher carries. The RESULT is
never materialized on the driver either: the folded bitmap is sharded at
64Ki-block container boundaries and decoded executor-side
(_ids_dataframe), so a low-selectivity query over 10⁹ docs hands the
driver only serialized containers, never Python id tuples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..codecs import bitmap
from ..bitmap_index import build_bitmaps

TOKEN_SPLIT = r"\s+"  # the pipeline-wide whitespace tokenization


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col(text_col), TOKEN_SPLIT),
                         lambda t: F.length(t) > 0))).alias("token"))


def build_token_postings(df: DataFrame, id_col: str, text_col: str,
                         vocab: list[str] | None = None) -> DataFrame:
    """(token, posting) rows — ``posting`` is the serialized bitmap of
    the ids of every document containing the token at least once."""
    toks = _tokens(df, id_col, text_col)
    if vocab is not None:
        toks = toks.filter(F.col("token").isin(list(vocab)))
    return build_bitmaps(toks, "token", id_col) \
        .withColumnRenamed("bitmap", "posting")


def _ids_dataframe(spark: SparkSession, acc: bytes) -> DataFrame:
    """Final serialized bitmap -> one-column ``doc_id`` DataFrame with the
    ids BORN DISTRIBUTED: the driver only range-shards the serialized form
    at 64Ki-block container boundaries (bitmap.shard_serialized — payloads
    never decoded driver-side, total bytes bounded by ~n_docs/8), and each
    container decodes executor-side inside mapInArrow. No Python id list
    proportional to the RESULT cardinality ever exists on the driver."""
    shards = list(bitmap.shard_serialized(acc))
    if not shards:
        return spark.createDataFrame([], "doc_id long")
    df = spark.createDataFrame(shards, "block_key long, container binary")
    par = spark.sparkContext.defaultParallelism
    if len(shards) > 1:
        df = df.repartition(min(len(shards), par))

    def gen(batches):
        import numpy as np
        import pyarrow as pa
        from varint_spark.codecs import bitmap as bm
        for batch in batches:
            keys = batch.column("block_key").to_numpy()
            for key, cont in zip(keys, batch.column("container")):
                lows = bm.decode_shard(cont.as_py())
                ids = (np.int64(key) << np.int64(16)) | lows.astype(np.int64)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(ids, type=pa.int64())], ["doc_id"])

    return df.mapInArrow(gen, "doc_id long")


def search_all_terms(spark: SparkSession, postings: DataFrame,
                     tokens: list[str]) -> DataFrame:
    """Documents containing ALL ``tokens``: AND-fold of the serialized
    posting bitmaps (container-level — one-sided containers skip without
    decoding), then the final intersection is decoded EXECUTOR-side
    (_ids_dataframe). A term absent from the index short-circuits to the
    empty result, like any conjunctive query planner."""
    want = list(dict.fromkeys(tokens))
    if not want:
        raise ValueError("empty query: need at least one token")
    rows = postings.filter(F.col("token").isin(want)) \
        .select("token", "posting").collect()
    by_tok = {r.token: bytes(r.posting) for r in rows}
    if len(by_tok) < len(want):
        return spark.createDataFrame([], "doc_id long")
    # fold smallest-first: the intersection can only shrink, so every
    # later AND runs against the smallest serialized operand
    ordered = sorted((by_tok[t] for t in want), key=len)
    acc = ordered[0]
    for b in ordered[1:]:
        acc = bitmap.bitmap_and(acc, b)
    return _ids_dataframe(spark, acc)


def search_boolean(spark: SparkSession, postings: DataFrame,
                   all_of: list[str] | None = None,
                   any_of: list[str] | None = None,
                   none_of: list[str] | None = None) -> DataFrame:
    """Full boolean retrieval on the serialized postings — the three
    container-level operators the reference exposes (varintBitmapAnd/Or/
    AndNot, src/varintBitmap.c:442-528) composed the way every boolean
    search engine does: ``(AND all_of) ∩ (OR any_of) \\ (OR none_of)``.
    At least one positive clause (all_of/any_of) is required — a bare
    NOT has no finite universe in an inverted index."""
    all_of, any_of, none_of = all_of or [], any_of or [], none_of or []
    if not all_of and not any_of:
        raise ValueError("need at least one positive clause (all_of/any_of)")
    need = list(dict.fromkeys([*all_of, *any_of, *none_of]))
    rows = postings.filter(F.col("token").isin(need)) \
        .select("token", "posting").collect()
    by_tok = {r.token: bytes(r.posting) for r in rows}
    out_ddl = "doc_id long"
    if any(t not in by_tok for t in all_of):
        return spark.createDataFrame([], out_ddl)  # conjunct absent -> empty

    def union(tokens):
        blobs = [by_tok[t] for t in tokens if t in by_tok]
        if not blobs:
            return None
        acc = blobs[0]
        for b in blobs[1:]:
            acc = bitmap.bitmap_or(acc, b)
        return acc

    acc = None
    for t in sorted(all_of, key=lambda t: len(by_tok[t])):
        acc = by_tok[t] if acc is None else bitmap.bitmap_and(acc, by_tok[t])
    if any_of:
        u = union(any_of)
        if u is None:
            return spark.createDataFrame([], out_ddl)
        acc = u if acc is None else bitmap.bitmap_and(acc, u)
    neg = union(none_of)
    if neg is not None:
        acc = bitmap.bitmap_andnot(acc, neg)
    return _ids_dataframe(spark, acc)
