"""Distributed encode/decode pipeline — the Spark half of the engine.

Stage plan (SURVEY §3, "thread/process/node boundaries"):

1. ONE shuffle: ``repartition(bucket, salt)`` — bucket = hash(conv_id) mod
   num_buckets; salt = turn_idx // salt_span splits hot conversations
   deterministically without a pre-count (AQE does not rebalance
   ``groupBy().applyInPandas`` groups, so skew handling is explicit here).
2. Per group, inside ONE ``applyInPandas`` call: stable sort by
   (conv_id, turn_idx) → fixed-size chunking → per-column stats → codec
   selection → encode → emit one block row per (chunk, column). Steps never
   re-cross the JVM↔Python boundary (the Arrow channel is crossed exactly
   twice: rows in, block rows out).
3. Decode is the mirror image: blocks grouped by (part_key, chunk_id),
   each group pivots its column blocks back into rows.

Everything in the UDFs is vectorized numpy/Arrow — no per-row Python.

Scale notes (100 TB / 1000 executors): num_buckets is the unit of
parallelism — set it to ~2-4× total cores; block rows are a few MB each
(chunk_rows × ~bytes/turn ÷ ratio), so shuffle partitions stay bounded;
the only driver-side data is the lineage summary (one row per partition).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from .codecs import varint
from .selector import codec_name_of, decode_column, encode_column

# (column -> logical kind) for the transcript schema; ints cover int32/64 + timestamp-as-µs
TRANSCRIPT_KINDS = {
    "conv_id": "str",
    "turn_idx": "int",
    "role": "str",
    "text": "str",
    "tool": "str",
    "ts": "ts",  # timestamp ↔ int64 epoch-µs
}

BLOCK_SCHEMA_DDL = (
    "part_key string, chunk_id int, column string, codec string, "
    "count long, null_count long, raw_bytes long, encoded_bytes long, "
    "varint_bytes long, digest string, block binary"
)

DEFAULT_CHUNK_ROWS = 65_536
DEFAULT_SALT_SPAN = 4 * DEFAULT_CHUNK_ROWS


@dataclass(frozen=True)
class EncodeOptions:
    num_buckets: int = 32           # ≈ 2-4× total cores at real scale
    chunk_rows: int = DEFAULT_CHUNK_ROWS
    salt_span: int = DEFAULT_SALT_SPAN  # turns per salt group for hot convs
    order_col: str = "turn_idx"
    group_col: str = "conv_id"


def _to_arrow_int64(series: pd.Series, kind: str) -> pa.Array:
    if kind == "ts":
        return pa.Array.from_pandas(series, type=pa.timestamp("us")).cast(pa.int64())
    return pa.Array.from_pandas(series, type=pa.int64())


def _encode_chunk_rows(pdf: pd.DataFrame, part_key: str, chunk_id: int,
                       kinds: dict[str, str]) -> list[dict]:
    rows = []
    n = len(pdf)
    for col, kind in kinds.items():
        if kind in ("int", "ts"):
            arr = _to_arrow_int64(pdf[col], kind)
            raw_bytes = 8 * n
            dense = arr.drop_null() if arr.null_count else arr
            vb = varint.encoded_size(dense.to_numpy(zero_copy_only=False).astype(np.int64))
            block = encode_column(arr, "int")
        else:
            arr = pa.Array.from_pandas(pdf[col], type=pa.large_utf8())
            lens = pa.compute.binary_length(arr)
            raw_bytes = int(pa.compute.sum(lens).as_py() or 0) + 4 * n  # data + 4B offsets
            vb = raw_bytes  # reference has no string codecs; floor = raw
            block = encode_column(arr, "str")
        rows.append({
            "part_key": part_key,
            "chunk_id": chunk_id,
            "column": col,
            "codec": codec_name_of(block),
            "count": n,
            "null_count": arr.null_count,
            "raw_bytes": raw_bytes,
            "encoded_bytes": len(block),
            "varint_bytes": int(vb),
            "digest": hashlib.sha256(block).hexdigest(),
            "block": block,
        })
    return rows


def make_encode_udf(kinds: dict[str, str], chunk_rows: int, group_col: str, order_col: str):
    """Grouped-map UDF: one (bucket, salt) group of transcript rows ->
    block rows. Defined as a closure so only plain values are captured."""

    def encode_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bucket, salt = int(key[0]), int(key[1])
        part_key = f"{bucket:06d}:{salt:04d}"
        pdf = pdf.sort_values([group_col, order_col], kind="mergesort", ignore_index=True)
        out: list[dict] = []
        for chunk_id, start in enumerate(range(0, len(pdf), chunk_rows)):
            chunk = pdf.iloc[start : start + chunk_rows]
            out.extend(_encode_chunk_rows(chunk, part_key, chunk_id, kinds))
        return pd.DataFrame(out)

    return encode_group


def with_partition_keys(df: DataFrame, opts: EncodeOptions) -> DataFrame:
    """Deterministic partition keys: bucket = pmod(hash(conv_id), B); salt
    splits any conversation longer than salt_span (no pre-count, no extra
    shuffle — cold conversations always get salt 0)."""
    return df.withColumn(
        "_bucket", F.pmod(F.hash(F.col(opts.group_col)), F.lit(opts.num_buckets)).cast("int")
    ).withColumn(
        "_salt", (F.col(opts.order_col).cast("long") / F.lit(opts.salt_span)).cast("int")
    )


def encode_transcripts(df: DataFrame, opts: EncodeOptions = EncodeOptions(),
                       kinds: dict[str, str] | None = None) -> DataFrame:
    """Transcript rows -> encoded block rows (one per chunk × column)."""
    kinds = kinds or {c: TRANSCRIPT_KINDS.get(c, "str") for c in df.columns}
    keyed = with_partition_keys(df, opts)
    fn = make_encode_udf(kinds, opts.chunk_rows, opts.group_col, opts.order_col)
    return keyed.groupBy("_bucket", "_salt").applyInPandas(fn, BLOCK_SCHEMA_DDL)


def make_decode_udf(kinds: dict[str, str], out_ddl_cols: list[str]):
    def decode_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        blocks_by_col = dict(zip(pdf["column"], pdf["block"]))
        data = {}
        for col in out_ddl_cols:
            arr = decode_column(blocks_by_col[col])
            kind = kinds[col]
            if kind == "ts":
                arr = arr.cast(pa.timestamp("us"))
            elif kind == "int":
                pass
            data[col] = arr.to_pandas()
        return pd.DataFrame(data)

    return decode_group


def decode_blocks(blocks: DataFrame, schema_ddl: str, kinds: dict[str, str] | None = None) -> DataFrame:
    """Encoded block rows -> original transcript rows (order-insensitive)."""
    cols = [f.split()[0] for f in schema_ddl.split(",")]
    kinds = kinds or {c: TRANSCRIPT_KINDS.get(c, "str") for c in cols}
    fn = make_decode_udf(kinds, cols)
    return blocks.groupBy("part_key", "chunk_id").applyInPandas(fn, schema_ddl)


def lineage_summary(blocks: DataFrame) -> DataFrame:
    """Per-partition lineage/metrics rows (the engine's ``varintFORMeta``
    analog — SURVEY §1.1): one row per (part_key, column)."""
    return (
        blocks.groupBy("part_key", "column", "codec")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("count").alias("values"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("encoded_bytes").alias("encoded_bytes"),
            F.sum("varint_bytes").alias("varint_bytes"),
            F.sha2(F.concat_ws("", F.sort_array(F.collect_list("digest"))), 256).alias("digest"),
        )
    )
