"""Shared (broadcast) symbol tables — global dict + FSST tables built from
a sampling pass and shipped to every executor.

Reference analog: reusable pre-built dictionaries
(``varintDictEncodeWithDict``, reference src/varintDict.h:72-76) — build
the table once, reuse across chunks. At 10^12-turn scale this avoids
re-learning the same 4-role dictionary and the same text symbol table in
every chunk, and removes FSST *training* (the encode hot spot) from the
per-chunk path.

Flow::

    shared = build_shared_tables(df)             # one sampling job
    bc = spark.sparkContext.broadcast(shared)    # executors get it once
    encode_transcripts(df, opts, shared=bc)      # chunks reuse the tables
    decode_blocks(blocks, ddl, shared=bc)

Blocks encoded with shared tables carry codec ids DICT_STR_SHARED /
FSST_STR_SHARED and the table content digest, so decode verifies it is
using the same tables that encoded the block.
"""

from __future__ import annotations

import hashlib
import pickle
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from .codecs import fsst

MAX_SHARED_DICT = 65_536   # full-distinct columns only (role/tool class)
SAMPLE_BYTES = 1 << 20     # ~1 MB text sample per column for FSST training


@dataclass
class SharedTables:
    """Per-column shared tables. ``dicts``: sorted unique values (complete —
    built from a full distinct, so chunk lookups never miss).
    ``fsst_tables``: serialized FSST round tables trained on a sample."""
    dicts: dict[str, list[str]] = field(default_factory=dict)
    fsst_tables: dict[str, bytes] = field(default_factory=dict)

    def digest(self) -> str:
        payload = pickle.dumps((sorted(self.dicts.items()), sorted(self.fsst_tables.items())))
        return hashlib.sha256(payload).hexdigest()[:16]

    def dict_array(self, col: str) -> pa.Array:
        return pa.array(self.dicts[col], type=pa.large_utf8())


def build_shared_tables(df: DataFrame, str_cols: list[str] | None = None,
                        max_dict: int = MAX_SHARED_DICT) -> SharedTables:
    """One Spark job: approx-distinct gate -> exact distinct collect for
    low-cardinality string columns; driver-side FSST training on a text
    sample for the rest. All driver data is bounded (max_dict values /
    SAMPLE_BYTES bytes per column)."""
    from .engine import kinds_for_schema

    kinds = kinds_for_schema(df.schema)
    str_cols = str_cols or [c for c, k in kinds.items() if k == "str"]
    if not str_cols:
        return SharedTables()

    approx = df.agg(*[F.approx_count_distinct(c).alias(c) for c in str_cols]).collect()[0]
    shared = SharedTables()
    for col in str_cols:
        if approx[col] <= max_dict * 0.8:  # approx error margin
            vals = [r[0] for r in df.select(col).distinct().dropna().collect()]
            if len(vals) <= max_dict:
                shared.dicts[col] = sorted(vals)
                continue
        # high-cardinality: train FSST on a bounded sample taken as the
        # 4000 smallest value-hashes — TakeOrdered (distributed top-k, no
        # full sort), spread uniformly across the corpus (a hash order is
        # a shuffle), and a pure function of the VALUES, so the broadcast
        # tables — and every block encoded against them — stay
        # deterministic at any partitioning. (ADVICE r2: the previous
        # sample().limit() still took a partition-prefix slice because
        # limit short-circuits the earliest partitions.)
        sample_rows = (df.select(col).dropna()
                       .orderBy(F.xxhash64(col, F.lit(7)))
                       .limit(4000).collect())
        corpus = " ".join(r[0] for r in sample_rows).encode("utf-8", "surrogatepass")
        corpus = corpus[:SAMPLE_BYTES]
        tables = fsst.train(np.frombuffer(corpus, dtype=np.uint8))
        if tables is not None:
            shared.fsst_tables[col] = tables
    return shared
