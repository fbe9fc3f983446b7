"""Deterministic synthetic multi-turn transcript table (FIXTURES.md F1).

Input schema per BASELINE.json input_hint:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``. Conversation lengths are geometric with ``n_hot``
explicitly hot conversations (the skew/salting fixture); roles are
run-biased (RLE/dict path); ts is per-conversation monotonic with 1-60s
deltas (delta codec path, mirroring reference src/varintAdaptiveTest.c:276-287).

Two entry points:

* :func:`generate_pandas` / :func:`generate_spark` — driver-side, for tests.
* :func:`generate_distributed` — Spark-parallel generation in fixed blocks
  of conversations, each block seeded by (seed, block_id), so the data is
  **identical at any parallelism level** (the property the scaling
  benchmark depends on). This is the 10^12-turn-appropriate path: nothing
  materializes on the driver.

Everything inside the generators is vectorized numpy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SEED = 42
ROLES = np.array(["user", "assistant", "system", "tool"], dtype=object)
TOOLS = np.array([""] + [f"tool_{i:02d}" for i in range(12)], dtype=object)
BLOCK = 1000  # conversations per generation block (determinism unit)

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_WORDS: np.ndarray | None = None


def _vocab(k: int = 5000) -> np.ndarray:
    global _WORDS
    if _WORDS is None:
        _WORDS = np.array(
            [hashlib.sha1(f"w{i}".encode()).hexdigest()[: 3 + (i % 9)] for i in range(k)],
            dtype=object,
        )
    return _WORDS


def _gen_for_ids(ids: np.ndarray, rng: np.random.Generator, mean_turns: int,
                 n_hot: int, hot_turns: int, with_text: bool) -> pd.DataFrame:
    """Generate all turns for the given conversation ids (vectorized)."""
    turns = rng.geometric(1 / mean_turns, size=len(ids)).astype(np.int64)
    turns[ids < n_hot] = hot_turns  # conversations 0..n_hot-1 are hot
    n = int(turns.sum())
    conv_ids = np.repeat(np.array([f"conv-{i:08d}" for i in ids], dtype=object), turns)
    starts = np.concatenate([[0], np.cumsum(turns)[:-1]])
    turn_idx = np.arange(n, dtype=np.int64) - np.repeat(starts, turns)

    # run-biased roles: "repeat previous with p=0.55" via switch-point segments
    switch = rng.random(n) >= 0.55
    switch[starts] = True
    role_draws = rng.integers(0, len(ROLES), size=n)
    seg = np.cumsum(switch) - 1
    roles = ROLES[role_draws[seg]]

    tool_idx = np.where(rng.random(n) < 0.8, 0, rng.integers(1, len(TOOLS), size=n))
    tools = TOOLS[tool_idx]

    conv_base = (np.int64(1_767_225_600_000_000)  # 2026-01-01 UTC in µs
                 + rng.integers(0, 30 * 86_400, size=len(ids), dtype=np.int64) * 1_000_000)
    deltas = rng.integers(1_000_000, 60_000_001, size=n, dtype=np.int64)
    deltas[starts] = 0
    grp_cum = np.cumsum(deltas)
    grp_cum -= np.repeat(grp_cum[starts], turns)
    ts = np.repeat(conv_base, turns) + grp_cum

    if with_text:
        vocab = _vocab()
        n_words = np.clip(rng.geometric(1 / 12, size=n), 0, 200)
        word_draws = vocab[rng.integers(0, len(vocab), size=int(n_words.sum()))]
        bounds = np.cumsum(n_words)[:-1]
        texts = np.array([" ".join(w) for w in np.split(word_draws, bounds)], dtype=object)
        if n > 3:
            texts[3] = "héllo wörld — ünïcode ✓ 例文 🙂"
    else:
        texts = np.full(n, "", dtype=object)

    return pd.DataFrame({
        "conv_id": conv_ids,
        "turn_idx": turn_idx.astype(np.int32),
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": pd.Series(ts).astype("datetime64[us]"),
    })


def generate_pandas(n_conversations: int = 1000, seed: int = SEED,
                    mean_turns: int = 20, n_hot: int = 2, hot_turns: int = 20_000,
                    with_text: bool = True) -> pd.DataFrame:
    """Driver-side generation in the same BLOCK units as the distributed
    path, so both produce identical data."""
    parts = []
    for block_start in range(0, n_conversations, BLOCK):
        ids = np.arange(block_start, min(block_start + BLOCK, n_conversations))
        rng = np.random.default_rng([seed, block_start // BLOCK])
        parts.append(_gen_for_ids(ids, rng, mean_turns, n_hot, hot_turns, with_text))
    return pd.concat(parts, ignore_index=True)


def generate_spark(spark, n_conversations: int = 1000, seed: int = SEED, **kw):
    pdf = generate_pandas(n_conversations, seed=seed, **kw)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_DDL)


def generate_distributed(spark, n_conversations: int, seed: int = SEED,
                         mean_turns: int = 20, n_hot: int = 2, hot_turns: int = 20_000,
                         with_text: bool = True):
    """Spark-parallel generation: one grouped-map task per conversation
    block; rng seeded (seed, block_id) → parallelism-independent output."""
    from pyspark.sql import functions as F

    n_blocks = (n_conversations + BLOCK - 1) // BLOCK

    def gen_block(key, pdf: pd.DataFrame) -> pd.DataFrame:
        block_id = int(key[0])
        start = block_id * BLOCK
        ids = np.arange(start, min(start + BLOCK, n_conversations))
        rng = np.random.default_rng([seed, block_id])
        return _gen_for_ids(ids, rng, mean_turns, n_hot, hot_turns, with_text)

    blocks = spark.range(n_blocks).withColumnRenamed("id", "block_id")
    return (
        blocks.repartition(min(n_blocks, 512), "block_id")
        .groupBy("block_id")
        .applyInPandas(gen_block, TRANSCRIPT_DDL)
    )


def from_events(spark, sf_dir: str):
    """Derive a transcript-shaped table from the driver's ``events`` parquet —
    SQL-expressible (see __spark_entry__.oracle_sql) so the DuckDB oracle can
    reproduce it exactly."""
    from pyspark.sql import functions as F, Window as W

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.concat(F.lit("conv-"), F.col("user_id").cast("string")).alias("conv_id"),
            (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
            F.col("event_type").alias("role"),
            F.col("props").alias("text"),
            F.when(F.col("value") > 50, F.col("event_type")).otherwise(F.lit("")).alias("tool"),
            F.col("ts"),
        )
    )
