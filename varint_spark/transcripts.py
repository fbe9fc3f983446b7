"""Deterministic synthetic multi-turn transcript table (FIXTURES.md F1).

Input schema per BASELINE.json input_hint:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``. Zipf-ish conversation lengths produce hot conversations
(the skew/salting path); roles are run-biased (RLE/dict path); ts is
per-conversation monotonic with 1-60s deltas (delta codec path,
mirroring reference src/varintAdaptiveTest.c:276-287).

Generation is vectorized numpy → Arrow → Spark (no per-row Python in the
Spark path; the pandas construction happens once on the driver for tests /
bench only — at real scale the input is an existing Iceberg/parquet table).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

SEED = 42
ROLES = np.array(["user", "assistant", "system", "tool"], dtype=object)
TOOLS = np.array([""] + [f"tool_{i:02d}" for i in range(12)], dtype=object)


def _vocab(k: int = 5000) -> np.ndarray:
    return np.array(
        [hashlib.sha1(f"w{i}".encode()).hexdigest()[: 3 + (i % 9)] for i in range(k)],
        dtype=object,
    )


def generate_pandas(n_conversations: int = 1000, seed: int = SEED,
                    mean_turns: int = 20, n_hot: int = 2, hot_turns: int = 20_000,
                    with_text: bool = True) -> pd.DataFrame:
    """Deterministic transcript table as pandas (driver-side).

    ``n_hot`` conversations get ``hot_turns`` turns each — the skew/salting
    fixture (one conv_id ≫ others)."""
    rng = np.random.default_rng(seed)
    turns = rng.geometric(1 / mean_turns, size=n_conversations).astype(np.int64)
    hot = rng.choice(n_conversations, size=min(n_hot, n_conversations), replace=False)
    turns[hot] = hot_turns
    n = int(turns.sum())
    conv_ids = np.repeat(np.array([f"conv-{i:08d}" for i in range(n_conversations)], dtype=object), turns)
    starts = np.concatenate([[0], np.cumsum(turns)[:-1]])
    turn_idx = np.arange(n, dtype=np.int64) - np.repeat(starts, turns)

    # run-biased roles: vectorized "repeat previous with p=0.55" via run segmentation
    switch = rng.random(n) >= 0.55
    switch[starts] = True  # each conversation starts a fresh draw
    role_draws = rng.integers(0, len(ROLES), size=n)
    seg = np.cumsum(switch) - 1  # ordinal of the governing switch per row
    roles = ROLES[role_draws[seg]]

    tool_idx = np.where(rng.random(n) < 0.8, 0, rng.integers(1, len(TOOLS), size=n))
    tools = TOOLS[tool_idx]

    # per-conversation monotonic ts: base + cumulative 1-60s deltas (µs)
    conv_base = (np.int64(1_767_225_600_000_000)  # 2026-01-01 UTC in µs
                 + (rng.integers(0, 30 * 86_400, size=n_conversations, dtype=np.int64) * 1_000_000))
    deltas = rng.integers(1_000_000, 60_000_001, size=n, dtype=np.int64)
    deltas[starts] = 0
    grp_cum = np.cumsum(deltas)
    grp_cum -= np.repeat(grp_cum[starts], turns)
    ts = np.repeat(conv_base, turns) + grp_cum

    if with_text:
        vocab = _vocab()
        n_words = np.clip(rng.geometric(1 / 12, size=n), 0, 200)
        total_words = int(n_words.sum())
        word_draws = vocab[rng.integers(0, len(vocab), size=total_words)]
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


TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def generate_spark(spark, n_conversations: int = 1000, seed: int = SEED, **kw):
    """Transcript table as a Spark DataFrame (Arrow-path createDataFrame)."""
    pdf = generate_pandas(n_conversations, seed=seed, **kw)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_DDL)


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
