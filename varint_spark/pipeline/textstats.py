"""Text analysis operators — language-ID, quality scoring, token counting,
document fingerprinting. All JVM-side built-in functions except the
rolling-hash fingerprint (vectorized Arrow UDF).
"""

from __future__ import annotations

import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from . import textkernels

STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]


# GPT-2-style pretokenizer shape: contractions, letter runs, digit runs,
# punctuation runs, whitespace-prefixed words (public regex family)
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """n_chars / n_tokens / avg token length — whitespace tokenization plus
    BPE-ish counts: a GPT-style pretokenizer regex and the len/4 heuristic."""
    t = F.col(text_col)
    toks = F.filter(F.split(t, r"\s+"), lambda x: F.length(x) > 0)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        (F.length(t) / F.greatest(F.size(toks), F.lit(1))).alias("avg_tok_len"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_PRETOKEN_RE), 0)).alias("n_bpe_pretokens"),
        F.ceil(F.length(t) / 4).cast("long").alias("n_subword_est"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features: length band, punctuation ratio, stopword
    ratio, uppercase ratio — the standard pretraining-filter features."""
    t = F.col(text_col)
    toks = F.filter(F.split(F.lower(t), r"\s+"), lambda x: F.length(x) > 0)
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_upper = F.length(t) - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    n_chars = F.greatest(F.length(t), F.lit(1))
    return df.select(
        F.col(id_col),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        F.round(n_upper / n_chars, 6).alias("upper_ratio"),
        F.round(n_stop / n_tokens, 6).alias("stopword_ratio"),
        F.when(F.length(t).between(200, 20_000), 1.0).otherwise(0.0).alias("len_ok"),
    )


# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "is", "of"],
    "de": ["der", "und", "die", "nicht"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "la", "los", "que"],
}


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-profile language ID: argmax of per-language marker hits.
    Ties and no-hits -> 'und' (undetermined)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: F.length(x) > 0)
    scores = [
        F.size(F.filter(toks, lambda x: F.array_contains(
            F.array(*[F.lit(m) for m in markers]), x))).alias(f"s_{lang}")
        for lang, markers in _LANG_MARKERS.items()
    ]
    scored = df.select(F.col(id_col), *scores)
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    pick = F.when(best == 0, F.lit("und"))
    for lg in langs:  # first language reaching the max wins (stable)
        pick = pick.when(F.col(f"s_{lg}") == best, F.lit(lg))
    return scored.select(id_col, pick.alias("lang_pred"),
                         *[F.col(f"s_{lg}") for lg in langs])


def vocab_top_tokens(df: DataFrame, text_col: str, k: int = 1000) -> DataFrame:
    """Corpus token frequencies, top-k — the vocabulary-building pass a
    BPE/tokenizer pipeline runs first. Scale shape: one mapInArrow pass
    produces PARTIAL counts per batch (Arrow split_whitespace +
    value_counts — no Python per token), so the shuffle carries one row
    per DISTINCT token per partition, never the raw token stream; the
    groupBy then sums partials (map-side combine on top). Deterministic
    order: count desc, then token."""
    import pyarrow as pa_mod
    import pyarrow.compute as pc

    def udf(iterator):
        for tbl in iterator:
            toks = pc.list_flatten(
                pc.utf8_split_whitespace(tbl.column(text_col)))
            toks = toks.filter(pc.greater(pc.utf8_length(toks), 0))
            vc = toks.value_counts()
            yield pa_mod.RecordBatch.from_arrays(
                [vc.field("values"), vc.field("counts")],
                names=["token", "cnt"])

    partials = df.select(text_col).mapInArrow(udf, "token string, cnt long")
    return (partials.groupBy("token").agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("token")).limit(k))


def make_fingerprint_udf(id_name: str, text_name: str, window: int = 16,
                         portable: bool = False):
    """Winnowing-style fingerprint: min rolling hash over each document
    (one int64 per doc) — corpus-plane kernel, no per-document Python
    (varint_spark.pipeline.textkernels).

    ``portable=True`` switches to the mod-(2^31-1) polynomial hash that
    ANSI SQL can reproduce exactly (codepoint-based; identical to the
    byte-based kernel on ASCII text) — used by the driver query so the
    DuckDB oracle can recompute fingerprints. Default stays the 64-bit
    FNV-base hash (stronger; collision odds ~2^-64 per pair)."""

    def udf(iterator):
        for tbl in iterator:
            plane, offs = textkernels.arrow_plane(tbl.column(text_name))
            if portable:
                fps = textkernels.portable_window_min(plane, offs, window)
            else:
                fps = textkernels.fingerprint_per_doc(plane, offs, window)
            yield pa.RecordBatch.from_arrays(
                [tbl.column(id_name), pa.array(fps, type=pa.int64())],
                names=[id_name, "fingerprint"],
            )

    return udf


def fingerprints(df: DataFrame, id_col: str, text_col: str, window: int = 16,
                 portable: bool = False) -> DataFrame:
    src = df.select(id_col, text_col)
    return src.mapInArrow(make_fingerprint_udf(id_col, text_col, window, portable),
                          f"{id_col} long, fingerprint long")
