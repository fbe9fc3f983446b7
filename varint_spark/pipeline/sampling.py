"""Deterministic corpus sampling — stratified rates and mixture
re-weighting, the step that turns a raw crawl into a training mix.

Why hash-threshold instead of ``df.sample``: reproducibility across
runs, partitionings, AND engines. A row's fate depends only on its own
id — resuming, re-running at different parallelism, or auditing in a
different engine keeps the exact same sample. Embarrassingly parallel:
no shuffle, no RNG state, the filter pushes to the scan.

Two hash modes (the simhash precedent): ``xxhash64`` for production
(Spark's JVM hash, 64-bit mix), ``portable`` for oracle-checkable runs —
a modular affine fold any SQL engine reproduces term by term
(``(id % 1000003) * 4099 + seed) % 1000000``; weaker mixing, fine for
rate control, and the driver gate pins Spark == DuckDB on it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_DENOM = 1_000_000
_PRIME = 1_000_003


def _bucket(id_col: str, seed: int, hash_mode: str) -> Column:
    """Uniform bucket in [0, 1e6) from the row id alone."""
    if hash_mode == "xxhash64":
        return F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(_DENOM))
    if hash_mode == "portable":
        # pmod, not % (sign-of-dividend): a negative id under plain % gave
        # a negative bucket that passed every `b < threshold` filter — the
        # row was ALWAYS kept regardless of fraction. pmod keeps the inner
        # residue in [0, PRIME) so the affine fold stays nonnegative and
        # the outer mod lands in [0, DENOM) like the xxhash64 mode. For
        # nonnegative ids this is bit-identical to the old expression, so
        # `%`-based SQL oracles on nonnegative-id tables still match.
        return F.pmod(F.pmod(F.col(id_col), _PRIME) * 4099 + seed, _DENOM)
    raise ValueError(f"unknown hash_mode: {hash_mode!r}")


def stratified_sample(df: DataFrame, strata_col: str, id_col: str,
                      fractions: dict[str, float] | float,
                      seed: int = 42,
                      hash_mode: str = "xxhash64") -> DataFrame:
    """Keep each row iff its id-hash bucket falls under its stratum's
    fraction — per-stratum rates from a dict (strata absent from the
    dict are DROPPED, which is the mixture-reweighting semantics:
    unlisted sources are excluded), or one global float for a plain
    deterministic sample."""
    b = _bucket(id_col, seed, hash_mode)
    if isinstance(fractions, dict):
        # chained CASE: stratum -> threshold, unlisted -> NULL (dropped)
        thr = F.lit(None).cast("long")
        for stratum, frac in sorted(fractions.items()):
            thr = F.when(F.col(strata_col) == stratum,
                         F.lit(int(frac * _DENOM))).otherwise(thr)
        return df.filter(b < thr)
    return df.filter(b < F.lit(int(float(fractions) * _DENOM)))


def mixture_counts(df: DataFrame, strata_col: str, id_col: str,
                   fractions: dict[str, float], seed: int = 42,
                   hash_mode: str = "xxhash64") -> DataFrame:
    """Audit view of a mixture: kept-row count and id checksum per
    stratum after :func:`stratified_sample` — the numbers a pipeline
    operator actually monitors when tuning a training mix."""
    kept = stratified_sample(df, strata_col, id_col, fractions, seed,
                             hash_mode)
    return kept.groupBy(strata_col).agg(
        F.count("*").alias("n_kept"),
        F.sum(id_col).alias("sum_ids"))
