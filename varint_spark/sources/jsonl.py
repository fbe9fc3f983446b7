"""JSON-lines source/sink — the interchange format LLM training corpora
actually ship in (one JSON object per line, splittable, append-friendly).

Spark's native json reader/writer does the heavy lifting; this module
pins the two decisions that matter at 100 TB:

* **explicit schema, never inference** — schema inference costs a full
  extra pass over the corpus before the real job starts;
* **loud corruption handling** — FAILFAST by default (a malformed line
  aborts, like every decode path in this engine); PERMISSIVE mode opts
  into salvage pipelines, with the corrupt line text captured in
  ``_corrupt_record`` so the bad records can be quarantined instead of
  silently dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write as JSONL (overwrite). ``partitions`` controls output file
    count (JSONL is splittable, so fewer/bigger files are fine)."""
    w = df.repartition(partitions) if partitions else df
    w.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema_ddl: str,
               mode: str = "FAILFAST") -> DataFrame:
    """Schema-pinned JSONL read. ``mode='PERMISSIVE'`` adds a
    ``_corrupt_record`` column holding the raw text of unparseable lines
    (null for good rows); FAILFAST (default) raises on the first one."""
    if mode == "PERMISSIVE":
        return (spark.read
                .schema(f"{schema_ddl}, {CORRUPT_COL} string")
                .option("mode", mode)
                .option("columnNameOfCorruptRecord", CORRUPT_COL)
                .json(path))
    return spark.read.schema(schema_ddl).option("mode", mode).json(path)
