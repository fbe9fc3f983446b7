"""CSV source/sink — the other interchange format corpora arrive in.

Same two 100-TB decisions as the JSONL module (schema pinned, loud
corruption handling), plus the one CSV-specific trap:

* **embedded newlines kill splittability** — a quoted field containing
  ``\\n`` can only be parsed with ``multiLine=True``, and in that mode
  Spark assigns WHOLE FILES to tasks (no intra-file splits), so one
  100 GB csv becomes one task. Default is single-line mode (splittable,
  embedded ``\\n`` in a field is corruption); callers with genuinely
  multiline data opt in via ``multiline=True`` and should shard their
  files to task-sized pieces at write time (``partitions=``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .jsonl import CORRUPT_COL

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"  # micro-precision, lossless for
# the engine's epoch-µs timestamp domain (Spark's default writes millis)


def write_csv(df: DataFrame, path: str, partitions: int | None = None,
              header: bool = True, delimiter: str = ",") -> None:
    """Write as CSV (overwrite). Quoting/escaping are Spark's RFC-4180
    defaults (quote ``"``, escape by doubling), so fields containing the
    delimiter, quotes, or newlines survive — but see the module note on
    newline splittability before relying on that for big corpora."""
    w = df.repartition(partitions) if partitions else df
    (w.write.mode("overwrite")
     .option("header", header)
     .option("delimiter", delimiter)
     .option("timestampNTZFormat", TS_FMT)
     .option("timestampFormat", TS_FMT)
     .csv(path))


def read_csv(spark: SparkSession, path: str, schema_ddl: str,
             mode: str = "FAILFAST", header: bool = True,
             delimiter: str = ",", multiline: bool = False) -> DataFrame:
    """Schema-pinned CSV read (never inference — inference costs a full
    extra corpus pass AND silently widens types). ``mode='PERMISSIVE'``
    captures unparseable lines in ``_corrupt_record`` for quarantine;
    FAILFAST (default) raises on the first. ``multiline=True`` parses
    quoted embedded newlines at the cost of file-granularity tasks."""
    r = (spark.read
         .option("header", header)
         .option("delimiter", delimiter)
         .option("multiLine", multiline)
         .option("timestampNTZFormat", TS_FMT)
         .option("timestampFormat", TS_FMT)
         .option("mode", mode))
    if mode == "PERMISSIVE":
        return (r.schema(f"{schema_ddl}, {CORRUPT_COL} string")
                .option("columnNameOfCorruptRecord", CORRUPT_COL)
                .csv(path))
    return r.schema(schema_ddl).csv(path)
