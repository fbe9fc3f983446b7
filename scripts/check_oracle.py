"""Local mirror of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count,
column names, and order-insensitive values."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent))

import __spark_entry__ as entrymod
from varint_spark.session import get_spark

ARGS = [a for a in sys.argv[1:] if a != "--spark-only"]
# --spark-only: run and time only the Spark side (no DuckDB compare) —
# for scale-factor robustness runs where an oracle is deliberately
# exhaustive (the O(n²) near-dup ground truths) and can't follow the
# engine past toy scale
SPARK_ONLY = "--spark-only" in sys.argv[1:]
SF_DIR = ARGS[0] if ARGS else "/root/testdata/sf0.01"
ONLY = ARGS[1:] or None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        sdf = fn(spark, SF_DIR).toPandas()
        t1 = time.time()
        if SPARK_ONLY:
            print(f"  {name}: SPARK-ONLY, {len(sdf)} rows ({t1-t0:.1f}s)")
            assert len(sdf) > 0, name
            continue
        if name not in oracles:
            print(f"  {name}: rows-only, {len(sdf)} rows ({t1-t0:.1f}s)")
            assert len(sdf) > 0, name
            continue
        odf = con.execute(oracles[name]).fetchdf()
        a, b = normalize(sdf), normalize(odf)
        status = "OK"
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
            # the driver's value hash is dtype-sensitive (r01: DuckDB HUGEINT
            # -> float64 vs Spark BIGINT hashed differently despite equal
            # values) — flag any raw-dtype divergence normalize() hid
            def _fam(t):  # datetime resolution (ns vs us) hashes identically
                s = str(t)
                return "datetime64" if s.startswith("datetime64") else s
            raw_s = {c: _fam(t) for c, t in sdf.dtypes.items()}
            raw_o = {c: _fam(t) for c, t in odf.dtypes.items()}
            diff = {c: (raw_s[c], raw_o.get(c)) for c in raw_s if raw_s[c] != raw_o.get(c)}
            if diff:
                status = f"DTYPE MISMATCH (values equal): {diff}"
                failures.append(name)
        except AssertionError as e:
            status = f"MISMATCH: {str(e)[:300]}"
            failures.append(name)
        print(f"  {name}: {len(sdf)} vs {len(odf)} rows — {status} ({t1-t0:.1f}s)")
    print("FAILURES:", failures or "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
