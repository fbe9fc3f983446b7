"""Capture .explain("formatted") for named queries() entries.

Usage: python scripts/capture_plans.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query. Used to produce the
plans/r07/*_before.txt / *_after.txt evidence (before = round-start tree
via a git worktree, after = the optimized tree).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from varint_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    out_dir, suffix = Path(sys.argv[1]), sys.argv[2]
    names = sys.argv[3:]
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("capture_plans", master="local[8]", shuffle_partitions=8)
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        text = df._jdf.queryExecution().explainString(mode)
        (out_dir / f"{name}_{suffix}.txt").write_text(text)
        print(f"wrote {name}_{suffix}.txt ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
