"""JSONL source/sink: lossless roundtrip and loud corruption handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from varint_spark.sources import jsonl

DDL = "doc_id long, lang string, text string"


def test_jsonl_roundtrip_lossless(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("jsonl") / "docs")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "lang", "text")
    jsonl.write_jsonl(docs, path, partitions=3)
    back = jsonl.read_jsonl(spark, path, DDL)
    left = {r.doc_id: (r.lang, r.text) for r in docs.collect()}
    right = {r.doc_id: (r.lang, r.text) for r in back.collect()}
    assert left == right


def test_jsonl_corruption_failfast_and_permissive(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "lang": "en", "text": "ok"}\n'
        'THIS IS NOT JSON\n'
        '{"doc_id": 2, "lang": "de", "text": "auch ok"}\n')
    with pytest.raises(Exception):
        jsonl.read_jsonl(spark, str(p), DDL).collect()  # FAILFAST raises
    rows = jsonl.read_jsonl(spark, str(p), DDL, mode="PERMISSIVE")
    bad = rows.filter(F.col(jsonl.CORRUPT_COL).isNotNull()).collect()
    good = rows.filter(F.col(jsonl.CORRUPT_COL).isNull()).collect()
    assert len(bad) == 1 and "NOT JSON" in bad[0][jsonl.CORRUPT_COL]
    assert {r.doc_id for r in good} == {1, 2}
