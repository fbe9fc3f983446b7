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


def test_csv_roundtrip_lossless(spark, tmp_path_factory):
    from varint_spark.sources import csv as vcsv

    path = str(tmp_path_factory.mktemp("csv") / "docs")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "lang", "text")
    vcsv.write_csv(docs, path, partitions=3)
    back = vcsv.read_csv(spark, path, DDL)
    left = {r.doc_id: (r.lang, r.text) for r in docs.collect()}
    right = {r.doc_id: (r.lang, r.text) for r in back.collect()}
    assert left == right


def test_csv_quoting_and_multiline(spark, tmp_path_factory):
    """Fields with the delimiter, quotes, and (multiLine mode) embedded
    newlines survive Spark's RFC-4180 quoting; timestamps keep µs."""
    import datetime

    from varint_spark.sources import csv as vcsv

    path = str(tmp_path_factory.mktemp("csv") / "adv")
    rows = [(1, 'a,b', datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)),
            (2, 'say "hi"', datetime.datetime(2024, 6, 7, 8, 9, 10, 999999)),
            (3, 'line1\nline2', None),
            (4, None, datetime.datetime(1969, 12, 31, 23, 59, 59, 1))]
    ddl = "id long, s string, ts timestamp_ntz"
    df = spark.createDataFrame(rows, schema=ddl)
    vcsv.write_csv(df, path, partitions=1)
    back = vcsv.read_csv(spark, path, ddl, multiline=True)
    left = {r.id: (r.s, r.ts) for r in df.collect()}
    right = {r.id: (r.s, r.ts) for r in back.collect()}
    assert left == right


def test_csv_corruption_failfast_and_permissive(spark, tmp_path):
    from varint_spark.sources import csv as vcsv

    p = tmp_path / "badcsv"
    p.mkdir()
    (p / "part-0.csv").write_text(
        "doc_id,lang,text\n"
        "1,en,ok\n"
        "not-a-long,xx,broken row\n"
        "2,de,auch ok\n")
    with pytest.raises(Exception):
        vcsv.read_csv(spark, str(p), DDL).collect()  # FAILFAST raises
    rows = vcsv.read_csv(spark, str(p), DDL, mode="PERMISSIVE")
    bad = rows.filter(F.col(jsonl.CORRUPT_COL).isNotNull()).collect()
    good = rows.filter(F.col(jsonl.CORRUPT_COL).isNull()).collect()
    assert len(bad) == 1 and "not-a-long" in bad[0][jsonl.CORRUPT_COL]
    assert {r.doc_id for r in good} == {1, 2}
