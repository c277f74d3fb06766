"""JSONL source lane: schema'd scan, malformed-line isolation,
lossless roundtrip of hostile text content."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from babylon_data_loader_spark.queries.json_source import (
    DOC_SCHEMA,
    read_jsonl,
    write_jsonl,
)


def test_roundtrip_preserves_hostile_text(spark, tmp_path):
    rows = [
        (1, 'line1\nline2\t"quoted" \\ backslash', "en", "web", 0),
        (2, "unicode: é中文 \U0001f600", "zh", "web", 0),
        (3, "", "en", "book", 0),
        (4, None, "de", "book", 0),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = os.path.join(tmp_path, "docs")
    write_jsonl(df, out, shards=2)
    back = read_jsonl(spark, out)
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    want = {r[0]: r[1] for r in rows}
    assert got == want


def test_malformed_lines_become_null_rows_not_failures(spark, tmp_path):
    p = os.path.join(tmp_path, "docs")
    os.makedirs(p)
    with open(os.path.join(p, "part-0.json"), "w") as fh:
        fh.write('{"doc_id": 1, "text": "ok", "lang": "en",'
                 ' "source": "web", "n_chars": 2}\n')
        fh.write("this is not json at all\n")
        fh.write('{"doc_id": 2, "text": "also ok", "lang": "en",'
                 ' "source": "web", "n_chars": 7}\n')
    back = read_jsonl(spark, p)
    # PERMISSIVE: 2 good rows survive; the bad line is an all-null row
    # (per-row error isolation, reference csv/csv.go:82-84 analog).
    assert back.count() == 3
    assert back.filter(F.col("doc_id").isNotNull()).count() == 2


def test_unknown_fields_dropped_missing_fields_null(spark, tmp_path):
    p = os.path.join(tmp_path, "docs")
    os.makedirs(p)
    with open(os.path.join(p, "part-0.json"), "w") as fh:
        fh.write('{"doc_id": 5, "text": "t", "extra_field": 99}\n')
    row = read_jsonl(spark, p).collect()[0]
    assert row["doc_id"] == 5
    assert row["lang"] is None and row["n_chars"] is None
    assert "extra_field" not in row.asDict()
